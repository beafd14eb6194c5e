"""Job configuration (SURVEY §2.1 S6): the reference's env contract.

The reference reads SQLITE_DB, INFLUXDB_URL/TOKEN/ORG/BUCKET, BATCH_SIZE
and DEBUG_MODE via dotenv/getenv and exits(1) listing what's missing
(sqllite2influxdb.py:11-31, .env.example:1-7). Same contract here, as a
frozen dataclass validated BEFORE any Spark work starts — a 1000-executor
job must die at submit time, not 40 minutes in when the sink first opens
a connection.

Consumers: ``sources.sqlite`` takes ``sqlite_db``; ``sinks.influx`` takes
the influx coordinates and ``batch_size``/``debug_mode`` (per-point write
isolation, reference :148-153).
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from dataclasses import dataclass


class ConfigError(ValueError):
    """Missing/invalid job configuration (the reference's exit(1) path)."""


#: required keys, in the reference's validation order (:25-29)
REQUIRED = (
    "SQLITE_DB",
    "INFLUXDB_URL",
    "INFLUXDB_TOKEN",
    "INFLUXDB_ORG",
    "INFLUXDB_BUCKET",
)


@dataclass(frozen=True)
class EtlConfig:
    sqlite_db: str
    influxdb_url: str
    influxdb_token: str
    influxdb_org: str
    influxdb_bucket: str
    batch_size: int = 10_000          # reference default (:31)
    debug_mode: bool = False          # per-point write isolation (:148)

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "EtlConfig":
        env = os.environ if env is None else env
        missing = [k for k in REQUIRED if not env.get(k)]
        if missing:
            raise ConfigError(
                "missing required configuration: " + ", ".join(missing)
            )
        try:
            batch_size = int(env.get("BATCH_SIZE", "10000"))
        except ValueError as e:
            raise ConfigError(f"BATCH_SIZE must be an integer: {e}") from e
        if batch_size <= 0:
            raise ConfigError("BATCH_SIZE must be positive")
        return cls(
            sqlite_db=env["SQLITE_DB"],
            influxdb_url=env["INFLUXDB_URL"],
            influxdb_token=env["INFLUXDB_TOKEN"],
            influxdb_org=env["INFLUXDB_ORG"],
            influxdb_bucket=env["INFLUXDB_BUCKET"],
            batch_size=batch_size,
            debug_mode=env.get("DEBUG_MODE", "").lower() in ("true", "1"),
        )
