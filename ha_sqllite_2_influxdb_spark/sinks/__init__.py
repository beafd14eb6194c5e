from . import backfill, influx  # noqa: F401
