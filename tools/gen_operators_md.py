"""Regenerate OPERATORS.md from the live query registry.

Usage: python tools/gen_operators_md.py
"""

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry

HEADER = """# OPERATORS — the query/operator registry

Every entry in `__spark_entry__.queries()`, its plan module, and its
verification tier. *exact oracle* = value-level hash match against the
DuckDB oracle at sf0.01 (driver + `tests/test_oracle_parity.py`);
*rows-only* = approximate or binary-producing op whose values are
verified against its exact counterpart (or a golden) in pytest.
*driver window* = one of the 50 entries the round driver
correctness-checks directly; the rest are covered by the pytest oracle
suite and `tools/driver_sim.py` (all entries).

Generated from the registry docstrings; regenerate after adding a
query (`python tools/gen_operators_md.py`).

| query | module | verification | slot | what it does |
|---|---|---|---|---|
"""


def main() -> None:
    queries, oracles = entry._registry()
    window = set(entry._DRIVER_WINDOW)
    lines = []
    for name, fn in queries.items():
        para = (inspect.getdoc(fn) or "").split("\n\n")[0]
        doc = " ".join(para.split())
        if len(doc) > 160:
            doc = doc[:157].rsplit(" ", 1)[0] + "…"
        mod = fn.__module__.replace("ha_sqllite_2_influxdb_spark.plans.", "")
        tier = ("exact oracle" if name in oracles
                else "rows-only (pytest-verified)")
        slot = "driver window" if name in window else "pytest + sim"
        lines.append(
            f"| `{name}` | {mod} | {tier} | {slot} | "
            f"{doc.replace('|', chr(92) + '|')} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} entries")


if __name__ == "__main__":
    main()
