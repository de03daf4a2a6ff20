"""Regenerate QUERIES.md from the driver-contract registry.

Round-7 (verdict task #8): QUERIES.md now carries a file:line index for
every query so audits of the 5k-line query modules stay tractable
without splitting the registry mid-stream.
"""
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

qs, oracles = E.queries(), E.oracle_sql()
lines = [
    "# Query inventory — driver contract surface",
    "",
    f"{len(qs)} queries; {len(oracles)} oracle-paired (DuckDB hash-match at sf0.01), "
    f"{len(qs) - len(oracles)} rows-only. Generated from the registry; regenerate",
    "with `python tools/gen_queries_md.py`.",
    "",
    "| query | gate | where |",
    "|---|---|---|",
]
for name in sorted(qs, key=lambda s: int(re.match(r"q(\d+)", s).group(1))):
    fn = qs[name]
    try:
        src = os.path.relpath(inspect.getsourcefile(fn), REPO)
        line = inspect.getsourcelines(fn)[1]
        where = f"{src}:{line}"
    except (TypeError, OSError):
        where = "?"
    gate = "oracle" if name in oracles else "rows-only"
    lines.append(f"| {name} | {gate} | {where} |")
open(os.path.join(REPO, "QUERIES.md"), "w").write("\n".join(lines) + "\n")
print(f"QUERIES.md: {len(qs)} queries")
