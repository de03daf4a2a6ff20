"""Regenerate QUERIES.md from the driver-contract registry."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

qs, oracles = E.queries(), E.oracle_sql()
lines = [
    "# Query inventory — driver contract surface",
    "",
    f"{len(qs)} queries; {len(oracles)} oracle-paired (DuckDB hash-match at sf0.01), "
    f"{len(qs) - len(oracles)} rows-only. Generated from the registry; regenerate",
    "with `python tools/gen_queries_md.py`.",
    "",
    "| query | gate |",
    "|---|---|",
]
for name in sorted(qs, key=lambda s: int(re.match(r"q(\d+)", s).group(1))):
    lines.append(f"| {name} | {'oracle' if name in oracles else 'rows-only'} |")
open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md"), "w").write(
    "\n".join(lines) + "\n"
)
print(f"QUERIES.md: {len(qs)} queries")
