#!/usr/bin/env python3
"""Summarize a sf10_sweep.sh log into pass/fail/timeout counts and a
markdown-ready listing (used to cut the BASELINE.md round tables)."""
import sys, re
log = open(sys.argv[1]).read()
rows = {}
for m in re.finditer(r'^(PASS|FAIL|TIMEOUT|SKIP)\s+(\w+)(.*)$', log, re.M):
    status, name, rest = m.groups()
    rows[name] = (status, rest.strip())
counts = {}
for status, _ in rows.values():
    counts[status] = counts.get(status, 0) + 1
print(f"total {len(rows)}: {counts}")
for st in ("FAIL", "TIMEOUT", "SKIP"):
    for n, (s, r) in sorted(rows.items()):
        if s == st:
            print(f"  {st} {n} {r}")
