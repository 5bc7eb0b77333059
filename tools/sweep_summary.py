#!/usr/bin/env python3
"""Summarize a sf10_sweep.sh log into pass/fail/timeout counts and a
markdown-ready listing (used to cut the BASELINE.md round tables)."""
import sys, re
log = open(sys.argv[1]).read()
rows = {}
# ERR (oracle SQL failed) and MISS (no parquet output) are failures in
# check_oracle's exit code — they must surface here too, or a sweep with
# oracle errors summarizes as clean (ADVICE r9 #1). Names may carry a
# trailing ':' (ERR/MISS print "NAME: reason").
for m in re.finditer(r'^(PASS|FAIL|TIMEOUT|SKIP|ERR|MISS|ABSENT)\s+(\w+):?(.*)$', log, re.M):
    status, name, rest = m.groups()
    rows[name] = (status, rest.strip())
counts = {}
for status, _ in rows.values():
    counts[status] = counts.get(status, 0) + 1
print(f"total {len(rows)}: {counts}")
for st in ("FAIL", "ERR", "MISS", "ABSENT", "TIMEOUT", "SKIP"):
    for n, (s, r) in sorted(rows.items()):
        if s == st:
            print(f"  {st} {n} {r}")
