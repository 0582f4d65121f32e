#!/usr/bin/env python3
"""Compare two Bench detail artifacts across scale factors.

Usage: scale_compare.py SMALL.json BIG.json DATA_RATIO
Flags any query whose time ratio exceeds 2x the data ratio (the round-6
scale bar: no query may scale worse than ~2x linear).
"""
import json
import sys

SMALL, BIG, RATIO = sys.argv[1], sys.argv[2], float(sys.argv[3])
small = json.load(open(SMALL))
big = json.load(open(BIG))
FLOOR = 0.5  # sub-second queries are dominated by fixed plan/setup cost

rows = []
for q, tb in sorted(big["queries"].items()):
    ts = small["queries"].get(q)
    if ts is None:
        continue
    r = tb / ts if ts > 0 else float("inf")
    flag = "FLAG" if (r > 2 * RATIO and tb > FLOOR) else ""
    rows.append((r, q, ts, tb, flag))

rows.sort(reverse=True)
print(f"{'query':<28}{'small_s':>9}{'big_s':>9}{'ratio':>8}  vs {RATIO:.0f}x data")
for r, q, ts, tb, flag in rows:
    print(f"{q:<28}{ts:>9.3f}{tb:>9.3f}{r:>7.1f}x  {flag}")

flagged = [q for r, q, ts, tb, flag in rows if flag]
sub = sum(1 for r, *_ in rows if r < RATIO)
print(f"\n{len(rows)} compared; {sub} sub-linear (<{RATIO:.0f}x); flagged (> {2*RATIO:.0f}x, big>{FLOOR}s): {flagged or 'none'}")
for ph in ("ingest", "ann", "ann_pruned", "quality_assess"):
    a, b = small.get(ph), big.get(ph)
    if a and b:
        print(f"phase {ph}: small={a} big={b}")
