#!/usr/bin/env python3
"""Summarize a graft.Explain dump: per-query counts of inlined parquet
scans, exchanges, and join operators. Usage: census.py <explain_dump>"""
import re, sys

def main(path):
    cur = None
    rows = {}
    for line in open(path, errors="replace"):
        m = re.match(r"^=+ (\S+) =+", line)
        if m:
            cur = m.group(1)
            rows[cur] = {"scan": 0, "exch": 0, "smj": 0, "bhj": 0, "bnlj": 0}
            continue
        if cur is None:
            continue
        r = rows[cur]
        # operator-tree lines only (details sections repeat node names)
        if re.search(r"\bScan parquet\b", line): r["scan"] += 1
        if re.search(r"\+- Exchange|^Exchange|:- Exchange", line): r["exch"] += 1
        if re.search(r"\bSortMergeJoin\b.*\(\d+\)", line): r["smj"] += 1
        if re.search(r"\bBroadcastHashJoin\b.*\(\d+\)", line): r["bhj"] += 1
        if re.search(r"\bBroadcastNestedLoopJoin\b.*\(\d+\)", line): r["bnlj"] += 1
    # each node appears once in the tree and once in details ("(n) Scan parquet")
    # -- the tree lines have "+-"/":-" prefixes; details start at col 0 with (n).
    order = sorted(rows.items(), key=lambda kv: -kv[1]["scan"])
    for name, r in order[:60]:
        print(f"{r['scan']:4d} scans {r['exch']:4d} exch  {name}")
    n8 = sum(1 for _, r in rows.items() if r["scan"] >= 8)
    print(f"\n{len(rows)} queries; {n8} with >=8 inlined scans; "
          f"max={order[0][1]['scan'] if order else 0}")

if __name__ == "__main__":
    main(sys.argv[1])
