"""Collect experiments/results/*.json parity rows into a markdown table.

Prints the RESULTS.md-ready table of every KGE parity run that has landed,
with published Hits@10 and the delta. Run after (or during) a supervisor
pass; paste/append the output into RESULTS.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys

R = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(R, "*.json"))):
        name = os.path.basename(path)[:-5]
        if name.startswith(("real_zs", "bench", "pallas", "bf16")):
            continue
        try:
            with open(path) as f:
                row = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        if "filter" not in row:
            continue
        rows.append(row)
    if not rows:
        print("(no parity rows yet)")
        return
    print("| Recipe | published Hits@10 (filter) | mre_tpu Hits@10 | MRR | delta |")
    print("|---|---|---|---|---|")
    for row in rows:
        pub = row.get("published_hits10")
        h10 = row["filter"]["hits10"]
        mrr = row["filter"]["mrr"]
        if pub:
            delta = h10 / pub - 1
            mark = "parity" if delta >= -0.01 else "below"
            print(f"| {row['recipe']} | {pub} | **{h10:.4f}** | {mrr:.4f} "
                  f"| {delta:+.1%} {mark} |")
        else:
            print(f"| {row['recipe']} | (none) | {h10:.4f} | {mrr:.4f} | |")


if __name__ == "__main__":
    sys.exit(main())
