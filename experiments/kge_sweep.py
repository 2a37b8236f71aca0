"""Hyperparameter sweep for table cells whose example script the reference
does not vendor.

The OpenKE README's published WN18RR numbers for TransE/TransH/TransD point
at ./examples/ scripts that are absent from the vendored copy
(/root/reference/OpenKE/examples/ has only the FB15K237 variants for these
models; README.md:86). Transplanting the FB15K237 hyperparameters
reproduces FB but lands far below the WN18RR cells (transe −11.8%,
experiments/results/transe_WN18RR.json) — margin models need a
dataset-tuned margin/lr. This sweep reconstructs the missing recipe:
short-budget runs over a small margin×lr grid, selected on VALID filtered
Hits@10, one process, serial (single TPU client).

Usage:
    python experiments/kge_sweep.py --recipe transe_WN18RR \
        --in_path .../WN18RR/ --grid "margin=5,6,8;alpha=0.5,1.0" \
        --train_times 250
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def parse_grid(spec: str):
    axes = []
    for part in spec.split(";"):
        name, vals = part.split("=")
        axes.append([(name, float(v)) for v in vals.split(",")])
    return [dict(combo) for combo in itertools.product(*axes)]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", required=True)
    ap.add_argument("--in_path", required=True)
    ap.add_argument("--grid", required=True)
    ap.add_argument("--train_times", type=int, default=250)
    ap.add_argument("--eval_chunk", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from experiments.kge_parity import build_config
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    from mre_tpu.train.kge import KGETrainer

    bench = read_benchmark(args.in_path)
    table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
    full = np.concatenate([bench["train"], bench["valid"], bench["test"]])
    full_table = TripleTable.build(full, bench["n_entities"], bench["n_relations"])

    rows = []
    for combo in parse_grid(args.grid):
        cfg = build_config(args.recipe, table.n_triples, args.train_times, args.seed)
        cfg = dataclasses.replace(cfg, **{k: type(getattr(cfg, k))(v)
                                          for k, v in combo.items()})
        t0 = time.time()
        trainer = KGETrainer(table, cfg)
        last = trainer.run()
        res = trainer.link_prediction(bench["valid"], filter_table=full_table,
                                      chunk=args.eval_chunk)
        row = {"combo": combo, "train_times": cfg.train_times,
               "loss": round(last, 4),
               "valid_filter_hits10": round(float(res["filter"].hits10), 4),
               "valid_filter_mrr": round(float(res["filter"].mrr), 4),
               "seconds": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"[sweep] {args.recipe} {combo}: valid hits10 "
              f"{row['valid_filter_hits10']} ({row['seconds']}s)", flush=True)

    rows.sort(key=lambda r: -r["valid_filter_hits10"])
    out = {"recipe": args.recipe, "train_times": args.train_times,
           "grid": args.grid, "ranked": rows, "best": rows[0]["combo"]}
    path = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "results", f"sweep_{args.recipe}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("[sweep] BEST " + json.dumps(out["best"]), flush=True)
    return out


if __name__ == "__main__":
    main()
