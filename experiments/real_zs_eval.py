"""End-to-end zero-shot pipeline on the REAL FB15K-237-ZS / DB15K-ZS data.

The reference repo ships the real test-side artifacts
(`test_tasks_zsl.json`, `relation2ids.json`, `entity2ids_zsl.json`,
`rel_description_zsl`, `rel2candidates_all.json`) but its train-side blobs
were never committed (`.MISSING_LARGE_BLOBS`: `train_tasks_zsl.json`,
`e1rel_e2_all.json`, `MultiModalInfo_zsl.pkl`, images). This script

1. materializes a working dataset directory that uses every real file as-is
   and synthesizes ONLY the genuinely-absent ones:
   * `train_tasks_zsl.json` — triples for the seen relations, heads uniform
     over the real entity vocabulary, tails drawn from the relation's real
     `rel2candidates_all` type-plausible candidate list;
   * `e1rel_e2_all.json` — derived from train+test tasks
     (utils/gen_e1r_e2_all.py semantics, via prep.gen_e1rel_e2);
   * `test_candidates.json` — per-query filtered candidate lists from the
     REAL rel2candidates + test tasks (utils/gen_mode_candidates.py
     semantics, via prep.gen_mode_candidates);
   * `MultiModalInfo_zsl.pkl` — per-entity [image?, text] records over the
     real 14,208-entity vocabulary (text = the entity MID; a fraction get
     synthetic PNGs so both modalities are exercised);
2. runs the full evaluate pipeline (fusion learner → embeddings → Extractor
   pretrain → WGAN generator → batched ZS ranking) through the CLI entry.

Usage:
    python experiments/real_zs_eval.py [--src /root/reference/origin_data/FB15K-237-ZS]
        [--max_queries_per_rel 0] [--triples_per_rel 40] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

REAL_FILES = ["entity2ids_zsl.json", "relation2ids.json", "test_tasks_zsl.json",
              "rel_description_zsl", "rel2candidates_all.json"]


def materialize(src: str, dst: str, triples_per_rel: int = 40,
                image_frac: float = 0.05, image_size: int = 16,
                max_queries_per_rel: int = 0, seed: int = 0) -> dict:
    from mre_tpu.data import prep
    from mre_tpu.data.fixtures import _png_bytes

    os.makedirs(dst, exist_ok=True)
    missing_real = []
    for name in REAL_FILES:
        if os.path.exists(os.path.join(src, name)):
            shutil.copyfile(os.path.join(src, name), os.path.join(dst, name))
        else:
            missing_real.append(name)

    with open(os.path.join(dst, "relation2ids.json")) as f:
        r2id = json.load(f)
    with open(os.path.join(dst, "entity2ids_zsl.json")) as f:
        e2id = json.load(f)
    with open(os.path.join(dst, "test_tasks_zsl.json")) as f:
        test_tasks = json.load(f)

    rng = np.random.default_rng(seed)
    entities = list(e2id.keys())
    if "rel2candidates_all.json" not in missing_real:
        with open(os.path.join(dst, "rel2candidates_all.json")) as f:
            rel2candidates = json.load(f)
    else:
        # DB15K-ZS ships no candidate lists — regenerate them the way the
        # reference's offline prep does (utils/gen_rel2candidates.py: 300
        # random candidates per relation).
        rel2candidates = prep.gen_rel2candidates(
            {r: [] for r in r2id}, entities, n=300, seed=seed)
        with open(os.path.join(dst, "rel2candidates_all.json"), "w") as f:
            json.dump(rel2candidates, f)
    unseen = set(test_tasks.keys())
    seen = [r for r in r2id if r not in unseen]

    # synthetic train tasks over the REAL vocabulary (real ones not shipped)
    train_tasks = {}
    for rel in seen:
        cands = rel2candidates.get(rel) or entities
        rows = []
        for _ in range(triples_per_rel):
            h = entities[rng.integers(len(entities))]
            t = cands[rng.integers(len(cands))]
            rows.append([h, rel, t])
        train_tasks[rel] = rows
    with open(os.path.join(dst, "train_tasks_zsl.json"), "w") as f:
        json.dump(train_tasks, f)

    if max_queries_per_rel:
        test_tasks = {rel: rows[:max_queries_per_rel]
                      for rel, rows in test_tasks.items()}
        with open(os.path.join(dst, "test_tasks_zsl.json"), "w") as f:
            json.dump(test_tasks, f)

    e1rel_e2 = prep.gen_e1rel_e2(train_tasks, test_tasks)
    with open(os.path.join(dst, "e1rel_e2_all.json"), "w") as f:
        json.dump(e1rel_e2, f)

    test_candidates = prep.gen_mode_candidates(test_tasks, rel2candidates, e1rel_e2)
    with open(os.path.join(dst, "test_candidates.json"), "w") as f:
        json.dump(test_candidates, f)

    mm_info = []
    for i, ent in enumerate(entities):
        text = ent.replace("/", " ").strip()
        if rng.uniform() < image_frac:
            mm_info.append([_png_bytes(rng, image_size), text])
        else:
            mm_info.append([text])
    with open(os.path.join(dst, "MultiModalInfo_zsl.pkl"), "wb") as f:
        pickle.dump(mm_info, f)

    n_q = sum(len(v) for v in test_candidates.values())
    c_max = max((len(c) for q in test_candidates.values() for c in q.values()),
                default=0)
    return dict(n_entities=len(entities), n_relations=len(r2id),
                n_seen=len(seen), n_unseen=len(unseen),
                n_train_triples=sum(len(v) for v in train_tasks.values()),
                n_test_queries=n_q, max_candidates=c_max)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", default="/root/reference/origin_data/FB15K-237-ZS")
    parser.add_argument("--work_root", default="/tmp/real_zs_origin_data")
    parser.add_argument("--triples_per_rel", type=int, default=40)
    parser.add_argument("--max_queries_per_rel", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--pretrain_times", type=int, default=200)
    parser.add_argument("--train_times", type=int, default=150)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "real_zs.json"))
    args = parser.parse_args(argv)

    dataset = os.path.basename(os.path.normpath(args.src))
    dst = os.path.join(args.work_root, dataset)
    stats = materialize(args.src, dst,
                        triples_per_rel=args.triples_per_rel,
                        max_queries_per_rel=args.max_queries_per_rel,
                        seed=args.seed)
    print(f"[real_zs] materialized {dst}: {stats}", flush=True)

    from mre_tpu.cli.args import read_options
    from mre_tpu.cli.main import build_pipeline, run_zsl_round
    from mre_tpu.core.metrics import MetricLogger

    cli = read_options([
        "--evaluate", "--dataset", dataset, "--data_root", args.work_root,
        "--model_type", "tiny", "--emb_dim", "64", "--noise_dim", "8",
        "--patch_size", "8", "--image_size", "16",
        "--image_mask_ratio", "0.5", "--text_mask_ratio", "0.5",
        "--batch_size", "8", "--sample_size", "4",
        "--test_sample", "20", "--max_neighbor", "50",
        "--pretrain_times", str(args.pretrain_times),
        "--pretrain_batch_size", "32", "--pretrain_few", "5",
        "--pretrain_subepoch", "10",
        "--train_times", str(args.train_times),
        "--D_batch_size", "32", "--G_batch_size", "32",
        "--output_dir", "/tmp/real_zs_runs",
    ])
    # evaluate_entry cadence, but keeping the zsl module so the production
    # ranking step can be timed per eval path on the full real workload
    logger = MetricLogger(output_dir=cli.output_dir)
    t0 = time.time()
    data, store, table, fusion, zsl = build_pipeline(cli)
    result = run_zsl_round(cli, fusion, zsl, logger, dump_embeddings=True)
    wall = time.time() - t0
    print(f"[real_zs] pipeline (train+rank) wall {wall:.1f}s", flush=True)

    # production ranking step, timed per (path, dtype): n_triples = every
    # real query x its own candidate list
    from mre_tpu.data import loaders as _loaders
    tc = _loaders.load_candidates(os.path.join(args.work_root, dataset), "test")
    n_triples = sum(len(c) for q in tc.values() for c in q.values())
    rank_runs = {}
    for path, dtype in (("head_shared", "float32"), ("head_shared", "bfloat16"),
                        ("rel_shared", "float32"), ("rel_shared", "bfloat16")):
        t1 = time.time()
        r = zsl.evaluate(fusion, mode="test", verbose=False,
                         compute_dtype=dtype, eval_path=path)
        dt = time.time() - t1
        key = f"{path}_{dtype[:4]}"
        rank_runs[key] = dict(
            wall_seconds=round(dt, 2),
            triples_per_sec=round(n_triples / dt, 1),
            hits10=round(r["hits10"], 4), hits5=round(r["hits5"], 4),
            mrr=round(r["mrr"], 4), n=r["n"])
        print(f"[real_zs] rank[{key}]: {dt:.2f}s = "
              f"{n_triples / dt:,.0f} triples/s (hits10 {r['hits10']:.4f})",
              flush=True)

    import jax
    # accuracy is platform-independent; wall-times/throughputs are not —
    # outage-time CPU rows must self-document (round-5 policy)
    row = dict(dataset=dataset, stats=stats, wall_seconds=round(wall, 1),
               platform=jax.default_backend(),
               n_ranked_triples=n_triples, rank_runs=rank_runs,
               settings=dict(epochs=args.epochs,
                             pretrain_times=args.pretrain_times,
                             train_times=args.train_times,
                             max_queries_per_rel=args.max_queries_per_rel),
               **{k: v for k, v in result.items() if isinstance(v, (int, float))})
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(row, f, indent=1)
    print(f"[real_zs] RESULT {json.dumps(row)}", flush=True)
    return row


if __name__ == "__main__":
    main()
