"""KGE train-step timing breakdown.

Times the pieces of one training step (positive pick, filtered corruption,
scoring+loss grad, optimizer update, whole fused epoch scan) as separate
jits, to localize where the step time goes (e.g. RotatE dim 1024 measured
~79 ms/step vs a few-ms roofline — gathers? adam? dispatch?).

Usage: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
    python experiments/profile_kge_step.py --recipe rotate_WN18RR_adv \
    --in_path /root/reference/OpenKE/benchmarks/WN18RR/ [--trace_dir /tmp/tr]

NOTE: never run this while another axon client is active (tunnel wedge).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _time(fn, *args, reps=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recipe", default="rotate_WN18RR_adv")
    parser.add_argument("--in_path", required=True)
    parser.add_argument("--trace_dir", default="")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from experiments.kge_parity import build_config
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    from mre_tpu.ops import sampling
    from mre_tpu.train.kge import KGETrainer

    bench = read_benchmark(args.in_path)
    table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
    cfg = build_config(args.recipe, table.n_triples, None, 0)
    trainer = KGETrainer(table, cfg)
    kg = trainer.kg
    B, n_neg = cfg.batch_size, cfg.neg_ent
    key = jax.random.key(0)

    out = {"recipe": args.recipe, "batch": B, "neg_ent": n_neg, "dim": cfg.dim}

    pick = jax.jit(lambda k: kg.triples[
        jax.random.randint(k, (B,), 0, kg.triples.shape[0])])
    tri = pick(key)
    out["pick_ms"] = round(_time(pick, key), 2)

    corrupt = jax.jit(lambda k, h, r, t: sampling.corrupt_batch(
        k, kg, h, r, t, n_neg, cfg.bern))
    nb = corrupt(key, tri[:, 0], tri[:, 1], tri[:, 2])
    out["corrupt_ms"] = round(_time(corrupt, key, tri[:, 0], tri[:, 1], tri[:, 2]), 2)

    # _step donates (params, opt_state): chain the outputs through the loop
    # instead of re-feeding donated buffers.
    p, o, k = trainer.params, trainer.opt_state, key
    p, o, k, v = trainer._step(p, o, k)           # compile
    jax.block_until_ready(v)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        p, o, k, v = trainer._step(p, o, k)
    jax.block_until_ready(v)
    out["step_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 2)
    trainer.params, trainer.opt_state = p, o      # keep valid buffers

    # epoch fn also donates (params, opt_state) — chain through the loop
    p, o, k, v = trainer._epoch_fn(trainer.params, trainer.opt_state,
                                   jax.random.key(1), n_steps=cfg.nbatches)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    for _ in range(3):
        p, o, k, v = trainer._epoch_fn(p, o, k, n_steps=cfg.nbatches)
    jax.block_until_ready(v)
    out["epoch_ms"] = round((time.perf_counter() - t0) / 3 * 1e3, 1)
    out["epoch_per_step_ms"] = round(out["epoch_ms"] / cfg.nbatches, 2)
    trainer.params, trainer.opt_state = p, o

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            p, o, k, v = trainer._epoch_fn(trainer.params, trainer.opt_state,
                                           jax.random.key(2), n_steps=cfg.nbatches)
            jax.block_until_ready(v)
        trainer.params, trainer.opt_state = p, o
        out["trace_dir"] = args.trace_dir

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
