"""Anatomy of the zero-shot eval hot path: component rooflines by dtype.

Round-3 verdict follow-ups:
  * the bf16/factored path measured 2.3x SLOWER than f32/factored
    (BENCH_r03: 28.5M vs 65.6M triples/s) — same program, narrower dtype.
    This experiment times each component of the two eval bodies
    (embed_pairs_factored / embed_pairs_head_shared, models/extractor.py)
    in isolation to attribute the inversion.
  * the headline path's MFU (13%) was argued to be gather-rate-bound from
    two data points; this experiment MEASURES the pure row-gather ceiling
    (rows/s for [N_ENTS, D] table gathers at the workload's index shapes)
    so the roofline claim is a measured fraction, not an inference.

Components timed (bench.py workload shape: chunk x C pairs, D=200):
  gather_factored     L[repeat(hd,C)] + R[cd.ravel()]        (2*Q*C rows)
  gather_head_shared  L[hd][:,None,:] + R[cd]                (Q + Q*C rows)
  mxu_encoder         SupportEncoder on a pre-gathered block (0 rows)
  full_factored       embed_pairs_factored
  full_head_shared    embed_pairs_head_shared
  pure_gather         T[idx] for idx [Q*C]                   (the ceiling)

Timing discipline per CLAUDE.md: all reps inside ONE jit via lax.scan with
per-rep index perturbation (the axon tunnel costs ~ms per dispatch; round
trips must not be in the timed region).
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

EMB_DIM = 200
N_ENTS = 14208
C = 301


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--n_chunks", type=int, default=16)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="experiments/results/eval_path_anatomy.json")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mre_tpu.models.extractor import Extractor

    rng = np.random.default_rng(0)
    chunk, n_chunks, reps = args.chunk, args.n_chunks, args.reps
    Q = chunk * n_chunks

    extractor = Extractor(embed_dim=EMB_DIM)
    symbols = jnp.asarray(rng.normal(size=(N_ENTS + 236, EMB_DIM)), jnp.float32)
    conns = jnp.asarray(rng.integers(0, N_ENTS, (2, 50, 2)), jnp.int32)
    degs = jnp.asarray(rng.integers(1, 50, 2), jnp.float32)
    dummy = jnp.asarray(rng.integers(0, N_ENTS, (2, 2)), jnp.int32)
    meta0 = (conns, degs, conns, degs)
    params = extractor.init({"params": jax.random.key(0)}, symbols, dummy,
                            dummy, meta0, meta0, True)["params"]

    L32 = jnp.asarray(rng.normal(size=(N_ENTS, EMB_DIM)), jnp.float32)
    R32 = jnp.asarray(rng.normal(size=(N_ENTS, EMB_DIM)), jnp.float32)
    heads = jnp.asarray(rng.integers(0, N_ENTS, (n_chunks, chunk)), jnp.int32)
    cands = jnp.asarray(rng.integers(0, N_ENTS, (n_chunks, chunk, C)), jnp.int32)
    # pre-gathered activation block for the pure-MXU component
    x_pre = jnp.asarray(rng.normal(size=(chunk * C, EMB_DIM)), jnp.float32)

    def timed(body_fn, *const_args):
        """Run body_fn(hd, cd, i) for every chunk, reps times, in ONE jit."""

        @jax.jit
        def run():
            def rep(acc, i):
                def step(a, x):
                    hd, cd = x
                    hd = (hd + i) % N_ENTS
                    cd = (cd + i) % N_ENTS
                    return a + body_fn(hd, cd, *const_args), None
                a, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                                    (heads, cands))
                return acc + a, None
            acc, _ = jax.lax.scan(rep, jnp.zeros((), jnp.float32),
                                  jnp.arange(reps))
            return acc

        jax.block_until_ready(run())          # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run())
            best = min(best, time.perf_counter() - t0)
        return best / (reps * n_chunks)       # seconds per chunk

    results = {"chunk": chunk, "n_chunks": n_chunks, "reps": reps,
               "C": C, "D": EMB_DIM, "n_ents": N_ENTS, "components": {}}

    for dtype in ("float32", "bfloat16"):
        cdt = jnp.dtype(dtype)
        Ld, Rd = L32.astype(cdt), R32.astype(cdt)
        pd = jax.tree_util.tree_map(lambda x: x.astype(cdt), params)
        xd = x_pre.astype(cdt)
        bytes_per_row = EMB_DIM * cdt.itemsize
        comp = {}

        def g_fact(hd, cd):
            v = Ld[jnp.repeat(hd, C)] + Rd[cd.reshape(-1)]
            return jnp.sum(v.astype(jnp.float32))

        def g_hs(hd, cd):
            v = Ld[hd][:, None, :] + Rd[cd]
            return jnp.sum(v.astype(jnp.float32))

        def mxu(hd, cd):
            # index-dependent bias so the scan can't be CSEd, cost ~0
            xb = xd + Ld[hd[0]][None, :]
            out = extractor.apply({"params": pd}, xb,
                                  method=lambda m, x: m.support_encoder(x, True))
            return jnp.sum(out.astype(jnp.float32))

        def full_fact(hd, cd):
            out = extractor.apply({"params": pd}, Ld, Rd,
                                  jnp.repeat(hd, C), cd.reshape(-1),
                                  method=extractor.embed_pairs_factored)
            return jnp.sum(out.astype(jnp.float32))

        def full_hs(hd, cd):
            out = extractor.apply({"params": pd}, Ld, Rd, hd, cd,
                                  method=extractor.embed_pairs_head_shared)
            return jnp.sum(out.astype(jnp.float32))

        def full_rs(hd, cd):
            # relation-shared: one candidate list for the whole chunk
            out = extractor.apply({"params": pd}, Ld, Rd, hd, cd[0],
                                  method=extractor.embed_pairs_rel_shared)
            return jnp.sum(out.astype(jnp.float32))

        def pure_gather(hd, cd):
            return jnp.sum(Ld[cd.reshape(-1)].astype(jnp.float32))

        for name, fn, rows in (
                ("pure_gather", pure_gather, chunk * C),
                ("gather_factored", g_fact, 2 * chunk * C),
                ("gather_head_shared", g_hs, chunk + chunk * C),
                ("mxu_encoder", mxu, 0),
                ("full_factored", full_fact, 2 * chunk * C),
                ("full_head_shared", full_hs, chunk + chunk * C),
                ("full_rel_shared", full_rs, chunk + C)):
            s = timed(fn)
            triples = chunk * C
            comp[name] = {
                "us_per_chunk": round(s * 1e6, 1),
                "triples_per_sec": round(triples / s, 1),
                "gather_rows": rows,
                "rows_per_sec": round(rows / s, 1) if rows else None,
                "gather_GBps": round(rows * bytes_per_row / s / 1e9, 2) if rows else None,
            }
            print(f"[{dtype}] {name}: {s*1e6:,.0f} us/chunk "
                  f"({triples/s/1e6:.1f}M triples/s"
                  + (f", {rows/s/1e6:.1f}M rows/s, "
                     f"{rows*bytes_per_row/s/1e9:.1f} GB/s" if rows else "")
                  + ")", flush=True)
        results["components"][dtype] = comp

    # roofline: fraction of the measured pure-gather ceiling the full
    # head-shared path achieves (rows/s basis, same dtype)
    for dtype in ("float32", "bfloat16"):
        comp = results["components"][dtype]
        ceil = comp["pure_gather"]["rows_per_sec"]
        used = comp["full_head_shared"]["rows_per_sec"]
        comp["head_shared_gather_roofline_fraction"] = round(used / ceil, 3)
        fullf = comp["full_factored"]["rows_per_sec"]
        comp["factored_gather_roofline_fraction"] = round(fullf / comp["pure_gather"]["rows_per_sec"], 3)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"written {args.out}", flush=True)
    return results


if __name__ == "__main__":
    main()
