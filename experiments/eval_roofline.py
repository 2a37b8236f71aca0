"""Component roofline for the headline eval path (bench.py hot loop).

The factored ranking path (extractor.embed_pairs_factored + _score_and_rank,
scanned over query chunks in one program) runs ~6x off the naive roofline on
the v5e. This experiment times each component as its own scanned jit so the
budget is attributed with facts, not guesses:

  gathers   L[left] + R[right] only (random row gathers + add)
  mlp       SupportEncoder on a pre-gathered operand (pure MXU + LN)
  rank      _score_and_rank on a fixed embedding block (VPU + reduction)
  full      the exact bench.py scan step (gather + MLP + rank)
  bulk      variant: ONE whole-workload gather outside the scan, scan
            consumes contiguous slices (tests gather-latency attribution)

Each variant runs REPS times inside one jit via an outer lax.scan whose rep
index perturbs the inputs (defeats CSE/hoisting of the identical body; a
per-dispatch timing loop through the relay tunnel would otherwise dominate
sub-ms bodies). Prints one JSON line with per-variant microseconds per
chunk-step.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

EMB_DIM = 200
N_ENTS = 14208
C = 301
Q = int(os.environ.get("ROOF_Q", "2048"))
CHUNK = int(os.environ.get("ROOF_CHUNK", "128"))
REPS = int(os.environ.get("ROOF_REPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from mre_tpu.eval.zero_shot import _score_and_rank
    from mre_tpu.models.extractor import Extractor

    rng = np.random.default_rng(0)
    n_chunks = Q // CHUNK
    rows = CHUNK * C

    extractor = Extractor(embed_dim=EMB_DIM)
    symbols = jnp.asarray(rng.normal(size=(N_ENTS + 236, EMB_DIM)), jnp.float32)
    dummy = jnp.asarray(rng.integers(0, N_ENTS, (2, 2)), jnp.int32)
    conns = jnp.asarray(rng.integers(0, N_ENTS, (2, 50, 2)), jnp.int32)
    degs = jnp.ones((2,), jnp.float32)
    meta0 = (conns, degs, conns, degs)
    params = extractor.init({"params": jax.random.key(0)}, symbols, dummy,
                            dummy, meta0, meta0, True)["params"]

    def support(pd):
        def f(x):
            return extractor.apply(
                {"params": pd}, x, method=lambda m, v: m.support_encoder(v, True))
        return f

    results = {"chunk": CHUNK, "q": Q, "c": C, "reps": REPS}
    for dtype in ("float32", "bfloat16"):
        cdt = jnp.dtype(dtype)
        L = jnp.asarray(rng.normal(size=(N_ENTS, EMB_DIM)), cdt)
        R = jnp.asarray(rng.normal(size=(N_ENTS, EMB_DIM)), cdt)
        pd = jax.tree_util.tree_map(lambda x: x.astype(cdt), params)
        enc = support(pd)
        lefts = jnp.asarray(rng.integers(0, N_ENTS, (n_chunks, rows)), jnp.int32)
        rights = jnp.asarray(rng.integers(0, N_ENTS, (n_chunks, rows)), jnp.int32)
        rel_vecs = jnp.asarray(rng.normal(size=(20, EMB_DIM)), jnp.float32)
        pre = jnp.asarray(rng.normal(size=(n_chunks, rows, EMB_DIM)), cdt)
        emb_fixed = jnp.asarray(rng.normal(size=(CHUNK, C, EMB_DIM)), jnp.float32)
        mask = jnp.ones((CHUNK, C), bool)

        # bodies take (rep_index, x); the index perturbs the input so the
        # outer rep scan cannot be CSE'd into one iteration.
        def body_gathers(i, lr):
            l, r = lr
            l = (l + i) % N_ENTS
            r = (r + i) % N_ENTS
            return (L[l] + R[r]).sum(dtype=jnp.float32)

        def body_mlp(i, x):
            out = enc(x + cdt.type(1e-6) * i.astype(cdt))
            return out.sum(dtype=jnp.float32)

        def body_rank(i, x):
            emb = emb_fixed + 1e-6 * i.astype(jnp.float32)
            return _score_and_rank(emb, rel_vecs, mask).sum().astype(jnp.float32)

        def body_full(i, lr):
            l, r = lr
            l = (l + i) % N_ENTS
            r = (r + i) % N_ENTS
            emb = extractor.apply({"params": pd}, L, R, l, r,
                                  method=extractor.embed_pairs_factored)
            emb = emb.reshape(CHUNK, C, EMB_DIM).astype(jnp.float32)
            return _score_and_rank(emb, rel_vecs, mask).sum().astype(jnp.float32)

        def scanned(body, xs):
            @jax.jit
            def run(xs):
                def rep(acc, i):
                    def step(a, x):
                        return a + body(i, x), None
                    a, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), xs)
                    return acc + a, None
                acc, _ = jax.lax.scan(rep, jnp.zeros((), jnp.float32),
                                      jnp.arange(REPS))
                return acc
            return run

        def time_it(name, run, xs, steps):
            jax.block_until_ready(run(xs))           # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(xs))
                best = min(best, time.perf_counter() - t0)
            us = best / steps * 1e6
            results[f"{name}_{dtype}"] = round(us, 1)
            print(f"[roofline] {name} {dtype}: {us:.1f} us/chunk-step",
                  flush=True)

        time_it("gathers", scanned(body_gathers, (lefts, rights)),
                (lefts, rights), REPS * n_chunks)
        time_it("mlp", scanned(body_mlp, pre), pre, REPS * n_chunks)
        time_it("rank", scanned(body_rank, pre), pre, REPS * n_chunks)
        time_it("full", scanned(body_full, (lefts, rights)),
                (lefts, rights), REPS * n_chunks)

        # bulk variant: one gather for the whole workload per rep, then a
        # scan over contiguous slices of the gathered block.
        @jax.jit
        def run_bulk(lefts, rights):
            def rep(acc, i):
                lf = (lefts.reshape(-1) + i) % N_ENTS
                rf = (rights.reshape(-1) + i) % N_ENTS
                summed = (L[lf] + R[rf]).reshape(n_chunks, rows, EMB_DIM)

                def step(a, x):
                    emb = enc(x).reshape(CHUNK, C, EMB_DIM).astype(jnp.float32)
                    return a + _score_and_rank(emb, rel_vecs, mask
                                               ).sum().astype(jnp.float32), None

                a, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), summed)
                return acc + a, None

            acc, _ = jax.lax.scan(rep, jnp.zeros((), jnp.float32),
                                  jnp.arange(REPS))
            return acc

        jax.block_until_ready(run_bulk(lefts, rights))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run_bulk(lefts, rights))
            best = min(best, time.perf_counter() - t0)
        us = best / (REPS * n_chunks) * 1e6
        results[f"bulk_{dtype}"] = round(us, 1)
        print(f"[roofline] bulk {dtype}: {us:.1f} us/chunk-step", flush=True)

    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    main()
