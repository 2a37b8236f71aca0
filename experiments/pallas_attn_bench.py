"""Attention microbench: XLA einsum vs Pallas fused kernel.

Times the forward attention op at M3AE encoder and decoder shapes on the
current backend. Used to set the pallas_attention_profitable gate
(mre_tpu/ops/pallas/attention.py) from measured numbers.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
    python experiments/pallas_attn_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

SHAPES = [
    # (label, B, H, N, hd)
    ("encoder_small", 48, 6, 321, 64),
    ("decoder_small", 48, 16, 321, 32),
    ("decoder_small_b12", 12, 16, 321, 32),
]


REPS = 32  # in-program repetitions per dispatch


def _scanned(fn, reps=REPS):
    """One jitted program running ``fn`` ``reps`` times via lax.scan.

    Per-call dispatch through the axon relay tunnel costs O(100 µs)+jitter
    and polluted the round-2 numbers for these sub-ms kernels (the gate
    contradiction flagged in VERDICT r2). Scaling q by a per-iteration
    constant keeps a data dependency so XLA cannot hoist the body out of
    the loop; the extra elementwise multiply is noise vs the attention.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q, k, v):
        alphas = 1.0 + jnp.arange(reps, dtype=q.dtype) * 1e-6

        def body(acc, a):
            o = fn(q * a, k, v)
            return acc + o[0, 0, 0, 0], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), alphas)
        return acc

    return run


def main():
    import jax
    import jax.numpy as jnp

    from mre_tpu.ops.pallas.attention import (_attention_reference,
                                              fused_attention)

    out = {}
    for label, B, H, N, hd in SHAPES:
        rng = np.random.default_rng(0)
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, N, hd)).astype(np.float32))
                   for _ in range(3))
        pad = jnp.zeros((B, N), jnp.float32).at[:, -7:].set(1.0)
        scale = hd ** -0.5

        xla = jax.jit(lambda q, k, v: _attention_reference(q, k, v, pad, scale))
        pls = jax.jit(lambda q, k, v: fused_attention(q, k, v, pad, scale))

        row = {}
        for name, fn in (("xla", xla), ("pallas", pls)):
            # per-dispatch timing (kept for comparison with round-2 data)
            r = jax.block_until_ready(fn(q, k, v))      # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    r = fn(q, k, v)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / 10)
            row[name + "_dispatch"] = round(best * 1e6, 1)

            # scanned timing: one dispatch, REPS in-program iterations
            sfn = _scanned(fn)
            jax.block_until_ready(sfn(q, k, v))         # compile
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                jax.block_until_ready(sfn(q, k, v))
                best = min(best, (time.perf_counter() - t0) / REPS)
            row[name] = round(best * 1e6, 1)
        row["pallas_vs_xla"] = round(row["xla"] / row["pallas"], 3)
        err = float(jnp.max(jnp.abs(xla(q, k, v) - pls(q, k, v))))
        row["max_abs_diff"] = err
        out[label] = row
        print(f"[attn_bench] {label} B{B} H{H} N{N} hd{hd}: "
              f"xla {row['xla']}us pallas {row['pallas']}us scanned "
              f"({row['pallas_vs_xla']}x; dispatch-timed "
              f"{row['xla_dispatch']}/{row['pallas_dispatch']}us, "
              f"maxdiff {err:.2e})", flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
