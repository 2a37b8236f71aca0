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
            r = jax.block_until_ready(fn(q, k, v))      # compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(10):
                    r = fn(q, k, v)
                jax.block_until_ready(r)
                best = min(best, (time.perf_counter() - t0) / 10)
            row[name] = round(best * 1e6, 1)
        row["pallas_vs_xla"] = round(row["xla"] / row["pallas"], 3)
        err = float(jnp.max(jnp.abs(xla(q, k, v) - pls(q, k, v))))
        row["max_abs_diff"] = err
        out[label] = row
        print(f"[attn_bench] {label} B{B} H{H} N{N} hd{hd}: "
              f"xla {row['xla']}us pallas {row['pallas']}us "
              f"({row['pallas_vs_xla']}x, maxdiff {err:.2e})", flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
