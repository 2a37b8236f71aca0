"""Fusion train-step timing: float32 vs bfloat16 compute dtype.

Builds the same m3ae-small-shaped fusion step twice (only compute_dtype
differs), times steady-state steps on the current backend, and prints a JSON
comparison. Complements the CPU quality comparison in zsl_learnability
(--compute_dtype): this measures the MXU win.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
    python experiments/bf16_step_bench.py [--model_type small] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def time_steps(compute_dtype: str, model_type: str, steps: int, image_size: int,
               batch_size: int, seed: int = 0) -> float:
    import jax

    from mre_tpu.data.fixtures import write_zsl_dataset
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.data.loaders import load_zsl_dataset
    from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore
    from mre_tpu.train.fusion import FusionConfig, FusionTrainer
    import tempfile

    path = tempfile.mkdtemp()
    write_zsl_dataset(path, n_ent=120, n_rel=12, n_unseen=2,
                      triples_per_rel=30, image_size=32, seed=seed)
    data = load_zsl_dataset(path, mode="train")
    store = MultimodalStore(
        data["mm_info"], data["rel_des"],
        MultimodalPipelineConfig(image_size=image_size, vocab_size=30522,
                                 tokenizer_max_length=64,
                                 unpaired_tokenizer_max_length=320))
    table = TripleTable.build(np.asarray(data["triples"]).T,
                              len(data["e2id"]), len(data["r2id"]))
    trainer = FusionTrainer(table, store, FusionConfig(
        model_type=model_type, emb_dim=200, noise_dim=15, patch_size=16,
        batch_size=batch_size, sample_size=4, neg_ent=10,
        epochs=1, seed=seed, compute_dtype=compute_dtype))

    graph_batch = trainer.sampler.sample_batch(np.arange(batch_size))
    device_batch = trainer.prepare_device_batch(graph_batch)

    def one_step():
        trainer.params, trainer.spectral, trainer.opt_state, trainer._rng, info = \
            trainer._step_fn(trainer.params, trainer.spectral, trainer.opt_state,
                             trainer._rng, device_batch)
        return info

    info = one_step()                      # compile
    jax.block_until_ready(info["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        info = one_step()
    jax.block_until_ready(info["loss"])
    dt = (time.perf_counter() - t0) / steps
    return dt, float(info["loss"])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_type", default="small")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=12)
    args = parser.parse_args(argv)

    out = {}
    for dt_name in ("float32", "bfloat16"):
        step_s, loss = time_steps(dt_name, args.model_type, args.steps,
                                  args.image_size, args.batch_size)
        out[dt_name] = {"ms_per_step": round(step_s * 1e3, 1), "loss": round(loss, 4)}
        print(f"[bf16_bench] {dt_name}: {step_s * 1e3:.1f} ms/step "
              f"(loss {loss:.4f})", flush=True)
    out["speedup"] = round(out["float32"]["ms_per_step"]
                           / out["bfloat16"]["ms_per_step"], 3)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
