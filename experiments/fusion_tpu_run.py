"""Real-length fusion training run on the TPU (VERDICT r2 #9b).

Runs >= ``--steps`` m3ae-small fusion train steps through the REAL host
pipeline (train_epoch's prefetch thread) with the pre-decoded image cache
(FusionConfig.image_cache) keeping the single host core ahead of the chip.
Records steady-state step time, host batch-prep time with/without the
cache, and the loss trajectory.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
    python experiments/fusion_tpu_run.py [--steps 500] [--compute_dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--model_type", default="small")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--n_ent", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results", "fusion_tpu_run.json"))
    args = ap.parse_args(argv)

    from mre_tpu.data.fixtures import write_zsl_dataset
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.data.loaders import load_zsl_dataset
    from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore
    from mre_tpu.train.fusion import FusionConfig, FusionTrainer

    path = tempfile.mkdtemp()
    write_zsl_dataset(path, n_ent=args.n_ent, n_rel=max(args.n_ent // 25, 4),
                      n_unseen=2, triples_per_rel=60, image_size=64,
                      seed=args.seed)
    data = load_zsl_dataset(path, mode="train")
    store = MultimodalStore(
        data["mm_info"], data["rel_des"],
        MultimodalPipelineConfig(image_size=args.image_size, vocab_size=30522,
                                 tokenizer_max_length=64,
                                 unpaired_tokenizer_max_length=320))
    table = TripleTable.build(np.asarray(data["triples"]).T,
                              len(data["e2id"]), len(data["r2id"]))

    # host batch-prep cost without the cache (the round-2 bottleneck)
    trainer = FusionTrainer(table, store, FusionConfig(
        model_type=args.model_type, emb_dim=200, noise_dim=15, patch_size=16,
        batch_size=args.batch_size, sample_size=4, neg_ent=10,
        epochs=1, seed=args.seed, compute_dtype=args.compute_dtype,
        image_cache=False))
    gb = trainer.sampler.sample_batch(np.arange(args.batch_size))
    t0 = time.perf_counter()
    for _ in range(5):
        trainer.prepare_device_batch(gb)
    prep_nocache_ms = (time.perf_counter() - t0) / 5 * 1e3

    cache_secs = store.precompute_image_cache()
    t0 = time.perf_counter()
    for _ in range(5):
        trainer.prepare_device_batch(gb)
    prep_cache_ms = (time.perf_counter() - t0) / 5 * 1e3
    print(f"[fusion_run] host prep: {prep_nocache_ms:.0f} ms/batch decode path "
          f"-> {prep_cache_ms:.0f} ms/batch cached (one-time decode "
          f"{cache_secs:.1f}s)", flush=True)

    # real-length run through the prefetching pipeline
    losses, steps_done = [], 0
    t_start = time.perf_counter()
    t_first = None
    steps_per_epoch = len(trainer.sampler)
    while steps_done < args.steps:
        info = trainer.train_epoch()
        steps_done += steps_per_epoch
        losses.append(round(info["loss"], 4))
        if t_first is None:
            t_first = time.perf_counter() - t_start   # includes compile
        print(f"[fusion_run] {steps_done} steps, epoch loss {info['loss']:.4f}",
              flush=True)
    wall = time.perf_counter() - t_start
    # steady-state step time: exclude the first epoch (compile)
    steady = ((wall - t_first) / max(steps_done - steps_per_epoch, 1)
              if len(losses) > 1 else wall / steps_done)

    row = dict(model_type=args.model_type, image_size=args.image_size,
               batch_size=args.batch_size, compute_dtype=args.compute_dtype,
               steps=steps_done, wall_seconds=round(wall, 1),
               step_ms_steady=round(steady * 1e3, 1),
               prep_ms_decode=round(prep_nocache_ms, 1),
               prep_ms_cached=round(prep_cache_ms, 1),
               cache_decode_seconds=round(cache_secs, 1),
               epoch_losses=losses)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(row, f, indent=1)
    print("[fusion_run] RESULT " + json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    main()
