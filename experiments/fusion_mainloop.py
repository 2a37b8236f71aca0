"""Full fusion main-loop round on the TPU with a kill-and-resume proof.

Round-4 verdict item 6: run the flagship loop at the reference's cadence
(main.py:32-215: fusion epochs -> save_epochs checkpoint -> ZSL adversarial
round -> zero-shot eval) for >= --epochs epochs on the largest learnable
fixture that fits, and PROVE checkpoint-resume reproduces the trajectory:

  * full train state (params, spectral, opt_state, jax rng, host sampler
    rng) is checkpointed at --snapshot_epoch (chosen between ZSL rounds,
    which fold the trained generator head back into the fusion params);
  * after the loop, the snapshot is restored into a FRESH FusionTrainer and
    the following epoch re-run; the resulting params must match the
    recorded post-epoch state (max |delta| reported; 0.0 = bitwise replay).

Writes one JSON artifact with per-epoch losses, per-round ZSL metrics,
steady-state step time, and the resume delta.
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


def tree_max_abs_delta(a, b):
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return max(float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))))
               for x, y in zip(leaves_a, leaves_b))


def snapshot_state(path, fusion, epoch):
    import jax

    from mre_tpu.core import checkpoint as ckpt

    ckpt.save_checkpoint(path, {
        "params": jax.device_get(fusion.params),
        "spectral": jax.device_get(fusion.spectral),
        "opt_state": jax.device_get(fusion.opt_state),
        "rng": np.asarray(jax.random.key_data(fusion._rng)),
    })
    with open(path + ".state.json", "w") as f:
        json.dump({"epoch": epoch,
                   "sampler_rng": fusion.sampler._rng.bit_generator.state,
                   "store_rng": fusion.store._rng.bit_generator.state}, f)


def restore_state(path, fusion):
    import jax
    import jax.numpy as jnp

    from mre_tpu.core import checkpoint as ckpt

    template = {
        "params": fusion.params, "spectral": fusion.spectral,
        "opt_state": fusion.opt_state,
        "rng": np.asarray(jax.random.key_data(fusion._rng)),
    }
    tree = ckpt.load_checkpoint(path, template)
    fusion.params = tree["params"]
    fusion.spectral = tree["spectral"]
    fusion.opt_state = tree["opt_state"]
    fusion._rng = jax.random.wrap_key_data(jnp.asarray(tree["rng"]))
    with open(path + ".state.json") as f:
        meta = json.load(f)
    fusion.sampler._rng.bit_generator.state = meta["sampler_rng"]
    fusion.store._rng.bit_generator.state = meta["store_rng"]
    return meta["epoch"]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--save_epochs", type=int, default=5,
                    help="ZSL round cadence (reference main.py:203-213)")
    ap.add_argument("--snapshot_epoch", type=int, default=7,
                    help="epoch AFTER which full state is snapshotted for the "
                         "resume proof (must not collide with a ZSL round)")
    ap.add_argument("--model_type", default="small")
    ap.add_argument("--image_size", type=int, default=96)
    ap.add_argument("--patch_size", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--n_types", type=int, default=8)
    ap.add_argument("--ents_per_type", type=int, default=25)
    ap.add_argument("--pretrain_steps", type=int, default=300)
    ap.add_argument("--gan_times", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="experiments/results/fusion_mainloop.json")
    args = ap.parse_args(argv)

    from mre_tpu.data.fixtures import write_learnable_zsl_dataset
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.data.loaders import load_zsl_dataset
    from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore
    from mre_tpu.train.fusion import FusionConfig, FusionTrainer
    from mre_tpu.zsl.module import ZSLConfig, ZSLModule

    assert args.snapshot_epoch % args.save_epochs != 0, \
        "snapshot epoch must fall between ZSL rounds (train_gan mutates params)"

    path = tempfile.mkdtemp()
    write_learnable_zsl_dataset(
        path, n_types=args.n_types, ents_per_type=args.ents_per_type,
        n_rel=2 * args.n_types, n_unseen=3, triples_per_rel=50,
        n_candidates=30, image_size=32, seed=args.seed)
    data = load_zsl_dataset(path, mode="train")
    store = MultimodalStore(
        data["mm_info"], data["rel_des"],
        MultimodalPipelineConfig(image_size=args.image_size, vocab_size=512,
                                 tokenizer_max_length=16,
                                 unpaired_tokenizer_max_length=16))
    table = TripleTable.build(np.asarray(data["triples"]).T,
                              len(data["e2id"]), len(data["r2id"]))

    def make_fusion():
        return FusionTrainer(table, store, FusionConfig(
            model_type=args.model_type, emb_dim=200, noise_dim=15,
            patch_size=args.patch_size, image_mask_ratio=0.75,
            text_mask_ratio=0.5, batch_size=args.batch_size, sample_size=4,
            neg_ent=10, lr_maximum=3e-4, epochs=args.epochs, seed=args.seed,
            compute_dtype=args.compute_dtype, image_cache=True))

    fusion = make_fusion()
    zsl = ZSLModule(path, data["r2id"], data["e2id"], ZSLConfig(
        emb_dim=200, noise_dim=15, test_sample=8, max_neighbor=20,
        pretrain_times=args.pretrain_steps, pretrain_batch_size=32,
        pretrain_few=4, pretrain_subepoch=5, pretrain_loss_every=200,
        train_times=args.gan_times, D_batch_size=64, G_batch_size=64,
        gan_batch_rela=3, loss_every=100, seed=args.seed), fusion)

    print(f"[mainloop] {table.n_entities} entities, {table.n_relations} rels, "
          f"{table.n_triples} triples, {fusion.steps_per_epoch} steps/epoch",
          flush=True)

    work = tempfile.mkdtemp()
    snap_path = os.path.join(work, "snapshot.ckpt")
    losses, rounds, epoch_secs = [], [], []
    post_snapshot_params = None
    t_loop = time.time()
    for epoch in range(args.epochs):
        t0 = time.time()
        info = fusion.train_epoch()
        epoch_secs.append(round(time.time() - t0, 2))
        losses.append(round(info["loss"], 4))
        print(f"[mainloop] epoch {epoch + 1}: loss {info['loss']:.4f} "
              f"({epoch_secs[-1]}s)", flush=True)
        if epoch + 1 == args.snapshot_epoch:
            snapshot_state(snap_path, fusion, epoch + 1)
            print(f"[mainloop] snapshot at epoch {epoch + 1}", flush=True)
        elif epoch == args.snapshot_epoch:  # first epoch after the snapshot
            import jax
            post_snapshot_params = jax.device_get(fusion.params)
        if (epoch + 1) % args.save_epochs == 0:
            # the reference cadence: checkpoint + ZSL adversarial round + eval
            t0 = time.time()
            ent_embs = fusion.generate_ent_embeddings(batch_size=64)
            rel_embs = fusion.generate_rel_embeddings(batch_size=16)
            zsl.update_embed(ent_embs, rel_embs)
            zsl.train_gan(fusion, pretrain_steps=args.pretrain_steps)
            res = zsl.evaluate(fusion, mode="test", verbose=False,
                               query_chunk=16)
            res.pop("per_relation", None)
            rounds.append(dict(epoch=epoch + 1, seconds=round(time.time() - t0, 1),
                               **{k: round(v, 4) for k, v in res.items()}))
            print(f"[mainloop] ZSL round @epoch {epoch + 1}: "
                  f"hits10 {res['hits10']:.3f} mrr {res['mrr']:.3f} "
                  f"({rounds[-1]['seconds']}s)", flush=True)
    wall = time.time() - t_loop

    # ---- kill-and-resume proof ----------------------------------------
    print("[mainloop] resume proof: fresh trainer <- snapshot "
          f"@epoch {args.snapshot_epoch}, re-running one epoch", flush=True)
    fusion2 = make_fusion()
    restore_state(snap_path, fusion2)
    fusion2.train_epoch()
    resume_delta = tree_max_abs_delta(post_snapshot_params, fusion2.params)
    print(f"[mainloop] resume max|delta| after replayed epoch: {resume_delta:.3e}",
          flush=True)

    import jax
    steps = args.epochs * fusion.steps_per_epoch
    row = dict(
        # accuracy/resume claims are platform-independent; wall-times are
        # not — outage-time CPU rows must self-document (round-5 policy)
        platform=jax.default_backend(),
        epochs=args.epochs, save_epochs=args.save_epochs,
        model_type=args.model_type, image_size=args.image_size,
        compute_dtype=args.compute_dtype,
        n_entities=table.n_entities, n_triples=table.n_triples,
        steps_per_epoch=fusion.steps_per_epoch,
        wall_seconds=round(wall, 1),
        step_ms_steady=round(np.median(epoch_secs[1:]) * 1e3 / fusion.steps_per_epoch, 1),
        epoch_losses=losses, epoch_seconds=epoch_secs,
        zsl_rounds=rounds,
        resume=dict(snapshot_epoch=args.snapshot_epoch,
                    replayed_epoch=args.snapshot_epoch + 1,
                    max_abs_param_delta=resume_delta,
                    identical=bool(resume_delta == 0.0)),
    )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(row, f, indent=1)
    print("[mainloop] RESULT " + json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    main()
