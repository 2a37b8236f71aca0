"""Lockstep oracle for the adagrad+softplus+L2 recipe family.

Feeds byte-identical sampled batches to (a) the repo's jitted KGE step and
(b) a torch re-enactment of the reference training semantics
(/root/reference/OpenKE/openke/module/model/DistMult.py:34-72,
loss/SoftplusLoss.py:22-26, strategy/NegativeSampling.py:23-31,
config/Trainer.py:42-53 with torch.optim.Adagrad), starting from identical
parameters, and diffs per-step loss and post-step parameter state.

A divergence pins the semantic gap behind the DistMult/ComplEx WN18RR
parity misses (VERDICT round 2, "what's weak" #1). A match clears the step
semantics and moves the suspicion to sampling distribution / eval / the
published numbers themselves.

Run (CPU):
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python experiments/distmult_lockstep.py \
        --in_path /root/reference/OpenKE/benchmarks/WN18RR/ --steps 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_torch_oracle(model_name, params_np, alpha, regul_rate):
    import torch

    tensors = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params_np.items()}
    opt = torch.optim.Adagrad(list(tensors.values()), lr=alpha, lr_decay=0,
                              weight_decay=0, initial_accumulator_value=0.0,
                              eps=1e-10)

    def score(h, r, t):
        if model_name == "distmult":
            return (tensors["ent"][h] * tensors["rel"][r] * tensors["ent"][t]).sum(-1)
        hr, hi = tensors["ent_re"][h], tensors["ent_im"][h]
        tr, ti = tensors["ent_re"][t], tensors["ent_im"][t]
        rr, ri = tensors["rel_re"][r], tensors["rel_im"][r]
        return (hr * tr * rr + hi * ti * rr + hr * ti * ri - hi * tr * ri).sum(-1)

    def regul(h, r, t):
        if model_name == "distmult":
            parts = [tensors["ent"][h], tensors["ent"][t], tensors["rel"][r]]
        else:
            parts = [tensors["ent_re"][h], tensors["ent_im"][h],
                     tensors["ent_re"][t], tensors["ent_im"][t],
                     tensors["rel_re"][r], tensors["rel_im"][r]]
        return sum(p.pow(2).mean() for p in parts) / len(parts)

    def step(h, r, t, nh, nt):
        import torch.nn.functional as F
        h, r, t = (torch.tensor(x.astype(np.int64)) for x in (h, r, t))
        nh, nt = (torch.tensor(x.astype(np.int64)) for x in (nh, nt))
        p = score(h, r, t)[:, None]
        rn = r[:, None].expand(nh.shape)
        n = score(nh, rn, nt)
        loss = (F.softplus(-p).mean() + F.softplus(n).mean()) / 2
        all_h = torch.cat([h[:, None], nh], 1)
        all_t = torch.cat([t[:, None], nt], 1)
        all_r = torch.cat([r[:, None], rn], 1)
        loss = loss + regul_rate * regul(all_h, all_r, all_t)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss.item())

    return tensors, step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_path", default="/root/reference/OpenKE/benchmarks/WN18RR/")
    ap.add_argument("--model", default="distmult", choices=["distmult", "complex"])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    from mre_tpu.ops import sampling
    from mre_tpu.train.kge import KGETrainer, KGETrainerConfig

    bench = read_benchmark(args.in_path)
    table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
    batch_size = table.n_triples // 100
    cfg = KGETrainerConfig(
        model=args.model, dim=200, loss="softplus", neg_ent=25,
        batch_size=batch_size, bern=True, opt_method="adagrad", alpha=0.5,
        regul_rate=1.0, nbatches=100, seed=args.seed)
    trainer = KGETrainer(table, cfg)

    params_np = {k: np.asarray(v) for k, v in trainer.params.items()}
    tensors, torch_step = build_torch_oracle(args.model, params_np, cfg.alpha, cfg.regul_rate)

    rng = jax.random.key(args.seed + 1)
    rows = []
    for step in range(args.steps):
        rng, sub = jax.random.split(rng)
        batch = sampling.sample_training_batch(sub, trainer.kg, cfg.batch_size,
                                               cfg.neg_ent, cfg.bern)
        batch = jax.tree_util.tree_map(np.asarray, batch)
        loss_t = torch_step(batch.h, batch.r, batch.t, batch.neg_h, batch.neg_t)
        jb = jax.tree_util.tree_map(jax.numpy.asarray, batch)
        trainer.params, trainer.opt_state, loss_j = trainer._step_with_batch(
            trainer.params, trainer.opt_state, jb)
        loss_j = float(loss_j)

        diffs = {}
        for k in params_np:
            a = np.asarray(trainer.params[k])
            b = tensors[k].detach().numpy()
            denom = max(np.abs(b).max(), 1e-12)
            diffs[k] = float(np.abs(a - b).max() / denom)
        row = {"step": step, "loss_jax": loss_j, "loss_torch": loss_t,
               "loss_rel_diff": abs(loss_j - loss_t) / max(abs(loss_t), 1e-12),
               "param_rel_diff": diffs}
        rows.append(row)
        if step < 5 or step % 10 == 0 or step == args.steps - 1:
            print(json.dumps(row), flush=True)

    worst_loss = max(r["loss_rel_diff"] for r in rows)
    worst_param = max(max(r["param_rel_diff"].values()) for r in rows)
    summary = {"model": args.model, "steps": args.steps,
               "worst_loss_rel_diff": worst_loss,
               "worst_param_rel_diff": worst_param,
               "verdict": "MATCH" if worst_param < 1e-3 else "DIVERGED"}
    print("SUMMARY " + json.dumps(summary), flush=True)
    return summary


if __name__ == "__main__":
    main()
