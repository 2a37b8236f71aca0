"""Step-0 gradient probe: is the first-step ent divergence semantic or noise?

Computes the DistMult softplus+regul gradient at the identical init/batch in
three ways — repo jax f32, torch f32, torch f64 (ground truth) — and reports
each f32 implementation's distance from the f64 oracle, plus where the
adagrad *update* diff concentrates (vs gradient magnitude).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def torch_grads(params_np, batch, dtype):
    import torch
    import torch.nn.functional as F

    tensors = {k: torch.nn.Parameter(torch.tensor(v).to(dtype)) for k, v in params_np.items()}
    h = torch.tensor(batch.h.astype(np.int64))
    r = torch.tensor(batch.r.astype(np.int64))
    t = torch.tensor(batch.t.astype(np.int64))
    nh = torch.tensor(batch.neg_h.astype(np.int64))
    nt = torch.tensor(batch.neg_t.astype(np.int64))

    def score(hh, rr, tt):
        return (tensors["ent"][hh] * tensors["rel"][rr] * tensors["ent"][tt]).sum(-1)

    p = score(h, r, t)[:, None]
    rn = r[:, None].expand(nh.shape)
    n = score(nh, rn, nt)
    loss = (F.softplus(-p).mean() + F.softplus(n).mean()) / 2
    all_h = torch.cat([h[:, None], nh], 1)
    all_t = torch.cat([t[:, None], nt], 1)
    all_r = torch.cat([r[:, None], rn], 1)
    regul = (tensors["ent"][all_h].pow(2).mean() + tensors["ent"][all_t].pow(2).mean()
             + tensors["rel"][all_r].pow(2).mean()) / 3
    loss = loss + regul
    loss.backward()
    return {k: v.grad.numpy().astype(np.float64) for k, v in tensors.items()}


def main():
    import jax

    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    from mre_tpu.ops import sampling
    from mre_tpu.train.kge import KGETrainer, KGETrainerConfig

    bench = read_benchmark("/root/reference/OpenKE/benchmarks/WN18RR/")
    table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
    batch_size = table.n_triples // 100
    cfg = KGETrainerConfig(model="distmult", dim=200, loss="softplus", neg_ent=25,
                           batch_size=batch_size, bern=True, opt_method="adagrad",
                           alpha=0.5, regul_rate=1.0, nbatches=100, seed=0)
    trainer = KGETrainer(table, cfg)
    params_np = {k: np.asarray(v) for k, v in trainer.params.items()}

    rng = jax.random.key(1)
    _, sub = jax.random.split(rng)
    batch = sampling.sample_training_batch(sub, trainer.kg, cfg.batch_size, cfg.neg_ent, cfg.bern)
    batch = jax.tree_util.tree_map(np.asarray, batch)

    jb = jax.tree_util.tree_map(jax.numpy.asarray, batch)
    g_jax = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64),
        jax.grad(trainer._loss_fn.__wrapped__)(trainer.params, jb))
    g_t32 = torch_grads(params_np, batch, __import__("torch").float32)
    g_t64 = torch_grads(params_np, batch, __import__("torch").float64)

    out = {}
    for k in params_np:
        ref = g_t64[k]
        scale = np.abs(ref).max()
        out[k] = {
            "jax_vs_f64_max": float(np.abs(g_jax[k] - ref).max() / scale),
            "t32_vs_f64_max": float(np.abs(g_t32[k] - ref).max() / scale),
            "jax_vs_t32_max": float(np.abs(g_jax[k] - g_t32[k]).max() / scale),
        }
    print(json.dumps(out, indent=1))

    # Where does the adagrad *update* diff concentrate?
    lr, eps = 0.5, 1e-10
    for k in ("ent",):
        ua = lr * g_jax[k] / (np.abs(g_jax[k]) + eps)
        ub = lr * g_t32[k] / (np.abs(g_t32[k]) + eps)
        d = np.abs(ua - ub)
        idx = np.unravel_index(np.argsort(d.ravel())[-5:], d.shape)
        for i in range(5):
            r_, c_ = idx[0][i], idx[1][i]
            print(json.dumps({
                "param": k, "row": int(r_), "col": int(c_),
                "update_diff": float(d[r_, c_]),
                "g_jax": float(g_jax[k][r_, c_]),
                "g_t32": float(g_t32[k][r_, c_]),
                "g_t64": float(g_t64[k][r_, c_]),
            }))


if __name__ == "__main__":
    main()
