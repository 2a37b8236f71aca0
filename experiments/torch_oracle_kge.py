"""Full-budget torch oracle for the adagrad+softplus+L2 recipe family.

Runs the reference recipe end-to-end with REFERENCE semantics re-enacted in
torch (model forward + SoftplusLoss + NegativeSampling regularization +
torch.optim.Adagrad — /root/reference/OpenKE/openke/{module,config}), fed by
the native C++ sampler (ABI/semantics-identical to the reference Base.so,
tests/test_openke.py), then evaluates with the repo's validated filtered
link-prediction evaluator on the final embeddings.

Why: experiments/distmult_grad_probe.py proved the repo's jitted step is
numerically equivalent to the torch step (f32 grads equidistant from the f64
oracle). If this independent torch run also converges below the published
Hits@10 cell, the cell is not reproducible from the recipe and the parity
miss is the reference's, not ours.

Run (CPU, ~1-2 h):
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= nice -n 10 python \
        experiments/torch_oracle_kge.py --model distmult --train_times 2000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--in_path", default="/root/reference/OpenKE/benchmarks/WN18RR/")
    ap.add_argument("--model", default="distmult", choices=["distmult", "complex"])
    ap.add_argument("--train_times", type=int, default=2000)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--regul_rate", type=float, default=1.0)
    ap.add_argument("--neg_ent", type=int, default=25)
    ap.add_argument("--dim", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import torch
    import torch.nn.functional as F

    from mre_tpu.openke.data import TrainDataLoader

    torch.manual_seed(args.seed)
    torch.set_num_threads(1)
    loader = TrainDataLoader(in_path=args.in_path, nbatches=100, threads=1,
                             sampling_mode="normal", bern_flag=1, filter_flag=1,
                             neg_ent=args.neg_ent, backend="native", seed=args.seed)
    E, R, B = loader.get_ent_tot(), loader.get_rel_tot(), loader.get_batch_size()
    print(f"[oracle] {args.model} E={E} R={R} batch={B}", flush=True)

    d = args.dim
    if args.model == "distmult":
        names = ["ent", "rel"]
        shapes = {"ent": (E, d), "rel": (R, d)}
    else:
        names = ["ent_re", "ent_im", "rel_re", "rel_im"]
        shapes = {"ent_re": (E, d), "ent_im": (E, d), "rel_re": (R, d), "rel_im": (R, d)}
    params = {}
    for k in names:
        w = torch.empty(*shapes[k])
        torch.nn.init.xavier_uniform_(w)
        params[k] = torch.nn.Parameter(w)
    opt = torch.optim.Adagrad(list(params.values()), lr=args.alpha, lr_decay=0,
                              weight_decay=0, initial_accumulator_value=0.0, eps=1e-10)

    def score(h, r, t):
        if args.model == "distmult":
            return (params["ent"][h] * params["rel"][r] * params["ent"][t]).sum(-1)
        hr, hi = params["ent_re"][h], params["ent_im"][h]
        tr, ti = params["ent_re"][t], params["ent_im"][t]
        rr, ri = params["rel_re"][r], params["rel_im"][r]
        return (hr * tr * rr + hi * ti * rr + hr * ti * ri - hi * tr * ri).sum(-1)

    def regul(h, r, t):
        if args.model == "distmult":
            parts = [params["ent"][h], params["ent"][t], params["rel"][r]]
        else:
            parts = [params["ent_re"][h], params["ent_im"][h],
                     params["ent_re"][t], params["ent_im"][t],
                     params["rel_re"][r], params["rel_im"][r]]
        return sum(p.pow(2).mean() for p in parts) / len(parts)

    # evaluation harness (repo's validated evaluator), reused per checkpoint
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    from mre_tpu.train.kge import KGETrainer, KGETrainerConfig

    bench = read_benchmark(args.in_path)
    table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
    cfg = KGETrainerConfig(model=args.model, dim=d, loss="softplus",
                           neg_ent=args.neg_ent, batch_size=B, bern=True,
                           opt_method="adagrad", alpha=args.alpha,
                           regul_rate=args.regul_rate, nbatches=100, seed=args.seed)
    trainer = KGETrainer(table, cfg)
    full = np.concatenate([bench["train"], bench["valid"], bench["test"]])
    full_table = TripleTable.build(full, bench["n_entities"], bench["n_relations"])
    out = args.out or os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "results", f"torch_oracle_{args.model}_WN18RR.json")

    def evaluate(epochs_done):
        import jax.numpy as jnp
        trainer.params = {k: jnp.asarray(v.detach().numpy())
                          for k, v in params.items()}
        res = trainer.link_prediction(bench["test"], filter_table=full_table,
                                      chunk=16)
        row = {"oracle": "torch", "model": args.model,
               "train_times": args.train_times, "epochs_done": epochs_done,
               "seed": args.seed,
               "filter_hits10": round(float(res["filter"].hits10), 4),
               "filter_mrr": round(float(res["filter"].mrr), 4),
               "raw_hits10": round(float(res["raw"].hits10), 4)}
        with open(out, "w") as f:
            json.dump(row, f, indent=1)
        print("[oracle] RESULT " + json.dumps(row), flush=True)

    t0 = time.time()
    for epoch in range(args.train_times):
        total = 0.0
        for data in loader:
            h = torch.from_numpy(data["batch_h"])
            t = torch.from_numpy(data["batch_t"])
            r = torch.from_numpy(data["batch_r"])
            s = score(h, r, t)
            p_score = s[:B][:, None]
            n_score = s[B:].view(-1, B).permute(1, 0)
            loss = (F.softplus(-p_score).mean() + F.softplus(n_score).mean()) / 2
            loss = loss + args.regul_rate * regul(h, r, t)
            opt.zero_grad()
            loss.backward()
            opt.step()
            total += float(loss.item())
        if epoch % 25 == 0 or epoch == args.train_times - 1:
            dt = time.time() - t0
            eta = dt / (epoch + 1) * (args.train_times - epoch - 1)
            print(f"[oracle] epoch {epoch} loss {total:.4f} "
                  f"({dt/(epoch+1):.2f}s/epoch, eta {eta/60:.0f}m)", flush=True)
        if (epoch + 1) % args.eval_every == 0 or epoch == args.train_times - 1:
            evaluate(epoch + 1)


if __name__ == "__main__":
    main()
