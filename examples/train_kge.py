"""Parameterized KGE training runner with the reference example recipes.

One runner covering the 13 reference example scripts
(OpenKE/examples/train_*.py) — each recipe keeps its upstream
hyperparameters. Thin per-recipe scripts in this directory call into here.

Usage:
    python examples/train_kge.py --recipe transe_FB15K237 \
        --in_path /path/to/benchmarks/FB15K237/ [--train_times N] [--dim D]

If --in_path is omitted, a synthetic benchmark fixture is generated (the
reference's benchmark data files are not redistributed with this repo).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

RECIPES = {
    # name: (model, model_kwargs, loader_kwargs, strategy_kwargs, trainer_kwargs)
    "transe_FB15K237": ("TransE", dict(dim=200, p_norm=1, norm_flag=True),
                        dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                        dict(loss=("margin", dict(margin=5.0))),
                        dict(train_times=1000, alpha=1.0, opt_method="sgd")),
    "transe_WN18_adv_sigmoidloss": ("TransE", dict(dim=1024, p_norm=1, norm_flag=False, margin=6.0),
                                    dict(batch_size=2000, bern_flag=0, filter_flag=1,
                                         neg_ent=64, sampling_mode="cross"),
                                    dict(loss=("sigmoid", dict(adv_temperature=1.0))),
                                    dict(train_times=3000, alpha=2e-5, opt_method="adam")),
    "transh_FB15K237": ("TransH", dict(dim=200, p_norm=1, norm_flag=True),
                        dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                        dict(loss=("margin", dict(margin=4.0))),
                        dict(train_times=1000, alpha=0.5, opt_method="sgd")),
    "transr_FB15K237": ("TransR", dict(dim_e=200, dim_r=200, p_norm=1, norm_flag=True, rand_init=False),
                        dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                        dict(loss=("margin", dict(margin=4.0))),
                        dict(train_times=1000, alpha=1.0, opt_method="sgd")),
    "transd_FB15K237": ("TransD", dict(dim_e=200, dim_r=200, p_norm=1, norm_flag=True),
                        dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                        dict(loss=("margin", dict(margin=4.0))),
                        dict(train_times=1000, alpha=1.0, opt_method="sgd")),
    "rescal_FB15K237": ("RESCAL", dict(dim=50),
                        dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                        dict(loss=("margin", dict(margin=1.0))),
                        dict(train_times=1000, alpha=0.1, opt_method="adagrad")),
    "distmult_WN18RR": ("DistMult", dict(dim=200),
                        dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                        dict(loss=("softplus", dict()), regul_rate=1.0),
                        dict(train_times=2000, alpha=0.5, opt_method="adagrad")),
    "distmult_WN18RR_adv": ("DistMult", dict(dim=1024, margin=200.0, epsilon=2.0),
                            dict(batch_size=2000, bern_flag=0, filter_flag=1,
                                 neg_ent=64, sampling_mode="cross"),
                            dict(loss=("sigmoid", dict(adv_temperature=0.5)),
                                 l3_regul_rate=0.000005),
                            dict(train_times=400, alpha=0.002, opt_method="adam")),
    "complex_WN18RR": ("ComplEx", dict(dim=200),
                       dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                       dict(loss=("softplus", dict()), regul_rate=1.0),
                       dict(train_times=2000, alpha=0.5, opt_method="adagrad")),
    "analogy_WN18RR": ("Analogy", dict(dim=200),
                       dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                       dict(loss=("softplus", dict()), regul_rate=1.0),
                       dict(train_times=2000, alpha=0.5, opt_method="adagrad")),
    "simple_WN18RR": ("SimplE", dict(dim=200),
                      dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                      dict(loss=("softplus", dict()), regul_rate=1.0),
                      dict(train_times=2000, alpha=0.5, opt_method="adagrad")),
    "hole_WN18RR": ("HolE", dict(dim=100),
                    dict(nbatches=100, bern_flag=1, filter_flag=1, neg_ent=25),
                    dict(loss=("softplus", dict()), regul_rate=1.0),
                    dict(train_times=1000, alpha=0.5, opt_method="adagrad")),
    "rotate_WN18RR_adv": ("RotatE", dict(dim=1024, margin=6.0, epsilon=2.0),
                          dict(batch_size=2000, bern_flag=0, filter_flag=1,
                               neg_ent=64, sampling_mode="cross"),
                          dict(loss=("sigmoid", dict(adv_temperature=2.0))),
                          dict(train_times=6000, alpha=2e-5, opt_method="adam")),
}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--recipe", required=True, choices=sorted(RECIPES))
    parser.add_argument("--in_path", default="")
    parser.add_argument("--train_times", type=int, default=None)
    parser.add_argument("--dim", type=int, default=None)
    parser.add_argument("--type_constrain", action="store_true")
    parser.add_argument("--checkpoint", default="")
    args = parser.parse_args(argv)

    from mre_tpu import openke as ok
    from mre_tpu.openke.module import MarginLoss, SigmoidLoss, SoftplusLoss

    model_name, model_kw, loader_kw, strat_kw, train_kw = RECIPES[args.recipe]
    model_kw, loader_kw = dict(model_kw), dict(loader_kw)
    strat_kw, train_kw = dict(strat_kw), dict(train_kw)
    if args.dim:
        for k in ("dim", "dim_e", "dim_r"):
            if k in model_kw:
                model_kw[k] = args.dim
    if args.train_times:
        train_kw["train_times"] = args.train_times

    in_path = args.in_path
    if not in_path:
        from mre_tpu.data.fixtures import write_openke_benchmark

        in_path = tempfile.mkdtemp() + "/"
        write_openke_benchmark(in_path, n_ent=200, n_rel=12, n_train=2000,
                               n_valid=200, n_test=200)
        print(f"[examples] no --in_path given; synthetic benchmark at {in_path}",
              file=sys.stderr)

    loader = ok.TrainDataLoader(in_path=in_path, threads=8, **loader_kw)
    model_cls = getattr(ok, model_name)
    # pass exactly the constructor args this wrapper supports (margin/epsilon
    # reach the init-range branch for the models that have one upstream)
    import inspect
    accepted = inspect.signature(model_cls.__init__).parameters
    model_kw = {k: v for k, v in model_kw.items() if k in accepted}
    model = model_cls(loader.get_ent_tot(), loader.get_rel_tot(), **model_kw)

    loss_name, loss_kw = strat_kw.pop("loss")
    loss = {"margin": MarginLoss, "sigmoid": SigmoidLoss,
            "softplus": SoftplusLoss}[loss_name](**loss_kw)
    strategy = ok.NegativeSampling(model=model, loss=loss,
                                   batch_size=loader.get_batch_size(), **strat_kw)

    trainer = ok.Trainer(model=strategy, data_loader=loader, log_every=50, **train_kw)
    trainer.run()
    if args.checkpoint:
        model.save_checkpoint(args.checkpoint)

    tester = ok.Tester(model=model, data_loader=ok.TestDataLoader(in_path=in_path))
    return tester.run_link_prediction(type_constrain=args.type_constrain)


if __name__ == "__main__":
    main()
