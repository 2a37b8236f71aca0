"""Unit tests for the KGE parity runner's recipe→config mapping."""

import numpy as np
import pytest

from experiments.kge_parity import build_config, DERIVED, PUBLISHED


def test_rotate_adv_config():
    cfg = build_config("rotate_WN18RR_adv", train_total=86835)
    assert cfg.model == "rotate" and cfg.dim == 1024
    assert cfg.loss == "sigmoid" and cfg.adv_temperature == 2.0
    assert cfg.batch_size == 2000 and cfg.nbatches == 86835 // 2000
    assert cfg.opt_method == "adam" and cfg.alpha == 2e-5
    assert cfg.train_times == 6000 and not cfg.bern
    assert cfg.init_kwargs == {"margin": 6.0, "epsilon": 2.0}


def test_rotate_plain_drops_adv():
    cfg = build_config("rotate_WN18RR", train_total=86835)
    assert cfg.adv_temperature is None and cfg.loss == "sigmoid"


def test_transe_fb_config():
    cfg = build_config("transe_FB15K237", train_total=272115)
    assert cfg.model == "transe" and cfg.dim == 200
    assert cfg.loss == "margin" and cfg.margin == 5.0
    assert cfg.nbatches == 100 and cfg.batch_size == 272115 // 100
    assert cfg.bern and cfg.opt_method == "sgd" and cfg.alpha == 1.0


def test_derived_cells_reuse_sibling_recipes():
    cfg_wn = build_config("transe_WN18RR", train_total=86835)
    cfg_fb = build_config("transe_FB15K237", train_total=86835)
    assert cfg_wn == cfg_fb  # same hyperparameters, dataset-independent


def test_adagrad_recipes_map_regularization():
    cfg = build_config("distmult_WN18RR", train_total=86835)
    assert cfg.opt_method == "adagrad" and cfg.loss == "softplus"
    assert cfg.regul_rate == 1.0 and cfg.alpha == 0.5


def test_published_table_covers_16_cells():
    # 16 README cells (OpenKE/README.md:90-98) + 4 `_adv`-suffixed aliases:
    # an adv-recipe run of a model whose README row is recipe-agnostic
    # (distmult/complex) must compare against the SAME published value.
    aliases = {k: v for k, v in PUBLISHED.items() if k[0].endswith("_adv")
               and k[0] not in ("rotate_adv",)}
    core = {k: v for k, v in PUBLISHED.items() if k not in aliases}
    assert len(core) == 16
    for (model, ds), v in aliases.items():
        assert PUBLISHED[(model[:-4], ds)] == v
    for (model, ds), v in PUBLISHED.items():
        assert ds in ("WN18RR", "FB15K237") and 0.4 < v < 0.6


def test_checkpoint_resume_roundtrip(tmp_path):
    """save_state/load_state restore params, optimizer state, and rng
    exactly, so a resumed run continues the same trajectory."""
    import jax
    import numpy as np

    from experiments.kge_parity import load_state, save_state
    from mre_tpu.data.fixtures import write_openke_benchmark
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    from mre_tpu.train.kge import KGETrainer, KGETrainerConfig

    d = str(tmp_path) + "/"
    write_openke_benchmark(d, n_ent=60, n_rel=5, n_train=300)
    bench = read_benchmark(d)
    table = TripleTable.build(bench["train"], 60, 5)
    cfg = KGETrainerConfig(model="transe", dim=16, batch_size=32, neg_ent=4,
                           train_times=4, nbatches=3, opt_method="adam", alpha=1e-3)

    def run(trainer, n):
        for _ in range(n):
            trainer.params, trainer.opt_state, trainer._rng, stats = trainer._epoch_fn(
                trainer.params, trainer.opt_state, trainer._rng, n_steps=cfg.nbatches)
        return stats["loss"]

    a = KGETrainer(table, cfg)
    run(a, 2)
    ckpt = str(tmp_path / "state.ckpt")
    save_state(ckpt, a, 2)
    final_a = float(run(a, 2))

    b = KGETrainer(table, cfg)
    epoch = load_state(ckpt, b)
    assert epoch == 2
    final_b = float(run(b, 2))
    np.testing.assert_allclose(final_a, final_b, rtol=1e-5)
