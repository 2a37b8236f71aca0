import numpy as np

from mre_tpu.data.kg import TripleTable
from mre_tpu.train.kge import KGETrainer, KGETrainerConfig


def make_structured_kg(n_groups=6, group=8, seed=0):
    """A clustered KG where entities in a group are linked by relation 0 —
    learnable structure, so training must beat random ranking."""
    rng = np.random.default_rng(seed)
    triples = []
    for g in range(n_groups):
        ents = np.arange(g * group, (g + 1) * group)
        for h in ents:
            for t in rng.choice(ents, 3, replace=False):
                if h != t:
                    triples.append([h, 0, t])
    triples = np.unique(np.asarray(triples, np.int32), axis=0)
    return TripleTable.build(triples, n_groups * group, 1)


def test_transe_learns_structure():
    table = make_structured_kg()
    rng = np.random.default_rng(1)
    idx = rng.permutation(table.n_triples)
    train = table.triples[idx[:-20]]
    test = table.triples[idx[-20:]]
    train_table = TripleTable.build(train, table.n_entities, table.n_relations)

    cfg = KGETrainerConfig(model="transe", dim=16, margin=2.0, neg_ent=4,
                           batch_size=64, train_times=60, nbatches=4,
                           opt_method="adam", alpha=0.01, bern=False)
    trainer = KGETrainer(train_table, cfg)
    first = None
    # capture loss trajectory
    for epoch in range(cfg.train_times):
        loss = 0.0
        for _ in range(cfg.nbatches):
            trainer.params, trainer.opt_state, trainer._rng, v = trainer._step(
                trainer.params, trainer.opt_state, trainer._rng)
            loss += float(v["loss"])
        if first is None:
            first = loss
    assert loss < first, "training loss must decrease"

    res = trainer.link_prediction(test, filter_table=table, chunk=8)
    # random filtered hits@10 baseline ≈ 10/48; structure must beat 2x that
    assert res["filter"].hits10 > 0.4, res["filter"]


def test_all_models_one_step():
    table = make_structured_kg(n_groups=3, group=6)
    for name in ["transe", "transh", "transr", "transd", "distmult", "complex",
                 "rescal", "analogy", "simple", "rotate", "hole"]:
        loss = "margin" if name in ("transe", "transh", "transr", "transd", "rescal") else "sigmoid"
        cfg = KGETrainerConfig(model=name, dim=8, neg_ent=2, batch_size=16,
                               train_times=1, nbatches=2, loss=loss,
                               opt_method="adam", alpha=0.001)
        trainer = KGETrainer(table, cfg)
        final = trainer.run()
        assert np.isfinite(final), name


def test_transe_sigmoid_margin_flag_learns():
    """Reference margin_flag semantics: a distance model trained with the
    sigmoid adv loss (examples/train_transe_WN18_adv_sigmoidloss.py — which
    despite its name trains on WN18RR) must feed margin − distance to the
    loss. The broken orientation (raw distance) pushes positive distances UP
    and ranking collapses; correct wiring must learn the clustered KG."""
    table = make_structured_kg()
    rng = np.random.default_rng(2)
    idx = rng.permutation(table.n_triples)
    train = table.triples[idx[:-20]]
    test = table.triples[idx[-20:]]
    train_table = TripleTable.build(train, table.n_entities, table.n_relations)

    cfg = KGETrainerConfig(model="transe", dim=16, margin=4.0, margin_flag=True,
                           norm_flag=False,
                           loss="sigmoid", adv_temperature=1.0, neg_ent=4,
                           batch_size=64, train_times=80, nbatches=4,
                           opt_method="adam", alpha=0.01, bern=False)
    trainer = KGETrainer(train_table, cfg)
    trainer.run()
    res = trainer.link_prediction(test, filter_table=table, chunk=8)
    assert res["filter"].hits10 > 0.4, res["filter"]

    # And the loss value must equal sigmoid_loss(margin − d_p, margin − d_n).
    import jax.numpy as jnp
    from mre_tpu.ops import losses as L
    from mre_tpu.ops import sampling
    import jax
    batch = sampling.sample_training_batch(
        jax.random.key(0), trainer.kg, cfg.batch_size, cfg.neg_ent, cfg.bern)
    got = float(trainer._loss_fn(trainer.params, batch))
    model = trainer.model
    p = model.score(trainer.params, batch.h, batch.r, batch.t,
                    p_norm=cfg.p_norm, norm_flag=cfg.norm_flag)[:, None]
    n = model.score(trainer.params, batch.neg_h,
                    jnp.broadcast_to(batch.r[:, None], batch.neg_h.shape),
                    batch.neg_t, p_norm=cfg.p_norm, norm_flag=cfg.norm_flag)
    want = float(L.sigmoid_loss(cfg.margin - p, cfg.margin - n,
                                adv_temperature=cfg.adv_temperature))
    assert abs(got - want) < 1e-5


def test_transe_sigmoid_without_margin_flag_uses_raw_distance():
    """margin_flag is opt-in (reference TransE.py:24-33: margin=None →
    margin_flag False → forward returns the raw distance). A sigmoid-loss
    config that never set margin_flag must NOT fold cfg.margin's default
    into the loss (advisor finding, round 3)."""
    import jax
    import jax.numpy as jnp

    from mre_tpu.ops import losses as L
    from mre_tpu.ops import sampling

    table = make_structured_kg()
    cfg = KGETrainerConfig(model="transe", dim=16, norm_flag=False,
                           loss="sigmoid", neg_ent=4, batch_size=64,
                           train_times=1, nbatches=1, opt_method="adam",
                           alpha=0.01, bern=False)
    assert not cfg.margin_flag
    trainer = KGETrainer(table, cfg)
    batch = sampling.sample_training_batch(
        jax.random.key(0), trainer.kg, cfg.batch_size, cfg.neg_ent, cfg.bern)
    got = float(trainer._loss_fn(trainer.params, batch))
    model = trainer.model
    p = model.score(trainer.params, batch.h, batch.r, batch.t,
                    p_norm=cfg.p_norm, norm_flag=cfg.norm_flag)[:, None]
    n = model.score(trainer.params, batch.neg_h,
                    jnp.broadcast_to(batch.r[:, None], batch.neg_h.shape),
                    batch.neg_t, p_norm=cfg.p_norm, norm_flag=cfg.norm_flag)
    want = float(L.sigmoid_loss(p, n))
    assert abs(got - want) < 1e-5
