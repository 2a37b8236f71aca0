"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    x_gcn, rel_emb = out
    assert np.isfinite(np.asarray(x_gcn)).all()
    assert np.isfinite(np.asarray(rel_emb)).all()


def test_kge_step_sharded_batch():
    """Data-parallel KGE step: batch sharded over an 8-way mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mre_tpu.data.kg import TripleTable
    from mre_tpu.parallel import mesh as pmesh
    from mre_tpu.train.kge import KGETrainer, KGETrainerConfig

    rng = np.random.default_rng(0)
    tri = np.stack([rng.integers(0, 64, 600), rng.integers(0, 6, 600),
                    rng.integers(0, 64, 600)], 1).astype(np.int32)
    table = TripleTable.build(tri, 64, 6)
    mesh = pmesh.make_mesh(n_data=8)
    trainer = KGETrainer(table, KGETrainerConfig(
        model="distmult", dim=16, batch_size=64, neg_ent=4,
        train_times=1, nbatches=2, loss="sigmoid", opt_method="adam", alpha=1e-3),
        mesh=mesh)
    params = jax.device_put(trainer.params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(trainer.opt_state, NamedSharding(mesh, P()))
    out = trainer._step(params, opt_state, trainer._rng)
    loss_dp = float(out[-1]["loss"])
    assert np.isfinite(loss_dp)

    # same seed, no mesh: the dp-sharded step (batch constrained over 'data',
    # gradients all-reduced by GSPMD) must be numerically the 1-device step
    cfg = trainer.cfg
    ref = KGETrainer(table, cfg)
    ref_out = ref._step(ref.params, ref.opt_state, ref._rng)
    np.testing.assert_allclose(loss_dp, float(ref_out[-1]["loss"]),
                               rtol=2e-5, atol=1e-6)


def test_fusion_trainer_with_mesh():
    """FusionTrainer with an 8-device mesh shards batches and trains."""
    import numpy as np

    import __graft_entry__ as ge
    from mre_tpu.parallel import mesh as pmesh

    trainer = ge._tiny_setup()
    trainer.mesh = pmesh.make_mesh(n_data=8)
    info = trainer.train_step(next(iter(trainer.sampler)))
    assert np.isfinite(info["loss"])


def test_fusion_ffn_tensor_parallel_matches_replicated():
    """generate_ent_embeddings with Megatron-style FFN sharding over the
    model axis must agree with the replicated sweep."""
    import __graft_entry__ as g
    from mre_tpu.parallel import mesh as pmesh

    trainer = g._tiny_setup()
    mesh = pmesh.make_mesh(n_data=4, n_model=2)
    emb_tp = np.asarray(trainer.generate_ent_embeddings(batch_size=8, mesh=mesh))
    emb_1d = np.asarray(trainer.generate_ent_embeddings(batch_size=8))
    np.testing.assert_allclose(emb_tp, emb_1d, rtol=2e-4, atol=2e-5)


def test_rel_shared_eval_sharded_matches_single():
    """Mesh-sharded rel_shared candidate ranking (chunks data-parallel over
    the 8-device mesh) must produce ranks identical to the single-device
    scan, including with a chunk count that needs padding to the axis."""
    from mre_tpu.eval.zero_shot import evaluate_zero_shot_rel_shared
    from mre_tpu.parallel import mesh as pmesh
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    n_ent, D = 40, 8
    T = jnp.asarray(rng.randn(n_ent, D).astype(np.float32))

    def embed_rel_block(heads, shared):
        return T[heads][:, None, :] + 2.0 * T[shared][None, :, :]

    def embed_true(heads, trues):
        return T[heads] + 2.0 * T[trues]

    names = [f"e{i}" for i in range(n_ent)]
    e2id = {n: i for i, n in enumerate(names)}
    test_candidates = {}
    for r in range(3):
        rel = f"rel{r}"
        pool = rng.choice(n_ent, size=12, replace=False)
        queries = {}
        for k in range(5 + r):
            head = names[(3 * k + r) % n_ent]
            true = names[(5 * k + 2 * r + 1) % n_ent]
            negs = [names[i] for i in pool[rng.rand(len(pool)) < 0.8]]
            queries[f"{head}\t{rel}\t{true}"] = [true] + negs
        test_candidates[rel] = queries

    def gen_rel_vecs(rel):
        rs = np.random.RandomState(100 + int(rel[3:]))
        return rs.randn(4, D).astype(np.float32)

    kw = dict(query_chunk=4, verbose=False, return_ranks=True)
    ref = evaluate_zero_shot_rel_shared(
        test_candidates, e2id, embed_rel_block, embed_true, gen_rel_vecs, **kw)
    mesh = pmesh.make_mesh(n_data=8)
    out = evaluate_zero_shot_rel_shared(
        test_candidates, e2id, embed_rel_block, embed_true, gen_rel_vecs,
        mesh=mesh, **kw)
    np.testing.assert_array_equal(out["ranks"], ref["ranks"])
    assert out["n"] == ref["n"] > 0
    for m in ("hits10", "hits5", "hits1", "mrr"):
        assert out[m] == ref[m]
