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
    assert np.isfinite(float(out[-1]["loss"]))


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
