import os

import numpy as np
import pytest

from mre_tpu.data import fixtures


@pytest.fixture(scope="module")
def bench_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bench")) + "/"
    fixtures.write_openke_benchmark(path, n_ent=40, n_rel=5, n_train=250,
                                    n_valid=25, n_test=25, seed=3)
    return path


def test_native_sampler_builds_and_filters(bench_dir):
    from mre_tpu.openke.data import TrainDataLoader, read_benchmark

    loader = TrainDataLoader(in_path=bench_dir, nbatches=5, threads=2,
                             bern_flag=1, filter_flag=1, neg_ent=4, seed=42)
    bench = read_benchmark(bench_dir)
    from mre_tpu.data.kg import TripleTable

    table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
    for data in loader:
        B = loader.batch_size
        assert data["batch_h"].shape == (B * 5,)
        assert (data["batch_y"][:B] == 1).all() and (data["batch_y"][B:] == -1).all()
        # positives must be real train triples
        pos_ok = table.contains(data["batch_h"][:B], data["batch_r"][:B], data["batch_t"][:B])
        assert pos_ok.all()
        # negatives must be filtered (never true train triples)
        neg = table.contains(data["batch_h"][B:], data["batch_r"][B:], data["batch_t"][B:])
        assert not neg.any()


def test_jax_backend_same_contract(bench_dir):
    from mre_tpu.openke.data import TrainDataLoader

    loader = TrainDataLoader(in_path=bench_dir, nbatches=3, neg_ent=2,
                             backend="jax", seed=7)
    data = loader.sample()
    B = loader.batch_size
    assert data["batch_h"].shape == (B * 3,)
    assert (data["batch_y"][:B] == 1).all()


def test_openke_pipeline_end_to_end(bench_dir):
    from mre_tpu.openke import (MarginLoss, NegativeSampling, Tester,
                                TestDataLoader, TrainDataLoader, TransE, Trainer)

    loader = TrainDataLoader(in_path=bench_dir, nbatches=4, threads=2,
                             bern_flag=1, filter_flag=1, neg_ent=4, seed=0)
    model = TransE(loader.get_ent_tot(), loader.get_rel_tot(), dim=16)
    strategy = NegativeSampling(model=model, loss=MarginLoss(margin=3.0),
                                batch_size=loader.get_batch_size())
    trainer = Trainer(model=strategy, data_loader=loader, train_times=30,
                      alpha=0.05, opt_method="adam", log_every=1000)
    final = trainer.run()
    assert np.isfinite(final)

    tester = Tester(model=model, data_loader=TestDataLoader(in_path=bench_dir))
    mrr, mr, h10, h3, h1 = tester.run_link_prediction()
    assert 0 < mrr <= 1 and mr >= 1

    # native Test.h-style accumulation must agree with the batched evaluator
    tester_native = Tester(model=model, data_loader=TestDataLoader(in_path=bench_dir),
                           use_native_test=True)
    mrr_n, mr_n, h10_n, h3_n, h1_n = tester_native.run_link_prediction()
    np.testing.assert_allclose(mrr, mrr_n, rtol=1e-4)
    np.testing.assert_allclose(h10, h10_n, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(mr, mr_n, rtol=1e-4)


def test_type_constrained_eval(bench_dir):
    from mre_tpu.openke import Tester, TestDataLoader, TransE

    model = TransE(40, 5, dim=8)
    tester = Tester(model=model, data_loader=TestDataLoader(in_path=bench_dir))
    out = tester.run_link_prediction(type_constrain=True)
    assert all(np.isfinite(v) for v in out)


def test_triple_classification(bench_dir):
    from mre_tpu.openke import Tester, TestDataLoader, TransE

    model = TransE(40, 5, dim=8)
    tester = Tester(model=model, data_loader=TestDataLoader(in_path=bench_dir))
    acc, thr = tester.run_triple_classification()
    assert 0.0 <= acc <= 1.0


def test_parameter_transfer_transe_to_transr():
    from mre_tpu.openke import TransE, TransR

    te = TransE(20, 4, dim=8, seed=0)
    tr = TransR(20, 4, dim_e=8, dim_r=8, seed=1)
    tr.set_parameters(te.get_parameters())
    np.testing.assert_array_equal(np.asarray(tr.params["ent"]), np.asarray(te.params["ent"]))
    np.testing.assert_array_equal(np.asarray(tr.params["rel"]), np.asarray(te.params["rel"]))
    assert "mat" in tr.params
