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


@pytest.fixture(scope="module")
def native_lib(bench_dir):
    from mre_tpu.openke import native

    lib = native.load()
    lib.setInPath(bench_dir.encode())
    lib.setWorkThreads(2)
    lib.importTrainFiles()
    lib.importTestFiles()
    lib.setSeed(11)
    return lib


def test_native_corrupt_rel_filtered(bench_dir, native_lib):
    """corrupt_rel excludes every relation forming a true (h, ?, t) train
    triple (base/Corrupt.h:95-134 semantics)."""
    from mre_tpu.openke.data import read_benchmark

    bench = read_benchmark(bench_dir)
    train = {tuple(x) for x in bench["train"].tolist()}
    pairs_rels = {}
    for h, r, t in bench["train"].tolist():
        pairs_rels.setdefault((h, t), set()).add(r)
    # pick a pair with at least one true relation
    (h, t), true_rels = max(pairs_rels.items(), key=lambda kv: len(kv[1]))
    r = next(iter(true_rels))
    seen = set()
    for _ in range(300):
        rr = native_lib.corruptRel(h, t, r, False, True)
        assert (h, rr, t) not in train
        seen.add(int(rr))
    # complement coverage: every non-true relation is reachable
    complement = set(range(bench["n_relations"])) - true_rels
    assert seen == complement
    # unfiltered: only r itself is excluded
    seen_u = {int(native_lib.corruptRel(h, t, r, False, False)) for _ in range(300)}
    assert r not in seen_u and seen_u <= set(range(bench["n_relations"]))


def test_native_import_prob_weighted_rel(bench_dir, native_lib):
    """kl_prob.txt → softmax weights drive the p=true corruption branch
    (Reader.h:25-50 + Corrupt.h:104-134)."""
    from mre_tpu.openke.data import read_benchmark

    bench = read_benchmark(bench_dir)
    R = bench["n_relations"]
    # strong preference for the lowest-id non-true relation: divergence 0
    # for the first column, 50 elsewhere → softmax mass ≈ 1 on one relation
    with open(os.path.join(bench_dir, "kl_prob.txt"), "w") as f:
        for i in range(R):
            f.write(" ".join("0.0" if j == 0 else "50.0" for j in range(R - 1)) + "\n")
    native_lib.importProb(1.0)
    assert native_lib.hasProb() == 1

    train = {tuple(x) for x in bench["train"].tolist()}
    h, r, t = bench["train"][0].tolist()
    draws = [int(native_lib.corruptRel(h, t, r, True, True)) for _ in range(200)]
    assert all((h, rr, t) not in train for rr in draws)
    # prob row r column 0 maps to relation 0 (or 1 if r == 0); unless that
    # relation is a true one for (h, t), nearly all mass lands there.
    fav = 0 if r != 0 else 1
    if all((h2, rr2, t2) != (h, fav, t) for (h2, rr2, t2) in train):
        assert draws.count(fav) >= 190


def test_native_corrupt_type_tail(bench_dir, native_lib):
    """Type-constrained tail corruption draws from tail_type[r] with
    rejection, falling back to filtered corruption (Corrupt.h:179-195)."""
    from mre_tpu.openke.data import read_benchmark, read_type_constraints

    native_lib.importTypeFiles()
    bench = read_benchmark(bench_dir)
    tc = read_type_constraints(bench_dir, bench["n_relations"], bench["n_entities"])
    train = {tuple(x) for x in bench["train"].tolist()}
    h, r, t = bench["train"][1].tolist()
    tail_ok = set(np.nonzero(tc[1][r])[0].tolist())
    for _ in range(100):
        tt = int(native_lib.corruptTypeTail(h, r))
        assert (h, r, tt) not in train
        # either from the type set or the filtered fallback (valid entity)
        assert tt in tail_ok or 0 <= tt < bench["n_entities"]


def test_native_val_loss_batch(bench_dir, native_lib):
    """val_loss=true fills the batch with validation triples, label +1
    (Base.cpp:149-160)."""
    from mre_tpu.openke.data import read_benchmark

    bench = read_benchmark(bench_dir)
    n = len(bench["valid"])
    bh = np.zeros(n, np.int64); bt = np.zeros(n, np.int64)
    br = np.zeros(n, np.int64); by = np.zeros(n, np.float32)
    native_lib.sampling(bh.ctypes.data, bt.ctypes.data, br.ctypes.data,
                        by.ctypes.data, n, 0, 0, 0, True, False, True)
    assert (by == 1).all()
    valid = {tuple(x) for x in bench["valid"].tolist()}
    got = set(zip(bh.tolist(), br.tolist(), bt.tolist()))
    assert got <= valid and len(got) == len(valid)


def test_native_workthreads_resize_after_seed(bench_dir):
    """setWorkThreads after setSeed must not read past the rng vector
    (advisor finding: sampler.cpp:264)."""
    from mre_tpu.openke import native

    lib = native.load()
    lib.setInPath(bench_dir.encode())
    lib.setWorkThreads(1)
    lib.importTrainFiles()
    lib.setSeed(3)
    lib.setWorkThreads(8)          # more threads than seeded rngs
    n = 64
    bh = np.zeros(n * 3, np.int64); bt = np.zeros(n * 3, np.int64)
    br = np.zeros(n * 3, np.int64); by = np.zeros(n * 3, np.float32)
    lib.sampling(bh.ctypes.data, bt.ctypes.data, br.ctypes.data,
                 by.ctypes.data, n, 2, 0, 0, True, False, False)
    assert (by[:n] == 1).all() and (by[n:] == -1).all()


def test_train_loader_p_flag_imports_prob(bench_dir, native_lib):
    """TrainDataLoader(p=True) must actually load the kl_prob table (the
    flag was previously dead — importProb was never called)."""
    import os

    from mre_tpu.openke.data import TrainDataLoader, read_benchmark

    bench = read_benchmark(bench_dir)
    R = bench["n_relations"]
    with open(os.path.join(bench_dir, "kl_prob.txt"), "w") as f:
        for _ in range(R):
            f.write(" ".join("1.0" for _ in range(R - 1)) + "\n")
    loader = TrainDataLoader(in_path=bench_dir, nbatches=4, neg_rel=1,
                             p=True, seed=3)
    assert loader.lib.hasProb() == 1
    batch = next(iter(loader))
    assert batch["batch_r"].shape[0] == loader.batch_size * 3

    # the device backend now supports p=True too (round-4: on-device
    # kl_prob-weighted relation corruption, ops/sampling.py)
    dev = TrainDataLoader(in_path=bench_dir, nbatches=4, neg_rel=1,
                          p=True, backend="jax", seed=3)
    assert dev._prob is not None and dev._prob.shape == (R, R - 1)
    db = next(iter(dev))
    assert db["batch_r"].shape[0] == dev.batch_size * 3
    # the relation-corruption block must never contain the positive relation
    # (corrupt_relations_prob may return r only for a degenerate pair with
    # every relation true — impossible in this sparse seeded fixture)
    B = dev.batch_size
    pos_r = db["batch_r"][:B]
    neg_r = db["batch_r"][2 * B:]
    assert not (neg_r == pos_r).any()


def test_jax_backend_p_ignores_filter_flag_like_base_cpp(bench_dir):
    """Base.cpp parity quirk: the reference's sampling worker reads
    filter_flag (Base.cpp:91) but never passes it to corrupt_* — batch
    corruption is ALWAYS filtered and p always honored. filter_flag=0 must
    therefore produce the same filtered+weighted relation negatives as
    filter_flag=1 on both backends."""
    from mre_tpu.openke.data import TrainDataLoader

    R = 6
    kl = os.path.join(bench_dir, "kl_prob.txt")
    if not os.path.exists(kl):
        with open(kl, "w") as f:
            for _ in range(R):
                f.write(" ".join("1.0" for _ in range(R - 1)) + "\n")
    dev = TrainDataLoader(in_path=bench_dir, nbatches=4, neg_rel=1,
                          p=True, filter_flag=0, backend="jax", seed=5)
    db = next(iter(dev))
    B = dev.batch_size
    pos_r = db["batch_r"][:B]
    neg_r = db["batch_r"][2 * B:]
    assert not (neg_r == pos_r).any()
    assert (neg_r >= 0).all() and (neg_r < dev.get_rel_tot()).all()
    # filtered semantics even with filter_flag=0: no negative forms a true
    # (h, rr, t) train triple
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark
    bench = read_benchmark(bench_dir)
    table = TripleTable.build(bench["train"], bench["n_entities"],
                              bench["n_relations"])
    h = db["batch_h"][2 * B:]
    t = db["batch_t"][2 * B:]
    assert not table.contains(h, neg_r, t).any()
