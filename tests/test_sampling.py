import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mre_tpu.data.kg import DeviceKG
from mre_tpu.ops import sampling


@pytest.fixture(scope="module")
def dkg(tiny_kg):
    return DeviceKG.from_table(tiny_kg)


def test_corrupt_tails_never_true(tiny_kg, dkg):
    key = jax.random.key(0)
    h = jnp.asarray(tiny_kg.triples[:, 0])
    r = jnp.asarray(tiny_kg.triples[:, 1])
    for seed in range(5):
        neg = sampling.corrupt_tails(jax.random.key(seed), dkg, h, r)
        neg = np.asarray(neg)
        assert (neg >= 0).all() and (neg < tiny_kg.n_entities).all()
        assert not tiny_kg.contains(np.asarray(h), np.asarray(r), neg).any()


def test_corrupt_heads_never_true(tiny_kg, dkg):
    t = jnp.asarray(tiny_kg.triples[:, 2])
    r = jnp.asarray(tiny_kg.triples[:, 1])
    for seed in range(5):
        neg = np.asarray(sampling.corrupt_heads(jax.random.key(seed), dkg, t, r))
        assert not tiny_kg.contains(neg, np.asarray(r), np.asarray(t)).any()


def test_exact_path_uniform_over_complement(tiny_kg, dkg):
    # for a fixed (h, r), the sampled tails should cover the complement
    h0, r0 = int(tiny_kg.triples[0, 0]), int(tiny_kg.triples[0, 1])
    true = set(tiny_kg.true_tails(h0, r0).tolist())
    B = 4000
    h = jnp.full((B,), h0, jnp.int32)
    r = jnp.full((B,), r0, jnp.int32)
    neg = np.asarray(sampling.corrupt_tails(jax.random.key(7), dkg, h, r))
    seen = set(neg.tolist())
    assert seen.isdisjoint(true)
    complement = set(range(tiny_kg.n_entities)) - true
    # should hit nearly all of a 50-element complement with 4000 draws
    assert len(seen) >= len(complement) - 1
    # roughly uniform: no value takes more than 3x the expected share
    counts = np.bincount(neg, minlength=tiny_kg.n_entities)
    assert counts.max() <= 3 * B / len(complement)


def test_corrupt_batch_layout(tiny_kg, dkg):
    key = jax.random.key(3)
    batch = sampling.sample_training_batch(key, dkg, batch_size=32, n_neg=5, bern=True)
    assert batch.h.shape == (32,)
    assert batch.neg_h.shape == (32, 5)
    # each negative differs from the positive on exactly one side
    nh, nt = np.asarray(batch.neg_h), np.asarray(batch.neg_t)
    h, t = np.asarray(batch.h)[:, None], np.asarray(batch.t)[:, None]
    changed_h = nh != h
    changed_t = nt != t
    assert not np.logical_and(changed_h, changed_t).any()
    # negatives are filtered
    r = np.repeat(np.asarray(batch.r)[:, None], 5, 1)
    assert not tiny_kg.contains(nh.ravel(), r.ravel(), nt.ravel()).any()


def test_corrupt_within_nodes(tiny_kg, dkg):
    # local subgraph = first 20 entities
    n_id = jnp.arange(20, dtype=jnp.int32)
    tri = tiny_kg.triples[(tiny_kg.triples[:, 0] < 20) & (tiny_kg.triples[:, 2] < 20)]
    if len(tri) == 0:
        pytest.skip("no local triples in fixture")
    h_l = jnp.asarray(tri[:, 0])
    r = jnp.asarray(tri[:, 1])
    t_l = jnp.asarray(tri[:, 2])
    neg_h, neg_t, failed = sampling.corrupt_within_nodes(
        jax.random.key(0), dkg, n_id, h_l, r, t_l, n_neg=4)
    neg_h, neg_t, failed = np.asarray(neg_h), np.asarray(neg_t), np.asarray(failed)
    assert (neg_h < 20).all() and (neg_t < 20).all()
    rr = np.repeat(tri[:, 1][:, None], 4, 1)
    # any corrupted pair must not be a true triple (unless it stayed positive
    # because rejection failed every round — possible only in tiny graphs —
    # and then the returned failure mask MUST mark it)
    same = (neg_h == tri[:, 0][:, None]) & (neg_t == tri[:, 2][:, None])
    is_true = tiny_kg.contains(neg_h.ravel(), rr.ravel(), neg_t.ravel()).reshape(neg_h.shape)
    assert np.logical_or(~is_true, same).all()
    # an entry kept the positive pair iff every rejection round failed
    assert (failed == same).all()


def test_corrupt_within_nodes_failure_counter():
    """Dense local subgraph (every pair a true triple): rejection must fail
    every round and the failure mask must say so; sparse subgraph: zero
    failures (round-3 verdict: degradation must be observable)."""
    import jax

    from mre_tpu.data.kg import TripleTable

    # complete digraph on 6 nodes (self-loops included), one relation — no
    # valid negatives exist at all
    ents = np.arange(6)
    tri = np.asarray([[h, 0, t] for h in ents for t in ents], np.int32)
    table = TripleTable.build(tri, 6, 1)
    dkg = sampling.DeviceKG.from_table(table)
    n_id = jnp.arange(6, dtype=jnp.int32)
    h_l = jnp.asarray(tri[:, 0])
    r = jnp.asarray(tri[:, 1])
    t_l = jnp.asarray(tri[:, 2])
    _, _, failed = sampling.corrupt_within_nodes(
        jax.random.key(0), dkg, n_id, h_l, r, t_l, n_neg=3)
    assert np.asarray(failed).all()

    # sparse graph at reference-like sparsity: no failures
    rng = np.random.default_rng(0)
    tri2 = np.unique(np.stack([rng.integers(0, 200, 300),
                               rng.integers(0, 4, 300),
                               rng.integers(0, 200, 300)], 1).astype(np.int32), axis=0)
    table2 = TripleTable.build(tri2, 200, 4)
    dkg2 = sampling.DeviceKG.from_table(table2)
    _, _, failed2 = sampling.corrupt_within_nodes(
        jax.random.key(1), dkg2, jnp.arange(200, dtype=jnp.int32),
        jnp.asarray(tri2[:64, 0]), jnp.asarray(tri2[:64, 1]),
        jnp.asarray(tri2[:64, 2]), n_neg=4)
    assert not np.asarray(failed2).any()


def test_corrupt_relations_excludes_true(tiny_kg, dkg):
    import jax
    import jax.numpy as jnp

    r = jnp.asarray(tiny_kg.triples[:50, 1])
    neg = np.asarray(sampling.corrupt_relations(jax.random.key(0), dkg, r, n_neg=8))
    assert neg.shape == (50, 8)
    assert (neg >= 0).all() and (neg < tiny_kg.n_relations).all()
    assert not (neg == np.asarray(r)[:, None]).any()


def test_corrupt_relations_filtered_vs_bruteforce(tiny_kg, dkg):
    """The (h, t)-filtered relation corruption never yields a relation that
    forms a true triple, and covers the whole complement
    (base/Corrupt.h:95-134 semantics, on device)."""
    import jax
    import jax.numpy as jnp

    tri = tiny_kg.triples[:40]
    h, r, t = (jnp.asarray(tri[:, i]) for i in range(3))
    neg = np.asarray(sampling.corrupt_relations(
        jax.random.key(1), dkg, r, n_neg=32, h=h, t=t))
    assert neg.shape == (40, 32)
    is_true = tiny_kg.contains(
        np.repeat(tri[:, 0], 32), neg.ravel(), np.repeat(tri[:, 2], 32))
    assert not is_true.any()
    # coverage: for the first positive, all non-true relations appear
    pair_true = {rr for (hh, rr, tt) in tiny_kg.triples.tolist()
                 if hh == int(tri[0, 0]) and tt == int(tri[0, 2])}
    many = np.asarray(sampling.corrupt_relations(
        jax.random.key(2), dkg, r[:1], n_neg=512, h=h[:1], t=t[:1]))
    assert set(many.ravel().tolist()) == set(range(tiny_kg.n_relations)) - pair_true


def test_compact_device_kg_matches_dense(tiny_kg, dkg):
    """Row-compacted DeviceKG (large-KG mode) must be bit-identical to the
    dense layout for sampling, membership, and ranking filters."""
    ckg = DeviceKG.from_table(tiny_kg, compact=True)
    assert ckg.hr_row_keys is not None
    assert ckg.hr_offsets.shape[0] < dkg.hr_offsets.shape[0]
    assert ckg.max_row_len() == dkg.max_row_len()

    h = jnp.asarray(tiny_kg.triples[:, 0])
    r = jnp.asarray(tiny_kg.triples[:, 1])
    t = jnp.asarray(tiny_kg.triples[:, 2])

    for seed in range(3):
        key = jax.random.key(seed)
        np.testing.assert_array_equal(
            np.asarray(sampling.corrupt_tails(key, dkg, h, r)),
            np.asarray(sampling.corrupt_tails(key, ckg, h, r)))
        np.testing.assert_array_equal(
            np.asarray(sampling.corrupt_heads(key, dkg, t, r)),
            np.asarray(sampling.corrupt_heads(key, ckg, t, r)))
        bd = sampling.corrupt_batch(key, dkg, h, r, t, n_neg=4, bern=True)
        bc = sampling.corrupt_batch(key, ckg, h, r, t, n_neg=4, bern=True)
        np.testing.assert_array_equal(np.asarray(bd.neg_h), np.asarray(bc.neg_h))
        np.testing.assert_array_equal(np.asarray(bd.neg_t), np.asarray(bc.neg_t))

    # membership on true triples and on absent (row missing) queries
    probe_h = jnp.concatenate([h, jnp.asarray([0, 1, 2], jnp.int32)])
    probe_r = jnp.concatenate([r, jnp.asarray([0, 0, 1], jnp.int32)])
    probe_t = jnp.concatenate([t, jnp.asarray([3, 4, 5], jnp.int32)])
    np.testing.assert_array_equal(
        np.asarray(sampling._contains(dkg, probe_h, probe_r, probe_t)),
        np.asarray(sampling._contains(ckg, probe_h, probe_r, probe_t)))

    from mre_tpu.ops.ranking import _filter_mask
    for side in ("tail", "head"):
        anchors = h if side == "tail" else t
        np.testing.assert_array_equal(
            np.asarray(_filter_mask(dkg, anchors, r, side, dkg.n_entities, 64)),
            np.asarray(_filter_mask(ckg, anchors, r, side, ckg.n_entities, 64)))


def test_corrupt_relations_all_true_returns_positive(tiny_kg):
    """Pair with every relation true: empty complement → return the positive
    r itself (native guard `k >= relationTotal → r`, sampler.cpp)."""
    R = tiny_kg.n_relations
    h0, t0 = 0, 1
    triples = np.array([[h0, rr, t0] for rr in range(R)]
                       + [[2, 0, 3], [3, 1, 4]], np.int32)
    from mre_tpu.data.kg import TripleTable
    table = TripleTable.build(triples, tiny_kg.n_entities, R)
    kg = DeviceKG.from_table(table)
    r = jnp.asarray([2, 0], jnp.int32)
    h = jnp.asarray([h0, 2], jnp.int32)
    t = jnp.asarray([t0, 3], jnp.int32)
    neg = np.asarray(sampling.corrupt_relations(
        jax.random.key(0), kg, r, n_neg=8, h=h, t=t))
    assert (neg[0] == 2).all()                     # degenerate row → positive
    assert (neg[1] != 0).all() and (neg[1] < R).all()   # normal row filtered


def test_overflow_truncation_counter():
    """Tier-2 compaction: exact (counter 0) for <=8192 draws and for uniform
    batches at the sized slots; truncation on an adversarial oversized batch
    must be COUNTED, not silent (round-3 verdict)."""
    import jax

    from mre_tpu.data.kg import TripleTable

    # one (h, r) row with 200 true tails (> EXACT_PAD=128) plus ~3000 small
    # rows: overflow mass ~6% of triples, so the sized tier-2 compaction for
    # a >8192-draw batch is far below an ALL-big-row adversarial batch
    rng = np.random.default_rng(0)
    big = np.stack([np.zeros(200, np.int64), np.zeros(200, np.int64),
                    np.arange(1, 201)], 1)
    small = np.stack([rng.integers(1, 3000, 3000), np.zeros(3000, np.int64) + 1,
                      rng.integers(1, 3000, 3000)], 1)
    tri = np.unique(np.concatenate([big, small]).astype(np.int32), axis=0)
    table = TripleTable.build(tri, 3000, 2)
    kg = DeviceKG.from_table(table)
    assert kg.hr_big_d.shape[0] >= 1  # the big row is in tier 2

    # small batch hitting the big row: full tier-2 coverage, counter == 0
    B = 256
    h = jnp.zeros(B, jnp.int32)
    r = jnp.zeros(B, jnp.int32)
    t = jnp.ones(B, jnp.int32)
    nb = sampling.corrupt_batch(jax.random.key(0), kg, h, r, t, n_neg=8,
                                bern=False)
    assert int(nb.overflow_truncated) == 0
    # the draws that replaced the tail must dodge all 200 true tails
    side = np.asarray(nb.neg_side)
    ent = np.asarray(nb.neg_ent)
    assert not np.isin(ent[side], np.arange(1, 201)).any()

    # adversarial batch: 16384 draws ALL on the big row -> overflow draws
    # exceed the sized compaction slots; counter must be positive
    B2, n_neg = 2048, 8   # 16384 draws > 8192 threshold
    h2 = jnp.zeros(B2, jnp.int32)
    r2 = jnp.zeros(B2, jnp.int32)
    t2 = jnp.ones(B2, jnp.int32)
    nb2 = sampling.corrupt_batch(jax.random.key(1), kg, h2, r2, t2,
                                 n_neg=n_neg, bern=False)
    n_draws = B2 * n_neg
    side2 = np.asarray(nb2.neg_side)
    n_overflow = int(side2.sum())  # every tail-side draw hits the big row
    slots = sampling._overflow_slots(n_draws, float(kg.hr_overflow_frac))
    expected_trunc = max(n_overflow - slots, 0)
    assert int(nb2.overflow_truncated) == expected_trunc
    assert expected_trunc > 0  # the scenario actually exercises truncation


def test_corrupt_relations_prob_distribution(tmp_path):
    """On-device kl_prob-weighted relation corruption (Corrupt.h:86-134
    p=true): excluded true relations never drawn; empirical frequencies
    match the renormalized softmax weights; native sampler.cpp corruptRel
    agrees on the same benchmark."""
    import jax

    from mre_tpu.data.fixtures import write_openke_benchmark
    from mre_tpu.data.kg import TripleTable
    from mre_tpu.openke.data import read_benchmark

    d = str(tmp_path) + "/"
    write_openke_benchmark(d, n_ent=40, n_rel=6, n_train=300, n_valid=20,
                           n_test=20, seed=3)
    bench = read_benchmark(d)
    R = bench["n_relations"]
    rng = np.random.default_rng(0)
    kl = rng.uniform(0.1, 3.0, (R, R - 1)).astype(np.float32)
    np.savetxt(d + "kl_prob.txt", kl.reshape(-1)[None], fmt="%.6f")

    table = TripleTable.build(bench["train"], bench["n_entities"], R)
    kg = DeviceKG.from_table(table)
    prob = np.asarray(sampling.relation_prob_table(jnp.asarray(kl), 1.0))

    h0, r0, t0 = (int(x) for x in bench["train"][0])
    true_rels = {int(rr) for (hh, rr, tt) in map(tuple, bench["train"])
                 if hh == h0 and tt == t0}

    n = 20000
    draws = np.asarray(sampling.corrupt_relations_prob(
        jax.random.key(0), kg,
        jnp.full(n, h0, jnp.int32), jnp.full(n, t0, jnp.int32),
        jnp.full(n, r0, jnp.int32), jnp.asarray(prob), n_neg=1)).ravel()
    assert not np.isin(draws, list(true_rels)).any()
    assert not (draws == r0).any()

    # theoretical renormalized weights over the complement
    w = np.zeros(R)
    for c in range(R):
        if c == r0:
            continue
        w[c] = prob[r0, c - (c > r0)]
    for c in true_rels:
        if c != r0:
            w[c] = 0.0
    w /= w.sum()
    emp = np.bincount(draws, minlength=R) / n
    assert np.abs(emp - w).max() < 4 * np.sqrt(w.max() * (1 - w.min()) / n) + 0.01

    # native parity: sampler.cpp corruptRel(p=true) on the same files
    from mre_tpu.openke import native

    lib = native.load()
    lib.setInPath(d.encode())
    lib.setWorkThreads(1)
    lib.importTrainFiles()
    lib.importProb(1.0)
    lib.setSeed(7)
    assert int(lib.hasProb()) == 1
    nat = np.asarray([lib.corruptRel(h0, t0, r0, True, True)
                      for _ in range(n)])
    assert not np.isin(nat, list(true_rels)).any()
    emp_nat = np.bincount(nat, minlength=R) / n
    assert np.abs(emp_nat - w).max() < 4 * np.sqrt(w.max() / n) + 0.015
    # the two samplers draw from the same distribution
    assert np.abs(emp_nat - emp).max() < 0.02
