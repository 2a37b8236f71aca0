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
    neg_h, neg_t = sampling.corrupt_within_nodes(jax.random.key(0), dkg, n_id, h_l, r, t_l, n_neg=4)
    neg_h, neg_t = np.asarray(neg_h), np.asarray(neg_t)
    assert (neg_h < 20).all() and (neg_t < 20).all()
    rr = np.repeat(tri[:, 1][:, None], 4, 1)
    # any corrupted pair must not be a true triple (unless it stayed positive
    # because rejection failed every round — possible only in tiny graphs;
    # accept identity rows)
    same = (neg_h == tri[:, 0][:, None]) & (neg_t == tri[:, 2][:, None])
    is_true = tiny_kg.contains(neg_h.ravel(), rr.ravel(), neg_t.ravel()).reshape(neg_h.shape)
    assert np.logical_or(~is_true, same).all()


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
