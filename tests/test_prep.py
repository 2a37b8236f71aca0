import numpy as np

from mre_tpu.data import prep


def make_tasks():
    rng = np.random.default_rng(0)
    tasks = {}
    for r in range(6):
        rows = []
        for _ in range(20):
            h, t = rng.integers(0, 30, 2)
            rows.append([f"e{h}", f"r{r}", f"e{t}"])
        tasks[f"r{r}"] = rows
    return tasks


def test_seen_unseen_split():
    tasks = make_tasks()
    train, test = prep.seen_unseen_split(tasks, n_unseen=2, seed=1)
    assert len(test) == 2 and len(train) == 4
    assert set(train) | set(test) == set(tasks)


def test_train_valid_split():
    """Reference semantics (utils/splitdata.py): ONE global shuffle and a
    global holdout — totals are exact, per-relation counts are random."""
    tasks = make_tasks()
    train, valid = prep.train_valid_split(tasks, ratio=0.8)
    total = sum(len(v) for v in tasks.values())
    n_train = sum(len(v) for v in train.values())
    n_valid = sum(len(v) for v in valid.values())
    assert n_train + n_valid == total
    assert n_train == int(total - total * 0.2)
    flat = {tuple(t) for rows in tasks.values() for t in rows}
    out = {tuple(t) for d in (train, valid) for rows in d.values() for t in rows}
    assert out == flat


def test_id_maps_and_e1rel_e2():
    tasks = make_tasks()
    e2id, r2id = prep.build_id_maps(tasks)
    assert len(r2id) == 6
    e1rel = prep.gen_e1rel_e2(tasks)
    h, r, t = tasks["r0"][0]
    assert t in e1rel[h + r]


def test_candidates_true_first():
    tasks = make_tasks()
    e2id, _ = prep.build_id_maps(tasks)
    rel2c = prep.gen_rel2candidates(tasks, list(e2id), n=10, seed=0)
    e1rel = prep.gen_e1rel_e2(tasks)
    cands = prep.gen_mode_candidates(tasks, rel2c, e1rel)
    for r, queries in cands.items():
        for key, lst in queries.items():
            h, rel, t = key.split("\t")
            assert lst[0] == t
            known = set(e1rel[h + rel])
            for c in lst[1:]:
                assert c != t and c not in known


def test_type_constraints():
    rng = np.random.default_rng(0)
    triples = np.stack([rng.integers(0, 20, 100), rng.integers(0, 4, 100),
                        rng.integers(0, 20, 100)], 1)
    head_type, tail_type, cats = prep.type_constraints(triples, 4)
    for r in range(4):
        rows = triples[triples[:, 1] == r]
        assert set(head_type[r]) == set(rows[:, 0].tolist())
        assert cats[r] in ("1-1", "1-n", "n-1", "n-n")


def test_write_type_constrain_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    triples = np.stack([rng.integers(0, 15, 60), rng.integers(0, 3, 60),
                        rng.integers(0, 15, 60)], 1)
    head_type, tail_type, _ = prep.type_constraints(triples, 3)
    path = str(tmp_path / "type_constrain.txt")
    prep.write_type_constrain_file(path, head_type, tail_type)
    from mre_tpu.openke.data import read_type_constraints

    masks = read_type_constraints(str(tmp_path) + "/", 3, 15)
    assert masks is not None
    head_mask, tail_mask = masks
    for r in range(3):
        assert set(np.where(head_mask[r])[0].tolist()) == set(head_type[r])
        assert set(np.where(tail_mask[r])[0].tolist()) == set(tail_type[r])


def test_embed_relation_texts():
    descs = ["alpha links to beta", "gamma connects delta", "alpha links to beta"]
    out = prep.embed_relation_texts(descs, dim=32)
    assert out.shape == (3, 32)
    np.testing.assert_array_equal(out[0], out[2])   # deterministic
    assert not np.allclose(out[0], out[1])
