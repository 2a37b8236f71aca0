import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mre_tpu.data.fixtures import write_zsl_dataset
from mre_tpu.data.kg import TripleTable
from mre_tpu.data.loaders import load_zsl_dataset
from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore
from mre_tpu.train.fusion import FusionConfig, FusionTrainer
from mre_tpu.zsl.episodes import EpisodeSampler, SymbolTable, build_connections
from mre_tpu.zsl.module import ZSLConfig, ZSLModule


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("zsl2"))
    # n_candidates must exceed 20 or the GAN batcher skips every relation
    # (reference rule: len(candidates) <= 20 → skip, utils.py:639)
    write_zsl_dataset(path, n_ent=40, n_rel=8, n_unseen=2, triples_per_rel=25,
                      image_size=8, n_candidates=22, seed=9)
    data = load_zsl_dataset(path, mode="train")
    store = MultimodalStore(
        data["mm_info"], data["rel_des"],
        MultimodalPipelineConfig(image_size=16, vocab_size=100,
                                 tokenizer_max_length=6,
                                 unpaired_tokenizer_max_length=10))
    table = TripleTable.build(np.asarray(data["triples"]).T,
                              len(data["e2id"]), len(data["r2id"]))
    fusion = FusionTrainer(table, store, FusionConfig(
        model_type="tiny", emb_dim=12, noise_dim=4, patch_size=8,
        image_mask_ratio=0.5, text_mask_ratio=0.5,
        batch_size=4, sample_size=2, neg_ent=2, epochs=1))
    zsl = ZSLModule(path, data["r2id"], data["e2id"], ZSLConfig(
        emb_dim=12, noise_dim=4, test_sample=5, max_neighbor=10,
        pretrain_batch_size=4, pretrain_few=2, pretrain_subepoch=2,
        D_batch_size=8, G_batch_size=8, gan_batch_rela=2), fusion)
    return path, data, fusion, zsl


def test_symbol_table(setup):
    _, data, _, zsl = setup
    st = zsl.symbols
    assert st.num_symbols == len(data["r2id"]) + len(data["e2id"])
    # relations come first
    assert st.symbol2id[list(data["r2id"])[0]] < st.symbol2id[list(data["e2id"])[0]]
    ent = np.random.default_rng(0).normal(size=(len(data["e2id"]), 12)).astype(np.float32)
    rel = np.random.default_rng(1).normal(size=(len(data["r2id"]), 12)).astype(np.float32)
    table = st.build_embedding(ent, rel)
    assert table.shape == (st.num_symbols + 1, 12)
    np.testing.assert_array_equal(table[-1], 0.0)   # PAD row


def test_connections(setup):
    _, data, _, zsl = setup
    conns = np.asarray(zsl.connections)
    assert conns.shape == (len(data["e2id"]), 10, 2)
    degs = np.asarray(zsl.degrees)
    assert degs.max() <= 10 and degs.min() >= 0


def test_update_embed_and_pretrain(setup):
    _, data, fusion, zsl = setup
    ents = fusion.generate_ent_embeddings(batch_size=16)
    rels = fusion.generate_rel_embeddings(batch_size=4)
    zsl.update_embed(ents, rels)
    assert float(jnp.abs(zsl.symbol_table).sum()) > 0
    loss = zsl.pretrain_extractor(steps=6, log_every=100)
    assert np.isfinite(loss)


def test_gan_training_and_eval(setup):
    _, data, fusion, zsl = setup
    d_hist, g_hist = zsl.train_gan(fusion, train_times=3, log_every=0,
                                   skip_pretrain=True)
    assert len(d_hist) == 3 and len(g_hist) == 3
    for h in d_hist + g_hist:
        for k, v in h.items():
            assert np.isfinite(v), (k, v)
    result = zsl.evaluate(fusion, mode="test", verbose=False, query_chunk=8)
    assert 0.0 <= result["mrr"] <= 1.0
    assert 0.0 <= result["hits10"] <= 1.0
    assert result["n"] > 0


def test_distill_model():
    from mre_tpu.models.distill import make_distill_trainer

    model, params, opt_state, step, predict = make_distill_trainer(
        emb_dim=8, transformer_emb_dim=16, lr=1e-2)
    rng = np.random.default_rng(0)
    token_embs = jnp.asarray(rng.normal(size=(10, 4, 16)).astype(np.float32))
    teacher = jnp.asarray(rng.normal(size=(10, 8)).astype(np.float32))
    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state, token_embs, teacher)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8
    pred = predict(params, token_embs)
    assert pred.shape == (10, 8)


def test_zsl_save_load_roundtrip(setup, tmp_path):
    _, data, fusion, zsl = setup
    save_dir = str(tmp_path / "embed_used")
    zsl.save(save_dir, fusion)
    import jax.numpy as jnp2
    before = np.asarray(jax.tree_util.tree_leaves(zsl.ex_params)[0])
    # perturb then reload
    zsl.ex_params = jax.tree_util.tree_map(lambda x: x + 1.0, zsl.ex_params)
    zsl.load(save_dir, fusion)
    after = np.asarray(jax.tree_util.tree_leaves(zsl.ex_params)[0])
    np.testing.assert_array_equal(before, after)


def test_precomputed_pairs_match_call_path(setup):
    """embed_pairs_precomputed must equal the eval-mode __call__ embeddings."""
    _, data, fusion, zsl = setup
    rng = np.random.default_rng(0)
    n_ent = len(data["e2id"])
    n_rel = len(data["r2id"])
    pairs = jnp.asarray(rng.integers(n_rel, n_rel + n_ent, (9, 2)), jnp.int32)
    left = jnp.asarray(rng.integers(0, n_ent, 9), jnp.int32)
    right = jnp.asarray(rng.integers(0, n_ent, 9), jnp.int32)
    meta = zsl._meta(left, right)
    q_g, _ = zsl.extractor.apply({"params": zsl.ex_params}, zsl.symbol_table,
                                 pairs, pairs, meta, meta, True)
    nbr = zsl.extractor.apply({"params": zsl.ex_params}, zsl.symbol_table,
                              zsl.connections, zsl.degrees,
                              method=zsl.extractor.encode_neighbors)
    fast = zsl.extractor.apply({"params": zsl.ex_params}, zsl.symbol_table,
                               nbr, pairs, left, right,
                               method=zsl.extractor.embed_pairs_precomputed)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(q_g), rtol=2e-4, atol=2e-5)


def test_zero_shot_tie_rank_is_pessimistic():
    """Tie semantics match the reference's argsort(scores)[::-1]
    (zsl_module.py:705-706): equal scores rank the true candidate last."""
    import jax.numpy as jnp

    from mre_tpu.eval.zero_shot import _score_and_rank

    # 1 query, 4 candidates; make candidates 0..2 identical embeddings
    # (identical cosine scores) and candidate 3 orthogonal-negative.
    emb = jnp.asarray([[[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [-1.0, 0.0]]])
    rel = jnp.asarray([[1.0, 0.0]])
    mask = jnp.ones((1, 4), bool)
    rank = int(_score_and_rank(emb, rel, mask)[0])
    assert rank == 3  # two tied non-true candidates count ahead of the true


def test_factored_pair_embedding_matches_precomputed():
    """embed_pairs_factored (per-entity table algebra) must equal the
    embed_pairs_precomputed path it replaces on the eval hot path."""
    import jax
    import jax.numpy as jnp

    from mre_tpu.models.extractor import Extractor

    D, NS, NE, K = 64, 120, 90, 8
    rng = np.random.default_rng(0)
    symbols = jnp.asarray(rng.normal(size=(NS + 1, D)).astype(np.float32))
    conns = jnp.asarray(rng.integers(0, NS, (NE, K, 2)).astype(np.int32))
    degs = jnp.asarray(rng.integers(1, K, NE).astype(np.float32))
    ex = Extractor(embed_dim=D)
    dummy = jnp.asarray(rng.integers(30, NS, (2, 2)).astype(np.int32))
    meta0 = (conns[:2], degs[:2], conns[:2], degs[:2])
    params = ex.init({"params": jax.random.key(0)}, symbols, dummy, dummy,
                     meta0, meta0, True)["params"]
    nbr = ex.apply({"params": params}, symbols, conns, degs,
                   method=ex.encode_neighbors)
    ent_sym = jnp.asarray((30 + np.arange(NE)).astype(np.int32))
    pe = rng.integers(0, NE, (50, 2)).astype(np.int32)
    pairs_sym = jnp.asarray(30 + pe)
    left, right = jnp.asarray(pe[:, 0]), jnp.asarray(pe[:, 1])
    old = ex.apply({"params": params}, symbols, nbr, pairs_sym, left, right,
                   method=ex.embed_pairs_precomputed)
    L, R = ex.apply({"params": params}, symbols, nbr, ent_sym,
                    method=ex.precompute_pair_tables)
    new = ex.apply({"params": params}, L, R, left, right,
                   method=ex.embed_pairs_factored)
    np.testing.assert_allclose(np.asarray(new), np.asarray(old),
                               rtol=2e-4, atol=2e-5)


def test_evaluate_zero_shot_empty_candidates_reports_zero():
    """Empty/mis-pathed candidates must yield n=0 + zero metrics, never a
    perfect score (ADVICE r2)."""
    from mre_tpu.eval.zero_shot import evaluate_zero_shot

    out = evaluate_zero_shot({}, {}, {}, {}, None, None, verbose=False)
    assert out["n"] == 0
    assert out["hits10"] == 0.0 and out["mrr"] == 0.0


def test_head_shared_pair_embedding_matches_factored():
    """embed_pairs_head_shared (one head gather + distributed first matmul
    per query block) must equal embed_pairs_factored on the broadcast
    (head, candidate) cross product."""
    import jax
    import jax.numpy as jnp

    from mre_tpu.models.extractor import Extractor

    D, NS, NE, K, Q, C = 64, 120, 90, 8, 12, 17
    rng = np.random.default_rng(1)
    symbols = jnp.asarray(rng.normal(size=(NS + 1, D)).astype(np.float32))
    conns = jnp.asarray(rng.integers(0, NS, (NE, K, 2)).astype(np.int32))
    degs = jnp.asarray(rng.integers(1, K, NE).astype(np.float32))
    ex = Extractor(embed_dim=D)
    dummy = jnp.asarray(rng.integers(30, NS, (2, 2)).astype(np.int32))
    meta0 = (conns[:2], degs[:2], conns[:2], degs[:2])
    params = ex.init({"params": jax.random.key(0)}, symbols, dummy, dummy,
                     meta0, meta0, True)["params"]
    nbr = ex.apply({"params": params}, symbols, conns, degs,
                   method=ex.encode_neighbors)
    ent_sym = jnp.asarray((30 + np.arange(NE)).astype(np.int32))
    L, R = ex.apply({"params": params}, symbols, nbr, ent_sym,
                    method=ex.precompute_pair_tables)
    heads = jnp.asarray(rng.integers(0, NE, Q).astype(np.int32))
    cands = jnp.asarray(rng.integers(0, NE, (Q, C)).astype(np.int32))
    flat = ex.apply({"params": params}, L, R,
                    jnp.repeat(heads, C), cands.reshape(-1),
                    method=ex.embed_pairs_factored).reshape(Q, C, D)
    blk = ex.apply({"params": params}, L, R, heads, cands,
                   method=ex.embed_pairs_head_shared)
    np.testing.assert_allclose(np.asarray(blk), np.asarray(flat),
                               rtol=2e-4, atol=2e-5)


def test_rel_shared_pair_embedding_matches_head_shared():
    """embed_pairs_rel_shared (one SHARED candidate list per block) must
    equal embed_pairs_head_shared on the broadcast candidate matrix."""
    import jax
    import jax.numpy as jnp

    from mre_tpu.models.extractor import Extractor

    D, NS, NE, K, Q, C = 64, 120, 90, 8, 12, 17
    rng = np.random.default_rng(2)
    symbols = jnp.asarray(rng.normal(size=(NS + 1, D)).astype(np.float32))
    conns = jnp.asarray(rng.integers(0, NS, (NE, K, 2)).astype(np.int32))
    degs = jnp.asarray(rng.integers(1, K, NE).astype(np.float32))
    ex = Extractor(embed_dim=D)
    dummy = jnp.asarray(rng.integers(30, NS, (2, 2)).astype(np.int32))
    meta0 = (conns[:2], degs[:2], conns[:2], degs[:2])
    params = ex.init({"params": jax.random.key(0)}, symbols, dummy, dummy,
                     meta0, meta0, True)["params"]
    nbr = ex.apply({"params": params}, symbols, conns, degs,
                   method=ex.encode_neighbors)
    ent_sym = jnp.asarray((30 + np.arange(NE)).astype(np.int32))
    L, R = ex.apply({"params": params}, symbols, nbr, ent_sym,
                    method=ex.precompute_pair_tables)
    heads = jnp.asarray(rng.integers(0, NE, Q).astype(np.int32))
    shared = jnp.asarray(rng.integers(0, NE, C).astype(np.int32))
    blk = ex.apply({"params": params}, L, R, heads,
                   jnp.broadcast_to(shared[None, :], (Q, C)),
                   method=ex.embed_pairs_head_shared)
    rel = ex.apply({"params": params}, L, R, heads, shared,
                   method=ex.embed_pairs_rel_shared)
    np.testing.assert_allclose(np.asarray(rel), np.asarray(blk),
                               rtol=2e-4, atol=2e-5)


def test_rel_shared_evaluator_matches_per_query(setup):
    """The relation-shared evaluator must produce the SAME metrics (and
    ranks) as the per-query evaluator — it is a restructuring of the same
    computation over the shared rel2candidates structure, not a semantic
    change."""
    _, data, fusion, zsl = setup
    a = zsl.evaluate(fusion, mode="test", verbose=False, query_chunk=8,
                     eval_path="head_shared", return_ranks=True)
    b = zsl.evaluate(fusion, mode="test", verbose=False, query_chunk=8,
                     eval_path="rel_shared", return_ranks=True)
    assert a["n"] == b["n"]
    np.testing.assert_array_equal(np.sort(a["ranks"]), np.sort(b["ranks"]))
    for m in ("hits10", "hits5", "hits1", "mrr"):
        np.testing.assert_allclose(a[m], b[m], atol=1e-9)


def test_rel_shared_evaluator_empty_candidates():
    """Zero evaluable queries must report zeros with n=0 (never a perfect
    score from a misloaded dataset), matching the per-query evaluator."""
    from mre_tpu.eval.zero_shot import evaluate_zero_shot_rel_shared

    out = evaluate_zero_shot_rel_shared(
        {}, {}, None, None, lambda rel: np.zeros((2, 8), np.float32),
        verbose=False)
    assert out["n"] == 0 and out["hits10"] == 0.0 and out["per_relation"] == {}


def test_rel_shared_counts_duplicate_candidates():
    """A duplicated entity in a candidate list must count against the rank
    once PER OCCURRENCE (the per-query evaluator scores it twice); the
    shared-list path weights its single deduped column by multiplicity."""
    import jax.numpy as jnp

    from mre_tpu.eval.zero_shot import evaluate_zero_shot_rel_shared

    rng = np.random.RandomState(7)
    n_ent, D = 20, 6
    T = jnp.asarray(rng.randn(n_ent, D).astype(np.float32))

    def embed_rel_block(heads, shared):
        return T[heads][:, None, :] + 2.0 * T[shared][None, :, :]

    def embed_true(heads, trues):
        return T[heads] + 2.0 * T[trues]

    names = [f"e{i}" for i in range(n_ent)]
    e2id = {n: i for i, n in enumerate(names)}
    # one relation, two queries; the second query's list has e3 twice
    cands_a = ["e5", "e3", "e7", "e9"]
    cands_b = ["e6", "e3", "e3", "e7", "e9"]
    test_candidates = {"rel0": {
        "e1\trel0\te5": cands_a,
        "e2\trel0\te6": cands_b,
    }}
    vecs = rng.randn(4, D).astype(np.float32)

    out = evaluate_zero_shot_rel_shared(
        test_candidates, e2id, embed_rel_block, embed_true,
        lambda rel: vecs, query_chunk=2, verbose=False, return_ranks=True)

    # numpy brute force with duplicates scored per occurrence
    rv = vecs / np.maximum(np.linalg.norm(vecs, axis=-1, keepdims=True), 1e-12)
    vbar = rv.mean(0)
    Tn = np.asarray(T)

    def score(h, c):
        e = Tn[e2id[h]] + 2.0 * Tn[e2id[c]]
        e = e / max(np.linalg.norm(e), 1e-12)
        return float(e @ vbar)

    expected = []
    for key, cands in test_candidates["rel0"].items():
        h = key.split("\t")[0]
        ts = score(h, cands[0])
        expected.append(1 + sum(score(h, c) >= ts for c in cands[1:]))
    np.testing.assert_array_equal(out["ranks"], expected)


def test_generate_entity_pair_emb(setup):
    """Analysis helper (zsl_module.py:757-790): one [n, D] block per test
    relation, labels flattened in order."""
    _, data, fusion, zsl = setup
    rels = list(zsl.test_tasks)[:2]
    embs, labels, tgt = zsl.generate_entity_pair_emb(rels)
    assert len(embs) == len([r for r in rels if zsl.test_tasks[r]])
    n_total = sum(e.shape[0] for e in embs)
    assert len(labels) == n_total and tgt == []
    for e in embs:
        assert e.shape[1] == zsl.cfg.emb_dim
        assert np.isfinite(e).all()
