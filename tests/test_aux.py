"""Tests for ExpModel, structural evaluator, image utils, eval fixtures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mre_tpu.core.config import Config
from mre_tpu.models.exp import ExpModel
from mre_tpu.ops.patches import extract_patches


def test_exp_model_forward():
    cfg = Config(dict(model_type="tiny", emb_dim=12, patch_size=8,
                      image_mask_ratio=0.5, text_mask_ratio=0.5))
    model = ExpModel(text_vocab_size=50, config=cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(3, 16, 16, 3)).astype(np.float32))
    patches = extract_patches(img, 8)
    batch = {
        "image_patches_head": patches,
        "image_patches_tail": patches,
        "text_head": jnp.asarray(rng.integers(0, 50, (3, 6)), jnp.int32),
        "text_tail": jnp.asarray(rng.integers(0, 50, (3, 6)), jnp.int32),
        "text_padding_mask_head": jnp.zeros((3, 6), jnp.float32),
        "text_padding_mask_tail": jnp.zeros((3, 6), jnp.float32),
        "rel_des": jnp.asarray(rng.integers(0, 50, (3, 8)), jnp.int32),
        "rel_des_padding_mask": jnp.zeros((3, 8), jnp.float32),
    }
    variables = model.init({"params": jax.random.key(0), "masking": jax.random.key(1),
                            "dropout": jax.random.key(2)}, batch, False)
    xh, xt, rel, out = model.apply(variables, batch, False,
                                   rngs={"masking": jax.random.key(3),
                                         "dropout": jax.random.key(4)})
    assert xh.shape == (3, 12) and xt.shape == (3, 12) and rel.shape == (3, 12)
    assert np.isfinite(np.asarray(out["image_output"])).all()
    # eval path
    xh2, xt2, rel2 = model.apply(variables, batch, True, is_evaluate=True)
    assert xh2.shape == (3, 12)


def test_structural_evaluator_bruteforce():
    from mre_tpu.eval.structural import evaluate_structural

    rng = np.random.default_rng(0)
    n_ent, dim = 12, 4
    ent = rng.normal(size=(n_ent, dim)).astype(np.float32)
    rel = rng.normal(size=(2, dim)).astype(np.float32)
    e2id = {f"e{i}": i for i in range(n_ent)}
    r2id = {"r0": 0, "r1": 1}
    cands = {"r0": {}}
    keys_ranks = []
    for q in range(4):
        h, t = rng.integers(0, n_ent, 2)
        others = [f"e{j}" for j in rng.choice(n_ent, 5, replace=False)]
        key = f"e{h}\tr0\te{t}"
        cands["r0"][key] = [f"e{t}"] + others
        scores = [np.abs(ent[h] + rel[0] - ent[e2id[c]]).sum()
                  for c in cands["r0"][key]]
        worse = sum(1 for s in scores[1:] if s < scores[0])
        ties = sum(1 for s in scores[1:] if s == scores[0])
        keys_ranks.append(worse + ties // 2 + 1)
    out = evaluate_structural(cands, ent, rel, e2id, r2id, query_chunk=4,
                              verbose=False)
    expected_mrr = float(np.mean([1 / r for r in keys_ranks]))
    np.testing.assert_allclose(out["mrr"], expected_mrr, rtol=1e-5)


def test_create_log_images():
    from mre_tpu.utils.images import create_log_images

    imgs = [np.random.rand(3, 8, 8, 3).astype(np.float32) for _ in range(3)]
    grid = create_log_images(imgs, n=2)
    assert grid.dtype == np.uint8
    assert grid.shape == (16, 24, 3)


def test_eval_fixture_roundtrip(tmp_path):
    from mre_tpu.utils.eval_fixtures import generate_fix_samples, subgraph_to_candidates

    rng = np.random.default_rng(0)
    tri = np.stack([rng.integers(0, 20, 100), rng.integers(0, 3, 100),
                    rng.integers(0, 20, 100)], 1)
    path = str(tmp_path / "sub_test_samples.json")
    samples = generate_fix_samples(tri, 20, path, neg_ent=2, max_batches=3)
    assert 1 <= len(samples) <= 3   # 20 nodes / batch 12 → 2 batches
    cands = subgraph_to_candidates(samples, str(tmp_path / "sample_candidates.json"))
    assert len(cands) > 0
    for key, v in cands.items():
        assert "head" in v and "tail" in v


def test_triple_batch(tmp_path):
    from mre_tpu.data.fixtures import write_zsl_dataset
    from mre_tpu.data.loaders import load_zsl_dataset
    from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore

    path = str(tmp_path / "zs")
    write_zsl_dataset(path, n_ent=20, n_rel=4, n_unseen=1, triples_per_rel=8,
                      image_size=8, seed=2)
    data = load_zsl_dataset(path)
    store = MultimodalStore(data["mm_info"], data["rel_des"],
                            MultimodalPipelineConfig(image_size=16, vocab_size=64,
                                                     tokenizer_max_length=6,
                                                     unpaired_tokenizer_max_length=8))
    h, r, t = data["triples"]
    batch = store.triple_batch(h[:5], r[:5], t[:5])
    assert batch["image_head"].shape == (5, 16, 16, 3)
    assert batch["text_tail"].shape == (5, 6)
    assert batch["rel_des"].shape == (5, 8)


def test_image_cache_fast_path(tmp_path):
    """precompute_image_cache: cached batches keep shape/normalization and
    eval batches stay deterministic; text-only entities still get the
    Xavier-noise placeholder."""
    from mre_tpu.data.fixtures import write_zsl_dataset
    from mre_tpu.data.loaders import load_zsl_dataset
    from mre_tpu.data.multimodal import MultimodalPipelineConfig, MultimodalStore

    path = str(tmp_path / "zs")
    write_zsl_dataset(path, n_ent=20, n_rel=4, n_unseen=1, triples_per_rel=8,
                      image_size=8, seed=2)
    data = load_zsl_dataset(path)

    def build():
        return MultimodalStore(
            data["mm_info"], data["rel_des"],
            MultimodalPipelineConfig(image_size=16, vocab_size=64,
                                     tokenizer_max_length=6,
                                     unpaired_tokenizer_max_length=8))

    store = build()
    ids = np.arange(8)
    secs = store.precompute_image_cache()
    # cache rows exist only for entities WITH an image (advisor finding:
    # num_nodes-sized cache wasted GBs of zeros on text-only entities)
    assert secs >= 0.0
    assert store._img_cache.shape[0] == int(np.sum(store.has_image))
    assert (store._img_cache_map >= 0).sum() == int(np.sum(store.has_image))
    imgs = store.entity_images(ids, train=True)
    assert imgs.shape == (8, 16, 16, 3) and np.isfinite(imgs).all()
    # eval batches are seed-deterministic on the cached path too
    a = store.entity_images(ids, train=False)
    b = store.entity_images(ids, train=False)
    np.testing.assert_array_equal(a, b)
    # placeholder stats: text-only entities get the same noise as uncached
    fresh = build()
    text_only = np.asarray([i for i in range(store.num_nodes)
                            if not store.has_image[i]][:2])
    if len(text_only):
        np.testing.assert_allclose(
            store.entity_images(text_only, train=False),
            fresh.entity_images(text_only, train=False), rtol=1e-6)


def test_placeholder_image_matches_torch_xavier_bound():
    """torch xavier_uniform_ on an (s, s, 3) tensor has fan_in = fan_out =
    3s -> bound 1/sqrt(s); x10 scaling per module/data.py:286-290."""
    import numpy as np

    from mre_tpu.data.multimodal import MultimodalStore

    s = 64
    img = MultimodalStore._placeholder(np.random.default_rng(0), s)
    bound = 10.0 / np.sqrt(s)
    assert img.shape == (s, s, 3)
    assert np.abs(img).max() <= bound
    assert np.abs(img).max() > 0.9 * bound
