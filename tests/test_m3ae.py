import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mre_tpu.models.m3ae import M3AE, m3ae_config
from mre_tpu.ops.masking import random_masking, restore_with_mask_tokens
from mre_tpu.ops.patches import extract_patches, merge_patches
from mre_tpu.ops.pos_embed import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed

VOCAB, PATCH, IMG = 50, 4, 16          # 16x16 image, 4x4 patches → 16 tokens
TXT_LEN = 8


def test_patch_roundtrip():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32))
    patches = extract_patches(img, PATCH)
    assert patches.shape == (2, (IMG // PATCH) ** 2, PATCH * PATCH * 3)
    back = merge_patches(patches, PATCH)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_pos_embed_shapes_and_values():
    pe1 = get_1d_sincos_pos_embed(8, 5)
    assert pe1.shape == (1, 5, 8)
    np.testing.assert_allclose(pe1[0, 0, :4], 0.0, atol=1e-7)   # sin(0) = 0
    np.testing.assert_allclose(pe1[0, 0, 4:], 1.0, atol=1e-7)   # cos(0) = 1
    pe2 = get_2d_sincos_pos_embed(8, 16, 4)
    assert pe2.shape == (1, 16, 8)


def test_random_masking_restore():
    key = jax.random.key(0)
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    m = random_masking(key, x, keep_len=4)
    assert m.kept.shape == (2, 4, 3)
    assert float(m.mask.sum()) == 2 * 6
    token = jnp.full((1, 1, 3), -1.0)
    restored = restore_with_mask_tokens(m.kept, token, m.ids_restore)
    restored = np.asarray(restored)
    mask = np.asarray(m.mask)
    # kept positions carry the original values; dropped carry the mask token
    np.testing.assert_array_equal(restored[mask == 0], np.asarray(x)[mask == 0])
    assert (restored[mask == 1] == -1.0).all()


@pytest.fixture(scope="module")
def m3ae():
    cfg = m3ae_config("tiny", dict(image_mask_ratio=0.5, text_mask_ratio=0.5))
    model = M3AE(text_vocab_size=VOCAB, patch_size=PATCH,
                 image_output_dim=PATCH * PATCH * 3, config=cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, IMG, IMG, 3)).astype(np.float32))
    patches = extract_patches(img, PATCH)
    text = jnp.asarray(rng.integers(0, VOCAB, (2, TXT_LEN)), jnp.int32)
    pad = jnp.zeros((2, TXT_LEN), jnp.float32).at[:, -2:].set(1.0)
    variables = model.init(
        {"params": jax.random.key(0), "masking": jax.random.key(1)},
        patches, text, pad)
    return model, variables, patches, text, pad


def test_forward_representation_shapes(m3ae):
    model, variables, patches, text, pad = m3ae
    cls_x, x = model.apply(variables, patches, text, pad, True,
                           method=model.forward_representation)
    assert cls_x.shape == (2, 1, 384)
    assert x.shape == (2, 1 + 16 + TXT_LEN, 384)


def test_full_forward_shapes(m3ae):
    model, variables, patches, text, pad = m3ae
    img_out, txt_out, img_mask, txt_mask = model.apply(
        variables, patches, text, pad, False,
        rngs={"masking": jax.random.key(2)})
    assert img_out.shape == (2, 16, PATCH * PATCH * 3)
    assert txt_out.shape == (2, TXT_LEN, VOCAB)
    assert float(img_mask.sum(-1)[0]) == 8     # 50% of 16 masked
    assert float(txt_mask.sum(-1)[0]) == 4


def test_text_only_path(m3ae):
    model, variables, _, text, pad = m3ae
    cls_x, x = model.apply(variables, None, text, pad, True,
                           method=model.forward_representation)
    assert cls_x.shape == (2, 1, 384)
    img_out, txt_out, img_mask, txt_mask = model.apply(
        variables, None, text, pad, False,
        rngs={"masking": jax.random.key(3)})
    assert img_out is None and img_mask is None
    assert txt_out.shape == (2, TXT_LEN, VOCAB)


def test_representation_deterministic(m3ae):
    model, variables, patches, text, pad = m3ae
    a, _ = model.apply(variables, patches, text, pad, True,
                       method=model.forward_representation)
    b, _ = model.apply(variables, patches, text, pad, True,
                       method=model.forward_representation)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padding_mask_blocks_attention(m3ae):
    """Changing a fully-padded token's id must not change the cls output."""
    model, variables, patches, text, pad = m3ae
    a, _ = model.apply(variables, patches, text, pad, True,
                       method=model.forward_representation)
    text2 = text.at[:, -1].set((text[:, -1] + 1) % VOCAB)
    b, _ = model.apply(variables, patches, text2, pad, True,
                       method=model.forward_representation)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_m3ae_pretrain_loss(m3ae):
    from mre_tpu.train.pretrain import m3ae_pretrain_loss

    model, variables, patches, text, pad = m3ae
    rng = np.random.default_rng(5)
    u_text = jnp.asarray(rng.integers(0, VOCAB, (2, TXT_LEN)), jnp.int32)
    u_pad = jnp.zeros((2, TXT_LEN), jnp.float32)

    keyholder = {"i": 0}

    def apply(img, txt, padding):
        keyholder["i"] += 1
        return model.apply(variables, img, txt, padding, False,
                           rngs={"masking": jax.random.key(keyholder["i"])})

    batch = dict(image_patches=patches, text=text, text_padding_mask=pad,
                 unpaired_text=u_text, unpaired_text_padding_mask=u_pad)
    loss, info = m3ae_pretrain_loss(apply, batch)
    assert np.isfinite(float(loss))
    for k in ("image_loss", "text_loss", "unpaired_text_loss", "text_accuracy"):
        assert np.isfinite(float(info[k])), k


def test_load_cc12m_checkpoint_roundtrip(m3ae, tmp_path):
    """Synthetic upstream-format pickle roundtrip (VERDICT r2 #8).

    Upstream ``m3ae_small.pkl`` holds {'state': <train state>, 'variant': ...}
    with state.params['params'] a flax tree in this module's naming
    (reference flax→torch mapping: module/utils.py:271-346). Build one from
    a differently-seeded init, load it, and assert the encoder-side subtrees
    were replaced while decoder-side init is kept, and the forward pass
    changes accordingly.
    """
    import pickle
    from types import SimpleNamespace

    from mre_tpu.models.m3ae import load_cc12m_checkpoint

    model, variables, patches, text, pad = m3ae
    params = variables["params"]

    # "upstream" tree: same structure, different values
    other = model.init(
        {"params": jax.random.key(42), "masking": jax.random.key(43)},
        patches, text, pad)["params"]
    other = jax.tree_util.tree_map(lambda x: np.asarray(x), other)

    path = tmp_path / "m3ae_small.pkl"
    with open(path, "wb") as f:
        pickle.dump({"state": SimpleNamespace(params={"params": other}),
                     "variant": {"model_type": "tiny"}}, f)

    loaded = load_cc12m_checkpoint(str(path), params)

    # encoder-side entries replaced by the checkpoint...
    for name in ("cls_token", "encoder_image_type_embedding",
                 "encoder_text_type_embedding"):
        np.testing.assert_array_equal(np.asarray(loaded[name]), other[name])
    for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(loaded["encoder"]),
            jax.tree_util.tree_leaves(other["encoder"])):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    np.testing.assert_array_equal(
        np.asarray(loaded["text_embedding"]["embedding"]),
        other["text_embedding"]["embedding"])

    # ...while decoder-side entries keep this init
    for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(loaded["decoder"]),
            jax.tree_util.tree_leaves(params["decoder"])):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))

    # and the encoder forward pass actually changes
    before = model.apply({"params": params}, patches, text, pad,
                         method=model.forward_representation)[0]
    after = model.apply({"params": loaded}, patches, text, pad,
                        method=model.forward_representation)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
