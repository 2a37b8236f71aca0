"""Pallas fused attention vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mre_tpu.ops.pallas.attention import _attention_reference, fused_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_matches_reference_with_padding():
    B, H, N, hd = 2, 3, 37, 16
    q, k, v = _rand((B, H, N, hd), 0), _rand((B, H, N, hd), 1), _rand((B, H, N, hd), 2)
    pad = jnp.zeros((B, N), jnp.float32).at[:, -5:].set(1.0)
    ref = _attention_reference(q, k, v, pad, hd ** -0.5)
    out = fused_attention(q, k, v, pad, hd ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_matches_reference_no_mask():
    B, H, N, hd = 1, 2, 24, 8
    q, k, v = _rand((B, H, N, hd), 3), _rand((B, H, N, hd), 4), _rand((B, H, N, hd), 5)
    ref = _attention_reference(q, k, v, None, hd ** -0.5)
    out = fused_attention(q, k, v, None, hd ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    B, H, N, hd = 1, 2, 16, 8
    q, k, v = _rand((B, H, N, hd), 6), _rand((B, H, N, hd), 7), _rand((B, H, N, hd), 8)
    pad = jnp.zeros((B, N), jnp.float32).at[:, -3:].set(1.0)
    scale = hd ** -0.5

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, pad, scale, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_reference(q, k, v, pad, scale) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_lane_packed_small_heads_matches_reference():
    """hd < 64 with num_heads divisible by 128//hd routes through the
    lane-packed block-diagonal kernel; must match the jnp reference."""
    for B, H, N, hd, seed in [(2, 4, 37, 32, 10), (1, 8, 21, 16, 13),
                              (1, 16, 33, 32, 16)]:
        q, k, v = (_rand((B, H, N, hd), seed), _rand((B, H, N, hd), seed + 1),
                   _rand((B, H, N, hd), seed + 2))
        pad = jnp.zeros((B, N), jnp.float32).at[:, -5:].set(1.0)
        ref = _attention_reference(q, k, v, pad, hd ** -0.5)
        out = fused_attention(q, k, v, pad, hd ** -0.5, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_lane_packed_no_mask():
    B, H, N, hd = 1, 4, 24, 32
    q, k, v = _rand((B, H, N, hd), 20), _rand((B, H, N, hd), 21), _rand((B, H, N, hd), 22)
    ref = _attention_reference(q, k, v, None, hd ** -0.5)
    out = fused_attention(q, k, v, None, hd ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_transformer_pallas_flag_consistency():
    """Attention module output with explicit impl flags must agree."""
    from mre_tpu.models.transformer import Attention

    x = _rand((2, 21, 24), 9)
    pad = jnp.zeros((2, 21), jnp.float32).at[:, -4:].set(1.0)
    att_x = Attention(dim=24, num_heads=4, use_bias=True, attention_impl="xla")
    v1 = att_x.init(jax.random.key(0), x, True, pad)
    out_x = att_x.apply(v1, x, True, pad)
    # pallas path in interpret mode needs the kernel flag; on CPU tests the
    # 'auto' mode resolves to xla — force interpret via direct call above.
    assert np.isfinite(np.asarray(out_x)).all()
