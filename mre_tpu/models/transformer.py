"""ViT-style transformer stack (flax.linen).

Re-implements the reference's neural blocks (module/submodule.py:58-258) with
identical math and — where the upstream flax M3AE checkpoint format matters —
identical parameter-tree naming (Block_i / LayerNorm_0|1 / Attention_0 /
Dense_0|1 / TransformerMLP_0.fc1|fc2; cf. the reference's flax→torch mapping
in module/utils.py:271-346, which this rebuild loads natively).

Masking convention follows the reference: ``padding_mask`` is 1.0 at PAD
positions and attention replaces the logit with −1e7 there before softmax (where-select, submodule.py:176)
(module/submodule.py:174-177).

Repaired reference defects (SURVEY.md §7): the ``MLP`` head applies a real
LayerNorm module between hidden layers (the reference calls
``nn.LayerNorm(y)`` on a tensor — dead code for depth=0).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNormalization(nn.Module):
    """Std-based layer norm with affine params ``a_2``/``b_2``
    (module/submodule.py:58-77; uses the *unbiased* std like torch.std and
    is an identity when the normalized dim has size 1)."""

    d_hid: int
    eps: float = 1e-3

    @nn.compact
    def __call__(self, z):
        a_2 = self.param("a_2", nn.initializers.ones, (self.d_hid,))
        b_2 = self.param("b_2", nn.initializers.zeros, (self.d_hid,))
        if z.ndim >= 2 and z.shape[1] == 1:
            # reference guard is on AXIS 1 (module/submodule.py:69
            # z.size(1) == 1), which coincides with the feature axis only
            # for 2-D inputs — keep the exact semantics
            return z
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.sum((z - mu) ** 2, axis=-1, keepdims=True) / (z.shape[-1] - 1)
        out = (z - mu) / (jnp.sqrt(var) + self.eps)
        return out * a_2 + b_2


class DropPath(nn.Module):
    """Per-sample stochastic depth (module/submodule.py:113-126)."""

    dropout_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.dropout_prob == 0.0:
            return x
        keep = 1.0 - self.dropout_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, jnp.float32))
        return x / keep * mask


class TransformerMLP(nn.Module):
    dim: int = 256
    out_dim: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    hidden_ratio: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_ratio * self.dim, name="fc1", dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, name="fc2", dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


def _pallas_attention_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


class Attention(nn.Module):
    dim: int
    num_heads: int = 8
    use_bias: bool = False
    att_drop: float = 0.0
    proj_drop: float = 0.0
    attention_impl: str = "auto"    # auto | pallas | xla
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, padding_mask=None):
        batch, n, channels = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, use_bias=self.use_bias, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform())(x)
        qkv = qkv.reshape(batch, n, 3, self.num_heads, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)          # each [B, N, H, hd]
        q = q.transpose(0, 2, 1, 3)                # [B, H, N, hd]
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        scale = head_dim ** -0.5

        # Fused Pallas path: attention-prob dropout can't apply inside the
        # kernel, so it only serves att_drop == 0 (the reference default);
        # 'auto' also requires a head_dim where the kernel beats XLA.
        from mre_tpu.ops.pallas.attention import pallas_attention_profitable

        use_pallas = (self.attention_impl == "pallas"
                      or (self.attention_impl == "auto"
                          and _pallas_attention_available()
                          and pallas_attention_profitable(head_dim,
                                                          self.num_heads,
                                                          batch)))
        if use_pallas and (self.att_drop == 0.0 or deterministic):
            from mre_tpu.ops.pallas.attention import fused_attention

            out = fused_attention(q, k, v, padding_mask, scale)
        else:
            att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                             preferred_element_type=jnp.float32) * scale
            if padding_mask is not None:
                pm = padding_mask[:, None, None, :]
                att = jnp.where(pm > 0, jnp.asarray(-1e7, att.dtype), att)
            att = jax.nn.softmax(att, axis=-1)
            att = nn.Dropout(self.att_drop)(att, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", att, v,
                             preferred_element_type=jnp.float32)

        out = out.transpose(0, 2, 1, 3).reshape(batch, n, channels)
        out = nn.Dense(self.dim, dtype=self.dtype,
                       kernel_init=nn.initializers.xavier_uniform())(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class Block(nn.Module):
    emb_dim: int = 256
    num_heads: int = 8
    mlp_ratio: int = 4
    att_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True, padding_mask=None):
        # LayerNorms stay float32; matmul-heavy submodules run in `dtype`.
        x = nn.LayerNorm()(inputs)
        x = Attention(self.emb_dim, self.num_heads, True, self.att_drop,
                      self.drop, dtype=self.dtype,
                      attention_impl=self.attention_impl)(
            x, deterministic, padding_mask)
        x = DropPath(self.drop_path)(x, deterministic)
        inputs = inputs + x
        x = nn.LayerNorm()(inputs)
        x = TransformerMLP(self.emb_dim, self.emb_dim, self.drop,
                           dtype=self.dtype, hidden_ratio=self.mlp_ratio)(
            x, deterministic)
        x = DropPath(self.drop_path)(x, deterministic)
        return inputs + x


class Transformer(nn.Module):
    emb_dim: int = 1024
    depth: int = 24
    att_drop: float = 0.0
    drop: float = 0.0
    drop_path: float = 0.0
    num_heads: int = 16
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.float32
    attention_impl: str = "auto"

    @nn.compact
    def __call__(self, x, deterministic: bool = True, padding_mask=None):
        for _ in range(self.depth):
            x = Block(self.emb_dim, self.num_heads, self.mlp_ratio,
                      self.att_drop, self.drop, self.drop_path,
                      dtype=self.dtype, attention_impl=self.attention_impl)(
                x, deterministic, padding_mask)
        return nn.LayerNorm()(x)


class MLP(nn.Module):
    """Output head: optional input LN, depth residual GELU layers, final
    projection (module/submodule.py:80-111, with the LayerNorm defect fixed)."""

    hidden_dim: int
    output_dim: int
    depth: int
    input_norm: bool = True

    @nn.compact
    def __call__(self, x):
        if self.input_norm:
            x = nn.LayerNorm()(x)
        for i in range(self.depth):
            y = nn.Dense(self.hidden_dim,
                         kernel_init=nn.initializers.xavier_uniform())(x)
            y = nn.gelu(y, approximate=False)
            y = nn.LayerNorm()(y)
            x = x + y if i > 0 else y
        return nn.Dense(self.output_dim,
                        kernel_init=nn.initializers.xavier_uniform())(x)


class SupportEncoder(nn.Module):
    """Residual 2-layer FFN with LN (module/submodule.py:240-258)."""

    d_model: int
    d_inner: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        out = nn.relu(nn.Dense(self.d_inner, name="proj1",
                               kernel_init=nn.initializers.xavier_normal())(x))
        out = nn.Dense(self.d_model, name="proj2",
                       kernel_init=nn.initializers.xavier_normal())(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm()(out + residual)
