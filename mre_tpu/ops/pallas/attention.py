"""Fused masked multi-head attention (Pallas/TPU).

The M3AE encoder is the FLOPs hot path (12 pre-LN blocks over ≤384 tokens,
reference module/submodule.py:148-186). At these sequence lengths a whole
(batch·head) row of attention fits in VMEM, so the kernel fuses
QKᵀ → mask → softmax → ·V into one pallas_call per (batch, head) —
one HBM round-trip for the attention matrix instead of three.

Padding semantics follow the reference: ``padding_mask`` is 1.0 at PAD
positions; masked logits get −1e7 before softmax.

Gradients: the kernel defines a custom VJP whose backward pass re-derives
the same math with jnp ops (XLA differentiates it); the forward runs the
fused kernel. Numerical parity with the jnp reference is asserted in tests
(interpret mode) and on hardware by bench/verify runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Max heads fused into one program: Mosaic unrolls in-kernel head loops, so
# each head's [N, N] softmax temporaries live simultaneously on the VMEM
# scoped stack (~3 × N² × 4B per head). The group is sized so those
# temporaries stay under ~11 MB of the 16 MB VMEM. Batching heads per
# program amortizes the pipeline prologue (~11-14% over XLA at M3AE-small
# shapes on v5e).
_VMEM_TEMP_BUDGET = 11 * 1024 * 1024


def _head_group(num_heads: int, n_pad: int) -> int:
    per_head = 3 * n_pad * n_pad * 4
    max_g = max(int(_VMEM_TEMP_BUDGET // per_head), 1)
    for g in range(min(max_g, num_heads), 0, -1):
        if num_heads % g == 0:
            return g
    return 1


def pallas_attention_profitable(head_dim: int, num_heads: int = 0,
                                batch: int | None = None) -> bool:
    """Whether the fused kernel beats XLA's attention at these shapes.

    Round-3 re-measurement with in-program repetition (one jit scanning the
    kernel REPS times, so per-dispatch relay-tunnel cost cannot pollute
    sub-ms bodies; experiments/results/pallas_attn_bench_r3.json, v5e) shows
    XLA ahead at EVERY M3AE shape: encoder B48·H6·N321·hd64 0.913x,
    decoder B48·H16·N321·hd32 0.749x, decoder B12 0.779x. The round-2
    "+14% at hd64 / +49% at decoder B12" numbers timed per-call dispatches,
    not kernels. XLA already fuses QK^T->mask->softmax->V well here, so the
    default path is XLA everywhere; the kernels stay available explicitly
    via ``MultiHeadAttention(attention_impl="pallas")``."""
    return False


def _packed_pack(num_heads: int, n_pad: int, hd: int) -> int:
    """Largest pack P (dividing num_heads, ≤ 128//hd) whose in-kernel f32
    temporaries — Q_blk/out4 [P·N, P·hd] ×2, att [P·N, N], K4/V4 [N, P·hd]
    — fit the VMEM budget. Returns 1 when packing can't fit (caller falls
    back to the per-head grouped kernel)."""
    for p in range(min(128 // hd, num_heads), 1, -1):
        if num_heads % p:
            continue
        temps = 8 * p * p * n_pad * hd + 4 * p * n_pad * n_pad \
            + 8 * p * n_pad * hd
        if temps <= _VMEM_TEMP_BUDGET:
            return p
    return 1


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale, group):
    pad = mask_ref[0]                              # [1, N] 1.0 = PAD
    for h in range(group):
        q = q_ref[0, h].astype(jnp.float32)        # [N, hd]
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        att = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        att = jnp.where(pad > 0, -1e7, att)
        att = jax.nn.softmax(att, axis=-1)
        out_ref[0, h] = jnp.dot(att, v, preferred_element_type=jnp.float32
                                ).astype(out_ref.dtype)


def _attention_kernel_packed(q_ref, k_ref, v_ref, mask_ref, out_ref, *,
                             scale, pack):
    """Lane-packed attention for small heads (hd < 64).

    ``pack`` heads are processed per program. Per-head [N, hd] operands
    leave 128−hd lanes idle on the MXU; instead the heads' queries are
    stacked block-diagonally into Q_blk [P·N, P·hd] and keys/values
    concatenated along lanes (K4, V4 [N, P·hd]), so

        att_stack = Q_blk · K4ᵀ   ∈ [P·N, N]   (row block h = Q_h K_hᵀ)

    runs one full-width (P·hd = 128 lane) matmul instead of P quarter-width
    ones. Row-wise softmax normalizes each head independently (rows never
    mix heads). The output matmul att_stack · V4 ∈ [P·N, P·hd] computes all
    head×value-block products; the per-head outputs are its diagonal blocks.
    """
    n_pad, hd = q_ref.shape[2], q_ref.shape[3]
    pad = mask_ref[0]                                   # [1, N] 1.0 = PAD
    # Block-diagonal Q from static concats (Mosaic has no in-kernel scatter).
    blocks = []
    for h in range(pack):
        q_h = q_ref[0, h].astype(jnp.float32)
        pieces = []
        if h:
            pieces.append(jnp.zeros((n_pad, h * hd), jnp.float32))
        pieces.append(q_h)
        if pack - 1 - h:
            pieces.append(jnp.zeros((n_pad, (pack - 1 - h) * hd), jnp.float32))
        blocks.append(jnp.concatenate(pieces, axis=-1) if len(pieces) > 1
                      else pieces[0])
    q_blk = jnp.concatenate(blocks, axis=0)             # [P·N, P·hd]
    k4 = jnp.concatenate([k_ref[0, h].astype(jnp.float32)
                          for h in range(pack)], axis=-1)  # [N, P·hd]
    v4 = jnp.concatenate([v_ref[0, h].astype(jnp.float32)
                          for h in range(pack)], axis=-1)
    att = jax.lax.dot_general(q_blk, k4, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * scale
    att = jnp.where(pad > 0, -1e7, att)                 # key-side mask, all rows
    att = jax.nn.softmax(att, axis=-1)
    out4 = jnp.dot(att, v4, preferred_element_type=jnp.float32)
    for h in range(pack):
        out_ref[0, h] = out4[h * n_pad:(h + 1) * n_pad,
                             h * hd:(h + 1) * hd].astype(out_ref.dtype)


def _attention_reference(q, k, v, padding_mask, scale):
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                     preferred_element_type=jnp.float32) * scale
    if padding_mask is not None:
        att = jnp.where(padding_mask[:, None, None, :] > 0,
                        jnp.asarray(-1e7, att.dtype), att)
    att = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", att, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _pallas_forward(q, k, v, padding_mask, scale, interpret=False):
    B, H, N, hd = q.shape
    n_pad = _round_up(N, 128)

    def pad_seq(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - N), (0, 0)))

    qp, kp, vp = pad_seq(q), pad_seq(k), pad_seq(v)
    if padding_mask is None:
        padding_mask = jnp.zeros((B, N), jnp.float32)
    # padded key slots must be masked out of the softmax
    maskp = jnp.pad(padding_mask.astype(jnp.float32), ((0, 0), (0, n_pad - N)),
                    constant_values=1.0)[:, None, :]

    G = _packed_pack(H, n_pad, hd) if hd < 64 else 1
    if G > 1:                  # lane-packed: one pack of heads per program
        kernel = functools.partial(_attention_kernel_packed, scale=scale, pack=G)
    else:
        G = _head_group(H, n_pad)
        kernel = functools.partial(_attention_kernel, scale=scale, group=G)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, hd), q.dtype),
        grid=(B, H // G),
        in_specs=[
            pl.BlockSpec((1, G, n_pad, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, n_pad, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, n_pad, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, n_pad, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, maskp)
    return out[:, :, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, padding_mask, scale, interpret=False):
    """q, k, v: [B, H, N, hd]; padding_mask: [B, N] with 1.0 = PAD."""
    return _pallas_forward(q, k, v, padding_mask, scale, interpret)


def _fwd(q, k, v, padding_mask, scale, interpret):
    return _pallas_forward(q, k, v, padding_mask, scale, interpret), (q, k, v, padding_mask)


def _bwd(scale, interpret, res, g):
    q, k, v, padding_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _attention_reference(q_, k_, v_, padding_mask, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_attention.defvjp(_fwd, _bwd)
