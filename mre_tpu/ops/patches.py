"""Image patch extract/merge as pure reshapes (XLA-fusable, no data copies).

Reference semantics: module/model.py:86-92 (extract_patches),
module/utils.py:246-252 (merge_patches). Layout is NHWC with patches
flattened row-major to [B, (H/p)·(W/p), p²·C].
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patches(image, patch_size: int):
    """Works on jnp arrays (device) and np arrays (host — pure reshape,
    no transfer)."""
    b, h, w, c = image.shape
    gh, gw = h // patch_size, w // patch_size
    x = image.reshape(b, gh, patch_size, gw, patch_size, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch_size * patch_size * c)


def merge_patches(patches: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    b, length, _ = patches.shape
    side = int(round(length ** 0.5))
    x = patches.reshape(b, side, side, patch_size, patch_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, side * patch_size, side * patch_size, -1)


def mask_select(mask: jnp.ndarray, this: jnp.ndarray, other=None) -> jnp.ndarray:
    """Where mask == 0 keep `this`, else `other` (module/utils.py:254-259)."""
    if other is None:
        other = jnp.zeros((), this.dtype)
    if this.ndim == 3:
        mask = mask[..., None]
    return jnp.where(mask == 0.0, this, other)
