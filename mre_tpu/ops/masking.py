"""MAE-style random token masking with static shapes.

Reference semantics (module/model.py:97-111): one shared shuffle per batch
(the same permutation for every example), keep the first ``keep_len`` tokens
of the shuffled sequence, and return the restore permutation. ``keep_len``
derives from a static mask ratio, so all shapes are compile-time constants —
no dynamic-shape recompiles under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Masking(NamedTuple):
    kept: jnp.ndarray          # [B, keep_len, D] kept tokens
    mask: jnp.ndarray          # [B, L] 1.0 where the token was dropped
    ids_restore: jnp.ndarray   # [L] inverse permutation
    padding_mask_kept: jnp.ndarray | None


def random_masking(key: jax.Array, x: jnp.ndarray, keep_len: int,
                   padding_mask: jnp.ndarray | None = None) -> Masking:
    batch, length, _ = x.shape
    ids_shuffle = jax.random.permutation(key, length)
    ids_restore = jnp.argsort(ids_shuffle)

    kept = x[:, ids_shuffle[:keep_len], :]
    mask = jnp.ones((batch, length), jnp.float32)
    mask = mask.at[:, :keep_len].set(0.0)
    mask = mask[:, ids_restore]

    pk = None
    if padding_mask is not None:
        pk = padding_mask[:, ids_shuffle[:keep_len]]
    return Masking(kept=kept, mask=mask, ids_restore=ids_restore, padding_mask_kept=pk)


def restore_with_mask_tokens(kept: jnp.ndarray, mask_token: jnp.ndarray,
                             ids_restore: jnp.ndarray) -> jnp.ndarray:
    """Scatter kept tokens back to original positions, filling dropped slots
    with the learned mask embedding (module/model.py:442-470 semantics)."""
    batch, keep_len, dim = kept.shape
    length = ids_restore.shape[0]
    fill = jnp.broadcast_to(mask_token, (batch, length - keep_len, dim))
    full = jnp.concatenate([kept, fill], axis=1)
    return full[:, ids_restore, :]
