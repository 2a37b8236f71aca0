"""Loss functions.

Re-implements, as pure jnp functions:

* Margin / Sigmoid / Softplus ranking losses with optional self-adversarial
  negative weighting (reference: module/loss.py:5-53 and
  OpenKE/openke/module/loss/{MarginLoss,SigmoidLoss,SoftplusLoss}.py).
* Masked patch-MSE and masked token cross-entropy + accuracy for the M3AE
  reconstruction objective (reference: module/model.py:164-195).
* Bidirectional InfoNCE contrastive loss between mean image/text tokens with
  temperature 0.05 (reference: module/model.py:578-597).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# Ranking losses — p_score / n_score follow the reference layout:
# p_score [B, 1] (or [B]) and n_score [B, n_neg].
# --------------------------------------------------------------------------

def margin_loss(p_score, n_score, margin=6.0, adv_temperature=None):
    p = p_score.reshape(p_score.shape[0], -1)
    n = n_score.reshape(n_score.shape[0], -1)
    diff = jnp.maximum(p - n, -margin)
    if adv_temperature is not None:
        w = jax.lax.stop_gradient(jax.nn.softmax(-n * adv_temperature, axis=-1))
        return jnp.mean(jnp.sum(w * diff, axis=-1)) + margin
    return jnp.mean(diff) + margin


def sigmoid_loss(p_score, n_score, adv_temperature=None):
    p = p_score.reshape(p_score.shape[0], -1)
    n = n_score.reshape(n_score.shape[0], -1)
    pos = jnp.mean(jax.nn.log_sigmoid(p))
    if adv_temperature is not None:
        w = jax.lax.stop_gradient(jax.nn.softmax(n * adv_temperature, axis=-1))
        neg = jnp.mean(jnp.sum(w * jax.nn.log_sigmoid(-n), axis=-1))
    else:
        neg = jnp.mean(jax.nn.log_sigmoid(-n))
    return -(pos + neg) / 2


def softplus_loss(p_score, n_score, adv_temperature=None):
    p = p_score.reshape(p_score.shape[0], -1)
    n = n_score.reshape(n_score.shape[0], -1)
    pos = jnp.mean(jax.nn.softplus(-p))
    if adv_temperature is not None:
        w = jax.lax.stop_gradient(jax.nn.softmax(n * adv_temperature, axis=-1))
        neg = jnp.mean(jnp.sum(w * jax.nn.softplus(n), axis=-1))
    else:
        neg = jnp.mean(jax.nn.softplus(n))
    return (pos + neg) / 2


LOSSES = {"margin": margin_loss, "sigmoid": sigmoid_loss, "softplus": softplus_loss}


# --------------------------------------------------------------------------
# Reconstruction losses
# --------------------------------------------------------------------------

def patch_mse_loss(patch_output, patch_target, valid=None):
    """Mean per-patch MSE over valid (masked) patches.

    ``valid`` is [B, L] with 1.0 = contributes (the reference passes the
    *mask* — 1 where the token was masked out — so the loss covers
    reconstructed patches only; module/model.py:181-195).
    """
    if valid is None:
        valid = jnp.ones(patch_target.shape[:2], patch_output.dtype)
    valid_ratio = jnp.sum(valid, axis=-1) / valid.shape[-1]
    per_patch = jnp.mean(jnp.square(patch_target - patch_output), axis=-1)
    per_ex = jnp.mean(jnp.where(valid > 0.0, per_patch, 0.0), axis=-1) / jnp.maximum(valid_ratio, 1e-5)
    return jnp.mean(per_ex)


def cross_entropy_loss_and_accuracy(logits, tokens, valid=None):
    """Per-example length-normalized token CE + accuracy
    (reference: module/model.py:164-179)."""
    if valid is None:
        valid = jnp.ones(tokens.shape[:2], jnp.float32)
    valid_len = jnp.maximum(jnp.sum(valid, axis=-1), 1e-5)
    logp = jax.nn.log_softmax(logits, axis=-1)
    token_logp = jnp.take_along_axis(logp, tokens[..., None].astype(jnp.int32), axis=-1)[..., 0]
    token_logp = jnp.where(valid > 0.0, token_logp, 0.0)
    loss = -jnp.mean(jnp.sum(token_logp, axis=-1) / valid_len)
    correct = jnp.where(valid > 0.0, jnp.argmax(logits, axis=-1) == tokens, False)
    accuracy = jnp.mean(jnp.sum(correct, axis=-1) / valid_len)
    return loss, accuracy


def mask_intersection(mask1, mask2):
    return jnp.logical_and(mask1 > 0, mask2 > 0).astype(jnp.float32)


def mask_not(mask):
    return 1.0 - mask


# --------------------------------------------------------------------------
# Contrastive loss
# --------------------------------------------------------------------------

def contrastive_loss(image_rep, text_rep, bidirect=True, temperature=0.05,
                     row_mask=None):
    """Bidirectional InfoNCE over normalized mean-token reps
    (reference: module/model.py:578-597; diagonal of log_softmax over axis 0).

    ``row_mask`` [N] excludes padded batch rows: a padded row is an exact
    duplicate of a real one (graph_sampler pads by repeating a node), so
    left in it would both add an unbeatable duplicate negative column AND
    contribute its own diagonal term. Masked rows are dropped from the
    softmax (both directions) and from the mean."""
    a = image_rep / jnp.maximum(jnp.linalg.norm(image_rep, axis=-1, keepdims=True), 1e-12)
    b = text_rep / jnp.maximum(jnp.linalg.norm(text_rep, axis=-1, keepdims=True), 1e-12)
    total = jnp.dot(a, b.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(total.shape[0])

    if row_mask is None:
        def _nce(m):
            return -jnp.mean(jnp.diag(jax.nn.log_softmax(m, axis=0)))

        def _acc(m):
            return jnp.mean(jnp.argmax(m, axis=0) == labels)
    else:
        valid = row_mask.astype(bool)
        w = valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        # mask rows AND columns so both softmax directions see only real rows
        total = jnp.where(valid[:, None] & valid[None, :], total, -1e9)

        def _nce(m):
            return -jnp.sum(jnp.diag(jax.nn.log_softmax(m, axis=0)) * w) / denom

        def _acc(m):
            ok = (jnp.argmax(m, axis=0) == labels).astype(jnp.float32)
            return jnp.sum(ok * w) / denom

    if not bidirect:
        return _nce(total), _acc(total)
    nce = (_nce(total) + _nce(total.T)) / 2
    acc = (_acc(total) + _acc(total.T)) / 2
    return nce, acc
