"""Knowledge-graph-embedding score functions, TPU-native.

The full OpenKE model zoo (reference: OpenKE/openke/module/model/*.py —
TransE, TransH, TransR, TransD, DistMult, ComplEx, RESCAL, Analogy, SimplE,
RotatE, HolE) re-designed as *pure functions over parameter pytrees*:

* ``init(key, n_ent, n_rel, dim)``  → params dict
* ``score(params, h, r, t)``        → training-orientation score, broadcasting
  over arbitrary index shapes (replaces OpenKE's flat head_batch/tail_batch
  reshape gymnastics — rank-against-all-entities is just ``h[:, None]`` vs
  ``t[None, :]``).
* ``predict(params, h, r, t)``      → **lower-is-better** ranking score,
  matching each reference model's ``predict()`` orientation so ranking
  metrics are directly comparable.
* optional ``score_all_tails/heads(params, h, r)`` — MXU matmul fast path for
  bilinear models (DistMult/ComplEx/SimplE/Analogy/RESCAL/HolE) scoring every
  entity with one [B, d] × [d, E] contraction.

All gathers/compute stay in float32 by default (tables are small at dim≤200);
training steps may cast activations to bfloat16 upstream.

HolE implements circular correlation with ``jnp.fft`` — repairing the
reference's dead ``torch.rfft`` path (OpenKE HolE.py:61-65, removed in
torch≥1.8).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform(key, shape, dtype=jnp.float32):
    """xavier_uniform over the full table, matching torch's init of an
    [rows, dim] embedding weight: limit = sqrt(6 / (rows + dim))."""
    limit = float(np.sqrt(6.0 / (shape[0] + shape[-1])))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _norm(x, p, axis=-1):
    if p == 1:
        return jnp.sum(jnp.abs(x), axis=axis)
    return jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=axis), 1e-30))


def _l2n(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


# NOTE (round 3): a custom-VJP gather whose backward sorts the flat indices
# and segment-sums (replacing the unsorted scatter-add that the RotatE step
# trace showed costing 10.7 ms at [128k, 2048]) measured NET-NEUTRAL on the
# v5e — 44.6 vs 43.5 ms/step (rotate_profile_r3c vs r3b): permuting the
# gradient rows into sorted order is itself a ~1 GB random row gather that
# costs what the scatter saved. Kept out of the hot path; the scatter IS
# the bandwidth floor for sampled-negative training at this shape.


@dataclasses.dataclass(frozen=True)
class KGEModel:
    name: str
    init: Callable
    score: Callable                 # training orientation (reference forward())
    predict: Callable               # lower-is-better ranking orientation
    regularization: Callable
    higher_is_better: bool          # orientation of `score` for loss wiring
    # Fast rank-all paths; both return the *predict* (lower-is-better)
    # orientation so evaluators can consume them directly.
    score_all_tails: Callable | None = None
    score_all_heads: Callable | None = None
    # Optional structured-batch training path ``(params, batch, **kw) →
    # (p [B], n [B, N])`` consuming a sampling.NegativeBatch, for models
    # whose per-triple parameter gathers are the step bottleneck (TransR:
    # one [B, de, dr] relation-matrix gather shared across a positive's
    # negatives; RotatE: rotation computed once per positive + sided
    # negatives so uncorrupted-side gradients avoid colliding scatters).
    score_pos_neg: Callable | None = None


MODELS: dict[str, KGEModel] = {}


def register(model: KGEModel) -> KGEModel:
    MODELS[model.name] = model
    return model


def _mean_sq(*xs):
    return sum(jnp.mean(x * x) for x in xs) / len(xs)


def _table_init(key, shape, dim, margin=None, epsilon=None):
    """Reference embedding-init branch (TransE.py:20-36; same pattern in
    TransH/TransD/DistMult/HolE): xavier_uniform unless BOTH margin and
    epsilon are given, in which case uniform(±(margin+epsilon)/dim) — the
    wide-range init the self-adversarial recipes depend on (e.g.
    train_distmult_WN18RR_adv.py: dim 1024, margin 200, epsilon 2)."""
    if margin is None or epsilon is None:
        return xavier_uniform(key, shape)
    rng = (margin + epsilon) / dim
    return jax.random.uniform(key, shape, minval=-rng, maxval=rng)


# --------------------------------------------------------------------------
# Translation family
# --------------------------------------------------------------------------

def _transe_init(key, n_ent, n_rel, dim=200, margin=None, epsilon=None, **kw):
    k1, k2 = jax.random.split(key)
    return {"ent": _table_init(k1, (n_ent, dim), dim, margin, epsilon),
            "rel": _table_init(k2, (n_rel, dim), dim, margin, epsilon)}


def _transe_score(params, h, r, t, p_norm=1, norm_flag=True):
    he, re, te = params["ent"][h], params["rel"][r], params["ent"][t]
    if norm_flag:
        he, re, te = _l2n(he), _l2n(re), _l2n(te)
    return _norm(he + re - te, p_norm)


def _transe_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r])


register(KGEModel(
    name="transe", init=_transe_init, score=_transe_score, predict=_transe_score,
    regularization=_transe_reg, higher_is_better=False,
))


def _transh_init(key, n_ent, n_rel, dim=200, margin=None, epsilon=None, **kw):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"ent": _table_init(k1, (n_ent, dim), dim, margin, epsilon),
            "rel": _table_init(k2, (n_rel, dim), dim, margin, epsilon),
            "norm": _table_init(k3, (n_rel, dim), dim, margin, epsilon)}


def _transh_score(params, h, r, t, p_norm=1, norm_flag=True):
    he, re, te = params["ent"][h], params["rel"][r], params["ent"][t]
    w = _l2n(params["norm"][r])
    he = he - jnp.sum(he * w, -1, keepdims=True) * w
    te = te - jnp.sum(te * w, -1, keepdims=True) * w
    if norm_flag:
        he, re, te = _l2n(he), _l2n(re), _l2n(te)
    return _norm(he + re - te, p_norm)


def _transh_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r], params["norm"][r])


register(KGEModel(
    name="transh", init=_transh_init, score=_transh_score, predict=_transh_score,
    regularization=_transh_reg, higher_is_better=False,
))


def _transr_init(key, n_ent, n_rel, dim_e=None, dim_r=None, dim=200,
                 rand_init=False, **kw):
    # dim is the KGETrainer-facing knob; dim_e/dim_r override it (TransR.py)
    dim_e = dim if dim_e is None else dim_e
    dim_r = dim if dim_r is None else dim_r
    k1, k2, k3 = jax.random.split(key, 3)
    if rand_init:
        mat = xavier_uniform(k3, (n_rel, dim_e * dim_r)).reshape(n_rel, dim_e, dim_r)
    else:
        eye = jnp.zeros((dim_e, dim_r)).at[jnp.arange(min(dim_e, dim_r)), jnp.arange(min(dim_e, dim_r))].set(1.0)
        mat = jnp.broadcast_to(eye, (n_rel, dim_e, dim_r))
    return {"ent": xavier_uniform(k1, (n_ent, dim_e)),
            "rel": xavier_uniform(k2, (n_rel, dim_r)),
            "mat": mat}


def _transr_score(params, h, r, t, p_norm=1, norm_flag=True):
    he, re, te = params["ent"][h], params["rel"][r], params["ent"][t]
    m = params["mat"][r]  # [..., dim_e, dim_r]
    he = jnp.einsum("...e,...er->...r", he, m)
    te = jnp.einsum("...e,...er->...r", te, m)
    if norm_flag:
        he, re, te = _l2n(he), _l2n(re), _l2n(te)
    return _norm(he + re - te, p_norm)


def _transr_score_pos_neg(params, batch, p_norm=1, norm_flag=True):
    """Structured TransR batch scorer: gathers M_r once per POSITIVE and
    shares it across that positive's negatives as batched MXU einsums.

    The generic path gathers ``mat[r]`` per scored triple — [B, N, de, dr]
    ≈ 11 GB/step on FB15K237 (gather-bound, ~17.6 s/epoch measured round 2).
    This form moves B rows instead (25× less) and turns the projections
    into ``bnd,bdk->bnk`` contractions the MXU runs at peak.
    """
    h, r, t = batch.h, batch.r, batch.t
    neg_h, neg_t = batch.neg_h, batch.neg_t
    m = params["mat"][r]                                    # [B, de, dr]
    he, te, re = params["ent"][h], params["ent"][t], params["rel"][r]
    hp = jnp.einsum("bd,bdk->bk", he, m)
    tp = jnp.einsum("bd,bdk->bk", te, m)
    nhp = jnp.einsum("bnd,bdk->bnk", params["ent"][neg_h], m)
    ntp = jnp.einsum("bnd,bdk->bnk", params["ent"][neg_t], m)
    if norm_flag:
        hp, tp, re = _l2n(hp), _l2n(tp), _l2n(re)
        nhp, ntp = _l2n(nhp), _l2n(ntp)
    p = _norm(hp + re - tp, p_norm)
    n = _norm(nhp + re[:, None, :] - ntp, p_norm)
    return p, n


def transr_all_tails(params, h, r, p_norm=1, norm_flag=True):
    """Rank-all-tails for TransR: project the WHOLE entity table with each
    query's M_r as one ``ed,bdk->bek`` contraction (no per-candidate
    matrix gather). Returns distances (lower = better). Memory is
    [B, E, dr] — bound it with the eval chunk size."""
    m = params["mat"][r]                                    # [B, de, dr]
    hp = jnp.einsum("bd,bdk->bk", params["ent"][h], m)
    re = params["rel"][r]
    ep = jnp.einsum("ed,bdk->bek", params["ent"], m)        # [B, E, dr]
    if norm_flag:
        hp, re, ep = _l2n(hp), _l2n(re), _l2n(ep)
    return _norm((hp + re)[:, None, :] - ep, p_norm)


def transr_all_heads(params, t, r, p_norm=1, norm_flag=True):
    m = params["mat"][r]
    tp = jnp.einsum("bd,bdk->bk", params["ent"][t], m)
    re = params["rel"][r]
    ep = jnp.einsum("ed,bdk->bek", params["ent"], m)
    if norm_flag:
        tp, re, ep = _l2n(tp), _l2n(re), _l2n(ep)
    return _norm(ep + (re - tp)[:, None, :], p_norm)


def _transr_reg(params, h, r, t):
    reg = _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r], params["mat"][r])
    return reg * reg  # reference squares TransR's regularizer (TransR.py:102)


register(KGEModel(
    name="transr", init=_transr_init, score=_transr_score, predict=_transr_score,
    regularization=_transr_reg, higher_is_better=False,
    score_pos_neg=_transr_score_pos_neg,
))


def _transd_init(key, n_ent, n_rel, dim_e=None, dim_r=None, dim=200,
                 margin=None, epsilon=None, **kw):
    # dim is the KGETrainer-facing knob; dim_e/dim_r override it (TransD.py)
    dim_e = dim if dim_e is None else dim_e
    dim_r = dim if dim_r is None else dim_r
    ks = jax.random.split(key, 4)
    # TransD.py:29-54: separate ent/rel ranges, transfers share them
    return {"ent": _table_init(ks[0], (n_ent, dim_e), dim_e, margin, epsilon),
            "rel": _table_init(ks[1], (n_rel, dim_r), dim_r, margin, epsilon),
            "ent_p": _table_init(ks[2], (n_ent, dim_e), dim_e, margin, epsilon),
            "rel_p": _table_init(ks[3], (n_rel, dim_r), dim_r, margin, epsilon)}


def _resize_last(x, size):
    cur = x.shape[-1]
    if cur == size:
        return x
    if cur > size:
        return x[..., :size]
    pad = [(0, 0)] * (x.ndim - 1) + [(0, size - cur)]
    return jnp.pad(x, pad)


def _transd_score(params, h, r, t, p_norm=1, norm_flag=True):
    he, re, te = params["ent"][h], params["rel"][r], params["ent"][t]
    hp, tp, rp = params["ent_p"][h], params["ent_p"][t], params["rel_p"][r]
    he = _l2n(_resize_last(he, rp.shape[-1]) + jnp.sum(he * hp, -1, keepdims=True) * rp)
    te = _l2n(_resize_last(te, rp.shape[-1]) + jnp.sum(te * tp, -1, keepdims=True) * rp)
    if norm_flag:
        he, re, te = _l2n(he), _l2n(re), _l2n(te)
    return _norm(he + re - te, p_norm)


def _transd_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r],
                    params["ent_p"][h], params["ent_p"][t], params["rel_p"][r])


register(KGEModel(
    name="transd", init=_transd_init, score=_transd_score, predict=_transd_score,
    regularization=_transd_reg, higher_is_better=False,
))


# --------------------------------------------------------------------------
# Bilinear family (MXU matmul fast paths for rank-all eval)
# --------------------------------------------------------------------------

def _distmult_init(key, n_ent, n_rel, dim=200, margin=None, epsilon=None, **kw):
    k1, k2 = jax.random.split(key)
    return {"ent": _table_init(k1, (n_ent, dim), dim, margin, epsilon),
            "rel": _table_init(k2, (n_rel, dim), dim, margin, epsilon)}


def _distmult_score(params, h, r, t):
    return jnp.sum(params["ent"][h] * params["rel"][r] * params["ent"][t], -1)


def _distmult_all_tails(params, h, r):
    hr = params["ent"][h] * params["rel"][r]               # [B, d]
    return -jnp.dot(hr, params["ent"].T, preferred_element_type=jnp.float32)


def _distmult_all_heads(params, t, r):
    tr = params["ent"][t] * params["rel"][r]
    return -jnp.dot(tr, params["ent"].T, preferred_element_type=jnp.float32)


def _distmult_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r])


def distmult_l3_regularization(params):
    """Reference DistMult.l3_regularization (DistMult.py:69-70)."""
    return (jnp.sum(jnp.abs(params["ent"]) ** 3) + jnp.sum(jnp.abs(params["rel"]) ** 3))


register(KGEModel(
    name="distmult", init=_distmult_init, score=_distmult_score,
    predict=lambda p, h, r, t: -_distmult_score(p, h, r, t),
    regularization=_distmult_reg, higher_is_better=True,
    score_all_tails=_distmult_all_tails, score_all_heads=_distmult_all_heads,
))


def _complex_init(key, n_ent, n_rel, dim=200, **kw):
    ks = jax.random.split(key, 4)
    return {"ent_re": xavier_uniform(ks[0], (n_ent, dim)),
            "ent_im": xavier_uniform(ks[1], (n_ent, dim)),
            "rel_re": xavier_uniform(ks[2], (n_rel, dim)),
            "rel_im": xavier_uniform(ks[3], (n_rel, dim))}


def _complex_score(params, h, r, t):
    hr, hi = params["ent_re"][h], params["ent_im"][h]
    tr, ti = params["ent_re"][t], params["ent_im"][t]
    rr, ri = params["rel_re"][r], params["rel_im"][r]
    return jnp.sum(hr * tr * rr + hi * ti * rr + hr * ti * ri - hi * tr * ri, -1)


def _complex_sim_all_tails(params, h, r):
    hr, hi = params["ent_re"][h], params["ent_im"][h]
    rr, ri = params["rel_re"][r], params["rel_im"][r]
    a = hr * rr - hi * ri     # coefficient of t_re
    b = hi * rr + hr * ri     # coefficient of t_im
    return (jnp.dot(a, params["ent_re"].T, preferred_element_type=jnp.float32)
            + jnp.dot(b, params["ent_im"].T, preferred_element_type=jnp.float32))


def _complex_sim_all_heads(params, t, r):
    tr, ti = params["ent_re"][t], params["ent_im"][t]
    rr, ri = params["rel_re"][r], params["rel_im"][r]
    a = tr * rr + ti * ri     # coefficient of h_re
    b = ti * rr - tr * ri     # coefficient of h_im
    return (jnp.dot(a, params["ent_re"].T, preferred_element_type=jnp.float32)
            + jnp.dot(b, params["ent_im"].T, preferred_element_type=jnp.float32))


def _complex_reg(params, h, r, t):
    return _mean_sq(params["ent_re"][h], params["ent_im"][h], params["ent_re"][t],
                    params["ent_im"][t], params["rel_re"][r], params["rel_im"][r])


register(KGEModel(
    name="complex", init=_complex_init, score=_complex_score,
    predict=lambda p, h, r, t: -_complex_score(p, h, r, t),
    regularization=_complex_reg, higher_is_better=True,
    score_all_tails=lambda p, h, r: -_complex_sim_all_tails(p, h, r),
    score_all_heads=lambda p, t, r: -_complex_sim_all_heads(p, t, r),
))


def _rescal_init(key, n_ent, n_rel, dim=200, **kw):
    k1, k2 = jax.random.split(key)
    return {"ent": xavier_uniform(k1, (n_ent, dim)),
            "mat": xavier_uniform(k2, (n_rel, dim * dim)).reshape(n_rel, dim, dim)}


def _rescal_score(params, h, r, t):
    # Reference RESCAL forward returns NEGATIVE similarity (RESCAL.py:22).
    he, te = params["ent"][h], params["ent"][t]
    m = params["mat"][r]
    tr = jnp.einsum("...ij,...j->...i", m, te)
    return -jnp.sum(he * tr, -1)


def _rescal_all_tails(params, h, r):
    he = params["ent"][h]
    m = params["mat"][r]
    hm = jnp.einsum("bi,bij->bj", he, m)      # [B, d]
    return -jnp.dot(hm, params["ent"].T, preferred_element_type=jnp.float32)


def _rescal_all_heads(params, t, r):
    te = params["ent"][t]
    m = params["mat"][r]
    mt = jnp.einsum("bij,bj->bi", m, te)
    return -jnp.dot(mt, params["ent"].T, preferred_element_type=jnp.float32)


def _rescal_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["mat"][r])


register(KGEModel(
    # RESCAL's forward is already lower-is-better (negative similarity,
    # RESCAL.py:22). The reference's predict() negates it *again*
    # (RESCAL.py:44), handing the ranking loop a higher-is-better score even
    # though Test.h ranks lower-is-better — a reference defect we repair:
    # predict here keeps the lower-is-better orientation (= forward).
    name="rescal", init=_rescal_init, score=_rescal_score,
    predict=_rescal_score,
    regularization=_rescal_reg, higher_is_better=False,
    score_all_tails=_rescal_all_tails,
    score_all_heads=_rescal_all_heads,
))


def _analogy_init(key, n_ent, n_rel, dim=200, **kw):
    ks = jax.random.split(key, 6)
    return {"ent_re": xavier_uniform(ks[0], (n_ent, dim)),
            "ent_im": xavier_uniform(ks[1], (n_ent, dim)),
            "rel_re": xavier_uniform(ks[2], (n_rel, dim)),
            "rel_im": xavier_uniform(ks[3], (n_rel, dim)),
            "ent": xavier_uniform(ks[4], (n_ent, dim * 2)),
            "rel": xavier_uniform(ks[5], (n_rel, dim * 2))}


def _analogy_score(params, h, r, t):
    # Reference Analogy forward = -(complex part + distmult part) (Analogy.py:26-31).
    cpx = _complex_score({"ent_re": params["ent_re"], "ent_im": params["ent_im"],
                          "rel_re": params["rel_re"], "rel_im": params["rel_im"]}, h, r, t)
    dm = jnp.sum(params["ent"][h] * params["rel"][r] * params["ent"][t], -1)
    return -(cpx + dm)


def _analogy_all_tails(params, h, r):
    # predict orientation: reference Analogy.predict = −forward = cpx + dm,
    # which training (SoftplusLoss on forward = −(cpx+dm)) drives LOW for
    # positives — lower-is-better, consistent with Test.h ranking.
    cpx = _complex_sim_all_tails({"ent_re": params["ent_re"], "ent_im": params["ent_im"],
                                  "rel_re": params["rel_re"], "rel_im": params["rel_im"]}, h, r)
    hr = params["ent"][h] * params["rel"][r]
    dm = jnp.dot(hr, params["ent"].T, preferred_element_type=jnp.float32)
    return cpx + dm


def _analogy_all_heads(params, t, r):
    cpx = _complex_sim_all_heads({"ent_re": params["ent_re"], "ent_im": params["ent_im"],
                                  "rel_re": params["rel_re"], "rel_im": params["rel_im"]}, t, r)
    tr = params["ent"][t] * params["rel"][r]
    dm = jnp.dot(tr, params["ent"].T, preferred_element_type=jnp.float32)
    return cpx + dm


def _analogy_reg(params, h, r, t):
    return _mean_sq(params["ent_re"][h], params["ent_im"][h], params["ent"][h],
                    params["ent_re"][t], params["ent_im"][t], params["ent"][t],
                    params["rel_re"][r], params["rel_im"][r], params["rel"][r])


register(KGEModel(
    # Analogy's forward = −(cpx + dm) is trained UP by SoftplusLoss, so its
    # predict = −forward is lower-is-better — self-consistent (Analogy.py:26-74).
    name="analogy", init=_analogy_init, score=_analogy_score,
    predict=lambda p, h, r, t: -_analogy_score(p, h, r, t),
    regularization=_analogy_reg, higher_is_better=True,
    score_all_tails=_analogy_all_tails, score_all_heads=_analogy_all_heads,
))


def _simple_init(key, n_ent, n_rel, dim=200, **kw):
    ks = jax.random.split(key, 3)
    return {"ent": xavier_uniform(ks[0], (n_ent, dim)),
            "rel": xavier_uniform(ks[1], (n_rel, dim)),
            "rel_inv": xavier_uniform(ks[2], (n_rel, dim))}


def _simple_score(params, h, r, t):
    he, te = params["ent"][h], params["ent"][t]
    re, ri = params["rel"][r], params["rel_inv"][r]
    return (jnp.sum(he * re * te, -1) + jnp.sum(he * ri * te, -1)) / 2


def _simple_predict(params, h, r, t):
    # Reference SimplE.predict uses only the forward direction (SimplE.py:48-54).
    return -jnp.sum(params["ent"][h] * params["rel"][r] * params["ent"][t], -1)


def _simple_all_tails(params, h, r):
    hr = params["ent"][h] * params["rel"][r]
    return -jnp.dot(hr, params["ent"].T, preferred_element_type=jnp.float32)


def _simple_all_heads(params, t, r):
    tr = params["ent"][t] * params["rel"][r]
    return -jnp.dot(tr, params["ent"].T, preferred_element_type=jnp.float32)


def _simple_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r], params["rel_inv"][r])


register(KGEModel(
    name="simple", init=_simple_init, score=_simple_score, predict=_simple_predict,
    regularization=_simple_reg, higher_is_better=True,
    score_all_tails=_simple_all_tails, score_all_heads=_simple_all_heads,
))


# --------------------------------------------------------------------------
# Rotation / correlation family
# --------------------------------------------------------------------------

def _rotate_init(key, n_ent, n_rel, dim=200, margin=6.0, epsilon=2.0, **kw):
    k1, k2 = jax.random.split(key)
    dim_e, dim_r = dim * 2, dim
    ent_range = (margin + epsilon) / dim_e
    rel_range = (margin + epsilon) / dim_r
    return {"ent": jax.random.uniform(k1, (n_ent, dim_e), jnp.float32, -ent_range, ent_range),
            "rel": jax.random.uniform(k2, (n_rel, dim_r), jnp.float32, -rel_range, rel_range),
            "margin": jnp.asarray(margin, jnp.float32),
            "rel_range": jnp.asarray(rel_range, jnp.float32)}


def _rotate_distance(params, h, r, t):
    he, te, re = params["ent"][h], params["ent"][t], params["rel"][r]
    dim = re.shape[-1]
    h_re, h_im = he[..., :dim], he[..., dim:]
    t_re, t_im = te[..., :dim], te[..., dim:]
    # margin/rel_range are frozen buffers in the reference
    # (RotatE.py: requires_grad=False) — block gradients so optimizers
    # never drift them.
    phase = re / (jax.lax.stop_gradient(params["rel_range"]) / jnp.pi)
    r_re, r_im = jnp.cos(phase), jnp.sin(phase)
    s_re = h_re * r_re - h_im * r_im - t_re
    s_im = h_re * r_im + h_im * r_re - t_im
    return jnp.sum(jnp.sqrt(jnp.maximum(s_re * s_re + s_im * s_im, 1e-30)), -1)


def _rotate_score(params, h, r, t):
    # Reference RotatE forward = margin − distance (RotatE.py:83-92).
    return jax.lax.stop_gradient(params["margin"]) - _rotate_distance(params, h, r, t)


def _rotate_predict(params, h, r, t):
    # Reference predict = −forward = distance − margin (RotatE.py:94-96).
    return _rotate_distance(params, h, r, t) - jax.lax.stop_gradient(params["margin"])


def _rotate_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r])


def _rotate_score_pos_neg(params, batch):
    """Structured RotatE batch scorer.

    Two restructurings over the generic per-triple path (together they
    attack the measured 79 ms/step at the adv recipe's 2000×64×1024 —
    ~8× roofline, round-2 notes):

    * the rotation (phase → cos/sin) depends on the POSITIVE's relation
      only — computed once per positive ([B, dim]), not per negative
      ([B, N, dim] gathers + 65× redundant transcendentals);
    * with the batch's sided view (``neg_ent``/``neg_side``), only the
      CORRUPTED entity is gathered per negative. The uncorrupted side
      reuses the positive's embedding via broadcast, so its gradient
      reaches the table through a reduction over N instead of an N-way
      colliding scatter-add per positive row.
    """
    h, r, t = batch.h, batch.r, batch.t
    dim = params["rel"].shape[-1]
    phase = params["rel"][r] / (jax.lax.stop_gradient(params["rel_range"]) / jnp.pi)
    r_re, r_im = jnp.cos(phase), jnp.sin(phase)             # [B, dim]

    def split(e):
        return e[..., :dim], e[..., dim:]

    def dsum(s_re, s_im):
        return jnp.sum(jnp.sqrt(jnp.maximum(s_re * s_re + s_im * s_im, 1e-30)), -1)

    h_re, h_im = split(params["ent"][h])
    t_re, t_im = split(params["ent"][t])
    hr_re = h_re * r_re - h_im * r_im                       # h ∘ r, [B, dim]
    hr_im = h_re * r_im + h_im * r_re
    margin = jax.lax.stop_gradient(params["margin"])
    p = margin - dsum(hr_re - t_re, hr_im - t_im)

    if batch.neg_ent is None:
        nh_re, nh_im = split(params["ent"][batch.neg_h])
        nt_re, nt_im = split(params["ent"][batch.neg_t])
        s_re = nh_re * r_re[:, None] - nh_im * r_im[:, None] - nt_re
        s_im = nh_re * r_im[:, None] + nh_im * r_re[:, None] - nt_im
        return p, margin - dsum(s_re, s_im)

    e_re, e_im = split(params["ent"][batch.neg_ent])        # [B, N, dim]
    # tail replaced: |h∘r − e|; head replaced: |e∘r − t|. The rotation has
    # unit modulus per component, so |e∘r − t| = |e − t∘conj(r)|: BOTH
    # sides reduce to |e − c| with a per-POSITIVE center c — one distance
    # evaluation (and one [B,N,dim] select) per negative instead of two
    # full distance computations.
    tc_re = t_re * r_re + t_im * r_im                       # t ∘ conj(r)
    tc_im = t_im * r_re - t_re * r_im
    side = batch.neg_side[..., None]
    c_re = jnp.where(side, hr_re[:, None], tc_re[:, None])
    c_im = jnp.where(side, hr_im[:, None], tc_im[:, None])
    n = margin - dsum(e_re - c_re, e_im - c_im)
    return p, n


register(KGEModel(
    name="rotate", init=_rotate_init, score=_rotate_score, predict=_rotate_predict,
    regularization=_rotate_reg, higher_is_better=True,
    score_pos_neg=_rotate_score_pos_neg,
))


def _hole_init(key, n_ent, n_rel, dim=200, margin=None, epsilon=None, **kw):
    k1, k2 = jax.random.split(key)
    return {"ent": _table_init(k1, (n_ent, dim), dim, margin, epsilon),
            "rel": _table_init(k2, (n_rel, dim), dim, margin, epsilon)}


def _ccorr(a, b):
    """Circular correlation via FFT: ifft(conj(fft(a)) · fft(b)).real."""
    fa = jnp.fft.fft(a.astype(jnp.complex64), axis=-1)
    fb = jnp.fft.fft(b.astype(jnp.complex64), axis=-1)
    return jnp.real(jnp.fft.ifft(jnp.conj(fa) * fb, axis=-1)).astype(jnp.float32)


def _hole_score(params, h, r, t):
    he, te, re = params["ent"][h], params["ent"][t], params["rel"][r]
    return jnp.sum(_ccorr(he, te) * re, -1)


def _hole_all_tails(params, h, r):
    # score(h, r, t) = Σ_k r_k ccorr(h, t)_k = Σ_m t_m (h ⊛ r)_m with ⊛ the
    # circular convolution — so one MXU matmul against the entity table.
    fh = jnp.fft.fft(params["ent"][h].astype(jnp.complex64), axis=-1)
    fr = jnp.fft.fft(params["rel"][r].astype(jnp.complex64), axis=-1)
    c = jnp.real(jnp.fft.ifft(fh * fr, axis=-1)).astype(jnp.float32)
    return jnp.dot(c, params["ent"].T, preferred_element_type=jnp.float32)


def _hole_all_heads(params, t, r):
    # score(h, r, t) = Σ_k r_k Σ_m h_m t_{(m+k) mod n} = Σ_m h_m ccorr(r, t)_m
    # — swap the roles so the head side is also one MXU matmul against the
    # entity table (same trick as _hole_all_tails, lags taken on r).
    c = _ccorr(params["rel"][r], params["ent"][t])
    return jnp.dot(c, params["ent"].T, preferred_element_type=jnp.float32)


def _hole_reg(params, h, r, t):
    return _mean_sq(params["ent"][h], params["ent"][t], params["rel"][r])


def hole_l3_regularization(params):
    return (jnp.sum(jnp.abs(params["ent"]) ** 3) + jnp.sum(jnp.abs(params["rel"]) ** 3))


register(KGEModel(
    name="hole", init=_hole_init, score=_hole_score,
    predict=lambda p, h, r, t: -_hole_score(p, h, r, t),
    regularization=_hole_reg, higher_is_better=True,
    score_all_tails=lambda p, h, r: -_hole_all_tails(p, h, r),
    score_all_heads=lambda p, t, r: -_hole_all_heads(p, t, r),
))


def get(name: str) -> KGEModel:
    if name not in MODELS:
        raise KeyError(f"unknown KGE model {name!r}; have {sorted(MODELS)}")
    return MODELS[name]
