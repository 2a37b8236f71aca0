"""On-device filtered negative sampling.

TPU-native replacement for the reference's pthread C++ sampler (OpenKE
base/Base.cpp:78-197) and its Python cousin
(module/NegativeSampling.py:114-140, 321-375). Everything here is jittable,
batched, and host-loop-free:

* **Exact complement sampling** — the ``corrupt_head``/``corrupt_tail``
  index-shift algorithm of OpenKE base/Corrupt.h:7-83 ("draw u uniform over
  entityTotal − |true set|, then shift u past the sorted true set") is
  vectorized and rejection-free in two tiers: one padded gather of the CSR
  true-set slice for normal rows, and a top_k-compacted masked compare
  against a dense precomputed (value − rank) matrix for the rare oversized
  rows (see ``_complement_draw``). No sequential binary searches on the
  sampling path — TPU random gathers are latency-bound, so parallel depth,
  not FLOPs, sets the speed here.
* **Membership tests** (subgraph-local corruption, triple classification)
  use the same padded-gather + big-row structure (the base/Corrupt.h:166-177
  ``_find``, vectorized with O(1) parallel depth; int32 throughout — no
  64-bit keys on device).
* **Bernoulli head/tail choice** — per-relation left/right means
  (base/Reader.h:141-158, Base.cpp:112-115) drive the corruption side.
"""

from __future__ import annotations

import functools
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp

from mre_tpu.data.kg import DeviceKG
from mre_tpu.data.kg import EXACT_PAD as KG_EXACT_PAD

# Tier-1 pad width for exact complement sampling (must not go below the
# threshold the DeviceKG big-row tables were built with).
EXACT_PAD = KG_EXACT_PAD
REJECTION_ROUNDS = 12


def _contains(kg: DeviceKG, h: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray,
              pad: int | None = None) -> jnp.ndarray:
    """Vectorized membership test over the full (deduped) triple set
    (the base/Corrupt.h:166-177 ``_find``, batched).

    One padded gather of the (h, r) true-tail slice + equality compare —
    parallel depth O(1) instead of a sequential binary search (TPU gathers
    are latency-bound). Rows longer than the pad are resolved against the
    dense big-row matrix via a top_k compaction.
    """
    pad = pad or KG_EXACT_PAD
    shape = h.shape
    h = h.reshape(-1).astype(jnp.int32)
    r = r.reshape(-1).astype(jnp.int32)
    t = t.reshape(-1).astype(jnp.int32)
    rows = h * kg.n_relations + r
    start, cnt, ridx = kg.hr_range(rows)
    lane = jnp.arange(pad, dtype=jnp.int32)
    gidx = jnp.minimum(start[:, None] + lane[None, :], kg.hrt_tails.shape[0] - 1)
    vals = kg.hrt_tails[gidx].astype(jnp.int32)
    valid = lane[None, :] < jnp.minimum(cnt, pad)[:, None]
    found = jnp.any(jnp.logical_and(valid, vals == t[:, None]), axis=-1)

    if kg.hr_big_d.shape[0] > 0:
        overflow = cnt > pad
        n = found.shape[0]
        k = min(n, _overflow_slots(n, kg.hr_overflow_frac))
        _, idx = jax.lax.top_k(overflow.astype(jnp.float32), k)
        slot = jnp.maximum(kg.hr_big_index[ridx[idx]], 0)
        pad_big = kg.hr_big_d.shape[1]
        lane_b = jnp.arange(pad_big, dtype=jnp.int32)
        big_vals = kg.hr_big_d[slot] + lane_b[None, :]   # values = d + rank
        found_big = jnp.any(big_vals == t[idx][:, None], axis=-1)
        found = found.at[idx].set(jnp.where(overflow[idx], found_big, found[idx]))
    return found.reshape(shape)


def _overflow_slots(n: int, frac: float) -> int:
    """Tier-2 compaction width for ``n`` draws when a ``frac`` fraction of
    uniform draws is expected to hit an oversized CSR row. Full coverage for
    small batches; otherwise sized 4× above the expected overflow count (plus
    a constant margin) so silently-kept tier-1 values need a >4× tail event,
    not just a big batch (advisor finding: the old max(1024, n/16) cap could
    silently truncate with no relation to the KG's actual overflow mass)."""
    if n <= 8192:
        return n
    return max(1024, n // 16, min(n, int(n * frac * 4) + 128))


def _complement_draw(key: jax.Array, values: jnp.ndarray,
                     start: jnp.ndarray, cnt: jnp.ndarray, ridx: jnp.ndarray,
                     big_index: jnp.ndarray, big_d: jnp.ndarray,
                     n_total: int, pad: int,
                     overflow_slots: int | None = None,
                     overflow_frac: float = 0.0) -> jnp.ndarray:
    """Draw one uniform sample per row from {0..n_total-1} \\ true_set(row).

    ``start``/``cnt``/``ridx`` come from ``DeviceKG.hr_range``/``tr_range``
    (``ridx`` indexes ``big_index``). Exact, rejection-free, two tiers:
    * tier 1 — rows with ≤ ``pad`` true values: one padded gather of the CSR
      slice, shift u past it (base/Corrupt.h:7-44 vectorized);
    * tier 2 — the rare overflow draws (rows bigger than pad) are compacted
      via ``top_k`` into ``overflow_slots`` lanes and resolved against the
      dense precomputed (value − rank) matrix ``big_d`` — one masked compare,
      no sequential binary searches (TPU random gathers are latency-bound).
    """
    pad = max(pad, KG_EXACT_PAD)   # big-row tables cover cnt > KG_EXACT_PAD
    u = jax.random.randint(key, start.shape, 0, jnp.maximum(n_total - cnt, 1))

    lane = jnp.arange(pad, dtype=jnp.int32)    # [pad]
    gidx = jnp.minimum(start[:, None] + lane[None, :], values.shape[0] - 1)
    vals = values[gidx].astype(jnp.int32)      # [B, pad]
    valid = lane[None, :] < jnp.minimum(cnt, pad)[:, None]
    # d_i = s_i - i; the u-th allowed value is u + #{i : d_i <= u}.
    d = jnp.where(valid, vals - lane[None, :], n_total + 1)
    sample = (u + jnp.sum(d <= u[:, None], axis=-1).astype(u.dtype)).astype(jnp.int32)

    sample, _ = _resolve_overflow(sample, u, ridx, cnt > pad, big_index, big_d,
                                  overflow_slots, overflow_frac)
    return sample


def corrupt_tails(key: jax.Array, kg: DeviceKG, h: jnp.ndarray, r: jnp.ndarray,
                  pad: int = EXACT_PAD) -> jnp.ndarray:
    """One filtered corrupted tail per (h, r) — never a true tail."""
    rows = h.astype(jnp.int32) * kg.n_relations + r.astype(jnp.int32)
    start, cnt, ridx = kg.hr_range(rows)
    return _complement_draw(key, kg.hrt_tails, start, cnt, ridx,
                            kg.hr_big_index, kg.hr_big_d, kg.n_entities, pad)


def corrupt_heads(key: jax.Array, kg: DeviceKG, t: jnp.ndarray, r: jnp.ndarray,
                  pad: int = EXACT_PAD) -> jnp.ndarray:
    """One filtered corrupted head per (t, r) — never a true head."""
    rows = t.astype(jnp.int32) * kg.n_relations + r.astype(jnp.int32)
    start, cnt, ridx = kg.tr_range(rows)
    return _complement_draw(key, kg.trh_heads, start, cnt, ridx,
                            kg.tr_big_index, kg.tr_big_d, kg.n_entities, pad)


class NegativeBatch(NamedTuple):
    """A positive block plus ``n_neg`` corruption blocks, structured layout.

    Shapes are [B] for positives and [B, n_neg] for negatives; labels follow
    the OpenKE convention (+1 positives, −1 negatives).
    """

    h: jnp.ndarray
    r: jnp.ndarray
    t: jnp.ndarray
    neg_h: jnp.ndarray
    neg_t: jnp.ndarray
    # Structured view of the same corruptions: the sampled entity and which
    # side it replaced (True = tail). Lets models avoid gathering the
    # UNCORRUPTED side per negative — those rows duplicate the positive
    # entity, and their gradient scatter-adds collide n_neg-ways per row
    # (the dominant cost of the RotatE step at dim 1024). None on batches
    # built by legacy callers.
    neg_ent: jnp.ndarray | None = None
    neg_side: jnp.ndarray | None = None
    # Number of draws whose tier-2 overflow resolution was truncated by the
    # compaction cap (scalar int32; 0 = exact filtering). Surfaced so a
    # silent filtering approximation can never hide (round-3 verdict).
    overflow_truncated: jnp.ndarray | None = None


def _gather_row_d(values, start, cnt, n_total, pad):
    """Padded (value − rank) slice per row: [B, pad] + cnt [B]."""
    lane = jnp.arange(pad, dtype=jnp.int32)
    gidx = jnp.minimum(start[:, None] + lane[None, :], values.shape[0] - 1)
    vals = values[gidx].astype(jnp.int32)
    valid = lane[None, :] < jnp.minimum(cnt, pad)[:, None]
    d = jnp.where(valid, vals - lane[None, :], n_total + 1)
    return d, cnt


def _resolve_overflow(sample, u, ridx, overflow, big_index, big_d,
                      overflow_slots: int | None = None,
                      overflow_frac: float = 0.0):
    """Tier-2: fix the draws whose row exceeds the pad, via a top_k
    compaction against the dense big-row matrix. ``ridx`` indexes
    ``big_index`` (dense row ids, or compact positions in large-KG mode).

    ``overflow_slots`` bounds the compaction width. Default: full coverage
    for batches ≤ 8192 draws (exactness guaranteed), else sized from the
    KG's measured overflow mass (``overflow_frac``, see ``_overflow_slots``);
    any draw past the cap keeps its tier-1 value (filtered against the first
    ``pad`` true candidates only).

    Returns ``(sample, truncated)``: ``truncated`` is the number of overflow
    draws that did NOT get a tier-2 slot (0 means the resolution was exact;
    round-3 verdict: the approximation must be observable, not silent).
    """
    if big_d.shape[0] == 0:
        return sample, jnp.zeros((), jnp.int32)
    flat = sample.reshape(-1)
    n = flat.shape[0]
    if overflow_slots is None:
        overflow_slots = _overflow_slots(n, overflow_frac)
    u_f = u.reshape(-1)
    rows_f = ridx.reshape(-1)
    over_f = overflow.reshape(-1)
    k = min(overflow_slots, n)
    _, idx = jax.lax.top_k(over_f.astype(jnp.float32), k)
    slot = jnp.maximum(big_index[rows_f[idx]], 0)
    d_o = big_d[slot]
    j = jnp.sum(d_o <= u_f[idx][:, None], axis=-1).astype(jnp.int32)
    resolved = (u_f[idx] + j).astype(jnp.int32)
    flat = flat.at[idx].set(jnp.where(over_f[idx], resolved, flat[idx]))
    truncated = (jnp.sum(over_f.astype(jnp.int32))
                 - jnp.sum(over_f[idx].astype(jnp.int32)))
    return flat.reshape(sample.shape), truncated


@functools.partial(jax.jit, static_argnames=("n_neg", "bern", "pad"))
def corrupt_batch(key: jax.Array, kg: DeviceKG, h: jnp.ndarray, r: jnp.ndarray,
                  t: jnp.ndarray, n_neg: int, bern: bool = False,
                  pad: int = EXACT_PAD) -> NegativeBatch:
    """Produce ``n_neg`` filtered corruptions for each (h, r, t).

    Head-vs-tail choice is uniform (prob 0.5) or Bernoulli-weighted by
    relation statistics when ``bern`` (Base.cpp:112-115 semantics).

    Gathers each positive's CSR slice ONCE and broadcasts the complement
    shift across all its negatives — the gather (the latency-bound op on
    TPU) is O(B·pad), not O(B·n_neg·pad).
    """
    pad = max(pad, KG_EXACT_PAD)
    B = h.shape[0]
    k_side, k_u = jax.random.split(key)
    if bern:
        # Base.cpp:112-115 — replace the tail with prob right/(left+right).
        lm, rm = kg.left_mean[r], kg.right_mean[r]
        p_replace_tail = rm / jnp.maximum(lm + rm, 1e-9)
    else:
        p_replace_tail = jnp.full((B,), 0.5, jnp.float32)
    side = jax.random.uniform(k_side, (B, n_neg)) < p_replace_tail[:, None]  # True → replace tail

    rows_t = h.astype(jnp.int32) * kg.n_relations + r.astype(jnp.int32)
    rows_h = t.astype(jnp.int32) * kg.n_relations + r.astype(jnp.int32)
    start_t, cnt_t, ridx_t = kg.hr_range(rows_t)
    start_h, cnt_h, ridx_h = kg.tr_range(rows_h)
    d_t, cnt_t = _gather_row_d(kg.hrt_tails, start_t, cnt_t, kg.n_entities, pad)
    d_h, cnt_h = _gather_row_d(kg.trh_heads, start_h, cnt_h, kg.n_entities, pad)

    cnt = jnp.where(side, cnt_t[:, None], cnt_h[:, None])           # [B, n_neg]
    u = jax.random.randint(k_u, (B, n_neg), 0,
                           jnp.maximum(kg.n_entities - cnt, 1))
    j_t = jnp.sum(d_t[:, None, :] <= u[:, :, None], axis=-1)
    j_h = jnp.sum(d_h[:, None, :] <= u[:, :, None], axis=-1)
    sample = (u + jnp.where(side, j_t, j_h)).astype(jnp.int32)

    # tier-2 overflow resolution, per side
    over_t = jnp.logical_and(side, (cnt_t > pad)[:, None])
    over_h = jnp.logical_and(~side, (cnt_h > pad)[:, None])
    rows_t_b = jnp.broadcast_to(ridx_t[:, None], (B, n_neg))
    rows_h_b = jnp.broadcast_to(ridx_h[:, None], (B, n_neg))
    sample, trunc_t = _resolve_overflow(sample, u, rows_t_b, over_t,
                                        kg.hr_big_index, kg.hr_big_d,
                                        overflow_frac=kg.hr_overflow_frac)
    sample, trunc_h = _resolve_overflow(sample, u, rows_h_b, over_h,
                                        kg.tr_big_index, kg.tr_big_d,
                                        overflow_frac=kg.tr_overflow_frac)

    neg_t = jnp.where(side, sample, t[:, None])
    neg_h = jnp.where(side, h[:, None], sample)
    return NegativeBatch(h=h, r=r, t=t, neg_h=neg_h, neg_t=neg_t,
                         neg_ent=sample, neg_side=side,
                         overflow_truncated=trunc_t + trunc_h)


@functools.partial(jax.jit, static_argnames=("batch_size", "n_neg", "bern", "pad"))
def sample_training_batch(key: jax.Array, kg: DeviceKG, batch_size: int, n_neg: int,
                          bern: bool = False, pad: int = EXACT_PAD) -> NegativeBatch:
    """Uniformly draw positives from the train set and corrupt them.

    Device-side replacement for the whole C++ ``sampling()`` entry point
    (Base.cpp:162-197): no host threads, no host↔device copies.
    """
    k_pick, k_corrupt = jax.random.split(key)
    idx = jax.random.randint(k_pick, (batch_size,), 0, kg.triples.shape[0])
    tri = kg.triples[idx]
    return corrupt_batch(k_corrupt, kg, tri[:, 0], tri[:, 1], tri[:, 2], n_neg, bern, pad)


def corrupt_relations(key: jax.Array, kg: DeviceKG, r: jnp.ndarray,
                      n_neg: int = 1, h: jnp.ndarray | None = None,
                      t: jnp.ndarray | None = None,
                      filter_flag: bool = True) -> jnp.ndarray:
    """Corrupted relations per positive, [B, n_neg].

    With ``h``/``t`` given and ``filter_flag`` (base/Corrupt.h:95-134): the
    negatives exclude *every* relation rr with (h, rr, t) a true triple —
    exact complement draw over the by-(h, t) sorted relation index, the same
    rejection-free index-shift used for entities. Otherwise the unfiltered
    branch (Corrupt.h:86-94): uniform excluding only the positive r.
    (The probability-weighted kl_prob variant is
    :func:`corrupt_relations_prob`; like the native sampler it only applies
    to the filtered branch.)"""
    B = r.shape[0]
    if h is None or t is None or not filter_flag or kg.pair_keys is None:
        if filter_flag and h is not None and t is not None and kg.pair_keys is None:
            # E² ≥ 2³¹ disables the by-(h, t) key index — the semantic
            # downgrade (negatives may include true triples) must be
            # visible, not silent.
            warnings.warn(
                "corrupt_relations: filter_flag requested but the KG is too "
                "large for the (h, t) pair index (E^2 >= 2^31); falling back "
                "to UNFILTERED relation negatives.", stacklevel=2)
        v = jax.random.randint(key, (B, n_neg), 0, kg.n_relations - 1, dtype=jnp.int32)
        return jnp.where(v < r[:, None], v, v + 1)

    keys = h.astype(jnp.int32) * kg.n_entities + t.astype(jnp.int32)
    lo = jnp.searchsorted(kg.pair_keys, keys, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(kg.pair_keys, keys, side="right").astype(jnp.int32)
    k = hi - lo                                        # [B] true-rel counts
    pad = max(int(kg.pair_pad), 1)
    lane = jnp.arange(pad, dtype=jnp.int32)
    gidx = jnp.minimum(lo[:, None] + lane[None, :], kg.pair_rels.shape[0] - 1)
    rels = kg.pair_rels[gidx]                          # [B, pad] sorted rels
    valid = lane[None, :] < k[:, None]
    d = jnp.where(valid, rels - lane[None, :], kg.n_relations + 1)  # s_i − i
    u = jax.random.randint(key, (B, n_neg), 0,
                           jnp.maximum(kg.n_relations - k, 1)[:, None])
    shift = jnp.sum(d[:, None, :] <= u[:, :, None], axis=-1)
    sample = (u + shift).astype(jnp.int32)
    # Degenerate pair with every relation true: the complement is empty, so
    # return the positive r itself (sampler.cpp / Corrupt.h:95-134 guard
    # `if (k >= relationTotal) return r`) instead of an out-of-range id.
    return jnp.where((k >= kg.n_relations)[:, None], r[:, None], sample)


def corrupt_within_nodes(key: jax.Array, kg: DeviceKG, n_id: jnp.ndarray,
                         h_local: jnp.ndarray, r: jnp.ndarray, t_local: jnp.ndarray,
                         n_neg: int, rounds: int = REJECTION_ROUNDS
                         ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Subgraph-local corruption for the fusion trainer.

    Mirrors module/NegativeSampling.py:321-375: negatives are drawn from the
    *local* node list of the sampled subgraph (local ids), filtered against
    the global true-triple set via the local→global map ``n_id``. Returns
    (neg_h_local, neg_t_local, failed), each [B, n_neg]; each negative
    corrupts either head or tail (uniform choice) keeping the other end
    positive. ``failed`` marks entries where all ``rounds`` rejection rounds
    hit true triples — those keep the POSITIVE entity (zero-margin pair).
    The reference's host loop filters exhaustively from the local list
    (NegativeSampling.py:321-375), so on dense subgraphs this path degrades;
    callers must surface the failure fraction (round-3 verdict).
    """
    B = h_local.shape[0]
    n_local = n_id.shape[0]
    k_side, k_draw = jax.random.split(key)
    side = jax.random.uniform(k_side, (B, n_neg)) < 0.5  # True → corrupt tail

    h_g = n_id[h_local]
    t_g = n_id[t_local]

    def body(carry, k):
        cur_h, cur_t, done = carry
        cand_local = jax.random.randint(k, (B, n_neg), 0, n_local, dtype=jnp.int32)
        cand_g = n_id[cand_local]
        bad_tail = _contains(kg, jnp.broadcast_to(h_g[:, None], (B, n_neg)),
                             jnp.broadcast_to(r[:, None], (B, n_neg)), cand_g)
        bad_head = _contains(kg, cand_g, jnp.broadcast_to(r[:, None], (B, n_neg)),
                             jnp.broadcast_to(t_g[:, None], (B, n_neg)))
        bad = jnp.where(side, bad_tail, bad_head)
        take = jnp.logical_and(~done, ~bad)
        cur_t = jnp.where(jnp.logical_and(take, side), cand_local, cur_t)
        cur_h = jnp.where(jnp.logical_and(take, ~side), cand_local, cur_h)
        done = jnp.logical_or(done, take)
        return (cur_h, cur_t, done), None

    init = (jnp.broadcast_to(h_local[:, None], (B, n_neg)).astype(jnp.int32),
            jnp.broadcast_to(t_local[:, None], (B, n_neg)).astype(jnp.int32),
            jnp.zeros((B, n_neg), bool))
    keys = jax.random.split(k_draw, rounds)
    (neg_h, neg_t, done), _ = jax.lax.scan(body, init, keys)
    return neg_h, neg_t, jnp.logical_not(done)


def relation_prob_table(kl: jnp.ndarray, temp: float) -> jnp.ndarray:
    """importProb semantics (base/Reader.h:25-50): rows of softmax(−kl/temp).

    ``kl``: [R, R−1] raw divergences (kl_prob.txt layout — row r lists every
    relation EXCEPT r, ids < r first, then ids > r shifted down by one).
    Returns the row-normalized probability table the weighted corruption
    consumes.
    """
    w = jnp.exp(-jnp.asarray(kl, jnp.float32) / temp)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def corrupt_relations_prob(key: jax.Array, kg: DeviceKG, h: jnp.ndarray,
                           t: jnp.ndarray, r: jnp.ndarray, prob: jnp.ndarray,
                           n_neg: int = 1) -> jnp.ndarray:
    """Probability-weighted filtered relation corruption, on device.

    The base/Corrupt.h:86-134 ``corrupt_rel(p=true)`` path: replacement
    relations are drawn with the kl_prob softmax weights (``prob`` from
    ``relation_prob_table``), excluding every rr with (h, rr, t) a true
    train triple, renormalized over the remainder (inverse-CDF draw).
    Vectorized: one [B, R] masked-weight cumsum — no per-row host walk.
    Deviation from the reference: the uniform is continuous, not quantized
    to 1/10000 (Corrupt.h:138 ``rand_max(id, 10000)/10000``) — strictly
    finer resolution, same distribution.

    Returns [B, n_neg] relation ids; rows whose complement is empty (every
    relation true for (h, t)) return the positive ``r``.
    """
    B = r.shape[0]
    R = kg.n_relations
    if kg.pair_keys is None:
        raise ValueError("corrupt_relations_prob needs the (h, t) pair index "
                         "(KG too large: E^2 >= 2^31)")
    # expand each prob row [R-1] to full R columns (0 at the positive r):
    # column c != r maps to prob[r, c - (c > r)]  (kl_prob.txt layout).
    cols = jnp.arange(R, dtype=jnp.int32)[None, :]
    j = cols - (cols > r[:, None]).astype(jnp.int32)
    w = jnp.take_along_axis(prob[r], jnp.minimum(j, R - 2), axis=1)   # [B, R]
    w = jnp.where(cols == r[:, None], 0.0, w)

    # zero out every true relation of the (h, t) pair (padded slice over the
    # by-(h, t) sorted relation index, as in corrupt_relations)
    keys_ht = h.astype(jnp.int32) * kg.n_entities + t.astype(jnp.int32)
    lo = jnp.searchsorted(kg.pair_keys, keys_ht, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(kg.pair_keys, keys_ht, side="right").astype(jnp.int32)
    k = hi - lo
    pad = max(int(kg.pair_pad), 1)
    lane = jnp.arange(pad, dtype=jnp.int32)
    gidx = jnp.minimum(lo[:, None] + lane[None, :], kg.pair_rels.shape[0] - 1)
    rels = kg.pair_rels[gidx]                                          # [B, pad]
    valid = lane[None, :] < k[:, None]
    true_mask = jnp.any(jnp.logical_and(valid[:, None, :],
                                        rels[:, None, :] == cols[..., None]),
                        axis=-1)                                        # [B, R]
    w = jnp.where(true_mask, 0.0, w)

    cdf = jnp.cumsum(w, axis=-1)                                       # [B, R]
    total = cdf[:, -1:]
    u = jax.random.uniform(key, (B, n_neg)) * total
    sample = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(jnp.int32)
    sample = jnp.minimum(sample, R - 1)
    # float rounding can push u up to exactly `total` (~2^-24 per draw):
    # every cdf entry then counts and the clamp lands on column R-1, which
    # may be a zero-weight (true or positive) relation. Remap any draw that
    # landed on zero weight to the LAST positive-weight relation — the draw
    # stays in the exact complement.
    last_valid = (R - 1 - jnp.argmax((w > 0.0)[:, ::-1], axis=-1)).astype(jnp.int32)
    w_at = jnp.take_along_axis(w, sample, axis=1)
    sample = jnp.where(w_at > 0.0, sample, last_valid[:, None])
    return jnp.where((total <= 0.0) | ((k >= R)[:, None]), r[:, None], sample)
