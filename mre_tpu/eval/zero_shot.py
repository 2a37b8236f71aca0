"""Zero-shot relation evaluation as one padded device program.

Replaces the reference's per-query host loop (module/zsl_module.py:635-745
— per candidate list: build meta tensors, run Extractor, sklearn cosine,
numpy argsort) with a batched pipeline:

* all candidate lists of a relation are padded to [Q, C_max] and scored by
  the Extractor in one apply;
* scores = mean cosine similarity against the ``test_sample`` generated
  relation vectors — one [Q·C_max, D] × [D, S] matmul;
* rank of the true tail (index 0) by vectorized strictly-greater count.

This is the benchmark hot path (BASELINE.md: ≥20× candidate-ranking
throughput target).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _score_and_rank(cand_emb, rel_vecs, cand_mask):
    """cand_emb [Q, C, D]; rel_vecs [S, D]; cand_mask [Q, C] (col 0 = true).

    Returns ranks [Q]. Tie semantics: the reference ranks via
    ``np.argsort(scores)[::-1]`` (zsl_module.py:705-706), whose order among
    equal scores is unspecified (NumPy's default argsort is introsort, not
    stable). We deliberately take the pessimistic rank —
    1 + #greater + #tied — a conservative deviation that never inflates
    Hits@k for quantized cosine scores."""
    emb = cand_emb / jnp.maximum(jnp.linalg.norm(cand_emb, axis=-1, keepdims=True), 1e-12)
    rv = rel_vecs / jnp.maximum(jnp.linalg.norm(rel_vecs, axis=-1, keepdims=True), 1e-12)
    # mean-of-cosines is linear in the relation samples: fold the S vectors
    # into one before the matmul (exact, S× fewer MACs).
    vbar = rv.mean(0)
    scores = jnp.einsum("qcd,d->qc", emb, vbar,
                        preferred_element_type=jnp.float32)            # [Q, C]
    true_s = scores[:, :1]
    valid = cand_mask.at[:, 0].set(False)
    better = jnp.sum(jnp.logical_and(scores >= true_s, valid), axis=1)
    return better + 1


def metrics_from_ranks(ranks: np.ndarray) -> dict:
    ranks = np.asarray(ranks, np.float64)
    return dict(
        hits10=float(np.mean(ranks <= 10)),
        hits5=float(np.mean(ranks <= 5)),
        hits1=float(np.mean(ranks <= 1)),
        mrr=float(np.mean(1.0 / ranks)),
        n=int(len(ranks)),
    )


def _rank_stream(embed_query_pairs: Callable, pairs, left, right, mask, vbar,
                 chunk: int, c_max: int):
    """Rank a padded query stream in ONE device program.

    All relations' queries are concatenated into one [Q_pad, c_max] stream
    with a per-query folded relation vector ``vbar`` [Q_pad, D]; a
    ``lax.scan`` over fixed-width chunks inside a single jit amortizes the
    per-call dispatch (which dominates on remote-attached chips) and keeps
    exactly ONE compiled shape regardless of per-relation query counts.
    """

    @functools.partial(jax.jit, static_argnames=())
    def run(pairs, left, right, mask, vbar):
        def step(_, x):
            p, l, r, m, v = x
            emb = embed_query_pairs(p.reshape(-1, 2), l.reshape(-1),
                                    r.reshape(-1))
            emb = emb.reshape(chunk, c_max, -1)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            scores = jnp.einsum("qcd,qd->qc", emb, v,
                                preferred_element_type=jnp.float32)
            true_s = scores[:, :1]
            valid = m.at[:, 0].set(False)
            return None, jnp.sum(jnp.logical_and(scores >= true_s, valid), 1) + 1

        _, ranks = jax.lax.scan(step, None, (pairs, left, right, mask, vbar))
        return ranks.reshape(-1)

    return np.asarray(run(pairs, left, right, mask, vbar))


def _rank_stream_block(embed_query_block: Callable, heads, right, mask, vbar,
                       chunk: int, c_max: int):
    """Block variant of ``_rank_stream``: one head entity per query.

    ``embed_query_block(heads [chunk], cands [chunk, c_max]) → [chunk,
    c_max, D]`` (``Extractor.embed_pairs_head_shared``): the head row is
    gathered once per query instead of once per candidate, halving the
    latency-bound gather rows that dominate the ranking hot path."""

    @functools.partial(jax.jit, static_argnames=())
    def run(heads, right, mask, vbar):
        def step(_, x):
            hd, r, m, v = x
            emb = embed_query_block(hd, r)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            scores = jnp.einsum("qcd,qd->qc", emb, v,
                                preferred_element_type=jnp.float32)
            true_s = scores[:, :1]
            valid = m.at[:, 0].set(False)
            return None, jnp.sum(jnp.logical_and(scores >= true_s, valid), 1) + 1

        _, ranks = jax.lax.scan(step, None, (heads, right, mask, vbar))
        return ranks.reshape(-1)

    return np.asarray(run(heads, right, mask, vbar))


def evaluate_zero_shot(test_candidates: dict, symbol2id: dict, e2id: dict,
                       rel2id: dict, embed_query_pairs: Callable,
                       generate_relation_vecs: Callable,
                       query_chunk: int = 64, verbose: bool = True,
                       embed_query_block: Callable | None = None,
                       return_ranks: bool = False) -> dict:
    """Run zero-shot ranking over every unseen relation.

    ``embed_query_pairs(pairs [N,2] symbol ids, left [N], right [N]) → [N, D]``
    (the Extractor, eval mode); ``generate_relation_vecs(rel_name) → [S, D]``.

    Host side builds one id-mapped stream over ALL relations; device side is
    one scanned jit (see ``_rank_stream``). Tie semantics are pessimistic
    (1 + #greater + #tied), matching the reference's descending argsort.
    """
    per_relation = {}

    # global pad width so the jitted scorer compiles once
    c_max = 1
    rel_order = list(test_candidates.keys())
    for rel in rel_order:
        for cands in test_candidates[rel].values():
            c_max = max(c_max, len(cands))

    # one host pass: map ids for every query of every relation
    counts = []
    pairs_l, left_l, right_l, mask_l, vbar_l = [], [], [], [], []
    for rel in rel_order:
        queries = test_candidates[rel]
        rv = np.asarray(generate_relation_vecs(rel), np.float32)
        rv = rv / np.maximum(np.linalg.norm(rv, axis=-1, keepdims=True), 1e-12)
        vbar = rv.mean(0)
        counts.append(len(queries))
        for key, cands in queries.items():
            head, _, _ = key.split("\t")
            n = len(cands)
            r = np.zeros(c_max, np.int32)
            m = np.zeros(c_max, bool)
            r[:n] = [e2id[c] for c in cands]
            m[:n] = True
            if embed_query_block is not None:
                left_l.append(e2id[head])
            else:
                p = np.zeros((c_max, 2), np.int32)
                l = np.zeros(c_max, np.int32)
                p[:n, 0] = symbol2id[head]
                p[:n, 1] = [symbol2id[c] for c in cands]
                l[:n] = e2id[head]
                pairs_l.append(p); left_l.append(l)
            right_l.append(r)
            mask_l.append(m); vbar_l.append(vbar)

    n_q = len(right_l)
    if n_q == 0:
        # Zero evaluable queries (empty/mis-pathed candidates file): report
        # zeros with n=0 so a misloaded dataset can never masquerade as a
        # perfect score.
        overall = dict(hits10=0.0, hits5=0.0, hits1=0.0, mrr=0.0, n=0)
        overall["per_relation"] = {}
        return overall
    pad_q = ((n_q + query_chunk - 1) // query_chunk) * query_chunk
    D = vbar_l[0].shape[0]
    for _ in range(pad_q - n_q):
        if embed_query_block is not None:
            left_l.append(0)
        else:
            pairs_l.append(np.zeros((c_max, 2), np.int32))
            left_l.append(np.zeros(c_max, np.int32))
        right_l.append(np.zeros(c_max, np.int32))
        mask_l.append(np.zeros(c_max, bool))
        vbar_l.append(np.zeros(D, np.float32))

    nc = pad_q // query_chunk
    if embed_query_block is not None:
        ranks = _rank_stream_block(
            embed_query_block,
            jnp.asarray(np.asarray(left_l, np.int32).reshape(nc, query_chunk)),
            jnp.asarray(np.stack(right_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(mask_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(vbar_l).reshape(nc, query_chunk, D)),
            query_chunk, c_max)[:n_q]
    else:
        ranks = _rank_stream(
            embed_query_pairs,
            jnp.asarray(np.stack(pairs_l).reshape(nc, query_chunk, c_max, 2)),
            jnp.asarray(np.stack(left_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(right_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(mask_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(vbar_l).reshape(nc, query_chunk, D)),
            query_chunk, c_max)[:n_q]

    off = 0
    for rel, cnt in zip(rel_order, counts):
        per_relation[rel] = metrics_from_ranks(ranks[off:off + cnt])
        off += cnt
        if verbose:
            m = per_relation[rel]
            print(f"{rel} Hits10:{m['hits10']:.3f}, Hits5:{m['hits5']:.3f}, "
                  f"Hits1:{m['hits1']:.3f} MRR:{m['mrr']:.3f}")

    overall = metrics_from_ranks(ranks)
    if return_ranks:
        # per-query ranks in stream order (rel_order × insertion order) —
        # used by the dtype/path fidelity certification (bench gate).
        overall["ranks"] = np.asarray(ranks, np.int64)
    if verbose:
        print(f"OVERALL HITS10: {overall['hits10']:.3f}  HITS5: {overall['hits5']:.3f}  "
              f"HITS1: {overall['hits1']:.3f}  MRR: {overall['mrr']:.3f}")
    overall["per_relation"] = per_relation
    return overall
