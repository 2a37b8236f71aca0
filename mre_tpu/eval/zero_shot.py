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

    Returns ranks [Q]. Tie semantics match the reference
    (zsl_module.py:705-706): ``argsort(scores)[::-1]`` with a stable
    ascending sort places the true candidate (index 0) *last* among equal
    scores, so rank = 1 + #greater + #tied — the pessimistic tie rank, never
    inflating Hits@k for quantized cosine scores."""
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


def evaluate_zero_shot(test_candidates: dict, symbol2id: dict, e2id: dict,
                       rel2id: dict, embed_query_pairs: Callable,
                       generate_relation_vecs: Callable,
                       query_chunk: int = 64, verbose: bool = True) -> dict:
    """Run zero-shot ranking over every unseen relation.

    ``embed_query_pairs(pairs [N,2] symbol ids, left [N], right [N]) → [N, D]``
    (the Extractor, eval mode); ``generate_relation_vecs(rel_name) → [S, D]``.
    """
    all_ranks = []
    per_relation = {}

    # global pad width so the jitted scorer compiles once
    c_max = 1
    for rel, queries in test_candidates.items():
        for cands in queries.values():
            c_max = max(c_max, len(cands))

    for rel, queries in test_candidates.items():
        rel_vecs = jnp.asarray(generate_relation_vecs(rel))
        keys = list(queries.keys())
        ranks_rel = []
        for i in range(0, len(keys), query_chunk):
            chunk_keys = keys[i:i + query_chunk]
            Q = query_chunk
            pairs = np.zeros((Q, c_max, 2), np.int32)
            left = np.zeros((Q, c_max), np.int32)
            right = np.zeros((Q, c_max), np.int32)
            mask = np.zeros((Q, c_max), bool)
            for qi, key in enumerate(chunk_keys):
                head, _, _ = key.split("\t")
                cands = queries[key]          # true tail first
                n = len(cands)
                pairs[qi, :n, 0] = symbol2id[head]
                pairs[qi, :n, 1] = [symbol2id[c] for c in cands]
                left[qi, :n] = e2id[head]
                right[qi, :n] = [e2id[c] for c in cands]
                mask[qi, :n] = True

            emb = embed_query_pairs(
                jnp.asarray(pairs.reshape(-1, 2)),
                jnp.asarray(left.reshape(-1)),
                jnp.asarray(right.reshape(-1)))
            emb = emb.reshape(Q, c_max, -1)
            ranks = np.asarray(_score_and_rank(emb, rel_vecs, jnp.asarray(mask)))
            ranks_rel.extend(ranks[:len(chunk_keys)].tolist())

        per_relation[rel] = metrics_from_ranks(np.asarray(ranks_rel))
        all_ranks.extend(ranks_rel)
        if verbose:
            m = per_relation[rel]
            print(f"{rel} Hits10:{m['hits10']:.3f}, Hits5:{m['hits5']:.3f}, "
                  f"Hits1:{m['hits1']:.3f} MRR:{m['mrr']:.3f}")

    overall = metrics_from_ranks(np.asarray(all_ranks))
    if verbose:
        print(f"OVERALL HITS10: {overall['hits10']:.3f}  HITS5: {overall['hits5']:.3f}  "
              f"HITS1: {overall['hits1']:.3f}  MRR: {overall['mrr']:.3f}")
    overall["per_relation"] = per_relation
    return overall
