"""Structural (TransE) candidate-list evaluation.

The reference's second evaluator (main.py:217-272): score each padded
candidate list with |h + r − t|₁ over the learner's entity/relation
embeddings, tie-aware rank = #worse + #ties//2 + 1, per-relation and final
MRR/Hits@{1,3,10}. Here one jitted call per query chunk instead of a host
loop over candidate lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mre_tpu.ops.ranking import candidate_ranks


@jax.jit
def _transe_candidate_scores(head_emb, rel_emb, tail_embs):
    """head_emb [Q, D]; rel_emb [Q, D]; tail_embs [Q, C, D] → scores [Q, C]."""
    return jnp.sum(jnp.abs(head_emb[:, None, :] + rel_emb[:, None, :] - tail_embs), -1)


def evaluate_structural(test_candidates: dict, ent_embs, rel_embs,
                        e2id: dict, r2id: dict, query_chunk: int = 128,
                        verbose: bool = True) -> dict:
    ent = np.asarray(ent_embs, np.float32)
    rel = np.asarray(rel_embs, np.float32)
    dim = ent.shape[1]
    n_queries = sum(len(q) for q in test_candidates.values())
    if n_queries == 0:
        # a misloaded/empty candidates file must fail loudly, not emit NaN
        # metrics (same contract as ranking.link_prediction)
        raise ValueError("evaluate_structural: no evaluable queries")

    c_max = 1
    for queries in test_candidates.values():
        for cands in queries.values():
            c_max = max(c_max, len(cands))

    all_ranks = []
    per_relation = {}
    for rel_name, queries in test_candidates.items():
        keys = list(queries.keys())
        ranks_rel = []
        for i in range(0, len(keys), query_chunk):
            chunk_keys = keys[i:i + query_chunk]
            Q = query_chunk
            heads = np.zeros((Q, dim), np.float32)
            rels = np.zeros((Q, dim), np.float32)
            tails = np.zeros((Q, c_max, dim), np.float32)
            mask = np.zeros((Q, c_max), bool)
            for qi, key in enumerate(chunk_keys):
                head, rname, _ = key.split("\t")
                cands = queries[key]
                heads[qi] = ent[e2id[head]]
                rels[qi] = rel[r2id[rname]]
                idx = np.fromiter((e2id[c] for c in cands), np.int64,
                                  count=len(cands))
                tails[qi, :len(cands)] = ent[idx]   # one gather, not C copies
                mask[qi, :len(cands)] = True
            scores = _transe_candidate_scores(
                jnp.asarray(heads), jnp.asarray(rels), jnp.asarray(tails))
            ranks = np.asarray(candidate_ranks(scores, jnp.asarray(mask),
                                               lower_is_better=True))
            ranks_rel.extend(ranks[:len(chunk_keys)].tolist())

        if not ranks_rel:   # relation with zero queries: report n=0, no NaN
            per_relation[rel_name] = dict(mrr=0.0, hits1=0.0, hits3=0.0,
                                          hits10=0.0, n=0)
            continue
        r = np.asarray(ranks_rel, np.float64)
        per_relation[rel_name] = dict(
            mrr=float(np.mean(1 / r)), hits1=float(np.mean(r <= 1)),
            hits3=float(np.mean(r <= 3)), hits10=float(np.mean(r <= 10)),
            n=len(r))
        if verbose:
            m = per_relation[rel_name]
            print(f"Relation: {rel_name}| Number {m['n']} | mrr: {m['mrr']:.4f} | "
                  f"hit1: {m['hits1']:.4f} | hit3: {m['hits3']:.4f} | hit10: {m['hits10']:.4f}")
        all_ranks.extend(ranks_rel)

    r = np.asarray(all_ranks, np.float64)
    out = dict(mrr=float(np.mean(1 / r)), hits1=float(np.mean(r <= 1)),
               hits3=float(np.mean(r <= 3)), hits10=float(np.mean(r <= 10)),
               n=len(r), per_relation=per_relation)
    if verbose:
        print(f"[Final Scores] MRR: {out['mrr']} \tHits@1: {out['hits1']} \t"
              f"Hits@3: {out['hits3']} \tHits@10: {out['hits10']}")
    return out
