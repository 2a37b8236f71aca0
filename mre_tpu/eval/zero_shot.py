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
                 chunk: int, c_max: int, embed_args=None):
    """Rank a padded query stream in ONE device program.

    All relations' queries are concatenated into one [Q_pad, c_max] stream
    with a per-query folded relation vector ``vbar`` [Q_pad, D]; a
    ``lax.scan`` over fixed-width chunks inside a single jit amortizes the
    per-call dispatch (which dominates on remote-attached chips) and keeps
    exactly ONE compiled shape regardless of per-relation query counts.
    """

    has_ea = embed_args is not None

    @functools.partial(jax.jit, static_argnames=())
    def run(ea, pairs, left, right, mask, vbar):
        def step(_, x):
            p, l, r, m, v = x
            # ea threads model params/tables through the jit as ARGUMENTS —
            # baked closure constants would change the program every round
            # (fresh weights), defeating both the in-process and the
            # remote-compile caches (minutes per ZSL round on the tunnel)
            args = (p.reshape(-1, 2), l.reshape(-1), r.reshape(-1))
            emb = embed_query_pairs(ea, *args) if has_ea                 else embed_query_pairs(*args)
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

    return np.asarray(run(embed_args, pairs, left, right, mask, vbar))


def _rank_stream_block(embed_query_block: Callable, heads, right, mask, vbar,
                       chunk: int, c_max: int, embed_args=None):
    """Block variant of ``_rank_stream``: one head entity per query.

    ``embed_query_block(heads [chunk], cands [chunk, c_max]) → [chunk,
    c_max, D]`` (``Extractor.embed_pairs_head_shared``): the head row is
    gathered once per query instead of once per candidate, halving the
    latency-bound gather rows that dominate the ranking hot path."""

    has_ea = embed_args is not None

    @functools.partial(jax.jit, static_argnames=())
    def run(ea, heads, right, mask, vbar):
        def step(_, x):
            hd, r, m, v = x
            emb = embed_query_block(ea, hd, r) if has_ea else embed_query_block(hd, r)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            scores = jnp.einsum("qcd,qd->qc", emb, v,
                                preferred_element_type=jnp.float32)
            true_s = scores[:, :1]
            valid = m.at[:, 0].set(False)
            return None, jnp.sum(jnp.logical_and(scores >= true_s, valid), 1) + 1

        _, ranks = jax.lax.scan(step, None, (heads, right, mask, vbar))
        return ranks.reshape(-1)

    return np.asarray(run(embed_args, heads, right, mask, vbar))


def _rank_stream_rel_shared(embed_rel_block: Callable, embed_true: Callable,
                            heads, trues, shared, mask, vbar,
                            chunk: int, c_max: int,
                            mesh=None, axis_name: str = "data",
                            embed_args=None):
    """Relation-shared variant of ``_rank_stream_block``.

    Each scan chunk holds queries of ONE relation plus that relation's
    SHARED candidate row (``shared`` [nc, c_max]): the candidate-side gather
    and first SupportEncoder matmul are computed once per chunk instead of
    once per query (reference structure: every query of a relation ranks
    the same rel2candidates list, utils/gen_mode_candidates.py). The true
    tail is scored separately through the factored path (1 extra row per
    query); ``mask`` holds each query's PER-OCCURRENCE candidate counts
    over the shared row (per-query e1rel_e2 exclusions → 0; duplicated
    entities in a list → their multiplicity), so ranks are exactly those of
    the per-query path, pessimistic ties and duplicates included.

    With ``mesh``, each scan step ranks ``mesh.shape[axis_name]`` chunks
    data-parallel across the mesh (chunks are independent; the embed is
    vmapped over the device axis and the inputs sharded on it, so the SPMD
    partitioner splits the work with no collectives — the tables inside
    ``embed_rel_block`` stay replicated). The caller pads the chunk count
    to a multiple of the axis size.
    """

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ndev = mesh.shape[axis_name]
        nc = heads.shape[0]
        if nc % ndev:
            raise ValueError(f"chunk count {nc} not a multiple of mesh "
                             f"axis {axis_name}={ndev}; caller must pad")
        nsteps = nc // ndev
        spec = NamedSharding(mesh, P(None, axis_name))

        def resh(a):
            return jax.device_put(
                jnp.reshape(a, (nsteps, ndev) + a.shape[1:]), spec)

        heads, trues, shared, mask, vbar = map(
            resh, (heads, trues, shared, mask, vbar))

        has_ea = embed_args is not None

        @functools.partial(jax.jit, static_argnames=())
        def run_sharded(ea, heads, trues, shared, mask, vbar):
            if has_ea:
                erb = lambda hd, sh: embed_rel_block(ea, hd, sh)
                etr = lambda hd, tr: embed_true(ea, hd, tr)
            else:
                erb, etr = embed_rel_block, embed_true
            def step(_, x):
                hd, tr, sh, m, v = x                     # [ndev, chunk, ...]
                emb = jax.vmap(erb)(hd, sh)              # [ndev, chunk, C, D]
                emb = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
                te = jax.vmap(etr)(hd, tr)               # [ndev, chunk, D]
                te = te / jnp.maximum(
                    jnp.linalg.norm(te, axis=-1, keepdims=True), 1e-12)
                scores = jnp.einsum("gqcd,gqd->gqc", emb, v,
                                    preferred_element_type=jnp.float32)
                true_s = jnp.einsum("gqd,gqd->gq", te, v,
                                    preferred_element_type=jnp.float32)
                return None, jnp.sum(
                    jnp.where(scores >= true_s[..., None], m, 0), -1) + 1

            _, ranks = jax.lax.scan(
                step, None, (heads, trues, shared, mask, vbar))
            return ranks.reshape(-1)

        return np.asarray(run_sharded(embed_args, heads, trues, shared,
                                      mask, vbar))

    has_ea = embed_args is not None

    @functools.partial(jax.jit, static_argnames=())
    def run(ea, heads, trues, shared, mask, vbar):
        def step(_, x):
            hd, tr, sh, m, v = x
            emb = embed_rel_block(ea, hd, sh) if has_ea                 else embed_rel_block(hd, sh)                 # [chunk, C, D]
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
            te = embed_true(ea, hd, tr) if has_ea                 else embed_true(hd, tr)                      # [chunk, D]
            te = te / jnp.maximum(
                jnp.linalg.norm(te, axis=-1, keepdims=True), 1e-12)
            scores = jnp.einsum("qcd,qd->qc", emb, v,
                                preferred_element_type=jnp.float32)
            true_s = jnp.einsum("qd,qd->q", te, v,
                                preferred_element_type=jnp.float32)
            return None, jnp.sum(
                jnp.where(scores >= true_s[:, None], m, 0), 1) + 1

        _, ranks = jax.lax.scan(step, None, (heads, trues, shared, mask, vbar))
        return ranks.reshape(-1)

    return np.asarray(run(embed_args, heads, trues, shared, mask, vbar))


def evaluate_zero_shot_rel_shared(test_candidates: dict, e2id: dict,
                                  embed_rel_block: Callable,
                                  embed_true: Callable,
                                  generate_relation_vecs: Callable,
                                  query_chunk: int = 64, verbose: bool = True,
                                  return_ranks: bool = False,
                                  mesh=None, axis_name: str = "data",
                                  embed_args=None) -> dict:
    """Zero-shot ranking via the relation-shared hot path.

    Host side reconstructs each relation's shared candidate list (first-seen
    union of its queries' lists — by construction, gen_mode_candidates.py,
    each per-query list is the relation's rel2candidates minus a small
    exclusion) and a per-query membership mask; device side is one scanned
    jit where each chunk carries one relation's shared row. Ranks are
    IDENTICAL to ``evaluate_zero_shot`` (tested); the win is gather rows:
    Q + C per chunk instead of Q·C.

    ``mesh`` (optional ``jax.sharding.Mesh``) ranks chunks data-parallel
    over ``axis_name`` — scale-out serving of the evaluation workload; the
    chunk count is padded to the axis size and ranks are identical to the
    single-device path (tests/test_sharding.py).
    """
    rel_order = list(test_candidates.keys())
    shared_idx: dict = {}
    c_max = 1
    for rel in rel_order:
        seen: dict = {}
        for cands in test_candidates[rel].values():
            for c in cands[1:]:
                if c not in seen:
                    seen[c] = len(seen)
        shared_idx[rel] = seen
        c_max = max(c_max, len(seen))

    heads_l, trues_l, mask_l, vbar_l = [], [], [], []
    shared_rows = []
    counts, pads = [], []
    D = None
    for rel in rel_order:
        seen = shared_idx[rel]
        row = np.zeros(c_max, np.int32)
        if seen:
            row[:len(seen)] = [e2id[c] for c in seen]
        rv = np.asarray(generate_relation_vecs(rel), np.float32)
        rv = rv / np.maximum(np.linalg.norm(rv, axis=-1, keepdims=True), 1e-12)
        vbar = rv.mean(0)
        D = vbar.shape[0]
        queries = test_candidates[rel]
        counts.append(len(queries))
        for key, cands in queries.items():
            head, _, _ = key.split("\t")
            # multiplicity counts, not membership bits: a duplicate entity in
            # a candidate list is scored (and counted against the rank) once
            # per occurrence by the per-query evaluator — the shared-list
            # path must weight it identically.
            m = np.zeros(c_max, np.int32)
            for c in cands[1:]:
                m[seen[c]] += 1
            heads_l.append(e2id[head])
            trues_l.append(e2id[cands[0]])
            mask_l.append(m)
            vbar_l.append(vbar)
        pad = (-len(queries)) % query_chunk
        pads.append(pad)
        for _ in range(pad):
            heads_l.append(0)
            trues_l.append(0)
            mask_l.append(np.zeros(c_max, np.int32))
            vbar_l.append(np.zeros(D, np.float32))
        shared_rows += [row] * ((len(queries) + pad) // query_chunk)

    n_q = sum(counts)
    if n_q == 0:
        overall = dict(hits10=0.0, hits5=0.0, hits1=0.0, mrr=0.0, n=0)
        overall["per_relation"] = {}
        if return_ranks:
            overall["ranks"] = np.zeros(0, np.int64)
        return overall

    if mesh is not None:
        # pad the chunk count to the mesh axis size with all-masked dummy
        # chunks; they sit past every real (count, pad) offset below, so the
        # per-relation slicing never reads them.
        ndev = mesh.shape[axis_name]
        for _ in range((-len(shared_rows)) % ndev):
            shared_rows.append(np.zeros(c_max, np.int32))
            heads_l += [0] * query_chunk
            trues_l += [0] * query_chunk
            mask_l += [np.zeros(c_max, np.int32)] * query_chunk
            vbar_l += [np.zeros(D, np.float32)] * query_chunk

    nc = len(shared_rows)
    ranks = _rank_stream_rel_shared(
        embed_rel_block, embed_true,
        jnp.asarray(np.asarray(heads_l, np.int32).reshape(nc, query_chunk)),
        jnp.asarray(np.asarray(trues_l, np.int32).reshape(nc, query_chunk)),
        jnp.asarray(np.stack(shared_rows)),
        jnp.asarray(np.stack(mask_l).reshape(nc, query_chunk, c_max)),
        jnp.asarray(np.stack(vbar_l).reshape(nc, query_chunk, D)),
        query_chunk, c_max, mesh=mesh, axis_name=axis_name,
        embed_args=embed_args)

    per_relation = {}
    real_ranks = []
    off = 0
    for rel, cnt, pad in zip(rel_order, counts, pads):
        r = ranks[off:off + cnt]
        real_ranks.append(r)
        per_relation[rel] = metrics_from_ranks(r)
        off += cnt + pad
        if verbose:
            m = per_relation[rel]
            print(f"{rel} Hits10:{m['hits10']:.3f}, Hits5:{m['hits5']:.3f}, "
                  f"Hits1:{m['hits1']:.3f} MRR:{m['mrr']:.3f}")
    real_ranks = np.concatenate(real_ranks)
    overall = metrics_from_ranks(real_ranks)
    if return_ranks:
        overall["ranks"] = np.asarray(real_ranks, np.int64)
    if verbose:
        print(f"OVERALL HITS10: {overall['hits10']:.3f}  HITS5: {overall['hits5']:.3f}  "
              f"HITS1: {overall['hits1']:.3f}  MRR: {overall['mrr']:.3f}")
    overall["per_relation"] = per_relation
    return overall


def evaluate_zero_shot(test_candidates: dict, symbol2id: dict, e2id: dict,
                       rel2id: dict, embed_query_pairs: Callable,
                       generate_relation_vecs: Callable,
                       query_chunk: int = 64, verbose: bool = True,
                       embed_query_block: Callable | None = None,
                       return_ranks: bool = False, embed_args=None) -> dict:
    """Run zero-shot ranking over every unseen relation.

    ``embed_query_pairs(pairs [N,2] symbol ids, left [N], right [N]) → [N, D]``
    (the Extractor, eval mode); ``generate_relation_vecs(rel_name) → [S, D]``.

    Host side builds one id-mapped stream over ALL relations; device side is
    one scanned jit (see ``_rank_stream``). Tie semantics are pessimistic
    (1 + #greater + #tied), matching the reference's descending argsort.

    ``embed_args`` (optional pytree): when given, the embed callables are
    invoked as ``embed(embed_args, ...)`` and the pytree is threaded through
    the jit as an ARGUMENT — keeping model weights/tables out of the
    compiled program's constants so repeated evals reuse one compilation.
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
        if return_ranks:
            overall["ranks"] = np.zeros(0, np.int64)
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
            query_chunk, c_max, embed_args=embed_args)[:n_q]
    else:
        ranks = _rank_stream(
            embed_query_pairs,
            jnp.asarray(np.stack(pairs_l).reshape(nc, query_chunk, c_max, 2)),
            jnp.asarray(np.stack(left_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(right_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(mask_l).reshape(nc, query_chunk, c_max)),
            jnp.asarray(np.stack(vbar_l).reshape(nc, query_chunk, D)),
            query_chunk, c_max, embed_args=embed_args)[:n_q]

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
