"""ZSL matching networks: Extractor and WGAN critic.

Flax re-designs of the reference's matching metric (module/zsl_module.py:17-138):

* ``Extractor`` — entity-pair embedding network over a *frozen* symbol
  embedding table (relations + entities + PAD). The table is passed as an
  input array (not a parameter): the fusion learner refreshes it between
  rounds (``update_embed``, zsl_module.py:235-237), so keeping it out of the
  param tree makes the update a plain array swap — no optimizer state churn.

  Eval fast path: the neighbor encoding depends only on the *entity* (its
  connection row), not on the query pair — ``encode_neighbors`` precomputes
  the [n_entities, emb/2] table once per evaluation, then
  ``embed_pairs_precomputed`` embeds query pairs with plain row gathers.
  This removes the dominant [Q·C, max_neighbor, D] gather from the
  zero-shot ranking hot path.

* ``Discriminator`` — spectral-norm critic producing (middle vector,
  real/fake logit, class scores against the centroid matrix).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mre_tpu.models.spectral_norm import SNDense
from mre_tpu.models.transformer import LayerNormalization, SupportEncoder


class Extractor(nn.Module):
    embed_dim: int
    dropout: float = 0.2

    def setup(self):
        half = self.embed_dim // 2
        xn = nn.initializers.xavier_normal()
        self.gcn_w = nn.Dense(half, name="gcn_w", kernel_init=xn)
        self.fc1 = nn.Dense(half, name="fc1", kernel_init=xn)
        self.fc2 = nn.Dense(half, name="fc2", kernel_init=xn)
        self.reshape_layer = nn.Dense(self.embed_dim, name="reshape_layer", kernel_init=xn)
        self.support_encoder = SupportEncoder(self.embed_dim, 2 * self.embed_dim,
                                              dropout=0.2, name="support_encoder")
        self.drop = nn.Dropout(self.dropout)

    def _neighbor_encoder(self, symbols, connections, num_neighbors, deterministic):
        """Mean of projected neighbor-entity embeddings → tanh
        (zsl_module.py:46-59). connections: [..., K, 2] (rel_sym, ent_sym)."""
        ents = connections[..., 1]
        ent_embeds = self.drop(symbols[ents], deterministic=deterministic)
        out = jnp.sum(self.gcn_w(ent_embeds), axis=-2)
        out = out / jnp.maximum(num_neighbors, 1.0)[..., None]
        return jnp.tanh(out)

    def _entity_encoder(self, e1, e2, deterministic):
        e1 = self.drop(e1, deterministic=deterministic)
        e2 = self.drop(e2, deterministic=deterministic)
        return jnp.tanh(jnp.concatenate([self.fc1(e1), self.fc2(e2)], axis=-1))

    def __call__(self, symbols, query, support, query_meta, support_meta,
                 deterministic: bool = True):
        """symbols: [num_symbols+1, D]; query/support: [B, 2] symbol ids;
        metas: (left_connections, left_degrees, right_connections,
        right_degrees). Returns (query_embeddings, matching_scores)."""
        ql_conn, ql_deg, qr_conn, qr_deg = query_meta
        sl_conn, sl_deg, sr_conn, sr_deg = support_meta

        q_e = self._entity_encoder(symbols[query[:, 0]], symbols[query[:, 1]], deterministic)
        s_e = self._entity_encoder(symbols[support[:, 0]], symbols[support[:, 1]], deterministic)

        q = self.reshape_layer(jnp.concatenate(
            [self._neighbor_encoder(symbols, ql_conn, ql_deg, deterministic), q_e,
             self._neighbor_encoder(symbols, qr_conn, qr_deg, deterministic)], axis=-1))
        s = self.reshape_layer(jnp.concatenate(
            [self._neighbor_encoder(symbols, sl_conn, sl_deg, deterministic), s_e,
             self._neighbor_encoder(symbols, sr_conn, sr_deg, deterministic)], axis=-1))

        q_g = self.support_encoder(q, deterministic)
        s_g = self.support_encoder(s, deterministic)
        s_g = jnp.mean(s_g, axis=0, keepdims=True)

        scores = jnp.squeeze(q_g @ s_g.T, axis=-1)
        return q_g, scores

    # -- eval fast path ------------------------------------------------------

    def encode_neighbors(self, symbols, connections, degrees):
        """Per-entity neighbor encodings [n_entities, emb/2] (eval mode)."""
        return self._neighbor_encoder(symbols, connections, degrees, True)

    def embed_pairs_precomputed(self, symbols, nbr_table, pairs, left, right):
        """Pair embeddings using precomputed neighbor encodings.

        pairs: [N, 2] symbol ids; left/right: [N] entity ids into nbr_table.
        Equivalent to the eval-mode __call__ query path.
        """
        e = self._entity_encoder(symbols[pairs[..., 0]], symbols[pairs[..., 1]], True)
        x = self.reshape_layer(jnp.concatenate(
            [nbr_table[left], e, nbr_table[right]], axis=-1))
        return self.support_encoder(x, True)

    # -- fully factored eval path ---------------------------------------------

    def precompute_pair_tables(self, symbols, nbr_table, ent_sym):
        """Per-entity left/right pre-activations for the pair embedding.

        Everything upstream of the SupportEncoder is separable per entity:
        with the reshape kernel W split over its concat rows
        [nbr_left | tanh(fc1(e1)) ‖ tanh(fc2(e2)) | nbr_right],

            x(e1, e2) = L[e1] + R[e2] + b,
            L[e] = nbr[e]·W_nl + tanh(fc1(sym[e]))·W_e1   (+ b, folded)
            R[e] = tanh(fc2(sym[e]))·W_e2 + nbr[e]·W_nr

        so ranking a pair costs one add + the SupportEncoder instead of four
        gathers + three matmuls. ``ent_sym``: [n_entities] symbol id of each
        entity (the Extractor's symbol table holds relations first).
        Returns (L, R), each [n_entities, embed_dim].
        """
        half = self.embed_dim // 2
        kernel = self.reshape_layer.variables["params"]["kernel"]
        bias = self.reshape_layer.variables["params"]["bias"]
        W_nl, W_e1, W_e2, W_nr = (kernel[:half], kernel[half:2 * half],
                                  kernel[2 * half:3 * half], kernel[3 * half:])
        e_sym = symbols[ent_sym]
        L = (nbr_table @ W_nl + jnp.tanh(self.fc1(e_sym)) @ W_e1) + bias
        R = jnp.tanh(self.fc2(e_sym)) @ W_e2 + nbr_table @ W_nr
        return L, R

    def embed_pairs_factored(self, L, R, left, right):
        """Pair embeddings from the factored tables: [N] entity ids."""
        return self.support_encoder(L[left] + R[right], True)

    def _distributed_support_encoder(self, A, B, residual):
        """Shared body of the head/rel-shared fast paths: the SupportEncoder
        with its first matmul already DISTRIBUTED over the L+R add
        ((L+R)·W1 = L·W1 + R·W1), applied to pre-broadcast halves.

        ``A`` and ``B`` are L·W1 / R·W1(+b1) terms broadcastable to the pair
        block shape; ``residual`` is the pre-broadcast L+R sum. One inlined
        LayerNorm copy (flax defaults: f32 stats, eps 1e-6) keeps the three
        eval fast paths numerically identical to ``support_encoder`` —
        change this body and the factored path together."""
        p = self.support_encoder.variables["params"]
        W2, b2 = p["proj2"]["kernel"], p["proj2"]["bias"]
        ln = p["LayerNorm_0"]
        h = nn.relu(A + B)
        y = (h @ W2 + b2) + residual
        y32 = y.astype(jnp.float32)
        mu = jnp.mean(y32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y32), axis=-1, keepdims=True) - jnp.square(mu)
        norm = (y32 - mu) * jax.lax.rsqrt(var + 1e-6)
        return (norm.astype(y.dtype) * ln["scale"] + ln["bias"])

    def embed_pairs_head_shared(self, L, R, left, right):
        """Pair embeddings for per-query candidate blocks: left [Q] head
        entity ids, right [Q, C] candidate ids → [Q, C, D].

        Numerically ≡ ``embed_pairs_factored(L, R, repeat(left, C),
        right.ravel())`` reshaped, exploiting the zero-shot query shape
        (zsl_module.py:656-726: ONE head entity ranked against a candidate
        list): the head row is gathered and pushed through the
        SupportEncoder's first matmul ONCE per query — the L+R add
        distributes over it ((L+R)·W1 = L·W1 + R·W1) — halving the
        latency-bound gather rows on the eval hot path (the dominant cost:
        experiments/results/eval_roofline.json)."""
        p = self.support_encoder.variables["params"]
        W1, b1 = p["proj1"]["kernel"], p["proj1"]["bias"]
        Lr = L[left]                                   # [Q, D]
        Rr = R[right]                                  # [Q, C, D]
        return self._distributed_support_encoder(
            (Lr @ W1)[:, None, :], Rr @ W1 + b1, Lr[:, None, :] + Rr)

    def embed_pairs_rel_shared(self, L, R, left, right):
        """Pair embeddings for a SHARED candidate list: left [Q] head entity
        ids, right [C] candidate ids (one list for the whole block) →
        [Q, C, D].

        Numerically ≡ ``embed_pairs_head_shared(L, R, left,
        broadcast(right, (Q, C)))``, exploiting the zero-shot eval's deeper
        structure: every query of a relation ranks the SAME rel2candidates
        list (reference utils/gen_mode_candidates.py builds each query's
        list as [true] + rel2candidates[rel] minus a small per-query
        exclusion, zsl_module.py:669-726) — so the candidate-side gather
        AND its first SupportEncoder matmul are hoisted out of the query
        loop entirely. Gather rows per block: Q + C (vs Q + Q·C
        head-shared, Q·C·2 factored); per-triple FLOPs drop to the second
        matmul + pointwise (~4·D² vs 8·D²)."""
        p = self.support_encoder.variables["params"]
        W1, b1 = p["proj1"]["kernel"], p["proj1"]["bias"]
        Lr = L[left]                                   # [Q, D]
        Rr = R[right]                                  # [C, D]
        return self._distributed_support_encoder(
            (Lr @ W1)[:, None, :], (Rr @ W1 + b1)[None, :, :],
            Lr[:, None, :] + Rr[None, :, :])


class Discriminator(nn.Module):
    dim: int = 200

    @nn.compact
    def __call__(self, ep_vec, centroid_matrix, update_sn: bool = False):
        fc_middle = SNDense(self.dim, name="fc_middle")
        fc_tf = SNDense(1, name="fc_TF")
        layer_norm = LayerNormalization(self.dim, name="layer_norm")

        middle = layer_norm(nn.leaky_relu(fc_middle(ep_vec, update_stats=update_sn),
                                          negative_slope=0.01))
        centroid = layer_norm(nn.leaky_relu(fc_middle(centroid_matrix, update_stats=False),
                                            negative_slope=0.01))
        logit_tf = fc_tf(middle, update_stats=update_sn)
        class_scores = middle @ centroid.T
        return middle, logit_tf, class_scores
