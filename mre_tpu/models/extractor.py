"""ZSL matching networks: Extractor and WGAN critic.

Flax re-designs of the reference's matching metric (module/zsl_module.py:17-138):

* ``Extractor`` — entity-pair embedding network over a *frozen* symbol
  embedding table (relations + entities + PAD). The table is passed as an
  input array (not a parameter): the fusion learner refreshes it between
  rounds (``update_embed``, zsl_module.py:235-237), so keeping it out of the
  param tree makes the update a plain array swap — no optimizer state churn.
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

    @nn.compact
    def __call__(self, symbols, query, support, query_meta, support_meta,
                 deterministic: bool = True):
        """symbols: [num_symbols+1, D]; query/support: [B, 2] symbol ids;
        metas: (left_connections, left_degrees, right_connections,
        right_degrees) with connections [B, max_neighbor, 2] (rel_sym,
        ent_sym). Returns (query_embeddings, matching_scores)."""
        half = self.embed_dim // 2
        xn = nn.initializers.xavier_normal()
        gcn_w = nn.Dense(half, name="gcn_w", kernel_init=xn)
        fc1 = nn.Dense(half, name="fc1", kernel_init=xn)
        fc2 = nn.Dense(half, name="fc2", kernel_init=xn)
        reshape_layer = nn.Dense(self.embed_dim, name="reshape_layer", kernel_init=xn)
        support_encoder = SupportEncoder(self.embed_dim, 2 * self.embed_dim,
                                         dropout=0.2, name="support_encoder")
        drop = nn.Dropout(self.dropout)

        def neighbor_encoder(connections, num_neighbors):
            # mean of projected neighbor-entity embeddings → tanh
            # (zsl_module.py:46-59)
            ents = connections[:, :, 1]
            ent_embeds = drop(symbols[ents], deterministic=deterministic)
            out = jnp.sum(gcn_w(ent_embeds), axis=1)
            out = out / jnp.maximum(num_neighbors, 1.0)[:, None]
            return jnp.tanh(out)

        def entity_encoder(e1, e2):
            e1 = drop(e1, deterministic=deterministic)
            e2 = drop(e2, deterministic=deterministic)
            return jnp.tanh(jnp.concatenate([fc1(e1), fc2(e2)], axis=-1))

        ql_conn, ql_deg, qr_conn, qr_deg = query_meta
        sl_conn, sl_deg, sr_conn, sr_deg = support_meta

        q_e = entity_encoder(symbols[query[:, 0]], symbols[query[:, 1]])
        s_e = entity_encoder(symbols[support[:, 0]], symbols[support[:, 1]])

        q = reshape_layer(jnp.concatenate(
            [neighbor_encoder(ql_conn, ql_deg), q_e,
             neighbor_encoder(qr_conn, qr_deg)], axis=-1))
        s = reshape_layer(jnp.concatenate(
            [neighbor_encoder(sl_conn, sl_deg), s_e,
             neighbor_encoder(sr_conn, sr_deg)], axis=-1))

        q_g = support_encoder(q, deterministic)
        s_g = support_encoder(s, deterministic)
        s_g = jnp.mean(s_g, axis=0, keepdims=True)

        scores = jnp.squeeze(q_g @ s_g.T, axis=-1)
        return q_g, scores


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
