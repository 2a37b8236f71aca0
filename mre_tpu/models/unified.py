"""UnifiedModel — the learner composition root.

Flax re-design of the reference's UnifiedModel (module/model.py:517-686):

* M3AE multimodal encoder → per-node cls embeddings;
* single RGCNConv (emb_dim → dim, 30 bases) + LeakyReLU(0.2) over the
  sampled subgraph ("structure consolidator");
* relation-description encoder: frozen M3AE text pass (stop_gradient) →
  two spectral-norm Dense layers (emb_dim → dim → dim);
* conditional generator head: frozen text encoding ⊕ noise →
  spectral-norm fc (emb_dim + noise_dim → emb_dim) → the same map layers →
  std-LayerNorm ("relation embedding generator");
* bidirectional InfoNCE between mean image / text tokens (τ = 0.05).

Reference quirk kept for parity (flagged by ``norm_rel_emb``): the
reference *discards* the LayerNorm result in forward_relation_emb
(module/model.py:609 calls ``self.layer_norm(rel_emb)`` without assignment)
while the generator path applies it (model.py:686). ``norm_rel_emb=True``
switches to the repaired behavior.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mre_tpu.core.config import Config
from mre_tpu.models.m3ae import M3AE, m3ae_config
from mre_tpu.models.rgcn import RGCNConv
from mre_tpu.models.spectral_norm import SNDense
from mre_tpu.models.transformer import LayerNormalization
from mre_tpu.ops import losses as L


def unified_config(model_type: str = "small", updates: dict | None = None) -> Config:
    cfg = Config(dict(
        model_type=model_type,
        emb_dim=200,                 # GCN/relation embedding dim (args.emb_dim)
        noise_dim=15,
        num_bases=30,
        patch_size=16,
        image_mask_ratio=0.75,
        text_mask_ratio=0.75,
        leaky_slope=0.2,
        contrastive=True,
        norm_rel_emb=False,
        compute_dtype="float32",     # forwarded to the M3AE stack (bf16 MXU)
        attention_impl="auto",       # forwarded to the M3AE transformers
    ))
    if updates:
        unknown = set(updates) - set(cfg)
        if unknown:
            raise KeyError(f"unknown unified config keys: {sorted(unknown)}")
        cfg.update(updates)
    return cfg


class UnifiedModel(nn.Module):
    text_vocab_size: int
    num_relations: int
    config: Config = None  # type: ignore[assignment]

    def setup(self):
        cfg = Config(self.config)
        m3ae_cfg = m3ae_config(cfg.model_type, dict(
            image_mask_ratio=cfg.image_mask_ratio,
            text_mask_ratio=cfg.text_mask_ratio,
            compute_dtype=cfg.get("compute_dtype", "float32"),
            attention_impl=cfg.get("attention_impl", "auto")))
        self.reduced_dim = m3ae_cfg.emb_dim
        self.dim = cfg.emb_dim
        self.m3ae = M3AE(
            text_vocab_size=self.text_vocab_size,
            patch_size=cfg.patch_size,
            image_output_dim=cfg.patch_size * cfg.patch_size * 3,
            config=m3ae_cfg, name="M3AEmodel")
        self.conv = RGCNConv(self.reduced_dim, self.dim, self.num_relations,
                             cfg.num_bases, name="conv")
        self.des_rel_map_layer1 = SNDense(self.dim, name="des_rel_map_layer1")
        self.des_rel_map_layer2 = SNDense(self.dim, name="des_rel_map_layer2")
        self.generate_fc_layer = SNDense(self.reduced_dim, name="generate_fc_layer")
        self.layer_norm = LayerNormalization(self.dim, name="layer_norm")

    def init_all(self, edge_index, edge_type, batch, noise):
        """Init-time entry touching every parameterized path (__call__ alone
        never reaches generate_fc_layer / layer_norm)."""
        out = self(edge_index, edge_type, batch, True)
        gen = self.generate(batch["rel_des"], batch["rel_des_padding_mask"], noise)
        return out, gen

    # -- structure consolidator -------------------------------------------

    def gcn_forward_encoder(self, x, edge_index, edge_type, edge_mask=None):
        cfg = Config(self.config)
        x = self.conv(x.reshape(x.shape[0], -1), edge_index, edge_type,
                      edge_mask=edge_mask)
        return nn.leaky_relu(x, negative_slope=cfg.leaky_slope)

    # -- relation-description encoder ---------------------------------------

    def forward_relation_emb(self, description_tokens, des_padding_mask,
                             update_sn: bool = False):
        rel_emb, _ = self.m3ae.forward_representation(
            image=None, text=description_tokens,
            text_padding_mask=des_padding_mask, deterministic=True)
        rel_emb = jax.lax.stop_gradient(rel_emb).reshape(rel_emb.shape[0], -1)
        rel_emb = self.des_rel_map_layer1(rel_emb, update_stats=update_sn)
        rel_emb = self.des_rel_map_layer2(rel_emb, update_stats=update_sn)
        if Config(self.config).norm_rel_emb:
            rel_emb = self.layer_norm(rel_emb)
        return rel_emb

    # -- conditional relation generator -------------------------------------

    def generate(self, description_tokens, des_padding_mask, noise,
                 update_sn: bool = False):
        rel_emb, _ = self.m3ae.forward_representation(
            image=None, text=description_tokens,
            text_padding_mask=des_padding_mask, deterministic=True)
        rel_emb = jax.lax.stop_gradient(rel_emb).reshape(rel_emb.shape[0], -1)
        x = jnp.concatenate([noise, rel_emb], axis=1)
        x = self.generate_fc_layer(x, update_stats=update_sn)
        x = self.des_rel_map_layer1(x, update_stats=update_sn)
        x = self.des_rel_map_layer2(x, update_stats=update_sn)
        return self.layer_norm(x)

    # -- full fusion forward -------------------------------------------------

    def __call__(self, edge_index, edge_type, batch, deterministic: bool = False,
                 is_evaluate: bool = False, edge_mask=None, update_sn: bool = False,
                 node_mask=None):
        cfg = Config(self.config)
        image = batch.get("image_patches")
        text = batch["text"]
        text_padding_mask = batch["text_padding_mask"]

        cls_x, _ = self.m3ae.forward_representation(
            image=image, text=text, text_padding_mask=text_padding_mask,
            deterministic=True)
        x_gcn = self.gcn_forward_encoder(cls_x, edge_index, edge_type, edge_mask)
        rel_emb = self.forward_relation_emb(
            batch["rel_des"], batch["rel_des_padding_mask"], update_sn=update_sn)

        if is_evaluate:
            return x_gcn, rel_emb

        (enc_cls, image_x, text_x, image_mask, text_mask,
         image_ids_restore, text_ids_restore) = self.m3ae.forward_encoder(
            image, text, text_padding_mask, deterministic)
        image_output, text_output = self.m3ae.forward_decoder(
            enc_cls, image_x, text_x, image_ids_restore, text_ids_restore,
            text_padding_mask, deterministic)

        if cfg.contrastive and image is not None and text is not None:
            loss_c, c_acc = L.contrastive_loss(image_x.mean(axis=1), text_x.mean(axis=1),
                                               row_mask=node_mask)
        else:
            loss_c, c_acc = 0.0, 0.0

        batch_output = dict(
            image_output=image_output, text_output=text_output,
            image_mask=image_mask, text_mask=text_mask,
            contrastive_loss=loss_c, contrastive_accuracy=c_acc)
        return x_gcn, rel_emb, batch_output
