"""ExpModel — the no-GCN ablation variant.

Flax port of the reference's ExpModel (module/model.py:703-835): per-entity
2-layer MLP (mm_layer1/2 with LeakyReLU + dropout) over head/tail M3AE cls
embeddings instead of the RGCN structure consolidator; relation-description
encoder uses plain (non-spectral-norm) map layers with an activation between
them (unlike UnifiedModel's).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mre_tpu.core.config import Config
from mre_tpu.models.m3ae import M3AE, m3ae_config


class ExpModel(nn.Module):
    text_vocab_size: int
    config: Config = None  # type: ignore[assignment]

    def setup(self):
        cfg = Config(self.config)
        m3ae_cfg = m3ae_config(cfg.model_type, dict(
            image_mask_ratio=cfg.image_mask_ratio,
            text_mask_ratio=cfg.text_mask_ratio))
        self.dim = cfg.emb_dim
        self.m3ae = M3AE(
            text_vocab_size=self.text_vocab_size,
            patch_size=cfg.patch_size,
            image_output_dim=cfg.patch_size * cfg.patch_size * 3,
            config=m3ae_cfg, name="M3AEmodel")
        self.des_rel_map_layer1 = nn.Dense(self.dim, name="des_rel_map_layer1")
        self.des_rel_map_layer2 = nn.Dense(self.dim, name="des_rel_map_layer2")
        self.mm_layer1 = nn.Dense(self.dim, name="mm_layer1")
        self.mm_layer2 = nn.Dense(self.dim, name="mm_layer2")
        self.dropout = nn.Dropout(0.2)

    def forward_entity_emb(self, cls_x, deterministic=True):
        x = cls_x.reshape(cls_x.shape[0], -1)
        x = self.dropout(x, deterministic=deterministic)
        x = self.mm_layer1(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return self.mm_layer2(x)

    def forward_relation_emb(self, description_tokens, des_padding_mask,
                             deterministic=True):
        rel_emb, _ = self.m3ae.forward_representation(
            image=None, text=description_tokens,
            text_padding_mask=des_padding_mask, deterministic=True)
        rel_emb = jax.lax.stop_gradient(rel_emb).reshape(rel_emb.shape[0], -1)
        rel_emb = self.dropout(rel_emb, deterministic=deterministic)
        rel_emb = self.des_rel_map_layer1(rel_emb)
        rel_emb = nn.leaky_relu(rel_emb, negative_slope=0.2)
        return self.des_rel_map_layer2(rel_emb)

    def __call__(self, batch, deterministic: bool = False, is_evaluate: bool = False):
        """batch: image_patches_head/tail, text_head/tail,
        text_padding_mask_head/tail, rel_des, rel_des_padding_mask."""
        cls_h, _ = self.m3ae.forward_representation(
            batch.get("image_patches_head"), batch["text_head"],
            batch["text_padding_mask_head"], deterministic=True)
        cls_t, _ = self.m3ae.forward_representation(
            batch.get("image_patches_tail"), batch["text_tail"],
            batch["text_padding_mask_tail"], deterministic=True)

        x_head = self.forward_entity_emb(cls_h, deterministic)
        x_tail = self.forward_entity_emb(cls_t, deterministic)
        rel_emb = self.forward_relation_emb(
            batch["rel_des"], batch["rel_des_padding_mask"], deterministic)

        if is_evaluate:
            return x_head, x_tail, rel_emb

        (enc_cls, image_x, text_x, image_mask, text_mask,
         image_ids_restore, text_ids_restore) = self.m3ae.forward_encoder(
            batch.get("image_patches_head"), batch["text_head"],
            batch["text_padding_mask_head"], deterministic)
        image_output, text_output = self.m3ae.forward_decoder(
            enc_cls, image_x, text_x, image_ids_restore, text_ids_restore,
            batch["text_padding_mask_head"], deterministic)

        # Reference quirk kept (model.py:780-786): ExpModel computes loss_c
        # but hard-codes contrastive_loss=0.0 in batch_output (dead code
        # upstream) — the no-GCN ablation never trains a contrastive term.
        batch_output = dict(image_output=image_output, text_output=text_output,
                            image_mask=image_mask, text_mask=text_mask,
                            contrastive_loss=0.0, contrastive_accuracy=0.0)
        return x_head, x_tail, rel_emb, batch_output
