"""Masked Multimodal Autoencoder (M3AE), flax-native.

The multimodal learner of the pipeline (reference: module/model.py:200-515):
text-token + image-patch embeddings with modality type embeddings and fixed
sin-cos positions, a shared pre-LN ViT encoder over [cls | image | text],
MAE-style random masking (static keep lengths → static shapes), and a decoder
reconstructing image patches (MSE) and text tokens (CE).

TPU notes:
* masking uses one shared permutation per batch (reference semantics,
  module/model.py:97-111) — a single gather, MXU-friendly;
* the encoder runs over only 1 + keep_img + keep_txt tokens (75% of tokens
  dropped before the encoder, as in the reference);
* pos embeds are host-precomputed numpy constants folded into the graph.

The upstream flax CC12M checkpoint (``m3ae_small.pkl``, loaded through a
flax→torch mapping in the reference, module/utils.py:271-346) is loaded
*natively* here — the parameter tree uses the same names
(see load_cc12m_checkpoint).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mre_tpu.core.config import Config, transformer_preset
from mre_tpu.models.transformer import MLP, Transformer
from mre_tpu.ops.masking import random_masking, restore_with_mask_tokens
from mre_tpu.ops.pos_embed import get_1d_sincos_pos_embed, get_2d_sincos_pos_embed


def m3ae_config(model_type: str = "small", updates: dict | None = None) -> Config:
    cfg = Config(dict(
        model_type=model_type,
        output_head_depth=0,
        att_drop=0.0, drop=0.0, drop_path=0.0,
        use_type_embedding=True,
        image_mask_ratio=0.75,
        text_mask_ratio=0.75,
        compute_dtype="float32",    # "bfloat16" runs matmuls on the MXU in bf16
        attention_impl="auto",      # auto | pallas | xla (transformer.py)
    ))
    cfg.update(transformer_preset(model_type))
    if updates:
        unknown = set(updates) - set(cfg)
        if unknown:
            # a typo'd override must not silently leave the real default in
            # force (Config.make discipline, core/config.py)
            raise KeyError(f"unknown m3ae config keys: {sorted(unknown)}")
        cfg.update(updates)
    return cfg


class M3AE(nn.Module):
    text_vocab_size: int
    patch_size: int
    image_output_dim: int = 768
    config: Config = None  # type: ignore[assignment]

    def setup(self):
        cfg = Config(self.config)
        emb_init = nn.initializers.normal(stddev=0.02)
        self.text_embedding = nn.Embed(
            self.text_vocab_size, cfg.emb_dim,
            embedding_init=nn.initializers.normal(stddev=1.0),
            name="text_embedding")
        self.image_embedding = nn.Dense(
            cfg.emb_dim, kernel_init=nn.initializers.xavier_uniform(),
            name="image_embedding")
        self.cls_token = self.param("cls_token", emb_init, (1, 1, cfg.emb_dim))
        if cfg.use_type_embedding:
            self.encoder_image_type_embedding = self.param(
                "encoder_image_type_embedding", emb_init, (1, 1, cfg.emb_dim))
            self.encoder_text_type_embedding = self.param(
                "encoder_text_type_embedding", emb_init, (1, 1, cfg.emb_dim))
            self.decoder_image_type_embedding = self.param(
                "decoder_image_type_embedding", emb_init, (1, 1, cfg.dec_emb_dim))
            self.decoder_text_type_embedding = self.param(
                "decoder_text_type_embedding", emb_init, (1, 1, cfg.dec_emb_dim))
        self.image_mask_embedding = self.param(
            "image_mask_embedding", emb_init, (1, 1, cfg.dec_emb_dim))
        self.text_mask_embedding = self.param(
            "text_mask_embedding", emb_init, (1, 1, cfg.dec_emb_dim))
        dtype = jnp.dtype(cfg.get("compute_dtype", "float32"))
        att_impl = cfg.get("attention_impl", "auto")
        self.encoder = Transformer(
            emb_dim=cfg.emb_dim, depth=cfg.depth, att_drop=cfg.att_drop,
            drop=cfg.drop, drop_path=cfg.drop_path, num_heads=cfg.num_heads,
            mlp_ratio=cfg.mlp_ratio, dtype=dtype, attention_impl=att_impl,
            name="encoder")
        self.decoder = Transformer(
            emb_dim=cfg.dec_emb_dim, depth=cfg.dec_depth, att_drop=cfg.att_drop,
            drop=cfg.drop, drop_path=cfg.drop_path, num_heads=cfg.dec_num_heads,
            mlp_ratio=cfg.mlp_ratio, dtype=dtype, attention_impl=att_impl,
            name="decoder")
        self.decoder_input_projection = nn.Dense(
            cfg.dec_emb_dim, kernel_init=nn.initializers.xavier_uniform(),
            name="decoder_input_projection")
        self.decoder_image_output = MLP(
            cfg.dec_emb_dim, self.image_output_dim, cfg.output_head_depth,
            input_norm=cfg.output_head_depth > 0, name="decoder_image_output")
        self.decoder_text_output = MLP(
            cfg.dec_emb_dim, self.text_vocab_size, cfg.output_head_depth,
            input_norm=cfg.output_head_depth > 0, name="decoder_text_output")

    def _type_emb(self, name):
        if Config(self.config).use_type_embedding:
            return getattr(self, name)
        return 0.0

    # -- unmasked representation pass (module/model.py:323-356) -----------

    def forward_representation(self, image, text, text_padding_mask,
                               deterministic: bool = True):
        batch = image.shape[0] if image is not None else text.shape[0]
        cfg = Config(self.config)
        toks = [jnp.broadcast_to(self.cls_token, (batch, 1, cfg.emb_dim))]
        pads = [jnp.zeros((batch, 1), jnp.float32)]
        if image is not None:
            img = (self.image_embedding(image)
                   + get_2d_sincos_pos_embed(cfg.emb_dim, image.shape[1], self.patch_size)
                   + self._type_emb("encoder_image_type_embedding"))
            toks.append(img)
            pads.append(jnp.zeros((batch, image.shape[1]), jnp.float32))
        if text is not None:
            txt = (self.text_embedding(text)
                   + get_1d_sincos_pos_embed(cfg.emb_dim, text.shape[1])
                   + self._type_emb("encoder_text_type_embedding"))
            toks.append(txt)
            pads.append(text_padding_mask)
        x = jnp.concatenate(toks, axis=1)
        pad = jnp.concatenate(pads, axis=1)
        x = self.encoder(x, deterministic, pad)
        return x[:, :1, :], x

    # -- masked encoder pass (module/model.py:358-420) ---------------------

    def forward_encoder(self, image, text, text_padding_mask,
                        deterministic: bool = False):
        batch = image.shape[0] if image is not None else text.shape[0]
        cfg = Config(self.config)
        toks = [jnp.broadcast_to(self.cls_token, (batch, 1, cfg.emb_dim))]
        pads = [jnp.zeros((batch, 1), jnp.float32)]

        image_mask = image_ids_restore = None
        text_mask = text_ids_restore = text_pad_kept = None
        img_keep = 0

        if image is not None:
            img_keep = int(image.shape[1] * (1.0 - cfg.image_mask_ratio))
            img = (self.image_embedding(image)
                   + get_2d_sincos_pos_embed(cfg.emb_dim, image.shape[1], self.patch_size)
                   + self._type_emb("encoder_image_type_embedding"))
            m = random_masking(self.make_rng("masking"), img, img_keep)
            toks.append(m.kept)
            pads.append(jnp.zeros((batch, img_keep), jnp.float32))
            image_mask, image_ids_restore = m.mask, m.ids_restore

        if text is not None:
            txt_keep = int(text.shape[1] * (1.0 - cfg.text_mask_ratio))
            txt = (self.text_embedding(text)
                   + get_1d_sincos_pos_embed(cfg.emb_dim, text.shape[1])
                   + self._type_emb("encoder_text_type_embedding"))
            m = random_masking(self.make_rng("masking"), txt, txt_keep, text_padding_mask)
            toks.append(m.kept)
            pads.append(m.padding_mask_kept)
            text_mask, text_ids_restore = m.mask, m.ids_restore
            text_pad_kept = m.padding_mask_kept

        x = jnp.concatenate(toks, axis=1)
        pad = jnp.concatenate(pads, axis=1)
        x = self.encoder(x, deterministic, pad)

        cls_x = x[:, :1, :]
        if image is None:
            image_x, text_x = None, x[:, 1:, :]
        elif text is None:
            image_x, text_x = x[:, 1:, :], None
        else:
            image_x = x[:, 1:img_keep + 1, :]
            text_x = x[:, img_keep + 1:, :]
        return (cls_x, image_x, text_x, image_mask, text_mask,
                image_ids_restore, text_ids_restore)

    # -- decoder pass (module/model.py:422-494) ----------------------------

    def forward_decoder(self, cls_x, image_x, text_x, image_ids_restore,
                        text_ids_restore, text_padding_mask,
                        deterministic: bool = False):
        cfg = Config(self.config)
        batch = cls_x.shape[0]
        toks = [self.decoder_input_projection(cls_x)]
        pads = [jnp.zeros((batch, 1), jnp.float32)]

        img_len = 0
        if image_x is not None:
            img_len = image_ids_restore.shape[0]
            x = self.decoder_input_projection(image_x)
            x = restore_with_mask_tokens(x, self.image_mask_embedding, image_ids_restore)
            x = (x + get_2d_sincos_pos_embed(cfg.dec_emb_dim, img_len, self.patch_size)
                 + self._type_emb("decoder_image_type_embedding"))
            toks.append(x)
            pads.append(jnp.zeros((batch, img_len), jnp.float32))

        if text_x is not None:
            x = self.decoder_input_projection(text_x)
            x = restore_with_mask_tokens(x, self.text_mask_embedding, text_ids_restore)
            x = (x + get_1d_sincos_pos_embed(cfg.dec_emb_dim, text_ids_restore.shape[0])
                 + self._type_emb("decoder_text_type_embedding"))
            toks.append(x)
            pads.append(text_padding_mask)

        x = jnp.concatenate(toks, axis=1)
        pad = jnp.concatenate(pads, axis=1)
        x = self.decoder(x, deterministic, pad)

        if image_x is None:
            return None, self.decoder_text_output(x[:, 1:, :])
        if text_x is None:
            return self.decoder_image_output(x[:, 1:, :]), None
        image_output = self.decoder_image_output(x[:, 1:img_len + 1, :])
        text_output = self.decoder_text_output(x[:, img_len + 1:, :])
        return image_output, text_output

    def __call__(self, image, text, text_padding_mask, deterministic: bool = False):
        (cls_x, image_x, text_x, image_mask, text_mask,
         image_ids_restore, text_ids_restore) = self.forward_encoder(
            image, text, text_padding_mask, deterministic)
        image_output, text_output = self.forward_decoder(
            cls_x, image_x, text_x, image_ids_restore, text_ids_restore,
            text_padding_mask, deterministic)
        return image_output, text_output, image_mask, text_mask


def load_cc12m_checkpoint(path: str, params: dict) -> dict:
    """Load the upstream flax M3AE pickle natively.

    The file holds ``{'state': <flax train state>, 'variant': ...}`` with
    ``state.params['params']`` matching this module's tree (the reference
    transposes it into torch, module/utils.py:271-346; we only need to copy
    the *encoder-side* entries it uses, keeping our init elsewhere).
    """
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f)
    src = data["state"].params["params"]
    out = jax.tree_util.tree_map(lambda x: x, params)  # copy structure

    for name in ("cls_token", "encoder_image_type_embedding", "encoder_text_type_embedding",
                 "image_mask_embedding", "text_mask_embedding",
                 "decoder_image_type_embedding", "decoder_text_type_embedding"):
        if name in src and name in out:
            # cast to the initialized leaf's dtype: a bf16-saved checkpoint
            # must not smuggle mixed dtypes into an f32 parameter tree
            out[name] = jnp.asarray(np.asarray(src[name]), out[name].dtype)
    for name in ("image_embedding", "text_embedding", "encoder"):
        if name in src and name in out:
            out[name] = jax.tree_util.tree_map(
                lambda x, d: jnp.asarray(np.asarray(x), d.dtype),
                src[name], out[name])
    return out
