"""DistillModel — relation-description → relation-embedding distillation.

Flax port of the reference's small distillation MLP (module/DistillModel.py:
7-62): frozen learned text embeddings + sin-cos positions (+ text type
embedding) → fc(emb→2·dim) → LeakyReLU → fc(2·dim→dim) → std-LayerNorm →
mean over tokens → fc(dim→dim); trained with MSE against the teacher
relation embeddings; ``predict`` maps unseen relation descriptions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mre_tpu.models.transformer import LayerNormalization
from mre_tpu.ops.pos_embed import get_1d_sincos_pos_embed


class DistillModel(nn.Module):
    emb_dim: int                 # output relation-embedding dim
    transformer_emb_dim: int     # the frozen text-embedding dim

    @nn.compact
    def __call__(self, rel_token_embeddings):
        """rel_token_embeddings: [B, L, transformer_emb_dim] — the frozen
        text-embedding lookup + type embedding already applied; positions
        are added here."""
        x = rel_token_embeddings + get_1d_sincos_pos_embed(
            self.transformer_emb_dim, rel_token_embeddings.shape[1])
        x = nn.Dense(2 * self.emb_dim, name="fc1")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Dense(self.emb_dim, name="fc2")(x)
        x = LayerNormalization(self.emb_dim, name="layer_norm")(x)
        x = jnp.mean(x, axis=-2)
        return nn.Dense(self.emb_dim, name="fc3")(x)


def embed_tokens(m3ae_params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
    """Frozen text-embedding + text type embedding lookup from M3AE params
    (module/DistillModel.py:27-32)."""
    table = m3ae_params["text_embedding"]["embedding"]
    # absent when the M3AE was built with use_type_embedding=False — treat
    # as 0 exactly like M3AE._type_emb does
    type_emb = m3ae_params.get("encoder_text_type_embedding", 0.0)
    return jax.lax.stop_gradient(table[tokens] + type_emb)


def make_distill_trainer(emb_dim: int, transformer_emb_dim: int, lr: float = 1e-4,
                         seed: int = 0):
    """Returns (model, params, opt_state, jitted step, jitted predict)."""
    import optax

    model = DistillModel(emb_dim=emb_dim, transformer_emb_dim=transformer_emb_dim)
    params = model.init(jax.random.key(seed),
                        jnp.zeros((1, 4, transformer_emb_dim)))["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, token_embs, teacher):
        def loss_fn(p):
            pred = model.apply({"params": p}, token_embs)
            return jnp.mean((pred - teacher) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, token_embs):
        return model.apply({"params": params}, token_embs)

    return model, params, opt_state, step, predict
