"""OpenKE-style class surface over the functional KGE suite.

Mirrors the reference toolkit's user-facing classes
(OpenKE/openke/module/model/*.py, strategy/NegativeSampling.py,
loss/*.py) so that an OpenKE-style training script ports one-to-one, while
the compute runs through the jitted functional core (models/kge.py,
ops/losses.py). ``forward(data)`` consumes the flat OpenKE batch layout
({batch_h, batch_t, batch_r, batch_y, mode}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mre_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from mre_tpu.models import kge as K
from mre_tpu.ops import losses as L


class Model:
    """Base: owns a params pytree + the functional score model."""

    model_name: str = ""

    def __init__(self, ent_tot, rel_tot, seed=0, **init_kwargs):
        self.ent_tot = ent_tot
        self.rel_tot = rel_tot
        self._fn = K.get(self.model_name)
        self._score_kwargs = {}
        self._margin = None   # margin_flag semantics: forward = margin − score
        self.params = self._fn.init(jax.random.key(seed), ent_tot, rel_tot, **init_kwargs)

    def train_score(self, params, h, r, t):
        """Training-orientation score including the reference's margin_flag
        behavior (e.g. TransE.py:40-44, 71-74: forward = margin − distance
        when a margin is configured)."""
        s = self._fn.score(params, h, r, t, **self._score_kwargs)
        if self._margin is not None:
            s = self._margin - s
        return s

    # -- OpenKE batch-dict interface --------------------------------------

    def forward(self, data):
        h = jnp.asarray(data["batch_h"])
        t = jnp.asarray(data["batch_t"])
        r = jnp.asarray(data["batch_r"])
        return self.train_score(self.params, h, r, t)

    def predict(self, data):
        h = jnp.asarray(data["batch_h"])
        t = jnp.asarray(data["batch_t"])
        r = jnp.asarray(data["batch_r"])
        out = self._fn.predict(self.params, h, r, t, **self._score_kwargs)
        return np.asarray(out, np.float32)

    def regularization(self, data):
        h = jnp.asarray(data["batch_h"])
        t = jnp.asarray(data["batch_t"])
        r = jnp.asarray(data["batch_r"])
        return self._fn.regularization(self.params, h, r, t)

    # -- functional accessors used by the Trainer -------------------------

    def loss_terms(self, params, h, r, t):
        return self._fn.score(params, h, r, t, **self._score_kwargs)

    def save_checkpoint(self, path):
        save_checkpoint(path, self.params)

    def load_checkpoint(self, path):
        self.params = load_checkpoint(path, self.params)

    def get_parameters(self, mode: str = "numpy"):
        """Parameter dict for cross-model transfer (BaseModule.get_parameters;
        used by the TransE→TransR pretraining flow in
        OpenKE/examples/train_transr_FB15K237.py)."""
        if mode == "list":
            return jax.tree_util.tree_map(lambda x: np.asarray(x).tolist(), self.params)
        return jax.tree_util.tree_map(np.asarray, self.params)

    def set_parameters(self, parameters):
        """Copy matching keys (e.g. 'ent'/'rel' tables) into this model."""
        new = dict(self.params)
        for k, v in parameters.items():
            if k in new:
                new[k] = jnp.asarray(np.asarray(v), new[k].dtype).reshape(new[k].shape)
        self.params = new

    def save_parameters(self, path):
        import json

        tree = jax.tree_util.tree_map(lambda x: np.asarray(x).tolist(), self.params)
        with open(path, "w") as f:
            json.dump(tree, f)

    def load_parameters(self, path):
        import json

        with open(path) as f:
            tree = json.load(f)
        self.params = jax.tree_util.tree_map(
            lambda ref, v: jnp.asarray(v, ref.dtype), self.params, tree)


class TransE(Model):
    model_name = "transe"

    def __init__(self, ent_tot, rel_tot, dim=100, p_norm=1, norm_flag=True,
                 margin=None, epsilon=None, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim,
                         margin=margin, epsilon=epsilon)
        self._score_kwargs = dict(p_norm=p_norm, norm_flag=norm_flag)
        self._margin = margin


class TransH(Model):
    model_name = "transh"

    def __init__(self, ent_tot, rel_tot, dim=100, p_norm=1, norm_flag=True,
                 margin=None, epsilon=None, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim,
                         margin=margin, epsilon=epsilon)
        self._score_kwargs = dict(p_norm=p_norm, norm_flag=norm_flag)
        self._margin = margin   # margin_flag (TransH.py:44-50)


class TransR(Model):
    model_name = "transr"

    def __init__(self, ent_tot, rel_tot, dim_e=100, dim_r=100, p_norm=1,
                 norm_flag=True, rand_init=False, margin=None, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim_e=dim_e, dim_r=dim_r,
                         rand_init=rand_init)
        self._score_kwargs = dict(p_norm=p_norm, norm_flag=norm_flag)
        self._margin = margin   # margin_flag (TransR.py:33-38); no epsilon
                                # branch upstream (no embedding_range)


class TransD(Model):
    model_name = "transd"

    def __init__(self, ent_tot, rel_tot, dim_e=100, dim_r=100, p_norm=1,
                 norm_flag=True, margin=None, epsilon=None, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim_e=dim_e, dim_r=dim_r,
                         margin=margin, epsilon=epsilon)
        self._score_kwargs = dict(p_norm=p_norm, norm_flag=norm_flag)
        self._margin = margin   # margin_flag (TransD.py:55-60)


class DistMult(Model):
    model_name = "distmult"

    def __init__(self, ent_tot, rel_tot, dim=100, margin=None, epsilon=None, seed=0):
        # margin/epsilon affect ONLY the init range in the reference
        # DistMult (no margin_flag forward branch, DistMult.py:16-32)
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim,
                         margin=margin, epsilon=epsilon)

    _l3_fn = staticmethod(K.distmult_l3_regularization)

    def l3_regularization(self):
        return K.distmult_l3_regularization(self.params)


class ComplEx(Model):
    model_name = "complex"

    def __init__(self, ent_tot, rel_tot, dim=100, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim)


class RESCAL(Model):
    model_name = "rescal"

    def __init__(self, ent_tot, rel_tot, dim=100, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim)


class Analogy(Model):
    model_name = "analogy"

    def __init__(self, ent_tot, rel_tot, dim=100, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim)


class SimplE(Model):
    model_name = "simple"

    def __init__(self, ent_tot, rel_tot, dim=100, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim)


class RotatE(Model):
    model_name = "rotate"

    def __init__(self, ent_tot, rel_tot, dim=100, margin=6.0, epsilon=2.0, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim, margin=margin, epsilon=epsilon)


class HolE(Model):
    model_name = "hole"

    def __init__(self, ent_tot, rel_tot, dim=100, margin=None, epsilon=None, seed=0):
        super().__init__(ent_tot, rel_tot, seed=seed, dim=dim,
                         margin=margin, epsilon=epsilon)

    _l3_fn = staticmethod(K.hole_l3_regularization)

    def l3_regularization(self):
        return K.hole_l3_regularization(self.params)


# --------------------------------------------------------------------------
# Losses (class-style wrappers over ops/losses.py)
# --------------------------------------------------------------------------

class MarginLoss:
    def __init__(self, adv_temperature=None, margin=6.0):
        self.margin = margin
        self.adv_temperature = adv_temperature

    def __call__(self, p_score, n_score):
        return L.margin_loss(p_score, n_score, margin=self.margin,
                             adv_temperature=self.adv_temperature)


class SigmoidLoss:
    def __init__(self, adv_temperature=None):
        self.adv_temperature = adv_temperature

    def __call__(self, p_score, n_score):
        return L.sigmoid_loss(p_score, n_score, adv_temperature=self.adv_temperature)


class SoftplusLoss:
    def __init__(self, adv_temperature=None):
        self.adv_temperature = adv_temperature

    def __call__(self, p_score, n_score):
        return L.softplus_loss(p_score, n_score, adv_temperature=self.adv_temperature)


class NegativeSampling:
    """Strategy wrapper: first ``batch_size`` scores are positives, the rest
    negatives (OpenKE strategy/NegativeSampling.py:3-32 layout)."""

    def __init__(self, model=None, loss=None, batch_size=256,
                 regul_rate=0.0, l3_regul_rate=0.0):
        self.model = model
        self.loss = loss
        self.batch_size = batch_size
        self.regul_rate = regul_rate
        self.l3_regul_rate = l3_regul_rate

    def _split(self, score):
        B = self.batch_size
        p = score[:B].reshape(-1, B).T
        n = score[B:].reshape(-1, B).T
        return p, n

    def loss_value(self, params, data):
        h = jnp.asarray(data["batch_h"])
        t = jnp.asarray(data["batch_t"])
        r = jnp.asarray(data["batch_r"])
        score = self.model.train_score(params, h, r, t)
        p, n = self._split(score)
        value = self.loss(p, n)
        if self.regul_rate:
            value = value + self.regul_rate * self.model._fn.regularization(params, h, r, t)
        if self.l3_regul_rate and getattr(self.model, "_l3_fn", None) is not None:
            # the model declares its own functional regularizer — no
            # name-based dispatch to drift when a third model gains one
            value = value + self.l3_regul_rate * self.model._l3_fn(params)
        return value

    def __call__(self, data):
        return self.loss_value(self.model.params, data)
