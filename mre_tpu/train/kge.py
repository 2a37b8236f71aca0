"""Structure-only KGE training — the OpenKE Trainer, TPU-native.

One jitted train step fuses: on-device uniform positive draw + filtered
Bernoulli corruption (ops/sampling.py), score computation, ranking loss with
optional self-adversarial weighting and L2/L3 regularization, and the
optimizer update. Replaces the host round-trip of
OpenKE config/Trainer.py:42-53 + Base.cpp sampling entirely — zero
host↔device traffic in steady state.

Sharding: with a multi-device mesh, parameters are replicated and the batch
axis is sharded over ``data`` — XLA all-reduces gradients over ICI.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mre_tpu.data.kg import DeviceKG, TripleTable
from mre_tpu.models import kge as kge_models
from mre_tpu.ops import losses as L
from mre_tpu.ops import sampling
from mre_tpu.parallel import mesh as pmesh
from mre_tpu.core.metrics import MetricLogger
from mre_tpu.core import checkpoint as ckpt


def torch_adagrad(learning_rate: float, lr_decay: float = 0.0) -> optax.GradientTransformation:
    """Adagrad with torch.optim.Adagrad semantics: accumulator starts at 0
    and eps (1e-10) is added OUTSIDE the sqrt — update = g / (√ν + 1e-10),
    with the per-step learning rate lr / (1 + (step−1)·lr_decay).

    optax.adagrad uses rsqrt(ν + 1e-7): with the ~1e-6 per-component
    gradients of mean-reduced KGE losses over large embedding tables that
    shrinks steps ~300× and freezes training; torch's form takes a
    ±lr-sized first step per touched component (what the OpenKE adagrad
    recipes rely on to escape the tiny xavier init).
    """

    def init_fn(params):
        return (jnp.zeros([], jnp.int32), optax.ScaleByRssState(
            sum_of_squares=jax.tree_util.tree_map(jnp.zeros_like, params)))

    def update_fn(updates, state, params=None):
        count, rss = state
        # torch: clr = lr / (1 + (step-1)*lr_decay); count is pre-increment.
        clr = learning_rate / (1.0 + count.astype(jnp.float32) * lr_decay)
        nu = jax.tree_util.tree_map(lambda g, t: t + g * g, updates,
                                    rss.sum_of_squares)
        scaled = jax.tree_util.tree_map(
            lambda g, t: -clr * g / (jnp.sqrt(t) + 1e-10), updates, nu)
        return scaled, (count + 1, optax.ScaleByRssState(sum_of_squares=nu))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(opt_method: str, lr: float, lr_decay: float = 0.0, weight_decay: float = 0.0):
    opt_method = opt_method.lower()
    if opt_method == "adagrad":
        tx = torch_adagrad(lr, lr_decay)
    elif lr_decay:
        # Only torch.optim.Adagrad consumes lr_decay in the reference
        # (OpenKE config/Trainer.py); silently ignoring it would train a
        # different schedule than the recipe asked for.
        raise ValueError(f"lr_decay is only supported for adagrad, not {opt_method}")
    elif opt_method == "adadelta":
        tx = optax.adadelta(lr)
    elif opt_method == "adam":
        tx = optax.adam(lr)
    else:
        tx = optax.sgd(lr)
    if weight_decay:
        # never decay frozen buffers (RotatE keeps margin/rel_range in the
        # params pytree with stop_gradient — requires_grad=False upstream,
        # RotatE.py:20-43; decay would shrink them despite zero grads)
        tx = optax.chain(
            optax.add_decayed_weights(
                weight_decay,
                mask=lambda params: jax.tree_util.tree_map_with_path(
                    lambda path, _: not any(
                        getattr(k, "key", None) in ("margin", "rel_range")
                        for k in path), params)),
            tx)
    return tx


@dataclasses.dataclass
class KGETrainerConfig:
    model: str = "transe"
    dim: int = 200
    p_norm: int = 1
    norm_flag: bool = True
    margin: float = 5.0
    # OpenKE margin_flag (TransE.py:24-33): distance models apply forward =
    # margin − distance ONLY when the example passed margin to the MODEL
    # constructor (e.g. train_transe_WN18_adv_sigmoidloss.py); it is opt-in,
    # so a sigmoid/softplus run without it trains on the raw distance.
    margin_flag: bool = False
    loss: str = "margin"            # margin | sigmoid | softplus
    adv_temperature: float | None = None
    neg_ent: int = 25
    batch_size: int = 1024
    bern: bool = True
    opt_method: str = "sgd"
    alpha: float = 1.0              # learning rate (OpenKE naming)
    regul_rate: float = 0.0
    l3_regul_rate: float = 0.0
    train_times: int = 1000         # epochs
    nbatches: int = 100             # steps per epoch (OpenKE TrainDataLoader)
    seed: int = 0
    lr_decay: float = 0.0           # torch.optim.Adagrad lr_decay
    init_kwargs: dict = dataclasses.field(default_factory=dict)  # extra model.init kwargs


class KGETrainer:
    """End-to-end structure-only KGE trainer."""

    def __init__(self, table: TripleTable, config: KGETrainerConfig, mesh=None):
        self.table = table
        self.cfg = config
        self.mesh = mesh or pmesh.make_mesh(n_data=1)
        self.model = kge_models.get(config.model)
        self.kg = DeviceKG.from_table(table)

        key = jax.random.key(config.seed)
        self.params = self.model.init(key, table.n_entities, table.n_relations,
                                      dim=config.dim, **config.init_kwargs)
        self.tx = make_optimizer(config.opt_method, config.alpha, config.lr_decay)
        self.opt_state = self.tx.init(self.params)
        self._step = self._build_step()
        self._rng = jax.random.key(config.seed + 1)

    def _build_step(self):
        cfg = self.cfg
        model = self.model
        loss_fn = L.LOSSES[cfg.loss]
        tx = self.tx
        mesh = self.mesh
        dp = int(mesh.shape.get(pmesh.DATA_AXIS, 1)) if mesh is not None else 1

        def shard_batch(batch):
            # data-parallel constraint on the on-device sampled batch: with
            # params replicated and the batch sharded over 'data', GSPMD
            # splits the step across the mesh and all-reduces the gradients
            # over ICI (scalar fields — e.g. overflow counters — stay
            # replicated).
            from jax.sharding import NamedSharding, PartitionSpec as P

            def shard(x):
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == cfg.batch_size:
                    spec = P(pmesh.DATA_AXIS, *([None] * (x.ndim - 1)))
                    return jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, spec))
                return x

            return jax.tree_util.tree_map(shard, batch)

        def score(params, h, r, t):
            if cfg.model in ("transe", "transh", "transr", "transd"):
                return model.score(params, h, r, t, p_norm=cfg.p_norm, norm_flag=cfg.norm_flag)
            return model.score(params, h, r, t)

        def loss(params, batch: sampling.NegativeBatch):
            if model.score_pos_neg is not None:
                kw = ({"p_norm": cfg.p_norm, "norm_flag": cfg.norm_flag}
                      if cfg.model in ("transe", "transh", "transr", "transd") else {})
                p, n = model.score_pos_neg(params, batch, **kw)
                p = p[:, None]
            else:
                p = score(params, batch.h, batch.r, batch.t)[:, None]
                n = score(params,
                          batch.neg_h, jnp.broadcast_to(batch.r[:, None], batch.neg_h.shape),
                          batch.neg_t)
            # distance models: loss wants (p_small, n_big); similarity models
            # feed (p, n) to sigmoid/softplus directly. MarginLoss in the
            # reference always receives (p, n) in forward orientation.
            kwargs = {}
            if cfg.loss == "margin":
                kwargs["margin"] = cfg.margin
            if cfg.adv_temperature:
                kwargs["adv_temperature"] = cfg.adv_temperature
            if model.higher_is_better and cfg.loss == "margin":
                value = loss_fn(-p, -n, **kwargs)
            elif not model.higher_is_better and cfg.margin_flag \
                    and cfg.loss in ("sigmoid", "softplus"):
                # Reference margin_flag semantics (TransE.py:60-89): distance
                # models trained with sigmoid/softplus losses pass the model a
                # margin and forward() returns margin − distance (higher is
                # better), e.g. examples/train_transe_WN18_adv_sigmoidloss.py.
                # predict() folds the offset back out, so ranking still sees
                # plain distance. Opt-in (cfg.margin_flag), as upstream.
                value = loss_fn(cfg.margin - p, cfg.margin - n, **kwargs)
            else:
                value = loss_fn(p, n, **kwargs)
            if cfg.regul_rate:
                all_h = jnp.concatenate([batch.h[:, None], batch.neg_h], 1)
                all_t = jnp.concatenate([batch.t[:, None], batch.neg_t], 1)
                all_r = jnp.broadcast_to(batch.r[:, None], all_h.shape)
                value = value + cfg.regul_rate * model.regularization(params, all_h, all_r, all_t)
            if cfg.l3_regul_rate and cfg.model in ("distmult", "hole"):
                value = value + cfg.l3_regul_rate * kge_models.distmult_l3_regularization(params)
            return value

        def one_step(kg, carry, sub):
            # kg arrives as a jit ARGUMENT (threaded from train_step /
            # train_epoch below), never a closure constant: baked CSR tables
            # blow up the serialized program on remote-compile backends at
            # large dims (same hazard ranking.link_prediction documents).
            params, opt_state = carry
            batch = sampling.sample_training_batch(sub, kg, cfg.batch_size, cfg.neg_ent, cfg.bern)
            if dp > 1:
                batch = shard_batch(batch)
            value, grads = jax.value_and_grad(loss)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (value, batch.overflow_truncated)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, rng, kg):
            rng, sub = jax.random.split(rng)
            (params, opt_state), (value, trunc) = one_step(kg, (params, opt_state), sub)
            return params, opt_state, rng, {"loss": value,
                                            "overflow_truncated": trunc}

        # Whole-epoch program: lax.scan over nbatches sampled steps — one
        # device dispatch per epoch instead of per step (the per-step host
        # round-trip dominates on remote-attached TPUs). The epoch stats
        # carry the summed loss AND the overflow-truncation counter
        # (ops/sampling.py _resolve_overflow: a silently-approximate filter
        # must be observable; 0 at reference sparsity).
        @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=("n_steps",))
        def train_epoch(params, opt_state, rng, kg, n_steps):
            rng, sub = jax.random.split(rng)
            subs = jax.random.split(sub, n_steps)
            (params, opt_state), (values, truncs) = jax.lax.scan(
                functools.partial(one_step, kg), (params, opt_state), subs)
            return params, opt_state, rng, {"loss": jnp.sum(values),
                                            "overflow_truncated": jnp.sum(truncs)}

        # Lockstep/oracle hook: one optimizer step on a caller-provided batch
        # (experiments/distmult_lockstep.py feeds byte-identical batches to
        # this and to a torch re-enactment of the reference semantics).
        @jax.jit
        def step_with_batch(params, opt_state, batch):
            value, grads = jax.value_and_grad(loss)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, value

        self._loss_fn = jax.jit(loss)
        self._step_with_batch = step_with_batch
        # kg bound as a per-call keyword argument (runtime input, not baked)
        self._epoch_fn = functools.partial(train_epoch, kg=self.kg)
        return functools.partial(train_step, kg=self.kg)

    def run(self, log_every: int = 50, logger: MetricLogger | None = None,
            save_steps: int | None = None, checkpoint_dir: str | None = None) -> float:
        cfg = self.cfg
        last = 0.0
        for epoch in range(cfg.train_times):
            self.params, self.opt_state, self._rng, stats = self._epoch_fn(
                self.params, self.opt_state, self._rng, n_steps=cfg.nbatches)
            last = float(stats["loss"])
            if logger and (epoch % log_every == 0 or epoch == cfg.train_times - 1):
                logger.log({"epoch": epoch, "loss": last,
                            "overflow_truncated": int(stats["overflow_truncated"])},
                           step=epoch)
            if save_steps and checkpoint_dir and (epoch + 1) % save_steps == 0:
                ckpt.save_checkpoint(f"{checkpoint_dir}/{cfg.model}-{epoch}.ckpt", self.params)
        return last

    # -- evaluation ------------------------------------------------------

    def link_prediction(self, test_triples: np.ndarray, filter_table: TripleTable | None = None,
                        type_constraints=None, chunk: int = 256):
        """Filtered link prediction. ``filter_table`` must be the
        train+valid+test UNION for protocol-correct filtered ranks (Test.h
        filters against tripleList = all splits); with None, only TRAIN
        triples are excluded and filtered metrics are understated."""
        import warnings

        from mre_tpu.ops import ranking

        if filter_table is None:
            warnings.warn(
                "link_prediction without filter_table: filtered ranks only "
                "exclude TRAIN triples — pass the train+valid+test union "
                "for the standard protocol (OpenKE Test.h).", stacklevel=2)
        if getattr(self, "_filter_cache", None) is not None and \
                self._filter_cache[0] is filter_table:
            filt = self._filter_cache[1]
        else:
            filt = (DeviceKG.from_table(filter_table)
                    if filter_table is not None else self.kg)
            # periodic valid-eval runs reuse the same table object: skip the
            # host->device re-upload of the union CSR each round
            self._filter_cache = (filter_table, filt)
        cfg = self.cfg
        model = self.model
        params = self.params

        if cfg.model in ("transe", "transh", "transr", "transd"):
            base_predict = model.predict

            def predict(p, h, r, t):
                return base_predict(p, h, r, t, p_norm=cfg.p_norm, norm_flag=cfg.norm_flag)

            model = dataclasses.replace(model, predict=predict)
            if cfg.model == "transr":
                # Generic broadcast fallback would gather [B, chunk, de, dr]
                # relation matrices per entity chunk; use the whole-table
                # projection fast path instead (models/kge.py).
                model = dataclasses.replace(
                    model,
                    score_all_tails=functools.partial(
                        kge_models.transr_all_tails, p_norm=cfg.p_norm, norm_flag=cfg.norm_flag),
                    score_all_heads=functools.partial(
                        kge_models.transr_all_heads, p_norm=cfg.p_norm, norm_flag=cfg.norm_flag),
                )

        all_tails, all_heads = ranking.make_predict_all(model, filt)
        if not hasattr(self, "_rank_jit_cache"):
            # reuse the compiled chunk runner across periodic valid evals
            self._rank_jit_cache = {}
        # filter_pad=None: link_prediction derives the exact bound from the
        # kg's own CSR offsets (kg.max_row_len) — no duplicate derivation.
        return ranking.link_prediction(all_tails, all_heads, params, filt,
                                       test_triples, chunk=chunk,
                                       type_constraints=type_constraints,
                                       jit_cache=self._rank_jit_cache)
