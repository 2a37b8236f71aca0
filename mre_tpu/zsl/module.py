"""ZSL subsystem orchestrator — Extractor pretraining, WGAN-GP, zero-shot eval.

TPU re-design of the reference ZSLmodule (module/zsl_module.py:140-790):

* symbol table + neighbor-connection matrix built once on host
  (zsl/episodes.py); the symbol embedding matrix is refreshed between fusion
  rounds (``update_embed``) as a plain device array;
* Extractor pretraining: episodic margin-ranking, one jitted step
  (zsl_module.py:289-348);
* adversarial training: jitted critic and generator steps with WGAN-GP
  (gradient penalty = ``jax.grad`` through the critic — no double-backward
  machinery needed), hinge class losses against the per-relation centroid
  matrix, and the visual-pivot regularizer as a segment-mean
  (zsl_module.py:350-633);
* the generator is the fusion model's head: only
  {generate_fc_layer, des_rel_map_layer1/2, layer_norm} receive gradients
  (zsl_module.py:356-362), realized here by splitting the parameter pytree;
* evaluation: the batched device program in eval/zero_shot.py.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mre_tpu.data import loaders
from mre_tpu.models.extractor import Discriminator, Extractor
from mre_tpu.eval.zero_shot import (evaluate_zero_shot,
                                    evaluate_zero_shot_rel_shared)
from mre_tpu.zsl.episodes import EpisodeSampler, SymbolTable, build_connections

G_PARAM_KEYS = ("generate_fc_layer", "des_rel_map_layer1",
                "des_rel_map_layer2", "layer_norm")


@dataclasses.dataclass
class ZSLConfig:
    emb_dim: int = 200
    noise_dim: int = 15
    test_sample: int = 20
    max_neighbor: int = 50
    pretrain_margin: float = 3.0
    pretrain_times: int = 10000
    pretrain_batch_size: int = 64
    pretrain_few: int = 8
    pretrain_subepoch: int = 10
    pretrain_loss_every: int = 500
    train_times: int = 1000
    D_epoch: int = 1
    G_epoch: int = 1
    # kept for args.py parity; the reference builds ONE G_batch_size
    # generator and feeds BOTH the D and G loops from it
    # (zsl_module.py:401-409), so D_batch_size is inert upstream and here
    D_batch_size: int = 256
    G_batch_size: int = 256
    gan_batch_rela: int = 2
    lr_D: float = 1e-4
    lr_E: float = 1e-4
    lr_G: float = 1e-4            # args.lr_maximum in the reference
    loss_every: int = 50
    gp_lambda: float = 10.0
    vp_weight: float = 3.0
    seed: int = 0


class ZSLModule:
    def __init__(self, data_path: str, r2id: dict, e2id: dict, cfg: ZSLConfig,
                 fusion_trainer=None):
        self.cfg = cfg
        self.data_path = data_path
        self.r2id, self.e2id = r2id, e2id
        self.fusion = fusion_trainer

        self.train_tasks = loaders.load_tasks(data_path, "train")
        self.test_tasks = loaders.load_tasks(data_path, "test")
        self.rel2candidates = loaders.load_rel2candidates(data_path)
        self.e1rel_e2 = loaders.load_e1rel_e2(data_path)

        self.symbols = SymbolTable(r2id, e2id)
        self.episodes = EpisodeSampler(self.train_tasks, self.rel2candidates,
                                       self.e1rel_e2, self.symbols, seed=cfg.seed)
        self.label_num = self.episodes.label_num

        conns, degs = build_connections(
            [self.train_tasks, self.test_tasks], self.symbols.symbol2id,
            e2id, len(e2id), self.symbols.pad_id, cfg.max_neighbor)
        self.connections = jnp.asarray(conns)
        self.degrees = jnp.asarray(degs)

        key = jax.random.key(cfg.seed)
        k_noise, k_ex, k_d = jax.random.split(key, 3)
        self.test_noises = 0.1 * jax.random.normal(k_noise, (cfg.test_sample, cfg.noise_dim))

        # symbol embedding table (refreshed via update_embed)
        self.symbol_table = jnp.zeros((self.symbols.num_symbols + 1, cfg.emb_dim))

        self.extractor = Extractor(embed_dim=cfg.emb_dim)
        dummy_meta = self._meta(jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32))
        self.ex_params = self.extractor.init(
            {"params": k_ex, "dropout": k_ex}, self.symbol_table,
            jnp.zeros((2, 2), jnp.int32), jnp.zeros((2, 2), jnp.int32),
            dummy_meta, dummy_meta, False)["params"]

        self.discriminator = Discriminator(dim=cfg.emb_dim)
        d_vars = self.discriminator.init(
            {"params": k_d}, jnp.zeros((2, cfg.emb_dim)),
            jnp.zeros((self.label_num, cfg.emb_dim)))
        self.d_params = d_vars["params"]
        self.d_spectral = d_vars.get("spectral", {})

        self.opt_E = optax.adam(cfg.lr_E)
        self.opt_E_state = self.opt_E.init(self.ex_params)
        d_sched = optax.piecewise_constant_schedule(cfg.lr_D, {20000: 0.2})
        self.opt_D = optax.adam(d_sched, b1=0.5, b2=0.9)
        self.opt_D_state = self.opt_D.init(self.d_params)

        self._rng = jax.random.key(cfg.seed + 17)
        self.centroid_matrix = jnp.zeros((self.label_num, cfg.emb_dim))
        self._build_steps()

    # ------------------------------------------------------------------

    def _meta(self, left, right):
        return (self.connections[left], self.degrees[left],
                self.connections[right], self.degrees[right])

    def update_embed(self, ent_embs, rel_embs):
        """Refresh the frozen symbol table from fusion-learner embeddings
        (zsl_module.py:209-237)."""
        table = self.symbols.build_embedding(np.asarray(ent_embs), np.asarray(rel_embs))
        self.symbol_table = jnp.asarray(table)

    def _next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- jitted steps ------------------------------------------------------

    def _build_steps(self):
        cfg = self.cfg
        extractor = self.extractor
        discriminator = self.discriminator

        @jax.jit
        def pretrain_step(ex_params, opt_state, rng, symbols, support, query,
                          false, s_meta, q_meta, f_meta, q_mask):
            k1, k2 = jax.random.split(rng)

            def loss_fn(p):
                _, q_scores = extractor.apply(
                    {"params": p}, symbols, query, support, q_meta, s_meta,
                    False, rngs={"dropout": k1})
                _, f_scores = extractor.apply(
                    {"params": p}, symbols, false, support, f_meta, s_meta,
                    False, rngs={"dropout": k2})
                margin_ = q_scores - f_scores
                hinge = jax.nn.relu(cfg.pretrain_margin - margin_)
                return jnp.sum(hinge * q_mask) / jnp.maximum(jnp.sum(q_mask), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(ex_params)
            updates, opt_state = self.opt_E.update(grads, opt_state, ex_params)
            return optax.apply_updates(ex_params, updates), opt_state, loss

        self._pretrain_step = pretrain_step

        @jax.jit
        def centroid_step(ex_params, symbols, query, meta, mask):
            q_g, _ = extractor.apply({"params": ex_params}, symbols, query,
                                     query, meta, meta, True)
            w = mask.astype(jnp.float32)[:, None]
            return jnp.sum(q_g * w, 0) / jnp.maximum(jnp.sum(w), 1.0)

        self._centroid_step = centroid_step

        def d_forward(d_params, d_spectral, x, centroid, update_sn):
            (middle, logit, cls), new_vars = discriminator.apply(
                {"params": d_params, "spectral": d_spectral}, x, centroid,
                update_sn, mutable=["spectral"])
            return (middle, logit, cls), new_vars["spectral"]

        @jax.jit
        def d_step(d_params, d_spectral, opt_state, rng, ex_params, symbols,
                   centroid, fake, query, q_meta, false, f_meta, labels, mask):
            k_drop1, k_drop2, k_alpha = jax.random.split(rng, 3)
            real, _ = extractor.apply({"params": ex_params}, symbols, query,
                                      query, q_meta, q_meta, False,
                                      rngs={"dropout": k_drop1})
            neg, _ = extractor.apply({"params": ex_params}, symbols, false,
                                     false, f_meta, f_meta, False,
                                     rngs={"dropout": k_drop2})
            real = jax.lax.stop_gradient(real)
            neg = jax.lax.stop_gradient(neg)
            fake = jax.lax.stop_gradient(fake)
            w = mask.astype(jnp.float32)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            B = query.shape[0]

            def loss_fn(p):
                (_, real_logit, real_cls), spec1 = d_forward(p, d_spectral, real, centroid, True)
                (_, fake_logit, fake_cls), _ = d_forward(p, spec1, fake, centroid, False)
                (_, _, neg_cls), _ = d_forward(p, spec1, neg, centroid, False)

                loss_real = -jnp.sum(real_logit[:, 0] * w) / wsum
                loss_fake = jnp.sum(fake_logit[:, 0] * w) / wsum

                idx = jnp.arange(B)
                real_s = real_cls[idx, labels]
                fake_s = fake_cls[idx, labels]
                neg_s = neg_cls[idx, labels]
                loss_real_cls = jnp.sum(jax.nn.relu(cfg.pretrain_margin - (real_s - neg_s)) * w) / wsum
                loss_fake_cls = jnp.sum(jax.nn.relu(cfg.pretrain_margin - (fake_s - neg_s)) * w) / wsum

                # WGAN-GP (module/utils.py:692-707): penalty on interpolates
                alpha = jax.random.uniform(k_alpha, (B, 1))
                inter = alpha * real + (1 - alpha) * fake

                def critic_sum(z):
                    (_, logit, _), _ = d_forward(p, spec1, z, centroid, False)
                    return jnp.sum(logit)

                grads_inter = jax.grad(critic_sum)(inter)
                gp = jnp.sum(((jnp.linalg.norm(grads_inter, axis=1) - 1.0) ** 2) * w) / wsum * cfg.gp_lambda

                total = loss_real + loss_fake + 0.5 * loss_real_cls + 0.5 * loss_fake_cls + gp
                info = dict(loss_D=total, D_real=loss_real, D_fake=loss_fake,
                            D_real_class=loss_real_cls, D_fake_class=loss_fake_cls, gp=gp)
                return total, (info, spec1)

            (_, (info, d_spectral)), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
            updates, opt_state = self.opt_D.update(grads, opt_state, d_params)
            return optax.apply_updates(d_params, updates), d_spectral, opt_state, info

        self._d_step = d_step

    # -- Extractor pretraining (zsl_module.py:289-348) ----------------------

    def _padded_episode(self):
        cfg = self.cfg
        S = cfg.pretrain_few * cfg.pretrain_subepoch
        Q = cfg.pretrain_batch_size * cfg.pretrain_subepoch
        (support, query, false, s_l, s_r, q_l, q_r, f_l, f_r) = \
            self.episodes.extractor_episode(cfg.pretrain_batch_size,
                                            cfg.pretrain_few, cfg.pretrain_subepoch)

        def pad_rows(a, n, cols=None):
            shape = (n,) if cols is None else (n, cols)
            a = np.asarray(a, np.int64).reshape((-1,) if cols is None else (-1, cols))
            if len(a) == 0:
                return np.zeros(shape, np.int64)
            reps = np.repeat(a[-1:], n - len(a), axis=0) if len(a) < n else a[:0]
            return np.concatenate([a[:n], reps])

        q_mask = np.zeros(Q, np.float32)
        q_mask[:min(len(query), Q)] = 1.0
        return (pad_rows(support, S, 2), pad_rows(query, Q, 2), pad_rows(false, Q, 2),
                pad_rows(s_l, S), pad_rows(s_r, S), pad_rows(q_l, Q),
                pad_rows(q_r, Q), pad_rows(f_l, Q), pad_rows(f_r, Q), q_mask)

    def pretrain_extractor(self, steps: int | None = None, log_every: int | None = None):
        cfg = self.cfg
        steps = steps or cfg.pretrain_times
        log_every = log_every or cfg.pretrain_loss_every
        losses = []
        for i in range(steps):
            (support, query, false, s_l, s_r, q_l, q_r, f_l, f_r, q_mask) = self._padded_episode()
            self.ex_params, self.opt_E_state, loss = self._pretrain_step(
                self.ex_params, self.opt_E_state, self._next_key(),
                self.symbol_table,
                jnp.asarray(support), jnp.asarray(query), jnp.asarray(false),
                self._meta(jnp.asarray(s_l), jnp.asarray(s_r)),
                self._meta(jnp.asarray(q_l), jnp.asarray(q_r)),
                self._meta(jnp.asarray(f_l), jnp.asarray(f_r)),
                jnp.asarray(q_mask))
            # device scalar — a float() here would block the host on a relay
            # round trip every step (see train_gan); fetch per log window
            losses.append(loss)
            if (i + 1) % log_every == 0:
                w = jax.device_get(losses[-log_every:])
                print(f"Step: {i + 1}, Extractor pretraining loss: {np.mean(w):.3f}")
        if not losses:
            return 0.0
        return float(np.mean(jax.device_get(losses[-min(len(losses), 100):])))

    # -- centroid matrix (zsl_module.py:371-383) -----------------------------

    def compute_centroids(self, pad_to: int = 256):
        rows = []
        for rel in self.train_tasks:
            query, left, right, label = self.episodes.centroid_batch(rel)
            n = len(query)
            P = max(pad_to, 1)
            # chunk over ALL of the relation's triples (the reference
            # averages query_ep over every row, zsl_module.py:371-383) —
            # truncating to one pad_to window would bias the centroid for
            # relations with > pad_to training triples. Chunk means are
            # count-weighted into the exact full mean.
            acc = np.zeros(self.cfg.emb_dim, np.float64)
            tot = 0
            for off in range(0, max(n, 1), P):
                q, l, r = query[off:off + P], left[off:off + P], right[off:off + P]
                k = len(q)
                pad = P - k
                q = np.pad(q, ((0, pad), (0, 0)))
                l = np.pad(l, (0, pad))
                r = np.pad(r, (0, pad))
                mask = np.zeros(P, bool)
                mask[:k] = True
                c = self._centroid_step(self.ex_params, self.symbol_table,
                                        jnp.asarray(q),
                                        self._meta(jnp.asarray(l), jnp.asarray(r)),
                                        jnp.asarray(mask))
                acc += np.asarray(c, np.float64) * k
                tot += k
            rows.append((label, (acc / max(tot, 1)).astype(np.float32)))
        centroid = np.zeros((self.label_num, self.cfg.emb_dim), np.float32)
        for label, c in rows:
            centroid[label] = c
        self.centroid_matrix = jnp.asarray(centroid)
        return self.centroid_matrix

    # -- adversarial training (zsl_module.py:350-633) ------------------------

    def _padded_gan_batch(self):
        cfg = self.cfg
        Q = cfg.gan_batch_rela * cfg.G_batch_size
        rel_ids, query, q_l, q_r, false, f_l, f_r, labels = \
            self.episodes.gan_batch(cfg.G_batch_size, cfg.gan_batch_rela, self.r2id)

        def pad(a, cols=None):
            shape = (Q,) if cols is None else (Q, cols)
            a = np.asarray(a, np.int64).reshape((-1,) if cols is None else (-1, cols))
            if len(a) >= Q:
                return a[:Q]
            if len(a) == 0:
                return np.zeros(shape, np.int64)
            return np.concatenate([a, np.repeat(a[-1:], Q - len(a), axis=0)])

        mask = np.zeros(Q, bool)
        mask[:min(len(labels), Q)] = True
        return (pad(rel_ids), pad(query, 2), pad(q_l), pad(q_r), pad(false, 2),
                pad(f_l), pad(f_r), pad(labels), mask)

    def train_gan(self, fusion_trainer, train_times: int | None = None,
                  log_every: int | None = None, pretrain_steps: int | None = None,
                  skip_pretrain: bool = False):
        """Full adversarial loop: pretrain Extractor, compute centroids, then
        alternate D/G steps; finally refresh fusion params with the trained
        generator head."""
        cfg = self.cfg
        train_times = train_times or cfg.train_times
        log_every = log_every or cfg.loss_every
        if not skip_pretrain:
            self.pretrain_extractor(steps=pretrain_steps)
        self.compute_centroids()

        run_g, g_params, g_opt_state = self._make_g_step(fusion_trainer)

        # histories stay DEVICE-resident inside the loop: even one
        # device_get per step blocks the host until that step finishes,
        # serializing dispatch behind a relay round trip (the same pattern
        # fusion.train_epoch avoids by accumulating on device). Transfers
        # happen once per log window and once at the end.
        d_hist, g_hist = [], []
        for epoch in range(train_times):
            for _ in range(cfg.D_epoch):
                batch = self._padded_gan_batch()
                d_hist.append(self._run_d_step(fusion_trainer, g_params, batch))
            for _ in range(cfg.G_epoch):
                batch = self._padded_gan_batch()
                g_params, g_opt_state, info_g = run_g(g_params, g_opt_state, batch)
                g_hist.append(info_g)
            if log_every and (epoch + 1) % log_every == 0:
                dw, gw = jax.device_get((
                    [h["loss_D"] for h in d_hist[-log_every:]],
                    [h["loss_G"] for h in g_hist[-log_every:]]))
                print(f"Epoch: {epoch + 1}, D_loss: {np.mean(dw):.2f}, "
                      f"G_loss: {np.mean(gw):.2f}")

        # write trained generator head back into the fusion params
        fusion_trainer.params = self._merge_g(fusion_trainer.params, g_params)
        # one bulk fetch materializes the histories host-side
        return tuple([{k: float(v) for k, v in h.items()} for h in hist]
                     for hist in jax.device_get((d_hist, g_hist)))

    # -- generator-side plumbing --------------------------------------------

    @staticmethod
    def _split_g(params):
        g = {k: params[k] for k in G_PARAM_KEYS}
        rest = {k: v for k, v in params.items() if k not in G_PARAM_KEYS}
        return g, rest

    @staticmethod
    def _merge_g(params, g_params):
        out = dict(params)
        out.update(g_params)
        return out

    def _generate(self, fusion_trainer, params, rel_ids, noise, update_sn=False):
        store = fusion_trainer.store
        rel_tok = jnp.asarray(store.rel_ids[np.asarray(rel_ids)])
        rel_mask = jnp.asarray(store.rel_mask[np.asarray(rel_ids)])
        if not update_sn:
            # pure path (D steps, eval): one cached jitted program on the
            # fusion trainer — the eager apply ran the full M3AE text
            # transformer op-by-op once per discriminator step
            return fusion_trainer._generate_jit(params, fusion_trainer.spectral,
                                                rel_tok, rel_mask, noise)
        model = fusion_trainer.model
        out, new_vars = model.apply(
            {"params": params, "spectral": fusion_trainer.spectral},
            rel_tok, rel_mask, noise, update_sn,
            method=model.generate, mutable=["spectral"])
        fusion_trainer.spectral = new_vars["spectral"]
        return out

    def _run_d_step(self, fusion_trainer, g_params, batch):
        cfg = self.cfg
        rel_ids, query, q_l, q_r, false, f_l, f_r, labels, mask = batch
        noise = jax.random.normal(self._next_key(), (len(query), cfg.noise_dim))
        params = self._merge_g(fusion_trainer.params, g_params)
        fake = self._generate(fusion_trainer, params, rel_ids, noise, update_sn=False)
        self.d_params, self.d_spectral, self.opt_D_state, info = self._d_step(
            self.d_params, self.d_spectral, self.opt_D_state, self._next_key(),
            self.ex_params, self.symbol_table, self.centroid_matrix,
            fake, jnp.asarray(query),
            self._meta(jnp.asarray(q_l), jnp.asarray(q_r)),
            jnp.asarray(false), self._meta(jnp.asarray(f_l), jnp.asarray(f_r)),
            jnp.asarray(labels), jnp.asarray(mask))
        return info

    def _make_g_step(self, fusion_trainer):
        cfg = self.cfg
        model = fusion_trainer.model
        store = fusion_trainer.store
        discriminator = self.discriminator
        g_sched = optax.piecewise_constant_schedule(cfg.lr_G, {4000: 0.2})
        opt_G = optax.adam(g_sched, b1=0.5, b2=0.9)
        g_params, _ = self._split_g(fusion_trainer.params)
        g_opt_state = opt_G.init(g_params)

        @jax.jit
        def g_step(g_params, rest_params, spectral, g_opt_state, rng,
                   d_params, d_spectral, ex_params, symbols, centroid,
                   rel_tokens, rel_pad, query, q_meta, false, f_meta,
                   labels, mask):
            k_noise, k_drop = jax.random.split(rng)
            noise = jax.random.normal(k_noise, (query.shape[0], cfg.noise_dim))
            w = mask.astype(jnp.float32)
            wsum = jnp.maximum(jnp.sum(w), 1.0)
            B = query.shape[0]

            # negative entity pairs for the class margin (zsl_module.py:536-557)
            neg, _ = self.extractor.apply(
                {"params": ex_params}, symbols, false, false, f_meta, f_meta,
                False, rngs={"dropout": k_drop})
            neg = jax.lax.stop_gradient(neg)

            def loss_fn(gp):
                params = self._merge_g(rest_params, gp)
                sample, new_vars = model.apply(
                    {"params": params, "spectral": spectral},
                    rel_tokens, rel_pad, noise, True,
                    method=model.generate, mutable=["spectral"])
                (_, g_logit, g_cls), _vars1 = discriminator.apply(
                    {"params": d_params, "spectral": d_spectral},
                    sample, centroid, False, mutable=["spectral"])
                (_, _, neg_cls), _vars2 = discriminator.apply(
                    {"params": d_params, "spectral": d_spectral},
                    neg, centroid, False, mutable=["spectral"])

                loss_fake = -jnp.sum(g_logit[:, 0] * w) / wsum
                idx = jnp.arange(B)
                g_s = g_cls[idx, labels]
                neg_s = neg_cls[idx, labels]
                loss_cls = jnp.sum(jax.nn.relu(cfg.pretrain_margin - (g_s - neg_s)) * w) / wsum

                # visual pivot: per-label mean of generated samples vs centroid
                seg = jnp.where(mask, labels, self.label_num)
                sums = jax.ops.segment_sum(sample * w[:, None], seg,
                                           num_segments=self.label_num + 1)
                cnts = jax.ops.segment_sum(w, seg, num_segments=self.label_num + 1)
                means = sums[:self.label_num] / jnp.maximum(cnts[:self.label_num, None], 1.0)
                present = cnts[:self.label_num] > 0
                dist = jnp.sqrt(jnp.maximum(
                    jnp.sum((means - centroid) ** 2, axis=1), 1e-12))
                loss_vp = jnp.sum(jnp.where(present, dist, 0.0)) / cfg.gan_batch_rela

                total = loss_fake + loss_cls + cfg.vp_weight * loss_vp
                info = dict(loss_G=total, G_fake=loss_fake, G_class=loss_cls,
                            G_VP=loss_vp)
                return total, (info, new_vars["spectral"])

            (_, (info, new_spectral)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(g_params)
            updates, g_opt_state = opt_G.update(grads, g_opt_state, g_params)
            return optax.apply_updates(g_params, updates), new_spectral, g_opt_state, info

        def run(g_params, g_opt_state, batch):
            rel_ids, query, q_l, q_r, false, f_l, f_r, labels, mask = batch
            _, rest = self._split_g(fusion_trainer.params)
            g_params, new_spectral, g_opt_state, info = g_step(
                g_params, rest, fusion_trainer.spectral, g_opt_state,
                self._next_key(), self.d_params, self.d_spectral,
                self.ex_params, self.symbol_table, self.centroid_matrix,
                jnp.asarray(store.rel_ids[np.asarray(rel_ids)]),
                jnp.asarray(store.rel_mask[np.asarray(rel_ids)]),
                jnp.asarray(query),
                self._meta(jnp.asarray(q_l), jnp.asarray(q_r)),
                jnp.asarray(false),
                self._meta(jnp.asarray(f_l), jnp.asarray(f_r)),
                jnp.asarray(labels), jnp.asarray(mask))
            fusion_trainer.spectral = new_spectral
            return g_params, g_opt_state, info

        return run, g_params, g_opt_state

    # -- analysis helper (zsl_module.py:757-790) ------------------------------

    def generate_entity_pair_emb(self, relations):
        """Per-relation Extractor embeddings of each test triple's entity
        pair — the reference's embedding-space inspection helper (never
        called by main.py; provided for API parity). Returns
        (list of [n_i, D] arrays, flat relation labels, []).

        Reference quirk kept: query_right uses tri[0] (the HEAD) for both
        sides (zsl_module.py:776-777), so the neighbor meta is head-sided
        twice — reproduced verbatim."""
        s2 = self.symbols.symbol2id
        out_embs, out_rels = [], []
        for rel in relations:
            triples = self.test_tasks.get(rel, [])
            if not triples:
                continue
            pairs = np.asarray([[s2[t[0]], s2[t[2]]] for t in triples], np.int32)
            left = jnp.asarray([self.e2id[t[0]] for t in triples], jnp.int32)
            right = jnp.asarray([self.e2id[t[0]] for t in triples], jnp.int32)
            meta = self._meta(left, right)
            emb, _ = self.extractor.apply(
                {"params": self.ex_params}, self.symbol_table,
                jnp.asarray(pairs), jnp.asarray(pairs), meta, meta, True)
            out_embs.append(np.asarray(emb))
            out_rels += [rel] * len(triples)
        return out_embs, out_rels, []

    # -- persistence (zsl_module.py:205-207, 751-755) -------------------------

    def save(self, save_path: str, fusion_trainer=None):
        """Write Extractor/Discriminator (and the generator head, i.e. the
        fusion params) under ``save_path`` like the reference's Embed_used."""
        from mre_tpu.core import checkpoint as ckpt

        ckpt.save_checkpoint(f"{save_path}/Extractor", self.ex_params)
        ckpt.save_checkpoint(f"{save_path}/Discriminator",
                             {"params": self.d_params, "spectral": self.d_spectral})
        if fusion_trainer is not None:
            ckpt.save_checkpoint(f"{save_path}/Generator", fusion_trainer.params)

    def load(self, save_path: str, fusion_trainer=None):
        from mre_tpu.core import checkpoint as ckpt
        import os

        self.ex_params = ckpt.load_checkpoint(f"{save_path}/Extractor", self.ex_params)
        d = ckpt.load_checkpoint(f"{save_path}/Discriminator",
                                 {"params": self.d_params, "spectral": self.d_spectral})
        self.d_params, self.d_spectral = d["params"], d["spectral"]
        gen_path = f"{save_path}/Generator"
        if fusion_trainer is not None and os.path.exists(gen_path):
            fusion_trainer.params = ckpt.load_checkpoint(gen_path, fusion_trainer.params)

    # -- evaluation (zsl_module.py:635-745) ----------------------------------

    def evaluate(self, fusion_trainer, mode: str = "test", verbose: bool = True,
                 query_chunk: int = 64, predict_unseen=None,
                 compute_dtype: str = "float32", eval_path: str = "head_shared",
                 return_ranks: bool = False, mesh=None):
        """Zero-shot ranking. ``predict_unseen`` (optional) routes unseen
        relation vectors through the DistillModel predictor
        (generate_rel_embed(..., rel_type='unseen'), module/utils.py:529-546
        + DistillModel.py) instead of the WGAN generator head.

        ``compute_dtype='bfloat16'`` runs the ranking hot path (factored
        L/R tables + SupportEncoder) in bf16 — the MXU's native dtype,
        halving the gather bytes; pair embeddings are cast back to f32
        before cosine normalization and ranking. ``eval_path`` selects the
        ranking body: 'rel_shared' (fastest — the candidate gather + first
        SupportEncoder matmul amortize over each relation's shared
        rel2candidates list), 'head_shared' (one head gather per query), or
        'factored' (per-pair gathers; the f32 reference path the bench
        certifies against). ``mesh`` (rel_shared only) ranks the query
        stream data-parallel over the mesh's 'data' axis — identical ranks,
        N-chip scale-out."""
        if mesh is not None and eval_path != "rel_shared":
            raise ValueError("mesh-sharded evaluation is supported for "
                             "eval_path='rel_shared' only")
        test_candidates = loaders.load_candidates(self.data_path, mode)

        # precompute per-entity neighbor encodings and the factored pair
        # tables once — the ranking hot path then costs one table add + the
        # SupportEncoder per pair (extractor.precompute_pair_tables)
        ent_sym = np.full(self.connections.shape[0], self.symbols.pad_id, np.int32)
        for name in self.symbols.ent_names:
            ent_sym[self.e2id[name]] = self.symbols.symbol2id[name]

        # Params, tables, and connections enter every eval jit as ARGUMENTS
        # (never closure constants): each fusion round evaluates with fresh
        # weights, and constants baked into the program would force a full
        # retrace + recompile per round — minutes through the remote-compile
        # tunnel (same anti-pattern ranking.link_prediction documents).
        if not hasattr(self, "_tables_jit"):
            extractor = self.extractor

            @jax.jit
            def _tables_jit(p, symbols, conns, degs, ent_sym):
                nbr = extractor.apply({"params": p}, symbols, conns, degs,
                                      method=extractor.encode_neighbors)
                return extractor.apply({"params": p}, symbols, nbr, ent_sym,
                                       method=extractor.precompute_pair_tables)

            self._tables_jit = _tables_jit
        L, R = self._tables_jit(self.ex_params, self.symbol_table,
                                self.connections, self.degrees,
                                jnp.asarray(ent_sym))
        cdt = jnp.dtype(compute_dtype)
        if cdt != jnp.float32:
            L, R = L.astype(cdt), R.astype(cdt)
            ex_params_eval = jax.tree_util.tree_map(lambda x: x.astype(cdt),
                                                    self.ex_params)
        else:
            ex_params_eval = self.ex_params
        embed_args = (ex_params_eval, L, R)
        extractor = self.extractor

        def embed(ea, pairs, left, right):
            p, L_, R_ = ea
            emb = extractor.apply({"params": p}, L_, R_, left, right,
                                  method=extractor.embed_pairs_factored)
            return emb.astype(jnp.float32)

        def embed_block(ea, heads, cands):
            # one head gather + distributed first matmul per query block
            p, L_, R_ = ea
            emb = extractor.apply({"params": p}, L_, R_, heads, cands,
                                  method=extractor.embed_pairs_head_shared)
            return emb.astype(jnp.float32)

        if predict_unseen is not None:
            def gen_rel_vecs(rel_name):
                return np.asarray(predict_unseen([self.r2id[rel_name]]))
        else:
            def gen_rel_vecs(rel_name):
                rel_id = self.r2id[rel_name]
                rel_ids = np.full(self.cfg.test_sample, rel_id)
                return self._generate(fusion_trainer, fusion_trainer.params,
                                      rel_ids, self.test_noises)

        if eval_path == "rel_shared":
            def embed_rel_block(ea, heads, shared):
                p, L_, R_ = ea
                emb = extractor.apply({"params": p}, L_, R_, heads, shared,
                                      method=extractor.embed_pairs_rel_shared)
                return emb.astype(jnp.float32)

            def embed_true(ea, heads, trues):
                p, L_, R_ = ea
                emb = extractor.apply({"params": p}, L_, R_, heads, trues,
                                      method=extractor.embed_pairs_factored)
                return emb.astype(jnp.float32)

            return evaluate_zero_shot_rel_shared(
                test_candidates, self.e2id, embed_rel_block, embed_true,
                gen_rel_vecs, query_chunk=query_chunk, verbose=verbose,
                return_ranks=return_ranks, mesh=mesh, embed_args=embed_args)

        return evaluate_zero_shot(
            test_candidates, self.symbols.symbol2id, self.e2id, self.r2id,
            embed, gen_rel_vecs, query_chunk=query_chunk, verbose=verbose,
            embed_query_block=embed_block if eval_path == "head_shared" else None,
            return_ranks=return_ranks, embed_args=embed_args)
