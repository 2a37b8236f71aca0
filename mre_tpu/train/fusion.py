"""Joint fusion training — the reference's main() loop, TPU-native.

One jitted step fuses what the reference does across five host hops
(main.py:126-155 + module/NegativeSampling.py:204-292):

  M3AE representation → RGCN over the sampled subgraph → relation-description
  encoding → subgraph-local filtered negative sampling (on device) → TransE
  margin loss + masked image MSE + masked text CE + contrastive → adam with
  cosine-warm-restart schedule.

Host work per step is only: neighbor-sample indices + image decode
(data/graph_sampler.py, data/multimodal.py); text is pre-tokenized.

Faithfulness notes:
* the reference computes a regularized ``struct_loss`` for logging but trains
  on the un-regularized gcn loss (main vs NegativeSampling.py:224-276) — we
  keep that default and expose ``regul_in_loss`` to repair it;
* negatives are drawn from the *local* subgraph node list and filtered
  against the global true set (NegativeSampling.py:321-375), here via
  ops.sampling.corrupt_within_nodes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mre_tpu.core.config import Config
from mre_tpu.data.graph_sampler import NeighborSampler, edges_from_tasks
from mre_tpu.data.kg import DeviceKG, TripleTable
from mre_tpu.data.multimodal import MultimodalStore
from mre_tpu.models.unified import UnifiedModel, unified_config
from mre_tpu.ops import losses as L
from mre_tpu.ops import sampling
from mre_tpu.ops.patches import extract_patches


def cosine_warm_restarts(lr_max: float, lr_min: float, t0: int, t_mult: int = 2,
                         total_steps: int = 1_000_000):
    """optax schedule equivalent of torch CosineAnnealingWarmRestarts
    (main.py:105-110)."""
    schedules, boundaries = [], []
    t, start = t0, 0
    while start < total_steps:
        schedules.append(optax.cosine_decay_schedule(
            init_value=lr_max, decay_steps=max(t, 1), alpha=lr_min / max(lr_max, 1e-12)))
        start += t
        boundaries.append(start)
        t *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


@dataclasses.dataclass
class FusionConfig:
    model_type: str = "small"
    emb_dim: int = 200
    noise_dim: int = 15
    patch_size: int = 16
    image_mask_ratio: float = 0.75
    text_mask_ratio: float = 0.75
    batch_size: int = 12          # seed nodes per step
    sample_size: int = 4          # sampled incident edges per seed
    neg_ent: int = 10
    margin: float = 3.0
    regul_rate: float = 0.5
    regul_in_loss: bool = False
    image_loss_weight: float = 0.7
    text_loss_weight: float = 0.5
    gcn_loss_weight: float = 0.7
    contrastive_loss_weight: float = 0.5
    image_all_token_loss: bool = False
    text_all_token_loss: bool = False
    lr_maximum: float = 1e-4
    lr_minimum: float = 0.0
    lr_warmup_epochs: int = 5
    # enters the warm-restart period like the reference (main.py:107:
    # T_0 = lr_warmup_epochs * steps_per_epoch // accumulate_grad_steps)
    accumulate_grad_steps: int = 1
    epochs: int = 200
    seed: int = 192
    text_only: bool = False
    compute_dtype: str = "float32"   # M3AE matmul dtype ("bfloat16" → MXU)
    image_cache: bool = False        # pre-decode images once (single-core hosts)


class FusionTrainer:
    def __init__(self, table: TripleTable, store: MultimodalStore,
                 cfg: FusionConfig, mesh=None):
        self.table = table
        self.store = store
        self.cfg = cfg
        self.mesh = mesh
        self.kg = DeviceKG.from_table(table)
        if cfg.image_cache and not cfg.text_only:
            secs = store.precompute_image_cache()
            print(f"[fusion] image cache: {store.num_nodes} entities "
                  f"pre-decoded in {secs:.1f}s", flush=True)

        self.model = UnifiedModel(
            text_vocab_size=store.vocab_size,
            num_relations=table.n_relations,
            config=unified_config(cfg.model_type, dict(
                emb_dim=cfg.emb_dim, noise_dim=cfg.noise_dim,
                patch_size=cfg.patch_size,
                image_mask_ratio=cfg.image_mask_ratio,
                text_mask_ratio=cfg.text_mask_ratio,
                compute_dtype=cfg.compute_dtype,
                contrastive=cfg.contrastive_loss_weight > 0 and not cfg.text_only)))

        edge_index, edge_type = edges_from_tasks(table.triples)
        self.sampler = NeighborSampler(edge_index, edge_type, table.n_entities,
                                       size=cfg.sample_size, batch_size=cfg.batch_size,
                                       seed=cfg.seed)
        self.steps_per_epoch = len(self.sampler)

        variables = self._init_variables()
        self.params = variables["params"]
        self.spectral = variables.get("spectral", {})

        schedule = cosine_warm_restarts(
            cfg.lr_maximum, cfg.lr_minimum,
            t0=max(cfg.lr_warmup_epochs * self.steps_per_epoch
                   // max(cfg.accumulate_grad_steps, 1), 1),
            total_steps=cfg.epochs * self.steps_per_epoch + 1)
        self.tx = optax.adam(schedule)
        self.opt_state = self.tx.init(self.params)
        self._rng = jax.random.key(cfg.seed)
        self._step_fn = self._build_step()

    # ------------------------------------------------------------------

    def _dummy_batch(self):
        cfg = self.cfg
        n, e = self.sampler.n_max, self.sampler.e_max
        s = self.store
        img_size = s.config.image_size
        batch = {
            "text": jnp.zeros((n, s.config.tokenizer_max_length), jnp.int32),
            "text_padding_mask": jnp.zeros((n, s.config.tokenizer_max_length), jnp.float32),
            "rel_des": jnp.zeros((e, s.config.unpaired_tokenizer_max_length), jnp.int32),
            "rel_des_padding_mask": jnp.zeros((e, s.config.unpaired_tokenizer_max_length), jnp.float32),
        }
        if not cfg.text_only:
            batch["image_patches"] = jnp.zeros(
                (n, (img_size // cfg.patch_size) ** 2, cfg.patch_size ** 2 * 3), jnp.float32)
        edge_index = jnp.zeros((2, e), jnp.int32)
        edge_type = jnp.zeros((e,), jnp.int32)
        return edge_index, edge_type, batch

    def _init_variables(self):
        edge_index, edge_type, batch = self._dummy_batch()
        noise = jnp.zeros((edge_type.shape[0], self.cfg.noise_dim))
        # jit the init: un-jitted flax init executes op-by-op, which is very
        # slow through a remote-compile TPU tunnel.
        init = jax.jit(functools.partial(self.model.init, method=self.model.init_all))
        return init(
            {"params": jax.random.key(self.cfg.seed), "masking": jax.random.key(1)},
            edge_index, edge_type, batch, noise)

    # ------------------------------------------------------------------

    def _build_step(self):
        cfg = self.cfg
        model = self.model
        kg = self.kg

        def loss_fn(params, spectral, rng, device_batch):
            k_mask, k_drop, k_neg = jax.random.split(rng, 3)
            model_batch = {
                "text": device_batch["text"],
                "text_padding_mask": device_batch["text_padding_mask"],
                "rel_des": device_batch["rel_des"],
                "rel_des_padding_mask": device_batch["rel_des_padding_mask"],
                "image_patches": device_batch.get("image_patches"),
            }
            edge_index = device_batch["edge_index"]
            edge_type = device_batch["edge_type"]
            edge_mask = device_batch["edge_mask"]
            node_mask = device_batch["node_mask"]
            n_id = device_batch["n_id"]

            (x_gcn, rel_emb, out), new_vars = model.apply(
                {"params": params, "spectral": spectral},
                edge_index, edge_type, model_batch, False,
                edge_mask=edge_mask, update_sn=True, node_mask=node_mask,
                mutable=["spectral"],
                rngs={"masking": k_mask, "dropout": k_drop})

            h_l, t_l = edge_index[0], edge_index[1]
            neg_h, neg_t, neg_failed = sampling.corrupt_within_nodes(
                k_neg, kg, n_id, h_l, edge_type, t_l, cfg.neg_ent)

            def transe(hh, rr, tt):
                return jnp.sum(jnp.abs(hh + rr - tt), -1)

            pos = transe(x_gcn[h_l], rel_emb, x_gcn[t_l])                       # [E]
            neg = transe(x_gcn[neg_h], rel_emb[:, None, :], x_gcn[neg_t])       # [E, n_neg]
            diff = jnp.maximum(pos[:, None] - neg, -cfg.margin)
            w = edge_mask.astype(jnp.float32)
            gcn_loss = jnp.sum(diff * w[:, None]) / jnp.maximum(jnp.sum(w) * cfg.neg_ent, 1.0) + cfg.margin

            # padded rows (graph_sampler repeats a real node to n_max/e_max)
            # must not enter any loss mean: reconstruction losses would count
            # one entity many times and the regularizer would over-weight
            # padded edges' rows. Reference trains on the exact unpadded
            # subgraph (main.py:126-155).
            nm = node_mask.astype(jnp.float32)

            def wmean_sq(x, mask_w):
                return (jnp.sum(jnp.sum(x * x, -1) * mask_w)
                        / jnp.maximum(mask_w.sum() * x.shape[-1], 1.0))

            regul = (wmean_sq(x_gcn[h_l], w) + wmean_sq(x_gcn[t_l], w)
                     + wmean_sq(rel_emb, w)) / 3
            struct_loss = gcn_loss + cfg.regul_rate * regul

            image = model_batch.get("image_patches")
            if image is not None:
                img_valid = (jnp.broadcast_to(nm[:, None], out["image_mask"].shape)
                             if cfg.image_all_token_loss
                             else out["image_mask"] * nm[:, None])
                image_loss = L.patch_mse_loss(out["image_output"], image, img_valid)
            else:
                image_loss = 0.0
            text_valid = L.mask_intersection(
                jnp.ones_like(out["text_mask"]) if cfg.text_all_token_loss else out["text_mask"],
                L.mask_not(model_batch["text_padding_mask"])) * nm[:, None]
            text_loss, text_acc = L.cross_entropy_loss_and_accuracy(
                out["text_output"], model_batch["text"], text_valid)

            total = (cfg.image_loss_weight * image_loss
                     + cfg.text_loss_weight * text_loss
                     + cfg.gcn_loss_weight * (struct_loss if cfg.regul_in_loss else gcn_loss)
                     + cfg.contrastive_loss_weight * out["contrastive_loss"])
            # fraction of REAL edges whose rejection sampling exhausted all
            # rounds (those negatives silently equal the positive — must be
            # observable, round-3 verdict; ~0 at reference sparsity)
            neg_fail_frac = (jnp.sum(neg_failed * w[:, None])
                             / jnp.maximum(jnp.sum(w) * cfg.neg_ent, 1.0))
            info = dict(loss=total, gcn_loss=gcn_loss, struct_loss=struct_loss,
                        image_loss=image_loss, text_loss=text_loss,
                        contrastive_loss=out["contrastive_loss"], text_accuracy=text_acc,
                        neg_fail_frac=neg_fail_frac)
            return total, (info, new_vars["spectral"])

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, spectral, opt_state, rng, device_batch):
            rng, sub = jax.random.split(rng)
            (_, (info, spectral)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, spectral, sub, device_batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, spectral, opt_state, rng, info

        return step

    # ------------------------------------------------------------------

    def prepare_device_batch(self, graph_batch: dict) -> dict:
        """Assemble the device batch from a sampled subgraph: decode images,
        gather pre-tokenized text, patch-extract on host numpy once."""
        cfg = self.cfg
        n_id = graph_batch["n_id"]
        mm = self.store.generate_batch(n_id, graph_batch["edge_type"], train=True)
        device_batch = {
            "n_id": jnp.asarray(n_id),
            "node_mask": jnp.asarray(graph_batch["node_mask"]),
            "edge_index": jnp.asarray(graph_batch["edge_index"]),
            "edge_type": jnp.asarray(graph_batch["edge_type"]),
            "edge_mask": jnp.asarray(graph_batch["edge_mask"]),
            "text": jnp.asarray(mm["text"]),
            "text_padding_mask": jnp.asarray(mm["text_padding_mask"]),
            "rel_des": jnp.asarray(mm["rel_des"]),
            "rel_des_padding_mask": jnp.asarray(mm["rel_des_padding_mask"]),
        }
        if "image" in mm:
            # patch extraction is a pure reshape — do it host-side in numpy
            # (one device transfer; a jnp round-trip here costs seconds on
            # relay-attached TPUs)
            device_batch["image_patches"] = jnp.asarray(
                extract_patches(mm["image"], cfg.patch_size))
        if self.mesh is not None and self.mesh.size > 1:
            device_batch = self._shard_batch(device_batch)
        return device_batch

    def _shard_batch(self, device_batch: dict) -> dict:
        """Shard batch leading axes over the mesh's data axis (node axis for
        per-node arrays, edge axis for per-edge arrays); XLA inserts the
        collectives for the cross-shard segment sums."""
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from mre_tpu.parallel import mesh as pmesh

        n = self.mesh.shape[pmesh.DATA_AXIS]
        out = {}
        for k, v in device_batch.items():
            if k == "edge_index" and v.shape[1] % n == 0:
                out[k] = _jax.device_put(v, NamedSharding(self.mesh, P(None, pmesh.DATA_AXIS)))
            elif v.ndim >= 1 and v.shape[0] % n == 0:
                out[k] = _jax.device_put(v, NamedSharding(self.mesh, P(pmesh.DATA_AXIS)))
            else:
                out[k] = _jax.device_put(v, NamedSharding(self.mesh, P()))
        return out

    def train_step(self, graph_batch: dict) -> dict:
        device_batch = self.prepare_device_batch(graph_batch)
        self.params, self.spectral, self.opt_state, self._rng, info = self._step_fn(
            self.params, self.spectral, self.opt_state, self._rng, device_batch)
        return {k: float(v) for k, v in info.items()}

    def train_epoch(self, prefetch: int = 2) -> dict:
        """One epoch with a host-side prefetch thread: image decode + batch
        assembly overlaps the device step (the reference's dataloader workers,
        main.py:93-99, minus the process boundary)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
        stop = object()

        err: list = []

        def producer():
            # the stop sentinel MUST go in even when batch assembly raises
            # (e.g. one corrupt image): otherwise the consumer blocks in
            # q.get() forever and the run hangs silently
            try:
                for graph_batch in self.sampler:
                    q.put(self.prepare_device_batch(graph_batch))
            except BaseException as e:  # re-raised in the training thread
                err.append(e)
            finally:
                q.put(stop)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        agg = None
        n = 0
        while True:
            device_batch = q.get()
            if device_batch is stop:
                break
            self.params, self.spectral, self.opt_state, self._rng, info = self._step_fn(
                self.params, self.spectral, self.opt_state, self._rng, device_batch)
            # accumulate ON DEVICE: a float() per info key here would force
            # ~7 blocking host syncs per step (~0.5-1 s through a relay
            # tunnel) and serialize the pipeline behind the host
            agg = info if agg is None else jax.tree_util.tree_map(
                jnp.add, agg, info)
            n += 1
        thread.join()
        if err:
            raise err[0]
        if agg is None:  # zero-batch epoch (exhausted/degenerate sampler)
            return {}
        return {k: float(v) / n for k, v in agg.items()}

    # -- full-graph embedding generation (module/utils.py:479-546) --------

    def generate_ent_embeddings(self, batch_size: int = 512, mesh=None) -> jnp.ndarray:
        """All-entity M3AE cls pass (chunked) + one full-graph RGCN sweep.

        With a multi-device ``mesh`` (or ``self.mesh``), the entity sweep is
        sharded: batches over ``data``, M3AE FFN kernels tensor-parallel over
        ``model`` (parallel.mesh.shard_transformer_ffn) — the full-entity
        sweep is the fusion side's big eval cost (module/utils.py:479-527)."""
        cfg = self.cfg
        n = self.table.n_entities
        mesh = mesh if mesh is not None else self.mesh
        use_mesh = mesh is not None and mesh.size > 1
        if use_mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from mre_tpu.parallel import mesh as pmesh

            params = pmesh.shard_transformer_ffn(self.params, mesh)
            spectral = jax.device_put(self.spectral, NamedSharding(mesh, P()))
            batch_sh = pmesh.batch_sharding(mesh)
            put = lambda x: jax.device_put(x, batch_sh) \
                if x.shape[0] % mesh.shape[pmesh.DATA_AXIS] == 0 \
                else jax.device_put(x, NamedSharding(mesh, P()))
        else:
            params, spectral = self.params, self.spectral
            put = jnp.asarray

        encode = self._encode_cls_jit
        reps = []
        for i in range(0, n, batch_size):
            ids = np.arange(i, min(i + batch_size, n))
            pad_n = batch_size - len(ids)
            ids_p = np.pad(ids, (0, pad_n), constant_values=ids[-1])
            mm = self.store.generate_batch(ids_p, [], train=False)
            patches = put(extract_patches(np.asarray(mm["image"]), cfg.patch_size)) \
                if "image" in mm else None
            out = encode(params, spectral, patches, put(np.asarray(mm["text"])),
                         put(np.asarray(mm["text_padding_mask"])))
            reps.append(np.asarray(out)[:len(ids)])
        reps = jnp.asarray(np.concatenate(reps))

        edge_index, edge_type = edges_from_tasks(self.table.triples)
        return self._gcn_jit(self.params, self.spectral, reps,
                             jnp.asarray(edge_index, jnp.int32),
                             jnp.asarray(edge_type, jnp.int32))

    def generate_rel_embeddings(self, batch_size: int = 64) -> jnp.ndarray:
        n = self.table.n_relations
        encode = self._rel_encode_jit
        out = []
        for i in range(0, n, batch_size):
            ids = np.arange(i, min(i + batch_size, n))
            pad_n = batch_size - len(ids)
            ids_p = np.pad(ids, (0, pad_n), constant_values=ids[-1])
            out.append(np.asarray(encode(
                self.params, self.spectral, jnp.asarray(self.store.rel_ids[ids_p]),
                jnp.asarray(self.store.rel_mask[ids_p])))[:len(ids)])
        return jnp.asarray(np.concatenate(out))

    # -- DistillModel path: unseen relation embeddings (utils.py:529-546,
    # rel_type='unseen'; module/DistillModel.py) ---------------------------

    def train_distill(self, teacher_rel_embs: jnp.ndarray, steps: int = 2000,
                      lr: float = 1e-4, batch_size: int = 32, seed: int = 0):
        """Distill description→embedding into a small MLP over the frozen
        learned text embeddings; returns (predict_fn, params)."""
        from mre_tpu.models.distill import embed_tokens, make_distill_trainer

        m3ae_params = self.params["M3AEmodel"]
        token_embs = embed_tokens(m3ae_params, jnp.asarray(self.store.rel_ids))
        teacher = jnp.asarray(teacher_rel_embs)
        n = token_embs.shape[0]
        _, params, opt_state, step, predict = make_distill_trainer(
            emb_dim=self.cfg.emb_dim,
            transformer_emb_dim=token_embs.shape[-1], lr=lr, seed=seed)
        rng = np.random.default_rng(seed)
        # gather on HOST numpy: an eager device gather with host indices is
        # a blocking latency-bound dispatch per step on relay-attached chips
        # (CLAUDE.md: never put random gathers in sequential hot loops)
        token_np = np.asarray(token_embs)
        teacher_np = np.asarray(teacher)
        for _ in range(steps):
            idx = rng.integers(0, n, batch_size)
            params, opt_state, _ = step(params, opt_state, token_np[idx], teacher_np[idx])

        def predict_unseen(rel_ids):
            te = embed_tokens(m3ae_params, jnp.asarray(self.store.rel_ids[np.asarray(rel_ids)]))
            return predict(params, te)

        return predict_unseen, params

    def generate_rel_embeddings_unseen(self, predict_unseen) -> jnp.ndarray:
        """All-relation embeddings through the distilled predictor
        (generate_rel_embed(..., rel_type='unseen'))."""
        return predict_unseen(np.arange(self.table.n_relations))

    def generate(self, rel_ids: np.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Generator head: relation descriptions ⊕ noise → embeddings."""
        return self._generate_jit(
            self.params, self.spectral,
            jnp.asarray(self.store.rel_ids[rel_ids]),
            jnp.asarray(self.store.rel_mask[rel_ids]), noise)

    # -- cached jits (one compiled program per trainer, reused across
    # rounds: a fresh @jax.jit per call retraces and, through the remote-
    # compile tunnel, recompiles a minutes-long M3AE program every fusion
    # round) -------------------------------------------------------------

    @functools.cached_property
    def _encode_cls_jit(self):
        @jax.jit
        def encode(params, spectral, image_patches, text, pad):
            cls_x, _ = self.model.apply(
                {"params": params, "spectral": spectral},
                method=lambda mdl: mdl.m3ae.forward_representation(
                    image_patches, text, pad, deterministic=True))
            return cls_x[:, 0, :]

        return encode

    @functools.cached_property
    def _gcn_jit(self):
        @jax.jit
        def gcn(params, spectral, x, ei, et):
            # spectral is an ARGUMENT, not a baked closure constant
            return self.model.apply(
                {"params": params, "spectral": spectral}, x, ei, et,
                method=self.model.gcn_forward_encoder)

        return gcn

    @functools.cached_property
    def _rel_encode_jit(self):
        @jax.jit
        def encode(params, spectral, rel_des, pad):
            return self.model.apply(
                {"params": params, "spectral": spectral}, rel_des, pad,
                method=self.model.forward_relation_emb)

        return encode

    @functools.cached_property
    def _generate_jit(self):
        @jax.jit
        def gen(params, spectral, rel_tok, rel_mask, noise):
            return self.model.apply(
                {"params": params, "spectral": spectral},
                rel_tok, rel_mask, noise, method=self.model.generate)

        return gen
