"""TrainDataLoader / TestDataLoader — the OpenKE data layer.

The vendored reference is *missing* its ``openke/data`` package entirely
(SURVEY.md §2.2: examples import it, the directory doesn't exist); its
behavior is fully determined by the Base.so ABI (Base.cpp sampling layout,
Test.h head/tail batch enumeration). This module provides that layer with two
interchangeable backends:

* ``backend="native"`` — ctypes into our fresh C++ ``sampler.so``
  (mre_tpu/openke/native/sampler.cpp), multi-threaded host sampling with
  exact filtered corruption; batches arrive as numpy in the OpenKE layout
  (positives first, then neg blocks at offsets ``batch + k·batch_size``).
* ``backend="jax"`` — the on-device sampler (ops/sampling.py), flattened to
  the same layout for API compatibility. Prefer driving
  :class:`mre_tpu.train.kge.KGETrainer` directly on TPU; this path exists
  for drop-in parity with OpenKE training scripts.
"""

from __future__ import annotations

import os

import numpy as np

from mre_tpu.data.kg import TripleTable


def read_benchmark(in_path: str):
    """Read an OpenKE benchmark directory (train/valid/test 2id.txt)."""

    def read(file):
        path = os.path.join(in_path, file)
        if not os.path.exists(path):
            return np.zeros((0, 3), np.int32)
        with open(path) as f:
            n = int(f.readline())
            rows = np.loadtxt(f, dtype=np.int64, max_rows=n).reshape(n, -1)
        # columns are (head, tail, relation) → reorder to (h, r, t)
        return np.stack([rows[:, 0], rows[:, 2], rows[:, 1]], 1).astype(np.int32)

    def count(file):
        with open(os.path.join(in_path, file)) as f:
            return int(f.readline())

    n_ent = count("entity2id.txt")
    n_rel = count("relation2id.txt")
    return dict(
        n_entities=n_ent, n_relations=n_rel,
        train=read("train2id.txt"), valid=read("valid2id.txt"), test=read("test2id.txt"),
    )


def read_type_constraints(in_path: str, n_relations: int, n_entities: int):
    """Parse type_constrain.txt into dense [R, E] boolean masks
    (head_mask, tail_mask)."""
    path = os.path.join(in_path, "type_constrain.txt")
    head = np.zeros((n_relations, n_entities), bool)
    tail = np.zeros((n_relations, n_entities), bool)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        tokens = f.read().split()
    i = 1  # skip count
    row = 0
    while i < len(tokens):
        rel, cnt = int(tokens[i]), int(tokens[i + 1])
        ids = [int(x) for x in tokens[i + 2:i + 2 + cnt]]
        (head if row % 2 == 0 else tail)[rel, ids] = True
        i += 2 + cnt
        row += 1
    return head, tail


class TrainDataLoader:
    """OpenKE-compatible training batch iterator."""

    def __init__(self, in_path="./", nbatches=100, threads=8, sampling_mode="normal",
                 bern_flag=0, filter_flag=1, neg_ent=1, neg_rel=0,
                 batch_size=None, backend="native", seed=None, p=False,
                 p_temp=1.0):
        self.in_path = in_path
        self.nbatches = nbatches
        self.sampling_mode = sampling_mode
        self.bern = bool(bern_flag)
        self.filter = bool(filter_flag)
        self.neg_ent = neg_ent
        self.neg_rel = neg_rel
        self.backend = backend
        self.p = bool(p)     # kl_prob-weighted relation corruption (importProb)
        self._cross_flag = 0

        for required in ("entity2id.txt", "relation2id.txt", "train2id.txt"):
            if not os.path.exists(os.path.join(in_path, required)):
                raise FileNotFoundError(f"benchmark file missing: {os.path.join(in_path, required)}")

        if backend == "native":
            from mre_tpu.openke import native

            self.lib = native.load()
            self.lib.setInPath(in_path.encode())
            self.lib.setWorkThreads(threads)
            self.lib.setBern(1 if self.bern else 0)
            self.lib.importTrainFiles()
            if self.p:
                # kl_prob-weighted relation corruption needs the softmax
                # table from <in_path>/kl_prob.txt (Reader.h:25-50).
                self.lib.importProb(p_temp)
            if seed is not None:
                self.lib.setSeed(seed)
            else:
                self.lib.randReset()
            self.ent_total = int(self.lib.getEntityTotal())
            self.rel_total = int(self.lib.getRelationTotal())
            self.train_total = int(self.lib.getTrainTotal())
        else:
            import jax

            from mre_tpu.data.kg import DeviceKG
            from mre_tpu.ops import sampling as sampling_mod

            bench = read_benchmark(in_path)
            self.table = TripleTable.build(bench["train"], bench["n_entities"], bench["n_relations"])
            self.kg = DeviceKG.from_table(self.table)
            self.ent_total = bench["n_entities"]
            self.rel_total = bench["n_relations"]
            self.train_total = self.table.n_triples
            self._key = jax.random.key(seed or 0)
            self._prob = None
            if self.p:
                # on-device kl_prob-weighted relation corruption: the
                # importProb softmax table (Reader.h:25-50) as a device array
                kl = np.loadtxt(os.path.join(in_path, "kl_prob.txt"),
                                dtype=np.float32).reshape(
                    self.rel_total, self.rel_total - 1)
                self._prob = sampling_mod.relation_prob_table(kl, p_temp)

        self.batch_size = batch_size or self.train_total // nbatches
        n_per = self.batch_size * (1 + neg_ent + neg_rel)
        self._h = np.zeros(n_per, np.int64)
        self._t = np.zeros(n_per, np.int64)
        self._r = np.zeros(n_per, np.int64)
        self._y = np.zeros(n_per, np.float32)

    def get_ent_tot(self):
        return self.ent_total

    def get_rel_tot(self):
        return self.rel_total

    def get_batch_size(self):
        return self.batch_size

    def _mode_for_step(self):
        if self.sampling_mode == "normal":
            return 0, "normal"
        # "cross": alternate head_batch / tail_batch like upstream OpenKE
        self._cross_flag = 1 - self._cross_flag
        return (-1, "head_batch") if self._cross_flag else (1, "tail_batch")

    def _sample_native(self):
        mode, mode_name = self._mode_for_step()
        self.lib.sampling(
            self._h.ctypes.data, self._t.ctypes.data, self._r.ctypes.data,
            self._y.ctypes.data, self.batch_size, self.neg_ent, self.neg_rel,
            mode, self.filter, self.p, False)
        return {"batch_h": self._h.copy(), "batch_t": self._t.copy(),
                "batch_r": self._r.copy(), "batch_y": self._y.copy(), "mode": mode_name}

    def _sample_jax(self):
        import jax

        from mre_tpu.ops import sampling

        _, mode_name = self._mode_for_step()
        self._key, sub = jax.random.split(self._key)
        nb = sampling.sample_training_batch(sub, self.kg, self.batch_size,
                                            self.neg_ent, self.bern)
        B, n = self.batch_size, self.neg_ent
        h = np.concatenate([np.asarray(nb.h)] + [np.asarray(nb.neg_h[:, k]) for k in range(n)])
        t = np.concatenate([np.asarray(nb.t)] + [np.asarray(nb.neg_t[:, k]) for k in range(n)])
        r = np.tile(np.asarray(nb.r), 1 + n)
        y = np.concatenate([np.ones(B, np.float32), -np.ones(B * n, np.float32)])
        if self.neg_rel:
            import jax.numpy as jnp

            self._key, sub2 = jax.random.split(self._key)
            # Base.cpp parity quirk (Base.cpp:91 + 104-146): the reference's
            # training sampler reads filter_flag but never passes it to the
            # corrupt_* calls — batch corruption is ALWAYS exact-filtered and
            # p always honored. Both backends mirror that here; the
            # standalone corruptRel ABI hook still honors filter_flag
            # (Corrupt.h semantics).
            if self.p:
                # kl_prob-weighted filtered variant (Corrupt.h:86-134 p=true)
                neg_r = np.asarray(sampling.corrupt_relations_prob(
                    sub2, self.kg, jnp.asarray(np.asarray(nb.h)),
                    jnp.asarray(np.asarray(nb.t)), jnp.asarray(np.asarray(nb.r)),
                    self._prob, self.neg_rel))
            else:
                neg_r = np.asarray(sampling.corrupt_relations(
                    sub2, self.kg, jnp.asarray(np.asarray(nb.r)), self.neg_rel,
                    h=jnp.asarray(np.asarray(nb.h)), t=jnp.asarray(np.asarray(nb.t)),
                    filter_flag=True))
            h = np.concatenate([h] + [np.asarray(nb.h)] * self.neg_rel)
            t = np.concatenate([t] + [np.asarray(nb.t)] * self.neg_rel)
            r = np.concatenate([r] + [neg_r[:, k] for k in range(self.neg_rel)])
            y = np.concatenate([y, -np.ones(B * self.neg_rel, np.float32)])
        return {"batch_h": h.astype(np.int64), "batch_t": t.astype(np.int64),
                "batch_r": r.astype(np.int64), "batch_y": y, "mode": mode_name}

    def sample(self):
        return self._sample_native() if self.backend == "native" else self._sample_jax()

    def __iter__(self):
        for _ in range(self.nbatches):
            yield self.sample()

    def __len__(self):
        return self.nbatches


class TestDataLoader:
    """OpenKE-compatible test iterator: per test triple, head & tail batches
    enumerating every entity as candidate (Test.h:36-53 layout).

    For TPU evaluation prefer :func:`mre_tpu.ops.ranking.link_prediction`,
    which scores whole chunks at once; this loader exists for API parity.
    """

    def __init__(self, in_path="./", sampling_mode="link", type_constrain=False):
        self.in_path = in_path
        self.sampling_mode = sampling_mode
        self.type_constrain = type_constrain
        bench = read_benchmark(in_path)
        self.test = bench["test"]
        self.ent_total = bench["n_entities"]
        self.rel_total = bench["n_relations"]

    def set_sampling_mode(self, mode):
        self.sampling_mode = mode

    def get_ent_tot(self):
        return self.ent_total

    def get_triple_tot(self):
        return len(self.test)

    def __len__(self):
        return len(self.test)

    def __iter__(self):
        ents = np.arange(self.ent_total, dtype=np.int64)
        for h, r, t in self.test:
            data_head = {"batch_h": ents, "batch_t": np.full_like(ents, t),
                         "batch_r": np.full_like(ents, r), "mode": "head_batch"}
            data_tail = {"batch_h": np.full_like(ents, h), "batch_t": ents,
                         "batch_r": np.full_like(ents, r), "mode": "tail_batch"}
            yield [data_head, data_tail]
