"""OpenKE-style Trainer / Tester.

API mirrors the reference toolkit (OpenKE/openke/config/{Trainer,Tester}.py)
but the step is one jitted XLA program and evaluation uses the fully-batched
device ranker instead of per-triple C++ accumulation. A ``use_native_test``
flag routes evaluation through the ctypes sampler.so accumulators instead,
for parity cross-checks between the two implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mre_tpu.data.kg import DeviceKG, TripleTable
from mre_tpu.openke.data import TestDataLoader, TrainDataLoader, read_benchmark, read_type_constraints
from mre_tpu.ops import ranking
from mre_tpu.train.kge import make_optimizer


class Trainer:
    def __init__(self, model=None, data_loader=None, train_times=1000, alpha=0.5,
                 opt_method="sgd", save_steps=None, checkpoint_dir=None,
                 log_every=100, use_gpu=None):
        self.strategy = model                  # a NegativeSampling wrapper
        self.data_loader = data_loader
        self.train_times = train_times
        self.alpha = alpha
        self.opt_method = opt_method
        self.save_steps = save_steps
        self.checkpoint_dir = checkpoint_dir
        self.log_every = log_every

    def run(self):
        strategy = self.strategy
        model = strategy.model
        tx = make_optimizer(self.opt_method, self.alpha)
        opt_state = tx.init(model.params)

        @jax.jit
        def step(params, opt_state, h, t, r):
            def loss_fn(p):
                return strategy.loss_value(p, {"batch_h": h, "batch_t": t, "batch_r": r})

            value, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, value

        params = model.params
        res = 0.0
        for epoch in range(self.train_times):
            # accumulate the epoch loss ON DEVICE: float(value) per batch
            # would block the host on a round trip per step (relay-attached
            # chips), serializing sampling behind the device
            res = None
            for data in self.data_loader:
                params, opt_state, value = step(
                    params, opt_state,
                    jnp.asarray(data["batch_h"]), jnp.asarray(data["batch_t"]),
                    jnp.asarray(data["batch_r"]))
                res = value if res is None else res + value
            res = float(res) if res is not None else 0.0
            if self.log_every and epoch % self.log_every == 0:
                print(f"Epoch {epoch} | loss: {res:f}")
            if self.save_steps and self.checkpoint_dir and (epoch + 1) % self.save_steps == 0:
                model.params = params
                model.save_checkpoint(f"{self.checkpoint_dir}-{epoch}.ckpt")
        model.params = params
        return res


class Tester:
    def __init__(self, model=None, data_loader: TestDataLoader | None = None,
                 use_gpu=None, use_native_test=False):
        self.model = model
        self.data_loader = data_loader
        self.use_native_test = use_native_test

    def run_link_prediction(self, type_constrain=False):
        in_path = self.data_loader.in_path
        if self.use_native_test:
            return self._run_native(type_constrain)
        bench = read_benchmark(in_path)
        all_triples = np.concatenate([bench["train"], bench["valid"], bench["test"]])
        table = TripleTable.build(all_triples, bench["n_entities"], bench["n_relations"])
        kg = DeviceKG.from_table(table)
        tc = read_type_constraints(in_path, bench["n_relations"], bench["n_entities"]) if type_constrain else None
        if type_constrain and tc is None:
            # fail BEFORE the (minutes-long on TPU) ranking pass, not on a
            # KeyError afterwards
            raise FileNotFoundError(
                f"type_constrain=True but {in_path}type_constrain.txt is "
                "missing (generate it with data/prep.py::write_type_constrain)")

        fn, params = self.model._fn, self.model.params
        kwargs = self.model._score_kwargs
        if kwargs:
            import dataclasses

            base_predict = fn.predict
            fn = dataclasses.replace(
                fn, predict=lambda p, h, r, t: base_predict(p, h, r, t, **kwargs))
        all_tails, all_heads = ranking.make_predict_all(fn, kg)
        if not hasattr(self, "_rank_jit_cache"):
            self._rank_jit_cache = {}   # reuse the chunk runner across calls
        res = ranking.link_prediction(all_tails, all_heads, params, kg,
                                      bench["test"], type_constraints=tc,
                                      jit_cache=self._rank_jit_cache)
        key = "filter_tc" if type_constrain else "filter"
        m = res[key]
        print(f"MRR: {m.mrr:.6f}  MR: {m.mr:.1f}  Hits@10: {m.hits10:.6f}  "
              f"Hits@3: {m.hits3:.6f}  Hits@1: {m.hits1:.6f}")
        return m.mrr, m.mr, m.hits10, m.hits3, m.hits1

    def _run_native(self, type_constrain):
        from mre_tpu.openke import native

        lib = native.load()
        lib.setInPath(self.data_loader.in_path.encode())
        lib.importTrainFiles()
        lib.importTestFiles()
        if type_constrain:
            lib.importTypeFiles()
            if not lib.hasTypes():
                # mirror the device path's fail-fast: a silent zero-metric
                # tc eval on a missing/corrupt file is worse than an error
                raise FileNotFoundError(
                    f"type_constrain=True but {self.data_loader.in_path}"
                    "type_constrain.txt is missing or malformed "
                    "(sampler.so rejected it)")
        lib.initTest()
        for index, (data_head, data_tail) in enumerate(self.data_loader):
            score = np.ascontiguousarray(self.model.predict(data_head), np.float32)
            lib.testHead(score.ctypes.data, index, type_constrain)
            score = np.ascontiguousarray(self.model.predict(data_tail), np.float32)
            lib.testTail(score.ctypes.data, index, type_constrain)
        lib.test_link_prediction(type_constrain)
        flag = 1 if type_constrain else 0
        return (lib.getTestLinkMRR(flag), lib.getTestLinkMR(flag),
                lib.getTestLinkHit10(flag), lib.getTestLinkHit3(flag),
                lib.getTestLinkHit1(flag))

    def run_triple_classification(self, threshold=None):
        """Triple classification with best-threshold search
        (OpenKE Tester.py:93-150)."""
        import jax

        from mre_tpu.data.kg import DeviceKG
        from mre_tpu.ops import sampling

        in_path = self.data_loader.in_path
        bench = read_benchmark(in_path)
        all_triples = np.concatenate([bench["train"], bench["valid"], bench["test"]])
        table = TripleTable.build(all_triples, bench["n_entities"], bench["n_relations"])
        kg = DeviceKG.from_table(table)

        def scores_of(triples):
            return self.model.predict({"batch_h": triples[:, 0], "batch_t": triples[:, 2],
                                       "batch_r": triples[:, 1], "mode": "normal"})

        def negatives_of(triples, seed):
            batch = sampling.corrupt_batch(jax.random.key(seed), kg,
                                           jnp.asarray(triples[:, 0]), jnp.asarray(triples[:, 1]),
                                           jnp.asarray(triples[:, 2]), n_neg=1)
            return np.stack([np.asarray(batch.neg_h[:, 0]),
                             triples[:, 1], np.asarray(batch.neg_t[:, 0])], 1)

        valid, test = bench["valid"], bench["test"]
        if threshold is None:
            if len(valid):
                # Deliberate deviation from Tester.py:114-133, which fits the
                # threshold on the SAME test scores it then reports accuracy
                # on; we fit on the valid split and evaluate on test.
                fp, fn_ = scores_of(valid), scores_of(negatives_of(valid, 0))
            else:
                # no valid split: reference behavior (fit on test)
                fp, fn_ = scores_of(test), scores_of(negatives_of(test, 1))
            threshold, _ = ranking.triple_classification_threshold(fp, fn_)
        tp = scores_of(test)
        tn = scores_of(negatives_of(test, 1))
        acc = (np.sum(tp <= threshold) + np.sum(tn > threshold)) / (len(tp) + len(tn))
        print(f"Triple classification accuracy: {acc:.6f} (threshold {threshold:.4f})")
        return float(acc), float(threshold)
