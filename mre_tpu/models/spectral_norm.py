"""Spectrally-normalized Dense layer.

Replaces the reference's forked torch parametrization
(module/spectral_norm.py:10-262) with a flax module carrying the
power-iteration vector ``u`` in a mutable ``"spectral"`` variable
collection — plain weights in checkpoints, no ``weight_orig``/``weight_u``
key surgery on resume (the reference has to delete those keys manually,
main.py:77-79).

Semantics match torch's (n_power_iterations=1, eps=1e-12): during training
each forward runs one power-iteration update of the stored (u, v) buffers
and normalizes the weight by σ = uᵀ W v; in eval σ comes from the STORED
u and v with no recomputation (module/spectral_norm.py:100-101 — torch
keeps both buffers; recomputing v from u in eval would be one extra
unpersisted PI step).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2(v):
    return v / jnp.maximum(jnp.linalg.norm(v), _EPS)


class SNDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_features = x.shape[-1]
        # torch Linear default init: kaiming_uniform(a=√5) on [out, in] is
        # U(±1/sqrt(fan_in)) for the kernel AND the bias (torch Linear
        # reset_parameters) — he_uniform's sqrt(6/fan_in) is sqrt(6)× wider
        bound = 1.0 / float(in_features) ** 0.5

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", uniform_init, (in_features, self.features))
        bias = self.param("bias", uniform_init, (self.features,)) if self.use_bias else None

        u_var = self.variable("spectral", "u", lambda: _l2(
            jax.random.normal(self.make_rng("params") if self.has_rng("params") else jax.random.key(0),
                              (self.features,))))
        u = u_var.value
        # power iteration on W [out, in] = kernel.T
        w = kernel.T
        v_var = self.variable("spectral", "v", lambda: _l2(w.T @ u))
        if update_stats and not self.is_initializing():
            v_new = _l2(w.T @ u)
            u_new = _l2(w @ v_new)
            u_var.value = jax.lax.stop_gradient(u_new)
            v_var.value = jax.lax.stop_gradient(v_new)
            u_s, v_s = u_new, v_new
        else:
            # eval: stored buffers only (torch: no PI outside training)
            u_s, v_s = u, v_var.value
        sigma = jnp.einsum("o,oi,i->", jax.lax.stop_gradient(u_s), w,
                           jax.lax.stop_gradient(v_s))
        y = x @ (kernel / sigma)
        if bias is not None:
            y = y + bias
        return y
