"""Numerical parity against the reference's torch building blocks.

Loads the same weights into our flax modules and the torch modules the
reference uses (torch is CPU-only here) and asserts matching outputs —
stronger evidence than shape tests that the math is the reference's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_layer_normalization_matches_torch_std_semantics():
    """Our std-LN must match the reference LayerNormalization
    (module/submodule.py:58-77: unbiased std, eps added to std)."""
    from mre_tpu.models.transformer import LayerNormalization

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    a2 = rng.normal(size=10).astype(np.float32)
    b2 = rng.normal(size=10).astype(np.float32)

    xt = torch.from_numpy(x)
    mu = xt.mean(dim=-1, keepdim=True)
    sigma = xt.std(dim=-1, keepdim=True)     # unbiased
    expected = ((xt - mu) / (sigma + 1e-3) * torch.from_numpy(a2)
                + torch.from_numpy(b2)).numpy()

    ln = LayerNormalization(10)
    out = ln.apply({"params": {"a_2": jnp.asarray(a2), "b_2": jnp.asarray(b2)}},
                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_spectral_norm_matches_torch():
    """SNDense forward vs torch.nn.utils.spectral_norm with the same weight
    and u vector (one power iteration, training mode)."""
    from mre_tpu.models.spectral_norm import SNDense

    rng = np.random.default_rng(1)
    in_f, out_f = 12, 8
    w = rng.normal(size=(out_f, in_f)).astype(np.float32)   # torch layout
    b = rng.normal(size=out_f).astype(np.float32)
    u0 = rng.normal(size=out_f).astype(np.float32)
    u0 = u0 / np.linalg.norm(u0)
    x = rng.normal(size=(5, in_f)).astype(np.float32)

    lin = torch.nn.Linear(in_f, out_f)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(b))
    sn = torch.nn.utils.spectral_norm(lin, n_power_iterations=1)
    with torch.no_grad():
        sn.weight_u.copy_(torch.from_numpy(u0))
    sn.train()
    with torch.no_grad():
        expected = sn(torch.from_numpy(x)).numpy()

    model = SNDense(out_f)
    variables = {"params": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)},
                 "spectral": {"u": jnp.asarray(u0)}}
    out, _ = model.apply(variables, jnp.asarray(x), update_stats=True,
                         mutable=["spectral"])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


def test_attention_matches_torch_reference():
    """Our Attention (xla path) vs a torch re-enactment of the reference's
    Attention (module/submodule.py:148-186) with identical weights."""
    from mre_tpu.models.transformer import Attention

    rng = np.random.default_rng(2)
    dim, heads, B, N = 16, 4, 2, 7
    x = rng.normal(size=(B, N, dim)).astype(np.float32)
    w_qkv = rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.2
    b_qkv = rng.normal(size=3 * dim).astype(np.float32) * 0.1
    w_o = rng.normal(size=(dim, dim)).astype(np.float32) * 0.2
    b_o = rng.normal(size=dim).astype(np.float32) * 0.1
    pad = np.zeros((B, N), np.float32)
    pad[:, -2:] = 1.0

    # torch reference math
    xt = torch.from_numpy(x)
    qkv = torch.nn.functional.linear(xt, torch.from_numpy(w_qkv), torch.from_numpy(b_qkv))
    qkv = qkv.view(B, N, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    att = (q @ k.transpose(-2, -1)) * (dim // heads) ** -0.5
    mask = torch.from_numpy(pad)[:, None, None, :].expand(att.shape)
    att = torch.where(mask > 0, torch.tensor(-1e7), att)
    att = torch.softmax(att, dim=-1)
    out = (att @ v).permute(0, 2, 1, 3).reshape(B, N, dim)
    expected = torch.nn.functional.linear(out, torch.from_numpy(w_o), torch.from_numpy(b_o)).numpy()

    attn = Attention(dim=dim, num_heads=heads, use_bias=True, attention_impl="xla")
    params = {"Dense_0": {"kernel": jnp.asarray(w_qkv.T), "bias": jnp.asarray(b_qkv)},
              "Dense_1": {"kernel": jnp.asarray(w_o.T), "bias": jnp.asarray(b_o)}}
    got = attn.apply({"params": params}, jnp.asarray(x), True, jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-4, atol=2e-5)


def test_margin_loss_matches_torch_reference():
    from mre_tpu.ops import losses as L

    rng = np.random.default_rng(3)
    p = rng.normal(size=(6, 1)).astype(np.float32)
    n = rng.normal(size=(6, 5)).astype(np.float32)
    margin = 4.0
    pt, nt = torch.from_numpy(p), torch.from_numpy(n)
    expected = (torch.max(pt - nt, -torch.tensor(margin))).mean() + margin
    got = L.margin_loss(jnp.asarray(p), jnp.asarray(n), margin=margin)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-6)

    # self-adversarial variant (module/loss.py:17-22)
    adv = 1.5
    w = torch.softmax(-nt * adv, dim=-1)
    expected_adv = (w * torch.max(pt - nt, -torch.tensor(margin))).sum(dim=-1).mean() + margin
    got_adv = L.margin_loss(jnp.asarray(p), jnp.asarray(n), margin=margin,
                            adv_temperature=adv)
    np.testing.assert_allclose(float(got_adv), float(expected_adv), rtol=1e-6)


def test_cross_entropy_matches_torch_reference():
    from mre_tpu.ops import losses as L

    rng = np.random.default_rng(4)
    B, T, V = 3, 5, 11
    logits = rng.normal(size=(B, T, V)).astype(np.float32)
    tokens = rng.integers(0, V, (B, T))
    valid = (rng.random((B, T)) > 0.3).astype(np.float32)

    lt = torch.from_numpy(logits)
    tt = torch.from_numpy(tokens)
    vt = torch.from_numpy(valid)
    vlen = torch.clamp(vt.sum(-1), min=1e-5)
    logp = torch.log_softmax(lt, dim=-1).gather(-1, tt.unsqueeze(-1)).squeeze(-1)
    logp = torch.where(vt > 0, logp, torch.tensor(0.0))
    expected = -(logp.sum(-1) / vlen).mean()

    got, _ = L.cross_entropy_loss_and_accuracy(jnp.asarray(logits),
                                               jnp.asarray(tokens), jnp.asarray(valid))
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_adagrad_matches_torch():
    """torch_adagrad must match torch.optim.Adagrad step-for-step, including
    the tiny-gradient regime that exposed the optax eps-placement difference."""
    import jax.numpy as jnp

    from mre_tpu.train.kge import make_optimizer

    rng = np.random.default_rng(0)
    p0 = rng.normal(size=6).astype(np.float32) * 0.01
    grads = [rng.normal(size=6).astype(np.float32) * s
             for s in (1e-6, 1e-4, 1e-2, 1.0)]

    tx = make_optimizer("adagrad", 0.3)
    p_j = jnp.asarray(p0)
    st = tx.init(p_j)
    p_t = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.Adagrad([p_t], lr=0.3)
    for g in grads:
        up, st = tx.update(jnp.asarray(g), st, p_j)
        p_j = p_j + up
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()
        np.testing.assert_allclose(np.asarray(p_j), p_t.detach().numpy(),
                                   rtol=1e-5, atol=1e-7)


def test_transe_margin_flag_matches_reference():
    """TransE with margin: forward = margin − distance; predict = distance
    (reference TransE.py:40-44, 66-74, 86-94)."""
    import jax.numpy as jnp

    from mre_tpu.openke import TransE

    m = TransE(10, 3, dim=8, norm_flag=False, margin=6.0, seed=0)
    data = {"batch_h": np.asarray([1, 2]), "batch_t": np.asarray([3, 4]),
            "batch_r": np.asarray([0, 1]), "mode": "normal"}
    fwd = np.asarray(m.forward(data))
    dist = np.asarray(m.predict(data))
    np.testing.assert_allclose(fwd, 6.0 - dist, rtol=1e-5)


def test_adagrad_lr_decay_matches_torch():
    """torch Adagrad's lr_decay schedule: clr = lr / (1 + (step−1)·lr_decay)
    (advisor finding: a recipe with nonzero lr_decay must not silently train
    a different schedule)."""
    import jax.numpy as jnp

    from mre_tpu.train.kge import make_optimizer

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=5).astype(np.float32) * 0.1
    grads = [rng.normal(size=5).astype(np.float32) for _ in range(6)]

    tx = make_optimizer("adagrad", 0.2, lr_decay=0.07)
    p_j = jnp.asarray(p0)
    st = tx.init(p_j)
    p_t = torch.tensor(p0.copy(), requires_grad=True)
    opt = torch.optim.Adagrad([p_t], lr=0.2, lr_decay=0.07)
    for g in grads:
        up, st = tx.update(jnp.asarray(g), st, p_j)
        p_j = p_j + up
        p_t.grad = torch.from_numpy(g.copy())
        opt.step()
        np.testing.assert_allclose(np.asarray(p_j), p_t.detach().numpy(),
                                   rtol=1e-5, atol=1e-7)


def test_lr_decay_rejected_for_other_optimizers():
    import pytest as _pytest

    from mre_tpu.train.kge import make_optimizer

    with _pytest.raises(ValueError):
        make_optimizer("adam", 1e-3, lr_decay=0.1)


def test_sigmoid_adv_loss_matches_reference_formula():
    """Self-adversarial sigmoid loss (OpenKE SigmoidLoss.py forward):
    -(mean log σ(p) + mean_b Σ_n softmax(n·T) log σ(−n)) / 2."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from mre_tpu.ops.losses import sigmoid_loss

    rng = np.random.default_rng(3)
    p = rng.normal(size=(7, 1)).astype(np.float32)
    n = rng.normal(size=(7, 5)).astype(np.float32)
    T = 2.0

    pt, nt = torch.from_numpy(p), torch.from_numpy(n)
    w = F.softmax(nt * T, dim=-1).detach()
    expected = -(F.logsigmoid(pt).mean()
                 + (w * F.logsigmoid(-nt)).sum(dim=-1).mean()) / 2

    got = sigmoid_loss(jnp.asarray(p), jnp.asarray(n), adv_temperature=T)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-6)


@pytest.mark.parametrize("model", ["distmult", "complex"])
def test_kge_step_lockstep_matches_torch_oracle(model, tmp_path):
    """Multi-step lockstep vs a torch re-enactment of the reference's
    adagrad+softplus+L2 recipe family (the DistMult/ComplEx WN18RR family).

    Byte-identical sampled batches feed both our jitted step and a torch
    oracle built from /root/reference/OpenKE/openke semantics
    (module/model/DistMult.py:34-72, loss/SoftplusLoss.py:22-26,
    config/Trainer.py:42-53). Sustained loss agreement across steps implies
    the update semantics match, since step-k loss depends on every prior
    update. Encodes the round-3 lockstep finding (worst loss rel-diff
    4.3e-4 over 50 steps on WN18RR, experiments/results/
    distmult_lockstep_r3.log): the WN18RR table gap is not a step-semantics
    divergence.
    """
    from experiments import distmult_lockstep
    from mre_tpu.data import fixtures

    d = str(tmp_path / "bench")
    fixtures.write_openke_benchmark(d, n_ent=40, n_rel=5, n_train=300)
    summary = distmult_lockstep.main(["--in_path", d, "--model", model,
                                      "--steps", "12"])
    assert summary["worst_loss_rel_diff"] < 2e-3, summary
