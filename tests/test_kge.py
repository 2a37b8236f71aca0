import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mre_tpu.models import kge

ALL_MODELS = sorted(kge.MODELS)
N_ENT, N_REL, DIM = 30, 5, 16


@pytest.fixture(scope="module", params=ALL_MODELS)
def model_and_params(request):
    model = kge.get(request.param)
    params = model.init(jax.random.key(0), N_ENT, N_REL, dim=DIM)
    return model, params


def test_score_shapes_and_broadcast(model_and_params):
    model, params = model_and_params
    h = jnp.arange(4)
    r = jnp.zeros(4, jnp.int32)
    t = jnp.arange(4, 8)
    s = model.score(params, h, r, t)
    assert s.shape == (4,)
    # broadcast rank-all form
    s_all = model.predict(params, h[:, None], r[:, None], jnp.arange(N_ENT)[None, :])
    assert s_all.shape == (4, N_ENT)
    # pointwise consistency
    s_point = model.predict(params, h, r, t)
    got = s_all[jnp.arange(4), t]
    np.testing.assert_allclose(np.asarray(got), np.asarray(s_point), rtol=1e-2, atol=1e-3)


def test_fast_paths_match_broadcast(model_and_params):
    model, params = model_and_params
    h = jnp.arange(6) % N_ENT
    r = jnp.arange(6) % N_REL
    all_ents = jnp.arange(N_ENT)
    if model.score_all_tails is not None:
        fast = model.score_all_tails(params, h, r)
        slow = model.predict(params, h[:, None], r[:, None], all_ents[None, :])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=2e-3, atol=2e-3)
    if model.score_all_heads is not None:
        fast = model.score_all_heads(params, h, r)  # here `h` plays the tail role
        slow = model.predict(params, all_ents[None, :], r[:, None], h[:, None])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=2e-3, atol=2e-3)


def test_transe_hand_computed():
    model = kge.get("transe")
    params = {"ent": jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.6, 0.8]]),
              "rel": jnp.asarray([[3.0, 4.0]])}
    # normalized: h=(1,0), r=(0.6,0.8), t=(0.6,0.8) → |h+r-t|_1 = 1.0
    s = model.score(params, jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([2]))
    np.testing.assert_allclose(np.asarray(s), [1.0], rtol=1e-5)


def test_distmult_hand_computed():
    model = kge.get("distmult")
    params = {"ent": jnp.asarray([[1.0, 2.0], [3.0, 4.0]]),
              "rel": jnp.asarray([[0.5, 0.5]])}
    s = model.score(params, jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(s), [1 * 0.5 * 3 + 2 * 0.5 * 4], rtol=1e-6)


def test_hole_ccorr_bruteforce():
    model = kge.get("hole")
    params = model.init(jax.random.key(1), 5, 2, dim=8)
    h, r, t = jnp.asarray([1]), jnp.asarray([0]), jnp.asarray([3])
    a = np.asarray(params["ent"])[1]
    b = np.asarray(params["ent"])[3]
    rr = np.asarray(params["rel"])[0]
    n = len(a)
    ccorr = np.array([sum(a[i] * b[(i + k) % n] for i in range(n)) for k in range(n)])
    expected = float(np.sum(ccorr * rr))
    got = float(model.score(params, h, r, t)[0])
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_rotate_zero_phase_is_translationless():
    model = kge.get("rotate")
    params = model.init(jax.random.key(2), 6, 3, dim=8)
    params = dict(params)
    params["rel"] = jnp.zeros_like(params["rel"])  # phase 0 → rotation = identity
    h = jnp.asarray([0, 1])
    r = jnp.asarray([0, 1])
    d = np.asarray(model.predict(params, h, r, h)) + float(params["margin"])
    np.testing.assert_allclose(d, 0.0, atol=1e-5)


def test_gradients_flow(model_and_params):
    model, params = model_and_params
    h = jnp.asarray([0, 1])
    r = jnp.asarray([0, 1])
    t = jnp.asarray([2, 3])

    def loss_fn(p):
        return jnp.sum(model.score(p, h, r, t)) + model.regularization(p, h, r, t)

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


@pytest.mark.parametrize("norm_flag", [True, False])
def test_transr_structured_paths_match_generic(norm_flag):
    """The one-gather-per-positive TransR training path and the whole-table
    projection eval paths must equal the generic per-triple scorer."""
    model = kge.get("transr")
    params = model.init(jax.random.key(3), N_ENT, N_REL, dim_e=DIM, dim_r=12,
                        rand_init=True)
    B, N = 7, 5
    key = jax.random.key(9)
    ks = jax.random.split(key, 5)
    h = jax.random.randint(ks[0], (B,), 0, N_ENT)
    r = jax.random.randint(ks[1], (B,), 0, N_REL)
    t = jax.random.randint(ks[2], (B,), 0, N_ENT)
    neg_h = jax.random.randint(ks[3], (B, N), 0, N_ENT)
    neg_t = jax.random.randint(ks[4], (B, N), 0, N_ENT)

    from mre_tpu.ops.sampling import NegativeBatch
    batch = NegativeBatch(h=h, r=r, t=t, neg_h=neg_h, neg_t=neg_t)
    p, n = model.score_pos_neg(params, batch, norm_flag=norm_flag)
    p_ref = model.score(params, h, r, t, norm_flag=norm_flag)
    n_ref = model.score(params, neg_h, jnp.broadcast_to(r[:, None], neg_h.shape),
                        neg_t, norm_flag=norm_flag)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref), rtol=1e-5, atol=1e-5)

    all_ents = jnp.arange(N_ENT)
    fast_t = kge.transr_all_tails(params, h, r, norm_flag=norm_flag)
    slow_t = model.predict(params, h[:, None], r[:, None], all_ents[None, :],
                           norm_flag=norm_flag)
    np.testing.assert_allclose(np.asarray(fast_t), np.asarray(slow_t), rtol=1e-4, atol=1e-4)
    fast_h = kge.transr_all_heads(params, t, r, norm_flag=norm_flag)
    slow_h = model.predict(params, all_ents[None, :], r[:, None], t[:, None],
                           norm_flag=norm_flag)
    np.testing.assert_allclose(np.asarray(fast_h), np.asarray(slow_h), rtol=1e-4, atol=1e-4)


def test_rotate_structured_path_matches_generic():
    model = kge.get("rotate")
    params = model.init(jax.random.key(5), N_ENT, N_REL, dim=DIM)
    B, N = 6, 4
    ks = jax.random.split(jax.random.key(11), 5)
    h = jax.random.randint(ks[0], (B,), 0, N_ENT)
    r = jax.random.randint(ks[1], (B,), 0, N_REL)
    t = jax.random.randint(ks[2], (B,), 0, N_ENT)
    neg_h = jax.random.randint(ks[3], (B, N), 0, N_ENT)
    neg_t = jax.random.randint(ks[4], (B, N), 0, N_ENT)
    from mre_tpu.ops.sampling import NegativeBatch
    batch = NegativeBatch(h=h, r=r, t=t, neg_h=neg_h, neg_t=neg_t)
    p, n = model.score_pos_neg(params, batch)
    p_ref = model.score(params, h, r, t)
    n_ref = model.score(params, neg_h, jnp.broadcast_to(r[:, None], neg_h.shape), neg_t)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n), np.asarray(n_ref), rtol=1e-5, atol=1e-5)

    # gradient parity (the structured path reaches params through different
    # contractions — the pullback must agree)
    def loss_struct(ps):
        pp, nn = model.score_pos_neg(ps, batch)
        return jnp.sum(pp) - jnp.sum(nn)

    def loss_gen(ps):
        pp = model.score(ps, h, r, t)
        nn = model.score(ps, neg_h, jnp.broadcast_to(r[:, None], neg_h.shape), neg_t)
        return jnp.sum(pp) - jnp.sum(nn)

    g1 = jax.grad(loss_struct)(params)
    g2 = jax.grad(loss_gen)(params)
    for k in ("ent", "rel"):
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-4, atol=1e-5)


def test_rotate_sided_path_matches_generic():
    """With the sided batch view (neg_ent/neg_side from corrupt_batch), the
    RotatE structured scorer and its gradients must equal the generic
    per-triple scorer on the equivalent neg_h/neg_t."""
    from mre_tpu.data.kg import DeviceKG, TripleTable
    from mre_tpu.ops import sampling

    rng = np.random.default_rng(3)
    tri = np.stack([rng.integers(0, N_ENT, 120), rng.integers(0, N_REL, 120),
                    rng.integers(0, N_ENT, 120)], 1).astype(np.int32)
    kg = DeviceKG.from_table(TripleTable.build(tri, N_ENT, N_REL))
    batch = sampling.sample_training_batch(jax.random.key(4), kg, 16, 6, True)
    assert batch.neg_ent is not None and batch.neg_side is not None
    # consistency of the sided view with neg_h/neg_t
    nh = np.where(np.asarray(batch.neg_side), np.asarray(batch.h)[:, None],
                  np.asarray(batch.neg_ent))
    np.testing.assert_array_equal(nh, np.asarray(batch.neg_h))

    model = kge.get("rotate")
    params = model.init(jax.random.key(5), N_ENT, N_REL, dim=DIM)

    def loss_struct(ps):
        p, n = model.score_pos_neg(ps, batch)
        return jnp.sum(p) - 0.5 * jnp.sum(n), (p, n)

    def loss_gen(ps):
        p = model.score(ps, batch.h, batch.r, batch.t)
        n = model.score(ps, batch.neg_h,
                        jnp.broadcast_to(batch.r[:, None], batch.neg_h.shape),
                        batch.neg_t)
        return jnp.sum(p) - 0.5 * jnp.sum(n), (p, n)

    (l1, (p1, n1)), g1 = jax.value_and_grad(loss_struct, has_aux=True)(params)
    (l2, (p2, n2)), g2 = jax.value_and_grad(loss_gen, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), rtol=1e-5, atol=1e-5)
    for k in ("ent", "rel"):
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-4, atol=1e-5)


def test_margin_epsilon_uniform_init():
    """Reference init branch (TransE.py:20-36 pattern): BOTH margin and
    epsilon given -> uniform(+-(margin+epsilon)/dim); otherwise xavier."""
    import jax

    from mre_tpu.models import kge as K

    rng_lim = (200.0 + 2.0) / 64
    for name in ("transe", "transh", "transd", "distmult", "hole"):
        m = K.get(name)
        p = m.init(jax.random.key(0), 50, 5, dim=64, margin=200.0, epsilon=2.0)
        ent = np.asarray(p["ent"])
        assert np.abs(ent).max() <= rng_lim, name
        assert np.abs(ent).max() > 0.8 * rng_lim, name   # wide-range init hit
        x = m.init(jax.random.key(0), 50, 5, dim=64)
        assert np.abs(np.asarray(x["ent"])).max() < 0.1 * rng_lim, name  # xavier
