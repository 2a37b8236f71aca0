import jax.numpy as jnp
import numpy as np

from mre_tpu.ops import losses


def test_margin_loss_hand():
    p = jnp.asarray([[1.0], [2.0]])
    n = jnp.asarray([[3.0], [1.0]])
    # max(p-n, -m)+m with m=6: max(-2,-6)+6=4 ; max(1,-6)+6=7 → mean 5.5
    out = float(losses.margin_loss(p, n, margin=6.0))
    np.testing.assert_allclose(out, 5.5, rtol=1e-6)


def test_margin_loss_adversarial_weights_sum_to_one():
    p = jnp.zeros((2, 1))
    n = jnp.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    out = float(losses.margin_loss(p, n, margin=6.0, adv_temperature=1.0))
    assert np.isfinite(out)


def test_sigmoid_loss_matches_formula():
    p = jnp.asarray([[0.0]])
    n = jnp.asarray([[0.0]])
    # -(log σ(0) + log σ(0)) / 2 = log 2
    out = float(losses.sigmoid_loss(p, n))
    np.testing.assert_allclose(out, np.log(2), rtol=1e-6)


def test_patch_mse_masked():
    target = jnp.ones((1, 4, 3))
    output = jnp.zeros((1, 4, 3))
    valid = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    # per-patch mse = 1 on valid; mean over L with zeros = 0.5; / ratio 0.5 = 1
    out = float(losses.patch_mse_loss(output, target, valid))
    np.testing.assert_allclose(out, 1.0, rtol=1e-6)


def test_cross_entropy_perfect_prediction():
    vocab = 5
    tokens = jnp.asarray([[1, 2, 3]])
    logits = jnp.full((1, 3, vocab), -20.0)
    logits = logits.at[0, jnp.arange(3), tokens[0]].set(20.0)
    loss, acc = losses.cross_entropy_loss_and_accuracy(logits, tokens)
    assert float(loss) < 1e-3
    np.testing.assert_allclose(float(acc), 1.0)


def test_contrastive_identity_alignment():
    reps = jnp.eye(4, 8)
    nce, acc = losses.contrastive_loss(reps, reps)
    assert float(acc) == 1.0
    assert float(nce) < 0.1  # 1/0.05 = 20 logit on diagonal → tiny loss
