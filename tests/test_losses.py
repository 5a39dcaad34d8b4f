"""Loss function tests (reference: run_gun.py CE + WGAN-GP)."""

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.ops.losses import (
    gradient_penalty,
    length_mask,
    masked_cross_entropy,
    psl_diversity_loss,
    to_onehot,
    wgan_d_loss,
    wgan_g_loss,
)


def test_length_mask():
    m = length_mask(jnp.array([2, 4]), 5)
    np.testing.assert_array_equal(m, [[1, 1, 0, 0, 0], [1, 1, 1, 1, 0]])


def test_masked_ce_matches_ragged_reference_semantics():
    """Dense-mask CE must equal mean NLL over concatenated valid positions
    (run_gun.py:189-197)."""
    rng = np.random.default_rng(0)
    B, T, V = 3, 6, 10
    logits = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, V, size=(B, T)), jnp.int32)
    lengths = jnp.array([2, 5, 3])
    got = masked_cross_entropy(logits, targets, lengths)

    # reference-style: concatenate per-sample truncations then mean NLL
    logp = jax.nn.log_softmax(logits, axis=-1)
    nlls = []
    for j in range(B):
        for t in range(int(lengths[j])):
            nlls.append(-float(logp[j, t, targets[j, t]]))
    np.testing.assert_allclose(float(got), np.mean(nlls), rtol=1e-6)


def test_to_onehot():
    oh = to_onehot(jnp.array([[1, 0, 3]]), 5)
    assert oh.shape == (1, 3, 5)
    np.testing.assert_array_equal(np.argmax(oh[0], -1), [1, 0, 3])
    # pad id 0 is one-hot too (run_gun.py:449-453 does not zero it)
    assert float(oh[0, 1, 0]) == 1.0


def test_gradient_penalty_at_optimum_is_zero():
    """If D is perfectly 1-Lipschitz linear with unit-norm gradient, gp = 0."""
    B, T, V = 4, 3, 5
    w = np.zeros((T, V), np.float32)
    w[0, 0] = 1.0  # gradient norm exactly 1 per sample
    w = jnp.asarray(w)

    def d_fn(x):
        return jnp.einsum("btv,tv->b", x, w)

    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    eps = jnp.asarray(rng.uniform(size=(B, 1, 1)), jnp.float32)
    gp = gradient_penalty(d_fn, real, fake, eps)
    np.testing.assert_allclose(float(gp), 0.0, atol=1e-10)


def test_wgan_d_loss_components():
    def d_fn(x):
        return jnp.sum(x, axis=(1, 2))

    B, T, V = 2, 3, 4
    real = jnp.ones((B, T, V))
    fake = jnp.zeros((B, T, V))
    eps = jnp.full((B, 1, 1), 0.5)
    loss, aux = wgan_d_loss(d_fn, real, fake, eps)
    # r = 12, f = 0; grad norm = sqrt(12); gp = (sqrt(12)-1)^2
    gp = (np.sqrt(12) - 1) ** 2
    np.testing.assert_allclose(float(loss), 0 - 12 + 10 * gp, rtol=1e-6)
    np.testing.assert_allclose(float(aux["wasserstein"]), 12.0, rtol=1e-6)


def test_wgan_gp_is_twice_differentiable():
    """The whole point of moving off cuDNN (train_debug.py:51): d(loss_D)/d(params)
    through the gradient penalty must work."""
    w0 = jnp.ones((3 * 4,)) * 0.3

    def d_loss(w):
        def d_fn(x):
            return x.reshape(x.shape[0], -1) @ w

        real = jnp.ones((2, 3, 4))
        fake = jnp.zeros((2, 3, 4))
        eps = jnp.full((2, 1, 1), 0.25)
        loss, _ = wgan_d_loss(d_fn, real, fake, eps)
        return loss

    g = jax.grad(d_loss)(w0)
    assert np.all(np.isfinite(g))
    assert float(jnp.abs(g).max()) > 0


def test_wgan_g_loss():
    np.testing.assert_allclose(float(wgan_g_loss(jnp.array([1.0, 3.0]))), -2.0)


def test_psl_diversity_loss_zero_for_orthogonal():
    psl = jnp.eye(4)[None]  # orthogonal proposals -> cos sim 0 -> relu(0-0)=0
    assert float(psl_diversity_loss(psl)) == 0.0
    same = jnp.ones((1, 4, 8))
    assert float(psl_diversity_loss(same)) > 0.4
