"""Loss function tests (reference: run_gun.py CE + WGAN-GP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_gp_custom_vjp_matches_autodiff():
    """make_gradient_penalty_rof (reverse-over-forward custom VJP) must give
    the SAME value and parameter gradient as autodiff through
    gradient_penalty — on a nonlinear D where the Hessian is nonzero."""
    from dlsg_tpu.ops.losses import make_gradient_penalty_rof

    rng = np.random.default_rng(1)
    B, T, V, H = 4, 3, 5, 7
    params = {
        "w1": jnp.asarray(rng.normal(size=(T * V, H)), jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(H,)), jnp.float32),
    }
    real = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    fake = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    eps = jnp.asarray(rng.uniform(size=(B, 1, 1)), jnp.float32)
    mixed = real * eps + fake * (1.0 - eps)

    def apply_fn(p, x):
        h = jnp.tanh(x.reshape(x.shape[0], -1) @ p["w1"])
        return h @ p["w2"]

    def gp_ref(p):
        return gradient_penalty(lambda x: apply_fn(p, x), real, fake, eps)

    gp_rof = make_gradient_penalty_rof(apply_fn)

    v_ref, g_ref = jax.value_and_grad(gp_ref)(params)
    v_rof, g_rof = jax.value_and_grad(lambda p: gp_rof(p, mixed))(params)
    np.testing.assert_allclose(float(v_ref), float(v_rof), rtol=1e-6)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_ref[k]), np.asarray(g_rof[k]), rtol=1e-5, atol=1e-6,
        )


@pytest.mark.slow
def test_gan_step_gp_custom_vjp_and_remat_match_default():
    """The config-gated D-phase variants (gan_gp_custom_vjp, disc_remat) must
    be numerics-preserving through a real GAN train step."""
    from dataclasses import replace

    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.gan_lambda import init_lambda_state
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step

    cfg = tiny_test_config(train_batch_size=2, dropout=0.0)
    V = 23
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(2, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(2, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, V, size=(2, cfg.max_words)), jnp.int32)
    lengths = jnp.asarray([5, 7], jnp.int32)
    batch = {"frames": frames, "regions": regions, "captions": captions, "lengths": lengths}

    gen, disc = CapGnnModel(cfg, V), DiscV2(cfg, V)
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    from dlsg_tpu.train.steps import make_masks

    onehot = jax.nn.one_hot(captions, V)
    _, att = make_masks(captions)
    alpha = jnp.ones((2, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((2, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)
    key = jax.random.key(3, impl=cfg.rng_impl)

    results = {}
    # pin the baseline to plain autodiff explicitly — gan_gp_custom_vjp
    # defaults to True, so 'default': cfg would compare gp_rof to itself
    for name, cfg_v in {
        "default": replace(cfg, gan_gp_custom_vjp=False),
        "gp_rof": replace(cfg, gan_gp_custom_vjp=True),
        "remat": replace(cfg, gan_gp_custom_vjp=False, disc_remat="dots"),
    }.items():
        step = make_gan_train_step(gen, disc, cfg_v)
        # fresh buffers per variant: the jitted step donates its states
        copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
        gs = TrainState.create(copy(g_vars["params"]), make_optimizer(1e-4))
        ds = TrainState.create(copy(d_vars["params"]), make_optimizer(1e-4))
        ls = init_lambda_state(0.01)
        gs, ds, ls, metrics = step(gs, ds, ls, batch, key, jnp.float32(0.7))
        results[name] = (gs, ds, metrics)

    g0, d0, m0 = results["default"]
    for name in ("gp_rof", "remat"):
        g1, d1, m1 = results[name]
        np.testing.assert_allclose(
            float(m0["loss_D"]), float(m1["loss_D"]), rtol=1e-5, err_msg=name
        )
        for la, lb in zip(
            jax.tree_util.tree_leaves(d0.params), jax.tree_util.tree_leaves(d1.params)
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), atol=2e-5, err_msg=name
            )
        for la, lb in zip(
            jax.tree_util.tree_leaves(g0.params), jax.tree_util.tree_leaves(g1.params)
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), atol=2e-5, err_msg=name
            )


def test_wgan_g_loss():
    np.testing.assert_allclose(float(wgan_g_loss(jnp.array([1.0, 3.0]))), -2.0)


def test_psl_diversity_loss_zero_for_orthogonal():
    psl = jnp.eye(4)[None]  # orthogonal proposals -> cos sim 0 -> relu(0-0)=0
    assert float(psl_diversity_loss(psl)) == 0.0
    same = jnp.ones((1, 4, 8))
    assert float(psl_diversity_loss(same)) > 0.4
