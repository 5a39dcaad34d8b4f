"""Jitted train step tests: CE and GAN steps on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.loader import train_batches
from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
from dlsg_tpu.models.discriminator import DiscV2
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.train.gan_lambda import init_lambda_state
from dlsg_tpu.train.optim import TrainState, make_optimizer
from dlsg_tpu.train.steps import make_ce_train_step, make_gan_train_step, make_masks


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=2)
    gen = CapGnnModel(cfg, len(vocab))
    batch = next(train_batches(ds, cfg.train_batch_size, seed=1, epoch=0))
    dev_batch = {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if k in ("frames", "regions", "captions", "lengths")
    }
    g_vars = gen.init(
        jax.random.PRNGKey(0), dev_batch["frames"], dev_batch["regions"], dev_batch["captions"]
    )
    return cfg, vocab, gen, g_vars, dev_batch


def test_make_masks():
    caps = jnp.array([[5, 6, 2, 0], [7, 2, 0, 0]])
    seq, att = make_masks(caps)
    np.testing.assert_array_equal(seq, [[1, 1, 1, 0], [1, 1, 0, 0]])
    assert att.shape == (2, 4, 4)
    np.testing.assert_array_equal(att[0, 0], [1, 1, 1, 0])
    np.testing.assert_array_equal(att[1, 2], [0, 0, 0, 0])


def _fresh(params):
    """Copy params to new buffers — jitted steps donate their input states."""
    return jax.tree_util.tree_map(jnp.array, params)


def test_ce_step_reduces_loss(setup):
    cfg, vocab, gen, g_vars, batch = setup
    state = TrainState.create(_fresh(g_vars["params"]), make_optimizer(1e-3))
    step = make_ce_train_step(gen, cfg)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, rng, jnp.float32(1.0))
        losses.append(float(metrics["cap_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


import pytest as _pytest


@_pytest.mark.parametrize("single_fwd", [True, False])
def test_gan_step_runs_and_updates_both(setup, single_fwd):
    from dataclasses import replace as _replace

    cfg, vocab, gen, g_vars, batch = setup
    cfg = _replace(cfg, gan_single_forward=single_fwd)
    V = len(vocab)
    disc = DiscV2(cfg, V)
    B, T = batch["captions"].shape
    onehot = jax.nn.one_hot(batch["captions"], V)
    _, att = make_masks(batch["captions"])
    alpha = jnp.ones((B, T, 2 * cfg.num_proposals)) / (2 * cfg.num_proposals)
    obj = jnp.zeros((B, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    gstate = TrainState.create(_fresh(g_vars["params"]), make_optimizer(1e-4))
    dstate = TrainState.create(_fresh(d_vars["params"]), make_optimizer(1e-4))
    # snapshot before stepping: the jitted step donates the input states
    old_params = jax.tree_util.tree_map(np.asarray, gstate.params)
    step = make_gan_train_step(gen, disc, cfg)
    lstate = init_lambda_state(0.01)
    g2, d2, lstate, metrics = step(
        gstate, dstate, lstate, batch, jax.random.PRNGKey(2), jnp.float32(0.9)
    )
    for k in ("cap_loss", "loss_G", "loss_D", "wasserstein"):
        assert np.isfinite(float(metrics[k])), k
    # stable lambda at its start value on step 1 (window not yet full)
    assert float(metrics["gan_lambda"]) == pytest.approx(0.01)
    assert int(lstate["count"]) == 1
    assert int(g2.step) == 1
    # D ran num_D_visual sub-steps (reference: 5 per batch, run_gun.py:343)
    assert int(d2.step) == cfg.num_D_visual
    # generator params actually moved
    gdelta = jax.tree_util.tree_reduce(
        lambda a, l: a + float(np.sum(np.abs(l))),
        jax.tree_util.tree_map(lambda a, b: np.asarray(a) - b, g2.params, old_params),
        0.0,
    )
    assert gdelta > 0
    assert metrics["sample_tokens"].shape == (cfg.max_words,)


def test_lr_injection(setup):
    cfg, vocab, gen, g_vars, batch = setup
    state = TrainState.create(g_vars["params"], make_optimizer(1e-3))
    state = state.set_learning_rate(5e-4)
    assert float(state.opt_state.hyperparams["learning_rate"]) == pytest.approx(5e-4)


def test_bf16_staged_inputs_are_numerics_identical():
    """Staging frames/regions as bf16 under compute_dtype=bfloat16 is
    numerics-IDENTICAL (not merely close): every op that consumes them casts
    to bf16 first, so the same bf16 values reach the MXU either way. This is
    what lets the input pipeline halve its HBM reads and host->device bytes
    with no accuracy trade (BENCHMARKS.md round 5, ab_bf16_inputs_r5)."""
    from dataclasses import replace

    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    cfg = replace(tiny_test_config(train_batch_size=4), compute_dtype="bfloat16")
    V = 47
    rng = np.random.default_rng(0)
    fr = rng.normal(size=(4, cfg.max_frames, cfg.feature_size)).astype(np.float32)
    rg = rng.normal(
        size=(4, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    ).astype(np.float32)
    caps = rng.integers(4, V, size=(4, cfg.max_words)).astype(np.int32)
    lengths = np.asarray([5, 6, 7, 8], np.int32)

    gen = CapGnnModel(cfg, V)
    v = gen.init(jax.random.PRNGKey(0), fr, rg, caps)
    dec = make_decode_fn(gen, cfg, beam_size=3)
    ids32 = np.asarray(dec(v, jnp.asarray(fr), jnp.asarray(rg)))
    ids16 = np.asarray(dec(v, jnp.asarray(fr, jnp.bfloat16), jnp.asarray(rg, jnp.bfloat16)))
    np.testing.assert_array_equal(ids32, ids16)

    disc = DiscV2(cfg, V)
    onehot = jax.nn.one_hot(jnp.asarray(caps), V)
    _, att = make_masks(jnp.asarray(caps))
    alpha = jnp.ones((4, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((4, cfg.num_proposals, cfg.visual_hidden_size))
    dv = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)
    step = make_gan_train_step(gen, disc, cfg)
    key = jax.random.key(3, impl=cfg.rng_impl)
    metrics = {}
    for name, dt in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        gs = TrainState.create(jax.tree.map(jnp.copy, v["params"]), make_optimizer(1e-4))
        ds = TrainState.create(jax.tree.map(jnp.copy, dv["params"]), make_optimizer(1e-4))
        b = {
            "frames": jnp.asarray(fr, dt),
            "regions": jnp.asarray(rg, dt),
            "captions": jnp.asarray(caps),
            "lengths": jnp.asarray(lengths),
        }
        _, _, _, m = step(gs, ds, init_lambda_state(0.01), b, key, jnp.float32(0.7))
        metrics[name] = m
    for k in ("cap_loss", "loss_G", "loss_D", "wasserstein", "grad_penalty"):
        np.testing.assert_array_equal(
            np.asarray(metrics["fp32"][k]), np.asarray(metrics["bf16"][k]), err_msg=k
        )
