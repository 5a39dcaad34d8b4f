"""Training subsystem tests: optimizers, schedules, GAN lambda, train steps."""

import numpy as np
import pytest

from dlsg_tpu.train.gan_lambda import DECREASE, STABLE, GANLambdaHandler
from dlsg_tpu.train.optim import multistep_lr
from dlsg_tpu.train.schedule import saving_schedule, scheduled_sampling_epsilon


def test_multistep_lr_matches_torch_semantics():
    """G: milestones [4,7] gamma .5 (run_gun.py:94-95)."""
    base = 1.6e-4
    assert multistep_lr(base, (4, 7), 0.5, 0) == base
    assert multistep_lr(base, (4, 7), 0.5, 3) == base
    assert multistep_lr(base, (4, 7), 0.5, 4) == base * 0.5
    assert multistep_lr(base, (4, 7), 0.5, 6) == base * 0.5
    assert multistep_lr(base, (4, 7), 0.5, 7) == base * 0.25
    assert multistep_lr(base, (1, 4), 0.5, 1) == base * 0.5  # D milestones


def test_scheduled_sampling_floor():
    # epoch 0: ss/(ss+1) close to 1 -> epsilon near 0.95 for ss=20
    e0 = scheduled_sampling_epsilon(20, 0)
    assert 0.9 < e0 < 1.0
    # very late epochs floor at 0.6 (run_gun.py:136)
    assert scheduled_sampling_epsilon(20, 200) == 0.6
    # msr-vtt per-step variant differs across the epoch halves
    a = scheduled_sampling_epsilon(20, 2, "msr-vtt", step=0, total_steps=100)
    b = scheduled_sampling_epsilon(20, 2, "msr-vtt", step=99, total_steps=100)
    assert a > b


def test_saving_schedule_density():
    assert len(saving_schedule(0, 100)) == 2
    assert len(saving_schedule(5, 100)) == 8
    assert len(saving_schedule(10, 120, "msr-vtt")) == 12
    assert len(saving_schedule(10, 120, "msvd")) == 8
    assert saving_schedule(0, 100)[-1] == 100


def test_gan_lambda_stable_then_decrease():
    h = GANLambdaHandler(total_step=100, gan_lambda=0.01)
    # stable: flat loss keeps lambda at 0.01
    for i in range(250):
        h.update_gan_lambda(0, i, 3.0)
        lam = h.get_current_lambda()
    assert h.state == STABLE
    assert lam == 0.01
    # rising loss (>4% over window halves) triggers decrease
    for i in range(100):
        h.update_gan_lambda(0, i, 3.0)
    for i in range(101):
        h.update_gan_lambda(0, i, 3.5)
    assert h.state == DECREASE
    lam = h.get_current_lambda()
    assert lam <= 0.01
    # schedule bottoms out near low_gan_lambda and recovers to stable
    lams = [h.get_current_lambda() for _ in range(499)]
    assert min(lams) >= 0.006 - 1e-9
    assert min(lams) < 0.0065
    h.update_gan_lambda(1, 0, 3.5)  # completes the cycle counter
    assert h.current_schedule_step in (0, 500)


def test_device_lambda_matches_host_exactly():
    """The on-device state machine (used inside the jitted GAN step) must track
    the host GANLambdaHandler bit-for-bit through a full stable->decrease->
    stable cycle, when driven in the reference's update-then-get order."""
    import jax
    import jax.numpy as jnp

    from dlsg_tpu.train.gan_lambda import init_lambda_state, lambda_update

    h = GANLambdaHandler(total_step=100, gan_lambda=0.01)
    lstate = init_lambda_state(0.01)
    upd = jax.jit(lambda_update)

    rng = np.random.default_rng(0)
    # flat losses, then a sharp rise (triggers decrease), then a long flat run
    # (runs the full 500-step schedule and resets to stable)
    losses = np.concatenate(
        [
            3.0 + 0.01 * rng.standard_normal(250),
            np.linspace(3.0, 4.0, 150),
            4.0 + 0.01 * rng.standard_normal(700),
        ]
    ).astype(np.float32)

    states_seen = set()
    for n, loss in enumerate(losses):
        h.update_gan_lambda(0, n, float(loss))
        lam_host = h.get_current_lambda()
        lstate, lam_dev = upd(lstate, jnp.float32(loss))
        assert float(lam_dev) == pytest.approx(lam_host, abs=1e-7), (n, h.state)
        assert int(lstate["state"]) == h.state, n
        assert int(lstate["sched_step"]) == h.current_schedule_step, n
        states_seen.add(h.state)
    assert DECREASE in states_seen  # the interesting path was exercised
    assert int(lstate["state"]) == STABLE  # and completed a full cycle


def test_gan_lambda_schedule_lengths():
    h = GANLambdaHandler(100, 0.01)
    assert len(h.decrease_schedule) == 500
    assert len(h.increase_schedule) == 500
    # decrease starts at the top (~start value), sine phase 0.5
    np.testing.assert_allclose(h.decrease_schedule[0], 0.01, atol=1e-4)


def test_grad_clip_option():
    """grad_clip clamps gradients elementwise before Adam (utils.py:46-50)."""
    import jax
    import jax.numpy as jnp

    from dlsg_tpu.train.optim import TrainState, make_optimizer

    params = {"w": jnp.zeros((3,))}
    grads = {"w": jnp.array([100.0, -100.0, 0.001])}
    s_clip = TrainState.create(params, make_optimizer(1.0, grad_clip=1.0))
    s_free = TrainState.create(params, make_optimizer(1.0))
    w_clip = np.asarray(s_clip.apply_gradients(grads).params["w"])
    w_free = np.asarray(s_free.apply_gradients(grads).params["w"])
    # with Adam both move by ~lr, but the clipped tiny-grad element differs:
    # clip keeps 0.001 as-is; check states diverge for the saturated entries
    assert np.isfinite(w_clip).all() and np.isfinite(w_free).all()
    # lr injection still works with the chained optimizer
    s2 = s_clip.set_learning_rate(0.5)
    assert float(s2.opt_state.hyperparams["learning_rate"]) == 0.5
