"""Adaptive GAN loss weight.

Parity with `utils/utils.py:196-265` (GANLambdaHandler): watch a 200-step window
of caption loss; while stable, hold lambda at its start value (0.01); if the
recent half-window mean rises more than 4% over the earlier half, enter a
'decrease' state that follows a 500-step half-sinusoid from lambda_0 down to
0.006 and back, then return to stable.

Two implementations with identical semantics (tests/test_train.py asserts exact
agreement):

- `GANLambdaHandler` — the host-side port, kept for reference-shaped workflows.
- `init_lambda_state` / `lambda_update` — an ON-DEVICE state machine (ring
  buffer + precomputed schedule tables, branchless `jnp.where` selects) that
  lives inside the jitted GAN step. This reproduces the reference's exact
  ordering (`run_gun.py:210-231`: step-N lambda is computed from step-N's
  cap_loss *before* the generator update) with zero host synchronization —
  the round-1 host version necessarily applied lambda with a one-step lag.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

STABLE, DECREASE, INCREASE = 0, 1, 2


def _sin_schedule(counter: int, start: float, low: float, phase: float) -> List[float]:
    base = (start - low) / 2.0
    xs = np.arange(int(counter * (phase + 1.0)))[int(counter * phase):]
    ys = np.sin(2 * np.pi * 0.5 * xs / counter) * base + base + low
    return ys.tolist()


class GANLambdaHandler:
    def __init__(
        self,
        total_step: int,
        gan_lambda: float,
        cap_list: Optional[Sequence[float]] = None,
        window: int = 200,
        counter: int = 500,
        low_gan_lambda: float = 0.006,
    ):
        self.cap_list: List[float] = list(cap_list) if cap_list is not None else []
        self.total_step = total_step
        self.window = window
        self.counter = counter
        self.current_schedule_step = 0
        self.start_gan_lambda = gan_lambda
        self.low_gan_lambda = low_gan_lambda
        # decrease: sine phase [0.5, 1.5); increase: [1.5, 2.5) (utils.py:249-265)
        self.decrease_schedule = _sin_schedule(counter, gan_lambda, low_gan_lambda, 0.5)
        self.increase_schedule = _sin_schedule(counter, gan_lambda, low_gan_lambda, 1.5)
        self.current_lambda = gan_lambda
        self.state = STABLE

    def update_gan_lambda(self, epoch: int, step: int, cap_loss: float) -> None:
        """Feed the latest caption loss (utils.py:214-235)."""
        self.cap_list.append(float(cap_loss))
        w = self.window
        if len(self.cap_list) > w:
            self.cap_list = self.cap_list[-w:]
            if self.state == STABLE:
                loss_first = float(np.mean(self.cap_list[: w // 2]))
                loss_last = float(np.mean(self.cap_list[w // 2 :]))
                if loss_last > loss_first * 1.04:
                    self.state = DECREASE
            else:
                if self.current_schedule_step == self.counter - 1:
                    self.current_schedule_step = 0
                    self.state = STABLE

    def get_current_lambda(self) -> float:
        """Advance the active schedule and return lambda (utils.py:237-247)."""
        if self.state == DECREASE:
            self.current_lambda = self.decrease_schedule[self.current_schedule_step]
            self.current_schedule_step += 1
        elif self.state == INCREASE:
            self.current_lambda = self.increase_schedule[self.current_schedule_step]
            self.current_schedule_step += 1
        return self.current_lambda


# ---------------------------------------------------------------------------
# On-device state machine (lives inside the jitted GAN step)
# ---------------------------------------------------------------------------

def init_lambda_state(
    gan_lambda: float,
    window: int = 200,
    counter: int = 500,
    low_gan_lambda: float = 0.006,
):
    """Initial device-side lambda state (a dict of jnp arrays, checkpointable).

    The schedule tables ride in the state so the jitted step needs no closure
    constants and resume restores the exact machine.
    """
    import jax.numpy as jnp

    return {
        "window": jnp.zeros((window,), jnp.float32),
        "count": jnp.int32(0),
        "state": jnp.int32(STABLE),
        "sched_step": jnp.int32(0),
        "current_lambda": jnp.float32(gan_lambda),
        "dec_schedule": jnp.asarray(
            _sin_schedule(counter, gan_lambda, low_gan_lambda, 0.5), jnp.float32
        ),
        "inc_schedule": jnp.asarray(
            _sin_schedule(counter, gan_lambda, low_gan_lambda, 1.5), jnp.float32
        ),
    }


def lambda_update(lstate, cap_loss):
    """update_gan_lambda + get_current_lambda fused, on device (exact semantics).

    Returns (new_state, lambda) where lambda reflects THIS step's cap_loss,
    matching the reference call order at run_gun.py:210-231.
    """
    import jax.numpy as jnp

    w = lstate["window"].shape[0]
    counter = lstate["dec_schedule"].shape[0]
    pos = lstate["count"] % w
    window = lstate["window"].at[pos].set(cap_loss.astype(jnp.float32))
    count = lstate["count"] + 1
    state, sched = lstate["state"], lstate["sched_step"]

    # --- update_gan_lambda (utils.py:214-235): only acts once the window is full
    full = count > w
    ordered = jnp.roll(window, -(count % w))  # oldest-first view of the ring
    loss_first = jnp.mean(ordered[: w // 2])
    loss_last = jnp.mean(ordered[w // 2 :])
    trigger = full & (state == STABLE) & (loss_last > loss_first * 1.04)
    reset = full & (state != STABLE) & (sched == counter - 1)
    state = jnp.where(trigger, DECREASE, jnp.where(reset, STABLE, state))
    sched = jnp.where(reset, 0, sched)

    # --- get_current_lambda (utils.py:237-247)
    idx = jnp.clip(sched, 0, counter - 1)
    table_val = jnp.where(
        state == DECREASE, lstate["dec_schedule"][idx], lstate["inc_schedule"][idx]
    )
    active = state != STABLE
    lam = jnp.where(active, table_val, lstate["current_lambda"])
    sched = jnp.where(active, sched + 1, sched)

    new_state = dict(
        lstate,
        window=window,
        count=count,
        state=state,
        sched_step=sched,
        current_lambda=lam,
    )
    return new_state, lam
