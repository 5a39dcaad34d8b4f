"""Adaptive GAN loss weight.

Parity with `utils/utils.py:196-265` (GANLambdaHandler): watch a 200-step window
of caption loss; while stable, hold lambda at its start value (0.01); if the
recent half-window mean rises more than 4% over the earlier half, enter a
'decrease' state that follows a 500-step half-sinusoid from lambda_0 down to
0.006 and back, then return to stable. Pure host-side state threaded through the
training loop (it reads a *scalar* loss, so it never belongs inside jit).
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
