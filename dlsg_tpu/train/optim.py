"""Optimizers and train state.

Reference setup (`run_gun.py:91-104`): Adam(lr=1.6e-4, betas=(0.5, 0.9)) for both
generator and discriminator, with MultiStepLR milestones [4, 7] (G) and [1, 4]
(D), gamma 0.5, stepped per epoch. The learning rate is injected as a mutable
hyperparameter so the host can set it each epoch without recompiling the step.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct


def multistep_lr(
    base_lr: float, milestones: Sequence[int], gamma: float, epoch: int
) -> float:
    """torch MultiStepLR semantics: lr = base * gamma^|{m : m <= epoch}|."""
    n = sum(1 for m in milestones if m <= epoch)
    return base_lr * (gamma**n)


def make_optimizer(
    learning_rate: float, grad_clip: float = 0.0, frozen_paths: Sequence[str] = ()
) -> optax.GradientTransformation:
    """Adam with the reference betas (run_gun.py:91,100), lr injectable.

    grad_clip > 0 adds elementwise gradient clamping to [-c, c] — the
    reference defines this (`clip_gradient`, utils/utils.py:46-50, flag
    grad_clip=10) but leaves every call site commented out, so it defaults
    off here too.

    frozen_paths: parameter subtrees (matched by path-component name, e.g.
    "word_embed") whose updates are zeroed — the optax equivalent of the
    reference's `requires_grad = False` on the grafted word embedding
    (models/model.py:52-53).
    """

    def adam_with_clip(learning_rate):
        tx = optax.adam(learning_rate=learning_rate, b1=0.5, b2=0.9)
        if grad_clip > 0:
            tx = optax.chain(optax.clip(grad_clip), tx)
        if frozen_paths:
            names = frozenset(frozen_paths)

            def label(params):
                def walk(tree, frozen):
                    if not isinstance(tree, dict):
                        return "frozen" if frozen else "train"
                    return {
                        k: walk(v, frozen or k in names) for k, v in tree.items()
                    }

                return walk(params, False)

            tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()}, label
            )
        return tx

    return optax.inject_hyperparams(adam_with_clip)(learning_rate=learning_rate)


class TrainState(struct.PyTreeNode):
    """Minimal functional train state (params + optimizer state)."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        return cls(
            step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    def set_learning_rate(self, lr: float) -> "TrainState":
        """Host-side per-epoch LR update (MultiStepLR equivalent)."""
        opt_state = self.opt_state
        hyper = opt_state.hyperparams
        hyper = dict(hyper)
        hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=opt_state._replace(hyperparams=hyper))
