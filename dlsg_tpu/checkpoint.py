"""Checkpoint / resume via orbax.

Parity with the reference's two mechanisms (SURVEY.md §5):
1. best-metric model saving (ResultHandler/SAVING_MODEL_NAME, utils.py:110-146)
   -> `save_model` with a metric-named subdir;
2. full training checkpoints `{epoch, model, optimizer, D, optimizer_D,
   cap_list}` (run_gun.py:302-310) -> `save_train` / `restore_train`, which also
   restore the LR schedule position and the GANLambdaHandler loss window
   (run_gun.py:53-61,92-109).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_model(ckpt_dir: str, name: str, params: Any) -> str:
    """Save generator params under a metric-named dir (best-Bleu_4/CIDEr)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    _ckptr().save(path, jax.device_get(params), force=True)
    return path


def restore_model(ckpt_dir: str, name: str, template: Any) -> Any:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    return _ckptr().restore(path, item=jax.device_get(template))


def save_train(
    ckpt_dir: str,
    epoch: int,
    gen_state,
    disc_state=None,
    lambda_state=None,
) -> str:
    """Full training checkpoint, one dir per epoch (run_gun.py:302-310).

    `lambda_state` is the on-device GAN-lambda machine
    (`train.gan_lambda.init_lambda_state`) — the reference saves the raw
    cap_list for the same resume purpose.
    """
    # opt states are stored as flat leaf lists (their pytree structure —
    # optax NamedTuples — is re-imposed from a fresh state at restore time)
    payload: Dict[str, Any] = {
        "epoch": np.asarray(epoch),
        "gen_params": jax.device_get(gen_state.params),
        "gen_opt_leaves": jax.device_get(jax.tree_util.tree_leaves(gen_state.opt_state)),
        # the step counter seeds the per-step model rngs (_model_rngs); with
        # the trainers' per-epoch host rng streams (fold_in(base, epoch) at
        # each epoch start) it makes an epoch-boundary resume reproduce the
        # uninterrupted run's draws exactly (test_gan_trainer_auto_resume_
        # continuity)
        "gen_step": jax.device_get(gen_state.step),
    }
    if disc_state is not None:
        payload["disc_params"] = jax.device_get(disc_state.params)
        payload["disc_opt_leaves"] = jax.device_get(
            jax.tree_util.tree_leaves(disc_state.opt_state)
        )
        payload["disc_step"] = jax.device_get(disc_state.step)
    if lambda_state is not None:
        payload["gan_lambda_state"] = jax.device_get(lambda_state)
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    _ckptr().save(path, payload, force=True)
    return path


def restore_train(
    ckpt_dir: str, epoch: int, gen_state, disc_state=None, lambda_state=None
) -> Dict[str, Any]:
    """Restore a full checkpoint into fresh states.

    Returns {'epoch', 'gen_state', 'disc_state', 'gan_lambda_state'}.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, f"epoch_{epoch}"))
    restored = _ckptr().restore(path)

    def refit_opt(state, leaves):
        treedef = jax.tree_util.tree_structure(state.opt_state)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    import jax.numpy as jnp

    def _step(key, fallback):
        # older checkpoints lack the step counter; keep the fresh state's
        return (
            jnp.asarray(restored[key], jnp.int32)
            if restored.get(key) is not None
            else fallback
        )

    out = {
        "epoch": int(restored["epoch"]),
        "gen_state": gen_state.replace(
            params=restored["gen_params"],
            opt_state=refit_opt(gen_state, restored["gen_opt_leaves"]),
            step=_step("gen_step", gen_state.step),
        ),
        "gan_lambda_state": None,
    }
    if restored.get("gan_lambda_state") is not None and lambda_state is not None:
        out["gan_lambda_state"] = jax.tree_util.tree_map(
            lambda tpl, arr: jnp.asarray(arr, tpl.dtype),
            lambda_state,
            restored["gan_lambda_state"],
        )
    if disc_state is not None:
        out["disc_state"] = disc_state.replace(
            params=restored["disc_params"],
            opt_state=refit_opt(disc_state, restored["disc_opt_leaves"]),
            step=_step("disc_step", disc_state.step),
        )
    return out


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    """Highest epoch_N subdir, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    epochs = [
        int(d.split("_", 1)[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("epoch_") and d.split("_", 1)[1].isdigit()
    ]
    return max(epochs) if epochs else None
