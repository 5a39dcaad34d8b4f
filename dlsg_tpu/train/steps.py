"""Jitted train steps.

One compiled function per phase, mirroring the reference loop structure
(`run_gun.py:147-234`) but fully on-device:

- CE step: teacher-forced generator forward + masked CE + Adam update
  (`run_gun.py:181-234` without the GAN terms; `run_graph.py:109-134`).
- GAN step: (a) generator forward with outputs detached, (b) `num_D` WGAN-GP
  discriminator sub-steps as a `lax.scan` carrying the D train state
  (`run_gun.py:339-383`, reference runs 5 Python-loop substeps), (c) generator
  update with `cap_loss + lambda * (-D(fake))` (`run_gun.py:210-234`).

Parallelism: steps are jitted with batch inputs sharded over the mesh `data`
axis and states replicated — XLA inserts the gradient all-reduce (replacing
DDP's bucketed NCCL allreduce). Logged scalars are global means, matching the
reference's `reduce_tensor` all-reduce (`run_gun.py:433-437`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.ops.losses import (
    GP_WEIGHT,
    gradient_penalty,
    make_gradient_penalty_rof,
    masked_cross_entropy,
    to_onehot,
    wgan_g_loss,
)
from dlsg_tpu.parallel.mesh import DATA_AXIS
from dlsg_tpu.train.gan_lambda import lambda_update
from dlsg_tpu.train.optim import TrainState


def _model_rngs(rng, step):
    rng = jax.random.fold_in(rng, step)
    k1, k2 = jax.random.split(rng)
    return {"dropout": k1, "sample": k2}


def make_masks(captions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """seq mask (captions > 0) and its outer-product attention mask
    (run_gun.py:164-166)."""
    seq_mask = (captions > 0).astype(jnp.float32)
    att_mask = seq_mask[:, :, None] * seq_mask[:, None, :]
    return seq_mask, att_mask


def make_ce_train_step(model, cfg: DLSGConfig, mesh: Optional[Mesh] = None):
    """CE-only generator step (run_graph.py:109-134 semantics)."""

    def step(state: TrainState, batch: Dict[str, Any], rng, epsilon):
        def loss_fn(params):
            out, *_ = model.apply(
                {"params": params},
                batch["frames"],
                batch["regions"],
                batch["captions"],
                epsilon,
                False,
                rngs=_model_rngs(rng, state.step),
            )
            loss = masked_cross_entropy(out, batch["captions"], batch["lengths"])
            return loss, jnp.argmax(out[0], axis=-1)

        (loss, sample), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), {"cap_loss": loss, "sample_tokens": sample}

    return _jit_step(step, mesh, donate=(0,))


def make_gan_train_step(gen_model, disc_model, cfg: DLSGConfig, mesh: Optional[Mesh] = None):
    """Full D-LSG adversarial step (run_gun.py:147-234 + train_disc).

    The adaptive GAN lambda is part of the step: `lstate` (see
    `gan_lambda.init_lambda_state`) is updated with THIS step's cap_loss and the
    resulting lambda weights THIS step's generator gradient — the exact
    reference ordering (run_gun.py:210-231). The G phase runs ONE forward via
    `jax.vjp`; the gradient of `cap_loss + lambda * loss_G` is the cotangent
    pullback `(1.0, lambda)` (lambda carries no gradient in the reference
    either — it is a python scalar there).
    """
    vocab_size = gen_model.vocab_size
    num_d = cfg.num_D_visual
    disc_remat_policy = {
        "none": None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "full": jax.checkpoint_policies.nothing_saveable,
    }[getattr(cfg, "disc_remat", "none")]
    gp_custom_vjp = getattr(cfg, "gan_gp_custom_vjp", True)  # match DLSGConfig default

    def step(
        gen_state: TrainState,
        disc_state: TrainState,
        lstate: Dict[str, Any],
        batch: Dict[str, Any],
        rng,
        epsilon,
    ):
        frames, regions = batch["frames"], batch["regions"]
        captions, lengths = batch["captions"], batch["lengths"]
        _, att_mask = make_masks(captions)
        r_caption = to_onehot(captions, vocab_size)

        rng_gfwd, rng_d, rng_g = jax.random.split(jax.random.fold_in(rng, gen_state.step), 3)
        single_fwd = getattr(cfg, "gan_single_forward", True)

        # ---- D phase: generator forward, everything detached (run_gun.py:167-178)
        if single_fwd:
            # ONE generator traversal serves BOTH phases: the reference runs
            # the forward twice (run_gun.py:167 for the D phase, :183 for the
            # G phase) purely for autograd convenience — G's params are
            # unchanged in between, and its loss depends on them ONLY through
            # the caption logits (obj/mot/alpha are stop-gradient'd at
            # :215-218). So: forward once with vjp, reuse the detached
            # outputs for the D substeps, and pull the G gradient back after
            # the D phase. Semantics note (documented deviation): the
            # reference's two forwards draw independent dropout/scheduled-
            # sampling noise, so its D phase trains against a DIFFERENT fake
            # sample than the one scoring G's update; sharing one draw
            # changes that correlation (not the objective's expectation).
            # Convergence-validated by tests/test_convergence.py; set
            # gan_single_forward=False for the exact two-draw schedule.
            def g_fwd(gparams):
                out, obj, mot, alpha = gen_model.apply(
                    {"params": gparams},
                    frames,
                    regions,
                    captions,
                    epsilon,
                    False,
                    rngs=_model_rngs(rng_gfwd, gen_state.step),
                )
                return out, (obj, mot, alpha)

            f_caption, fwd_vjp, (obj_psl, motion_psl, alpha_all) = jax.vjp(
                g_fwd, gen_state.params, has_aux=True
            )
        else:
            f_caption, obj_psl, motion_psl, alpha_all = gen_model.apply(
                {"params": gen_state.params},
                frames,
                regions,
                captions,
                epsilon,
                False,
                rngs=_model_rngs(rng_gfwd, gen_state.step),
            )
        f_caption = jax.lax.stop_gradient(f_caption)
        obj_psl = jax.lax.stop_gradient(obj_psl)
        motion_psl = jax.lax.stop_gradient(motion_psl)
        alpha_all = jax.lax.stop_gradient(alpha_all)

        # the substep scores real|fake in ONE grouped trunk pass (DiscV2
        # groups=2 — no input gradients needed for those terms) and runs the
        # gradient penalty separately at B: fully fusing interp in too
        # (wgan_d_loss_fused, groups=3) measured SLOWER (157.8 vs 126.7 ms
        # full step) because the input-grad and double-backward then run at
        # 3B — the zero-cotangent rows still pay dense backward flops
        obj2 = jnp.concatenate([obj_psl] * 2, axis=0)
        mot2 = jnp.concatenate([motion_psl] * 2, axis=0)
        att2 = jnp.concatenate([att_mask] * 2, axis=0)
        alpha2 = jnp.concatenate([alpha_all] * 2, axis=0)
        B = r_caption.shape[0]

        def d_substep(dstate: TrainState, sub_rng):
            k_eps, k_drop = jax.random.split(sub_rng)
            # draw in fp32 ALWAYS (a bf16 draw is a different random stream),
            # then cast to the caption dtype for the interpolation
            eps_gp = jax.random.uniform(k_eps, (f_caption.shape[0], 1, 1)).astype(
                r_caption.dtype
            )

            def apply_d(dparams, caps):
                return disc_model.apply(
                    {"params": dparams},
                    caps,
                    obj_psl,
                    motion_psl,
                    att_mask,
                    alpha_all,
                    False,
                    rngs={"dropout": k_drop},
                )

            def apply_d2(dparams, caps):
                return disc_model.apply(
                    {"params": dparams},
                    caps,
                    obj2,
                    mot2,
                    att2,
                    alpha2,
                    False,
                    groups=2,
                    rngs={"dropout": k_drop},
                )

            if disc_remat_policy is not None:
                apply_d2 = jax.checkpoint(apply_d2, policy=disc_remat_policy)

            def d_loss_fn(dparams):
                scores = apply_d2(
                    dparams, jnp.concatenate([r_caption, f_caption], axis=0)
                )
                r_loss = jnp.mean(scores[:B])
                f_loss = jnp.mean(scores[B:])
                if gp_custom_vjp:
                    mixed = r_caption * eps_gp + f_caption * (1.0 - eps_gp)
                    gp = make_gradient_penalty_rof(apply_d)(dparams, mixed)
                else:
                    gp = gradient_penalty(
                        lambda caps: apply_d(dparams, caps),
                        r_caption, f_caption, eps_gp,
                    )
                loss = f_loss - r_loss + GP_WEIGHT * gp
                return loss, {"wasserstein": r_loss - f_loss, "gp": gp}

            (loss_d, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                dstate.params
            )
            return dstate.apply_gradients(grads), (
                loss_d,
                aux["wasserstein"],
                aux["gp"],
            )

        disc_state, (d_losses, wassersteins, gps) = jax.lax.scan(
            d_substep,
            disc_state,
            jax.random.split(rng_d, num_d),
            unroll=getattr(cfg, "disc_scan_unroll", 1),
        )

        # ---- G phase (run_gun.py:183,215-218): loss head over the caption
        # logits; proposals/alpha detached before D
        if single_fwd:

            def head_fn(out):
                cap_loss = masked_cross_entropy(out, captions, lengths)
                f_logit = disc_model.apply(
                    {"params": disc_state.params},
                    out,  # raw logits, exactly like run_gun.py:218 feeds `tokens`
                    obj_psl,  # already detached (stop_gradient above)
                    motion_psl,
                    att_mask,
                    alpha_all,
                    False,
                    rngs={"dropout": jax.random.fold_in(rng_g, 1)},
                )
                loss_g = wgan_g_loss(f_logit)
                # first-sample argmax tokens for the WE/GT progress print
                # (run_gun.py:250-261)
                sample = jnp.argmax(out[0], axis=-1)
                return (cap_loss, loss_g), sample

            # pull the head cotangent back through the SHARED forward
            (cap_loss, loss_g), head_vjp, sample = jax.vjp(
                head_fn, f_caption, has_aux=True
            )
            lstate, gan_lambda = lambda_update(lstate, cap_loss)
            (d_out,) = head_vjp((jnp.float32(1.0), gan_lambda))
            (grads,) = fwd_vjp(d_out)
        else:
            # fresh forward with its own noise draw (exact two-draw schedule)
            def g_losses_fn(gparams):
                out, obj, mot, alpha = gen_model.apply(
                    {"params": gparams},
                    frames,
                    regions,
                    captions,
                    epsilon,
                    False,
                    rngs=_model_rngs(rng_g, gen_state.step),
                )
                cap_loss = masked_cross_entropy(out, captions, lengths)
                f_logit = disc_model.apply(
                    {"params": disc_state.params},
                    out,
                    jax.lax.stop_gradient(obj),
                    jax.lax.stop_gradient(mot),
                    att_mask,
                    jax.lax.stop_gradient(alpha),
                    False,
                    rngs={"dropout": jax.random.fold_in(rng_g, 1)},
                )
                loss_g = wgan_g_loss(f_logit)
                sample = jnp.argmax(out[0], axis=-1)
                return (cap_loss, loss_g), sample

            (cap_loss, loss_g), g_vjp, sample = jax.vjp(
                g_losses_fn, gen_state.params, has_aux=True
            )
            # step-N lambda from step-N cap_loss (run_gun.py:210-231), then
            # the pullback of total = cap_loss + lambda * loss_G
            lstate, gan_lambda = lambda_update(lstate, cap_loss)
            (grads,) = g_vjp((jnp.float32(1.0), gan_lambda))
        gen_state = gen_state.apply_gradients(grads)

        metrics = {
            "cap_loss": cap_loss,
            "loss_G": loss_g,
            "loss_D": jnp.mean(d_losses),
            "wasserstein": jnp.mean(wassersteins),
            "grad_penalty": jnp.mean(gps),
            "gan_lambda": gan_lambda,
            "sample_tokens": sample,
        }
        return gen_state, disc_state, lstate, metrics

    return _jit_step(step, mesh, donate=(0, 1, 2))


def _jit_step(step, mesh: Optional[Mesh], donate=()):
    """jit a step; when a mesh is given, constrain batch leaves to the data axis."""
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)

    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def wrapper(*args):
        # the batch dict (recognized by its "frames" key) gets its leading axis
        # sharded; everything else (states, lambda state, rng) stays replicated
        def place(x):
            if isinstance(x, dict) and "frames" in x:
                return {
                    k: jax.lax.with_sharding_constraint(jnp.asarray(v), batch_sh)
                    for k, v in x.items()
                }
            return x

        args = tuple(place(a) for a in args)
        return step(*args)

    return jax.jit(wrapper, donate_argnums=donate)
