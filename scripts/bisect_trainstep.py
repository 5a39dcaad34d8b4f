"""Where do 147.7 ms of GAN step go? Parts summed to ~60 ms (bisect_results:
train_G_fwd_bwd 14.9, D substep 4.2 x5, encode 10.3 shared) — this script
times the REAL phases exactly as steps.py composes them.

Appends to scripts/bisect_results.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bisect_results.jsonl")
V = 10000
B = 128


def _fetch(x):
    return float(np.asarray(x))


def _null_overhead(repeats=8):
    null = jax.jit(lambda x: x + 1.0)
    s = jnp.float32(0)
    _fetch(null(s))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = null(s)
        _fetch(s)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def record_state(name, fn, state, args, repeats=5):
    """fn(state, *args) -> (state, scalar); times the chained call. All big
    arrays must be in `args` (closure constants embed in the HLO and the
    compile POST kills the relay)."""
    jf = jax.jit(fn)
    t0 = time.perf_counter()
    state, c = jf(state, *args)
    _fetch(c)
    compile_s = time.perf_counter() - t0
    overhead = _null_overhead()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, c = jf(state, *args)
        _fetch(c)
        ts.append(time.perf_counter() - t0)
    ms = (statistics.median(ts) - overhead) * 1e3
    rec = {"name": name, "ms": round(ms, 3), "compile_s": round(compile_s, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(rec, file=sys.stderr, flush=True)
    return state


def main():
    rng = np.random.default_rng(0)
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.ops.losses import masked_cross_entropy, to_onehot, wgan_d_loss, wgan_g_loss
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_masks, _model_rngs

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "START_TS", "device": str(jax.devices()[0])}) + "\n")

    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    lengths = jnp.full((B,), cfg.max_words, jnp.int32)

    gen = CapGnnModel(cfg, V)
    disc = DiscV2(cfg, V)
    gvars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    _, att_mask = make_masks(captions)
    r_caption = to_onehot(captions, V)
    alpha1 = jnp.ones((B, cfg.max_words, 2 * cfg.num_proposals)) / (2 * cfg.num_proposals)
    obj0 = jnp.zeros((B, cfg.num_proposals, cfg.visual_hidden_size))
    dvars = disc.init(jax.random.PRNGKey(3), r_caption, obj0, obj0, att_mask, alpha1)

    gstate0 = TrainState.create(gvars["params"], make_optimizer(1.6e-4))
    dstate0 = TrainState.create(dvars["params"], make_optimizer(1.6e-4))
    key = jax.random.PRNGKey(9)
    eps = jnp.float32(0.75)

    # ---- detached G forward with dropout + scheduled sampling (D-phase input)
    def g_fwd_train(gstate, frames, regions, captions):
        out, obj, mot, alpha = gen.apply(
            {"params": gstate.params}, frames, regions, captions, eps, False,
            rngs=_model_rngs(key, gstate.step),
        )
        return gstate, jnp.sum(out[:, 0, :8]).astype(jnp.float32)

    record_state("ts_G_fwd_dropout_ss", g_fwd_train, gstate0, (frames, regions, captions))

    # ---- same but deterministic (isolates dropout/rng + ss cost)
    def g_fwd_det(gstate, frames, regions, captions):
        out, obj, mot, alpha = gen.apply(
            {"params": gstate.params}, frames, regions, captions, 1.0, True,
        )
        return gstate, jnp.sum(out[:, 0, :8]).astype(jnp.float32)

    record_state("ts_G_fwd_det", g_fwd_det, gstate0, (frames, regions, captions))

    # ---- full G phase: vjp of CE + disc score, adam update
    def g_phase(gstate, frames, regions, captions, att_mask, lengths, dparams):
        def g_losses_fn(gparams):
            out, obj, mot, alpha = gen.apply(
                {"params": gparams}, frames, regions, captions, eps, False,
                rngs=_model_rngs(key, gstate.step),
            )
            cap_loss = masked_cross_entropy(out, captions, lengths)
            f_logit = disc.apply(
                {"params": dparams}, out,
                jax.lax.stop_gradient(obj), jax.lax.stop_gradient(mot),
                att_mask, jax.lax.stop_gradient(alpha), False,
                rngs={"dropout": key},
            )
            return (cap_loss, wgan_g_loss(f_logit)), 0

        (cap_loss, loss_g), g_vjp, _ = jax.vjp(g_losses_fn, gstate.params, has_aux=True)
        (grads,) = g_vjp((jnp.float32(1.0), jnp.float32(0.01)))
        gstate = gstate.apply_gradients(grads=grads)
        return gstate, cap_loss.astype(jnp.float32)

    record_state("ts_G_phase_full", g_phase, gstate0,
                 (frames, regions, captions, att_mask, lengths, dstate0.params))

    # ---- D phase: exact 5-substep scan with adam updates
    f_caption = jax.lax.stop_gradient(
        gen.apply({"params": gstate0.params}, frames, regions, captions)[0]
    )

    def d_phase(dstate, r_caption, f_caption, att_mask, alpha1, obj0):
        def d_substep(ds, sub_rng):
            k_eps, k_drop = jax.random.split(sub_rng)
            eps_gp = jax.random.uniform(k_eps, (B, 1, 1))

            def d_loss_fn(dparams):
                def d_fn(caps):
                    return disc.apply({"params": dparams}, caps, obj0, obj0,
                                      att_mask, alpha1, False, rngs={"dropout": k_drop})

                return wgan_d_loss(d_fn, r_caption, f_caption, eps_gp)

            (l, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(ds.params)
            return ds.apply_gradients(grads=grads), l

        dstate, ls = jax.lax.scan(d_substep, dstate, jax.random.split(key, 5))
        return dstate, jnp.sum(ls).astype(jnp.float32)

    record_state("ts_D_phase_scan5", d_phase, dstate0,
                 (r_caption, f_caption, att_mask, alpha1, obj0))

    # ---- D phase unrolled (is lax.scan the problem?)
    def d_phase_unrolled(dstate, r_caption, f_caption, att_mask, alpha1, obj0):
        def d_substep(ds, sub_rng):
            k_eps, k_drop = jax.random.split(sub_rng)
            eps_gp = jax.random.uniform(k_eps, (B, 1, 1))

            def d_loss_fn(dparams):
                def d_fn(caps):
                    return disc.apply({"params": dparams}, caps, obj0, obj0,
                                      att_mask, alpha1, False, rngs={"dropout": k_drop})

                return wgan_d_loss(d_fn, r_caption, f_caption, eps_gp)

            (l, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(ds.params)
            return ds.apply_gradients(grads=grads), l

        tot = jnp.float32(0)
        for sk in jax.random.split(key, 5):
            dstate, l = d_substep(dstate, sk)
            tot = tot + l
        return dstate, tot.astype(jnp.float32)

    record_state("ts_D_phase_unrolled5", d_phase_unrolled, dstate0,
                 (r_caption, f_caption, att_mask, alpha1, obj0))

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE_TS"}) + "\n")


if __name__ == "__main__":
    main()
