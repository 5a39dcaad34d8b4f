"""Interleaved A/B (round 4): D-phase levers on the full GAN train step.

Variants (all numerics-preserving, tests/test_losses.py):
  base       — round-3 default (gan_single_forward=True)
  gp_rof     — WGAN-GP parameter gradient via reverse-over-forward custom VJP
               (ops/losses.py::make_gradient_penalty_rof) instead of
               autodiff's reverse-over-reverse
  remat_dots — jax.checkpoint(policy=dots_saveable) on the D substep's
               grouped trunk pass
  remat_full — jax.checkpoint(policy=nothing_saveable) on the same
  gp_remat   — gp_rof + remat_dots combined

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_dphase_r4.py
"""
import json, os, statistics, sys, time
from dataclasses import replace

import jax, jax.numpy as jnp, numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bisect_results.jsonl")
V, B = 10000, 128


def log(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _fetch(x):
    return float(np.asarray(x))


def _null_overhead(repeats=8):
    null = jax.jit(lambda x: x + 1.0)
    s = jnp.float32(0)
    _fetch(null(s))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        s = null(s); _fetch(s)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def build(cfg):
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.gan_lambda import init_lambda_state
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32)
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    lengths = jnp.asarray(rng.integers(5, cfg.max_words, size=(B,)), jnp.int32)
    batch = {"frames": frames, "regions": regions, "captions": captions, "lengths": lengths}
    gen, disc = CapGnnModel(cfg, V), DiscV2(cfg, V)
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, V)
    _, att = make_masks(captions)
    alpha = jnp.ones((B, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((B, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)
    step = make_gan_train_step(gen, disc, cfg)
    gstate = TrainState.create(g_vars["params"], make_optimizer(1.6e-4))
    dstate = TrainState.create(d_vars["params"], make_optimizer(1.6e-4))
    lstate = init_lambda_state(0.01)
    key = jax.random.key(7, impl=cfg.rng_impl)

    def chained(state):
        gs, ds, ls = state
        gs, ds, ls, m = step(gs, ds, ls, batch, key, jnp.float32(0.9))
        return (gs, ds, ls), m["cap_loss"]
    return chained, (gstate, dstate, lstate)


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    # NB: gan_gp_custom_vjp defaults to True since the round-4 flip — every
    # variant pins it EXPLICITLY so the autodiff baseline stays a baseline
    base = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16", gan_gp_custom_vjp=False)
    )
    variants = {
        "base": base,
        "gp_rof": replace(base, gan_gp_custom_vjp=True),
        "remat_dots": replace(base, disc_remat="dots"),
        "remat_full": replace(base, disc_remat="full"),
        "gp_remat": replace(base, gan_gp_custom_vjp=True, disc_remat="dots"),
    }
    runners = {}
    for name, cfg in variants.items():
        chained, state = build(cfg)
        t0 = time.perf_counter()
        state, loss = chained(state)
        _fetch(loss)
        print(f"{name} compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        runners[name] = (chained, state)

    overhead = _null_overhead()
    times = {k: [] for k in runners}
    for _ in range(10):
        for name, (chained, state) in runners.items():
            t0 = time.perf_counter()
            state, loss = chained(state)
            _fetch(loss)
            runners[name] = (chained, state)
            times[name].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "dphase_ab_r4"}
    for k, v in times.items():
        rec[k + "_ms"] = round(statistics.median(v), 2)
        rec["all_" + k] = [round(x, 2) for x in v]
    log(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
