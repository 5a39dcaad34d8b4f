"""Interleaved A/B (round 4): one-step-lagged metric consumption in the train
loop (train/trainer.py).

eager  — dispatch step i, immediately float(metrics['cap_loss']) (the
         pre-change loop shape: the host sync serializes with the device)
lagged — dispatch step i, then fetch step i-1's metrics (the shipped shape:
         the fetch overlaps step i's device time)

Both run the SAME jitted GAN step over the same batch; the measured delta is
purely the loop structure. Expected win ~= the device->host RTT per step
(~30 ms on the relay; ~zero on a direct-attached chip).

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3000 python scripts/ab_train_lag_r4.py
"""
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bisect_results.jsonl")
V, B, STEPS, ROUNDS = 10000, 128, 10, 4


def log(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.gan_lambda import init_lambda_state
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    lengths = jnp.asarray(rng.integers(5, cfg.max_words, size=(B,)), jnp.int32)
    batch = {"frames": frames, "regions": regions, "captions": captions, "lengths": lengths}

    gen = CapGnnModel(cfg, V)
    disc = DiscV2(cfg, V)
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, V)
    _, att = make_masks(captions)
    alpha = jnp.ones((B, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((B, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    step = make_gan_train_step(gen, disc, cfg)
    key = jax.random.key(7, impl=cfg.rng_impl)

    # the step DONATES its state arguments, so fresh states must be rebuilt
    # from host copies (the originals are invalidated by the first call)
    g_host = jax.device_get(g_vars["params"])
    d_host = jax.device_get(d_vars["params"])

    def fresh_states():
        return (
            TrainState.create(jax.device_put(g_host), make_optimizer(1.6e-4)),
            TrainState.create(jax.device_put(d_host), make_optimizer(1.6e-4)),
            init_lambda_state(0.01),
        )

    print("compiling train step...", file=sys.stderr, flush=True)
    gs, ds, ls = fresh_states()
    gs, ds, ls, m = step(gs, ds, ls, batch, key, jnp.float32(0.9))
    _ = float(np.asarray(m["cap_loss"]))
    print("compiled", file=sys.stderr, flush=True)

    def eager(gs, ds, ls):
        for _ in range(STEPS):
            gs, ds, ls, m = step(gs, ds, ls, batch, key, jnp.float32(0.9))
            _ = float(np.asarray(m["cap_loss"]))  # sync every step
        return gs, ds, ls

    def lagged(gs, ds, ls):
        pending = None
        for _ in range(STEPS):
            gs, ds, ls, m = step(gs, ds, ls, batch, key, jnp.float32(0.9))
            if pending is not None:
                _ = float(np.asarray(pending["cap_loss"]))
            pending = m
        _ = float(np.asarray(pending["cap_loss"]))
        return gs, ds, ls

    times = {"eager": [], "lagged": []}
    for r in range(ROUNDS):
        for name, fn in (("eager", eager), ("lagged", lagged)):
            gs, ds, ls = fresh_states()
            t0 = time.perf_counter()
            gs, ds, ls = fn(gs, ds, ls)
            dt = (time.perf_counter() - t0) / STEPS
            times[name].append(dt)
            print(f"round {r} {name}: {dt*1e3:.1f} ms/step", flush=True)

    med = {k: statistics.median(v) for k, v in times.items()}
    rec = {
        "tag": "train_lag_ab_r4",
        "steps": STEPS,
        "batch": B,
        "eager_ms_per_step": round(med["eager"] * 1e3, 1),
        "lagged_ms_per_step": round(med["lagged"] * 1e3, 1),
        "speedup": round(med["eager"] / med["lagged"], 3),
        "device": str(jax.devices()[0]),
    }
    log(rec)


if __name__ == "__main__":
    main()
