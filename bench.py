"""Benchmark: beam-5 caption decoding throughput (the north-star serving metric).

Measures captions/sec of the flagship CapGnnModel with beam search (beam=5) at
MSR-VTT dimensions on the available accelerator, plus clips/sec of the full
D-LSG GAN training step, and prints ONE JSON line.

The reference never measured throughput (SURVEY.md §6) and publishes no numbers
(`BASELINE.json: published = {}`), so `vs_baseline` is reported against the
previous round's value when BENCH_prev.json exists, else 1.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_decode(cfg, vocab_size=10000, batch=128, iters=5, warmup=2):
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    model = CapGnnModel(cfg, vocab_size)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.feature_size)), jnp.float32
    )
    regions = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, vocab_size, size=(batch, cfg.max_words)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)
    decode = make_decode_fn(model, cfg, beam_size=5)

    for _ in range(warmup):
        jax.block_until_ready(decode(variables, frames, regions))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(decode(variables, frames, regions))
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_train(cfg, vocab_size=10000, batch=128, iters=5, warmup=2):
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    gen = CapGnnModel(cfg, vocab_size)
    disc = DiscV2(cfg, vocab_size)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.feature_size)), jnp.float32
    )
    regions = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, vocab_size, size=(batch, cfg.max_words)), jnp.int32)
    lengths = jnp.asarray(rng.integers(5, cfg.max_words, size=(batch,)), jnp.int32)
    batch_d = {"frames": frames, "regions": regions, "captions": captions, "lengths": lengths}

    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, vocab_size)
    _, att = make_masks(captions)
    alpha = jnp.ones((batch, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((batch, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    gstate = TrainState.create(g_vars["params"], make_optimizer(1.6e-4))
    dstate = TrainState.create(d_vars["params"], make_optimizer(1.6e-4))
    step = make_gan_train_step(gen, disc, cfg)
    key = jax.random.PRNGKey(2)

    for _ in range(warmup):
        gstate, dstate, m = step(gstate, dstate, batch_d, key, jnp.float32(0.9), jnp.float32(0.01))
        jax.block_until_ready(m["cap_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        gstate, dstate, m = step(gstate, dstate, batch_d, key, jnp.float32(0.9), jnp.float32(0.01))
        jax.block_until_ready(m["cap_loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt"))
    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 128 if on_tpu else 8
    iters = 5 if on_tpu else 1

    decode_cps, decode_dt = bench_decode(cfg, batch=batch, iters=iters)
    train_cps, train_dt = bench_train(cfg, batch=batch, iters=iters)

    vs = 1.0
    prev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_prev.json")
    if os.path.exists(prev_path):
        try:
            prev = json.load(open(prev_path))
            if prev.get("value"):
                vs = decode_cps / float(prev["value"])
        except Exception:
            pass

    result = {
        "metric": "captions_per_sec_beam5_msrvtt",
        "value": round(decode_cps, 2),
        "unit": "captions/s",
        "vs_baseline": round(vs, 3),
        "extra": {
            "decode_step_ms": round(decode_dt * 1e3, 1),
            "train_clips_per_sec_gan": round(train_cps, 2),
            "train_step_ms": round(train_dt * 1e3, 1),
            "batch": batch,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
