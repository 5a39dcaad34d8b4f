"""Benchmark: beam-5 decode throughput + GAN train throughput (north star).

Prints ONE JSON line: captions/sec of beam-5 decoding at MSR-VTT dimensions
(the serving metric), with the full D-LSG GAN training step's clips/sec in
`extra`.

Methodology (robust to the remote-TPU relay where `block_until_ready` does not
block and long compiles kill the relay connection):
- each measured function returns a tiny scalar that CHAINS between calls
  (call N+1 consumes call N's output), so repeated timed host fetches measure
  true per-step device time even under async dispatch;
- the constant fetch round-trip overhead (~30ms on the relay, <1ms locally) is
  measured with a null jit function and subtracted;
- only two large compilations are issued (plain decode, plain train step) —
  loop-wrapped variants exceed the relay's compile window.

The reference never measured throughput (SURVEY.md §6; BASELINE.json
published = {}); `vs_baseline` compares against BENCH_prev.json when present.
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


def _fetch(x) -> float:
    return float(np.asarray(x))


def _median_call_time(fn, state, repeats):
    """Median wall time of chained fn calls; returns (seconds, final_state)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = fn(state)
        _fetch(state if not isinstance(state, tuple) else state[-1])
        times.append(time.perf_counter() - t0)
    return statistics.median(times), state


def _null_overhead(repeats=10):
    null = jax.jit(lambda x: x + 1.0)
    s = jnp.float32(0)
    _fetch(null(s))
    t, _ = _median_call_time(lambda x: null(x), s, repeats)
    return t


def _example(cfg, vocab_size, batch, seed=0):
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.feature_size)), jnp.float32
    )
    regions = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(
        rng.integers(4, vocab_size, size=(batch, cfg.max_words)), jnp.int32
    )
    lengths = jnp.asarray(rng.integers(5, cfg.max_words, size=(batch,)), jnp.int32)
    return frames, regions, captions, lengths


def bench_decode(cfg, vocab_size, batch, repeats=8):
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    model = CapGnnModel(cfg, vocab_size)
    frames, regions, captions, _ = _example(cfg, vocab_size, batch)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)
    decode = make_decode_fn(model, cfg, beam_size=5)

    @jax.jit
    def step(c, variables, frames, regions):
        # the input perturbation chains successive calls (true serialization).
        # everything big is an ARGUMENT — closure constants would be embedded
        # in the HLO and shipped through the remote-compile relay.
        ids = decode(variables, frames + c * 1e-12, regions)
        return (jnp.sum(ids) % 97).astype(jnp.float32)

    print("bench: compiling decode...", file=sys.stderr, flush=True)
    _fetch(step(jnp.float32(0), variables, frames, regions))
    print("bench: decode compiled", file=sys.stderr, flush=True)
    overhead = _null_overhead()
    t, _ = _median_call_time(
        lambda c: step(c, variables, frames, regions), jnp.float32(0), repeats
    )
    per_call = max(t - overhead, 1e-6)
    return batch / per_call, per_call


def bench_train(cfg, vocab_size, batch, repeats=6):
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.gan_lambda import init_lambda_state
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    gen = CapGnnModel(cfg, vocab_size)
    disc = DiscV2(cfg, vocab_size)
    frames, regions, captions, lengths = _example(cfg, vocab_size, batch)
    batch_d = {
        "frames": frames, "regions": regions, "captions": captions, "lengths": lengths
    }
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, vocab_size)
    _, att = make_masks(captions)
    alpha = jnp.ones((batch, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((batch, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    step = make_gan_train_step(gen, disc, cfg)
    gstate = TrainState.create(g_vars["params"], make_optimizer(1.6e-4))
    dstate = TrainState.create(d_vars["params"], make_optimizer(1.6e-4))
    lstate0 = init_lambda_state(0.01)
    key = jax.random.key(7, impl=cfg.rng_impl)  # rbg: hw RNG for dropout

    def chained(state):
        gs, ds, ls = state
        # the step takes the batch as an argument (no giant HLO constants)
        gs, ds, ls, m = step(gs, ds, ls, batch_d, key, jnp.float32(0.9))
        return (gs, ds, ls, m["cap_loss"])

    print("bench: compiling train step...", file=sys.stderr, flush=True)
    gs, ds, ls, loss = chained((gstate, dstate, lstate0))
    _fetch(loss)
    print("bench: train step compiled", file=sys.stderr, flush=True)
    overhead = _null_overhead()
    t, _ = _median_call_time(lambda s: chained(s[:3]), (gs, ds, ls, loss), repeats)
    per_call = max(t - overhead, 1e-6)
    return batch / per_call, per_call


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    # bfloat16 is convergence-validated (tests/test_learning.py passes the same
    # memorization thresholds in bf16 as fp32), so it is the benchmark default.
    compute_dtype = os.environ.get("DLSG_BENCH_DTYPE", "bfloat16")
    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", compute_dtype=compute_dtype)
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 128 if on_tpu else 8
    vocab_size = 10000 if on_tpu else 512

    decode_cps, decode_dt = bench_decode(cfg, vocab_size, batch)
    print(f"bench: decode {decode_cps:.1f} captions/s", file=sys.stderr, flush=True)
    if os.environ.get("DLSG_BENCH_SKIP_TRAIN") == "1":
        train_cps, train_dt = 0.0, 0.0
    else:
        try:
            train_cps, train_dt = bench_train(cfg, vocab_size, batch)
        except Exception as e:  # keep the primary metric even if the relay dies
            print(f"train bench failed: {type(e).__name__}: {e}", file=sys.stderr)
            train_cps, train_dt = 0.0, 0.0

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
            "decode_batch_ms": round(decode_dt * 1e3, 2),
            "train_clips_per_sec_gan": round(train_cps, 2),
            "train_step_ms": round(train_dt * 1e3, 2),
            "batch": batch,
            "vocab": vocab_size,
            "compute_dtype": compute_dtype,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
