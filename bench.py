"""Benchmark: beam-5 decode throughput + GAN train throughput (north star).

Prints ONE JSON line: captions/sec of beam-5 decoding at MSR-VTT dimensions
(the serving metric), with the full D-LSG GAN training step's clips/sec in
`extra`.

Methodology (robust to remote-TPU tunnels where `block_until_ready` does not
actually block): each measured quantity is a device-side `lax.fori_loop` of N
step iterations inside ONE jit whose tiny scalar output is fetched to host
(the fetch is the only reliable synchronization point). Per-step time is the
difference between an N_hi-iteration and an N_lo-iteration run divided by
(N_hi - N_lo), which also cancels the per-call round-trip overhead.

The reference never measured throughput (SURVEY.md §6; BASELINE.json
published = {}), so `vs_baseline` compares against BENCH_prev.json when the
driver provides one, else 1.0.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x) -> float:
    return float(np.asarray(x))


def _timed(fn, arg) -> float:
    t0 = time.perf_counter()
    _fetch(fn(arg))
    return time.perf_counter() - t0


def _two_point(fn_lo, fn_hi, n_lo, n_hi, arg, repeats=2):
    """Best-of-repeats two-point estimate of per-iteration seconds."""
    _fetch(fn_lo(arg))  # warm both compiles
    _fetch(fn_hi(arg))
    per_iter = []
    for _ in range(repeats):
        t_lo = _timed(fn_lo, arg)
        t_hi = _timed(fn_hi, arg)
        per_iter.append(max((t_hi - t_lo) / (n_hi - n_lo), 1e-9))
    return min(per_iter)


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


def bench_decode(cfg, vocab_size, batch, n_lo=1, n_hi=6):
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    model = CapGnnModel(cfg, vocab_size)
    frames, regions, captions, _ = _example(cfg, vocab_size, batch)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)
    decode = make_decode_fn(model, cfg, beam_size=5)

    def make_loop(n):
        @jax.jit
        def run(checksum):
            def body(i, acc):
                # acc perturbs the input so iterations are truly sequential
                # (prevents loop-invariant hoisting of the decode)
                ids = decode(variables, frames + acc * 1e-12, regions)
                return acc + (jnp.sum(ids) % 97).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, checksum)

        return run

    per_call = _two_point(make_loop(n_lo), make_loop(n_hi), n_lo, n_hi, jnp.float32(0))
    return batch / per_call, per_call


def bench_train(cfg, vocab_size, batch, n_lo=1, n_hi=6):
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
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

    # un-donated step for looping (the loop carries the states)
    from dlsg_tpu.train.steps import make_gan_train_step as _mk

    step = _mk(gen, disc, cfg)

    def make_loop(n):
        @jax.jit
        def run(packed):
            gstate, dstate = packed

            def body(i, carry):
                gs, ds = carry
                gs, ds, m = step(
                    gs, ds, batch_d, jax.random.fold_in(jax.random.PRNGKey(7), i),
                    jnp.float32(0.9), jnp.float32(0.01),
                )
                return (gs, ds)

            gs, ds = jax.lax.fori_loop(0, n, body, (gstate, dstate))
            # checksum over every parameter so no part of the update is dead
            return jax.tree_util.tree_reduce(
                lambda a, l: a + jnp.sum(jnp.abs(l)) * 1e-12,
                gs.params,
                jnp.float32(gs.step),
            )

        return run

    gstate = TrainState.create(g_vars["params"], make_optimizer(1.6e-4))
    dstate = TrainState.create(d_vars["params"], make_optimizer(1.6e-4))
    per_call = _two_point(
        make_loop(n_lo), make_loop(n_hi), n_lo, n_hi, (gstate, dstate)
    )
    return batch / per_call, per_call


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt"))
    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 128 if on_tpu else 8
    vocab_size = 10000 if on_tpu else 512

    decode_cps, decode_dt = bench_decode(cfg, vocab_size, batch)
    train_cps, train_dt = bench_train(cfg, vocab_size, batch)

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
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
