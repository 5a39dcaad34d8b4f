"""Interleaved A/B: fast_lse max-shift (round 3) vs jax.nn.logsumexp fallback.

Round 3 changed fast_lse from an unshifted clipped sumexp (one independent
pass, fusable into the vocab matmul) to a top-k-max-shifted sumexp (safe for
any weights, but DEPENDENT on the top_k output — potentially forcing the
[G, V] logits to materialize for a second pass). This measures the cost at
bench dims in one process.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_lse_r3.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

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
        s = null(s)
        _fetch(s)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    model = CapGnnModel(cfg, V)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)

    fns = {
        "lse_shift": make_decode_fn(model, cfg, beam_size=5),
        "lse_logsumexp": make_decode_fn(
            model, replace(cfg, decode_fast_lse=False), beam_size=5
        ),
    }
    steps = {}
    for name, fn in fns.items():

        def mk(fn):
            @jax.jit
            def step(c, vs, f, r):
                ids = fn(vs, f + c * 1e-12, r)
                return (jnp.sum(ids) % 97).astype(jnp.float32)

            return step

        steps[name] = mk(fn)
        t0 = time.perf_counter()
        _fetch(steps[name](jnp.float32(0), variables, frames, regions))
        print(f"{name} compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    overhead = _null_overhead()
    times = {k: [] for k in steps}
    c = jnp.float32(0)
    for _ in range(10):
        for name, step in steps.items():
            t0 = time.perf_counter()
            c = step(c, variables, frames, regions)
            _fetch(c)
            times[name].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "lse_ab_r3"}
    for k, v in times.items():
        rec[k + "_ms"] = round(statistics.median(v), 2)
        rec["all_" + k] = [round(x, 2) for x in v]
    log(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
