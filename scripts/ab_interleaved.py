"""Interleaved A/B on TPU: encode (joint vs per-branch region projection,
both with the transposed adjacency softmax) and full beam-5 decode.
Round-robin timing across variants defeats session drift (+-20% observed
between sequential measurements).

Appends to scripts/bisect_results.jsonl.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bisect_results.jsonl")
V, B = 10000, 128


def _fetch(x):
    return float(np.asarray(x))


def main():
    rng = np.random.default_rng(0)
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    base = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    frames = jnp.asarray(rng.normal(size=(B, base.max_frames, base.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, base.max_frames, base.num_obj, base.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, base.max_words)), jnp.int32)

    variants = {}
    for name, cfg in (
        ("joint", base),
        ("split", replace(base, joint_region_projection=False)),
    ):
        model = CapGnnModel(cfg, V)
        variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)

        def enc(variables, frames, regions, c, model=model):
            obj, mot = model.apply(variables, frames + c * 1e-12, regions, method=model.encode)
            return (jnp.sum(obj[:, 0, :8]) + jnp.sum(mot[:, 0, :8])).astype(jnp.float32)

        decode = make_decode_fn(model, cfg, beam_size=5)

        def full(variables, frames, regions, c, decode=decode):
            ids = decode(variables, frames + c * 1e-12, regions)
            return (jnp.sum(ids) % 97).astype(jnp.float32)

        variants[f"enc_{name}"] = (jax.jit(enc), variables)
        variants[f"dec_{name}"] = (jax.jit(full), variables)

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "START_IAB", "device": str(jax.devices()[0])}) + "\n")

    # compile all first
    cs = {}
    for name, (fn, variables) in variants.items():
        t0 = time.perf_counter()
        _fetch(fn(variables, frames, regions, jnp.float32(0)))
        cs[name] = round(time.perf_counter() - t0, 1)
    print({"compiles": cs}, file=sys.stderr, flush=True)

    # interleaved rounds
    times = {k: [] for k in variants}
    c = jnp.float32(0)
    for _ in range(8):
        for name, (fn, variables) in variants.items():
            t0 = time.perf_counter()
            c = fn(variables, frames, regions, c)
            _fetch(c)
            times[name].append(time.perf_counter() - t0)

    # null overhead
    null = jax.jit(lambda x: x + 1.0)
    _fetch(null(c))
    ov = []
    for _ in range(10):
        t0 = time.perf_counter()
        c = null(c)
        _fetch(c)
        ov.append(time.perf_counter() - t0)
    overhead = statistics.median(ov)

    for name, ts in times.items():
        ms = (statistics.median(ts) - overhead) * 1e3
        rec = {"name": f"iab_{name}", "ms": round(ms, 3), "compile_s": cs[name],
               "all": [round((t - overhead) * 1e3, 2) for t in ts]}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, file=sys.stderr, flush=True)

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE_IAB"}) + "\n")


if __name__ == "__main__":
    main()
