"""Bisect where beam-5 decode time goes on the TPU.

Times isolated 26-step scans of each per-step component at bench dims
(G = B*beam = 640, V = 10000, H = 1536, bf16 matmuls) plus the full current
decode, writing one JSON line per experiment to scripts/bisect_results.jsonl.

Methodology: bench.py's chained-scalar + null-overhead subtraction (the relay's
block_until_ready does not block). All big arrays are jit ARGUMENTS.
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
STEPS = 26
G = 640  # B=128 * beam=5
V = 10000
H = 1536  # decode_hidden (msr-vtt)
QH = 1024  # query_hidden
BF = jnp.bfloat16


def _fetch(x):
    return float(np.asarray(x))


def _null_overhead(repeats=10):
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


def record(name, fn, args, repeats=6):
    """fn(c, *args) -> scalar; chained through c."""
    jf = jax.jit(fn)
    t0 = time.perf_counter()
    c = jf(jnp.float32(0), *args)
    _fetch(c)
    compile_s = time.perf_counter() - t0
    overhead = _null_overhead()
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = jf(c, *args)
        _fetch(c)
        ts.append(time.perf_counter() - t0)
    ms = (statistics.median(ts) - overhead) * 1e3
    rec = {"name": name, "ms": round(ms, 3), "compile_s": round(compile_s, 1)}
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
        f.flush()
    print(rec, file=sys.stderr, flush=True)


def scan26(body):
    """Wrap a per-step body (h [G,H] -> h) into a 26-step chained scan -> scalar."""

    def fn(c, *args):
        h0 = jnp.full((G, H), 0.01, jnp.float32) + c * 1e-12

        def step(h, _):
            return body(h, *args), ()

        h, _ = jax.lax.scan(step, h0, None, length=STEPS)
        return jnp.sum(h[:, :8]).astype(jnp.float32)

    return fn



def main():
    rng = np.random.default_rng(0)
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    B = 128
    model = CapGnnModel(cfg, V)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)

    def enc_only(c, variables, frames, regions):
        obj, mot = model.apply(variables, frames + c * 1e-12, regions, method=model.encode)
        return (jnp.sum(obj[:, 0, :8]) + jnp.sum(mot[:, 0, :8])).astype(jnp.float32)

    record("encode_only_B128", enc_only, (variables, frames, regions))

    decode = make_decode_fn(model, cfg, beam_size=5)

    def full(c, variables, frames, regions):
        ids = decode(variables, frames + c * 1e-12, regions)
        return (jnp.sum(ids) % 97).astype(jnp.float32)

    record("full_beam5_decode_B128", full, (variables, frames, regions))

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE"}) + "\n")


if __name__ == "__main__":
    main()
