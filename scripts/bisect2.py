"""Bisect round 2: isolate the real decoder step chain vs beam bookkeeping.

1. scan26 of the REAL DecoderStep.decode at G=640 (no beam bookkeeping).
2. the full beam_search driver with the model step replaced by one matmul
   (bookkeeping + vocab-proj cost only).
3. scan26 of real step + top_k + lse (decode chain + vocab head, no reorder).

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
B, BEAM, V = 128, 5, 10000
G = B * BEAM


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


def record(name, fn, args, repeats=8):
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


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.models.generator import CapGnnModel

    rng = np.random.default_rng(0)
    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    model = CapGnnModel(cfg, V)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "START2"}) + "\n")

    # precompute encode outputs ONCE on host side to time the scan alone
    enc = jax.jit(lambda v, fr, rg: model.apply(v, fr, rg, method=model.encode))
    obj, mot = enc(variables, frames, regions)
    obj = jax.block_until_ready(obj)

    def init_fn(v, obj, mot):
        return model.apply(v, obj, mot, method=model.decoder_init_beam_state)

    state0, pre0 = jax.jit(init_fn)(variables, obj, mot)
    # expand to the beam group
    state0 = jax.tree_util.tree_map(lambda t: jnp.repeat(t, BEAM, 0), state0)
    pre_x = jax.tree_util.tree_map(lambda t: jnp.repeat(t, BEAM, 0), pre0)
    _ = jax.block_until_ready(pre_x["gw"])

    # ---- 1. real step chain, no bookkeeping, no topk (argmax feed) ----
    def chain_only(c, variables, state0, pre_x):
        toks = jnp.full((G,), 5, jnp.int32) + (c * 0).astype(jnp.int32)

        def body(carry, _):
            toks, st = carry
            lp, st, _ = model.apply(
                variables, toks, st, pre_x, method=model.decoder_beam_step
            )
            return (jnp.argmax(lp, -1), st), ()

        (toks, _), _ = jax.lax.scan(body, (toks, state0), None, length=26)
        return (jnp.sum(toks) % 97).astype(jnp.float32) + c * 0

    record("scan26_real_stepchain_G640", chain_only, (variables, state0, pre_x))

    # ---- 2. full beam bookkeeping with a single-matmul step ----
    from dlsg_tpu.ops.beam_search import beam_search

    wv = jnp.asarray(rng.normal(size=(1536, V)) * 0.02, jnp.bfloat16)
    h0 = jnp.asarray(rng.normal(size=(B, 1536)), jnp.float32)

    def bookkeeping(c, wv, h0):
        def step(tokens, st):
            h = st["h"] * 0.99 + tokens[:, None].astype(jnp.float32) * 1e-6
            lp = jnp.dot(h.astype(jnp.bfloat16), wv, preferred_element_type=jnp.float32)
            return lp, {"h": h}

        preds, lps = beam_search(
            jnp.full((B,), 1, jnp.int32),
            {"h": h0 + c * 1e-12},
            step,
            end_id=2,
            max_steps=26,
            beam_size=BEAM,
            normalize=True,
        )
        return (jnp.sum(preds) % 97).astype(jnp.float32)

    record("beam_bookkeeping_1matmul", bookkeeping, (wv, h0))

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE2"}) + "\n")


if __name__ == "__main__":
    main()
