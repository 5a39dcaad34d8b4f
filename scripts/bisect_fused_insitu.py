"""Why didn't the merged decoder step show up end-to-end? In-situ timings of
the CURRENT code: full beam-5 decode, encode alone, and a 26-step scan of the
real fused beam step at G=640 (with pre materialized as scan constants).

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


def record(name, fn, args, repeats=5):
    jf = jax.jit(fn)
    try:
        t0 = time.perf_counter()
        c = jf(jnp.float32(0), *args)
        _fetch(c)
        compile_s = time.perf_counter() - t0
    except Exception as e:
        rec = {"name": name, "error": str(e)[:300]}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(rec, file=sys.stderr, flush=True)
        return
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
    print(rec, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.decoder import expand_pre_to_beams
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    model = CapGnnModel(cfg, V)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)
    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "START_IS", "device": str(jax.devices()[0])}) + "\n")

    decode = make_decode_fn(model, cfg, beam_size=5)

    def full(c, variables, frames, regions):
        ids = decode(variables, frames + c * 1e-12, regions)
        return (jnp.sum(ids) % 97).astype(jnp.float32)

    record("is_full_beam5", full, (variables, frames, regions))

    def enc_only(c, variables, frames, regions):
        obj, mot = model.apply(variables, frames + c * 1e-12, regions, method=model.encode)
        return (jnp.sum(obj[:, 0, :8]) + jnp.sum(mot[:, 0, :8])).astype(jnp.float32)

    record("is_encode_only", enc_only, (variables, frames, regions))

    # the REAL fused beam step, scanned 26x at G=640, no beam bookkeeping
    def chain(c, variables, frames, regions):
        obj, mot = model.apply(variables, frames, regions, method=model.encode)
        state, pre = model.apply(variables, obj, mot, method=model.decoder_init_beam_state)
        pre_x = expand_pre_to_beams(pre, 5)
        G = B * 5
        st = jax.tree_util.tree_map(lambda t: jnp.repeat(t, 5, 0), state)
        toks = jnp.full((G,), 4, jnp.int32)

        def body(carry, _):
            st, c2 = carry
            lp, st2, alpha = model.apply(
                variables, toks, st, pre_x, method=model.decoder_beam_step
            )
            return (st2, c2 + lp[0, 0] * 1e-12), ()

        (st, c2), _ = jax.lax.scan(body, (st, c + 0.0), None, length=26)
        return (c2 + jnp.sum(st["lh"][:, :4])).astype(jnp.float32)

    record("is_chain26_real_fused_G640", chain, (variables, frames, regions))

    # same minus the vocab projection (beam_step_hidden)
    def chain_hidden(c, variables, frames, regions):
        obj, mot = model.apply(variables, frames, regions, method=model.encode)
        state, pre = model.apply(variables, obj, mot, method=model.decoder_init_beam_state)
        pre_x = expand_pre_to_beams(pre, 5)
        G = B * 5
        st = jax.tree_util.tree_map(lambda t: jnp.repeat(t, 5, 0), state)
        toks = jnp.full((G,), 4, jnp.int32)

        def body(carry, _):
            st, c2 = carry
            hid, st2, alpha = model.apply(
                variables, toks, st, pre_x, method=model.decoder_beam_step_hidden
            )
            return (st2, c2 + hid[0, 0] * 1e-12), ()

        (st, c2), _ = jax.lax.scan(body, (st, c + 0.0), None, length=26)
        return (c2 + jnp.sum(st["lh"][:, :4])).astype(jnp.float32)

    record("is_chain26_hidden_G640", chain_hidden, (variables, frames, regions))

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE_IS"}) + "\n")


if __name__ == "__main__":
    main()
