"""TPU A/B bench: fused vocab-head kernel + decoder weight pre-cast.

Measures full beam-5 decode at bench dims (msr-vtt: B=128, V=10000, H=1536)
in four variants: {plain, fused-head} x {fp32 params, pre-cast bf16 params},
plus a 26-step microbench of the fused kernel vs the XLA proj+topk+lse chain.

Methodology: bench.py's chained-scalar + null-overhead subtraction (the relay's
block_until_ready does not block). All big arrays are jit ARGUMENTS.
Appends one JSON line per experiment to scripts/fused_head_results.jsonl.
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fused_head_results.jsonl")
V = 10000
B = 128


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
    return ms


def precast_decoder_params(variables, dtype):
    """Cast the decoder's matmul weights (Dense kernels/biases, w_hh) to the
    compute dtype ONCE, so the casts cannot recur inside the decode scan.
    LayerNorm and the word embedding stay fp32 (they are consumed in fp32)."""

    def walk(tree, path):
        out = {}
        for k, v in tree.items():
            p = path + (k.lower(),)
            if isinstance(v, dict):
                out[k] = walk(v, p)
            else:
                skip = any("layernorm" in s or s == "ln" or "word_embed" in s or "embed" in s for s in p)
                out[k] = v if skip else v.astype(dtype)
        return out

    params = dict(variables["params"])
    params["decoder"] = walk(variables["params"]["decoder"], ())
    return {**variables, "params": params}


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.ops.pallas.vocab_head import vocab_head_topk

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
        f.write(json.dumps({"name": "START", "device": str(jax.devices()[0])}) + "\n")

    # ---- microbench: 26-step fused kernel vs XLA chain at G=640 ----
    G, H = B * 5, cfg.decode_hidden_size
    h640 = jnp.asarray(rng.normal(size=(G, H)), jnp.float32)
    wv = jnp.asarray(rng.normal(size=(H, V)) / np.sqrt(H), jnp.bfloat16)
    bv = jnp.asarray(rng.normal(size=(V,)), jnp.float32)

    def scan26_kernel(c, h, w, b):
        def step(cc, _):
            vals, ids = vocab_head_topk(h + cc * 1e-12, w, b, 5, normalize=True)
            return cc + vals[0, 0] * 1e-12, ()

        cc, _ = jax.lax.scan(step, c, None, length=26)
        return cc.astype(jnp.float32)

    def scan26_xla(c, h, w, b):
        def step(cc, _):
            logits = jnp.dot((h + cc * 1e-12).astype(jnp.bfloat16), w,
                             preferred_element_type=jnp.float32) + b[None, :]
            vals, ids = jax.lax.top_k(logits, 5)
            vals = vals - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            return cc + vals[0, 0] * 1e-12, ()

        cc, _ = jax.lax.scan(step, c, None, length=26)
        return cc.astype(jnp.float32)

    record("scan26_fused_vocab_head", scan26_kernel, (h640, wv, bv))
    record("scan26_xla_proj_topk_lse", scan26_xla, (h640, wv, bv))

    # ---- full decode variants ----
    def full(decode):
        def fn(c, variables, frames, regions):
            ids = decode(variables, frames + c * 1e-12, regions)
            return (jnp.sum(ids) % 97).astype(jnp.float32)

        return fn

    dec_plain = make_decode_fn(model, replace(cfg, use_fused_vocab_head="off"), beam_size=5)
    dec_fused = make_decode_fn(model, replace(cfg, use_fused_vocab_head="on"), beam_size=5)
    v16 = precast_decoder_params(variables, jnp.bfloat16)

    record("beam5_plain", full(dec_plain), (variables, frames, regions))
    record("beam5_plain_precast", full(dec_plain), (v16, frames, regions))
    record("beam5_fused", full(dec_fused), (variables, frames, regions))
    record("beam5_fused_precast", full(dec_fused), (v16, frames, regions))

    # sanity: fused and plain agree on the argmax captions
    ids_p = np.asarray(jax.jit(dec_plain)(variables, frames, regions))
    ids_f = np.asarray(jax.jit(dec_fused)(variables, frames, regions))
    agree = float((ids_p == ids_f).mean())
    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "AGREEMENT", "token_match": round(agree, 4)}) + "\n")
    print({"token_match": agree}, file=sys.stderr)

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE"}) + "\n")


if __name__ == "__main__":
    main()
