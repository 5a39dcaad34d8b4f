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
    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "START", "device": str(jax.devices()[0])}) + "\n")

    import os as _os
    skip_done = _os.environ.get("BISECT_SKIP_DONE") == "1"
    wv = jnp.asarray(rng.normal(size=(H, V)) * 0.02, BF)  # vocab proj
    # ---- 1. vocab projection only ----
    def vocab_only(h, wv):
        logits = jnp.dot(h.astype(BF), wv, preferred_element_type=jnp.float32)
        return jnp.tanh(logits[:, :H])

    if not skip_done:
        record("scan26_vocab_proj", scan26(vocab_only), (wv,))

    # ---- 2. + top_k(5) ----
    def vocab_topk(h, wv):
        logits = jnp.dot(h.astype(BF), wv, preferred_element_type=jnp.float32)
        vals, ids = jax.lax.top_k(logits, 5)
        return jnp.tanh(logits[:, :H] + jnp.sum(vals, -1, keepdims=True) * 1e-9)

    if not skip_done:
        record("scan26_vocab_topk", scan26(vocab_topk), (wv,))

    # ---- 3. + logsumexp ----
    def vocab_topk_lse(h, wv):
        logits = jnp.dot(h.astype(BF), wv, preferred_element_type=jnp.float32)
        vals, ids = jax.lax.top_k(logits, 5)
        lse = jax.nn.logsumexp(logits, axis=-1)
        return jnp.tanh(logits[:, :H] + (jnp.sum(vals, -1) + lse)[:, None] * 1e-9)

    if not skip_done:
        record("scan26_vocab_topk_lse", scan26(vocab_topk_lse), (wv,))

    # ---- 4. approx top-k variant ----
    def vocab_approx(h, wv):
        logits = jnp.dot(h.astype(BF), wv, preferred_element_type=jnp.float32)
        vals, ids = jax.lax.approx_max_k(logits, 5)
        return jnp.tanh(logits[:, :H] + jnp.sum(vals, -1, keepdims=True) * 1e-9)

    if not skip_done:
        record("scan26_vocab_approx_topk", scan26(vocab_approx), (wv,))

    # ---- 5. LSTM-matmul chain proxy (query 3884->4096 + lang 3072->6144) ----
    wq = jnp.asarray(rng.normal(size=(3884, 4 * QH)) * 0.02, BF)
    wl = jnp.asarray(rng.normal(size=(3072, 4 * H)) * 0.02, BF)

    def lstms(h, wq, wl):
        xq = jnp.tile(h, (1, 3))[:, :3884]  # [G, 3884]
        g1 = jnp.dot(xq.astype(BF), wq, preferred_element_type=jnp.float32)
        xl = jnp.tanh(g1[:, :3072])
        g2 = jnp.dot(xl.astype(BF), wl, preferred_element_type=jnp.float32)
        return jnp.tanh(g2[:, :H])

    record("scan26_two_lstm_matmuls", scan26(lstms), (wq, wl))

    # ---- 6. attention K/V/Q/out projections as currently recomputed per step ----
    P = 5
    feats = jnp.asarray(rng.normal(size=(G, P, QH)), jnp.float32)
    wk = jnp.asarray(rng.normal(size=(QH, QH)) * 0.02, BF)

    def atts(h, feats, wk):
        q = jnp.dot(h[:, :QH].astype(BF), wk, preferred_element_type=jnp.float32)
        out = q
        for _ in range(2):  # two attention branches
            K = jnp.dot(feats.astype(BF), wk, preferred_element_type=jnp.float32)
            Vv = jnp.dot(feats.astype(BF), wk, preferred_element_type=jnp.float32)
            a = jax.nn.softmax(jnp.einsum("gpa,ga->gp", K, q), axis=1)
            ctx = jnp.einsum("gp,gpa->ga", a, Vv)
            out = out + jnp.dot(ctx.astype(BF), wk, preferred_element_type=jnp.float32)
        return jnp.tanh(jnp.concatenate([out, h[:, QH:]], axis=-1))

    record("scan26_attention_current", scan26(atts), (feats, wk))

    # ---- 7. attention with K/V hoisted (only Q + einsums + out proj per step) ----
    def atts_hoisted(h, K, Vv, wk):
        q = jnp.dot(h[:, :QH].astype(BF), wk, preferred_element_type=jnp.float32)
        out = q
        for _ in range(2):
            a = jax.nn.softmax(jnp.einsum("gpa,ga->gp", K, q), axis=1)
            ctx = jnp.einsum("gp,gpa->ga", a, Vv)
            out = out + jnp.dot(ctx.astype(BF), wk, preferred_element_type=jnp.float32)
        return jnp.tanh(jnp.concatenate([out, h[:, QH:]], axis=-1))

    record("scan26_attention_hoisted", scan26(atts_hoisted), (feats, feats, wk))

    # ---- 8. full current beam decode (re-baseline) + encoder alone ----
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
