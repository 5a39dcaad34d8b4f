"""Incremental chain bisect: from the 3.34 ms synthetic merged chain to the
~14 ms real fused step, adding one ingredient at a time (G=640, 26 steps,
msr-vtt dims, bf16 matmuls). Finds which non-matmul component eats the time.

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
G = 640
STEPS = 26
BF = jnp.bfloat16

H, QH, VH, WS, P = 1536, 1024, 1024, 300, 5


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
    print(rec, file=sys.stderr, flush=True)


def lstm_gates(gates, c):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
    return h2, c2


def _ln(x, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, -1, keepdims=True) - mu * mu, 0.0)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def main():
    rng = np.random.default_rng(0)

    def mk(shape, dtype=BF):
        return jnp.asarray(rng.normal(size=shape) * 0.02, dtype)

    Wq = mk((H + WS + QH, 4 * QH))
    WQ = mk((QH, 2 * VH))
    WO2 = mk((2, VH, VH))
    Wl = mk((2 * VH + QH + H, 4 * H))
    Wv = mk((H, V))
    K2 = mk((G, 2, P, VH), jnp.float32)
    emb = mk((V, WS), jnp.float32)
    toks = jnp.asarray(rng.integers(4, V, size=(G,)), jnp.int32)

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "START_CP", "device": str(jax.devices()[0])}) + "\n")

    def build(level):
        """level 0: tanh-gate synthetic; each level adds one real ingredient."""

        def fn(c, Wq, WQ, WO2, Wl, Wv, K2, emb, toks):
            lh0 = jnp.full((G, H), 0.01, jnp.float32) + c * 1e-12
            lc0 = jnp.zeros((G, H), jnp.float32)
            qh0 = jnp.full((G, QH), 0.01, jnp.float32)
            qc0 = jnp.zeros((G, QH), jnp.float32)
            word_fixed = jnp.full((G, WS), 0.01, jnp.float32)

            def stp(carry, _):
                lh, lc, qh, qc = carry
                word = emb[toks] if level >= 2 else word_fixed
                x = jnp.concatenate([lh, word, qh], -1)
                g1 = jnp.dot(x.astype(BF), Wq, preferred_element_type=jnp.float32)
                if level >= 1:
                    qh2, qc2 = lstm_gates(g1, qc)
                else:
                    qh2, qc2 = jnp.tanh(g1[:, :QH]), qc
                qcur = _ln(qh2) if level >= 3 else qh2
                q12 = jnp.dot(qcur.astype(BF), WQ, preferred_element_type=jnp.float32)
                if level >= 4:
                    q = q12.reshape(G, 2, VH)
                    a = jax.nn.softmax(
                        jnp.einsum("gnpv,gnv->gnp", K2, q,
                                   preferred_element_type=jnp.float32) / 32.0, -1)
                    ctx = jnp.einsum("gnp,gnpv->gnv", a.astype(BF), K2.astype(BF),
                                     preferred_element_type=jnp.float32)
                    ctx = jnp.einsum("gnv,nvw->gnw", ctx.astype(BF), WO2,
                                     preferred_element_type=jnp.float32)
                    ctx = jnp.tanh(ctx)
                    ctx = _ln(ctx)
                    ctx = ctx.reshape(G, 2 * VH)
                else:
                    K1 = K2[:, 0]
                    a1 = jax.nn.softmax(jnp.einsum("gpv,gv->gp", K1, q12[:, :VH]), -1)
                    c1 = jnp.einsum("gp,gpv->gv", a1, K1)
                    a2 = jax.nn.softmax(jnp.einsum("gpv,gv->gp", K1, q12[:, VH:]), -1)
                    c2_ = jnp.einsum("gp,gpv->gv", a2, K1)
                    ctx = jnp.tanh(
                        jnp.dot(jnp.concatenate([c1, c2_], -1).astype(BF),
                                WO2.reshape(2 * VH, VH).repeat(2, 1)[:, : 2 * VH],
                                preferred_element_type=jnp.float32))
                lang_x = jnp.concatenate([ctx, qcur, lh], -1)
                g2 = jnp.dot(lang_x.astype(BF), Wl, preferred_element_type=jnp.float32)
                if level >= 1:
                    lh2, lc2 = lstm_gates(g2, lc)
                else:
                    lh2, lc2 = jnp.tanh(g2[:, :H]), lc
                dec = jnp.tanh(_ln(lh2)) if level >= 3 else lh2
                logit = jnp.dot(dec.astype(BF), Wv, preferred_element_type=jnp.float32)
                return (lh2, lc2, qh2, qc2), logit[0, 0]

            (lh, lc, qh, qc), outs = jax.lax.scan(
                stp, (lh0, lc0, qh0, qc0), None, length=STEPS
            )
            return (jnp.sum(lh[:, :8]) + jnp.sum(outs)).astype(jnp.float32)

        return fn

    args = (Wq, WQ, WO2, Wl, Wv, K2, emb, toks)
    record("cp_L0_tanh_gates", build(0), args)
    record("cp_L1_real_lstm_gates", build(1), args)
    record("cp_L2_embed_gather", build(2), args)
    record("cp_L3_layernorms", build(3), args)
    record("cp_L4_branch_batched_attn", build(4), args)

    # L1 with bf16 gate nonlinearities (cell state fp32)
    def bf16_gates(c, Wq, WQ, WO2, Wl, Wv, K2, emb, toks):
        lh0 = jnp.full((G, H), 0.01, jnp.float32) + c * 1e-12
        lc0 = jnp.zeros((G, H), jnp.float32)
        qh0 = jnp.full((G, QH), 0.01, jnp.float32)
        qc0 = jnp.zeros((G, QH), jnp.float32)
        word_fixed = jnp.full((G, WS), 0.01, jnp.float32)

        def gates16(g, c):
            g = g.astype(BF)
            i, f, gg, o = jnp.split(g, 4, -1)
            c2 = (jax.nn.sigmoid(f).astype(jnp.float32) * c
                  + (jax.nn.sigmoid(i) * jnp.tanh(gg)).astype(jnp.float32))
            h2 = jax.nn.sigmoid(o).astype(jnp.float32) * jnp.tanh(c2)
            return h2, c2

        def stp(carry, _):
            lh, lc, qh, qc = carry
            x = jnp.concatenate([lh, word_fixed, qh], -1)
            g1 = jnp.dot(x.astype(BF), Wq, preferred_element_type=jnp.float32)
            qh2, qc2 = gates16(g1, qc)
            q12 = jnp.dot(qh2.astype(BF), WQ, preferred_element_type=jnp.float32)
            K1 = K2[:, 0]
            a1 = jax.nn.softmax(jnp.einsum("gpv,gv->gp", K1, q12[:, :VH]), -1)
            c1 = jnp.einsum("gp,gpv->gv", a1, K1)
            ctx = jnp.concatenate([c1, c1], -1)
            lang_x = jnp.concatenate([ctx, qh2, lh], -1)
            g2 = jnp.dot(lang_x.astype(BF), Wl, preferred_element_type=jnp.float32)
            lh2, lc2 = gates16(g2, lc)
            logit = jnp.dot(lh2.astype(BF), Wv, preferred_element_type=jnp.float32)
            return (lh2, lc2, qh2, qc2), logit[0, 0]

        (lh, lc, qh, qc), outs = jax.lax.scan(stp, (lh0, lc0, qh0, qc0), None, length=STEPS)
        return (jnp.sum(lh[:, :8]) + jnp.sum(outs)).astype(jnp.float32)

    record("cp_L1b_bf16_gates", bf16_gates, args)

    with open(OUT, "a") as f:
        f.write(json.dumps({"name": "DONE_CP"}) + "\n")


if __name__ == "__main__":
    main()
