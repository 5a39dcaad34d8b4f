"""Interleaved A/B: single-pass beam-5 decode vs the two-pass per-sequence
early-exit decode, at bench dims (B=128, msr-vtt, bf16, V=10k), under a
REALISTIC caption-length distribution.

Random weights emit max-length babble (nothing finishes by t1 — the two-pass
worst case), so the END logit bias is first tuned until the decoded mean
caption length lands in the real-data range (~8 of 26 steps; round-2 measured
ee_caption_len mean 7.8 on the bench model, scripts/bisect_results.jsonl).
Both variants are pure jits — timed with the chained-scalar + null-overhead
methodology, alternating A/B within ONE process (session drift is ±20-50%;
sequential comparisons are mud).

Appends results to scripts/bisect_results.jsonl.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_two_pass.py
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
T1, BUCKET = 12, 32


def log(rec):
    rec = dict(rec)
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
    from dlsg_tpu.vocab import END_ID

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)

    model = CapGnnModel(cfg, V)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)

    single = make_decode_fn(model, cfg, beam_size=5)
    two = make_decode_fn(
        model,
        replace(cfg, decode_two_pass_t1=T1, decode_two_pass_bucket=BUCKET),
        beam_size=5,
    )

    @jax.jit
    def set_bias(vs, bias):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: (
                leaf.at[END_ID].add(bias)
                if any(getattr(p, "key", None) == "word_restore" for p in path)
                and leaf.ndim == 1
                else leaf
            ),
            vs,
        )

    def caption_stats(vs):
        ids = np.asarray(single(vs, frames, regions))
        ended = ids == END_ID
        lens = np.where(ended.any(1), ended.argmax(1), ids.shape[1])
        return float(lens.mean()), int((lens >= T1).sum())

    print("compiling single-pass decode...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    m0, s0 = caption_stats(variables)
    print(f"compiled {time.perf_counter()-t0:.0f}s; raw mean len {m0:.1f}", file=sys.stderr)

    # tune END bias toward mean caption length ~8 (real-data distribution).
    # P(end) per step is roughly constant given the bias (random-weight
    # logits are stationary noise), so lengths are geometric: binary-search
    # the bias for mean ~8 WITH a nonzero straggler tail (like real data).
    lo, hi = 0.0, 2.0  # lo: never ends; hi: ends at step 0
    chosen, stats = None, None
    best = None
    for _ in range(12):
        bias = 0.5 * (lo + hi)
        vs = set_bias(variables, jnp.float32(bias))
        mean_len, n_stragglers = caption_stats(vs)
        print(
            f"bias {bias:.4f}: mean len {mean_len:.2f}, stragglers(>= {T1}) {n_stragglers}",
            file=sys.stderr, flush=True,
        )
        if best is None or abs(mean_len - 8.0) < abs(best[1] - 8.0):
            best = (bias, mean_len, n_stragglers, vs)
        if 6.0 <= mean_len <= 10.0 and 0 < n_stragglers <= B // 4:
            chosen, stats = vs, (bias, mean_len, n_stragglers)
            break
        if mean_len < 8.0:
            hi = bias
        else:
            lo = bias
    if chosen is None:
        chosen, stats = best[3], (best[0], best[1], best[2])
    log({"name": "tp_setup", "bias": stats[0], "mean_len": stats[1], "stragglers": stats[2]})

    # exactness on-device at the chosen weights
    ids_a = np.asarray(single(chosen, frames, regions))
    print("compiling two-pass decode...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    ids_b = np.asarray(two(chosen, frames, regions))
    print(f"two-pass compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    same = bool((ids_a == ids_b).all())
    log({"name": "tp_exact", "equal": same})

    @jax.jit
    def stepA(c, vs, f, r):
        ids = single(vs, f + c * 1e-12, r)
        return (jnp.sum(ids) % 97).astype(jnp.float32)

    @jax.jit
    def stepB(c, vs, f, r):
        ids = two(vs, f + c * 1e-12, r)
        return (jnp.sum(ids) % 97).astype(jnp.float32)

    _fetch(stepA(jnp.float32(0), chosen, frames, regions))
    _fetch(stepB(jnp.float32(0), chosen, frames, regions))
    overhead = _null_overhead()

    def timed(step, c):
        t0 = time.perf_counter()
        c = step(c, chosen, frames, regions)
        _fetch(c)
        return (time.perf_counter() - t0 - overhead) * 1e3, c

    rounds = 10
    at, bt = [], []
    c = jnp.float32(0)
    for _ in range(rounds):
        ta, c = timed(stepA, c)
        tb, c = timed(stepB, c)
        at.append(ta)
        bt.append(tb)
    log({
        "name": "tp_ab_realistic",
        "single_ms": round(statistics.median(at), 2),
        "two_pass_ms": round(statistics.median(bt), 2),
        "all_single": [round(x, 2) for x in at],
        "all_two": [round(x, 2) for x in bt],
        "t1": T1, "bucket": BUCKET,
    })

    # worst case: endless babble (raw weights) — quantify the guard's bound
    at, bt = [], []
    for _ in range(6):
        ta, c = timed(lambda c, vs, f, r: stepA(c, variables, f, r), c)
        tb, c = timed(lambda c, vs, f, r: stepB(c, variables, f, r), c)
        at.append(ta)
        bt.append(tb)
    log({
        "name": "tp_ab_endless",
        "single_ms": round(statistics.median(at), 2),
        "two_pass_ms": round(statistics.median(bt), 2),
    })
    return 0


if __name__ == "__main__":
    sys.exit(main())
