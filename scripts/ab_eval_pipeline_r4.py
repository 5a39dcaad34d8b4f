"""Interleaved A/B (round 4): one-batch-lookahead pipelining in evaluate()'s
decode loop.

The plain loop dispatches decode(batch k), then blocks on the device->host
fetch of k's token ids before dispatching k+1 — device compute and the fetch
(~30 ms RTT on the relay) serialize. evaluate() now dispatches k+1 BEFORE
consuming k (evaluation/evaluate.py), overlapping them.

Variants:
  serial    — a local copy of the pre-change loop (dispatch, fetch, repeat)
  pipelined — dispatch k+1, then fetch k (the shipped loop shape)

Both decode the SAME synthetic eval set through the same compiled decode_fn;
wall time for the whole sweep is the metric (this is an end-to-end wall-clock
lever, not a device-time one — bench.py's chained-fetch methodology
deliberately measures pure device time and is unaffected).

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3000 python scripts/ab_eval_pipeline_r4.py
"""
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bisect_results.jsonl")
V, B, NBATCH, ROUNDS = 10000, 128, 8, 5


def log(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    model = CapGnnModel(cfg, V)
    rng = np.random.default_rng(0)
    batches = []
    for i in range(NBATCH):
        batches.append({
            "frames": rng.normal(size=(B, cfg.max_frames, cfg.feature_size)).astype(np.float32),
            "regions": rng.normal(
                size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
            ).astype(np.float32),
        })
    f0 = jnp.asarray(batches[0]["frames"])
    r0 = jnp.asarray(batches[0]["regions"])
    caps = jnp.zeros((B, cfg.max_words), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), f0, r0, caps)
    decode = make_decode_fn(model, cfg, beam_size=5)

    print("compiling decode...", file=sys.stderr, flush=True)
    _ = np.asarray(decode(variables, f0, r0))
    print("compiled", file=sys.stderr, flush=True)

    def serial():
        outs = []
        for b in batches:
            ids = decode(variables, jnp.asarray(b["frames"]), jnp.asarray(b["regions"]))
            outs.append(np.asarray(ids))  # fetch before next dispatch
        return outs

    def pipelined():
        outs, pending = [], None
        for b in batches:
            ids = decode(variables, jnp.asarray(b["frames"]), jnp.asarray(b["regions"]))
            if pending is not None:
                outs.append(np.asarray(pending))
            pending = ids
        outs.append(np.asarray(pending))
        return outs

    # warm both once
    ref = serial()
    got = pipelined()
    assert all((a == b).all() for a, b in zip(ref, got)), "ordering mismatch"

    times = {"serial": [], "pipelined": []}
    for r in range(ROUNDS):
        for name, fn in (("serial", serial), ("pipelined", pipelined)):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"round {r} {name}: {dt*1e3:.1f} ms", flush=True)

    med = {k: statistics.median(v) for k, v in times.items()}
    rec = {
        "tag": "eval_pipeline_ab_r4",
        "batches": NBATCH,
        "batch": B,
        "serial_ms": round(med["serial"] * 1e3, 1),
        "pipelined_ms": round(med["pipelined"] * 1e3, 1),
        "speedup": round(med["serial"] / med["pipelined"], 3),
        "device": str(jax.devices()[0]),
    }
    log(rec)


if __name__ == "__main__":
    main()
