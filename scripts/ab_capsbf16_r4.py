"""Interleaved A/B (round 4, part 3): bf16 D-phase caption tensors.

The [B,T,V] one-hot + logits tensors are the step's largest activations;
the 5 WGAN-GP substeps and the GP pass re-read them from HBM every
traversal. gan_caps_bf16=True stores them bf16 (halving that traffic) at a
documented numerics deviation (logits rounded earlier).

  base      — shipped defaults (gp_rof, fp32 caption tensors)
  caps_bf16 — + gan_caps_bf16=True

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_capsbf16_r4.py
"""
import json, os, statistics, sys, time
from dataclasses import replace

import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_dphase_r4 import build, log, _fetch, _null_overhead  # noqa: E402


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    base = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    variants = {
        "base": base,
        "caps_bf16": replace(base, gan_caps_bf16=True),
    }
    runners = {}
    for name, cfg in variants.items():
        chained, state = build(cfg)
        t0 = time.perf_counter()
        state, loss = chained(state)
        _fetch(loss)
        print(f"{name} compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        runners[name] = (chained, state)

    overhead = _null_overhead()
    times = {k: [] for k in runners}
    for _ in range(10):
        for name, (chained, state) in runners.items():
            t0 = time.perf_counter()
            state, loss = chained(state)
            _fetch(loss)
            runners[name] = (chained, state)
            times[name].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "capsbf16_ab_r4"}
    for k, v in times.items():
        rec[k + "_ms"] = round(statistics.median(v), 2)
        rec["all_" + k] = [round(x, 2) for x in v]
    log(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
