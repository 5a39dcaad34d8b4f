"""Interleaved A/B (round 4, part 2): D-substep scan unroll on the full GAN
step, on top of the shipped gp_rof default.

  base      — shipped defaults (gan_gp_custom_vjp=True, rolled scan)
  unroll5   — lax.scan(..., unroll=5) over the 5 D substeps: XLA can overlap
              substep tails / schedule across iterations at 5x code size

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_dphase2_r4.py
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
        "unroll5": replace(base, disc_scan_unroll=5),
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
    rec = {"name": "dphase2_ab_r4"}
    for k, v in times.items():
        rec[k + "_ms"] = round(statistics.median(v), 2)
        rec["all_" + k] = [round(x, 2) for x in v]
    log(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
