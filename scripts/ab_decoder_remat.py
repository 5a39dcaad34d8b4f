"""Interleaved A/B: decoder_remat none | dots | full on the GAN train step.

Attacks the ~28 ms teacher-forced decoder fwd+bwd slice (trace_trainstep_r3):
'dots' saves only matmul outputs across the 26-step scan, 'full' recomputes
the whole step in the backward — trading recompute for residual HBM traffic.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_decoder_remat.py
"""
import json, os, statistics, sys, time
from dataclasses import replace
import jax, jax.numpy as jnp, numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_gan_single_fwd import OUT, _fetch, _null_overhead, build, log  # noqa: E402


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    base = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    variants = {
        "remat_none": base,
        "remat_dots": replace(base, decoder_remat="dots"),
        "remat_full": replace(base, decoder_remat="full"),
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
    for _ in range(8):
        for name, (chained, state) in runners.items():
            t0 = time.perf_counter()
            state, loss = chained(state)
            _fetch(loss)
            runners[name] = (chained, state)
            times[name].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "decoder_remat_ab_r3"}
    for k, v in times.items():
        rec[k + "_ms"] = round(statistics.median(v), 2)
        rec["all_" + k] = [round(x, 2) for x in v]
    log(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
