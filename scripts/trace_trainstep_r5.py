"""Round-5: re-trace the GAN train step at HEAD (VERDICT r4 #3).

The round-3 attribution (45 ms D / 28 ms G / 39 ms residue) predates the
reverse-over-forward GP custom VJP (-16% step, round 4); this re-runs the
same perfetto device-trace attribution on the current step to find the new
top item. Uses bench.py's host-side init + AOT program builder (the r3
script's eager on-device init costs ~400 s through the relay).

Run (TPU): python scripts/trace_trainstep_r5.py
Writes scripts/trainstep_trace_r5.json and prints the top slices.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))
sys.path.insert(0, HERE)

import trace_trainstep_r3 as r3  # noqa: E402  (perfetto parsing reused)

OUT = os.path.join(HERE, "trainstep_trace_r5.json")
TRACE_DIR = "/tmp/ts_trace_r5"


def main():
    import bench
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16")
    )
    print("building train program (host init)...", file=sys.stderr, flush=True)
    trn = bench.prepare_train(cfg, 10000, 128)
    t0 = time.perf_counter()
    trn.compile()  # includes the forced warmup execution
    if trn.compiled is None:
        raise trn.error
    print(f"compiled+warm in {time.perf_counter() - t0:.0f}s", file=sys.stderr, flush=True)

    state = trn.init_state
    state = trn.chain(state)
    bench._fetch(state[-1])

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR, create_perfetto_trace=True)
    n_traced = 3
    for _ in range(n_traced):
        state = trn.chain(state)
        bench._fetch(state[-1])
    jax.profiler.stop_trace()

    table = r3.parse_perfetto(TRACE_DIR)
    if table is None:
        print("no perfetto trace found", file=sys.stderr)
        return 1
    table["steps_traced"] = n_traced
    table["per_step_ms"] = round(table["total_us"] / 1e3 / n_traced, 2)
    with open(OUT, "w") as f:
        json.dump(table, f, indent=1)
    print(f"device total {table['per_step_ms']} ms/step over {n_traced} steps")
    for r in table["rows"][:40]:
        print(f"  {r['total_us']/1e3/n_traced:8.3f} ms  x{r['count']:4d}  {r['name'][:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
