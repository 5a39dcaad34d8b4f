"""Round-3: device-trace the GAN train step and build a per-op roofline table.

The decode path got a per-op trace table in round 2 (BENCHMARKS.md
"Device-trace roofline analysis"); this gives the train step the same
treatment: run the full jitted GAN step under jax.profiler with a perfetto
trace, parse the device track, and aggregate duration by fusion/op name.

Writes scripts/trainstep_trace_r4.json and prints the top slices.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo python scripts/trace_trainstep_r4.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "trainstep_trace_r4.json")
TRACE_DIR = "/tmp/ts_trace_r4"
V, B = 10000, 128


def _fetch(x):
    return float(np.asarray(x))


def build_step():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.gan_lambda import init_lambda_state
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16")
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    lengths = jnp.asarray(rng.integers(5, cfg.max_words, size=(B,)), jnp.int32)
    batch = {"frames": frames, "regions": regions, "captions": captions, "lengths": lengths}

    gen, disc = CapGnnModel(cfg, V), DiscV2(cfg, V)
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, V)
    _, att = make_masks(captions)
    alpha = jnp.ones((B, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((B, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    step = make_gan_train_step(gen, disc, cfg)
    gstate = TrainState.create(g_vars["params"], make_optimizer(1.6e-4))
    dstate = TrainState.create(d_vars["params"], make_optimizer(1.6e-4))
    lstate = init_lambda_state(0.01)
    key = jax.random.key(7, impl=cfg.rng_impl)

    def chained(state):
        gs, ds, ls = state
        gs, ds, ls, m = step(gs, ds, ls, batch, key, jnp.float32(0.9))
        return (gs, ds, ls), m["cap_loss"]

    return chained, (gstate, dstate, lstate)


def parse_perfetto(trace_dir):
    """Aggregate device-track complete events by name from the perfetto json."""
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    # device pids: process_name metadata containing 'TPU' / 'Device'
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Device" in n or "/device" in n}
    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))  # microseconds
            agg[name][0] += dur
            agg[name][1] += 1
            total += dur
    rows = sorted(
        ({"name": k, "total_us": round(v[0], 1), "count": v[1]} for k, v in agg.items()),
        key=lambda r: -r["total_us"],
    )
    return {"device_pids": sorted(dev_pids), "total_us": round(total, 1), "rows": rows}


def main():
    chained, state = build_step()
    print("compiling train step...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    state, loss = chained(state)
    _fetch(loss)
    print(f"compiled in {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    state, loss = chained(state)
    _fetch(loss)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR, create_perfetto_trace=True)
    n_traced = 3
    for _ in range(n_traced):
        state, loss = chained(state)
        _fetch(loss)
    jax.profiler.stop_trace()

    table = parse_perfetto(TRACE_DIR)
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
