"""Interleaved A/B: exact lax.top_k vs TPU approx_max_k (recall 0.95/0.99)
in the beam-5 decode, plus the caption agreement rate vs exact.

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_approx_topk.py
"""
import json, os, statistics, sys, time
from dataclasses import replace
import jax, jax.numpy as jnp, numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bisect_results.jsonl")
V, B = 10000, 128

def log(rec):
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
        s = null(s); _fetch(s)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)

def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    base = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=(B, base.max_frames, base.feature_size)), jnp.float32)
    regions = jnp.asarray(rng.normal(size=(B, base.max_frames, base.num_obj, base.region_feature_size)), jnp.float32)
    captions = jnp.asarray(rng.integers(4, V, size=(B, base.max_words)), jnp.int32)
    model = CapGnnModel(base, V)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)

    fns = {
        "topk_exact": make_decode_fn(model, base, beam_size=5),
        "topk_approx95": make_decode_fn(model, replace(base, decode_approx_topk=0.95), beam_size=5),
        "topk_approx99": make_decode_fn(model, replace(base, decode_approx_topk=0.99), beam_size=5),
    }
    steps, ids_by = {}, {}
    for name, fn in fns.items():
        def mk(fn):
            @jax.jit
            def step(c, vs, f, r):
                ids = fn(vs, f + c * 1e-12, r)
                return (jnp.sum(ids) % 97).astype(jnp.float32)
            return step
        steps[name] = mk(fn)
        t0 = time.perf_counter()
        _fetch(steps[name](jnp.float32(0), variables, frames, regions))
        print(f"{name} compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        ids_by[name] = np.asarray(fn(variables, frames, regions))

    ex = ids_by["topk_exact"]
    agree = {
        k: float((v == ex).mean()) for k, v in ids_by.items()
    }
    overhead = _null_overhead()
    times = {k: [] for k in steps}
    c = jnp.float32(0)
    for _ in range(10):
        for name, step in steps.items():
            t0 = time.perf_counter()
            c = step(c, variables, frames, regions)
            _fetch(c)
            times[name].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "approx_topk_ab_r3", "token_agreement": agree}
    for k, v in times.items():
        rec[k + "_ms"] = round(statistics.median(v), 2)
    log(rec)
    return 0

if __name__ == "__main__":
    sys.exit(main())
