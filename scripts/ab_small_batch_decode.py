"""Decode cost vs batch size: is the 26-step beam chain latency- or
throughput-bound below B=128? Decides whether the two-pass bucket branch can
ever pay (pass2 re-decodes `bucket` rows at full length).

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_small_batch_decode.py
"""
import json, os, statistics, sys, time
import jax, jax.numpy as jnp, numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "bisect_results.jsonl")
V = 10000

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

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)
    sizes = (16, 32, 64, 128)
    Bmax = max(sizes)
    frames = jnp.asarray(rng.normal(size=(Bmax, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(rng.normal(size=(Bmax, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32)
    captions = jnp.asarray(rng.integers(4, V, size=(Bmax, cfg.max_words)), jnp.int32)
    model = CapGnnModel(cfg, V)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)
    decode = make_decode_fn(model, cfg, beam_size=5)

    steps = {}
    for b in sizes:
        def mk(b):
            @jax.jit
            def step(c, vs, f, r):
                ids = decode(vs, f[:b] + c * 1e-12, r[:b])
                return (jnp.sum(ids) % 97).astype(jnp.float32)
            return step
        steps[b] = mk(b)
        t0 = time.perf_counter()
        _fetch(steps[b](jnp.float32(0), variables, frames, regions))
        print(f"B={b} compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)

    overhead = _null_overhead()
    times = {b: [] for b in sizes}
    c = jnp.float32(0)
    for _ in range(10):
        for b in sizes:
            t0 = time.perf_counter()
            c = steps[b](c, variables, frames, regions)
            _fetch(c)
            times[b].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "decode_batch_scaling_r3"}
    for b in sizes:
        rec[f"b{b}_ms"] = round(statistics.median(times[b]), 2)
    log(rec)
    return 0

if __name__ == "__main__":
    sys.exit(main())
