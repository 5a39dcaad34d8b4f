"""Interleaved A/B: beam-5 decode at B=128 vs B=256 (serving throughput headroom).

The round-3 batch-scaling law (decode_batch_scaling_r3: 9.8/14.1/20.0/32.2 ms
at B=16/32/64/128) showed the 26-step chain is latency-floor-bound below
B~64 and the marginal cost of batch is sub-linear above it. This measures
whether B=256 keeps that trend on the current HEAD — if the per-caption cost
keeps falling, serving deployments should batch larger than the reference's
test batch of 128. The headline bench stays at B=128 (workload parity).

Run (TPU): PYTHONPATH=/root/.axon_site:/root/repo timeout 3500 python scripts/ab_decode_b256_r4.py
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
        s = null(s)
        _fetch(s)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    rng = np.random.default_rng(0)

    def batch(B):
        frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
        regions = jnp.asarray(
            rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)), jnp.float32
        )
        return frames, regions

    captions = jnp.asarray(rng.integers(4, V, size=(2, cfg.max_words)), jnp.int32)
    f0, r0 = batch(2)
    model = CapGnnModel(cfg, V)
    variables = model.init(jax.random.PRNGKey(0), f0, r0, captions)
    decode = make_decode_fn(model, cfg, beam_size=5)

    steps, data = {}, {}
    for B in (128, 256):
        frames, regions = batch(B)
        data[B] = (frames, regions)

        @jax.jit
        def step(c, vs, f, r):
            ids = decode(vs, f + c * 1e-12, r)
            return (jnp.sum(ids) % 97).astype(jnp.float32)

        t0 = time.perf_counter()
        _fetch(step(jnp.float32(0), variables, frames, regions))
        print(f"B={B} compiled {time.perf_counter()-t0:.0f}s", file=sys.stderr, flush=True)
        steps[B] = step

    overhead = _null_overhead()
    times = {B: [] for B in steps}
    c = jnp.float32(0)
    for _ in range(10):
        for B, step in steps.items():
            frames, regions = data[B]
            t0 = time.perf_counter()
            c = step(c, variables, frames, regions)
            _fetch(c)
            times[B].append((time.perf_counter() - t0 - overhead) * 1e3)
    rec = {"name": "decode_b256_ab_r4"}
    for B, ts in times.items():
        ms = statistics.median(ts)
        rec[f"b{B}_ms"] = round(ms, 2)
        rec[f"b{B}_cps"] = round(B / (ms / 1e3), 1)
        rec[f"all_b{B}"] = [round(t, 2) for t in ts]
    log(rec)
    return 0


if __name__ == "__main__":
    sys.exit(main())
