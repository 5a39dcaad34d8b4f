"""End-to-end HTTP serving throughput on the real TPU.

Measures captions/s through the FULL serving stack — HTTP parse, npz decode,
bucket padding, TPU beam decode, JSON response — against a localhost
CaptionServer, for comparison with bench.py's raw decode number (the gap is
the serving overhead). Uses the bench.py workload shape: beam 5, B=128,
msr-vtt dims, synthetic random params (throughput is params-independent).

Writes one JSON line to stdout:
  {"metric": "serving_http", "captions_per_s": N, "raw_decode_per_s": M,
   "overhead_pct": P, "n": total}
"""

import io
import json
import sys
import time
import urllib.request

import numpy as np

import jax

from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
from dlsg_tpu.data.synthetic import make_vocab
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.serve import Captioner
from dlsg_tpu.server import CaptionServer


def main():
    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16")
    )
    B = cfg.test_batch_size if on_tpu else 8
    if not on_tpu:
        from dlsg_tpu.config import tiny_test_config

        cfg = tiny_test_config(test_batch_size=8, beam_size=2)

    # vocab sized like the real one on TPU so the vocab matmul is honest
    # (bench.py uses 10000 too)
    if on_tpu:
        from dlsg_tpu.vocab import Vocabulary

        vocab = Vocabulary.from_words(f"w{i}" for i in range(10000 - 4))
    else:
        vocab = make_vocab()
    import jax.numpy as jnp

    model = CapGnnModel(cfg, len(vocab))
    frames0 = jnp.zeros((B, cfg.max_frames, cfg.feature_size))
    regions0 = jnp.zeros((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps0 = jnp.zeros((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames0, regions0, caps0)["params"]
    cap = Captioner.from_params(cfg, vocab, params)
    print("warming up (compiles the full-batch bucket)...", file=sys.stderr)
    cap.warmup()

    srv = CaptionServer(cap, host="127.0.0.1", port=0)
    srv.start_background()
    host, port = srv.server_address[:2]
    url = f"http://{host}:{port}/caption"

    rng = np.random.default_rng(0)
    # f16 bodies: dense msr-vtt region features are 7.7 MB/clip at f32 —
    # a 128-clip f32 request would be ~1 GB. Half-precision on the wire is
    # the realistic transport (the model computes in bf16 anyway).
    frames = rng.normal(size=(B, cfg.max_frames, cfg.feature_size)).astype(np.float16)
    regions = rng.normal(
        size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    ).astype(np.float16)

    def post(body, n):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/x-npz"}
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            payload = json.loads(resp.read())
        assert len(payload["captions"]) == n
        return payload

    results = {}
    reps = 10 if on_tpu else 3
    req_sizes = sorted({min(16, B), B})
    for n in req_sizes:
        buf = io.BytesIO()
        np.savez(buf, frames=frames[:n], regions=regions[:n])
        body = buf.getvalue()
        post(body, n)  # warm this bucket + server-path caches
        t0 = time.perf_counter()
        for _ in range(reps):
            post(body, n)
        dt = time.perf_counter() - t0
        results[f"http_{n}_per_s"] = round(reps * n / dt, 1)
        results[f"body_{n}_mb"] = round(len(body) / 2**20, 1)

    # raw decode rate for the same workload, bypassing HTTP + npz
    t0 = time.perf_counter()
    for _ in range(reps):
        cap.caption(frames, regions)
    raw_dt = time.perf_counter() - t0
    raw_rate = reps * B / raw_dt

    # scrape /metrics at the end: validates the observability path under the
    # same load the benchmark just generated
    with urllib.request.urlopen(f"http://{host}:{port}/metrics") as r:
        scraped = {}
        for line in r.read().decode().splitlines():
            if line and not line.startswith("#"):
                # tolerate >2 fields (Prometheus lines may carry timestamps)
                parts = line.split()
                scraped[parts[0]] = float(parts[1])

    http_rate = results[f"http_{B}_per_s"]
    print(json.dumps({
        "metric": "serving_http",
        "captions_per_s": http_rate,
        "raw_decode_per_s": round(raw_rate, 1),
        "overhead_pct": round(100 * (raw_rate - http_rate) / raw_rate, 2),
        **results,
        "metrics_requests_total": scraped.get("dlsg_requests_total"),
        "metrics_clips_total": scraped.get("dlsg_clips_total"),
        "metrics_errors_total": scraped.get("dlsg_errors_total"),
        "batch": B,
        "beam": cfg.beam_size,
        "platform": jax.devices()[0].platform,
    }))
    srv.shutdown()
    srv.server_close()


if __name__ == "__main__":
    main()
