"""Attribute the real-data loop gap (39.7 clips/s loop vs ~1060 step bench).

Times the three candidate bounds separately on THIS machine:
  assemble — host batch assembly via CaptionDataset.get_batch (warm cache)
  ship     — jax.device_put of a full ~0.95 GiB feature batch through the
             relay, synced by a host fetch (block_until_ready does not block
             over the relay — CLAUDE.md)
  both     — assemble + ship serially (what one core + one prefetch thread
             degenerates to when compute is faster than either)

Run (TPU): python scripts/diag_loop_gap.py --data_dir /root/fabdata
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax

    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.data.datasets import CaptionDataset
    from dlsg_tpu.data.loader import train_batches

    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", data_dir=args.data_dir)
    )
    ds = CaptionDataset(cfg)
    it = train_batches(ds, cfg.train_batch_size, seed=1, use_get_batch=True)

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr, flush=True)

    def sync(tree):
        # A host fetch is the only reliable sync through the relay.
        for v in tree.values():
            if hasattr(v, "addressable_shards"):
                np.asarray(v.addressable_data(0)[(0,) * v.ndim])

    import jax.numpy as jnp

    assemble_t, sizes = [], []
    ship_t = {"fp32": [], "bf16_cast": [], "bf16_ship": []}
    for i in range(args.iters):
        t0 = time.perf_counter()
        b = next(it)
        t1 = time.perf_counter()
        feats = {k: b[k] for k in ("frames", "regions", "captions", "lengths")}
        # interleaved fp32 vs bf16 ship of the SAME batch (same cache state)
        staged = {k: jax.device_put(v, dev) for k, v in feats.items()}
        sync(staged)
        t2 = time.perf_counter()
        del staged
        half = {
            k: (v.astype(jnp.bfloat16) if v.dtype == np.float32 else v)
            for k, v in feats.items()
        }
        t3 = time.perf_counter()
        staged = {k: jax.device_put(v, dev) for k, v in half.items()}
        sync(staged)
        t4 = time.perf_counter()
        del staged
        assemble_t.append(t1 - t0)
        ship_t["fp32"].append(t2 - t1)
        ship_t["bf16_cast"].append(t3 - t2)
        ship_t["bf16_ship"].append(t4 - t3)
        sizes.append(sum(v.nbytes for v in feats.values()))
        print(
            f"iter {i}: assemble {t1-t0:.3f}s ship_fp32 {t2-t1:.3f}s "
            f"cast {t3-t2:.3f}s ship_bf16 {t4-t3:.3f}s "
            f"({sizes[-1]/2**30:.2f} GiB)",
            file=sys.stderr,
            flush=True,
        )

    med = lambda xs: float(np.median(xs[1:]))  # noqa: E731
    gib = sizes[-1] / 2**30
    out = {
        "assemble_s": round(med(assemble_t), 3),
        "ship_fp32_s": round(med(ship_t["fp32"]), 3),
        "ship_fp32_gib_per_s": round(gib / med(ship_t["fp32"]), 3),
        "bf16_cast_s": round(med(ship_t["bf16_cast"]), 3),
        "ship_bf16_s": round(med(ship_t["bf16_ship"]), 3),
        "batch_gib": round(gib, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
