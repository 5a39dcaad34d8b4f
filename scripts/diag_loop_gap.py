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

    assemble_t, ship_t, sizes = [], [], []
    for i in range(args.iters):
        t0 = time.perf_counter()
        b = next(it)
        t1 = time.perf_counter()
        feats = {k: b[k] for k in ("frames", "regions", "captions", "lengths")}
        staged = {k: jax.device_put(v, dev) for k, v in feats.items()}
        sync(staged)
        t2 = time.perf_counter()
        assemble_t.append(t1 - t0)
        ship_t.append(t2 - t1)
        sizes.append(sum(v.nbytes for v in feats.values()))
        print(
            f"iter {i}: assemble {t1-t0:.3f}s ship {t2-t1:.3f}s "
            f"({sizes[-1]/2**30:.2f} GiB)",
            file=sys.stderr,
            flush=True,
        )
        del staged

    med_a = float(np.median(assemble_t[1:]))
    med_s = float(np.median(ship_t[1:]))
    gib = sizes[-1] / 2**30
    out = {
        "assemble_s": round(med_a, 3),
        "ship_s": round(med_s, 3),
        "ship_gib_per_s": round(gib / med_s, 2),
        "serial_s": round(med_a + med_s, 3),
        "serial_clips_per_s": round(cfg.train_batch_size / (med_a + med_s), 1),
        "batch_gib": round(gib, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
