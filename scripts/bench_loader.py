"""Host input-pipeline throughput at real MSR-VTT scale (VERDICT r4 #2).

Measures, WITHOUT any device in the loop, how fast the host side can assemble
training batches from the reference-format h5 files (fabricated by
scripts/make_ref_dataset.py):

  stack   — the shipped path: train_batches -> _stack_batch (per-sample h5
            reads + np.stack)
  direct  — CaptionDataset.get_batch (h5 read_direct into a preallocated
            batch, one copy instead of two), if present

Reports ms/batch, GiB/s of assembled features, and the implied ceiling in
clips/s to compare against bench.py's isolated-step number (the loop is
starved iff host ms/batch > step ms). Run on the machine that feeds the TPU:

  JAX_PLATFORMS=cpu python scripts/bench_loader.py --data_dir /root/fabdata \
      [--batches 30] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides  # noqa: E402
from dlsg_tpu.data.datasets import CaptionDataset  # noqa: E402
from dlsg_tpu.data.loader import train_batches  # noqa: E402


def measure(ds, batch, n_batches, use_get_batch):
    it = train_batches(ds, batch, seed=1, use_get_batch=use_get_batch)
    times = []
    nbytes = 0
    t_prev = time.perf_counter()
    for i, b in enumerate(it):
        now = time.perf_counter()
        times.append(now - t_prev)
        if i == 0:
            nbytes = sum(
                v.nbytes for k, v in b.items() if k in ("frames", "regions")
            )
        if i + 1 >= n_batches:
            break
        t_prev = time.perf_counter()
    med = float(np.median(times[1:]))  # drop the first (cold cache/open)
    return med, nbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=30)
    args = ap.parse_args()

    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", data_dir=args.data_dir)
    )
    ds = CaptionDataset(cfg)
    print(f"dataset: {len(ds)} captions, batch {args.batch}", file=sys.stderr)

    out = {}
    for name, flag in (("stack", False), ("direct", True)):
        if flag and not hasattr(ds, "get_batch"):
            continue
        med, nbytes = measure(ds, args.batch, args.batches, flag)
        out[name] = {
            "ms_per_batch": round(med * 1e3, 1),
            "gib_per_s": round(nbytes / med / 2**30, 2),
            "clips_per_s_ceiling": round(args.batch / med, 1),
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
