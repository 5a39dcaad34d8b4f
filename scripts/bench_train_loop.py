"""Measure the REAL RunGAN.train() loop at MSR-VTT scale (VERDICT r4 #2).

Drives the actual trainer — CaptionDataset -> train_batches(get_batch) ->
prefetch_to_device -> jitted gan_step -> lagged metric consume — on the
fabricated reference-format dataset (scripts/make_ref_dataset.py) and times
the steady-state step cadence, to compare against bench.py's isolated-step
number. The loop is healthy iff steady-state clips/s ~= the step bench; a gap
is the input pipeline (host assembly and/or host->device transfer).

The gan_step is wrapped with a timestamp + step limit; inter-call wall deltas
are the true cadence (the prefetch queue's backpressure and the lagged
consume's host sync bound the dispatch rate to the real throughput).

Run (TPU): python scripts/bench_train_loop.py --data_dir /root/fabdata --steps 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class _Done(Exception):
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--stage_dtype", default="float32",
                    help="input_stage_dtype: float32 | bfloat16")
    args = ap.parse_args()

    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
    from dlsg_tpu.data.datasets import CaptionDataset, EvalVideoDataset
    from dlsg_tpu.metrics.scorer import load_references_txt
    from dlsg_tpu.train.trainer import RunGAN
    from dlsg_tpu.vocab import Vocabulary

    cfg = apply_dataset_overrides(
        DLSGConfig(
            dataset="msr-vtt",
            data_dir=args.data_dir,
            compute_dtype=args.dtype,
            input_stage_dtype=args.stage_dtype,
            result_dir="/tmp/loopbench_results",
            log_every=10,
        )
    )
    vocab = Vocabulary.load_reference_pkl(cfg.vocab_pkl_path)
    t0 = time.time()
    runner = RunGAN(
        cfg,
        vocab,
        CaptionDataset(cfg),
        EvalVideoDataset(cfg),
        load_references_txt(cfg.test_reference_txt_path),
    )
    print(f"trainer init: {time.time() - t0:.0f}s", file=sys.stderr, flush=True)

    real_step = runner.gan_step
    stamps: list = []

    def timed(*a):
        stamps.append(time.perf_counter())
        if len(stamps) > args.steps:
            raise _Done()
        return real_step(*a)

    runner.gan_step = timed
    t0 = time.time()
    try:
        runner.train()
    except _Done:
        pass
    print(f"{len(stamps) - 1} steps in {time.time() - t0:.0f}s (incl. compile)",
          file=sys.stderr, flush=True)

    deltas = np.diff(stamps)
    steady = deltas[5:]  # first call compiles; next few fill the pipeline
    med = float(np.median(steady))
    # MEAN is the honest throughput: the lagged metric consume (log_every)
    # syncs the host to the device+transfer backlog, so the cadence is a few
    # fast dispatches followed by one long stall — the median alone hides
    # the stall entirely (first run: median 3.2 s, p90 110 s).
    mean = float(np.mean(steady))
    out = {
        "steps_timed": int(len(steady)),
        "first_step_s_incl_compile": round(float(deltas[0]), 1),
        "mean_steady_s_per_step": round(mean, 3),
        "median_steady_s_per_step": round(med, 3),
        "loop_clips_per_s": round(cfg.train_batch_size / mean, 1),
        "p90_s_per_step": round(float(np.percentile(steady, 90)), 3),
        "batch": cfg.train_batch_size,
        "dtype": args.dtype,
        "stage_dtype": args.stage_dtype,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
