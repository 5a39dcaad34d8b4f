"""Fabricate a reference-format dataset at real MSR-VTT scale.

Purpose (VERDICT r4 #2): prove the trainer LOOP sustains the isolated-step
throughput at real data volume — at B=128 the input pipeline must deliver
~1 GB of region features (26x36x2048 f32 x 128) per ~120 ms step. bench.py
measures the jitted step with a device-resident batch; this dataset lets
`python -m dlsg_tpu.cli train --dataset msr-vtt --data_dir <out>` drive the
REAL CaptionDataset -> train_batches -> prefetch_to_device -> gan_step loop.

Layout parity (reference: utils/data.py:13-66 + utils/opt.py:96-134):
  <out>/MSR-VTT/msr-vtt_vocab.pkl            pickled Vocabulary
  <out>/MSR-VTT/msr-vtt_captions_train.pkl   (captions, pos_tags, lengths, video_ids)
  <out>/MSR-VTT/msr-vtt_features.h5          feats (10000, 26, 2560) f32
  <out>/MSR-VTT/msrvtt_region_feature.h5     vfeats (10000, 26, 36, 2048) f32
                                             sfeats (10000, 26, 36, 5) f32
  <out>/MSR-VTT/msr-vtt_test_references.txt  vid\tsentence lines

Content is random (throughput does not depend on values). Row data for the
eval range (7010..9999) is left as UNWRITTEN h5 chunks — they read back as
zeros without consuming disk, and epoch-0's first mid-epoch eval lands at
step ~total/2 (~509 at full scale), far beyond the measured steady-state
window. All datasets are chunked one video per chunk, matching the access
pattern (CaptionDataset reads one full video row per sample).

Usage:
  python scripts/make_ref_dataset.py --out /root/fabdata \
      [--train_videos 6513] [--captions_per_video 20] [--vocab 10000]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dlsg_tpu.vocab import Vocabulary  # noqa: E402

T, F, O, R, S = 26, 2560, 36, 2048, 5  # msr-vtt dims (opt.py:20-46)
NUM_IDS = 10000  # h5 rows are indexed by video id; msr-vtt ids span 0..9999
TEST_RANGE = (7010, 10000)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train_videos", type=int, default=6513)
    ap.add_argument("--captions_per_video", type=int, default=20)
    ap.add_argument("--vocab", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    feat_dir = os.path.join(args.out, "MSR-VTT")
    os.makedirs(feat_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # ---- vocab ----
    words = [f"word{i:05d}" for i in range(args.vocab - 4)]
    vocab = Vocabulary.from_words(words)
    with open(os.path.join(feat_dir, "msr-vtt_vocab.pkl"), "wb") as f:
        pickle.dump(vocab, f)

    # ---- captions pkl: one sample per caption ----
    n_caps = args.train_videos * args.captions_per_video
    lengths = rng.integers(5, T, size=n_caps).astype(np.int32)
    caps = np.zeros((n_caps, T), np.int32)
    for i, ln in enumerate(lengths):
        caps[i, : ln - 1] = rng.integers(4, args.vocab, size=ln - 1)
        caps[i, ln - 1] = 2  # <end>
    pos = rng.integers(0, 16, size=(n_caps, T)).astype(np.int32)
    vids = np.repeat(np.arange(args.train_videos, dtype=np.int32),
                     args.captions_per_video)
    with open(os.path.join(feat_dir, "msr-vtt_captions_train.pkl"), "wb") as f:
        pickle.dump((list(caps), list(pos), list(lengths), list(vids)), f)

    # ---- test references (only needed at the (unreached) first eval) ----
    with open(os.path.join(feat_dir, "msr-vtt_test_references.txt"), "w") as f:
        for vid in range(*TEST_RANGE):
            f.write(f"{vid}\ta person is doing something in a video\n")

    # ---- feature h5s: one random block reused per row (content-free IO) ----
    frame_block = rng.normal(size=(T, F)).astype(np.float32)
    region_block = rng.normal(size=(T, O, R)).astype(np.float32)
    spatial_block = rng.normal(size=(T, O, S)).astype(np.float32)

    t0 = time.time()
    with h5py.File(os.path.join(feat_dir, "msr-vtt_features.h5"), "w") as h5:
        feats = h5.create_dataset("feats", (NUM_IDS, T, F), np.float32,
                                  chunks=(1, T, F))
        h5.create_dataset("lens", data=np.full(NUM_IDS, T, np.int32))
        for v in range(args.train_videos):
            feats[v] = frame_block
    print(f"frames h5 done in {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    with h5py.File(os.path.join(feat_dir, "msrvtt_region_feature.h5"), "w") as h5:
        vf = h5.create_dataset("vfeats", (NUM_IDS, T, O, R), np.float32,
                               chunks=(1, T, O, R))
        sf = h5.create_dataset("sfeats", (NUM_IDS, T, O, S), np.float32,
                               chunks=(1, T, O, S))
        for v in range(args.train_videos):
            vf[v] = region_block
            sf[v] = spatial_block
            if v % 500 == 0:
                print(f"  region rows {v}/{args.train_videos} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    print(f"region h5 done in {time.time() - t0:.0f}s", flush=True)

    gb = args.train_videos * (frame_block.nbytes + region_block.nbytes
                              + spatial_block.nbytes) / 2**30
    print(f"fabricated {args.train_videos} videos / {n_caps} captions "
          f"(~{gb:.1f} GiB written) under {feat_dir}")


if __name__ == "__main__":
    main()
