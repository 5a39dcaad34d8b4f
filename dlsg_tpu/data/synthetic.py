"""Synthetic data for tests and benchmarks.

The reference ships no data (features live in gitignored HDF5 files); this
module fabricates datasets with the exact shapes of `utils/data.py` samples —
frames [T, 2560], regions [T, num_obj, 2048], captions [26] — so the full
pipeline (train loop, eval loop, metrics) can run hermetically.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.vocab import END_ID, Vocabulary

_WORDS = (
    "a the man woman dog cat is are playing running jumping singing cooking "
    "riding guitar piano ball street park video person group people doing "
    "something talking walking eating food small large red blue fast slow"
).split()


def make_vocab(extra_words: int = 0) -> Vocabulary:
    words = list(_WORDS) + [f"w{i}" for i in range(extra_words)]
    return Vocabulary.from_words(words)


class SyntheticDataset:
    """In-memory dataset with CaptionDataset/EvalVideoDataset sample structure."""

    def __init__(
        self,
        cfg: DLSGConfig,
        vocab: Vocabulary,
        num_videos: int = 16,
        captions_per_video: int = 3,
        seed: int = 0,
    ):
        self.cfg = cfg
        rng = np.random.default_rng(seed)
        T, F = cfg.max_frames, cfg.feature_size
        O, R = cfg.num_obj, cfg.region_feature_size
        self.frames = rng.normal(size=(num_videos, T, F)).astype(np.float32)
        self.regions = rng.normal(size=(num_videos, T, O, R)).astype(np.float32)
        self.spatials = rng.normal(
            size=(num_videos, T, O, cfg.spatial_feature_size)
        ).astype(np.float32)

        self.samples: List[Tuple[int, np.ndarray, int]] = []
        self.references: Dict[str, List[str]] = {}
        word_ids = [vocab(w) for w in _WORDS]
        for v in range(num_videos):
            self.references[str(v)] = []
            for _ in range(captions_per_video):
                length = int(rng.integers(3, min(cfg.max_words - 1, 10)))
                toks = rng.choice(word_ids, size=length).astype(np.int32)
                cap = np.zeros(cfg.max_words, np.int32)
                cap[:length] = toks
                cap[length] = END_ID
                self.samples.append((v, cap, length + 1))
                self.references[str(v)].append(
                    " ".join(vocab.idx2word[t] for t in toks)
                )

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int):
        vid, cap, length = self.samples[index]
        return {
            "frames": self.frames[vid],
            "regions": self.regions[vid],
            "spatials": self.spatials[vid],
            "captions": cap,
            "pos_tags": cap,
            "lengths": np.int32(length),
            "video_ids": np.int32(vid),
        }

    def eval_view(self) -> "SyntheticEvalView":
        return SyntheticEvalView(self)


class SyntheticEvalView:
    """Per-video view (EvalVideoDataset equivalent)."""

    def __init__(self, ds: SyntheticDataset):
        self.ds = ds

    def __len__(self) -> int:
        return self.ds.frames.shape[0]

    def __getitem__(self, index: int):
        return {
            "frames": self.ds.frames[index],
            "regions": self.ds.regions[index],
            "spatials": self.ds.spatials[index],
            "video_ids": np.int32(index),
        }
