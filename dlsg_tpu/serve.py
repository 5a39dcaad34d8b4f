"""Serving API.

A thin production-facing layer over the decode pipeline: load a trained
checkpoint once, then caption pre-extracted feature batches at the measured
~4.5k captions/s (beam 5, v5e). The reference has no serving story — its only
inference path is the evaluation loop inside training.

Usage:
    captioner = Captioner.from_checkpoint(cfg, vocab, ckpt_dir, "best_CIDEr")
    sentences = captioner.caption(frames, regions)       # beam search
    sentences = captioner.caption(frames, regions, greedy=True)
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu import checkpoint as ckpt
from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.data.prefetch import stage_cast
from dlsg_tpu.evaluation.evaluate import make_decode_fn
from dlsg_tpu.utils.hostinit import (
    ensure_local_cpu_backend,
    init_on_host,
    place_replicated,
)
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.vocab import Vocabulary


def jsonable_id(vid):
    """Normalize a video id (numpy scalar / str / int) for JSON output.

    Integer ids stay integers; anything else passes through as a string —
    MSR-VTT-style 'video7001' names must survive verbatim."""
    v = vid.item() if hasattr(vid, "item") else vid
    return int(v) if isinstance(v, (int, np.integer)) else str(v)


class Captioner:
    """NB: `cfg` is taken as FINAL (apply_dataset_overrides yourself if you
    built it by hand; parse_opt already applies them).

    `fast=True` drops the beam top-k to recall 0.95 (decode_approx_topk;
    the default is already the exact PartialReduce path at recall 1.0):
    measured -8.5% latency at 99.97% token agreement with the exact beam
    (BENCHMARKS.md, vs the then-default sort-based top-k). Serving has no
    reference parity contract, so the trade is explicit and per-instance.
    """

    def __init__(
        self, cfg: DLSGConfig, vocab: Vocabulary, params, fast: bool = False,
        mesh=None,
    ):
        if fast:
            from dataclasses import replace

            cfg = replace(cfg, decode_approx_topk=0.95)
        self.cfg = cfg
        self.vocab = vocab
        self.model = CapGnnModel(self.cfg, len(vocab))
        self.variables = {"params": params}
        # with a mesh, decode shards each bucket over the data axis (the
        # decode wrapper pads to a data-axis multiple itself) — multi-chip
        # serving throughput instead of decoding everything on device 0
        self._beam_fn = make_decode_fn(
            self.model, self.cfg, beam_size=self.cfg.beam_size, mesh=mesh
        )
        self._greedy_fn = make_decode_fn(self.model, self.cfg, beam_size=1, mesh=mesh)
        self._batch = self.cfg.test_batch_size

    @classmethod
    def from_checkpoint(
        cls,
        cfg: DLSGConfig,
        vocab: Vocabulary,
        ckpt_dir: Optional[str] = None,
        name: str = "best_CIDEr",
        fast: bool = False,
        mesh=None,
    ) -> "Captioner":
        cfg2 = cfg
        model = CapGnnModel(cfg2, len(vocab))
        # Restore template built on the LOCAL CPU backend at batch 1 — the
        # serving cold-start used to run eager full-batch init through the
        # relay (~400 s of RTTs at MSR-VTT dims, utils/hostinit.py) before a
        # single caption. Param shapes are batch-independent and threefry is
        # backend-deterministic, so the template is identical.
        ensure_local_cpu_backend()
        frames = np.zeros((1, cfg2.max_frames, cfg2.feature_size), np.float32)
        regions = np.zeros(
            (1, cfg2.max_frames, cfg2.num_obj, cfg2.region_feature_size), np.float32
        )
        caps = np.zeros((1, cfg2.max_words), np.int32)
        params = init_on_host(
            model, jax.random.PRNGKey(cfg2.seed), frames, regions, caps
        )["params"]
        params = ckpt.restore_model(ckpt_dir or cfg2.checkpoint_dir, name, params)
        # the template may be CPU-committed: stage the restored tree on the
        # accelerator explicitly (device_put with no target is a no-op for
        # committed arrays — see the hostinit placement note)
        params = place_replicated(params, mesh)
        return cls(cfg, vocab, params, fast=fast, mesh=mesh)

    @classmethod
    def from_params(
        cls, cfg: DLSGConfig, vocab: Vocabulary, params, fast: bool = False,
        mesh=None,
    ) -> "Captioner":
        return cls(cfg, vocab, params, fast=fast, mesh=mesh)

    @classmethod
    def from_bundle(
        cls, path: str, fast: bool = False, mesh=None
    ) -> "Captioner":
        """Load a single-file serving bundle (bundle.py::save_bundle) — the
        deployment path: no checkpoint dir, vocab pkl, or flag matching."""
        from dlsg_tpu.bundle import load_bundle

        cfg, vocab, params = load_bundle(path)
        return cls(cfg, vocab, params, fast=fast, mesh=mesh)

    # smallest compiled batch; buckets double from here up to test_batch_size
    MIN_BUCKET = 8

    def _bucket_size(self, n: int) -> int:
        """Smallest power-of-two bucket >= n (capped at the full batch size).

        Arbitrary request sizes land on a BOUNDED set of compiled shapes
        (8, 16, 32, ... B) instead of one compile per distinct N; small
        requests pay small-bucket latency instead of the full-batch decode.
        """
        b = self.MIN_BUCKET
        while b < min(n, self._batch):
            b *= 2
        return min(b, self._batch)

    def bucket_sizes(self) -> List[int]:
        """The bounded set of compiled batch shapes requests can land on."""
        sizes, b = [], self.MIN_BUCKET
        while b < self._batch:
            sizes.append(b)
            b *= 2
        sizes.append(self._batch)
        return sorted({min(s, self._batch) for s in sizes})

    def warmup(self, greedy: bool = False) -> int:
        """Pre-compile every bucket shape so no live request pays a compile.

        First-compile on TPU is tens of seconds per shape — a cold serving
        process would stall its first requests for minutes. Call this before
        accepting traffic (cli `serve --listen --warmup` does). Returns the
        number of shapes compiled; with `greedy`, warms the greedy decoder
        instead of the beam."""
        cfg = self.cfg
        for b in self.bucket_sizes():
            fr = np.zeros((b, cfg.max_frames, cfg.feature_size), np.float32)
            rg = np.zeros(
                (b, cfg.max_frames, cfg.num_obj, cfg.region_feature_size), np.float32
            )
            self.caption(fr, rg, greedy=greedy)
        self.warm = True
        return len(self.bucket_sizes())

    warm = False  # flipped by warmup(); surfaced in the HTTP /healthz payload

    def caption(self, frames, regions, greedy: bool = False) -> List[str]:
        """Caption a batch of feature clips.

        frames: [N, max_frames, 2560]; regions: [N, max_frames, >=num_obj, 2048].
        Any N — internally padded to a power-of-two bucket. Returns N strings.
        """
        cfg = self.cfg
        frames = np.asarray(frames, np.float32)
        regions = np.asarray(regions, np.float32)[:, :, : cfg.num_obj, :]
        N = frames.shape[0]
        fn = self._greedy_fn if greedy else self._beam_fn
        out: List[str] = []
        B = self._batch
        for s in range(0, N, B):
            fr = frames[s : s + B]
            rg = regions[s : s + B]
            n = fr.shape[0]
            b = self._bucket_size(n)
            if n < b:  # pad to the bucket's static shape
                fr = np.concatenate([fr, np.repeat(fr[-1:], b - n, 0)], 0)
                rg = np.concatenate([rg, np.repeat(rg[-1:], b - n, 0)], 0)
            # input_stage_dtype staging policy (shared stage_cast; tokens
            # identical under bf16 compute, BENCHMARKS.md)
            sd = cfg.stage_dtype
            fr, rg = stage_cast(fr, sd), stage_cast(rg, sd)
            ids = np.asarray(fn(self.variables, jnp.asarray(fr), jnp.asarray(rg)))
            out.extend(self.vocab.decode_tokens(t) for t in ids[:n])
        return out
