"""Configuration system.

Capability parity with the reference's argparse config (`utils/opt.py:6-152`) plus
the per-dataset runtime overrides applied by the trainers (`run_gun.py:31-40`,
`run_graph.py:30-33`). Re-designed as a frozen dataclass so the whole config can be
hashed and closed over by jitted functions, with a CLI that accepts the same flag
names and defaults as the reference.

Differences from the reference (deliberate, documented in SURVEY.md §7):
- no argparse-at-import side effects (reference quirk at `utils/data.py:11`)
- no hard-coded `logs/hehe` tensorboard dir (`utils/opt.py:150`)
- per-dataset overrides are an explicit, testable function instead of constructor
  mutation.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field, replace
from typing import Optional, Tuple


@dataclass(frozen=True)
class DLSGConfig:
    """All hyper-parameters of the D-LSG system.

    Field names and defaults mirror `utils/opt.py:16-89` so that users of the
    reference find the same knobs here.
    """

    # ---- General settings (opt.py:16-23) ----
    dataset: str = "msvd"  # 'msvd' | 'msr-vtt'
    epoch_num: int = 60
    save_per_epoch: int = 8
    train_batch_size: int = 128
    test_batch_size: int = 128
    beam_size: int = 5
    use_glove: bool = False

    # ---- Network settings (opt.py:26-56) ----
    model: str = "RMN"
    dropout: float = 0.3
    use_graph: bool = True
    use_psl_loss: bool = False
    use_visual_gan: bool = True
    use_lang_gan: bool = False
    num_D_switch: int = 3
    num_D_lang: int = 5
    lambda_D_lang: float = 0.006
    num_D_visual: int = 5
    lambda_D_visual: float = 0.01

    frame_hidden_size: int = 1000
    motion_hidden_size: int = 1000
    visual_hidden_size: int = 1024
    region_projected_size: int = 1024
    spatial_projected_size: int = 300
    num_proposals: int = 8
    num_obj: int = 16
    num_topk: int = 3

    word_size: int = 300
    gan_word_size: int = 512
    hidden_size: int = 1300
    att_size: int = 1024
    time_size: int = 300
    query_hidden_size: int = 1024
    decode_hidden_size: int = 1536
    ss_factor: int = 20

    # ---- Optimization settings (opt.py:59-63) ----
    learning_rate: float = 0.00016
    grad_clip: float = 10.0

    # ---- Feature extraction constants (opt.py:66-72) ----
    max_frames: int = 26
    max_words: int = 26
    num_boxes: int = 36
    a_feature_size: int = 1536
    m_feature_size: int = 1024
    region_feature_size: int = 2048
    spatial_feature_size: int = 5

    # ---- Dataset ranges (opt.py:79-89) ----
    msrvtt_train_range: Tuple[int, int] = (0, 6513)
    msrvtt_val_range: Tuple[int, int] = (6513, 7010)
    msrvtt_test_range: Tuple[int, int] = (7010, 10000)
    msvd_train_range: Tuple[int, int] = (0, 1200)
    msvd_val_range: Tuple[int, int] = (1200, 1300)
    msvd_test_range: Tuple[int, int] = (1300, 1970)

    # ---- Paths (derived like opt.py:96-134; relative to data_dir) ----
    data_dir: str = "./data"
    result_dir: str = "./results/dlsg"

    # ---- GloVe embedding import (layer.py:352-386) ----
    # text file of `word v1 .. v300` lines; cached per dataset as .npy
    glove_txt_path: str = ""  # "" -> data_dir/glove.42B.300d.txt (layer.py:358)
    # freeze the grafted word embedding (requires_grad=False, model.py:52-53)
    freeze_word_embed: bool = False

    # ---- TPU-native settings (new; no reference equivalent) ----
    # compute dtype for matmuls/activations; params stay fp32.
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # dtype the float feature batches (frames/regions) are staged to the
    # device in. 'bfloat16' halves host->device bytes — numerics-identical
    # under compute_dtype=bfloat16 (every consumer casts to bf16 before the
    # MXU; tests/test_train_steps.py bit-identity) but measured +4-5% DEVICE
    # step time (BENCHMARKS.md "bf16-staged inputs"), so it only pays when
    # the training loop is transfer-bound: a remote/relay-attached TPU at
    # ~0.04 GiB/s, not a co-located host. Off (fp32) by default. Note: under
    # compute_dtype='float32' the bf16 cast truncates features BEFORE fp32
    # matmuls and is no longer numerics-identical — a deliberate
    # memory/transfer trade, not the validated default pairing.
    input_stage_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # training-batch assembly worker processes (the reference's DataLoader
    # num_workers=4, utils/data.py:118). 0 = in-process single-copy get_batch
    # (~2.3 GiB/s warm — enough wherever the host->device link is the loop
    # bound, e.g. a relay-attached chip); >0 spawns that many workers filling
    # shared-memory slots (data/parallel_loader.py) for co-located hosts
    # where single-core assembly (~419 ms/batch at MSR-VTT B=128) would
    # starve a ~112 ms step. Requires a dataset with spawn_spec()
    # (CaptionDataset / EvalVideoDataset).
    loader_workers: int = 0
    use_pallas_lstm: bool = False  # fused VMEM-resident LSTM scan kernel (TPU)
    # project the region tensor once for both TUN branches (one wide matmul).
    # Measured SLOWER on v5e (12.5 vs 9.5 ms encode: the wide output + slices
    # defeat XLA's per-branch matmul->tanh-LN fusion; bisect_results iab_enc_*)
    # - kept as an option, off by default.
    joint_region_projection: bool = False
    # fused vocab-head kernel at decode (projection + top-k + logsumexp in one
    # VMEM pass, ops/pallas/vocab_head.py). 'auto' resolves to OFF: the kernel
    # measured SLOWER than XLA's fused chain on a v5e (BENCHMARKS.md "Fused
    # vocab head"). 'on' forces it, single-device only (a Mosaic custom call
    # cannot be sharded by the partitioner; requesting 'on' under a mesh warns
    # and falls back to off).
    use_fused_vocab_head: str = "auto"  # 'auto' | 'on' | 'off'
    # surface decoder attention at eval and dump heatmaps (run_gun.py:455-465)
    plot_attention: bool = True
    seed: int = 12  # train_debug.py:34-42 seeds everything with 12
    # PRNG implementation for the TRAINING rng stream (dropout, scheduled
    # sampling, GP interpolates). 'rbg' uses the TPU's hardware RNG path —
    # threefry dropout masks measured ~7 ms/substep of pure ALU work in the
    # discriminator phase (scripts/bisect_results.jsonl ts_D_phase_scan5).
    # 'threefry2x32' restores JAX's default stream.
    rng_impl: str = "rbg"
    # write a jax.profiler device trace of a few training steps here ("" = off)
    profile_dir: str = ""
    # beam bookkeeping variant (ops/beam_search.py): single-pass clipped sumexp
    decode_fast_lse: bool = True
    # Beam top-k over the wide [G, V] candidate rows. 1.0 (default) lowers to
    # the TPU PartialReduce unit with EXACT aggregation (jax.lax.approx_max_k
    # at recall_target=1.0 — identical candidate sets incl. adversarial ties,
    # +5% captions/s vs the sort-based TopK custom call; BENCHMARKS.md round 5).
    # Values in (0, 1) trade recall for speed (serving opt-in, e.g. 0.95);
    # 0.0 = the sort-based lax.top_k custom call.
    decode_approx_topk: float = 1.0  # recall target; 1.0 = exact (default)
    # int8 weight-only quantized INFERENCE matmuls in the decode step
    # (ops/quant.py); training always runs bf16/fp32
    decode_quant: str = "none"  # 'none' | 'int8'
    # GAN step: serve BOTH phases from ONE generator forward (vjp reused for
    # the G update after the D substeps). The reference forwards twice
    # (run_gun.py:167,183) with independent noise draws purely for autograd
    # convenience; False restores that exact two-draw schedule. See
    # train/steps.py::make_gan_train_step.
    gan_single_forward: bool = True
    # WGAN-GP parameter gradient via reverse-over-forward (grad-of-jvp custom
    # VJP, ops/losses.py::make_gradient_penalty_rof) instead of autodiff's
    # reverse-over-reverse. Exact (tests/test_losses.py) and measured -16%
    # full GAN step on v5e (182.3 -> 153.2 ms interleaved A/B, dphase_ab_r4
    # in scripts/bisect_results.jsonl) — the D phase's GP double-backward was
    # the step's hottest residue. False restores plain autodiff.
    gan_gp_custom_vjp: bool = True
    # unroll factor for the num_D-substep lax.scan (1 = rolled loop). An
    # unrolled loop lets XLA overlap substep tails at the cost of num_D x
    # code size; A/B'd in scripts/ab_dphase2_r4.py.
    disc_scan_unroll: int = 1
    # rematerialization policy for the D substep's grouped trunk pass
    # ('none' | 'dots' | 'full'): trades recompute for residual HBM traffic
    # in the 5 serial WGAN-GP substeps. Measured (dphase_ab_r4): 'dots' wins
    # -8% alone but LOSES vs gan_gp_custom_vjp and hurts when combined
    # (168.8 vs 153.2 ms); 'full' is an outright loss. Default off.
    disc_remat: str = "none"
    # rematerialization policy for the training decoder scan's backward
    # ('none' | 'dots' | 'full'): trades recompute for residual HBM traffic.
    decoder_remat: str = "none"
    # per-sequence early-exit decode: pass 1 beam-decodes everyone for t1
    # steps, then only sequences whose beams have not all emitted <end> are
    # re-decoded at full max_words in `bucket`-sized chunks (exact — see
    # evaluation/evaluate.py::_make_two_pass_fn). 0 = off. Wins when captions
    # end early (real data: mean ~8 of 26 steps); single-device eval only.
    decode_two_pass_t1: int = 0
    decode_two_pass_bucket: int = 0  # 0 -> batch//4
    # mesh layout consumed by the CLI and all trainers: data x model axes
    # (model > 1 column-shards the vocab head + its Adam moments —
    # parallel/mesh.py TP_RULES/shard_train_state). -1 data = all remaining
    # devices. Batches must divide by the data axis (trainer asserts).
    mesh_data_axis: int = -1
    mesh_model_axis: int = 1
    log_every: int = 10  # run_gun.py:236 prints every 10 steps

    # ------------------------------------------------------------------
    @property
    def feature_size(self) -> int:
        """Full per-frame feature dim: appearance + motion (2560 by default)."""
        return self.a_feature_size + self.m_feature_size

    @property
    def cdtype(self):
        """Compute dtype for matmuls/activations (params stay fp32)."""
        import jax.numpy as jnp

        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def stage_dtype(self):
        """Numpy dtype float feature batches are cast to before device_put
        (None = keep the loader's fp32; see input_stage_dtype)."""
        if self.input_stage_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                "input_stage_dtype must be 'float32' or 'bfloat16', got "
                f"{self.input_stage_dtype!r}"
            )
        import jax.numpy as jnp

        return jnp.bfloat16 if self.input_stage_dtype == "bfloat16" else None

    @property
    def train_range(self) -> Tuple[int, int]:
        return self.msvd_train_range if self.dataset == "msvd" else self.msrvtt_train_range

    @property
    def val_range(self) -> Tuple[int, int]:
        return self.msvd_val_range if self.dataset == "msvd" else self.msrvtt_val_range

    @property
    def test_range(self) -> Tuple[int, int]:
        return self.msvd_test_range if self.dataset == "msvd" else self.msrvtt_test_range

    @property
    def feat_dir(self) -> str:
        sub = {"msvd": "MSVD", "msr-vtt": "MSR-VTT"}
        if self.dataset not in sub:
            raise ValueError("choose one dataset from msvd|msr-vtt")
        return os.path.join(self.data_dir, sub[self.dataset])

    # Derived data-file paths (opt.py:116-134)
    @property
    def vocab_pkl_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_vocab.pkl")

    @property
    def train_caption_pkl_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_captions_train.pkl")

    @property
    def val_caption_pkl_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_captions_val.pkl")

    @property
    def test_caption_pkl_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_captions_test.pkl")

    @property
    def feature_h5_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_features.h5")

    @property
    def region_feature_h5_path(self) -> str:
        name = {"msvd": "msvd_region_feature.h5", "msr-vtt": "msrvtt_region_feature.h5"}
        return os.path.join(self.feat_dir, name[self.dataset])

    feature_h5_feats: str = "feats"
    feature_h5_lens: str = "lens"
    region_visual_feats: str = "vfeats"
    region_spatial_feats: str = "sfeats"

    @property
    def glove_path(self) -> str:
        """Resolved GloVe text path (layer.py:356-360 fallback chain)."""
        return self.glove_txt_path or os.path.join(self.data_dir, "glove.42B.300d.txt")

    @property
    def glove_cache_npy_path(self) -> str:
        """Per-dataset .npy cache (layer.py:353)."""
        return os.path.join(self.data_dir, f"{self.dataset}_glove.npy")

    @property
    def val_reference_txt_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_val_references.txt")

    @property
    def test_reference_txt_path(self) -> str:
        return os.path.join(self.feat_dir, f"{self.dataset}_test_references.txt")

    @property
    def test_prediction_txt_path(self) -> str:
        return os.path.join(self.result_dir, f"{self.dataset}_test_predictions.txt")

    @property
    def checkpoint_dir(self) -> str:
        return os.path.join(self.result_dir, "checkpoints")

    def base_name(self) -> str:
        """Experiment name, mirroring `run_gun.py:413-431`."""
        name = f"{self.dataset}_{self.ss_factor}_GNN_{self.num_obj}_{self.num_proposals}"
        if self.use_psl_loss:
            name += "_use_psl_loss"
        if self.use_visual_gan:
            name += f"_visual_{self.lambda_D_visual}_{self.num_D_visual}"
        return name


def apply_dataset_overrides(cfg: DLSGConfig) -> DLSGConfig:
    """Per-dataset hyper-parameter overrides.

    The reference trainers mutate args in their constructors
    (`run_gun.py:31-40`): msvd → decode_hidden 1024 / 8 proposals / 16 objects /
    top-3; anything else → 1536 / 5 / 36 / 5.
    """
    if cfg.dataset == "msvd":
        return replace(cfg, decode_hidden_size=1024, num_proposals=8, num_obj=16, num_topk=3)
    return replace(cfg, decode_hidden_size=1536, num_proposals=5, num_obj=36, num_topk=5)


def tiny_test_config(**overrides) -> DLSGConfig:
    """A small config for unit tests and dry-runs (same structure, tiny dims)."""
    base = dict(
        dataset="msvd",
        train_batch_size=4,
        test_batch_size=4,
        beam_size=3,
        visual_hidden_size=32,
        region_projected_size=32,
        query_hidden_size=32,
        decode_hidden_size=32,
        word_size=16,
        gan_word_size=16,
        num_proposals=6,
        num_obj=8,
        num_topk=3,
        max_frames=7,
        max_words=9,
        a_feature_size=24,
        m_feature_size=12,
        region_feature_size=20,
        epoch_num=2,
    )
    base.update(overrides)
    return DLSGConfig(**base)


def _add_args(parser: argparse.ArgumentParser) -> None:
    """Register every scalar config field as a CLI flag with the dataclass default."""
    for f in dataclasses.fields(DLSGConfig):
        if f.type in ("str", "int", "float", str, int, float):
            typ = {"str": str, "int": int, "float": float}.get(f.type, f.type)
            parser.add_argument(f"--{f.name}", type=typ, default=f.default)
        elif f.type in ("bool", bool):
            parser.add_argument(
                f"--{f.name}",
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=f.default,
            )
        elif str(f.type).startswith("Tuple[int") or f.type == Tuple[int, int]:
            # id ranges as two ints: --msvd_test_range 1300 1970. The
            # reference's argparse for these is silently broken
            # (type=tuple, opt.py:79-89 — "1300" becomes ('1','3','0','0'));
            # deliberately fixed here so small/custom datasets can set real
            # eval ranges from the CLI.
            parser.add_argument(
                f"--{f.name}", type=int, nargs=2, default=f.default,
            )


def parse_opt(argv: Optional[list] = None, apply_overrides: bool = True) -> DLSGConfig:
    """CLI entry mirroring `utils/opt.py:parse_opt` (same flag names / defaults)."""
    parser = argparse.ArgumentParser(description="D-LSG video captioning (TPU)")
    _add_args(parser)
    ns = parser.parse_args(argv)
    cfg = DLSGConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in vars(ns).items()}
    )
    if apply_overrides:
        cfg = apply_dataset_overrides(cfg)
    return cfg
