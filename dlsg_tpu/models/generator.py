"""Generator models (models/model.py).

- `CapGnnModel`     — the D-LSG generator: CapGnnEncoder -> multi-modal Decoder,
  returns (outputs, obj_proposals, motion_proposals, alpha_all)
  (models/model.py:25-53).
- `CapModel`        — frames-only legacy baseline (model.py:10-22).
- `CapBaselineModel`/`CapBaseline1` — ablation baselines (model.py:76-107).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.models.decoder import Decoder
from dlsg_tpu.models.encoders import CapGnnEncoder, EncoderVisual


class _BeamDecodeMixin:
    """Decoder passthroughs shared by every generator so the beam driver
    (evaluation/evaluate.py make_decode_fn) can drive any of them — the
    reference beam-decodes ALL trainers' evals (its Decoder owns the beam,
    layer.py:449-460, beam size from opt.py:22)."""

    def decoder_beam_step(self, word_id, state, pre):
        return self.decoder.beam_step(word_id, state, pre)

    def decoder_beam_step_hidden(self, word_id, state, pre):
        return self.decoder.beam_step_hidden(word_id, state, pre)

    def decoder_vocab_head(self):
        return self.decoder.vocab_head_weights()

    def decoder_init_beam_state(self, feats, feats2):
        return self.decoder.init_beam_state(feats, feats2)


class CapGnnModel(nn.Module, _BeamDecodeMixin):
    """Latent-semantic-graph captioning generator (models/model.py:25-53)."""

    cfg: DLSGConfig
    vocab_size: int

    def setup(self):
        self.encoder = CapGnnEncoder(self.cfg, name="encoder")
        self.decoder = Decoder(
            self.cfg, self.vocab_size, multi_modal=True, name="decoder"
        )

    def __call__(
        self,
        visual_feats,
        region_feats,
        caption: Optional[jnp.ndarray],
        teacher_forcing_ratio: float = 1.0,
        deterministic: bool = True,
    ):
        obj_psl, motion_psl = self.encoder(visual_feats, region_feats, deterministic)
        outputs, alpha_all = self.decoder(
            obj_psl, caption, teacher_forcing_ratio, motion_psl, deterministic
        )
        return outputs, obj_psl, motion_psl, alpha_all

    def encode(self, visual_feats, region_feats):
        """Encoder only (deterministic) — used by the beam-decode path."""
        return self.encoder(visual_feats, region_feats, True)


class CapModel(nn.Module, _BeamDecodeMixin):
    """Frames-only encoder + single-modal decoder (models/model.py:10-22)."""

    cfg: DLSGConfig
    vocab_size: int

    def setup(self):
        self.encoder = EncoderVisual(self.cfg, name="encoder")
        self.decoder = Decoder(
            self.cfg, self.vocab_size, multi_modal=False, name="decoder"
        )

    def __call__(
        self,
        visual_feats,
        caption: Optional[jnp.ndarray],
        teacher_forcing_ratio: float = 1.0,
        deterministic: bool = True,
    ):
        enc = self.encoder(visual_feats, deterministic)
        outputs, _ = self.decoder(enc, caption, teacher_forcing_ratio, None, deterministic)
        return outputs

    def encode(self, visual_feats, region_feats=None):
        """Frames-only: region features are accepted and ignored so the shared
        beam driver can call every generator with the same signature."""
        return self.encoder(visual_feats, True), None


class CapBaselineModel(nn.Module, _BeamDecodeMixin):
    """Graph-encoder ablation: decodes from motion proposals only
    (models/model.py:76-91)."""

    cfg: DLSGConfig
    vocab_size: int

    def setup(self):
        self.encoder = CapGnnEncoder(self.cfg, baseline=True, name="encoder")
        self.decoder = Decoder(
            self.cfg, self.vocab_size, multi_modal=False, baseline=True, name="decoder"
        )

    def __call__(
        self,
        visual_feats,
        region_feats,
        caption: Optional[jnp.ndarray],
        teacher_forcing_ratio: float = 1.0,
        deterministic: bool = True,
    ):
        _, motion = self.encoder(visual_feats, region_feats, deterministic)
        outputs, _ = self.decoder(
            motion, caption, teacher_forcing_ratio, None, deterministic
        )
        return outputs, 0, 0, 0

    def encode(self, visual_feats, region_feats):
        _, motion = self.encoder(visual_feats, region_feats, True)
        return motion, None


class CapBaseline1(nn.Module, _BeamDecodeMixin):
    """Bi-LSTM-only baseline used by run_graph.Run (models/model.py:94-107)."""

    cfg: DLSGConfig
    vocab_size: int

    def setup(self):
        self.encoder = EncoderVisual(self.cfg, baseline=True, name="encoder")
        self.decoder = Decoder(
            self.cfg, self.vocab_size, multi_modal=False, baseline=True, name="decoder"
        )

    def __call__(
        self,
        visual_feats,
        region_feats,
        caption: Optional[jnp.ndarray],
        teacher_forcing_ratio: float = 1.0,
        deterministic: bool = True,
    ):
        enc = self.encoder(visual_feats, deterministic)
        outputs, _ = self.decoder(enc, caption, teacher_forcing_ratio, None, deterministic)
        return outputs, 0, 0, 0

    def encode(self, visual_feats, region_feats=None):
        return self.encoder(visual_feats, True), None
