"""Visual encoders.

Parity targets:
- `EncoderVisual`       — Bi-LSTM temporal encoder (models/layer.py:7-61)
- `EncoderVisualGraphTUN` — the latent-semantic-graph module actually used by
  CapGnnModel (models/layer.py:139-201)
- `CapGnnEncoder`       — two-branch object/motion encoder (models/model.py:56-73)

TPU notes: the object->visual aggregation is two dense matmuls + a softmax over
the flattened (frame x object) axis — ideal MXU work. The Bi-LSTM is a pair of
`lax.scan`s with hoisted input projections (ops/lstm.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.models.layers import SelfAttention, LatentPSL, TanhLayerNorm, LN_EPS
from dlsg_tpu.ops.lstm import BiLSTM


class EncoderVisual(nn.Module):
    """Linear embed -> Bi-LSTM -> LN -> dropout -> self-attention (+LN).

    models/layer.py:7-61. `baseline=True` replaces the self-attention with a
    plain Linear(2H -> H) (layer.py:36,59).
    """

    cfg: DLSGConfig
    input_type: str = "frame+motion"
    embed: bool = True
    baseline: bool = False

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        cfg = self.cfg
        H = cfg.visual_hidden_size
        x = inputs
        if self.embed:
            x = nn.Dense(
                H,
                kernel_init=nn.initializers.xavier_normal(),
                dtype=cfg.cdtype,
                name="linear_embed",
            )(x)
        x = BiLSTM(
            H, dtype=cfg.cdtype, use_pallas=cfg.use_pallas_lstm, name="lstm"
        )(x)  # [B, T, 2H]
        x = nn.LayerNorm(epsilon=LN_EPS, name="layernorm_lstm")(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        if not self.baseline:
            x = SelfAttention(
                2 * H, 2 * H, H, cfg.dropout, get_pe=True, dtype=cfg.cdtype,
                name="self_attention",
            )(x, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=LN_EPS, name="layernorm_sa")(x)
        else:
            x = nn.Dense(
                H, kernel_init=nn.initializers.xavier_normal(), name="out_try"
            )(x)
        return x  # [B, T, H]


class EncoderVisualGraphTUN(nn.Module):
    """Object->visual graph aggregation + latent proposal pooling.

    models/layer.py:139-201. Two steps:
      1. project objects, build adjacency softmax(obj @ visual^T / sqrt(raw_obj_dim))
         normalized over the flattened object axis, aggregate onto frames,
         residual add + Tanh/LN (layer.py:177-193).
      2. LatentPSL pools the T frames into num_proposals latent nodes
         (layer.py:199).

    With fewer than 5 objects the object branch is skipped entirely
    (layer.py:181-182).
    """

    cfg: DLSGConfig
    input_type: str = "motion"
    use_embed: bool = True
    baseline: bool = False

    @nn.compact
    def __call__(
        self,
        visual_feats,
        obj_feats,
        deterministic: bool = True,
        obj_embedded=None,
    ):
        """`obj_embedded` optionally supplies the region projection
        (pre-obj_norm): CapGnnEncoder projects the [B, T, O, 2048] region
        tensor ONCE for both branches as a single wide matmul instead of
        re-reading the ~1 GB input per branch (this branch's obj_norm and
        everything after stay per-branch)."""
        cfg = self.cfg
        B, T, O, obj_size = obj_feats.shape

        visual_embed = visual_feats
        if self.use_embed:
            visual_embed = nn.Dense(
                cfg.visual_hidden_size, dtype=cfg.cdtype, name="visual_embed"
            )(visual_feats)
        visual_embed = TanhLayerNorm(dtype=cfg.cdtype, name="visual_norm")(visual_embed)

        if O < 5:
            obj_visual = visual_embed
        else:
            obj = obj_embedded
            if obj is None:
                obj = nn.Dense(
                    cfg.region_projected_size, dtype=cfg.cdtype, name="obj_embed"
                )(obj_feats)
            obj = TanhLayerNorm(dtype=cfg.cdtype, name="obj_norm")(obj)
            obj = obj.reshape(B, T * O, -1)
            # NB: reference scales by sqrt of the RAW region feature size
            # (layer.py:187 uses obj_size from obj_feats.size()).
            # Transposed layout [b, t, n]: the softmax over the T*O object
            # axis (reference softmax dim=1 on [b, n, t]) runs over the MINOR
            # axis here — the [.., t=26]-lane layout wastes 80% of each
            # vector register and reduces across sublanes. Same math.
            adj = jnp.einsum(
                "btd,bnd->btn",
                visual_embed.astype(cfg.cdtype),
                obj.astype(cfg.cdtype),
                preferred_element_type=jnp.float32,
            ) / math.sqrt(obj_size)
            adj = nn.softmax(adj, axis=-1)  # over the T*O object axis
            obj_agg = jnp.einsum(
                "btn,bnd->btd",
                adj.astype(cfg.cdtype),
                obj.astype(cfg.cdtype),
                preferred_element_type=jnp.float32,
            )
            obj_visual = obj_agg + visual_embed
            obj_visual = TanhLayerNorm(dtype=cfg.cdtype, name="obj_visual_norm")(obj_visual)

        if self.baseline:
            return obj_visual
        return LatentPSL(cfg.visual_hidden_size, cfg.num_proposals, name="v2l_layer")(
            obj_visual, deterministic=deterministic
        )  # [B, num_psl, H]


class CapGnnEncoder(nn.Module):
    """Two-branch encoder (models/model.py:56-73).

    object branch: EncoderVisualGraphTUN('object') over appearance features;
    motion branch: EncoderVisual over the full 2560-d features, then
    EncoderVisualGraphTUN('motion', use_embed=False).
    """

    cfg: DLSGConfig
    baseline: bool = False

    @nn.compact
    def __call__(
        self, visual_feats, region_feats, deterministic: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        # ONE wide matmul projects the region tensor for BOTH branches: the
        # reference reads the [B, T, O, 2048] features twice, once per TUN
        # (model.py:69-71); a joint [2048, 2*rps] kernel halves the dominant
        # HBM read of encode (981 MB at bench dims) and doubles MXU tile work
        O = region_feats.shape[2]
        if O >= 5 and cfg.joint_region_projection:
            joint = nn.Dense(
                2 * cfg.region_projected_size, dtype=cfg.cdtype, name="obj_embed_joint"
            )(region_feats)
            obj_e1 = joint[..., : cfg.region_projected_size]
            obj_e2 = joint[..., cfg.region_projected_size :]
        else:
            obj_e1 = obj_e2 = None
        obj_proposals = EncoderVisualGraphTUN(
            cfg, input_type="object", baseline=self.baseline, name="obj_encoder"
        )(
            visual_feats[:, :, : cfg.a_feature_size], region_feats, deterministic,
            obj_embedded=obj_e1,
        )
        motion_input = EncoderVisual(cfg, name="motion_pre_encoder")(
            visual_feats, deterministic
        )
        motion_proposals = EncoderVisualGraphTUN(
            cfg,
            input_type="motion",
            use_embed=False,
            baseline=self.baseline,
            name="motion_encoder",
        )(motion_input, region_feats, deterministic, obj_embedded=obj_e2)
        return obj_proposals, motion_proposals
