"""Sentence discriminator DiscV2 + proposal scoring heads.

Parity with `models/model.py:110-168` (DiscV2) and `models/layer.py:661-715`
(PSLScore2) / `models/layer.py:605-658` (PSLScore).

TPU notes: the reference's Conv1d(vocab -> 512, kernel=1) over a one-hot/softmax
caption is just a [B*T, V] x [V, 512] matmul — expressed as a Dense here so XLA
maps it straight onto the MXU (no layout permutes).

Faithfully-reproduced reference quirk: PSLScore2 ends with `.mean(axis=-1)` on an
already per-sample score vector (layer.py:714), collapsing the batch to a scalar;
the two scalar head scores are then re-broadcast through the per-sample fusion
weights (model.py:163-167). Multi-device note: under jit's global-view semantics
this mean is over the GLOBAL batch (XLA inserts the collective), whereas the
reference's DDP computed it per-GPU shard — a deliberate, strictly-more-consistent
deviation (per-shard means made the D score depend on device count).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.models.layers import (
    JointEmbedVideoModel2,
    LatentPSL,
    ResBlock,
    SelfAttention,
    TanhLayerNorm,
    LN_EPS,
    NEG_FILL,
    xavier_uniform_gain,
    TANH_GAIN,
)
from dlsg_tpu.ops.lstm import LSTMSequence


class PSLScore2(nn.Module):
    """Scores a sentence encoding against latent proposals (layer.py:661-715).

    Post-softmax masking variant: adjacency is softmaxed over the word axis and
    *then* zeroed at padded positions (layer.py:706-707).
    """

    num_psl: int
    num_top: int
    dim: int = 512
    groups: int = 1

    @nn.compact
    def __call__(self, psl, psl_alpha, att_out, seq_mask, deterministic: bool = True):
        B = psl.shape[0]
        select = self.num_psl > self.num_top

        h = nn.Dense(self.dim, name="psl_embed")(psl)
        h = TanhLayerNorm(name="psl_embed_norm")(h)

        if select:
            # top-k proposals by decoder attention mass (layer.py:691-696)
            alpha_sum = jnp.sum(psl_alpha, axis=1)  # [B, P]
            _, top_idx = jax.lax.top_k(alpha_sum, self.num_top)
            psl_topk = jnp.take_along_axis(h, top_idx[:, :, None], axis=1)
        else:
            psl_topk = h

        a = nn.Dense(self.dim, name="att_norm_dense")(att_out)
        a = TanhLayerNorm(name="att_norm")(a)

        adj = jnp.einsum("btd,bkd->btk", a, psl_topk) / math.sqrt(self.dim)
        adj = nn.softmax(adj, axis=1)  # over words
        adj = jnp.where(seq_mask > 0, adj, 0.0)
        adj_alpha = jnp.sum(adj, axis=1)  # [B, K]

        psl_agg = jnp.einsum("btd,btk->bkd", a, adj)
        psl_agg = TanhLayerNorm(name="psl_norm")(psl_agg)
        psl_agg = nn.Dropout(0.3)(psl_agg, deterministic=deterministic)

        score = JointEmbedVideoModel2(self.dim, name="psl_scorer")(psl_topk, psl_agg)
        score = jnp.squeeze(score, axis=-1)  # [B, K]
        score = jnp.sum(score * adj_alpha, axis=-1) / jnp.sum(adj_alpha, axis=-1)  # [B]
        # reference quirk: mean over the (local) batch axis (layer.py:714).
        # With `groups`, the batch is `groups` independent sub-batches stacked
        # (the fused WGAN real|fake|interp pass, ops/losses.py) and the quirk
        # applies per sub-batch: [groups] means instead of one.
        if self.groups > 1:
            return jnp.mean(score.reshape(self.groups, -1), axis=1)  # [groups]
        return jnp.mean(score, axis=-1)


class PSLScore(nn.Module):
    """Pre-softmax masking variant (layer.py:605-658): -9e15 fill before softmax,
    unweighted mean over proposals."""

    num_psl: int
    num_top: int
    dim: int = 512

    @nn.compact
    def __call__(self, psl, psl_alpha, att_out, seq_mask, deterministic: bool = True):
        select = self.num_psl > self.num_top
        h = nn.Dense(self.dim, name="psl_embed")(psl)
        h = TanhLayerNorm(name="psl_embed_norm")(h)
        if select:
            alpha_sum = jnp.sum(psl_alpha, axis=1)
            _, top_idx = jax.lax.top_k(alpha_sum, self.num_top)
            psl_topk = jnp.take_along_axis(h, top_idx[:, :, None], axis=1)
        else:
            psl_topk = h
        a = nn.Dense(self.dim, name="att_norm_dense")(att_out)
        a = TanhLayerNorm(name="att_norm")(a)
        adj = jnp.einsum("btd,bkd->btk", a, psl_topk) / math.sqrt(self.dim)
        adj = jnp.where(seq_mask > 0, adj, NEG_FILL)
        adj = nn.softmax(adj, axis=1)
        psl_agg = jnp.einsum("btd,btk->bkd", a, adj)
        psl_agg = TanhLayerNorm(name="psl_norm")(psl_agg)
        psl_agg = nn.Dropout(0.3)(psl_agg, deterministic=deterministic)
        score = JointEmbedVideoModel2(self.dim, name="psl_scorer")(psl_topk, psl_agg)
        score = jnp.squeeze(score, axis=-1)
        return jnp.mean(score, axis=-1)  # [B]


class DiscV2(nn.Module):
    """WGAN sentence/proposal discriminator (models/model.py:110-168).

    inputs: caption distribution [B, T, V] (one-hot for real captions,
    softmax-free logits are NOT used — the generator feeds raw logits `tokens`
    exactly as the reference does at run_gun.py:218), the two proposal sets,
    att_mask [B, T, T], alpha_all [B, T, 2P]. Returns a per-sample score [B].
    """

    cfg: DLSGConfig
    vocab_size: int
    dim: int = 512

    @nn.compact
    def __call__(
        self,
        inputs,
        obj_proposals,
        motion_proposals,
        att_mask,
        alpha_all,
        deterministic: bool = True,
        groups: int = 1,
    ):
        """`groups > 1` scores `groups` independent sub-batches stacked along
        the batch axis in ONE pass (the fused real|fake|interp WGAN step,
        ops/losses.py): every op before the PSLScore2 batch-mean quirk is
        row-independent, and the quirk is applied per sub-batch — exactly
        equal to `groups` separate calls (tests/test_models.py)."""
        cfg = self.cfg
        P = cfg.num_proposals
        K = cfg.num_topk

        # Conv1d(V->512, k=1) == Dense on the feature axis (model.py:122,147-148)
        h = nn.Dense(self.dim, dtype=cfg.cdtype, name="conv1d")(inputs)  # [B, T, 512]
        h = h.astype(jnp.float32)
        h = ResBlock(self.dim, name="block")(h)
        h = LSTMSequence(self.dim, dtype=cfg.cdtype, name="lstm")(h)
        h = nn.LayerNorm(epsilon=LN_EPS, name="layer_norm")(h)
        h = nn.Dropout(0.3)(h, deterministic=deterministic)

        att_out = SelfAttention(
            self.dim, self.dim, self.dim, 0.3, dtype=cfg.cdtype, name="att"
        )(h, att_mask, deterministic)
        att_out = TanhLayerNorm(name="att_norm")(att_out)

        # word-validity mask from row 0 of att_mask (model.py:158-160)
        word_mask = att_mask[:, 0, :]  # [B, T]
        alpha_all = alpha_all * word_mask[:, :, None]
        seq_mask_spl = jnp.repeat(word_mask[:, :, None], K, axis=2)  # [B, T, K]

        obj_score = PSLScore2(P, K, dim=self.dim, groups=groups, name="obj_psl_score")(
            obj_proposals, alpha_all[:, :, :P], att_out, seq_mask_spl, deterministic
        )
        motion_score = PSLScore2(P, K, dim=self.dim, groups=groups, name="motion_psl_score")(
            motion_proposals, alpha_all[:, :, -P:], att_out, seq_mask_spl, deterministic
        )

        sent_sum = LatentPSL(self.dim, 1, name="text_sum")(att_out, deterministic)
        sent_sum = jnp.squeeze(sent_sum, axis=1)  # [B, 512]
        fusion = self.param(
            "fusion", xavier_uniform_gain(TANH_GAIN), (2, self.dim), jnp.float32
        )
        fusion_score = nn.softmax(sent_sum @ fusion.T, axis=-1)  # [B, 2]
        if groups > 1:
            # broadcast each sub-batch's mean score over its rows
            n_per = inputs.shape[0] // groups
            obj_score = jnp.repeat(obj_score, n_per)
            motion_score = jnp.repeat(motion_score, n_per)
        return obj_score * fusion_score[:, 0] + motion_score * fusion_score[:, 1]
