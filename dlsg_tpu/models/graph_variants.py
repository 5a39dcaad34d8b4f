"""Alternative graph modules from the reference's model zoo.

These variants are not used by the flagship CapGnnModel but are part of the
reference's component inventory (SURVEY.md §2.2) and its research surface:

- `LatentGNN`            — conv-adjacency latent pooling (sublayer.py:147-173)
- `GNN`                  — dense QK region GNN (sublayer.py:121-144)
- `GraphAttentionLayer`  — GAT with pairwise concat scoring (sublayer.py:200-289)
- `EncoderVisualGraph`   — conv-adjacency encoder variant (layer.py:64-136)
- `EncoderVisualGAT`     — GAT-based encoder variant (layer.py:204-272)

TPU notes: the reference's Conv2d(hidden -> num_latent, k=1) adjacency over a
[B, C, 1, T] layout is just a Dense on the feature axis here (no layout
permutes); BatchNorm2d becomes flax BatchNorm with batch stats frozen in
inference mode by default.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.models.layers import SelfAttention, LN_EPS


def _l2_normalize(x, axis):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


class LatentGNN(nn.Module):
    """Conv-adjacency latent pooling (sublayer.py:147-173)."""

    input_size: int
    num_latent: int

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # Conv2d(C->L, k=1) + BN + ReLU over the feature axis
        adj = nn.Dense(self.num_latent, use_bias=False, name="v2l_adj")(x)  # [B,T,L]
        adj = nn.BatchNorm(use_running_average=not train, name="bn")(adj)
        adj = nn.relu(adj)
        adj = jnp.swapaxes(adj, 1, 2)  # [B, L, T]
        if mask is not None:
            adj = jnp.where(mask > 0, adj, 0.0)
        adj = _l2_normalize(adj, axis=2)
        return jnp.einsum("blt,btd->bld", adj, x)


class GNN(nn.Module):
    """Dense QK GNN over flattened region features (sublayer.py:121-144)."""

    feature_size: int = 2048
    out_size: int = 1024

    @nn.compact
    def __call__(self, region_feats):
        B, T, O, F = region_feats.shape
        feats = region_feats.reshape(B, T * O, F)
        q = nn.Dense(self.feature_size, name="adj_Q")(feats)
        k = nn.Dense(self.feature_size, name="adj_K")(feats)
        adj = nn.softmax(jnp.einsum("bnd,bmd->bnm", q, k), axis=-1)
        upd = nn.Dense(self.out_size, name="graph_update")(feats)
        out = jnp.einsum("bnm,bmd->bnd", adj, upd)
        return out.reshape(B, T, O, self.out_size)


class GraphAttentionLayer(nn.Module):
    """GAT layer with pairwise concat scoring (sublayer.py:200-289)."""

    in_features: int
    out_features: int
    dropout: float
    alpha: float = 0.2
    concat: bool = True

    @nn.compact
    def __call__(self, start_feature, end_feature, deterministic: bool = True):
        relu_gain = math.sqrt(2.0)

        def xavier(gain):
            def init(key, shape, dtype=jnp.float32):
                limit = gain * math.sqrt(6.0 / (shape[-2] + shape[-1]))
                return jax.random.uniform(key, shape, dtype, -limit, limit)

            return init

        Ws = self.param("Ws", xavier(relu_gain), (self.in_features, self.out_features))
        We = self.param("We", xavier(relu_gain), (self.in_features, self.out_features))
        a = self.param("a", xavier(relu_gain), (2 * self.out_features, 1))

        hs = start_feature @ Ws  # [B, N1, F]
        he = end_feature @ We  # [B, N2, F]
        # pairwise concat scores e_ij = leakyrelu([hs_i || he_j] a), decomposed
        # into two rank-1 contractions (no [B, N1, N2, 2F] concat materialized)
        s1 = jnp.einsum("bnf,f->bn", hs, a[: self.out_features, 0])
        s2 = jnp.einsum("bmf,f->bm", he, a[self.out_features :, 0])
        att = nn.leaky_relu(s1[:, :, None] + s2[:, None, :], self.alpha)  # [B,N1,N2]
        att = nn.softmax(att, axis=1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        h_prime = jnp.einsum("bnm,bnf->bmf", att, hs) + he  # aggregate starts onto ends
        return nn.elu(h_prime) if self.concat else h_prime


class EncoderVisualGraph(nn.Module):
    """Earlier conv-adjacency encoder variant (layer.py:64-136)."""

    cfg: DLSGConfig
    input_type: str = "motion"
    use_embed: bool = True
    baseline: bool = False

    @nn.compact
    def __call__(self, visual_feats, obj_feats, deterministic: bool = True, train: bool = False):
        cfg = self.cfg
        B, T, O, obj_size = obj_feats.shape
        visual_embed = visual_feats
        if self.use_embed:
            visual_embed = nn.Dense(cfg.visual_hidden_size, name="visual_embed")(visual_feats)
        if O < 5:
            obj_visual = visual_embed
        else:
            obj = nn.Dense(cfg.region_projected_size, name="obj_embed")(obj_feats)
            obj = obj.reshape(B, T * O, -1)
            adj = jnp.einsum("bnd,btd->bnt", obj, visual_embed) / math.sqrt(obj_size)
            adj = nn.softmax(adj, axis=1)
            obj_visual = jnp.einsum("bnd,bnt->btd", obj, adj) + visual_embed
        if self.baseline:
            return obj_visual
        adj = nn.Dense(cfg.num_proposals, use_bias=False, name="v2l_adj")(obj_visual)
        adj = nn.BatchNorm(use_running_average=not train, name="v2l_bn")(adj)
        adj = nn.relu(adj)
        adj = jnp.swapaxes(adj, 1, 2)  # [B, P, T]
        adj = _l2_normalize(adj, axis=2)
        latent = jnp.einsum("bpt,btd->bpd", adj, obj_visual)
        latent = nn.LayerNorm(epsilon=LN_EPS, name="att_l2l_norm")(latent)
        latent = SelfAttention(
            cfg.visual_hidden_size,
            cfg.visual_hidden_size,
            cfg.visual_hidden_size,
            cfg.dropout,
            name="att_l2l",
        )(latent, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, name="att_l2l_norm2")(latent)


class EncoderVisualGAT(nn.Module):
    """GAT-based encoder variant (layer.py:204-272)."""

    cfg: DLSGConfig
    input_type: str = "motion"
    use_embed: bool = True
    baseline: bool = False

    @nn.compact
    def __call__(self, visual_feats, obj_feats, deterministic: bool = True, train: bool = False):
        cfg = self.cfg
        B, T, O, _ = obj_feats.shape
        visual_embed = visual_feats
        if self.use_embed:
            visual_embed = nn.Dense(cfg.visual_hidden_size, name="visual_embed")(visual_feats)
        if O < 5:
            obj_visual = visual_embed
        else:
            obj = nn.Dense(cfg.region_projected_size, name="obj_embed")(obj_feats)
            obj = obj.reshape(B, T * O, -1)
            obj_visual = GraphAttentionLayer(
                cfg.visual_hidden_size, cfg.visual_hidden_size, cfg.dropout, name="agg_o2v"
            )(obj, visual_embed, deterministic)
        if self.baseline:
            return obj_visual
        adj = nn.Dense(cfg.num_proposals, use_bias=False, name="v2l_adj")(obj_visual)
        adj = nn.BatchNorm(use_running_average=not train, name="v2l_bn")(adj)
        adj = nn.relu(adj)
        adj = jnp.swapaxes(adj, 1, 2)
        adj = _l2_normalize(adj, axis=2)
        latent = jnp.einsum("bpt,btd->bpd", adj, obj_visual)
        latent = nn.LayerNorm(epsilon=LN_EPS, name="att_l2l_norm")(latent)
        latent = SelfAttention(
            cfg.visual_hidden_size,
            cfg.visual_hidden_size,
            cfg.visual_hidden_size,
            cfg.dropout,
            name="att_l2l",
        )(latent, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, name="att_l2l_norm2")(latent)
