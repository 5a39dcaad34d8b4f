"""Shape/behavior tests for the alternative graph modules (SURVEY §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.models.graph_variants import (
    GNN,
    EncoderVisualGAT,
    EncoderVisualGraph,
    GraphAttentionLayer,
    LatentGNN,
)


def test_latent_gnn(rng, tiny_cfg):
    x = jax.random.normal(rng, (2, 7, 16))
    mod = LatentGNN(16, 4)
    v = mod.init(rng, x)
    out = mod.apply(v, x)
    assert out.shape == (2, 4, 16)
    assert np.all(np.isfinite(out))


def test_gnn_region_update(rng):
    x = jax.random.normal(rng, (2, 3, 4, 20))
    mod = GNN(feature_size=20, out_size=8)
    v = mod.init(rng, x)
    out = mod.apply(v, x)
    assert out.shape == (2, 3, 4, 8)


def test_graph_attention_layer(rng):
    start = jax.random.normal(rng, (2, 6, 16))
    end = jax.random.normal(rng, (2, 3, 16))
    mod = GraphAttentionLayer(16, 16, dropout=0.1)
    v = mod.init(rng, start, end)
    out = mod.apply(v, start, end)
    assert out.shape == (2, 3, 16)


def test_encoder_visual_graph(rng, tiny_cfg):
    cfg = tiny_cfg
    frames = jax.random.normal(rng, (2, cfg.max_frames, cfg.a_feature_size))
    regions = jax.random.normal(
        rng, (2, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    )
    mod = EncoderVisualGraph(cfg, input_type="object")
    v = mod.init(rng, frames, regions)
    out = mod.apply(v, frames, regions)
    assert out.shape == (2, cfg.num_proposals, cfg.visual_hidden_size)


def test_encoder_visual_gat(rng, tiny_cfg):
    cfg = tiny_cfg
    frames = jax.random.normal(rng, (2, cfg.max_frames, cfg.a_feature_size))
    regions = jax.random.normal(
        rng, (2, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    )
    mod = EncoderVisualGAT(cfg, input_type="object")
    v = mod.init(rng, frames, regions)
    out = mod.apply(v, frames, regions)
    assert out.shape == (2, cfg.num_proposals, cfg.visual_hidden_size)
