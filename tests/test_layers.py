"""Unit tests for shared sublayers (reference: models/sublayer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.models.layers import (
    AttentionShare,
    JointEmbedVideoModel2,
    LatentPSL,
    PositionalEncoding,
    ResBlock,
    SelfAttention,
)


def init_and_apply(mod, rng, *args, **kwargs):
    variables = mod.init(rng, *args, **kwargs)
    return variables, mod.apply(variables, *args, **kwargs)


def test_self_attention_shapes(rng):
    x = jax.random.normal(rng, (2, 5, 8))
    mod = SelfAttention(8, 8, 4)
    _, out = init_and_apply(mod, rng, x)
    assert out.shape == (2, 5, 4)
    assert np.all(np.isfinite(out))


def test_self_attention_mask_blocks_positions(rng):
    """A fully-masked column must not influence outputs: the masked logit fill
    (-9e15, sublayer.py:71) zeroes its softmax weight."""
    x = jax.random.normal(rng, (1, 4, 8))
    mask = jnp.ones((1, 4, 4)).at[:, :, 3].set(0.0)
    mod = SelfAttention(8, 8, 4)
    variables = mod.init(rng, x, mask)
    out1 = mod.apply(variables, x, mask)
    x2 = x.at[:, 3].set(x[:, 3] + 100.0)  # perturb the masked position
    out2 = mod.apply(variables, x2, mask)
    np.testing.assert_allclose(out1[:, :3], out2[:, :3], atol=1e-5)


def test_attention_share_alpha_is_distribution(rng):
    meta = jax.random.normal(rng, (3, 6, 8))
    hidden = jax.random.normal(rng, (3, 4))
    mod = AttentionShare(8, 4, 8)
    _, (ctx, alpha) = init_and_apply(mod, rng, meta, hidden)
    assert ctx.shape == (3, 8)
    assert alpha.shape == (3, 6)
    np.testing.assert_allclose(np.sum(alpha, axis=1), 1.0, atol=1e-5)


def test_latent_psl_pools_sequence(rng):
    x = jax.random.normal(rng, (2, 7, 8))
    mod = LatentPSL(8, 3)
    _, out = init_and_apply(mod, rng, x)
    assert out.shape == (2, 3, 8)


def test_latent_psl_adjacency_normalized_over_sequence(rng):
    """softmax over the sequence axis (sublayer.py:192): pooling a constant
    sequence must return (normed) that constant for every proposal."""
    x = jnp.ones((1, 7, 8)) * 0.5
    mod = LatentPSL(8, 3)
    variables = mod.init(rng, x)
    out = mod.apply(variables, x)
    # all proposals identical since every frame is identical
    np.testing.assert_allclose(out[0, 0], out[0, 1], atol=1e-6)
    np.testing.assert_allclose(out[0, 0], out[0, 2], atol=1e-6)


def test_resblock_residual_scale(rng):
    x = jax.random.normal(rng, (2, 9, 8))
    mod = ResBlock(8)
    variables = mod.init(rng, x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape
    # zero conv kernel -> relu(x) + 0.3*0: the reference's inplace ReLU
    # (sublayer.py:111 `nn.ReLU(True)`) rectifies the residual input too —
    # verified against the real torch module in tests/test_forward_parity.py
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables)
    np.testing.assert_allclose(mod.apply(zeroed, x), jnp.maximum(x, 0.0), atol=1e-6)


def test_joint_embed_score_shape(rng):
    v = jax.random.normal(rng, (2, 3, 8))
    s = jax.random.normal(rng, (2, 3, 8))
    mod = JointEmbedVideoModel2(8)
    _, out = init_and_apply(mod, rng, v, s)
    assert out.shape == (2, 3, 1)


def test_positional_encoding_matches_formula(rng):
    d, T = 8, 5
    mod = PositionalEncoding(d)
    x = jnp.zeros((1, T, d))
    variables = mod.init(rng, x)
    out = mod.apply(variables, x)
    pos = np.arange(T)[:, None]
    div = np.exp(np.arange(0, d, 2) * -(np.log(10000.0) / d))
    expected = np.zeros((T, d), np.float32)
    expected[:, 0::2] = np.sin(pos * div)
    expected[:, 1::2] = np.cos(pos * div)
    np.testing.assert_allclose(out[0], expected, atol=1e-5)
