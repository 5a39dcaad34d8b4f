"""Fused vocab-head kernel (ops/pallas/vocab_head.py): correctness vs the
plain-XLA path it replaces (projection + lax.top_k + logsumexp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.ops.pallas.vocab_head import (
    vocab_head_topk,
    vocab_head_topk_reference,
)


def _mats(G, H, V, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(G, H)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(H, V)) / np.sqrt(H), dtype)
    b = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    return h, w, b


@pytest.mark.parametrize("G,H,V,k", [(8, 128, 1000, 5), (16, 256, 2048, 5), (8, 128, 512, 1)])
def test_matches_lax_topk(G, H, V, k):
    """ids exactly equal lax.top_k of the full logits; vals equal the
    log-softmax values (fp32, so both paths compute bit-comparable math)."""
    h, w, b = _mats(G, H, V)
    vals, ids = vocab_head_topk(h, w, b, k, normalize=True, block_v=512, interpret=True)
    logits = h @ w + b[None, :]
    ref_vals, ref_ids = jax.lax.top_k(logits, k)
    ref_vals = ref_vals - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5)


def test_unnormalized_and_reference_impl():
    h, w, b = _mats(8, 128, 768, seed=3)
    vals, ids = vocab_head_topk(h, w, b, 5, normalize=False, block_v=256, interpret=True)
    rv, ri = vocab_head_topk_reference(h, w, b, 5, normalize=False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv), rtol=1e-5, atol=1e-5)


def test_vocab_padding_never_wins():
    """V not a multiple of block_v: padded columns must not appear in top-k
    and must not perturb the logsumexp."""
    h, w, b = _mats(8, 128, 700, seed=5)  # 700 -> padded to 1024
    vals, ids = vocab_head_topk(h, w, b, 5, normalize=True, block_v=512, interpret=True)
    assert int(np.asarray(ids).max()) < 700
    logits = h @ w + b[None, :]
    ref_vals, ref_ids = jax.lax.top_k(logits, 5)
    ref_vals = ref_vals - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals), rtol=1e-5, atol=1e-5)


def test_tie_break_lowest_id():
    """Duplicate logit values: lax.top_k keeps the lowest index first."""
    h = jnp.zeros((4, 8), jnp.float32)
    w = jnp.zeros((8, 256), jnp.float32)  # all logits = bias
    b = jnp.zeros((256,), jnp.float32).at[17].set(1.0).at[200].set(1.0)
    vals, ids = vocab_head_topk(h, w, b, 3, normalize=False, block_v=128, interpret=True)
    ref_vals, ref_ids = jax.lax.top_k(jnp.tile(b[None, :], (4, 1)), 3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(ref_vals))


def test_bf16_weights_close():
    """bf16 weight stream with fp32 accumulation stays close to fp32."""
    h, w, b = _mats(8, 256, 1024, seed=7)
    vals16, _ = vocab_head_topk(
        h, w.astype(jnp.bfloat16), b, 5, normalize=True, block_v=512, interpret=True
    )
    vals32, _ = vocab_head_topk(h, w, b, 5, normalize=True, block_v=512, interpret=True)
    np.testing.assert_allclose(np.asarray(vals16), np.asarray(vals32), atol=0.15)


def test_fused_beam_decode_matches_plain(tiny_cfg):
    """End-to-end: make_decode_fn with the fused vocab head ('on', interpret
    kernel on CPU) produces the same captions and log-structure as the plain
    XLA path — the sparse-step protocol preserves beam-search semantics."""
    from dataclasses import replace

    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = tiny_cfg
    rng = np.random.default_rng(11)
    B = 4
    V = 50
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, V, size=(B, cfg.max_words)), jnp.int32)
    mod = CapGnnModel(cfg, V)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)

    plain = make_decode_fn(mod, replace(cfg, use_fused_vocab_head="off"), beam_size=3,
                           return_alpha=True)
    fused = make_decode_fn(mod, replace(cfg, use_fused_vocab_head="on"), beam_size=3,
                           return_alpha=True)
    ids_p, alpha_p = plain(v, frames, regions)
    ids_f, alpha_f = fused(v, frames, regions)
    np.testing.assert_array_equal(np.asarray(ids_p), np.asarray(ids_f))
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_f), atol=1e-5)
