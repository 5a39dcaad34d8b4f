"""Integration-shape tests for encoders, decoder, generator, discriminator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.models.decoder import Decoder
from dlsg_tpu.models.discriminator import DiscV2
from dlsg_tpu.models.encoders import CapGnnEncoder, EncoderVisual, EncoderVisualGraphTUN
from dlsg_tpu.models.generator import CapBaseline1, CapGnnModel

VOCAB = 50


@pytest.fixture(scope="module")
def batch(tiny_cfg):
    cfg = tiny_cfg
    rng = np.random.default_rng(0)
    B = cfg.train_batch_size
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, VOCAB, size=(B, cfg.max_words)), jnp.int32)
    lengths = jnp.asarray(rng.integers(3, cfg.max_words, size=(B,)), jnp.int32)
    return frames, regions, captions, lengths


def test_encoder_visual_shape(tiny_cfg, batch):
    frames, *_ = batch
    mod = EncoderVisual(tiny_cfg)
    v = mod.init(jax.random.PRNGKey(0), frames)
    out = mod.apply(v, frames)
    assert out.shape == (frames.shape[0], tiny_cfg.max_frames, tiny_cfg.visual_hidden_size)


def test_graph_encoder_proposals(tiny_cfg, batch):
    frames, regions, *_ = batch
    mod = EncoderVisualGraphTUN(tiny_cfg, input_type="object")
    v = mod.init(jax.random.PRNGKey(0), frames[..., : tiny_cfg.a_feature_size], regions)
    out = mod.apply(v, frames[..., : tiny_cfg.a_feature_size], regions)
    assert out.shape == (frames.shape[0], tiny_cfg.num_proposals, tiny_cfg.visual_hidden_size)


def test_graph_encoder_skips_obj_branch_when_few_objects(tiny_cfg, batch):
    """obj_num < 5 bypasses the object aggregation (layer.py:181-182)."""
    frames, regions, *_ = batch
    small = regions[:, :, :3, :]
    mod = EncoderVisualGraphTUN(tiny_cfg, input_type="object")
    v = mod.init(jax.random.PRNGKey(0), frames[..., : tiny_cfg.a_feature_size], small)
    out = mod.apply(v, frames[..., : tiny_cfg.a_feature_size], small)
    assert out.shape == (frames.shape[0], tiny_cfg.num_proposals, tiny_cfg.visual_hidden_size)
    # no obj_embed params should exist in this configuration
    flat = jax.tree_util.tree_leaves_with_path(v)
    assert not any("obj_embed" in jax.tree_util.keystr(p) for p, _ in flat)


def test_cap_gnn_encoder_two_branches(tiny_cfg, batch):
    frames, regions, *_ = batch
    mod = CapGnnEncoder(tiny_cfg)
    v = mod.init(jax.random.PRNGKey(0), frames, regions)
    obj, motion = mod.apply(v, frames, regions)
    B, P, H = frames.shape[0], tiny_cfg.num_proposals, tiny_cfg.visual_hidden_size
    assert obj.shape == (B, P, H) and motion.shape == (B, P, H)


def test_decoder_train_and_greedy(tiny_cfg, batch):
    frames, regions, captions, _ = batch
    cfg = tiny_cfg
    B, P, H = frames.shape[0], cfg.num_proposals, cfg.visual_hidden_size
    feats = jnp.ones((B, P, H)) * 0.1
    feats2 = jnp.ones((B, P, H)) * 0.2
    mod = Decoder(cfg, VOCAB, multi_modal=True)
    v = mod.init(jax.random.PRNGKey(0), feats, captions, 1.0, feats2)
    logits, alpha = mod.apply(v, feats, captions, 1.0, feats2)
    assert logits.shape == (B, cfg.max_words, VOCAB)
    assert alpha.shape == (B, cfg.max_words, 2 * P)
    np.testing.assert_allclose(np.sum(alpha, axis=-1), 2.0, atol=1e-4)

    ids, _ = mod.apply(v, feats, None, 0.0, feats2)
    assert ids.shape == (B, cfg.max_words)
    assert ids.dtype == jnp.int32


def test_decoder_scheduled_sampling_uses_rng(tiny_cfg, batch):
    """Non-deterministic mode draws per-step teacher-forcing coins and dropout."""
    frames, regions, captions, _ = batch
    cfg = tiny_cfg
    B, P, H = frames.shape[0], cfg.num_proposals, cfg.visual_hidden_size
    feats = jnp.ones((B, P, H)) * 0.1
    feats2 = jnp.ones((B, P, H)) * 0.2
    mod = Decoder(cfg, VOCAB, multi_modal=True)
    v = mod.init(jax.random.PRNGKey(0), feats, captions, 1.0, feats2)
    rngs = {"dropout": jax.random.PRNGKey(1), "sample": jax.random.PRNGKey(2)}
    out1, _ = mod.apply(v, feats, captions, 0.5, feats2, False, rngs=rngs)
    rngs2 = {"dropout": jax.random.PRNGKey(3), "sample": jax.random.PRNGKey(4)}
    out2, _ = mod.apply(v, feats, captions, 0.5, feats2, False, rngs=rngs2)
    assert not np.allclose(out1, out2)


def test_cap_gnn_model_end_to_end(tiny_cfg, batch):
    frames, regions, captions, _ = batch
    cfg = tiny_cfg
    mod = CapGnnModel(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)
    out, obj, motion, alpha = mod.apply(v, frames, regions, captions)
    B = frames.shape[0]
    assert out.shape == (B, cfg.max_words, VOCAB)
    assert obj.shape == (B, cfg.num_proposals, cfg.visual_hidden_size)
    assert alpha.shape == (B, cfg.max_words, 2 * cfg.num_proposals)


def test_inference_alphas_are_real_distributions(tiny_cfg, batch):
    """Greedy decode returns the actual per-step attention weights: each of the
    two proposal softmaxes sums to 1 per step (round 1 returned zeros)."""
    frames, regions, captions, _ = batch
    cfg = tiny_cfg
    P = cfg.num_proposals
    mod = CapGnnModel(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)
    ids, _, _, alpha = mod.apply(v, frames, regions, None)
    assert ids.shape == (frames.shape[0], cfg.max_words)
    assert alpha.shape == (frames.shape[0], cfg.max_words, 2 * P)
    np.testing.assert_allclose(np.sum(alpha[..., :P], axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.sum(alpha[..., P:], axis=-1), 1.0, atol=1e-4)
    assert np.asarray(alpha).std() > 0  # not a constant placeholder


def test_beam_alphas_match_teacher_forced_replay(tiny_cfg, batch):
    """The backpointer-reconstructed beam alphas must equal the alphas from
    teacher-forcing the predicted caption back through the decoder: both paths
    see the identical token prefix, so the attention rows coincide."""
    from dlsg_tpu.evaluation.evaluate import make_decode_fn

    frames, regions, captions, _ = batch
    cfg = tiny_cfg
    mod = CapGnnModel(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)
    decode = make_decode_fn(mod, cfg, beam_size=3, return_alpha=True)
    ids, alpha_beam = decode(v, frames, regions)
    # replay: feed the predicted tokens as gold with full teacher forcing
    _, _, _, alpha_tf = mod.apply(v, frames, regions, jnp.asarray(ids))
    # compare only up to (and including) each sequence's first <end>: past it
    # the early-exit beam path emits zero attention (ops/beam_search.py skip)
    from dlsg_tpu.vocab import END_ID

    ids_np = np.asarray(ids)
    T = ids_np.shape[1]
    first_end = np.where(
        (ids_np == END_ID).any(1), (ids_np == END_ID).argmax(1), T - 1
    )
    step_idx = np.arange(T)[None, :]
    valid = (step_idx <= first_end[:, None])[:, :, None]
    np.testing.assert_allclose(
        np.asarray(alpha_beam) * valid,
        np.asarray(alpha_tf)[:, : alpha_beam.shape[1]] * valid,
        atol=2e-5,
    )


def test_cap_baseline1(tiny_cfg, batch):
    frames, regions, captions, _ = batch
    mod = CapBaseline1(tiny_cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)
    out, a, b, c = mod.apply(v, frames, regions, captions)
    assert out.shape == (frames.shape[0], tiny_cfg.max_words, VOCAB)
    assert (a, b, c) == (0, 0, 0)


def test_discriminator_score(tiny_cfg, batch):
    frames, regions, captions, lengths = batch
    cfg = tiny_cfg
    B, T, P, H = frames.shape[0], cfg.max_words, cfg.num_proposals, cfg.visual_hidden_size
    onehot = jax.nn.one_hot(captions, VOCAB)
    obj = jnp.ones((B, P, H)) * 0.3
    motion = jnp.ones((B, P, H)) * 0.1
    seq_mask = (captions > 0).astype(jnp.float32)
    att_mask = seq_mask[:, :, None] * seq_mask[:, None, :]
    alpha = jax.nn.softmax(jnp.ones((B, T, 2 * P)), axis=-1)
    mod = DiscV2(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), onehot, obj, motion, att_mask, alpha)
    score = mod.apply(v, onehot, obj, motion, att_mask, alpha)
    assert score.shape == (B,)
    assert np.all(np.isfinite(score))


def test_discriminator_grad_wrt_input(tiny_cfg, batch):
    """WGAN-GP needs d(D)/d(caption_dist) — must be finite and non-zero."""
    frames, regions, captions, lengths = batch
    cfg = tiny_cfg
    B, T, P, H = frames.shape[0], cfg.max_words, cfg.num_proposals, cfg.visual_hidden_size
    onehot = jax.nn.one_hot(captions, VOCAB)
    obj = jnp.ones((B, P, H)) * 0.3
    motion = jnp.ones((B, P, H)) * 0.1
    seq_mask = (captions > 0).astype(jnp.float32)
    att_mask = seq_mask[:, :, None] * seq_mask[:, None, :]
    alpha = jax.nn.softmax(jnp.ones((B, T, 2 * P)), axis=-1)
    mod = DiscV2(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), onehot, obj, motion, att_mask, alpha)
    g = jax.grad(lambda x: jnp.sum(mod.apply(v, x, obj, motion, att_mask, alpha)))(onehot)
    assert np.all(np.isfinite(g))
    assert float(jnp.abs(g).max()) > 0


def test_bf16_compute_mode(tiny_cfg, batch):
    """bfloat16 compute: logits stay fp32, values finite, params fp32."""
    from dlsg_tpu.config import tiny_test_config

    cfg = tiny_test_config(compute_dtype="bfloat16")
    frames, regions, captions, _ = batch
    mod = CapGnnModel(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)
    out, obj, mot, alpha = mod.apply(v, frames, regions, captions)
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(out))
    leaf = jax.tree_util.tree_leaves(v["params"])[0]
    assert leaf.dtype == jnp.float32


def test_discv2_grouped_equals_separate(tiny_cfg, batch):
    """DiscV2(groups=3) over stacked sub-batches == three separate calls
    (the fused WGAN substep's correctness contract)."""
    cfg = tiny_cfg
    frames, regions, captions, _ = batch
    B = captions.shape[0]
    rng = np.random.default_rng(9)
    P, H = cfg.num_proposals, cfg.visual_hidden_size
    T = cfg.max_words
    obj = jnp.asarray(rng.normal(size=(B, P, H)), jnp.float32)
    mot = jnp.asarray(rng.normal(size=(B, P, H)), jnp.float32)
    att = jnp.ones((B, T, T))
    alpha = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, T, 2 * P)), jnp.float32), 1)
    caps = [jax.nn.one_hot(jnp.asarray(rng.integers(0, VOCAB, size=(B, T))), VOCAB)
            for _ in range(3)]

    mod = DiscV2(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), caps[0], obj, mot, att, alpha)

    sep = [np.asarray(mod.apply(v, c, obj, mot, att, alpha)) for c in caps]
    stacked = mod.apply(
        v,
        jnp.concatenate(caps, 0),
        jnp.concatenate([obj] * 3, 0),
        jnp.concatenate([mot] * 3, 0),
        jnp.concatenate([att] * 3, 0),
        jnp.concatenate([alpha] * 3, 0),
        groups=3,
    )
    np.testing.assert_allclose(
        np.asarray(stacked), np.concatenate(sep), atol=1e-5
    )


def test_wgan_d_loss_fused_equals_plain(tiny_cfg, batch):
    """wgan_d_loss_fused == wgan_d_loss (loss, wasserstein, gp) with the same
    deterministic discriminator."""
    from dlsg_tpu.ops.losses import to_onehot, wgan_d_loss, wgan_d_loss_fused

    cfg = tiny_cfg
    frames, regions, captions, _ = batch
    B = captions.shape[0]
    rng = np.random.default_rng(5)
    P, H, T = cfg.num_proposals, cfg.visual_hidden_size, cfg.max_words
    obj = jnp.asarray(rng.normal(size=(B, P, H)), jnp.float32)
    mot = jnp.asarray(rng.normal(size=(B, P, H)), jnp.float32)
    att = jnp.ones((B, T, T))
    alpha = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, T, 2 * P)), jnp.float32), 1)
    real = to_onehot(captions, VOCAB)
    fake = jax.nn.softmax(jnp.asarray(rng.normal(size=(B, T, VOCAB)), jnp.float32))
    eps = jnp.asarray(rng.uniform(size=(B, 1, 1)), jnp.float32)

    mod = DiscV2(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), real, obj, mot, att, alpha)

    def d_fn(caps):
        return mod.apply(v, caps, obj, mot, att, alpha)

    def d_fn3(caps):
        return mod.apply(
            v, caps,
            jnp.concatenate([obj] * 3, 0), jnp.concatenate([mot] * 3, 0),
            jnp.concatenate([att] * 3, 0), jnp.concatenate([alpha] * 3, 0),
            groups=3,
        )

    l1, a1 = wgan_d_loss(d_fn, real, fake, eps)
    l2, a2 = wgan_d_loss_fused(d_fn3, real, fake, eps)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(a1["wasserstein"]), float(a2["wasserstein"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(a1["gp"]), float(a2["gp"]), rtol=1e-4, atol=1e-5)
