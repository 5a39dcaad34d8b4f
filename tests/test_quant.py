"""Int8 quantized inference (ops/quant.py + decode_quant='int8')."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.ops.quant import qmatmul, quantize_per_col

VOCAB = 50


def test_qmatmul_accuracy():
    """Per-channel weights + per-row dynamic activations: small relative
    error vs the fp32 matmul on well-conditioned inputs."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    ref = np.asarray(x @ w)
    q, s = quantize_per_col(w)
    out = np.asarray(qmatmul(x, q, s))
    rel = np.abs(out - ref) / (np.abs(ref).mean() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()
    assert rel.max() < 0.2, rel.max()


def test_quantize_round_trip_bound():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    q, s = quantize_per_col(w)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    # symmetric int8: max per-column error is scale/2
    assert np.max(np.abs(deq - np.asarray(w))) <= np.max(np.asarray(s)) / 2 + 1e-6
    assert q.dtype == jnp.int8


def test_int8_beam_decode_runs_and_tracks_fp32(tiny_cfg):
    """decode_quant='int8' produces valid captions whose beam scores track the
    fp32 path (random tiny model: token-level agreement is meaningless, but
    the per-step top-1 logits must correlate strongly)."""
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = tiny_cfg
    rng = np.random.default_rng(2)
    B = 4
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(rng.integers(4, VOCAB, size=(B, cfg.max_words)), jnp.int32)
    mod = CapGnnModel(cfg, VOCAB)
    v = mod.init(jax.random.PRNGKey(0), frames, regions, captions)

    fp = make_decode_fn(mod, cfg, beam_size=3)
    q8 = make_decode_fn(mod, replace(cfg, decode_quant="int8"), beam_size=3)
    ids_fp = np.asarray(fp(v, frames, regions))
    ids_q8 = np.asarray(q8(v, frames, regions))
    assert ids_q8.shape == ids_fp.shape
    assert (ids_q8 >= 0).all() and (ids_q8 < VOCAB).all()

    # logits comparison through one explicit step
    state, pre_fp = mod.apply(v, *mod.apply(v, frames, regions, method=mod.encode),
                              method=mod.decoder_init_beam_state)
    qcfg = replace(cfg, decode_quant="int8")
    qmod = CapGnnModel(qcfg, VOCAB)
    state_q, pre_q8 = qmod.apply(v, *qmod.apply(v, frames, regions, method=qmod.encode),
                                 method=qmod.decoder_init_beam_state)
    toks = jnp.full((B,), 4, jnp.int32)
    lp_fp, _, _ = mod.apply(v, toks, state, pre_fp, method=mod.decoder_beam_step)
    lp_q8, _, _ = qmod.apply(v, toks, state_q, pre_q8, method=qmod.decoder_beam_step)
    corr = np.corrcoef(np.asarray(lp_fp).ravel(), np.asarray(lp_q8).ravel())[0, 1]
    assert corr > 0.999, corr
