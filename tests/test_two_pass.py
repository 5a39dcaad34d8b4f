"""Two-pass per-sequence early-exit decode: exactness vs the single-pass beam.

The two-pass path (evaluation/evaluate.py::_make_two_pass_fn) must emit
IDENTICAL token ids to the full-length single-pass decode for every mixture of
early/late-ending sequences — finished-by-t1 rows keep their pass-1 result,
stragglers are re-decoded from scratch at full length. Caption-end dynamics are
steered by biasing the vocab head's <end> logit so one parametrization sweeps
all-finish / mixed / none-finish regimes (the mixed case exercises the bucketed
chunk loop; none-finish exercises the full-batch fallback guard).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.evaluation.evaluate import make_decode_fn
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.vocab import END_ID


B, VOCAB = 6, 40


def _setup(end_bias: float, **cfg_kw):
    cfg = tiny_test_config(
        test_batch_size=B, max_words=10, beam_size=3, **cfg_kw
    )
    model = CapGnnModel(cfg, VOCAB)
    rng = np.random.RandomState(0)
    frames = rng.randn(B, cfg.max_frames, cfg.feature_size).astype(np.float32)
    regions = rng.randn(
        B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size
    ).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(3), frames, regions, jnp.zeros((B, cfg.max_words), jnp.int32)
    )
    params = jax.device_get(variables["params"])
    bias = np.array(params["decoder"]["step"]["word_restore"]["bias"])
    bias[END_ID] += end_bias
    params["decoder"]["step"]["word_restore"]["bias"] = bias
    return cfg, model, {"params": params}, frames, regions


def _caption_len(row):
    ends = np.nonzero(row == END_ID)[0]
    return int(ends[0]) if ends.size else row.size


@pytest.mark.parametrize("end_bias", [-2.0, 2.0, 6.0])
def test_two_pass_matches_single_pass(end_bias):
    cfg, model, variables, frames, regions = _setup(end_bias)
    from dataclasses import replace

    full_fn = make_decode_fn(model, cfg, return_alpha=True)
    tp_cfg = replace(cfg, decode_two_pass_t1=4, decode_two_pass_bucket=2)
    tp_fn = make_decode_fn(model, tp_cfg, return_alpha=True)

    ids_f, al_f = full_fn(variables, frames, regions)
    ids_t, al_t = tp_fn(variables, frames, regions)
    ids_f, al_f = np.asarray(ids_f), np.asarray(al_f)
    ids_t, al_t = np.asarray(ids_t), np.asarray(al_t)

    np.testing.assert_array_equal(ids_f, ids_t)
    # alphas are exact for every emitted token (both paths emit meaningless
    # filler after a caption's <end>: junk attention vs zeros — not compared)
    for b in range(B):
        e = min(_caption_len(ids_f[b]) + 1, ids_f.shape[1])
        np.testing.assert_allclose(al_f[b, :e], al_t[b, :e], atol=1e-6)


def test_two_pass_sweep_covers_mixed_regime():
    """At least one sweep point must actually leave a mixed finished/straggler
    batch at t1 (otherwise the bucketed path was never exercised)."""
    from dlsg_tpu.evaluation.evaluate import _make_beam_from_feats

    for end_bias in [-2.0, 2.0, 6.0]:
        cfg, model, variables, frames, regions = _setup(end_bias)
        beam_feats = _make_beam_from_feats(model, cfg, cfg.beam_size)
        obj, mot = model.apply(variables, frames, regions, method=model.encode)
        _, _, _, fin = beam_feats(variables, obj, mot, 4)
        fin = np.asarray(fin)
        if 0 < fin.sum() < B:
            return
    pytest.fail("no sweep point produced a mixed finished/unfinished batch")


def test_two_pass_frames_only_model():
    """CapModel encodes to (feats, None): the two-pass path must pass the None
    motion stream through instead of indexing it (it crashed at trace time
    before the guard — lax.cond traces both branches)."""
    from dataclasses import replace

    from dlsg_tpu.models.generator import CapModel

    cfg = tiny_test_config(test_batch_size=B, max_words=10, beam_size=3)
    model = CapModel(cfg, VOCAB)
    rng = np.random.RandomState(1)
    frames = rng.randn(B, cfg.max_frames, cfg.feature_size).astype(np.float32)
    regions = rng.randn(
        B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size
    ).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(3), frames, jnp.zeros((B, cfg.max_words), jnp.int32)
    )
    full_fn = make_decode_fn(model, cfg)
    tp_cfg = replace(cfg, decode_two_pass_t1=4, decode_two_pass_bucket=2)
    tp_fn = make_decode_fn(model, tp_cfg)
    ids_f = np.asarray(full_fn(variables, frames, regions))
    ids_t = np.asarray(tp_fn(variables, frames, regions))
    np.testing.assert_array_equal(ids_f, ids_t)


def test_two_pass_used_in_evaluate_pipeline():
    """make_decode_fn returns the composite (non-jitted) two-pass callable when
    the config enables it, and it slots into evaluate() unchanged."""
    cfg, model, variables, frames, regions = _setup(2.0)
    from dataclasses import replace

    tp_cfg = replace(cfg, decode_two_pass_t1=4)
    fn = make_decode_fn(model, tp_cfg)
    ids = np.asarray(fn(variables, frames, regions))
    assert ids.shape == (B, tp_cfg.max_words)
