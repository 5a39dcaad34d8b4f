"""Serving API tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.serve import Captioner


@pytest.fixture(scope="module")
def captioner():
    cfg = tiny_test_config(test_batch_size=4, beam_size=2)
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    B = cfg.test_batch_size
    frames = jnp.zeros((B, cfg.max_frames, cfg.feature_size))
    regions = jnp.zeros((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps = jnp.zeros((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, regions, caps)["params"]
    return Captioner.from_params(cfg, vocab, params), cfg, vocab


def test_caption_batch(captioner):
    cap, cfg, vocab = captioner
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(3, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(3, cfg.max_frames, cfg.num_obj + 2, cfg.region_feature_size))
    sents = cap.caption(frames, regions)
    assert len(sents) == 3
    assert all(isinstance(s, str) for s in sents)


def test_caption_ragged_and_multi_batch(captioner):
    cap, cfg, vocab = captioner
    rng = np.random.default_rng(1)
    # 6 clips with compiled batch 4 -> two chunks, second padded
    frames = rng.normal(size=(6, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(6, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    sents = cap.caption(frames, regions, greedy=True)
    assert len(sents) == 6
    # identical inputs -> identical captions (deterministic inference)
    s2 = cap.caption(frames, regions, greedy=True)
    assert sents == s2
