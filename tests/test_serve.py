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


def test_bucketed_shapes_do_not_grow_compile_cache():
    """Arbitrary request sizes pad to power-of-two buckets: captioning 3, 5,
    then 7 videos through a B=16 captioner all land on ONE compiled shape
    (bucket 8), and per-row results are identical to full-batch captioning
    (decode is row-independent; padding rows cannot leak)."""
    cfg = tiny_test_config(test_batch_size=16, beam_size=2)
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    frames0 = jnp.zeros((2, cfg.max_frames, cfg.feature_size))
    regions0 = jnp.zeros((2, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps0 = jnp.zeros((2, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames0, regions0, caps0)["params"]
    cap = Captioner.from_params(cfg, vocab, params)

    assert [cap._bucket_size(n) for n in (1, 3, 8, 9, 16, 99)] == [8, 8, 8, 16, 16, 16]

    rng = np.random.default_rng(2)
    frames = rng.normal(size=(7, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(7, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    all7 = cap.caption(frames, regions)
    assert len(all7) == 7
    assert cap.caption(frames[:3], regions[:3]) == all7[:3]
    assert cap.caption(frames[:5], regions[:5]) == all7[:5]
    # every request size <= 8 hit the same compiled bucket: one beam compile
    assert cap._beam_fn._cache_size() == 1


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


def test_warmup_compiles_every_bucket():
    """warmup() pre-compiles the full bucket set so no live request pays a
    compile (the cold-start story for `serve --listen --warmup`)."""
    cfg = tiny_test_config(test_batch_size=16, beam_size=2)
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    frames0 = jnp.zeros((2, cfg.max_frames, cfg.feature_size))
    regions0 = jnp.zeros((2, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps0 = jnp.zeros((2, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames0, regions0, caps0)["params"]
    cap = Captioner.from_params(cfg, vocab, params)

    assert cap.bucket_sizes() == [8, 16]
    assert not cap.warm
    assert cap.warmup() == 2
    assert cap.warm
    assert cap._beam_fn._cache_size() == 2
    # any request size now lands on an already-compiled shape
    rng = np.random.default_rng(7)
    frames = rng.normal(size=(5, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(5, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    assert len(cap.caption(frames, regions)) == 5
    assert cap._beam_fn._cache_size() == 2


def test_warmup_bounds_first_request_latency_for_every_size():
    """The serving-latency claim (scripts/bench_serving_http.py, VERDICT r4 #8)
    as a test: after warmup(), EVERY request size 1..B lands on an
    already-compiled bucket — zero new compiles, so no first-request stall.
    Compile count is observed through the jit cache size (one entry per
    compiled input shape)."""
    cfg = tiny_test_config(test_batch_size=16, beam_size=2)
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    frames0 = jnp.zeros((2, cfg.max_frames, cfg.feature_size))
    regions0 = jnp.zeros((2, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps0 = jnp.zeros((2, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames0, regions0, caps0)["params"]
    cap = Captioner.from_params(cfg, vocab, params)

    warmed = cap.warmup()
    assert warmed == len(cap.bucket_sizes()) == 2
    compiled_after_warmup = cap._beam_fn._cache_size()
    rng = np.random.default_rng(11)
    B = cfg.test_batch_size
    frames = rng.normal(size=(B, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    for n in range(1, B + 1):
        assert len(cap.caption(frames[:n], regions[:n])) == n
        assert cap._beam_fn._cache_size() == compiled_after_warmup, (
            f"request size {n} triggered a new compile"
        )


def test_meshed_captioner_matches_unmeshed(captioner):
    """Captioner(mesh=...) shards each decode bucket over the data axis (the
    multi-chip serving path cli `serve` uses); results are identical to the
    single-device captioner — decode is batch-parallel with no collectives."""
    from dlsg_tpu.parallel.mesh import make_mesh

    cap, cfg, vocab = captioner
    meshed = Captioner.from_params(
        cfg, vocab, cap.variables["params"], mesh=make_mesh()
    )
    rng = np.random.default_rng(5)
    frames = rng.normal(size=(5, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(5, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    assert meshed.caption(frames, regions) == cap.caption(frames, regions)
    assert meshed.caption(frames[:1], regions[:1], greedy=True) == cap.caption(
        frames[:1], regions[:1], greedy=True
    )


def test_fast_profile_captions(captioner):
    """The fast serving profile (hardware approximate top-k) produces valid
    captions through the same API; on CPU the approx lowering is exact, so
    results match the exact captioner."""
    cap, cfg, vocab = captioner
    fast = Captioner.from_params(cfg, vocab, cap.variables["params"], fast=True)
    assert fast.cfg.decode_approx_topk == 0.95
    rng = np.random.default_rng(3)
    frames = rng.normal(size=(3, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(3, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    assert fast.caption(frames, regions) == cap.caption(frames, regions)


def test_bf16_staged_serving_tokens_identical():
    """input_stage_dtype=bfloat16 in a bf16-compute captioner ships features
    at half width and produces the same captions (every consumer casts to
    bf16 before the matmul anyway)."""
    import dataclasses

    cfg = tiny_test_config(test_batch_size=4, beam_size=2, compute_dtype="bfloat16")
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    B = cfg.test_batch_size
    frames0 = jnp.zeros((B, cfg.max_frames, cfg.feature_size))
    regions0 = jnp.zeros((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps0 = jnp.zeros((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames0, regions0, caps0)["params"]
    base = Captioner.from_params(cfg, vocab, params)
    staged = Captioner.from_params(
        dataclasses.replace(cfg, input_stage_dtype="bfloat16"), vocab, params
    )
    rng = np.random.default_rng(7)
    frames = rng.normal(size=(3, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(3, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    assert staged.caption(frames, regions) == base.caption(frames, regions)
