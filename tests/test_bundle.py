"""Single-file serving bundle tests (dlsg_tpu/bundle.py)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.bundle import load_bundle, save_bundle
from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
from dlsg_tpu.models.generator import CapGnnModel
from dlsg_tpu.serve import Captioner


def _tiny_setup(**overrides):
    cfg = tiny_test_config(test_batch_size=4, beam_size=2, **overrides)
    vocab = make_vocab()
    model = CapGnnModel(cfg, len(vocab))
    B = cfg.test_batch_size
    frames = jnp.zeros((B, cfg.max_frames, cfg.feature_size))
    regions = jnp.zeros((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps = jnp.zeros((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, regions, caps)["params"]
    return cfg, vocab, params


def test_bundle_roundtrip(tmp_path):
    cfg, vocab, params = _tiny_setup()
    path = str(tmp_path / "m.dlsg.npz")
    save_bundle(path, cfg, vocab, params)

    cfg2, vocab2, params2 = load_bundle(path)
    assert cfg2 == cfg  # tuple fields coerced back from JSON lists
    assert isinstance(cfg2.msvd_test_range, tuple)
    assert vocab2.idx2word == vocab.idx2word
    assert vocab2("man") == vocab("man") and len(vocab2) == len(vocab)

    flat = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(params2)}
    assert len(flat) == len(flat2)
    for k, v in flat:
        v2 = flat2[jax.tree_util.keystr(k)]
        assert v2.shape == v.shape and v2.dtype == np.asarray(v).dtype
        np.testing.assert_array_equal(np.asarray(v), v2)


def test_bundle_rejects_garbage(tmp_path):
    not_bundle = str(tmp_path / "x.npz")
    np.savez(not_bundle, a=np.zeros(3))
    with pytest.raises(ValueError, match="not a dlsg_tpu bundle"):
        load_bundle(not_bundle)

    bad_version = str(tmp_path / "v.npz")
    meta = json.dumps({"version": 99, "config": {}, "vocab": []})
    np.savez(bad_version,
             __dlsg_meta__=np.frombuffer(meta.encode(), dtype=np.uint8))
    with pytest.raises(ValueError, match="version 99"):
        load_bundle(bad_version)


def test_bundle_ignores_unknown_config_fields(tmp_path):
    """A bundle written by a build with extra config fields still loads."""
    cfg, vocab, params = _tiny_setup()
    path = str(tmp_path / "m.npz")
    save_bundle(path, cfg, vocab, params)
    with np.load(path) as data:
        arrays = {k: data[k] for k in data.files}
    meta = json.loads(bytes(arrays["__dlsg_meta__"].tobytes()).decode())
    meta["config"]["field_from_the_future"] = 42
    arrays["__dlsg_meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)
    cfg2, _, _ = load_bundle(path)
    assert cfg2 == cfg


def test_captioner_from_bundle_matches_from_params(tmp_path):
    cfg, vocab, params = _tiny_setup()
    path = str(tmp_path / "m.dlsg.npz")
    save_bundle(path, cfg, vocab, params)

    rng = np.random.default_rng(3)
    frames = rng.normal(size=(3, cfg.max_frames, cfg.feature_size))
    regions = rng.normal(size=(3, cfg.max_frames, cfg.num_obj,
                               cfg.region_feature_size))
    direct = Captioner.from_params(cfg, vocab, params)
    bundled = Captioner.from_bundle(path)
    assert bundled.cfg == cfg
    assert direct.caption(frames, regions, greedy=True) == \
        bundled.caption(frames, regions, greedy=True)


TINY_CLI_FLAGS = [
    "--train_batch_size", "4", "--test_batch_size", "4", "--beam_size", "2",
    "--visual_hidden_size", "32", "--region_projected_size", "32",
    "--query_hidden_size", "32", "--decode_hidden_size", "32",
    "--word_size", "16", "--gan_word_size", "16",
    "--num_proposals", "2", "--num_obj", "3", "--num_topk", "2",
    "--max_frames", "6", "--max_words", "8",
    "--a_feature_size", "24", "--m_feature_size", "12",
    "--region_feature_size", "20",
]


@pytest.mark.slow
def test_cli_export_then_serve_bundle(tmp_path, capsys):
    """The deployment flow end-to-end: `export` writes a bundle from a (here
    random) model + synthetic vocab; `serve --bundle --features` captions an
    npz with NO vocab/dataset/checkpoint access."""
    from dlsg_tpu.cli import main
    from dlsg_tpu.config import apply_dataset_overrides, parse_opt

    bundle = str(tmp_path / "model.dlsg.npz")
    rc = main(["export", "--synthetic", "--allow_random_params",
               "--out", bundle] + TINY_CLI_FLAGS)
    assert rc == 0 and os.path.exists(bundle)

    # clips matching the bundle's (override-applied) dims
    cfg = apply_dataset_overrides(parse_opt(TINY_CLI_FLAGS))
    rng = np.random.default_rng(0)
    clips = str(tmp_path / "clips.npz")
    np.savez(clips,
             frames=rng.normal(size=(3, cfg.max_frames, cfg.feature_size))
             .astype(np.float32),
             regions=rng.normal(size=(3, cfg.max_frames, cfg.num_obj,
                                      cfg.region_feature_size))
             .astype(np.float32),
             video_ids=np.array(["clip_a", "clip_b", "clip_c"]))
    out = str(tmp_path / "captions.jsonl")
    rc = main(["serve", "--bundle", bundle, "--features", clips,
               "--output", out, "--greedy"])
    assert rc == 0
    lines = [json.loads(l) for l in open(out)]
    assert [l["video_id"] for l in lines] == ["clip_a", "clip_b", "clip_c"]
    assert all(isinstance(l["caption"], str) for l in lines)

    # --bundle without a data source is a clear error, not a crash
    assert main(["serve", "--bundle", bundle]) == 2


def test_bundle_exact_path_without_npz_suffix(tmp_path):
    """np.savez appends '.npz' to bare string paths; save_bundle must write
    EXACTLY the requested path so export --out model.bundle round-trips."""
    cfg, vocab, params = _tiny_setup()
    path = str(tmp_path / "model.bundle")
    save_bundle(path, cfg, vocab, params)
    assert os.path.exists(path) and not os.path.exists(path + ".npz")
    cfg2, _, _ = load_bundle(path)
    assert cfg2 == cfg
