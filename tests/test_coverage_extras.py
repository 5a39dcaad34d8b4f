"""Tests for remaining less-traveled paths: METEOR paraphrase stage, PSLScore v1,
per-node beam width, CLI evaluate command."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.metrics import meteor as meteor_mod
from dlsg_tpu.metrics.meteor import (
    score_pair,
    set_paraphrase_table,
    set_synonym_table,
)


def test_meteor_paraphrase_stage():
    """Installing a paraphrase table enables the FOURTH match stage (METEOR
    1.5's paraphrase-en.gz stage, weight 0.6) — independently of the synonym
    stage. 'guy'/'person' is a shipped stage-3 pair and not a stage-2
    synonym, so disabling only the paraphrase table must lose the match."""
    refs = ["a person is cooking rice"]
    hyp = "a guy is cooking rice"
    try:
        set_paraphrase_table({})  # disable stage 3 only; synonyms stay on
        without = score_pair(hyp, refs)
        set_paraphrase_table({"guy": ["person"]})
        with_par = score_pair(hyp, refs)
        set_paraphrase_table(None)  # shipped default covers guy/person too
        with_default = score_pair(hyp, refs)
    finally:
        set_paraphrase_table(None)
    assert with_par > without
    assert with_default == with_par


def test_meteor_synonym_outweighs_paraphrase():
    """Same pair through the synonym table (0.8) must outscore the pair
    through the paraphrase table (0.6): the stage split is real, not two
    names for one table."""
    refs = ["a person is cooking rice"]
    hyp = "a guy is cooking rice"
    try:
        set_synonym_table({"guy": ["person"]})
        set_paraphrase_table({})
        via_syn = score_pair(hyp, refs)
        set_synonym_table({})
        set_paraphrase_table({"guy": ["person"]})
        via_para = score_pair(hyp, refs)
        set_synonym_table({})
        set_paraphrase_table({})
        no_match = score_pair(hyp, refs)
    finally:
        set_synonym_table(None)
        set_paraphrase_table(None)
    assert via_syn > via_para > no_match


def test_psl_score_v1(tiny_cfg):
    """PSLScore (pre-softmax -9e15 masking variant, layer.py:605-658)."""
    from dlsg_tpu.models.discriminator import PSLScore

    cfg = tiny_cfg
    B, T, P, K = 3, cfg.max_words, cfg.num_proposals, cfg.num_topk
    rng = jax.random.PRNGKey(0)
    psl = jax.random.normal(rng, (B, P, 64))
    alpha = jax.nn.softmax(jax.random.normal(rng, (B, T, P)), axis=-1)
    att = jax.random.normal(rng, (B, T, 512))
    seq_mask = jnp.ones((B, T, K))
    mod = PSLScore(P, K)
    v = mod.init(rng, psl, alpha, att, seq_mask)
    out = mod.apply(v, psl, alpha, att, seq_mask)
    assert out.shape == (B,)
    assert np.all(np.isfinite(out))


def test_beam_per_node_width():
    """per_node_beam_size > beam_size widens candidate pools (allennlp param)."""
    from dlsg_tpu.ops.beam_search import beam_search

    V, END = 8, 2
    logp = jax.nn.log_softmax(jax.random.normal(jax.random.PRNGKey(0), (V, V)), -1)

    def step(tokens, st):
        return logp[tokens], st

    p1, l1 = beam_search(
        jnp.zeros((1,), jnp.int32), {"s": jnp.zeros((1, 1))}, step,
        end_id=END, max_steps=4, beam_size=2, per_node_beam_size=6,
    )
    assert p1.shape == (1, 2, 4)
    # widening per-node candidates can only improve (or tie) the best score
    p2, l2 = beam_search(
        jnp.zeros((1,), jnp.int32), {"s": jnp.zeros((1, 1))}, step,
        end_id=END, max_steps=4, beam_size=2, per_node_beam_size=2,
    )
    assert float(l1[0, 0]) >= float(l2[0, 0]) - 1e-6


def test_cli_evaluate_synthetic(tmp_path, capsys):
    """The standalone evaluate command (reference evaluate.py __main__)."""
    from dlsg_tpu.cli import main

    rc = main([
        "evaluate", "--synthetic", "--allow_random_params", "--synthetic_videos", "6",
        "--train_batch_size", "4", "--test_batch_size", "4", "--beam_size", "2",
        "--visual_hidden_size", "32", "--region_projected_size", "32",
        "--query_hidden_size", "32", "--word_size", "16",
        "--a_feature_size", "24", "--m_feature_size", "12",
        "--max_frames", "6", "--max_words", "8",
        "--result_dir", str(tmp_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "CIDEr" in out and "Bleu_4" in out and "inference time" in out


def test_packaging_console_script_target():
    """pyproject.toml's console script must point at an importable callable.

    The reference exposes its entries as bare scripts (train_gan.py,
    run_gun.py); the rebuild is pip-installable with a `dlsg-tpu` console
    script — pin the entry-point target so a pyproject refactor can't
    silently break `pip install dlsg-tpu && dlsg-tpu train ...`.
    """
    import importlib
    import pathlib

    tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11 (= requires-python)

    root = pathlib.Path(__file__).resolve().parents[1]
    meta = tomllib.loads((root / "pyproject.toml").read_text())
    scripts = meta["project"]["scripts"]
    assert "dlsg-tpu" in scripts
    mod_name, func_name = scripts["dlsg-tpu"].split(":")
    fn = getattr(importlib.import_module(mod_name), func_name)
    assert callable(fn)
    # the curated METEOR tables must ship in the wheel
    pkg_data = meta["tool"]["setuptools"]["package-data"]
    assert "data/*.txt" in pkg_data["dlsg_tpu.metrics"]


def test_cli_serve_synthetic(tmp_path, capsys):
    """`serve`: caption the eval features, one JSON line per video (no scoring)."""
    import json

    from dlsg_tpu.cli import main

    rc = main([
        "serve", "--synthetic", "--allow_random_params", "--synthetic_videos", "6",
        "--greedy",
        "--train_batch_size", "4", "--test_batch_size", "4", "--beam_size", "2",
        "--visual_hidden_size", "32", "--region_projected_size", "32",
        "--query_hidden_size", "32", "--word_size", "16",
        "--a_feature_size", "24", "--m_feature_size", "12",
        "--max_frames", "6", "--max_words", "8",
        "--result_dir", str(tmp_path),
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    recs = [json.loads(l) for l in lines]
    assert sorted(r["video_id"] for r in recs) == list(range(6))
    assert all(isinstance(r["caption"], str) for r in recs)


def test_cli_serve_requires_checkpoint_or_flag(capsys):
    from dlsg_tpu.cli import main

    rc = main(["serve", "--synthetic"])
    assert rc == 2


def test_cli_serve_npz_features(tmp_path, capsys):
    """serve --features: caption arbitrary pre-extracted clips (no dataset)."""
    import json

    from dlsg_tpu.cli import main
    from dlsg_tpu.config import apply_dataset_overrides, parse_opt

    flags = [
        "--train_batch_size", "4", "--test_batch_size", "4", "--beam_size", "2",
        "--visual_hidden_size", "32", "--region_projected_size", "32",
        "--query_hidden_size", "32", "--word_size", "16",
        "--a_feature_size", "24", "--m_feature_size", "12",
        "--max_frames", "6", "--max_words", "8",
    ]
    cfg = apply_dataset_overrides(parse_opt(flags))
    rng = np.random.default_rng(0)
    npz = tmp_path / "clips.npz"
    np.savez(
        npz,
        frames=rng.normal(size=(3, cfg.max_frames, cfg.feature_size)).astype(np.float32),
        regions=rng.normal(
            size=(3, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
        ).astype(np.float32),
        video_ids=np.array([7, 8, 9]),
    )
    out_path = tmp_path / "captions.jsonl"
    rc = main([
        "serve", "--synthetic", "--allow_random_params", "--greedy",
        "--features", str(npz), "--output", str(out_path),
        *flags, "--result_dir", str(tmp_path),
    ])
    assert rc == 0
    assert capsys.readouterr().out == ""  # JSONL went to --output, not stdout
    recs = [json.loads(l) for l in out_path.read_text().splitlines() if l.strip()]
    assert [r["video_id"] for r in recs] == [7, 8, 9]


def test_cli_serve_npz_string_ids_and_mismatch(tmp_path, capsys):
    """serve --features: string video_ids pass through verbatim (MSR-VTT-style
    'video7001' names), and a frames/video_ids length mismatch is refused
    instead of silently dropping captions."""
    import json

    import pytest

    from dlsg_tpu.cli import main
    from dlsg_tpu.config import apply_dataset_overrides, parse_opt

    flags = [
        "--train_batch_size", "4", "--test_batch_size", "4", "--beam_size", "2",
        "--visual_hidden_size", "32", "--region_projected_size", "32",
        "--query_hidden_size", "32", "--word_size", "16",
        "--a_feature_size", "24", "--m_feature_size", "12",
        "--max_frames", "6", "--max_words", "8",
    ]
    cfg = apply_dataset_overrides(parse_opt(flags))
    rng = np.random.default_rng(1)
    frames = rng.normal(size=(3, cfg.max_frames, cfg.feature_size)).astype(np.float32)
    regions = rng.normal(
        size=(3, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    ).astype(np.float32)

    npz = tmp_path / "named.npz"
    np.savez(npz, frames=frames, regions=regions,
             video_ids=np.array(["video7001", "video7002", "video7003"]))
    rc = main([
        "serve", "--synthetic", "--allow_random_params", "--greedy",
        "--features", str(npz), *flags, "--result_dir", str(tmp_path),
    ])
    assert rc == 0
    recs = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert [r["video_id"] for r in recs] == ["video7001", "video7002", "video7003"]

    bad = tmp_path / "misaligned.npz"
    np.savez(bad, frames=frames, regions=regions, video_ids=np.array([1, 2]))
    with pytest.raises(ValueError, match="video_ids"):
        main([
            "serve", "--synthetic", "--allow_random_params", "--greedy",
            "--features", str(bad), *flags, "--result_dir", str(tmp_path),
        ])
