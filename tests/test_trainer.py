"""End-to-end trainer smoke tests on synthetic data (CPU)."""

import os

import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
from dlsg_tpu.evaluation.results import ResultHandler


def test_result_handler_tracks_best(tmp_path):
    h = ResultHandler("exp", results_root=str(tmp_path), beam_list=[5])
    m1 = {"Bleu_4": 0.2, "METEOR": 0.1, "CIDEr": 0.3, "ROUGE_L": 0.4}
    trig = h.update_result([m1], [{"1": "a cat"}], epoch=0)
    assert trig in ("Bleu_4", "CIDEr")
    assert h.best("CIDEr") == 0.3
    # lower scores don't overwrite
    m2 = {"Bleu_4": 0.1, "METEOR": 0.05, "CIDEr": 0.1, "ROUGE_L": 0.2}
    trig2 = h.update_result([m2], [{"1": "b"}], epoch=1)
    assert trig2 is None
    assert h.best("CIDEr") == 0.3
    # CSVs written
    assert os.path.exists(tmp_path / "exp" / "metrics.csv")
    assert os.path.exists(tmp_path / "exp" / "captioning" / "CIDEr_5.csv")


def test_metrics_writer(tmp_path):
    from dlsg_tpu.utils.logging import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.add_scalar("Loss/cap_loss", 3.5, 1)
    w.add_scalar("Loss/cap_loss", 3.1, 2)
    w.close()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
    assert lines[0]["tag"] == "Loss/cap_loss"
    assert lines[1]["value"] == pytest.approx(3.1)


@pytest.mark.slow
def test_gan_trainer_one_epoch(tmp_path):
    """Full RunGAN loop: 1 epoch on synthetic data, eval + results + logs."""
    from dlsg_tpu.train.trainer import RunGAN

    cfg = tiny_test_config(
        epoch_num=1,
        result_dir=str(tmp_path / "results"),
        train_batch_size=4,
        test_batch_size=4,
        beam_size=2,
    )
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=2)
    runner = RunGAN(cfg, vocab, ds, ds.eval_view(), ds.references)
    handler = runner.train()
    # an eval ran and recorded some (possibly 0-ish) metrics
    assert handler.recorders[0].record is not None
    # scalars were logged
    log = tmp_path / "results" / runner.base_name / "logs" / "scalars.jsonl"
    assert log.exists()
    tags = {__import__("json").loads(l)["tag"] for l in open(log)}
    assert "Loss/cap_loss" in tags
    assert "Loss/D_loss_visual" in tags
    # an attention heatmap PNG landed in the results dir (run_gun.py:455-465)
    images = tmp_path / "results" / runner.base_name / "images"
    assert images.exists() and any(p.suffix == ".png" for p in images.iterdir())


def _write_tiny_glove(path, vocab, word_size, known):
    """GloVe text file with deterministic vectors for `known` vocab words."""
    lines = []
    for w in known:
        vec = [round(0.1 * (i + 1) + 0.01 * len(w), 3) for i in range(word_size)]
        lines.append(w + " " + " ".join(str(x) for x in vec))
    path.write_text("\n".join(lines) + "\n")


def test_trainer_grafts_glove_embedding(tmp_path):
    """use_glove wires load_glove_matrix into the trainer: embedding rows for
    in-file words equal the file vectors after init (layer.py:307-309,352-386)."""
    from dlsg_tpu.train.trainer import RunGAN

    vocab = make_vocab()
    known = [w for w in vocab.idx2word if not w.startswith("<")][:4]
    glove = tmp_path / "glove.txt"
    cfg = tiny_test_config(
        result_dir=str(tmp_path / "results"),
        use_glove=True,
        glove_txt_path=str(glove),
        data_dir=str(tmp_path),
    )
    _write_tiny_glove(glove, vocab, cfg.word_size, known)
    ds = SyntheticDataset(cfg, vocab, num_videos=4, captions_per_video=1)
    runner = RunGAN(cfg, vocab, ds, ds.eval_view(), ds.references)
    emb = np.asarray(
        runner.gen_state.params["decoder"]["step"]["word_embed"]["embedding"]
    )
    from dlsg_tpu.models.glove import load_glove_matrix

    expect = load_glove_matrix(vocab, cfg.word_size, str(glove))
    for w in known:
        np.testing.assert_allclose(
            emb[vocab(w)], expect[vocab(w)], rtol=1e-6, err_msg=w
        )
    # missing words got the N(0, 0.6) fallback, not zeros
    missing = [w for w in vocab.idx2word if not w.startswith("<") and w not in known]
    assert np.abs(emb[vocab(missing[0])]).sum() > 0


@pytest.mark.slow
def test_frozen_glove_embedding_survives_training(tmp_path):
    """freeze_word_embed: the grafted embedding is bit-identical after a full
    training epoch while other params move (requires_grad=False parity,
    model.py:52-53)."""
    from dlsg_tpu.train.trainer import RunGAN

    vocab = make_vocab()
    known = [w for w in vocab.idx2word if not w.startswith("<")][:4]
    glove = tmp_path / "glove.txt"
    cfg = tiny_test_config(
        epoch_num=1,
        result_dir=str(tmp_path / "results"),
        train_batch_size=4,
        test_batch_size=4,
        beam_size=2,
        use_glove=True,
        freeze_word_embed=True,
        glove_txt_path=str(glove),
        data_dir=str(tmp_path),
    )
    _write_tiny_glove(glove, vocab, cfg.word_size, known)
    ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=2)
    runner = RunGAN(cfg, vocab, ds, ds.eval_view(), ds.references)
    emb_before = np.asarray(
        runner.gen_state.params["decoder"]["step"]["word_embed"]["embedding"]
    ).copy()
    other_before = np.asarray(
        runner.gen_state.params["decoder"]["step"]["word_restore"]["kernel"]
    ).copy()
    runner.train()
    emb_after = np.asarray(
        runner.gen_state.params["decoder"]["step"]["word_embed"]["embedding"]
    )
    other_after = np.asarray(
        runner.gen_state.params["decoder"]["step"]["word_restore"]["kernel"]
    )
    np.testing.assert_array_equal(emb_before, emb_after)
    assert np.abs(other_after - other_before).sum() > 0


@pytest.mark.slow
def test_baseline_trainer_one_epoch(tmp_path):
    from dlsg_tpu.train.trainer import Run

    cfg = tiny_test_config(
        epoch_num=1,
        result_dir=str(tmp_path / "results"),
        train_batch_size=4,
        test_batch_size=4,
        use_visual_gan=False,
    )
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=2)
    runner = Run(cfg, vocab, ds, ds.eval_view(), ds.references)
    handler = runner.train()
    assert handler is not None


@pytest.mark.slow
def test_trainer_profile_dir_writes_trace(tmp_path):
    """cfg.profile_dir: the trainer traces steps 3-5 of the first epoch and
    reports Stopwatch spans (utils/profiler wiring)."""
    from dlsg_tpu.train.trainer import RunGAN

    cfg = tiny_test_config(
        epoch_num=1,
        result_dir=str(tmp_path / "results"),
        profile_dir=str(tmp_path / "trace"),
        train_batch_size=4,
        test_batch_size=4,
        beam_size=2,
    )
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=16, captions_per_video=2)
    runner = RunGAN(cfg, vocab, ds, ds.eval_view(), ds.references)
    runner.train()
    trace_files = list((tmp_path / "trace").rglob("*"))
    assert any(p.is_file() for p in trace_files), trace_files
    assert runner.stopwatch.counts.get("train_step", 0) > 0
    assert "train_step" in runner.stopwatch.report()
