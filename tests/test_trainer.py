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


@pytest.mark.slow
def test_gan_trainer_tensor_parallel_epoch(tmp_path):
    """RunGAN.train() on a real (data=4, model=2) mesh: the vocab head is
    column-sharded over `model` (with its Adam moments), the layout survives
    the whole epoch (jit propagates it — no per-step reshard), and the final
    parameters match a mesh-free run bit-for-tolerance (TP is a layout, not a
    numerics change). Consumes cfg.mesh_data_axis/mesh_model_axis the same way
    `cli train` does."""
    import jax
    from jax.sharding import PartitionSpec as P

    from dlsg_tpu.parallel.mesh import make_mesh
    from dlsg_tpu.train.trainer import RunGAN

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    def build(mesh, root):
        cfg = tiny_test_config(
            epoch_num=1,
            result_dir=str(root),
            train_batch_size=4,
            test_batch_size=4,
            beam_size=2,
            dropout=0.0,
            rng_impl="threefry2x32",
            mesh_data_axis=4,
            mesh_model_axis=2,
        )
        # |V| must divide by model=2 for the head to actually shard (a
        # non-divisible vocab falls back to replicated by design)
        vocab = make_vocab(extra_words=1)
        ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=2)
        return RunGAN(cfg, vocab, ds, ds.eval_view(), ds.references, mesh=mesh)

    mesh = make_mesh(n_data=4, n_model=2)
    runner = build(mesh, tmp_path / "tp")

    def wr_kernel(state):
        return state.params["decoder"]["step"]["word_restore"]["kernel"]

    def adam_mu(state):
        leaves = jax.tree_util.tree_leaves_with_path(state.opt_state)
        for path, leaf in leaves:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if "word_restore" in name and "kernel" in name:
                return leaf
        raise AssertionError("no word_restore kernel moment found")

    k = wr_kernel(runner.gen_state)
    assert k.sharding.spec == P(None, "model"), k.sharding
    assert k.addressable_shards[0].data.shape[1] == k.shape[1] // 2
    assert adam_mu(runner.gen_state).sharding.spec == P(None, "model")

    handler = runner.train()
    assert handler.recorders[0].record is not None
    k = wr_kernel(runner.gen_state)
    assert k.sharding.spec == P(None, "model"), "TP layout lost during training"
    assert adam_mu(runner.gen_state).sharding.spec == P(None, "model")

    # numerics parity vs the mesh-free path (same seeds, dropout off)
    base = build(None, tmp_path / "dp")
    base.train()
    np.testing.assert_allclose(
        np.asarray(k), np.asarray(wr_kernel(base.gen_state)), atol=2e-4
    )
    emb_tp = runner.gen_state.params["decoder"]["step"]["word_embed"]["embedding"]
    emb_dp = base.gen_state.params["decoder"]["step"]["word_embed"]["embedding"]
    np.testing.assert_allclose(np.asarray(emb_tp), np.asarray(emb_dp), atol=2e-4)


@pytest.mark.slow
def test_gan_trainer_auto_resume_continuity(tmp_path):
    """resume_epoch='latest' restores the newest epoch_N checkpoint and the
    resumed run reproduces the uninterrupted run EXACTLY: params, D params,
    and the GAN-lambda window all match a straight 2-epoch run after
    train-1-epoch -> kill -> resume-latest -> train-1-more. Works because
    every epoch folds its index into the base rng (trainer.py _base_rng),
    data shuffling is epoch-keyed, and the checkpoint restores optimizer +
    lambda state (reference resume: run_gun.py:53-61,302-310 — which needs a
    hand-passed epoch number; 'latest' is the auto-pick)."""
    import jax

    from dlsg_tpu.train.trainer import RunGAN

    def build(root, epoch_num, resume=None):
        cfg = tiny_test_config(
            epoch_num=epoch_num,
            result_dir=str(root),
            train_batch_size=4,
            test_batch_size=4,
            beam_size=2,
        )
        vocab = make_vocab()
        ds = SyntheticDataset(cfg, vocab, num_videos=8, captions_per_video=2)
        return RunGAN(
            cfg, vocab, ds, ds.eval_view(), ds.references,
            is_debug=False, resume_epoch=resume,
        )

    # resume='latest' with no checkpoints on disk -> fresh start
    fresh = build(tmp_path / "fresh", 1, resume="latest")
    assert fresh.last_epoch == -1

    # uninterrupted 2-epoch run
    a = build(tmp_path / "a", 2)
    a.train()

    # 1 epoch, "crash", then auto-resume for the second
    b1 = build(tmp_path / "b", 1)
    b1.train()
    b2 = build(tmp_path / "b", 2, resume="latest")
    assert b2.last_epoch == 0, "latest checkpoint not picked up"
    b2.train()

    flat_a = jax.tree_util.tree_leaves_with_path(a.gen_state.params)
    flat_b = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(b2.gen_state.params)
    )
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(path)]),
            atol=1e-5, err_msg=f"gen param diverged after resume: {path}",
        )
    for la, lb in zip(
        jax.tree_util.tree_leaves(a.disc_state.params),
        jax.tree_util.tree_leaves(b2.disc_state.params),
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)
    for la, lb in zip(
        jax.tree_util.tree_leaves(a.lambda_state),
        jax.tree_util.tree_leaves(b2.lambda_state),
    ):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)


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
