"""Checkpoint/resume e2e and reference-pickle import tests."""

import pickle
import sys
import types

import numpy as np
import pytest

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
from dlsg_tpu.vocab import Vocabulary


def test_reference_vocab_pkl_import(tmp_path):
    """Unpickle a Vocabulary that was pickled under the reference's module path
    (utils.utils.Vocabulary, train_debug.py:25-26)."""
    # fabricate the reference's module layout
    utils_pkg = types.ModuleType("utils")
    utils_mod = types.ModuleType("utils.utils")

    class RefVocabulary:
        def __init__(self):
            self.word2idx = {"<pad>": 0, "<start>": 1, "<end>": 2, "<unk>": 3, "cat": 4}
            self.idx2word = ["<pad>", "<start>", "<end>", "<unk>", "cat"]
            self.nwords = 5

    RefVocabulary.__module__ = "utils.utils"
    RefVocabulary.__qualname__ = "Vocabulary"
    RefVocabulary.__name__ = "Vocabulary"
    utils_mod.Vocabulary = RefVocabulary
    utils_pkg.utils = utils_mod
    sys.modules["utils"] = utils_pkg
    sys.modules["utils.utils"] = utils_mod
    try:
        path = tmp_path / "msvd_vocab.pkl"
        with open(path, "wb") as f:
            pickle.dump(RefVocabulary(), f)
        v = Vocabulary.load_reference_pkl(str(path))
        assert isinstance(v, Vocabulary)
        assert len(v) == 5
        assert v("cat") == 4
        assert v("dog") == 3  # <unk>
        assert v.decode_tokens([4, 2, 4]) == "cat"
    finally:
        del sys.modules["utils"], sys.modules["utils.utils"]


def test_vocab_json_roundtrip(tmp_path):
    v = Vocabulary.from_words(["alpha", "beta"])
    p = tmp_path / "v.json"
    v.save_json(str(p))
    v2 = Vocabulary.load_json(str(p))
    assert v2.word2idx == v.word2idx
    assert len(v2) == len(v)


@pytest.mark.slow
def test_gan_trainer_checkpoint_resume(tmp_path):
    """Train 1 epoch with saving on, then resume from the checkpoint
    (run_gun.py:53-61 resume path)."""
    from dlsg_tpu import checkpoint as ckpt
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
    r1 = RunGAN(cfg, vocab, ds, ds.eval_view(), ds.references, is_debug=False)
    r1.train()
    assert ckpt.latest_epoch(cfg.checkpoint_dir) == 0

    cfg2 = tiny_test_config(
        epoch_num=2,
        result_dir=str(tmp_path / "results"),
        train_batch_size=4,
        test_batch_size=4,
        beam_size=2,
    )
    r2 = RunGAN(
        cfg2, vocab, ds, ds.eval_view(), ds.references, is_debug=False, resume_epoch=0
    )
    assert r2.last_epoch == 0
    # restored params match what was saved
    w1 = np.asarray(
        r1.gen_state.params["decoder"]["step"]["word_restore"]["kernel"]
    )
    w2 = np.asarray(
        r2.gen_state.params["decoder"]["step"]["word_restore"]["kernel"]
    )
    np.testing.assert_allclose(w1, w2)
    r2.train()  # continues at epoch 1
    assert ckpt.latest_epoch(cfg2.checkpoint_dir) == 1
