"""Full-model numerical parity against the ACTUAL reference network.

Imports the reference PyTorch source from /root/reference (torch CPU is
installed), instantiates the real `CapGnnModel` + `DiscV2`
(models/model.py:25-53,110-168, models/layer.py:276-602), runs teacher-forced
forward / discriminator scoring on random inputs, converts `state_dict()`
through `dlsg_tpu.convert`, and asserts the flax forward matches within fp32
tolerance — logits, proposals, alphas, and D scores — for both the msvd and
msr-vtt override shapes.

One harness retroactively verifies ~30 component rows of SURVEY.md §2 at once:
any systematic deviation (a LayerNorm eps, a softmax axis, a scale factor, a
transposed kernel) surfaces here as a concrete max-abs-diff.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

import jax

from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides
from dlsg_tpu.vocab import Vocabulary

pytestmark = pytest.mark.slow

REFERENCE_ROOT = "/root/reference"


def _import_reference_models():
    """Import the reference `models` package with an allennlp stub.

    The reference's beam-search module does `from allennlp.common.checks
    import ConfigurationError` (allennlp_beamsearch.py:12) and allennlp is not
    installed; only that exception class is ever used.
    """
    if "allennlp" not in sys.modules:
        allennlp = types.ModuleType("allennlp")
        common = types.ModuleType("allennlp.common")
        checks = types.ModuleType("allennlp.common.checks")

        class ConfigurationError(Exception):
            pass

        checks.ConfigurationError = ConfigurationError
        common.checks = checks
        allennlp.common = common
        sys.modules["allennlp"] = allennlp
        sys.modules["allennlp.common"] = common
        sys.modules["allennlp.common.checks"] = checks
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import models.model as ref_model  # noqa: PLC0415

    return ref_model


def _ref_args(cfg: DLSGConfig) -> SimpleNamespace:
    """The argparse-namespace view of a DLSGConfig that the reference modules
    consume (utils/opt.py fields referenced from models/layer.py)."""
    return SimpleNamespace(
        dataset=cfg.dataset,
        beam_size=cfg.beam_size,
        train_batch_size=cfg.train_batch_size,
        use_glove=False,
        use_visual_gan=cfg.use_visual_gan,
        dropout=cfg.dropout,
        visual_hidden_size=cfg.visual_hidden_size,
        region_projected_size=cfg.region_projected_size,
        num_proposals=cfg.num_proposals,
        num_obj=cfg.num_obj,
        num_topk=cfg.num_topk,
        word_size=cfg.word_size,
        query_hidden_size=cfg.query_hidden_size,
        decode_hidden_size=cfg.decode_hidden_size,
        max_words=cfg.max_words,
        max_frames=cfg.max_frames,
        a_feature_size=cfg.a_feature_size,
        m_feature_size=cfg.m_feature_size,
        region_feature_size=cfg.region_feature_size,
    )


def _tiny_vocab(n: int = 60) -> Vocabulary:
    words = ["<pad>", "<start>", "<end>", "<unk>"] + [f"w{i}" for i in range(n - 4)]
    return Vocabulary.from_words(words[4:])


def _rand_inputs(cfg: DLSGConfig, vocab_size: int, batch: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    frames = rng.randn(batch, cfg.max_frames, cfg.feature_size).astype(np.float32)
    regions = rng.randn(
        batch, cfg.max_frames, cfg.num_obj, cfg.region_feature_size
    ).astype(np.float32)
    captions = rng.randint(4, vocab_size, size=(batch, cfg.max_words)).astype(np.int64)
    captions[:, 0] = 1  # <start>
    lengths = rng.randint(5, cfg.max_words, size=(batch,))
    return frames, regions, captions, lengths


def _parity_cfg(dataset: str) -> DLSGConfig:
    """Real per-dataset dims (run_gun.py:31-40 overrides), fp32 compute."""
    return apply_dataset_overrides(
        DLSGConfig(dataset=dataset, compute_dtype="float32", train_batch_size=2)
    )


def _seq_mask(lengths, T):
    m = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)
    return m


@pytest.mark.parametrize("dataset", ["msvd", "msr-vtt"])
def test_capgnn_forward_matches_reference(dataset):
    import torch

    ref_model = _import_reference_models()
    cfg = _parity_cfg(dataset)
    vocab = _tiny_vocab()
    B = 2
    frames, regions, captions, _ = _rand_inputs(cfg, len(vocab), B, seed=7)

    torch.manual_seed(3)
    net = ref_model.CapGnnModel(_ref_args(cfg), vocab)
    net.eval()
    with torch.no_grad():
        t_out, t_obj, t_mot, t_alpha = net(
            torch.from_numpy(frames),
            torch.from_numpy(regions),
            torch.from_numpy(captions),
            cfg.max_words,
            1.0,  # random.random() < 1.0 always holds: pure teacher forcing
        )

    from dlsg_tpu.convert import convert_capgnn_state_dict
    from dlsg_tpu.models.generator import CapGnnModel

    variables = jax.tree_util.tree_map(
        np.asarray, convert_capgnn_state_dict(net.state_dict(), cfg)
    )
    model = CapGnnModel(cfg, len(vocab))
    j_out, j_obj, j_mot, j_alpha = model.apply(
        variables, frames, regions, captions.astype(np.int32), 1.0, True
    )

    for name, t, j, tol in [
        ("obj_proposals", t_obj, j_obj, 2e-5),
        ("motion_proposals", t_mot, j_mot, 2e-5),
        ("logits", t_out, j_out, 2e-4),
        ("alpha_all", t_alpha, j_alpha, 2e-5),
    ]:
        t = t.numpy()
        j = np.asarray(j)
        assert t.shape == j.shape, f"{name}: {t.shape} vs {j.shape}"
        diff = np.max(np.abs(t - j))
        assert diff < tol, f"{name}: max abs diff {diff} >= {tol}"


@pytest.mark.parametrize("dataset", ["msvd", "msr-vtt"])
def test_discv2_forward_matches_reference(dataset):
    import torch

    ref_model = _import_reference_models()
    cfg = _parity_cfg(dataset)
    vocab = _tiny_vocab()
    V = len(vocab)
    B, T, P = 2, cfg.max_words, cfg.num_proposals
    rng = np.random.RandomState(11)
    onehot = np.eye(V, dtype=np.float32)[
        rng.randint(0, V, size=(B, T))
    ]  # [B, T, V] one-hot real captions (run_gun.py:175 to_onehot)
    obj = rng.randn(B, P, cfg.visual_hidden_size).astype(np.float32)
    mot = rng.randn(B, P, cfg.visual_hidden_size).astype(np.float32)
    alpha = rng.rand(B, T, 2 * P).astype(np.float32)
    lengths = np.array([T - 3, 8])
    sm = _seq_mask(lengths, T)
    att_mask = sm[:, :, None] * sm[:, None, :]  # seq_mask^T . seq_mask (run_gun.py:164)

    torch.manual_seed(5)
    d_net = ref_model.DiscV2(_ref_args(cfg), V)
    d_net.eval()
    with torch.no_grad():
        t_score = d_net(
            torch.from_numpy(onehot),
            torch.from_numpy(obj),
            torch.from_numpy(mot),
            torch.from_numpy(att_mask),
            torch.from_numpy(alpha),
        )

    from dlsg_tpu.convert import convert_discv2_state_dict
    from dlsg_tpu.models.discriminator import DiscV2

    variables = jax.tree_util.tree_map(
        np.asarray, convert_discv2_state_dict(d_net.state_dict(), cfg)
    )
    j_score = DiscV2(cfg, V).apply(variables, onehot, obj, mot, att_mask, alpha, True)

    t = t_score.numpy()
    j = np.asarray(j_score)
    assert t.shape == j.shape, f"{t.shape} vs {j.shape}"
    diff = np.max(np.abs(t - j))
    assert diff < 2e-5, f"D score max abs diff {diff}"


def test_greedy_decode_matches_reference_tokens():
    """Greedy inference end-to-end: the emitted token ids must be IDENTICAL
    (argmax chains amplify any numeric drift into a different caption)."""
    import torch

    ref_model = _import_reference_models()
    cfg = _parity_cfg("msvd")
    vocab = _tiny_vocab()
    B = 2
    frames, regions, _, _ = _rand_inputs(cfg, len(vocab), B, seed=23)

    torch.manual_seed(9)
    net = ref_model.CapGnnModel(_ref_args(cfg), vocab)
    net.update_beam_size(1)
    net.eval()
    with torch.no_grad():
        t_ids, _, _, _ = net(
            torch.from_numpy(frames), torch.from_numpy(regions), None, cfg.max_words
        )

    from dlsg_tpu.convert import convert_capgnn_state_dict
    from dlsg_tpu.models.generator import CapGnnModel

    variables = jax.tree_util.tree_map(
        np.asarray, convert_capgnn_state_dict(net.state_dict(), cfg)
    )
    model = CapGnnModel(cfg, len(vocab))
    j_ids, _, _, _ = model.apply(variables, frames, regions, None)
    np.testing.assert_array_equal(t_ids.numpy(), np.asarray(j_ids))
