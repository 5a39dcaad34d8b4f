"""Reference-checkpoint transliteration (dlsg_tpu/convert.py).

Two layers of evidence, as real reference checkpoints are unavailable here:
1. shape/naming round-trip — a randomly initialized torch-layout state_dict
   (the exact key set CapGnnModel/DiscV2 produce, run_gun.py:302-310) converts
   into pytrees structurally identical to `model.init`'s;
2. numeric — the LSTM/LSTMCell/split-query-LSTM transform rules are validated
   against torch's own kernels on random inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.convert import (
    convert_capgnn_state_dict,
    convert_discv2_state_dict,
)

VOCAB = 50


def _linear(sd, key, fin, fout, bias=True, rng=None):
    sd[f"{key}.weight"] = rng.normal(size=(fout, fin)).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = rng.normal(size=(fout,)).astype(np.float32)


def _ln(sd, key, d, rng):
    sd[f"{key}.weight"] = rng.normal(size=(d,)).astype(np.float32)
    sd[f"{key}.bias"] = rng.normal(size=(d,)).astype(np.float32)


def _lstm_cell(sd, key, fin, h, rng):
    sd[f"{key}.weight_ih"] = rng.normal(size=(4 * h, fin)).astype(np.float32)
    sd[f"{key}.weight_hh"] = rng.normal(size=(4 * h, h)).astype(np.float32)
    sd[f"{key}.bias_ih"] = rng.normal(size=(4 * h,)).astype(np.float32)
    sd[f"{key}.bias_hh"] = rng.normal(size=(4 * h,)).astype(np.float32)


def _lstm_seq(sd, key, fin, h, rng, reverse=False):
    sfx = "_reverse" if reverse else ""
    sd[f"{key}.weight_ih_l0{sfx}"] = rng.normal(size=(4 * h, fin)).astype(np.float32)
    sd[f"{key}.weight_hh_l0{sfx}"] = rng.normal(size=(4 * h, h)).astype(np.float32)
    sd[f"{key}.bias_ih_l0{sfx}"] = rng.normal(size=(4 * h,)).astype(np.float32)
    sd[f"{key}.bias_hh_l0{sfx}"] = rng.normal(size=(4 * h,)).astype(np.float32)


def _att_share(sd, key, vin, kin, out, rng):
    _linear(sd, f"{key}.K", vin, out, bias=False, rng=rng)
    _linear(sd, f"{key}.Q", kin, out, bias=False, rng=rng)
    _linear(sd, f"{key}.V", vin, out, bias=False, rng=rng)
    _linear(sd, f"{key}.output_layer.0", out, out, bias=False, rng=rng)
    _ln(sd, f"{key}.output_layer.2", out, rng)


def _self_att(sd, key, fin, att, out, rng):
    _linear(sd, f"{key}.K", fin, att, bias=False, rng=rng)
    _linear(sd, f"{key}.Q", fin, att, bias=False, rng=rng)
    _linear(sd, f"{key}.V", fin, att, bias=False, rng=rng)
    _linear(sd, f"{key}.output_layer.0", att, out, bias=False, rng=rng)


def _latent_psl(sd, key, d, p, rng):
    sd[f"{key}.theta"] = rng.normal(size=(p, d)).astype(np.float32)
    _ln(sd, f"{key}.out_norm.1", d, rng)


def _graph_tun(sd, key, cfg, vin, use_embed, rng):
    H = cfg.visual_hidden_size
    if use_embed:
        _linear(sd, f"{key}.visual_embed", vin, H, rng=rng)
    _ln(sd, f"{key}.visual_norm.1", H, rng)
    if cfg.num_obj > 4:
        _linear(sd, f"{key}.obj_embed", cfg.region_feature_size,
                cfg.region_projected_size, rng=rng)
        _ln(sd, f"{key}.obj_norm.1", cfg.region_projected_size, rng)
        _ln(sd, f"{key}.obj_visual_norm.1", H, rng)
    _latent_psl(sd, f"{key}.v2l_layer", H, cfg.num_proposals, rng)
    # dead in the reference forward; real checkpoints contain it, the
    # converter must ignore it (layer.py:166 att_l2l_norm)
    _ln(sd, f"{key}.att_l2l_norm", H, rng)


def _reference_capgnn_sd(cfg, rng):
    """The exact key set of the reference CapGnnModel.state_dict()."""
    sd = {}
    H = cfg.visual_hidden_size
    feat = cfg.a_feature_size + cfg.m_feature_size
    _graph_tun(sd, "encoder.obj_encoder", cfg, cfg.a_feature_size, True, rng)
    # motion_pre_encoder: EncoderVisual (layer.py:7-61)
    _linear(sd, "encoder.motion_pre_encoder.linear_embed", feat, H, rng=rng)
    _lstm_seq(sd, "encoder.motion_pre_encoder.lstm", H, H, rng)
    _lstm_seq(sd, "encoder.motion_pre_encoder.lstm", H, H, rng, reverse=True)
    _ln(sd, "encoder.motion_pre_encoder.layernorm_lstm", 2 * H, rng)
    _self_att(sd, "encoder.motion_pre_encoder.self_attention", 2 * H, 2 * H, H, rng)
    _ln(sd, "encoder.motion_pre_encoder.layernorm_sa", H, rng)
    _graph_tun(sd, "encoder.motion_encoder", cfg, H, False, rng)
    # decoder (layer.py:276-346)
    sd["decoder.word_embed.weight"] = rng.normal(size=(VOCAB, cfg.word_size)).astype(np.float32)
    qin = cfg.decode_hidden_size + 2 * H + cfg.word_size
    _lstm_cell(sd, "decoder.query_lstm", qin, cfg.query_hidden_size, rng)
    _ln(sd, "decoder.query_lstm_layernorm", cfg.query_hidden_size, rng)
    lin = 2 * H + cfg.query_hidden_size
    _lstm_cell(sd, "decoder.lang_lstm", lin, cfg.decode_hidden_size, rng)
    _ln(sd, "decoder.lang_lstm_layernorm", cfg.decode_hidden_size, rng)
    _att_share(sd, "decoder.context_att", H, cfg.query_hidden_size, H, rng)
    _att_share(sd, "decoder.context_att_2", H, cfg.query_hidden_size, H, rng)
    _linear(sd, "decoder.word_restore", cfg.decode_hidden_size, VOCAB, rng=rng)
    # dead decoder params present in real checkpoints (layer.py:334)
    _ln(sd, "decoder.context_layernorm", cfg.decode_hidden_size, rng)
    return sd


def _tree_shapes(tree):
    return {
        jax.tree_util.keystr(path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_capgnn_round_trip_structure(tiny_cfg):
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = tiny_cfg
    rng = np.random.default_rng(0)
    sd = _reference_capgnn_sd(cfg, rng)
    converted = convert_capgnn_state_dict(sd, cfg)

    model = CapGnnModel(cfg, VOCAB)
    B = 2
    frames = jnp.zeros((B, cfg.max_frames, cfg.feature_size))
    regions = jnp.zeros((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    captions = jnp.zeros((B, cfg.max_words), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), frames, regions, captions)

    assert _tree_shapes(converted) == _tree_shapes(init)

    # the converted params must actually run
    out = model.apply(converted, frames, regions, captions)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_discv2_round_trip_structure(tiny_cfg):
    from dlsg_tpu.models.discriminator import DiscV2

    cfg = tiny_cfg
    dim = 16
    rng = np.random.default_rng(1)
    H = cfg.visual_hidden_size
    sd = {}
    sd["conv1d.weight"] = rng.normal(size=(dim, VOCAB, 1)).astype(np.float32)
    sd["conv1d.bias"] = rng.normal(size=(dim,)).astype(np.float32)
    sd["block.0.res_block.1.weight"] = rng.normal(size=(dim, dim, 3)).astype(np.float32)
    sd["block.0.res_block.1.bias"] = rng.normal(size=(dim,)).astype(np.float32)
    _lstm_seq(sd, "lstm", dim, dim, rng)
    _ln(sd, "layer_norm", dim, rng)
    _self_att(sd, "att", dim, dim, dim, rng)
    _ln(sd, "att_norm.1", dim, rng)
    for k in ("obj_psl_score", "motion_psl_score"):
        _linear(sd, f"{k}.psl_embed.0", H, dim, rng=rng)
        _ln(sd, f"{k}.psl_embed.2", dim, rng)
        _linear(sd, f"{k}.att_norm.0", dim, dim, rng=rng)
        _ln(sd, f"{k}.att_norm.2", dim, rng)
        _ln(sd, f"{k}.psl_norm.1", dim, rng)
        _linear(sd, f"{k}.psl_scorer.classify", dim, 1, rng=rng)
        _linear(sd, f"{k}.psl_scorer.visual_embed.0", dim, dim, rng=rng)
        _linear(sd, f"{k}.psl_scorer.sent_embed.0", dim, dim, rng=rng)
    _latent_psl(sd, "text_sum", dim, 1, rng)
    sd["fusion"] = rng.normal(size=(2, dim)).astype(np.float32)

    converted = convert_discv2_state_dict(sd, cfg)

    disc = DiscV2(cfg, VOCAB, dim=dim)
    B, T, P, K = 2, cfg.max_words, cfg.num_proposals, cfg.num_topk
    inputs = jnp.zeros((B, T, VOCAB))
    obj = jnp.zeros((B, P, H))
    mot = jnp.zeros((B, P, H))
    att_mask = jnp.ones((B, T, T))
    alpha = jnp.ones((B, T, 2 * P)) / (2 * P)
    init = disc.init(jax.random.PRNGKey(0), inputs, obj, mot, att_mask, alpha)
    assert _tree_shapes(converted) == _tree_shapes(init)

    out = disc.apply(converted, inputs, obj, mot, att_mask, alpha)
    assert np.all(np.isfinite(np.asarray(out)))


def test_lstm_cell_numeric_vs_torch():
    """The LSTMCell transform reproduces torch.nn.LSTMCell exactly."""
    torch = pytest.importorskip("torch")
    from dlsg_tpu.convert import _lstm_cell
    from dlsg_tpu.ops.lstm import lstm_step

    fin, h, B = 12, 8, 4
    cell = torch.nn.LSTMCell(fin, h)
    sd = {f"c.{k}": v for k, v in cell.state_dict().items()}
    ours = _lstm_cell(sd, "c")

    x = np.random.default_rng(2).normal(size=(B, fin)).astype(np.float32)
    h0 = np.random.default_rng(3).normal(size=(B, h)).astype(np.float32)
    c0 = np.random.default_rng(4).normal(size=(B, h)).astype(np.float32)
    with torch.no_grad():
        th, tc = cell(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))

    xw = x @ ours["ih"]["kernel"] + ours["ih"]["bias"]
    jh, jc = lstm_step(jnp.asarray(xw), jnp.asarray(h0), jnp.asarray(c0),
                       jnp.asarray(ours["w_hh"]))
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-5)


def test_bilstm_numeric_vs_torch():
    """The nn.LSTM transform reproduces torch's bidirectional LSTM output."""
    torch = pytest.importorskip("torch")
    from dlsg_tpu.convert import _bilstm
    from dlsg_tpu.ops.lstm import BiLSTM

    fin = h = 8
    B, T = 3, 6
    lstm = torch.nn.LSTM(fin, h, batch_first=True, bidirectional=True)
    sd = {f"l.{k}": v for k, v in lstm.state_dict().items()}
    ours = _bilstm(sd, "l")

    x = np.random.default_rng(5).normal(size=(B, T, fin)).astype(np.float32)
    with torch.no_grad():
        tout, _ = lstm(torch.from_numpy(x))

    mod = BiLSTM(h)
    variables = {"params": {"fwd": jax.tree_util.tree_map(jnp.asarray, ours["fwd"]),
                            "bwd": jax.tree_util.tree_map(jnp.asarray, ours["bwd"])}}
    jout = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(jout), tout.numpy(), atol=1e-5)


def test_split_query_lstm_numeric_vs_torch(tiny_cfg):
    """The reference query LSTM over [lang_h, global, word] equals our
    SplitInputLSTMCell over dyn=[lang_h, word] + static(global) after the
    input-row re-slicing (convert._split_query_lstm)."""
    torch = pytest.importorskip("torch")
    from dlsg_tpu.convert import _split_query_lstm
    from dlsg_tpu.ops.lstm import SplitInputLSTMCell

    cfg = tiny_cfg
    hd, gf, ws, qh = (cfg.decode_hidden_size, 2 * cfg.visual_hidden_size,
                      cfg.word_size, cfg.query_hidden_size)
    B = 4
    cell = torch.nn.LSTMCell(hd + gf + ws, qh)
    sd = {f"q.{k}": v for k, v in cell.state_dict().items()}
    ours = _split_query_lstm(sd, "q", cfg)

    rng = np.random.default_rng(6)
    lang = rng.normal(size=(B, hd)).astype(np.float32)
    glob = rng.normal(size=(B, gf)).astype(np.float32)
    word = rng.normal(size=(B, ws)).astype(np.float32)
    h0 = rng.normal(size=(B, qh)).astype(np.float32)
    c0 = rng.normal(size=(B, qh)).astype(np.float32)
    with torch.no_grad():
        th, tc = cell(
            torch.from_numpy(np.concatenate([lang, glob, word], -1)),
            (torch.from_numpy(h0), torch.from_numpy(c0)),
        )

    mod = SplitInputLSTMCell(qh)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, ours)}
    xw_static = mod.apply(variables, jnp.asarray(glob), method=mod.project_static)
    jh, jc = mod.apply(
        variables,
        jnp.asarray(np.concatenate([lang, word], -1)),
        xw_static,
        jnp.asarray(h0),
        jnp.asarray(c0),
    )
    np.testing.assert_allclose(np.asarray(jh), th.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jc), tc.numpy(), atol=1e-5)


def test_cli_evaluate_torch_checkpoint(tiny_cfg, tmp_path):
    """End-to-end reference-user flow: `evaluate --torch_checkpoint x.pt`
    scores a reference-schema checkpoint through the transliterator."""
    torch = pytest.importorskip("torch")
    from dlsg_tpu.cli import main
    from dlsg_tpu.config import parse_opt
    from dlsg_tpu.data.synthetic import make_vocab

    c = tiny_cfg
    argv = [
        "--test_batch_size", "4",
        "--visual_hidden_size", str(c.visual_hidden_size),
        "--region_projected_size", str(c.region_projected_size),
        "--query_hidden_size", str(c.query_hidden_size),
        "--word_size", str(c.word_size),
        "--a_feature_size", str(c.a_feature_size),
        "--m_feature_size", str(c.m_feature_size),
        "--max_frames", str(c.max_frames),
        "--max_words", str(c.max_words),
        "--result_dir", str(tmp_path),
    ]
    # the EFFECTIVE config: the CLI re-applies per-dataset overrides
    # (decode_hidden/num_proposals/num_obj), parity with run_gun.py:31-40
    eff = parse_opt(argv)

    global VOCAB
    old_vocab = VOCAB
    VOCAB = len(make_vocab())  # the CLI's --synthetic vocab
    try:
        sd = _reference_capgnn_sd(eff, np.random.default_rng(3))
    finally:
        VOCAB = old_vocab
    pt = tmp_path / "ref_epoch.pt"
    torch.save({"epoch": 7, "model_state_dict": sd, "cap_list": np.zeros(3)}, str(pt))

    rc = main(["evaluate", "--synthetic", "--torch_checkpoint", str(pt)] + argv)
    assert rc == 0


def test_load_reference_checkpoint_rejects_arbitrary_pickles(tmp_path):
    """The converter ingests UNTRUSTED reference-trained .pt files: by default
    it must refuse pickle payloads outside the tensor/numpy allowlist instead
    of executing them (torch.load(weights_only=False) runs arbitrary code)."""
    torch = pytest.importorskip("torch")
    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.convert import load_reference_checkpoint

    class Payload:  # stands in for any attacker-controlled class
        def __reduce__(self):
            return (print, ("pwned",))

    pt = tmp_path / "evil.pt"
    torch.save({"model_state_dict": {}, "cap_list": Payload()}, str(pt))
    with pytest.raises(Exception) as ei:
        load_reference_checkpoint(str(pt), tiny_test_config())
    assert "pwned" not in str(ei.value)
