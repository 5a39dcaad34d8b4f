"""The fused decoder step (models/decoder.py decode_hidden) is an exact
reassociation of the reference per-step chain (layer.py:569-602): this test
recomputes one step naively from the raw parameters — separate ih/hh matmuls,
per-branch attention, flax LayerNorms — and requires the fused output to match
in fp32."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.models.decoder import Decoder
from dlsg_tpu.ops.lstm import lstm_gates

VOCAB = 40


def _ln(x, scale, bias, eps=1e-5):  # torch nn.LayerNorm default (LN_EPS)
    mu = x.mean(-1, keepdims=True)
    var = np.maximum((x * x).mean(-1, keepdims=True) - mu * mu, 0.0)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def test_fused_step_matches_naive_formula():
    cfg = tiny_test_config()
    B, P, VH = 3, cfg.num_proposals, cfg.visual_hidden_size
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, P, VH)), jnp.float32)
    feats2 = jnp.asarray(rng.normal(size=(B, P, VH)), jnp.float32)
    captions = jnp.asarray(rng.integers(4, VOCAB, size=(B, cfg.max_words)), jnp.int32)

    dec = Decoder(cfg, VOCAB, multi_modal=True)
    variables = dec.init(jax.random.PRNGKey(0), feats, captions, 1.0, feats2)
    state, pre = dec.apply(variables, feats, feats2, method=dec.init_beam_state)

    word_ids = jnp.asarray(rng.integers(4, VOCAB, size=(B,)), jnp.int32)
    # put nonzero state in to exercise the recurrent paths
    state = {k: jnp.asarray(rng.normal(size=v.shape) * 0.1, jnp.float32)
             for k, v in state.items()}

    logits, new_state, alpha = dec.apply(
        variables, word_ids, state, pre, method=dec.beam_step
    )

    # ---- naive recomputation from raw params ----
    p = jax.tree_util.tree_map(np.asarray, variables["params"]["step"])
    qh, qc = np.asarray(state["qh"]), np.asarray(state["qc"])
    lh, lc = np.asarray(state["lh"]), np.asarray(state["lc"])
    word = p["word_embed"]["embedding"][np.asarray(word_ids)]

    # query LSTM: dyn [lang_h, word] + static global + recurrent
    ql = p["query_lstm"]
    gates = (
        np.concatenate([lh, word], -1) @ ql["ih_dyn"]["kernel"]
        + ql["ih_dyn"]["bias"]
        + np.asarray(pre["gw"])
        + qh @ ql["w_hh"]
    )
    qh2, qc2 = map(np.asarray, lstm_gates(jnp.asarray(gates), jnp.asarray(qc)))
    qcur = _ln(qh2, p["query_lstm_layernorm"]["scale"], p["query_lstm_layernorm"]["bias"])

    ctxs = []
    alphas = []
    for branch, f in (("context_att", feats), ("context_att_2", feats2)):
        a = p[branch]
        K = np.asarray(f) @ a["K"]["kernel"]
        V = np.asarray(f) @ a["V"]["kernel"]
        q = qcur @ a["Q"]["kernel"]
        scores = np.einsum("bpv,bv->bp", K, q) / math.sqrt(VH)
        w = np.exp(scores - scores.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        ctx = np.einsum("bp,bpv->bv", w, V) @ a["out"]["kernel"]
        ctx = _ln(np.tanh(ctx), a["ln"]["scale"], a["ln"]["bias"])
        ctxs.append(ctx)
        alphas.append(w)

    lang_x = np.concatenate([ctxs[0], ctxs[1], qcur], -1)
    ll = p["lang_lstm"]
    gates2 = lang_x @ ll["ih"]["kernel"] + ll["ih"]["bias"] + lh @ ll["w_hh"]
    lh2, lc2 = map(np.asarray, lstm_gates(jnp.asarray(gates2), jnp.asarray(lc)))
    dec_out = np.tanh(_ln(lh2, p["lang_lstm_layernorm"]["scale"],
                          p["lang_lstm_layernorm"]["bias"]))
    ref_logits = dec_out @ p["word_restore"]["kernel"] + p["word_restore"]["bias"]

    np.testing.assert_allclose(np.asarray(new_state["qh"]), qh2, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_state["lh"]), lh2, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(alpha), np.concatenate(alphas, -1), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=3e-4)
