"""Two-LSTM attentional decoder.

Parity with `models/layer.py:276-602` (Decoder): per step, a query LSTMCell over
[lang_h, global_feat, word], a single-query attention over the object proposals
(+ a second one over motion proposals when multi_modal), a language LSTMCell over
[context(, context2), query], and tanh(LN(lang_h)) -> vocab logits. Scheduled
sampling draws ONE coin per timestep for the whole batch (layer.py:432).

TPU design:
- the 26-step sequential loop is a single `lax.scan` (lifted `nn.scan`) instead
  of a Python loop — one compilation, fused steps;
- ALL loop-invariant work is hoisted out of the scan: the attention K/V
  projections of the proposal tensors and the global-feature slice of the query
  LSTM's input projection are computed ONCE (`DecoderStep.precompute`) — the
  reference recomputes them all 26 times (layer.py:574-585). This removes ~40%
  of the per-step FLOPs from decode, the teacher-forced training scan, and its
  backward;
- beam search decodes all `B*beam` hypotheses in ONE batched step call
  (vs. the reference's per-beam Python loop, layer.py:521-551);
- the vocab projection is one [B, H] x [H, V] matmul per step — MXU work.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.models.layers import AttentionShare
from dlsg_tpu.ops.lstm import LSTMCell, SplitInputLSTMCell
from dlsg_tpu.vocab import START_ID


class DecoderStep(nn.Module):
    """One decoding step; holds all per-step parameters.

    `decode` mirrors `Decoder.decode` (layer.py:569-602): note the reference
    applies dropout to lang_h *before* storing it as the recurrent state, so the
    dropped activation feeds both the logits and the next step (layer.py:593-599).
    """

    cfg: DLSGConfig
    vocab_size: int
    multi_modal: bool = True
    baseline: bool = False

    def setup(self):
        cfg = self.cfg
        self.word_embed = nn.Embed(self.vocab_size, cfg.word_size, name="word_embed")
        self.word_drop = nn.Dropout(cfg.dropout)
        # query LSTM input = [lang_h, word | global_feat]: the global part is
        # loop-invariant and precomputed (SplitInputLSTMCell docstring)
        self.query_lstm = SplitInputLSTMCell(
            cfg.query_hidden_size, dtype=cfg.cdtype, name="query_lstm"
        )
        self.query_ln = nn.LayerNorm(name="query_lstm_layernorm")
        self.query_drop = nn.Dropout(cfg.dropout)
        self.context_att = AttentionShare(
            cfg.visual_hidden_size,
            cfg.query_hidden_size,
            cfg.visual_hidden_size,
            dtype=cfg.cdtype,
            name="context_att",
        )
        if self.multi_modal:
            self.context_att_2 = AttentionShare(
                cfg.visual_hidden_size,
                cfg.query_hidden_size,
                cfg.visual_hidden_size,
                dtype=cfg.cdtype,
                name="context_att_2",
            )
        self.lang_lstm = LSTMCell(cfg.decode_hidden_size, dtype=cfg.cdtype, name="lang_lstm")
        self.lang_ln = nn.LayerNorm(name="lang_lstm_layernorm")
        self.lang_drop = nn.Dropout(cfg.dropout)
        self.word_restore = nn.Dense(
            self.vocab_size,
            kernel_init=nn.initializers.xavier_normal(),
            dtype=cfg.cdtype,
            name="word_restore",
        )

    def precompute(self, feats, feats2, global_feat):
        """All loop-invariant projections, computed once per sequence.

        Returns a dict of tensors that ride through the scan as constants:
        attention K/V for each branch and the global-feature part of the query
        LSTM's input projection.
        """
        pre = {"gw": self.query_lstm.project_static(global_feat)}
        pre["K1"], pre["V1"] = self.context_att.precompute(feats)
        if self.multi_modal:
            pre["K2"], pre["V2"] = self.context_att_2.precompute(feats2)
        return pre

    def decode_hidden(
        self,
        word,
        query_h,
        query_c,
        lang_h,
        lang_c,
        pre,
        deterministic: bool = True,
    ):
        """The step chain up to (but excluding) the vocab projection.

        Returns (decoder_output [B, Hd], q_h, q_c, l_h, l_c, alpha). Split out
        so the fused vocab-head kernel (ops/pallas/vocab_head.py) can consume
        decoder_output directly without materializing [B, V] logits.
        """
        q_h, q_c = self.query_lstm(
            jnp.concatenate([lang_h, word], axis=-1), pre["gw"], query_h, query_c
        )
        query_current = self.query_drop(self.query_ln(q_h), deterministic=deterministic)
        context, alpha = self.context_att.attend(
            pre["K1"], pre["V1"], query_current, deterministic
        )
        if self.multi_modal:
            context2, alpha2 = self.context_att_2.attend(
                pre["K2"], pre["V2"], query_current, deterministic
            )
            lang_input = jnp.concatenate([context, context2, query_current], axis=-1)
            alpha = jnp.concatenate([alpha, alpha2], axis=1)  # [B, 2P]
        else:
            lang_input = jnp.concatenate([context, query_current], axis=-1)
        l_h, l_c = self.lang_lstm(lang_input, lang_h, lang_c)
        l_h = self.lang_drop(l_h, deterministic=deterministic)
        decoder_output = jnp.tanh(self.lang_ln(l_h))
        return decoder_output, q_h, q_c, l_h, l_c, alpha

    def decode(
        self,
        word,
        query_h,
        query_c,
        lang_h,
        lang_c,
        pre,
        deterministic: bool = True,
    ):
        decoder_output, q_h, q_c, l_h, l_c, alpha = self.decode_hidden(
            word, query_h, query_c, lang_h, lang_c, pre, deterministic
        )
        word_logits = self.word_restore(decoder_output).astype(jnp.float32)
        return word_logits, q_h, q_c, l_h, l_c, alpha

    def __call__(self, carry, x, collect_logits: bool = True, deterministic: bool = True):
        """Scanned step: embed current token, decode, pick the next token.

        carry = (word_id, qh, qc, lh, lc, pre)
        x     = (gold_token [B], tf_coin scalar bool)
        """
        (word_id, qh, qc, lh, lc, pre) = carry
        gold, coin = x
        word = self.word_embed(word_id)
        word = self.word_drop(word, deterministic=deterministic)
        logits, qh, qc, lh, lc, alpha = self.decode(
            word, qh, qc, lh, lc, pre, deterministic=deterministic
        )
        greedy_id = jnp.argmax(logits, axis=-1)
        next_id = jnp.where(coin, gold, greedy_id)
        new_carry = (next_id, qh, qc, lh, lc, pre)
        if collect_logits:
            return new_carry, (logits, alpha)
        return new_carry, (greedy_id, alpha)


class Decoder(nn.Module):
    """Sequence-level decoder: teacher-forced training or greedy inference.

    __call__ mirrors `Decoder.forward` (layer.py:394-462) for the non-beam paths;
    beam decoding is driven externally by `dlsg_tpu.ops.beam_search` through the
    `beam_step` method.
    """

    cfg: DLSGConfig
    vocab_size: int
    multi_modal: bool = True
    baseline: bool = False

    def setup(self):
        self.step = DecoderStep(
            self.cfg, self.vocab_size, self.multi_modal, self.baseline, name="step"
        )

    def _global_feat(self, feats, feats2):
        """global = mean over proposals; cat of both branches when multi-modal
        (layer.py:407-410)."""
        g = jnp.mean(feats, axis=1)
        if feats2 is not None:
            g = jnp.concatenate([g, jnp.mean(feats2, axis=1)], axis=-1)
        return g

    def _precompute(self, feats, feats2):
        cfg = self.cfg
        B = feats.shape[0]
        global_feat = self._global_feat(feats, feats2)
        if feats2 is None:
            feats2 = jnp.zeros((B, 1, cfg.visual_hidden_size), feats.dtype)
        return self.step.precompute(feats, feats2, global_feat)

    def _init_state(self, feats):
        cfg = self.cfg
        B = feats.shape[0]
        qh = jnp.zeros((B, cfg.query_hidden_size), jnp.float32)
        qc = jnp.zeros_like(qh)
        lh = jnp.zeros((B, cfg.decode_hidden_size), jnp.float32)
        lc = jnp.zeros_like(lh)
        return qh, qc, lh, lc

    def __call__(
        self,
        feats,
        captions: Optional[jnp.ndarray],
        teacher_forcing_ratio: float = 1.0,
        feats2: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher-forced training (captions given) or greedy decode (None).

        Returns (outputs, alpha_all):
          train : outputs [B, T, V] logits, alpha_all [B, T, 2P]
          greedy: outputs [B, T] token ids, alpha_all [B, T, 2P]
        """
        T = self.cfg.max_words
        B = feats.shape[0]
        infer = captions is None
        pre = self._precompute(feats, feats2)
        qh, qc, lh, lc = self._init_state(feats)
        word_id = jnp.full((B,), START_ID, jnp.int32)
        carry = (word_id, qh, qc, lh, lc, pre)

        if infer:
            gold = jnp.zeros((T, B), jnp.int32)
            coins = jnp.zeros((T,), bool)
        else:
            gold = jnp.swapaxes(captions[:, :T], 0, 1)  # [T, B]
            if deterministic:
                coins = jnp.ones((T,), bool)  # pure teacher forcing
            else:
                # one coin per timestep for the whole batch (layer.py:432)
                coins = jax.random.bernoulli(
                    self.make_rng("sample"), teacher_forcing_ratio, (T,)
                )

        collect = not infer
        scan = nn.scan(
            lambda mod, c, x: mod(c, x, collect_logits=collect, deterministic=deterministic),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0,
            out_axes=0,
        )
        if infer:
            _, (ids, alphas) = scan(self.step, carry, (gold, coins))
            outputs = jnp.swapaxes(ids, 0, 1)  # [B, T]
            alpha_all = jnp.swapaxes(alphas, 0, 1)  # [B, T, 2P] — real attention
            # weights at inference, like the reference's alpha_all return
            # (evaluate.py:69-70)
        else:
            _, (logits, alphas) = scan(self.step, carry, (gold, coins))
            outputs = jnp.swapaxes(logits, 0, 1)  # [B, T, V]
            alpha_all = jnp.swapaxes(alphas, 0, 1)  # [B, T, 2P]
        return outputs, alpha_all

    def beam_step(self, word_id, state, pre):
        """One beam-search step over the flattened [B*beam] group.

        state = dict(qh, qc, lh, lc); pre = the precomputed loop invariants
        (already expanded to the beam group). Returns (log_probs [G, V],
        new_state, alpha [G, 2P]). Replaces the reference's per-beam Python
        loop (layer.py:510-567) with one batched decode.
        """
        word = self.step.word_embed(word_id)
        logits, qh, qc, lh, lc, alpha = self.step.decode(
            word,
            state["qh"],
            state["qc"],
            state["lh"],
            state["lc"],
            pre,
            deterministic=True,
        )
        # raw logits: the beam driver runs top-k first and normalizes only the
        # selected values (ops/beam_search.py normalize=True), avoiding a full
        # [G, V] log_softmax materialization per step
        return logits, {"qh": qh, "qc": qc, "lh": lh, "lc": lc}, alpha

    def beam_step_hidden(self, word_id, state, pre):
        """Like `beam_step` but stops at the pre-projection hidden state.

        Returns (decoder_output [G, Hd], new_state, alpha [G, 2P]). The caller
        runs the vocab projection + top-k itself — the fused vocab-head kernel
        (ops/pallas/vocab_head.py) consumes decoder_output directly and never
        materializes the [G, V] logits the reference pays for per step
        (layer.py:540).
        """
        word = self.step.word_embed(word_id)
        decoder_output, q_h, q_c, l_h, l_c, alpha = self.step.decode_hidden(
            word,
            state["qh"],
            state["qc"],
            state["lh"],
            state["lc"],
            pre,
            deterministic=True,
        )
        return decoder_output, {"qh": q_h, "qc": q_c, "lh": l_h, "lc": l_c}, alpha

    def vocab_head_weights(self):
        """The vocab projection (kernel [Hd, V], bias [V]) in compute dtype,
        for the fused head. Fetched OUTSIDE the decode scan so the fp32->bf16
        cast runs once per decode, not once per step."""
        p = self.step.word_restore.variables["params"]
        return p["kernel"].astype(self.cfg.cdtype), p["bias"].astype(jnp.float32)

    def init_beam_state(self, feats, feats2):
        """Initial (state, pre) for beam search (layer.py:450-455)."""
        qh, qc, lh, lc = self._init_state(feats)
        state = {"qh": qh, "qc": qc, "lh": lh, "lc": lc}
        return state, self._precompute(feats, feats2)
