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

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.models.layers import AttentionShare, LN_EPS
from dlsg_tpu.ops.lstm import LSTMCell, SplitInputLSTMCell, lstm_gates
from dlsg_tpu.ops.quant import qmatmul, quantize_per_col
from dlsg_tpu.vocab import START_ID


# `pre` keys with a leading batch axis (expanded to [B*beam] for beam search);
# every other key is a fused weight shared by all hypotheses
BATCH_PRE_KEYS = ("gw", "K", "V")


def expand_pre_to_beams(pre, beam_size: int):
    """Expand only the batch-axis leaves of `pre` to the beam group; the fused
    weight stacks (Wq/Wl/WQ/WO/Wv/...) are hypothesis-independent."""
    return {
        k: (jnp.repeat(v, beam_size, axis=0) if k in BATCH_PRE_KEYS else v)
        for k, v in pre.items()
    }


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
        self.query_ln = nn.LayerNorm(epsilon=LN_EPS, name="query_lstm_layernorm")
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
        self.lang_ln = nn.LayerNorm(epsilon=LN_EPS, name="lang_lstm_layernorm")
        self.lang_drop = nn.Dropout(cfg.dropout)
        self.word_restore = nn.Dense(
            self.vocab_size,
            kernel_init=nn.initializers.xavier_normal(),
            dtype=cfg.cdtype,
            name="word_restore",
        )

    def precompute(self, feats, feats2, global_feat, quant: bool = False):
        """All loop-invariant work, computed once per sequence.

        Beyond the attention K/V projections and the static slice of the query
        LSTM's input projection, this builds the FUSED per-step weights —
        `[W_ih; W_hh]` stacks for both LSTM cells, the two attention branches'
        Q kernels side by side, their out kernels and LayerNorm affines
        stacked on a branch axis, and the bf16-cast vocab projection — so the
        scanned step runs ~5 large matmuls instead of ~12 small ones and every
        fp32->bf16 weight cast happens here, once, not 26 times inside the
        scan. All stacks are exact reassociations of the unchanged parameters
        (concat-matmul == sum of split matmuls; batched == independent), so
        the parameter tree, checkpoints, and the torch transliterator
        (convert.py) are untouched.
        """
        cfg = self.cfg
        pre = {"gw": self.query_lstm.project_static(global_feat)}
        K1, V1 = self.context_att.precompute(feats)
        atts = [self.context_att]
        Ks, Vs = [K1], [V1]
        if self.multi_modal:
            K2, V2 = self.context_att_2.precompute(feats2)
            atts.append(self.context_att_2)
            Ks.append(K2)
            Vs.append(V2)
        # [B, NB, P, VH] — branch axis for batched attention
        pre["K"] = jnp.stack(Ks, axis=1)
        pre["V"] = jnp.stack(Vs, axis=1)

        cd = cfg.cdtype
        # query LSTM: [lang_h, word, qh] @ Wq in one matmul
        pre["Wq"], pre["bq"] = self.query_lstm.fused_weights(
            cfg.decode_hidden_size + cfg.word_size
        )
        if quant:
            pre["Wq"] = quantize_per_col(pre["Wq"])
        # lang LSTM: [ctx..., query, lang_h] @ Wl in one matmul
        nb = len(atts)
        pre["Wl"], pre["bl"] = self.lang_lstm.fused_weights(
            nb * cfg.visual_hidden_size + cfg.query_hidden_size
        )
        if quant:
            pre["Wl"] = quantize_per_col(pre["Wl"])
        # attention per-step weights, branch-stacked
        sw = [a.step_weights() for a in atts]
        pre["WQ"] = jnp.concatenate([w[0] for w in sw], axis=1).astype(cd)  # [QH, NB*VH]
        pre["WO"] = jnp.stack([w[1] for w in sw], axis=0).astype(cd)  # [NB, VH, VH]
        pre["ln_scale"] = jnp.stack([w[2] for w in sw], axis=0)  # [NB, VH]
        pre["ln_bias"] = jnp.stack([w[3] for w in sw], axis=0)
        # vocab head, cast once
        if self.is_initializing():
            _ = self.word_restore(jnp.zeros((1, cfg.decode_hidden_size), jnp.float32))
        wr = self.word_restore.variables["params"]
        pre["Wv"] = (
            quantize_per_col(wr["kernel"]) if quant else wr["kernel"].astype(cd)
        )
        pre["bv"] = wr["bias"].astype(jnp.float32)
        # force the fused stacks to MATERIALIZE here, outside the decode scan:
        # without the barrier XLA sinks the cheap-looking concat(cast(...))
        # producers into the loop and rebuilds ~110 MB of fused weights on
        # every one of the 26 steps
        return jax.lax.optimization_barrier(pre)

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

        Fused form of the reference's per-step chain (layer.py:569-602): the
        two LSTM cells each run as ONE `[x, h] @ W` matmul against the stacked
        kernels from `precompute`, the two attention branches' Q projections,
        score/context einsums, out projections, and LayerNorms run batched
        over a branch axis, and no weight cast happens inside the step. The
        math is an exact reassociation of the unfused chain (same params, same
        results up to fp32 rounding); measured 2.4x on the 26-step scan at
        G=640 on a v5e (scripts/bisect_results.jsonl chain_split vs merged).

        NB: in training, the merged attention dropout draws ONE mask over
        [B, NB, VH] where the reference draws one per branch — distribution-
        identical, different stream.

        Returns (decoder_output [B, Hd], q_h, q_c, l_h, l_c, alpha [B, NB*P]).
        """
        cd = self.cfg.cdtype
        B = word.shape[0]
        nb = 2 if self.multi_modal else 1
        vh = self.cfg.visual_hidden_size

        def _mm(x, W):
            # fused weights are either a plain kernel or an int8 (q, scale)
            # pair (cfg.decode_quant='int8'; ops/quant.py)
            if isinstance(W, tuple):
                return qmatmul(x, *W)
            return jnp.dot(x.astype(cd), W, preferred_element_type=jnp.float32)

        # query LSTM: one matmul over [lang_h, word, qh_prev]
        x = jnp.concatenate([lang_h, word, query_h], axis=-1)
        gates = _mm(x, pre["Wq"]) + pre["bq"] + pre["gw"].astype(jnp.float32)
        q_h, q_c = lstm_gates(gates, query_c, cd)
        query_current = self.query_drop(self.query_ln(q_h), deterministic=deterministic)

        # the Q projections of both branches run as ONE matmul; everything
        # after stays PER BRANCH — a branch-batched (bnpv) einsum form
        # measured +4.1 ms/26 steps over the sliced form on a v5e
        # (scripts/bisect_results.jsonl cp_L3 vs cp_L4)
        q12 = jnp.dot(
            query_current.astype(cd), pre["WQ"], preferred_element_type=jnp.float32
        )
        ctxs, alphas = [], []
        for n in range(nb):
            qn = q12[:, n * vh : (n + 1) * vh]
            Kn = pre["K"][:, n]
            Vn = pre["V"][:, n]
            scores = jnp.einsum(
                "bpv,bv->bp", Kn, qn, preferred_element_type=jnp.float32
            ) / math.sqrt(vh)
            an = jax.nn.softmax(scores, axis=-1)  # softmax over proposals
            cn = jnp.einsum(
                "bp,bpv->bv", an.astype(Vn.dtype), Vn,
                preferred_element_type=jnp.float32,
            )
            cn = jnp.dot(cn.astype(cd), pre["WO"][n], preferred_element_type=jnp.float32)
            cn = jnp.tanh(cn)
            mu = jnp.mean(cn, axis=-1, keepdims=True)
            var = jnp.maximum(jnp.mean(cn * cn, axis=-1, keepdims=True) - mu * mu, 0.0)
            cn = (cn - mu) * jax.lax.rsqrt(var + LN_EPS)
            cn = cn * pre["ln_scale"][n][None] + pre["ln_bias"][n][None]
            ctxs.append(cn)
            alphas.append(an)
        ctx = jnp.concatenate(ctxs, axis=-1) if nb > 1 else ctxs[0]
        alpha = jnp.concatenate(alphas, axis=-1) if nb > 1 else alphas[0]
        ctx = self.context_att.drop(ctx, deterministic=deterministic)

        # lang LSTM: one matmul over [ctx..., query, lang_h]
        lang_x = jnp.concatenate([ctx, query_current, lang_h], axis=-1)
        gates2 = _mm(lang_x, pre["Wl"]) + pre["bl"]
        l_h, l_c = lstm_gates(gates2, lang_c, cd)
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
        if isinstance(pre["Wv"], tuple):
            word_logits = qmatmul(decoder_output, *pre["Wv"]) + pre["bv"]
        else:
            word_logits = jnp.dot(
                decoder_output.astype(self.cfg.cdtype), pre["Wv"],
                preferred_element_type=jnp.float32,
            ) + pre["bv"]
        return word_logits, q_h, q_c, l_h, l_c, alpha

    def __call__(self, carry, x, pre=None, collect_logits: bool = True, deterministic: bool = True):
        """Scanned step: embed current token, decode, pick the next token.

        carry = (word_id, qh, qc, lh, lc); `pre` (the loop invariants) rides
        as a scan closure constant, not carry — XLA then knows it never
        changes across the 26 steps.
        x     = (gold_token [B], tf_coin scalar bool)
        """
        (word_id, qh, qc, lh, lc) = carry
        gold, coin = x
        word = self.word_embed(word_id)
        word = self.word_drop(word, deterministic=deterministic)
        logits, qh, qc, lh, lc, alpha = self.decode(
            word, qh, qc, lh, lc, pre, deterministic=deterministic
        )
        greedy_id = jnp.argmax(logits, axis=-1)
        next_id = jnp.where(coin, gold, greedy_id)
        new_carry = (next_id, qh, qc, lh, lc)
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

    def _precompute(self, feats, feats2, quant: bool = False):
        cfg = self.cfg
        B = feats.shape[0]
        global_feat = self._global_feat(feats, feats2)
        if feats2 is None:
            feats2 = jnp.zeros((B, 1, cfg.visual_hidden_size), feats.dtype)
        return self.step.precompute(feats, feats2, global_feat, quant)

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
        # int8 quantized matmuls at INFERENCE only (decode_quant='int8')
        quant = infer and getattr(self.cfg, "decode_quant", "none") == "int8"
        pre = self._precompute(feats, feats2, quant)
        qh, qc, lh, lc = self._init_state(feats)
        word_id = jnp.full((B,), START_ID, jnp.int32)
        carry = (word_id, qh, qc, lh, lc)

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
        body = lambda mod, c, x: mod(
            c, x, pre=pre, collect_logits=collect, deterministic=deterministic
        )
        # rematerialization policy for the TRAINING scan's backward: 'dots'
        # saves only matmul outputs (recomputing elementwise chains in the
        # backward), 'full' recomputes the whole step. Inference never
        # differentiates, so remat would only add overhead there.
        remat = getattr(self.cfg, "decoder_remat", "none")
        if not infer and remat != "none":
            policy = (
                jax.checkpoint_policies.dots_saveable
                if remat == "dots"
                else jax.checkpoint_policies.nothing_saveable
            )
            body = nn.remat(body, policy=policy, prevent_cse=False)
        scan = nn.scan(
            body,
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
        quant = getattr(self.cfg, "decode_quant", "none") == "int8"
        return state, self._precompute(feats, feats2, quant)
