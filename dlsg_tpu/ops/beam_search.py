"""Batched beam search with static shapes.

Semantic parity with the vendored AllenNLP BeamSearch
(`models/allennlp_beamsearch.py:19-294`): first-step top-k expansion, per-node
beam, end-token forcing via a one-hot log-prob row once a beam emits `<end>`
(`:145-150,186-190`), backpointer state reordering (`:248-260`), and
backpointer-based sequence reconstruction (`:270-292`).

TPU redesign:
- the whole search is ONE `lax.scan` of `max_steps-1` fused steps — no Python
  loop, no early exit (sequences are fixed at 26 steps, so the "all beams ended"
  break (`:168-169`) is replaced by the end-forcing math which makes extra steps
  no-ops);
- each step calls `step_fn` once over the flattened [B*beam] group — the
  reference loops over beams in Python calling decode() per beam (layer.py:521);
- reconstruction is a reverse `lax.scan` over the backpointer stack;
- `top_k` runs on-device over [B, beam*per_node] — small and fast.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _expand_to_beams(x, beam_size):
    """[B, ...] -> [B*beam, ...] repeating each row beam_size times."""
    return jnp.repeat(x, beam_size, axis=0)


def beam_search(
    start_tokens: jnp.ndarray,
    init_state,
    step_fn: Callable,
    *,
    end_id: int,
    max_steps: int,
    beam_size: int,
    per_node_beam_size: int | None = None,
    normalize: bool = False,
    sparse_step: bool = False,
    fast_lse: bool = False,
    approx_topk_recall: float = 0.0,
    return_finished: bool = False,
    early_exit: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run beam search.

    Args:
      start_tokens: [B] int32 start token per sequence.
      init_state: pytree with leaves of shape [B, ...].
      step_fn: (tokens [G], state with [G,...] leaves) -> (log_probs [G, V], state)
        or (log_probs, state, aux) where `aux` is a [G, ...] array of per-step
        side outputs (e.g. attention weights); when present, the aux of each
        surviving beam is reconstructed through the backpointers and returned.
        With `normalize=True`, step_fn may return RAW logits instead.
        With `sparse_step=True`, step_fn instead returns
        (top_vals [G, pnbs], top_ids [G, pnbs], state[, aux]) — already
        log-softmax-normalized and sorted descending (the fused vocab-head
        kernel's contract, ops/pallas/vocab_head.py) — and the [G, V] logits
        never exist; pnbs must be >= beam_size.
      end_id: index of `<end>`.
      max_steps: total sequence length (reference: max_words=26).
      beam_size: beam width (reference default 5, opt.py:22).
      per_node_beam_size: candidates per beam node (reference sets = beam_size,
        layer.py:346).
      normalize: when True, top-k runs on the raw logits (ranking is invariant
        under the logsumexp shift) and only the selected values are normalized
        — this skips materializing a full [G, V] log_softmax per step, which
        the reference pays at layer.py:540.

    Returns:
      predictions [B, beam, max_steps] (sorted by log-prob, best first),
      log_probs   [B, beam],
      when step_fn emits aux, aux [B, beam, max_steps, ...],
      and, with `return_finished`, finished [B] bool — True iff ALL of the
      sequence's beams have emitted <end> (its result can no longer change
      with more steps; the two-pass early-exit decode keys off this).
    """
    pnbs = per_node_beam_size or beam_size
    B = start_tokens.shape[0]

    def _lse(lp, rowmax):
        """Row logsumexp over the raw logits. `fast_lse` skips the max-shift
        pass: one INDEPENDENT read of [G, V] that XLA fuses into the vocab
        matmul (measured: 6.72 -> 5.59 ms per 26 beam steps at G=640 on a
        v5e). Numerical bounds, documented: exact while logits lie in
        (-88, +80) fp32 — true by construction for tanh(LN(h)) @ xavier-W
        vocab heads; above +80 the clip caps the sum, and if EVERY logit is
        below ~-88 the sum underflows and the +1e-37 floor returns ~-85.2
        instead of -inf (within-row candidate ranking is unaffected either
        way — the row's lse is a shared constant). For out-of-distribution
        weights (quantized or externally converted checkpoints) the decode
        builder disables fast_lse and takes this exact branch.

        DO NOT "fix" this by shifting with the caller's top-k row max: that
        makes the lse DEPENDENT on top_k, and XLA's schedule for the step
        collapses — measured 106.6 ms vs 32.9 ms per decode and a 564 s
        compile (scripts/bisect_results.jsonl lse_ab_r3). `rowmax` stays a
        parameter only for the exact branch's potential reuse."""
        del rowmax
        if fast_lse:
            return jnp.log(jnp.sum(jnp.exp(jnp.minimum(lp, 80.0)), axis=-1) + 1e-37)
        return jax.nn.logsumexp(lp, axis=-1)

    def _topk(lp, kk):
        if approx_topk_recall:
            # TPU PartialReduce top-k over the wide [G, V] row. At
            # recall_target=1.0 (the default) the partial-reduce + aggregation
            # is EXACT and ~5% faster end-to-end than the sort-based TopK
            # custom call (BENCHMARKS.md round 5; candidate sets verified
            # identical on-chip incl. adversarial ties). recall < 1.0 may miss
            # a candidate with probability ~(1 - recall) — serving opt-in.
            return jax.lax.approx_max_k(
                lp, kk, recall_target=approx_topk_recall
            )
        return jax.lax.top_k(lp, kk)

    # ---- first step: B -> B*beam expansion (allennlp_beamsearch.py:107-160) ----
    out0 = step_fn(start_tokens, init_state)
    if sparse_step:
        vals0, ids0, state = out0[0], out0[1], out0[2]
        has_aux = len(out0) > 3
        aux0 = out0[3] if has_aux else None
        pnbs = vals0.shape[-1]
        assert pnbs >= beam_size, "sparse step must return >= beam_size candidates"
        start_top_lp = vals0[:, :beam_size]  # already normalized + sorted
        start_ids = ids0[:, :beam_size]
    else:
        log_probs0, state = out0[0], out0[1]
        has_aux = len(out0) > 2
        aux0 = out0[2] if has_aux else None  # [B, ...], shared by all first beams
        V = log_probs0.shape[-1]
        start_top_lp, start_ids = _topk(log_probs0, beam_size)  # [B, beam]
        if normalize:
            start_top_lp = start_top_lp - _lse(log_probs0, start_top_lp[:, 0])[:, None]
        # one-hot row forcing <end> after a finished beam
        # (allennlp_beamsearch.py:147-150)
        after_end_row = jnp.full((V,), -jnp.inf).at[end_id].set(0.0)
    last_log_probs = start_top_lp
    state = jax.tree_util.tree_map(lambda t: _expand_to_beams(t, beam_size), state)

    # top-k image of the forced-<end> row, used on the normalize/sparse paths
    forced_vals = jnp.full((pnbs,), -jnp.inf).at[0].set(0.0)
    forced_ids = jnp.full((pnbs,), end_id, jnp.int32)

    def step_math(carry):
        last_preds, last_lp, state = carry  # [B,beam], [B,beam], [B*beam,...]
        flat_preds = last_preds.reshape(B * beam_size)
        out = step_fn(flat_preds, state)  # [B*beam, V]
        ended = (flat_preds == end_id)[:, None]
        if sparse_step:
            vals, top_ids, new_state = out[0], out[1], out[2]
            aux = out[3].reshape(B, beam_size, *out[3].shape[1:]) if has_aux else ()
            top_lp = jnp.where(ended, forced_vals[None, :], vals)
            top_ids = jnp.where(ended, forced_ids[None, :], top_ids)
        elif normalize:
            lp, new_state = out[0], out[1]
            # aux is indexed by PARENT beam row (the row that was expanded)
            aux = out[2].reshape(B, beam_size, *out[2].shape[1:]) if has_aux else ()
            vals, top_ids = _topk(lp, pnbs)  # [B*beam, pnbs]
            vals = vals - _lse(lp, vals[:, 0])[:, None]
            top_lp = jnp.where(ended, forced_vals[None, :], vals)
            top_ids = jnp.where(ended, forced_ids[None, :], top_ids)
        else:
            lp, new_state = out[0], out[1]
            aux = out[2].reshape(B, beam_size, *out[2].shape[1:]) if has_aux else ()
            cleaned = jnp.where(ended, after_end_row[None, :], lp)
            top_lp, top_ids = jax.lax.top_k(cleaned, pnbs)  # [B*beam, pnbs]
        summed = top_lp + last_lp.reshape(B * beam_size, 1)
        reshaped = summed.reshape(B, beam_size * pnbs)
        reshaped_ids = top_ids.reshape(B, beam_size * pnbs)
        beam_lp, beam_idx = jax.lax.top_k(reshaped, beam_size)  # [B, beam]
        preds_t = jnp.take_along_axis(reshaped_ids, beam_idx, axis=1)
        backptr = beam_idx // pnbs  # ancestor beam (allennlp_beamsearch.py:242)

        # reorder state by backpointer (allennlp_beamsearch.py:248-260)
        def reorder(t):
            shaped = t.reshape(B, beam_size, *t.shape[1:])
            idx = backptr.reshape(B, beam_size, *([1] * (t.ndim - 1)))
            return jnp.take_along_axis(shaped, idx, axis=1).reshape(
                B * beam_size, *t.shape[1:]
            )

        new_state = jax.tree_util.tree_map(reorder, new_state)
        return (preds_t, beam_lp, new_state), (preds_t, backptr, aux)

    identity_ptr = jnp.tile(jnp.arange(beam_size)[None, :], (B, 1))

    def scan_body(carry, _):
        # EARLY EXIT (allennlp_beamsearch.py:168-169 "all beams ended ->
        # break"): once every hypothesis has emitted <end>, the forced-end
        # math makes further steps exact no-ops emitting (<end>, identity
        # backptr, unchanged scores) — skip the whole decoder step via
        # lax.cond. Real captions end well before max_words, so this removes
        # most of the loop's matmuls in production decodes. Post-end
        # attention aux is zero here (the full-compute path would emit the
        # decoder's post-<end> attention, which is meaningless anyway).
        # `early_exit=False` (sharded decode) drops the check entirely: with
        # last_preds sharded over a mesh, the jnp.all would force one
        # AllReduce per step in an otherwise collective-free map, and the
        # cond rarely pays under SPMD (all shards must agree to skip).
        if not early_exit:
            return step_math(carry)
        all_ended = jnp.all(carry[0] == end_id)

        def skip(carry):
            last_preds, last_lp, state = carry
            preds_t = jnp.full((B, beam_size), end_id, jnp.int32)
            if has_aux:
                aux = jnp.zeros(
                    (B, beam_size, *aux0.shape[1:]), aux0.dtype
                )
            else:
                aux = ()
            return (preds_t, last_lp, state), (preds_t, identity_ptr, aux)

        return jax.lax.cond(all_ended, skip, step_math, carry)

    (final_preds, final_lp, _final_state), (preds_seq, backptr_seq, aux_seq) = jax.lax.scan(
        scan_body,
        (start_ids, last_log_probs, state),
        None,
        length=max_steps - 1,
    )
    # preds_seq: [max_steps-1, B, beam]; backptr_seq: [max_steps-1, B, beam]

    # ---- reconstruction (allennlp_beamsearch.py:270-292) ----
    def recon_body(cur_ptr, xs):
        preds_t, backptr_t, aux_t = xs
        out = jnp.take_along_axis(preds_t, cur_ptr, axis=1)
        cur_ptr = jnp.take_along_axis(backptr_t, cur_ptr, axis=1)
        if has_aux:
            # the step-t aux of the surviving beam came from its PARENT row
            idx = cur_ptr.reshape(B, beam_size, *([1] * (aux_t.ndim - 2)))
            aux_out = jnp.take_along_axis(aux_t, idx, axis=1)
        else:
            aux_out = ()
        return cur_ptr, (out, aux_out)

    # walk from the last step backwards; scan(reverse=True) emits ys aligned
    # with xs order, i.e. ys[t] is the token at step t+1 of the final beams.
    # Uniform reverse recurrence: at index k (from max_steps-2 down to 0) the
    # token for step k+1 is preds_seq[k] gathered by cur_ptr, after which
    # cur_ptr follows backptr_seq[k]. Starting from the identity pointer this
    # reproduces allennlp_beamsearch.py:270-292 exactly.
    cur_ptr, (tail_tokens, tail_aux) = jax.lax.scan(
        recon_body, identity_ptr, (preds_seq, backptr_seq, aux_seq), reverse=True
    )
    # tail_tokens: [max_steps-1, B, beam] — steps 1..max_steps-1
    first_tokens = jnp.take_along_axis(start_ids, cur_ptr, axis=1)  # step 0
    all_tokens = jnp.concatenate(
        [first_tokens[None], tail_tokens], axis=0
    )  # [max_steps, B, beam]
    predictions = jnp.transpose(all_tokens, (1, 2, 0))  # [B, beam, max_steps]
    # a beam is ended iff its latest token is <end> (forced-end keeps it there)
    finished = jnp.all(final_preds == end_id, axis=1)
    if not has_aux:
        if return_finished:
            return predictions, final_lp, finished
        return predictions, final_lp
    # step-0 aux is shared by every beam of a group (pre-expansion step)
    first_aux = jnp.broadcast_to(
        aux0[:, None], (B, beam_size, *aux0.shape[1:])
    )
    all_aux = jnp.concatenate([first_aux[None], tail_aux], axis=0)
    # [max_steps, B, beam, ...] -> [B, beam, max_steps, ...]
    aux_out = jnp.moveaxis(all_aux, 0, 2)
    if return_finished:
        return predictions, final_lp, aux_out, finished
    return predictions, final_lp, aux_out
