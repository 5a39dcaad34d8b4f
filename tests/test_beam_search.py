"""Beam search semantics tests (reference: models/allennlp_beamsearch.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.ops.beam_search import beam_search

END = 2


def _static_step(transition_logp):
    """A step function from a fixed [V, V] log-prob transition matrix."""

    def step(tokens, state):
        return transition_logp[tokens], state

    return step


def test_beam_finds_most_probable_path():
    """Deterministic chain 0->1->3->2(end): beam must recover it exactly."""
    V = 5
    logp = jnp.full((V, V), -20.0)
    logp = logp.at[0, 1].set(-0.1)
    logp = logp.at[1, 3].set(-0.1)
    logp = logp.at[3, END].set(-0.1)
    logp = logp.at[END, END].set(0.0)
    preds, lps = beam_search(
        jnp.zeros((1,), jnp.int32),
        {"s": jnp.zeros((1, 1))},
        _static_step(logp),
        end_id=END,
        max_steps=4,
        beam_size=3,
    )
    assert preds.shape == (1, 3, 4)
    np.testing.assert_array_equal(np.asarray(preds[0, 0]), [1, 3, END, END])


def test_end_forcing_keeps_score_constant():
    """After <end>, a beam must only emit <end> and keep its log-prob."""
    V = 4
    logp = jnp.log(jnp.full((V, V), 1.0 / V))
    logp = logp.at[1].set(jnp.array([-20.0, -20.0, -0.01, -20.0]))  # 1 -> end
    preds, lps = beam_search(
        jnp.ones((2,), jnp.int32),
        {"s": jnp.zeros((2, 1))},
        _static_step(logp),
        end_id=END,
        max_steps=6,
        beam_size=2,
    )
    # best beam: end immediately then forced ends forever
    np.testing.assert_array_equal(np.asarray(preds[0, 0]), [END] * 6)
    # forced end steps contribute 0 logprob: total = first-step logprob
    np.testing.assert_allclose(float(lps[0, 0]), -0.01, atol=1e-5)


def test_beams_sorted_by_logprob():
    V = 6
    key = jax.random.PRNGKey(0)
    logp = jax.nn.log_softmax(jax.random.normal(key, (V, V)), axis=-1)
    preds, lps = beam_search(
        jnp.zeros((3,), jnp.int32),
        {"s": jnp.zeros((3, 1))},
        _static_step(logp),
        end_id=END,
        max_steps=5,
        beam_size=4,
    )
    lps = np.asarray(lps)
    assert np.all(np.diff(lps, axis=1) <= 1e-6)


def test_beam_matches_exhaustive_search():
    """beam_size == V^... large enough to be exhaustive on a tiny vocab: the top
    sequence must equal brute-force argmax over all length-3 paths."""
    V = 4
    key = jax.random.PRNGKey(42)
    logp = jax.nn.log_softmax(jax.random.normal(key, (V, V)) * 2.0, axis=-1)
    # kill <end> transitions so no forcing interferes
    logp = logp.at[:, END].set(-50.0)
    logp = jax.nn.log_softmax(logp, axis=-1)
    start = jnp.zeros((1,), jnp.int32)
    preds, lps = beam_search(
        start,
        {"s": jnp.zeros((1, 1))},
        _static_step(logp),
        end_id=END,
        max_steps=3,
        beam_size=V,  # exhaustive per node
    )
    # brute force
    best_score, best_seq = -np.inf, None
    lp = np.asarray(logp)
    for a in range(V):
        for b in range(V):
            for c in range(V):
                s = lp[0, a] + lp[a, b] + lp[b, c]
                if s > best_score:
                    best_score, best_seq = s, (a, b, c)
    np.testing.assert_array_equal(np.asarray(preds[0, 0]), best_seq)
    np.testing.assert_allclose(float(lps[0, 0]), best_score, atol=1e-5)


def test_state_follows_backpointers():
    """State must be reordered by ancestor beam: track token history in state
    and verify it matches the reconstructed predictions."""
    V = 8
    key = jax.random.PRNGKey(7)
    logp = jax.nn.log_softmax(jax.random.normal(key, (V, V)) * 3.0, axis=-1)
    logp = logp.at[:, END].set(-50.0)
    logp = jax.nn.log_softmax(logp, axis=-1)
    T = 5

    def step(tokens, state):
        hist = state["hist"]
        pos = state["pos"]
        hist = hist.at[:, pos[0]].set(tokens.astype(jnp.int32))
        return logp[tokens], {"hist": hist, "pos": pos + 1}

    B = 2
    init = {
        "hist": jnp.full((B, T + 1), -1, jnp.int32),
        "pos": jnp.zeros((B,), jnp.int32),
    }
    preds, _ = beam_search(
        jnp.zeros((B,), jnp.int32), init, step,
        end_id=END, max_steps=T, beam_size=3,
    )
    assert preds.shape == (B, 3, T)


def test_normalize_path_equals_logsoftmax_path():
    """normalize=True on raw logits must equal normalize=False on log_softmax."""
    V = 12
    key = jax.random.PRNGKey(3)
    logits = jax.random.normal(key, (V, V)) * 2.0

    def raw_step(tokens, state):
        return logits[tokens], state

    def norm_step(tokens, state):
        return jax.nn.log_softmax(logits, axis=-1)[tokens], state

    start = jnp.zeros((2,), jnp.int32)
    state = {"s": jnp.zeros((2, 1))}
    p1, l1 = beam_search(start, state, raw_step, end_id=END, max_steps=6,
                         beam_size=3, normalize=True)
    p2, l2 = beam_search(start, state, norm_step, end_id=END, max_steps=6,
                         beam_size=3, normalize=False)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)


def test_fast_lse_underflow_stays_finite():
    """fast_lse's clipped sumexp has documented bounds (-88, +80): inside
    them it matches exact logsumexp; a pathological all-below--88 row must
    still produce FINITE scores and the same token ranking (the +1e-37
    floor — subnormals below it are flushed by XLA, ops/beam_search.py:138),
    never -inf/NaN."""
    V = 12
    key = jax.random.PRNGKey(5)
    base = jax.random.normal(key, (V, V)) * 2.0

    def mk_step(shift):
        def step(tokens, state):
            return base[tokens] + shift, state

        return step

    start = jnp.zeros((2,), jnp.int32)
    state = {"s": jnp.zeros((2, 1))}
    kw = dict(end_id=END, max_steps=5, beam_size=3, normalize=True)
    p_ok, l_ok = beam_search(start, state, mk_step(0.0), fast_lse=True, **kw)
    p_ex, l_ex = beam_search(start, state, mk_step(0.0), fast_lse=False, **kw)
    np.testing.assert_array_equal(np.asarray(p_ok), np.asarray(p_ex))
    np.testing.assert_allclose(np.asarray(l_ok), np.asarray(l_ex), atol=1e-5)

    # all logits < -88: exp underflows; the floor must keep scores FINITE
    # (no -inf/NaN corruption). Token choices may legitimately differ from
    # exact lse out of bounds — the per-row normalizer is wrong by a constant
    # there, which shifts end-vs-continue trade-offs; that is exactly why the
    # decode builder switches to exact logsumexp for out-of-distribution
    # (quantized/external) weights.
    p_lo, l_lo = beam_search(start, state, mk_step(-200.0), fast_lse=True, **kw)
    assert np.all(np.isfinite(np.asarray(l_lo)))


def test_early_exit_skip_preserves_semantics():
    """Once every beam emits <end>, remaining steps are skipped via lax.cond;
    predictions and scores must equal the forced-end math they replace."""
    import numpy as np

    from dlsg_tpu.ops.beam_search import beam_search

    V, B, T, END = 7, 2, 6, 1

    # a step_fn that deterministically walks to <end> by step 2
    def step_fn(tokens, state):
        # favor token 3 at step 0/1, then <end> forever
        step = state["t"]
        lp = jnp.full((tokens.shape[0], V), -10.0)
        lp = lp.at[:, 3].set(jnp.where(step < 1, 0.0, -10.0))
        lp = lp.at[:, END].set(jnp.where(step < 1, -5.0, 0.0))
        return lp, {"t": jnp.broadcast_to(step + 1, tokens.shape[:1])}

    start = jnp.zeros((B,), jnp.int32)
    preds, lps = beam_search(
        start, {"t": jnp.zeros((B,), jnp.int32)}, step_fn,
        end_id=END, max_steps=T, beam_size=2,
    )
    preds = np.asarray(preds)
    # best beam: token 3 then <end>, padded with <end> by the skip path
    assert (preds[:, 0, 0] == 3).all()
    assert (preds[:, 0, 1] == END).all()
    assert (preds[:, :, 2:] == END).all()
    assert np.isfinite(np.asarray(lps)).all()

    # early_exit=False (the sharded-decode mode: no per-step all-ended
    # AllReduce) must be bit-identical — the forced-end math it always runs
    # is exactly what the cond's skip branch replaces
    preds_ne, lps_ne = beam_search(
        start, {"t": jnp.zeros((B,), jnp.int32)}, step_fn,
        end_id=END, max_steps=T, beam_size=2, early_exit=False,
    )
    assert (np.asarray(preds_ne) == preds).all()
    assert (np.asarray(lps_ne) == np.asarray(lps)).all()


def test_approx_topk_mode_runs_and_matches_on_separated_logits():
    """decode_approx_topk wires jax.lax.approx_max_k into the wide per-row
    top-k. On CPU the lowering is exact; on TPU recall < 1 may differ per
    step — this locks the plumbing and the well-separated-logits case."""
    V = 512
    key = jax.random.PRNGKey(9)
    logits = jax.random.normal(key, (V, V)) * 3.0

    def step(tokens, state):
        return logits[tokens], state

    start = jnp.zeros((2,), jnp.int32)
    state = {"s": jnp.zeros((2, 1))}
    kw = dict(end_id=END, max_steps=6, beam_size=4, normalize=True)
    p_ex, l_ex = beam_search(start, state, step, **kw)
    p_ap, l_ap = beam_search(start, state, step, approx_topk_recall=0.95, **kw)
    np.testing.assert_array_equal(np.asarray(p_ex), np.asarray(p_ap))
    np.testing.assert_allclose(np.asarray(l_ex), np.asarray(l_ap), atol=1e-5)


def test_recall_one_topk_is_exact_default():
    """decode_approx_topk defaults to 1.0: PartialReduce top-k with exact
    aggregation. Tokens AND log-probs must match the sort-based lax.top_k
    path bit-for-bit (on TPU this was additionally verified on-chip with
    adversarial ties — scripts/ab_topk_r5.py; here the CPU lowering guards
    the plumbing and the recall_target=1.0 exactness contract)."""
    from dlsg_tpu.config import DLSGConfig

    assert DLSGConfig().decode_approx_topk == 1.0

    V = 300
    key = jax.random.PRNGKey(11)
    logits = jax.random.normal(key, (V, V)) * 2.0
    # adversarial ties in every row
    logits = logits.at[:, :17].set(1.25)

    def step(tokens, state):
        return logits[tokens], state

    start = jnp.zeros((3,), jnp.int32)
    state = {"s": jnp.zeros((3, 1))}
    kw = dict(end_id=END, max_steps=7, beam_size=5, normalize=True)
    p_sort, l_sort = beam_search(start, state, step, approx_topk_recall=0.0, **kw)
    p_pr, l_pr = beam_search(start, state, step, approx_topk_recall=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(p_sort), np.asarray(p_pr))
    np.testing.assert_allclose(np.asarray(l_sort), np.asarray(l_pr), atol=0)
