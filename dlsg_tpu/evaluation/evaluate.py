"""Evaluation pipeline.

Parity with `evaluate.py:56-134`: batch inference over the eval loader, token
decoding to strings, COCO scoring, returning (scores, result_dict, alpha_all,
infer_time) exactly like the reference.

TPU design: ONE jitted decode function (greedy via the decoder scan, or beam via
`ops.beam_search`) reused across batches — static shapes, padded final batch.
Multi-GPU result fan-in (`dist.all_gather_object` with hard-coded world size 4,
run_gun.py:270-276) is unnecessary: decode outputs are fixed-shape token arrays,
gathered by simply reading the replicated/jit output on host.
"""

from __future__ import annotations

import time
from collections import OrderedDict
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.metrics.scorer import COCOScorer
from dlsg_tpu.models.decoder import expand_pre_to_beams
from dlsg_tpu.ops.beam_search import beam_search
from dlsg_tpu.ops.pallas.vocab_head import vocab_head_topk
from dlsg_tpu.vocab import END_ID, START_ID, Vocabulary


def _use_fused_head(cfg: DLSGConfig, mesh) -> bool:
    """Fused vocab-head kernel policy.

    'auto' currently resolves to OFF: on a v5e the kernel measured SLOWER than
    the XLA projection+top_k+logsumexp chain it replaces (12.5 ms vs 6.7 ms
    over 26 steps at G=640 — the iterative in-kernel top-k costs more VPU
    passes than the logsumexp it saves; see BENCHMARKS.md "Fused vocab head").
    'on' forces it (single-device only: under a mesh the decode is sharded by
    XLA's partitioner, which cannot split a Mosaic custom call)."""
    mode = getattr(cfg, "use_fused_vocab_head", "auto")
    if mode != "on" or mesh is not None:
        return False
    return True


def make_decode_fn(
    model,
    cfg: DLSGConfig,
    beam_size: Optional[int] = None,
    return_alpha: bool = False,
    mesh=None,
) -> Callable:
    """Build a jitted (variables, frames, regions) -> token ids [B, T] decoder.

    beam_size None/1 -> greedy (layer.py:426-447); else beam search picking the
    top beam (layer.py:449-460). With `return_alpha`, the decoder also returns
    the per-step attention weights of the emitted caption, [B, T, 2P] — the
    reference's `alpha_all` (evaluate.py:69-70; for beam search the weights are
    reconstructed through the backpointers, which the reference never did).

    With `mesh`, eval batches are sharded over the mesh's data axis so every
    chip decodes a slice — the TPU replacement for the reference's 4-GPU eval
    fan-out (evaluate.py:101-134, run_gun.py:269-281). Decode is embarrassingly
    batch-parallel, so XLA compiles it with zero cross-chip collectives; the
    fixed-shape token/alpha outputs are simply read back on host (no
    all_gather_object needed).
    """
    beam = beam_size if beam_size is not None else cfg.beam_size

    if beam <= 1:

        def decode_greedy(variables, frames, regions):
            out = model.apply(variables, frames, regions, None)
            if return_alpha:
                return out[0], out[3]  # ids [B, T], alpha [B, T, 2P]
            return out[0]  # [B, T] token ids

        return _jit_decode(decode_greedy, mesh)

    fused = _use_fused_head(cfg, mesh)
    interpret = jax.default_backend() != "tpu"  # exercise the kernel on CPU tests

    def decode_beam(variables, frames, regions):
        obj, mot = model.apply(variables, frames, regions, method=model.encode)
        state, pre = model.apply(
            variables, obj, mot, method=model.decoder_init_beam_state
        )
        B = obj.shape[0]
        # expand the precomputed loop invariants (attention K/V, global-feat
        # projection) to [B*beam] ONCE — doing it inside the step would copy
        # them every one of the 26 steps; fused weights stay un-expanded
        pre_x = expand_pre_to_beams(pre, beam)

        if fused:
            # vocab projection weights fetched + cast ONCE, outside the scan
            wv, bv = model.apply(variables, method=model.decoder_vocab_head)

            def step_fn(tokens, st):
                p = pre if tokens.shape[0] == B else pre_x
                hid, new_st, alpha = model.apply(
                    variables, tokens, st, p, method=model.decoder_beam_step_hidden
                )
                vals, ids = vocab_head_topk(
                    hid, wv, bv, beam, normalize=True, interpret=interpret
                )
                return vals, ids, new_st, alpha

        else:

            def step_fn(tokens, st):
                # first step runs un-expanded on [B]
                p = pre if tokens.shape[0] == B else pre_x
                return model.apply(
                    variables, tokens, st, p, method=model.decoder_beam_step
                )

        start = jnp.full((B,), START_ID, jnp.int32)
        preds, log_probs, alphas = beam_search(
            start,
            state,
            step_fn,
            end_id=END_ID,
            max_steps=cfg.max_words,
            beam_size=beam,
            normalize=True,  # beam_step returns raw logits
            sparse_step=fused,
            fast_lse=getattr(cfg, "decode_fast_lse", True),
            grouped_topk=getattr(cfg, "decode_grouped_topk", False),
        )
        # top beam == argmax log-prob (beam output is sorted)
        if return_alpha:
            return preds[:, 0, :], alphas[:, 0]
        return preds[:, 0, :]

    return _jit_decode(decode_beam, mesh)


def _jit_decode(decode, mesh) -> Callable:
    """jit a decode fn; with a mesh, constrain inputs to the data axis."""
    if mesh is None:
        return jax.jit(decode)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlsg_tpu.parallel.mesh import DATA_AXIS

    bsh = NamedSharding(mesh, P(DATA_AXIS))
    n_data = mesh.shape[DATA_AXIS]

    def wrapper(variables, frames, regions):
        # pad the batch up to a multiple of the data axis (static at trace
        # time), decode sharded, slice the padding back off on the way out
        B = frames.shape[0]
        pad = (-B) % n_data
        if pad:
            frames = jnp.concatenate([frames, jnp.zeros((pad,) + frames.shape[1:], frames.dtype)])
            regions = jnp.concatenate([regions, jnp.zeros((pad,) + regions.shape[1:], regions.dtype)])
        frames = jax.lax.with_sharding_constraint(frames, bsh)
        regions = jax.lax.with_sharding_constraint(regions, bsh)
        out = decode(variables, frames, regions)
        if pad:
            out = jax.tree_util.tree_map(lambda t: t[:B], out)
        return out

    return jax.jit(wrapper)


def evaluate(
    decode_fn: Callable,
    variables,
    eval_iter,
    vocab: Vocabulary,
    reference: Dict,
    scorer: Optional[COCOScorer] = None,
) -> Tuple[Dict[str, float], "OrderedDict[str, str]", Optional[np.ndarray], float]:
    """Decode the full eval set and score it (evaluate.py:56-98).

    Returns (scores, {vid: caption}, alpha_all, inference_seconds) — the same
    quadruple as the reference's evaluate (its `alpha_all` at evaluate.py:98).
    alpha_all is a [N, T, 2P] array of the emitted captions' attention weights
    when decode_fn was built with return_alpha=True, else None.
    """
    result: "OrderedDict[str, str]" = OrderedDict()
    alpha_chunks = []
    start = time.time()
    for batch in eval_iter:
        out = decode_fn(variables, jnp.asarray(batch["frames"]), jnp.asarray(batch["regions"]))
        if isinstance(out, tuple):
            ids, alphas = out
            alphas = np.asarray(alphas)
        else:
            ids, alphas = out, None
        ids = np.asarray(ids)
        valid = batch.get("valid", np.ones(ids.shape[0], bool))
        for ok, vid, toks in zip(valid, batch["video_ids"], ids):
            if ok:
                result[str(int(vid))] = vocab.decode_tokens(toks)
        if alphas is not None:
            alpha_chunks.append(alphas[np.asarray(valid)])
    infer_time = time.time() - start
    alpha_all = np.concatenate(alpha_chunks, axis=0) if alpha_chunks else None

    pred_json = {k: [{"video_id": k, "caption": v}] for k, v in result.items()}
    scorer = scorer or COCOScorer()
    refs = {str(k): v for k, v in reference.items()}
    scores, _ = scorer.score(refs, pred_json, list(pred_json.keys()))
    return scores, result, alpha_all, infer_time
