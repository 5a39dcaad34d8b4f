"""Evaluation pipeline.

Parity with `evaluate.py:56-134`: batch inference over the eval loader, token
decoding to strings, COCO scoring, returning (scores, result_dict, infer_time).

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
from dlsg_tpu.ops.beam_search import beam_search
from dlsg_tpu.vocab import END_ID, START_ID, Vocabulary


def make_decode_fn(model, cfg: DLSGConfig, beam_size: Optional[int] = None) -> Callable:
    """Build a jitted (variables, frames, regions) -> token ids [B, T] decoder.

    beam_size None/1 -> greedy (layer.py:426-447); else beam search picking the
    top beam (layer.py:449-460).
    """
    beam = beam_size if beam_size is not None else cfg.beam_size

    if beam <= 1:

        @jax.jit
        def decode_greedy(variables, frames, regions):
            outputs, *_ = model.apply(variables, frames, regions, None)
            return outputs  # [B, T] token ids

        return decode_greedy

    @jax.jit
    def decode_beam(variables, frames, regions):
        obj, mot = model.apply(variables, frames, regions, method=model.encode)
        state, (feats, feats2, gfeat) = model.apply(
            variables, obj, mot, method=model.decoder_init_beam_state
        )
        B = feats.shape[0]
        # expand the loop-invariant proposal tensors to [B*beam] ONCE — doing
        # it inside the step would copy ~1GB over a 26-step decode
        feats_x = jnp.repeat(feats, beam, 0)
        feats2_x = jnp.repeat(feats2, beam, 0)
        gfeat_x = jnp.repeat(gfeat, beam, 0)

        def step_fn(tokens, st):
            if tokens.shape[0] == B:  # first step runs un-expanded
                f, f2, g = feats, feats2, gfeat
            else:
                f, f2, g = feats_x, feats2_x, gfeat_x
            return model.apply(
                variables, tokens, st, f, f2, g, method=model.decoder_beam_step
            )

        start = jnp.full((B,), START_ID, jnp.int32)
        preds, log_probs = beam_search(
            start,
            state,
            step_fn,
            end_id=END_ID,
            max_steps=cfg.max_words,
            beam_size=beam,
            normalize=True,  # beam_step returns raw logits
        )
        # top beam == argmax log-prob (beam output is sorted)
        return preds[:, 0, :]

    return decode_beam


def evaluate(
    decode_fn: Callable,
    variables,
    eval_iter,
    vocab: Vocabulary,
    reference: Dict,
    scorer: Optional[COCOScorer] = None,
) -> Tuple[Dict[str, float], "OrderedDict[str, str]", float]:
    """Decode the full eval set and score it (evaluate.py:56-98).

    Returns (scores, {vid: caption}, inference_seconds).
    """
    result: "OrderedDict[str, str]" = OrderedDict()
    start = time.time()
    for batch in eval_iter:
        ids = decode_fn(variables, jnp.asarray(batch["frames"]), jnp.asarray(batch["regions"]))
        ids = np.asarray(ids)
        valid = batch.get("valid", np.ones(ids.shape[0], bool))
        for ok, vid, toks in zip(valid, batch["video_ids"], ids):
            if ok:
                result[str(int(vid))] = vocab.decode_tokens(toks)
    infer_time = time.time() - start

    pred_json = {k: [{"video_id": k, "caption": v}] for k, v in result.items()}
    scorer = scorer or COCOScorer()
    refs = {str(k): v for k, v in reference.items()}
    scores, _ = scorer.score(refs, pred_json, list(pred_json.keys()))
    return scores, result, infer_time
