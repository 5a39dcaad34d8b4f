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

import functools
import time
from collections import OrderedDict
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.config import DLSGConfig
from dlsg_tpu.data.prefetch import stage_cast
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
    if mode == "on" and mesh is not None:
        import warnings

        warnings.warn(
            "use_fused_vocab_head='on' is single-device only (a Mosaic custom "
            "call cannot be sharded); falling back to the XLA vocab head.",
            stacklevel=3,
        )
        return False
    return mode == "on"


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

    beam_feats = _make_beam_from_feats(model, cfg, beam, mesh)

    t1 = getattr(cfg, "decode_two_pass_t1", 0)
    if 0 < t1 < cfg.max_words and mesh is None:
        return _make_two_pass_fn(model, cfg, beam, return_alpha, beam_feats, t1)

    def decode_beam(variables, frames, regions):
        obj, mot = model.apply(variables, frames, regions, method=model.encode)
        preds, log_probs, alphas, _ = beam_feats(variables, obj, mot, cfg.max_words)
        # top beam == argmax log-prob (beam output is sorted)
        if return_alpha:
            return preds[:, 0, :], alphas[:, 0]
        return preds[:, 0, :]

    return _jit_decode(decode_beam, mesh)


def _make_beam_from_feats(model, cfg: DLSGConfig, beam: int, mesh=None) -> Callable:
    """Build the proposals -> beam-decode core, parameterized by max_steps.

    Returns fn(variables, obj, mot, max_steps) -> (preds [B, beam, max_steps],
    log_probs [B, beam], alphas [B, beam, max_steps, 2P], finished [B]).
    NOT jitted — callers jit their composition (max_steps must be static).
    """
    fused = _use_fused_head(cfg, mesh)
    interpret = jax.default_backend() != "tpu"  # exercise the kernel on CPU tests

    def beam_from_feats(variables, obj, mot, max_steps: int):
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
        return beam_search(
            start,
            state,
            step_fn,
            end_id=END_ID,
            max_steps=max_steps,
            beam_size=beam,
            normalize=True,  # beam_step returns raw logits
            sparse_step=fused,
            # fast_lse's clipped one-pass sumexp is exact for logits in
            # (-88, +80) — guaranteed by this model's tanh(LN)@W head but not
            # by quantized weights, so int8 decode takes the exact logsumexp
            fast_lse=(
                getattr(cfg, "decode_fast_lse", True)
                and getattr(cfg, "decode_quant", "none") == "none"
            ),
            approx_topk_recall=getattr(cfg, "decode_approx_topk", 1.0),
            # sharded decode: drop the all-ended early-exit check — it would
            # force one AllReduce per step on the mesh (beam_search docstring)
            early_exit=mesh is None,
            return_finished=True,
        )

    return beam_from_feats


def _make_two_pass_fn(
    model, cfg: DLSGConfig, beam: int, return_alpha: bool, beam_feats: Callable, t1: int
) -> Callable:
    """Per-sequence early-exit decode — ONE jit, all on device.

    The batch-wide `all ended` skip inside the beam scan is all-or-nothing: one
    26-token straggler in a B=128 batch keeps every step alive, so at the
    real-data mean caption length (~8 of 26 steps) most decode compute is spent
    re-forcing <end> on finished sequences (the reference has the same
    per-batch break, allennlp_beamsearch.py:168-169). Instead:

      pass 1: encode + beam-decode EVERYONE for t1 steps;
      pass 2: only sequences whose beams have not all emitted <end> (their
        result could still change) are re-decoded at full max_words. The
        unfinished rows are COMPACTED on device (stable argsort of the
        finished mask) into a fixed `bucket`-sized group and scattered back —
        no host round-trip, so the whole decode stays one XLA program (a
        host-driven gather loop would pay one relay/dispatch sync per chunk).

    Exact by construction: a sequence whose beams all ended within t1 steps
    can never change with more steps (forced-end emits <end> with log-prob 0),
    and stragglers get the full-length decode from scratch. Exactness is
    asserted against the single-pass decode in tests/test_two_pass.py.

    Worst-case guard: when more than `bucket` sequences are unfinished (e.g.
    random weights emitting max-length babble), a `lax.cond` branch re-decodes
    the FULL batch instead, bounding the overhead at pass1's t1/max_words.
    """
    T = cfg.max_words

    def decode(variables, frames, regions):
        B = frames.shape[0]
        bucket = max(1, min(B, getattr(cfg, "decode_two_pass_bucket", 0) or B // 4))
        obj, mot = model.apply(variables, frames, regions, method=model.encode)

        preds1, _, alphas1, fin = beam_feats(variables, obj, mot, t1)
        ids1 = preds1[:, 0, :]  # [B, t1]
        al1 = alphas1[:, 0]  # [B, t1, 2P]
        ids1 = jnp.concatenate(
            [ids1, jnp.full((B, T - t1), END_ID, ids1.dtype)], axis=1
        )
        al1 = jnp.concatenate(
            [al1, jnp.zeros((B, T - t1) + al1.shape[2:], al1.dtype)], axis=1
        )
        unfin = ~fin
        # stable sort: unfinished rows first, original order preserved
        order = jnp.argsort(jnp.where(unfin, 0, 1), stable=True)
        idx = order[:bucket]

        def small(_):
            # frames-only generators (CapModel/CapBaseline*) encode to
            # (feats, None) — a None motion stream passes straight through
            ids2, al2 = _pass2(obj[idx], None if mot is None else mot[idx])
            mask = unfin[idx]
            new_ids = jnp.where(mask[:, None], ids2, ids1[idx])
            new_al = jnp.where(mask[:, None, None], al2, al1[idx])
            return ids1.at[idx].set(new_ids), al1.at[idx].set(new_al)

        def big(_):
            ids2, al2 = _pass2(obj, mot)
            return (
                jnp.where(unfin[:, None], ids2, ids1),
                jnp.where(unfin[:, None, None], al2, al1),
            )

        def _pass2(o, m):
            preds2, _, alphas2, _ = beam_feats(variables, o, m, T)
            return preds2[:, 0, :], alphas2[:, 0]

        if bucket >= B:
            ids, al = big(None)
        else:
            ids, al = jax.lax.cond(jnp.sum(unfin) <= bucket, small, big, None)
        if return_alpha:
            return ids, al
        return ids

    return jax.jit(decode)


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


@functools.lru_cache(maxsize=8)  # bounded: each entry pins a Mesh + executable
def _replicate_jit(out_sharding):
    """One cached identity-jit per target sharding: a fresh `jax.jit(lambda..)`
    per leaf per call would miss jit's function-keyed cache and recompile the
    all-gather on every in-training eval (NamedSharding is hashable)."""
    return jax.jit(lambda a: a, out_shardings=out_sharding)


def reshard_for_local_eval(variables, eval_mesh):
    """Reshard train-mesh-committed params for a LOCAL eval mesh.

    After the first sharded train step, parameters are jax.Arrays committed to
    the GLOBAL training mesh; a decode jit built over the per-process eval mesh
    (multi-host in-training eval, trainer.py) would then mix two device sets in
    one computation and raise 'Received incompatible devices'. Each leaf is
    pulled to host (fully-replicated arrays are locally readable at any process
    count; tensor-parallel leaves are first replicated on their own mesh with
    an identity jit, which inserts the all-gather) and committed ONCE,
    replicated, to the eval mesh — so the per-batch decode calls don't
    re-transfer the parameters.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    def to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_replicated:
            rep = _replicate_jit(NamedSharding(x.sharding.mesh, PartitionSpec()))(x)
            return np.asarray(rep)
        return np.asarray(x)

    host = jax.tree_util.tree_map(to_host, variables)
    if eval_mesh is None:
        return host
    return jax.device_put(host, NamedSharding(eval_mesh, PartitionSpec()))


def _gather_across_hosts(ids, vids, alphas):
    """Cross-host eval fan-in: every process contributes its shard's decoded
    token ids, and every process ends up with the full set.

    The reference does this with `dist.all_gather_object` of python dicts and
    a HARD-CODED world size 4 (run_gun.py:270-276); here the payloads are
    fixed-shape arrays (padded to the max per-host count, marked with vid=-1)
    gathered with `multihost_utils.process_allgather` at any process count.
    A process whose eval shard is EMPTY (eval set smaller than the process
    count) still participates: shapes are agreed via a metadata gather first,
    so the empty shard contributes correctly-shaped padding instead of
    deadlocking the others.
    """
    from jax.experimental import multihost_utils as mhu

    # metadata round: [n, T, has_alpha, *alpha_trailing_shape]
    meta = np.zeros(8, np.int64)
    meta[0] = ids.shape[0]
    meta[1] = ids.shape[1] if ids.ndim == 2 else 0
    if alphas is not None:
        trail = alphas.shape[1:]
        meta[2] = 1
        meta[3 : 3 + len(trail)] = trail
    metas = mhu.process_allgather(meta)  # [P, 8]
    n_max = int(metas[:, 0].max())
    t_max = int(metas[:, 1].max())
    if n_max == 0:  # every shard empty — nothing to merge
        return ids, vids, alphas

    def pad(a, fill, shape, dtype):
        out = np.full(shape, fill, dtype)
        if a.size:
            out[tuple(slice(0, s) for s in a.shape)] = a
        return out

    ids_g = mhu.process_allgather(pad(ids, 0, (n_max, t_max), np.int32))
    vids_g = mhu.process_allgather(pad(np.asarray(vids, np.int64), -1, (n_max,), np.int64))
    keep = vids_g.reshape(-1) >= 0
    ids_all = ids_g.reshape(-1, t_max)[keep]
    vids_all = vids_g.reshape(-1)[keep]
    alpha_all = None
    if metas[:, 2].max():  # any process produced attention weights
        arow = metas[int(np.argmax(metas[:, 2]))]
        a_trail = tuple(int(v) for v in arow[3:] if v > 0)
        local = alphas if alphas is not None else np.zeros((0,) + a_trail, np.float32)
        al_g = mhu.process_allgather(
            pad(np.asarray(local, np.float32), 0.0, (n_max,) + a_trail, np.float32)
        )
        alpha_all = al_g.reshape((-1,) + a_trail)[keep]
    return ids_all, vids_all, alpha_all


def evaluate(
    decode_fn: Callable,
    variables,
    eval_iter,
    vocab: Vocabulary,
    reference: Dict,
    scorer: Optional[COCOScorer] = None,
    cross_host_gather: bool = False,
    stage_dtype=None,
) -> Tuple[Dict[str, float], "OrderedDict[str, str]", Optional[np.ndarray], float]:
    """Decode the full eval set and score it (evaluate.py:56-98).

    Returns (scores, {vid: caption}, alpha_all, inference_seconds) — the same
    quadruple as the reference's evaluate (its `alpha_all` at evaluate.py:98).
    alpha_all is a [N, T, 2P] array of the emitted captions' attention weights
    when decode_fn was built with return_alpha=True, else None.

    Multi-host: pass per-process sharded `eval_iter` batches
    (data/loader.py eval_batches shard_index/num_shards) and
    `cross_host_gather=True`; every process then scores the merged full set
    (identical results everywhere — no broadcast needed).
    """
    ids_chunks, vid_chunks, alpha_chunks = [], [], []
    start = time.time()

    def _consume(out, batch):
        # np.asarray is the only true synchronization point on the remote-TPU
        # relay (CLAUDE.md), so it sits here, AFTER the next batch's decode has
        # already been dispatched.
        if isinstance(out, tuple):
            ids, alphas = out
            alphas = np.asarray(alphas)
        else:
            ids, alphas = out, None
        ids = np.asarray(ids)
        valid = np.asarray(batch.get("valid", np.ones(ids.shape[0], bool)))
        vids = np.asarray([int(v) for v in batch["video_ids"]])
        ids_chunks.append(ids[valid])
        vid_chunks.append(vids[valid])
        if alphas is not None:
            alpha_chunks.append(alphas[valid])

    # One-batch lookahead: dispatch batch k+1's decode (async under jax's
    # deferred execution) BEFORE blocking on batch k's device->host fetch, so
    # device compute overlaps the fetch + host-side bookkeeping instead of
    # serializing with them. Results are consumed in order, so output
    # ordering is identical to the plain loop.
    # stage_dtype (cfg.stage_dtype): the input_stage_dtype staging policy,
    # shared with prefetch/serve via data.prefetch.stage_cast.
    def _feats(b):
        f = stage_cast(b["frames"], stage_dtype)
        r = stage_cast(b["regions"], stage_dtype)
        return jnp.asarray(f), jnp.asarray(r)

    pending = None
    for batch in eval_iter:
        out = decode_fn(variables, *_feats(batch))
        if pending is not None:
            _consume(*pending)
        pending = (out, batch)
    if pending is not None:
        _consume(*pending)
    if ids_chunks:
        ids_all = np.concatenate(ids_chunks, axis=0)
        vids_all = np.concatenate(vid_chunks, axis=0)
        alpha_all = np.concatenate(alpha_chunks, axis=0) if alpha_chunks else None
    else:  # empty per-process shard: still join the cross-host gather below
        ids_all = np.zeros((0, 0), np.int32)
        vids_all = np.zeros((0,), np.int64)
        alpha_all = None
    if cross_host_gather and jax.process_count() > 1:
        ids_all, vids_all, alpha_all = _gather_across_hosts(
            ids_all, vids_all, alpha_all
        )
    infer_time = time.time() - start

    result: "OrderedDict[str, str]" = OrderedDict(
        (str(int(v)), vocab.decode_tokens(t)) for v, t in zip(vids_all, ids_all)
    )
    pred_json = {k: [{"video_id": k, "caption": v}] for k, v in result.items()}
    scorer = scorer or COCOScorer()
    refs = {str(k): v for k, v in reference.items()}
    scores, _ = scorer.score(refs, pred_json, list(pred_json.keys()))
    return scores, result, alpha_all, infer_time
