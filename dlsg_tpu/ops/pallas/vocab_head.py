"""Fused vocab-head kernel: projection + streaming top-k + online logsumexp.

The beam/greedy decode hot loop ends every step with
``logits = decoder_output @ W_vocab + b`` followed by ``top_k`` and (on the
normalized beam path) a full-row ``logsumexp`` (reference materializes a full
[G, V] log_softmax per step, layer.py:540). At bench dims (G=640, V=10k) that
is a 25.6 MB fp32 logits tensor written to HBM and re-read twice per step —
measured at ~240 us/step on a v5e against ~102 us for the matmul itself
(scripts/bisect_results.jsonl: vocab_proj 3.52 ms vs +top_k 1.57 ms vs
+logsumexp 6.26 ms over 26 steps).

This kernel tiles the vocab dimension and keeps everything in VMEM:
  - per tile: one MXU matmul [G, H] x [H, TV] -> fp32 logits tile,
  - a k-pass iterative max/argmax extracts the tile's top-k,
  - the running top-k is merged (ids are globally unique, so value ties
    break by lowest id, matching lax.top_k),
  - an online (max, sumexp) pair accumulates the exact logsumexp,
  - at the last tile the running values are normalized in place.
The [G, V] logits never exist in HBM; HBM traffic is the weight stream
(H*V*2 bytes, unavoidable and shared with the plain matmul) plus O(G*k).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # "minus infinity" that survives exp/compare on the VPU


def _tile_topk(x, col_ids, k):
    """Top-k of x [G, C] with global column ids [G, C] (unique per row).

    Returns (vals [G, k], ids [G, k]) sorted descending, ties by lowest id —
    the same order as jax.lax.top_k. k passes of (max, min-id-at-max, mask).
    """
    vals, ids = [], []
    for _ in range(k):
        mx = jnp.max(x, axis=-1, keepdims=True)  # [G, 1]
        sel = jnp.min(jnp.where(x >= mx, col_ids, jnp.int32(2**30)), axis=-1, keepdims=True)
        vals.append(mx)
        ids.append(sel)
        x = jnp.where(col_ids == sel, NEG, x)
    return jnp.concatenate(vals, -1), jnp.concatenate(ids, -1)


def _vocab_head_kernel(h_ref, w_ref, b_ref, vals_ref, ids_ref, m_ref, s_ref,
                       *, k: int, normalize: bool, out_dtype):
    j = pl.program_id(0)
    nj = pl.num_programs(0)
    tv = w_ref.shape[1]

    logits = (
        jnp.dot(h_ref[:].astype(w_ref.dtype), w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]  # [1, TV] broadcasts over G
    )
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + j * tv
    tile_vals, tile_ids = _tile_topk(logits, col, k)
    tile_max = tile_vals[:, :1]  # [G, 1]

    @pl.when(j == 0)
    def _():
        m_ref[:] = tile_max
        s_ref[:] = jnp.sum(jnp.exp(logits - tile_max), -1, keepdims=True)
        vals_ref[:] = tile_vals
        ids_ref[:] = tile_ids

    @pl.when(j > 0)
    def _():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, tile_max)
        s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(logits - m_new), -1, keepdims=True
        )
        m_ref[:] = m_new
        # merge running top-k with the tile's: ids are globally unique
        allv = jnp.concatenate([vals_ref[:], tile_vals], -1)  # [G, 2k]
        alli = jnp.concatenate([ids_ref[:], tile_ids], -1)
        mv, mi = _tile_topk(allv, alli, k)
        vals_ref[:] = mv
        ids_ref[:] = mi

    if normalize:

        @pl.when(j == nj - 1)
        def _():
            vals_ref[:] = vals_ref[:] - (m_ref[:] + jnp.log(s_ref[:]))


def _pad_cols(w: jnp.ndarray, b: jnp.ndarray, block_v: int):
    """Pad the vocab axis to a block multiple; padded bias is NEG so padded
    columns can never enter the top-k and contribute exp(NEG)=0 to the lse."""
    V = w.shape[1]
    pad = (-V) % block_v
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
        b = jnp.pad(b, ((0, pad),), constant_values=NEG)
    return w, b


def vocab_head_topk_reference(h, w, b, k, *, normalize=True):
    """Plain-XLA reference with identical numerics contract (fp32 accum)."""
    logits = jnp.dot(h.astype(w.dtype), w, preferred_element_type=jnp.float32)
    logits = logits + b.astype(jnp.float32)[None, :]
    vals, ids = jax.lax.top_k(logits, k)
    if normalize:
        vals = vals - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    return vals, ids


@functools.partial(jax.jit, static_argnames=("k", "normalize", "block_v", "interpret"))
def vocab_head_topk(
    h: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    k: int,
    *,
    normalize: bool = True,
    block_v: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``top_k(h @ w + b)`` (+ optional log_softmax normalization).

    Args:
      h: [G, H] activations (any float dtype; cast to w.dtype for the matmul).
      w: [H, V] projection weights (pass bf16 for MXU double rate).
      b: [V] fp32 bias.
      k: number of candidates per row (beam per_node_beam_size; 1 for greedy).
      normalize: subtract the exact row logsumexp from the returned values,
        i.e. return log-softmax values of the winners (ops/beam_search.py's
        normalize=True contract).
      block_v: vocab tile width (multiple of 128).

    Returns:
      (vals [G, k] fp32 descending, ids [G, k] int32); ties by lowest id.
    """
    G, H = h.shape
    V = w.shape[1]
    w, b = _pad_cols(w, b.astype(jnp.float32), block_v)
    Vp = w.shape[1]
    grid = Vp // block_v

    kernel = functools.partial(
        _vocab_head_kernel, k=k, normalize=normalize, out_dtype=jnp.float32
    )
    vals, ids = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((G, H), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, block_v), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_v), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, k), jnp.float32),
            jax.ShapeDtypeStruct((G, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((G, 1), jnp.float32),  # running max
            pltpu.VMEM((G, 1), jnp.float32),  # running sumexp
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * G * H * Vp,
            bytes_accessed=H * Vp * w.dtype.itemsize + G * H * h.dtype.itemsize,
            transcendentals=G * Vp,
        ),
        interpret=interpret,
    )(h, w, b[None, :])
    return vals, ids
