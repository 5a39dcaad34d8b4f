"""Int8 quantized inference matmuls.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate, and the decode
hot loop is matmul-floor-bound (BENCHMARKS.md round-2 log: the 26-step chain
sits at ~10 ms of bf16 MXU work). Weight-only-style dynamic quantization:

- weights: symmetric per-OUTPUT-channel int8, scales fp32 (quantized once per
  decode call in `DecoderStep.precompute`, outside the scan);
- activations: symmetric per-ROW dynamic int8 (one max pass + one scale pass
  over the [G, in] activations — tiny next to the halved matmul);
- accumulation: int32 on the MXU, rescaled to fp32 by s_row * s_col.

This is INFERENCE-ONLY (`cfg.decode_quant='int8'`); training always runs the
bf16/fp32 path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def quantize_per_col(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] fp -> (int8 [in, out], fp32 scale [out]); symmetric."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
    return q, s


def qmatmul(x: jnp.ndarray, w_q: jnp.ndarray, w_s: jnp.ndarray) -> jnp.ndarray:
    """x [G, in] fp  @  dequant(w_q, w_s) [in, out]  -> [G, out] fp32.

    Dynamic per-row activation quantization; int8 MXU matmul; fp32 rescale.
    """
    x = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * w_s[None, :]
