"""LSTM primitives designed for the TPU MXU.

The reference runs cuDNN `nn.LSTM` / `nn.LSTMCell` (models/layer.py:26,318,326;
models/model.py:123) and must *disable* cuDNN for GAN training because cuDNN LSTMs
don't support double backward (train_debug.py:51). Here LSTMs are plain jax —
second-order grads (needed for WGAN-GP) come for free.

TPU design notes:
- A sequence LSTM is split into (a) one large batched input projection
  ``x @ W_ih`` over the whole ``[B*T, X]`` tensor — a single MXU-friendly matmul —
  and (b) a `lax.scan` carrying only the small recurrent matmul ``h @ W_hh``.
  This keeps the sequential part minimal and lets XLA pipeline the big matmul.
- Gates are fused into one ``4H`` projection (one matmul per step instead of 4).
- Gate order is (i, f, g, o), matching torch's LSTM layout so that reference
  checkpoints could be transliterated if ever needed.
- ``dtype`` selects the matmul precision (bf16 feeds the MXU at double rate);
  gate accumulation and cell state stay fp32.
- `ops/pallas/lstm_scan.py` provides a fused kernel for the sequence scan that
  keeps W_hh resident in VMEM across timesteps; `LSTMSequence(use_pallas=True)`
  switches to it (TPU only).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def lstm_gates(
    gates: jnp.ndarray, c: jnp.ndarray, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the (i, f, g, o) nonlinearity given fully-formed gate
    pre-activations [B, 4H] and the previous cell state.

    `dtype=bfloat16` evaluates the sigmoids/tanh on bf16 gate values (the cell
    state and its update stay fp32) — the gate chain is pure VPU traffic over
    [B, 4H] and halving it measured -2.2 ms per 26 decode steps at G=640
    (scripts/bisect_results.jsonl cp_L1 vs cp_L1b)."""
    if dtype == jnp.bfloat16:
        i, f, g, o = jnp.split(gates.astype(dtype), 4, axis=-1)
        c_new = (
            jax.nn.sigmoid(f).astype(jnp.float32) * c
            + (jax.nn.sigmoid(i) * jnp.tanh(g)).astype(jnp.float32)
        )
        h_new = jax.nn.sigmoid(o).astype(jnp.float32) * jnp.tanh(c_new)
        return h_new, c_new
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(
    xw: jnp.ndarray,
    h: jnp.ndarray,
    c: jnp.ndarray,
    w_hh: jnp.ndarray,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step given a pre-projected input.

    Args:
      xw: ``x @ W_ih + b`` for this step, shape [B, 4H].
      h, c: previous hidden / cell state, [B, H] (fp32).
      w_hh: recurrent weights, [H, 4H].
      dtype: matmul compute dtype; accumulation is always fp32.

    Returns:
      (h', c') in fp32.
    """
    gates = xw.astype(jnp.float32) + jnp.dot(
        h.astype(dtype), w_hh.astype(dtype), preferred_element_type=jnp.float32
    )
    return lstm_gates(gates, c)


class LSTMCell(nn.Module):
    """Fused-gate LSTM cell (torch ``nn.LSTMCell`` equivalent).

    Used by the decoder's query/language cells (models/layer.py:318,326).
    `fused_weights` exposes [W_ih; W_hh] as ONE stacked kernel so the decoder's
    scanned step can run `[x, h] @ W` as a single MXU matmul instead of two
    (the stack is built once per sequence, outside the scan).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ih = nn.Dense(4 * self.features, dtype=self.dtype, name="ih")
        self.w_hh = self.param(
            "w_hh",
            nn.initializers.orthogonal(),
            (self.features, 4 * self.features),
            jnp.float32,
        )

    def __call__(self, x, h, c):
        return lstm_step(self.ih(x), h, c, self.w_hh, self.dtype)

    def fused_weights(self, in_features: int):
        """(W [in+H, 4H] in compute dtype, b [4H] fp32) for `[x, h] @ W + b`."""
        if self.is_initializing():
            _ = self.ih(jnp.zeros((1, in_features), jnp.float32))
        p = self.ih.variables["params"]
        w = jnp.concatenate([p["kernel"], self.w_hh], axis=0).astype(self.dtype)
        return w, p["bias"].astype(jnp.float32)


class SplitInputLSTMCell(nn.Module):
    """LSTMCell whose input projection is split into a per-step (dynamic) part
    and a loop-invariant (static) part precomputed once outside the scan.

    Mathematically identical to LSTMCell over the concatenated input —
    `[x_dyn, x_static] @ W == x_dyn @ W_dyn + x_static @ W_static` — but the
    static matmul (e.g. the decoder's global visual feature, which never
    changes across the 26 decode steps, layer.py:574-576) runs ONCE instead of
    per step. Used by the decoder's query LSTM.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.ih_dyn = nn.Dense(4 * self.features, dtype=self.dtype, name="ih_dyn")
        self.ih_static = nn.Dense(
            4 * self.features, use_bias=False, dtype=self.dtype, name="ih_static"
        )
        self.w_hh = self.param(
            "w_hh",
            nn.initializers.orthogonal(),
            (self.features, 4 * self.features),
            jnp.float32,
        )

    def project_static(self, x_static):
        """Precompute the loop-invariant slice of the input projection."""
        return self.ih_static(x_static)  # [B, 4H]

    def __call__(self, x_dyn, xw_static, h, c):
        xw = self.ih_dyn(x_dyn).astype(jnp.float32) + xw_static.astype(jnp.float32)
        return lstm_step(xw, h, c, self.w_hh, self.dtype)

    def fused_weights(self, dyn_in_features: int):
        """(W [dyn_in+H, 4H] in compute dtype, b [4H] fp32) for
        `[x_dyn, h] @ W + b + xw_static` as one per-step matmul."""
        if self.is_initializing():
            _ = self.ih_dyn(jnp.zeros((1, dyn_in_features), jnp.float32))
        p = self.ih_dyn.variables["params"]
        w = jnp.concatenate([p["kernel"], self.w_hh], axis=0).astype(self.dtype)
        return w, p["bias"].astype(jnp.float32)


class LSTMSequence(nn.Module):
    """Unidirectional LSTM over a full sequence via lax.scan.

    The input projection is hoisted out of the scan (one big matmul). With
    ``use_pallas`` the scan runs as the fused VMEM-resident Pallas kernel.
    """

    features: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):  # x: [B, T, X]
        xw = nn.Dense(4 * self.features, dtype=self.dtype, name="ih")(x)  # [B,T,4H]
        w_hh = self.param(
            "w_hh",
            nn.initializers.orthogonal(),
            (self.features, 4 * self.features),
            jnp.float32,
        )
        if self.use_pallas:
            from dlsg_tpu.ops.pallas.lstm_scan import lstm_scan_pallas

            return lstm_scan_pallas(
                xw.astype(jnp.float32), w_hh, reverse=self.reverse
            )

        B = x.shape[0]
        h0 = jnp.zeros((B, self.features), jnp.float32)
        c0 = jnp.zeros((B, self.features), jnp.float32)
        dtype = self.dtype

        def step(carry, xw_t):
            h, c = carry
            h, c = lstm_step(xw_t, h, c, w_hh, dtype)
            return (h, c), h

        xw_t_major = jnp.swapaxes(xw, 0, 1)  # [T, B, 4H]
        (_, _), hs = jax.lax.scan(step, (h0, c0), xw_t_major, reverse=self.reverse)
        return jnp.swapaxes(hs, 0, 1)  # [B, T, H]


class BiLSTM(nn.Module):
    """Bidirectional LSTM: forward + backward scans, concatenated.

    Equivalent of ``nn.LSTM(h, h, bidirectional=True)`` in EncoderVisual
    (models/layer.py:26). Output [B, T, 2H].
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        fwd = LSTMSequence(
            self.features, reverse=False, dtype=self.dtype,
            use_pallas=self.use_pallas, name="fwd",
        )(x)
        bwd = LSTMSequence(
            self.features, reverse=True, dtype=self.dtype,
            use_pallas=self.use_pallas, name="bwd",
        )(x)
        return jnp.concatenate([fwd, bwd], axis=-1)
