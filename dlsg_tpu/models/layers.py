"""Shared sublayers.

Behavioral parity with the reference's `models/sublayer.py` modules, re-expressed
as flax.linen with TPU-friendly shapes (feature axis last everywhere; no
permute/conv tricks — a 1x1 conv over the feature axis is just a matmul on TPU).

Masking convention: masks are float tensors where >0 means "keep"; masked logits
are filled with -9e15 exactly like the reference (sublayer.py:71).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_FILL = -9e15  # reference mask fill value (models/sublayer.py:71, layer.py:648)

# torch nn.LayerNorm's default eps (the reference never overrides it). flax
# defaults to 1e-6; every LayerNorm here pins 1e-5 so converted reference
# checkpoints are forward-equivalent (tests/test_forward_parity.py).
LN_EPS = 1e-5

# Xavier-uniform with tanh gain — torch's
# `xavier_uniform_(w, gain=calculate_gain('tanh'))` (sublayer.py:182).
TANH_GAIN = 5.0 / 3.0


def xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[-2], shape[-1]
        limit = gain * math.sqrt(6.0 / (fan_in + fan_out))
        import jax

        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class PositionalEncoding(nn.Module):
    """Sin/cos positional encoding (sublayer.py:85-104): x + pe, then dropout."""

    d_model: int
    dropout: float = 0.2
    max_len: int = 72

    def setup(self):
        pe = np.zeros((self.max_len, self.d_model), dtype=np.float32)
        position = np.arange(0.0, self.max_len)[:, None]
        div_term = np.exp(
            np.arange(0.0, self.d_model, 2) * -(math.log(10000.0) / self.d_model)
        )
        pe[:, 0::2] = np.sin(position * div_term)
        pe[:, 1::2] = np.cos(position * div_term)
        self.pe = jnp.asarray(pe)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, deterministic: bool = True):
        x = x + self.pe[None, : x.shape[1]]
        return self.drop(x, deterministic=deterministic)


class SelfAttention(nn.Module):
    """Single-head QKV self-attention (sublayer.py:46-82).

    out_i = sum_j softmax_j((x_i Wk) . (x_j Wq) / sqrt(att)) * (x_j Wv),
    followed by a bias-free output projection and dropout. Note the reference
    swaps the usual roles of K and Q; we keep its exact arithmetic.
    """

    input_size: int
    attention_size: int
    output_size: int
    dropout: float = 0.2
    get_pe: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, att_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        if self.get_pe:
            x = PositionalEncoding(self.attention_size, name="pe")(x, deterministic)
        K = nn.Dense(self.attention_size, use_bias=False, dtype=self.dtype, name="K")(x)
        Q = nn.Dense(self.attention_size, use_bias=False, dtype=self.dtype, name="Q")(x)
        V = nn.Dense(self.attention_size, use_bias=False, dtype=self.dtype, name="V")(x)
        logits = jnp.einsum(
            "bid,bjd->bij", K, Q, preferred_element_type=jnp.float32
        ) / math.sqrt(self.attention_size)
        if att_mask is not None:
            logits = jnp.where(att_mask > 0, logits, NEG_FILL)
        weight = nn.softmax(logits, axis=-1)
        attention = jnp.einsum(
            "bij,bjd->bid", weight.astype(self.dtype), V,
            preferred_element_type=jnp.float32,
        )
        attention = nn.Dense(self.output_size, use_bias=False, dtype=self.dtype, name="out")(attention)
        attention = attention.astype(jnp.float32)
        attention = nn.Dropout(self.dropout)(attention, deterministic=deterministic)
        return attention


class AttentionShare(nn.Module):
    """Single-query cross attention used by the decoder (sublayer.py:10-43).

    Returns (context [B, out], alpha [B, P]) where alpha are the attention
    weights over the P proposals — they feed the discriminator (SURVEY §3.3).

    TPU design: the K/V projections depend only on `meta_state` (the proposal
    tensor), which is LOOP-INVARIANT across the 26 decode steps — `precompute`
    lifts them out of the scan so each step pays only the Q projection and two
    tiny einsums (the reference recomputes K/V inside every step's attention
    call, sublayer.py:31-33 via layer.py:581-585).
    """

    input_value_size: int
    input_key_size: int
    output_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.K_proj = nn.Dense(self.output_size, use_bias=False, dtype=self.dtype, name="K")
        self.Q_proj = nn.Dense(self.output_size, use_bias=False, dtype=self.dtype, name="Q")
        self.V_proj = nn.Dense(self.output_size, use_bias=False, dtype=self.dtype, name="V")
        self.out_proj = nn.Dense(self.output_size, use_bias=False, dtype=self.dtype, name="out")
        self.ln = nn.LayerNorm(epsilon=LN_EPS, name="ln")
        self.drop = nn.Dropout(self.dropout)

    def precompute(self, meta_state):
        """Project the loop-invariant proposal tensor once: (K, V) [B, P, out]."""
        return self.K_proj(meta_state), self.V_proj(meta_state)

    def step_weights(self):
        """Raw per-step weights (Q kernel, out kernel, ln scale, ln bias) so
        the decoder can batch the two attention branches' Q/out projections
        and LayerNorms into single ops (models/decoder.py fused step)."""
        if self.is_initializing():
            _ = self.Q_proj(jnp.zeros((1, self.input_key_size), jnp.float32))
            _ = self.out_proj(jnp.zeros((1, self.output_size), jnp.float32))
            _ = self.ln(jnp.zeros((1, self.output_size), jnp.float32))
        return (
            self.Q_proj.variables["params"]["kernel"],
            self.out_proj.variables["params"]["kernel"],
            self.ln.variables["params"]["scale"],
            self.ln.variables["params"]["bias"],
        )

    def attend(self, K, V, hidden_previous, deterministic: bool = True):
        """One attention step over precomputed K/V."""
        q = self.Q_proj(hidden_previous)
        logits = jnp.einsum(
            "bpa,ba->bp", K, q, preferred_element_type=jnp.float32
        ) / math.sqrt(self.output_size)
        alpha = nn.softmax(logits, axis=1)  # softmax over proposals (dim=1 in ref)
        context = jnp.einsum(
            "bp,bpa->ba", alpha.astype(self.dtype), V,
            preferred_element_type=jnp.float32,
        )
        context = self.out_proj(context)
        context = context.astype(jnp.float32)
        context = jnp.tanh(context)
        context = self.ln(context)
        context = self.drop(context, deterministic=deterministic)
        return context, alpha

    def __call__(self, meta_state, hidden_previous, deterministic: bool = True):
        K, V = self.precompute(meta_state)
        return self.attend(K, V, hidden_previous, deterministic)


class LatentPSL(nn.Module):
    """Latent proposal pooling — the heart of D-LSG (sublayer.py:176-198).

    adj = softmax(x @ theta^T over the sequence axis); out = adj^T @ x, then
    Tanh -> LayerNorm -> Dropout(0.3). Pools [B, T, D] -> [B, num_psl, D].
    """

    input_size: int
    num_psl: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        theta = self.param(
            "theta",
            xavier_uniform_gain(TANH_GAIN),
            (self.num_psl, self.input_size),
            jnp.float32,
        )
        adj = jnp.einsum("btd,pd->btp", x, theta)
        adj = nn.softmax(adj, axis=1)  # normalize over the sequence axis
        out = jnp.einsum("btp,btd->bpd", adj, x)
        out = jnp.tanh(out)
        out = nn.LayerNorm(epsilon=LN_EPS, name="ln")(out)
        out = nn.Dropout(0.3)(out, deterministic=deterministic)
        return out


class ResBlock(nn.Module):
    """relu(x) + 0.3 * Conv1d(relu(x), k=3, same) over the time axis
    (sublayer.py:107-119).

    NB: the reference's `nn.ReLU(True)` is INPLACE — it mutates the residual
    input before the add, so the network it actually trains/evaluates is
    `relu(x) + 0.3*conv(relu(x))`, not the `x + 0.3*conv(relu(x))` its code
    shape suggests. Verified against the real torch module
    (tests/test_forward_parity.py).

    Operates in [B, T, C] layout (feature-last, TPU-friendly).
    """

    dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        return h + 0.3 * nn.Conv(self.dim, kernel_size=(3,), padding="SAME", name="conv")(h)


class JointEmbedVideoModel2(nn.Module):
    """Score head: Linear(Tanh(Wv v) * Tanh(Ws s)) -> 1 (sublayer.py:292-306)."""

    hidden_size: int

    @nn.compact
    def __call__(self, visual, sent):
        v = jnp.tanh(nn.Dense(self.hidden_size, name="visual_embed")(visual))
        s = jnp.tanh(nn.Dense(self.hidden_size, name="sent_embed")(sent))
        return nn.Dense(1, name="classify")(v * s)


class TanhLayerNorm(nn.Module):
    """The recurring `Sequential(Tanh, LayerNorm)` block (e.g. layer.py:145-163).

    `dtype` sets the LayerNorm computation dtype (statistics stay fp32 inside
    flax); passing bf16 halves the HBM traffic of these elementwise passes on
    the encoder's [B, T*O, D] tensors."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln")(jnp.tanh(x))
