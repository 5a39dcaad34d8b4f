"""Fused LSTM sequence scan as a Pallas TPU kernel.

Why: an XLA `lax.scan` LSTM re-reads the recurrent weight matrix W_hh from HBM
on every timestep (T=26 x 16MB for the 1024-wide encoder cells — ~0.4GB of
redundant HBM traffic per call). This kernel keeps W_hh resident in VMEM
(bf16) across all timesteps and double-buffers the per-step input projections
and outputs between HBM and VMEM, so each weight byte is read once per call.

Scope: replaces the inner scan of `ops/lstm.py:LSTMSequence` (the input
projection x@W_ih stays outside as one large MXU matmul). The reference's
equivalents are cuDNN LSTM kernels (models/layer.py:26, model.py:123).

Layout: grid over batch tiles of BT rows; per grid step the kernel loops over
T timesteps with `jax.lax.fori_loop`:
  gates[t] = xw[t] + h @ W_hh  (MXU, fp32 accumulation)
  c = sigmoid(f)*c + sigmoid(i)*tanh(g);  h = sigmoid(o)*tanh(c)
VMEM budget at H=1024, BT=128: W_hh bf16 8.4MB + 2 xw buffers 4MB + 2 out
buffers 1MB + h/c 1MB = ~14.5MB (< 16MB/core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xw_hbm, u_ref, out_hbm, h_ref, c_ref, xw_buf, out_buf, in_sems, out_sems,
            *, T: int, reverse: bool):
    BT = h_ref.shape[0]
    # ANY-space operands are whole arrays; this grid step's batch tile starts
    # at program_id * BT (TPU lowering does not support blocked ANY specs).
    base = pl.program_id(0) * BT

    def t_idx(t):
        return (T - 1 - t) if reverse else t

    def in_dma(slot, t):
        # time-major layout: slicing the leading (untiled) dim keeps the DMA
        # aligned to the (8,128) tiling of the trailing dims
        return pltpu.make_async_copy(
            xw_hbm.at[t_idx(t), pl.ds(base, BT)], xw_buf.at[slot], in_sems.at[slot]
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(
            out_buf.at[slot], out_hbm.at[t_idx(t), pl.ds(base, BT)], out_sems.at[slot]
        )

    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)
    in_dma(0, 0).start()

    def body(t, _):
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < T)
        def _():
            in_dma(nxt, t + 1).start()

        in_dma(slot, t).wait()
        gates = xw_buf[slot] + jnp.dot(
            h_ref[:], u_ref[:], preferred_element_type=jnp.float32
        )
        H = gates.shape[-1] // 4
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h

        # wait for the previous use of this out slot before overwriting
        @pl.when(t >= 2)
        def _():
            out_dma(slot, t - 2).wait()

        out_buf[slot] = h.astype(out_buf.dtype)
        out_dma(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    # drain the tail
    @pl.when(T >= 2)
    def _():
        out_dma((T - 2) % 2, T - 2).wait()

    out_dma((T - 1) % 2, T - 1).wait()


@functools.partial(jax.jit, static_argnames=("reverse", "block_batch", "interpret"))
def lstm_scan_pallas(
    xw: jnp.ndarray,
    w_hh: jnp.ndarray,
    *,
    reverse: bool = False,
    block_batch: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run an LSTM over a pre-projected input sequence.

    Args:
      xw: [B, T, 4H] input projections (x @ W_ih + b) in fp32.
      w_hh: [H, 4H] recurrent weights (cast to bf16 inside for VMEM residency).
      reverse: scan right-to-left (for the backward half of a Bi-LSTM); output
        stays aligned with input positions, matching lax.scan(reverse=True).

    Returns: hs [B, T, H] fp32.
    """
    B, T, G = xw.shape
    H = G // 4
    BT = min(block_batch, B)
    pad = (-B) % BT
    if pad:
        xw = jnp.pad(xw, ((0, pad), (0, 0), (0, 0)))
    Bp = xw.shape[0]

    u = w_hh.astype(jnp.bfloat16)
    grid = (Bp // BT,)
    xw_tm = jnp.swapaxes(xw, 0, 1)  # [T, Bp, 4H] — time-major for aligned DMA

    out = pl.pallas_call(
        functools.partial(_kernel, T=T, reverse=reverse),
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole array; tiled in-kernel
            pl.BlockSpec((H, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((BT, H), jnp.float32),  # h
            pltpu.VMEM((BT, H), jnp.float32),  # c
            pltpu.VMEM((2, BT, G), jnp.float32),  # xw double buffer
            pltpu.VMEM((2, BT, H), jnp.float32),  # out double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=interpret,
    )(xw_tm, u)
    return jnp.swapaxes(out, 0, 1)[:B]
