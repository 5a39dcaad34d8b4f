"""Pallas LSTM scan kernel vs. the reference lax.scan implementation.

Runs in interpreter mode on CPU (pltpu interpret=True); the same kernel
compiles natively on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.ops.lstm import lstm_step
from dlsg_tpu.ops.pallas.lstm_scan import lstm_scan_pallas


def _reference_scan(xw, w_hh, reverse=False):
    B, T, G = xw.shape
    H = G // 4
    h0 = jnp.zeros((B, H))
    c0 = jnp.zeros((B, H))

    def step(carry, xw_t):
        h, c = carry
        h, c = lstm_step(xw_t, h, c, w_hh)
        return (h, c), h

    _, hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xw, 0, 1), reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_lstm_matches_scan(reverse):
    B, T, H = 4, 6, 16
    key = jax.random.PRNGKey(0)
    xw = jax.random.normal(key, (B, T, 4 * H), jnp.float32)
    w_hh = jax.random.normal(jax.random.PRNGKey(1), (H, 4 * H), jnp.float32) * 0.2

    got = lstm_scan_pallas(xw, w_hh, reverse=reverse, block_batch=4, interpret=True)
    # the kernel holds weights in bf16 — compare against a bf16-weight scan
    want = _reference_scan(xw, w_hh.astype(jnp.bfloat16).astype(jnp.float32), reverse)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2)


def test_pallas_lstm_pads_ragged_batch():
    B, T, H = 5, 4, 8  # B not a multiple of block_batch
    xw = jax.random.normal(jax.random.PRNGKey(2), (B, T, 4 * H), jnp.float32)
    w_hh = jax.random.normal(jax.random.PRNGKey(3), (H, 4 * H), jnp.float32) * 0.2
    got = lstm_scan_pallas(xw, w_hh, block_batch=4, interpret=True)
    want = _reference_scan(xw, w_hh.astype(jnp.bfloat16).astype(jnp.float32))
    assert got.shape == (B, T, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-2, rtol=2e-2)
