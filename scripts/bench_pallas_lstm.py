"""Microbenchmark: Pallas fused LSTM scan vs XLA lax.scan (run on TPU).

Usage: python scripts/bench_pallas_lstm.py
"""

import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dlsg_tpu.ops.lstm import lstm_step
from dlsg_tpu.ops.pallas.lstm_scan import lstm_scan_pallas


def fetch(x):
    return float(np.asarray(x))


def main():
    B, T, H = 128, 26, 1024
    key = jax.random.PRNGKey(0)
    xw = jax.random.normal(key, (B, T, 4 * H), jnp.float32) * 0.1
    w = jax.random.normal(jax.random.PRNGKey(1), (H, 4 * H), jnp.float32) * 0.05

    @jax.jit
    def xla_scan(n, c, xw, w):
        def once(c):
            h0 = jnp.zeros((B, H))
            c0 = jnp.zeros((B, H))

            def step(carry, xw_t):
                h, cc = carry
                h, cc = lstm_step(xw_t, h, cc, w)
                return (h, cc), h

            _, hs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xw + c * 1e-12, 0, 1))
            return jnp.sum(hs) % 97

        return jax.lax.fori_loop(0, n, lambda i, c: once(c), c)

    @jax.jit
    def pallas_run(n, c, xw, w):
        def once(c):
            hs = lstm_scan_pallas(xw + c * 1e-12, w)
            return jnp.sum(hs) % 97

        return jax.lax.fori_loop(0, n, lambda i, c: once(c), c)

    # correctness on hardware (vs bf16-weight scan)
    got = lstm_scan_pallas(xw[:8], w)
    h0 = jnp.zeros((8, H))
    c0 = jnp.zeros((8, H))

    def step(carry, xw_t):
        h, cc = carry
        h, cc = lstm_step(xw_t, h, cc, w.astype(jnp.bfloat16).astype(jnp.float32))
        return (h, cc), h

    _, want = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xw[:8], 0, 1))
    want = jnp.swapaxes(want, 0, 1)
    print("pallas max err vs bf16-weight scan:", float(jnp.max(jnp.abs(got - want))), flush=True)

    null = jax.jit(lambda x: x + 1.0)
    fetch(null(jnp.float32(0)))

    def overhead():
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            fetch(null(jnp.float32(0)))
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts)

    N_LO, N_HI = 2, 42
    for name, fn in [("xla_scan", xla_scan), ("pallas", pallas_run)]:
        c = jnp.float32(0)
        fetch(fn(jnp.int32(N_LO), c, xw, w))
        t_lo, t_hi = [], []
        for _ in range(6):
            t0 = time.perf_counter()
            fetch(fn(jnp.int32(N_LO), c, xw, w))
            t_lo.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fetch(fn(jnp.int32(N_HI), c, xw, w))
            t_hi.append(time.perf_counter() - t0)
        t = (statistics.median(t_hi) - statistics.median(t_lo)) / (N_HI - N_LO)
        print(f"{name}: {t * 1e3:.3f} ms per [{B},{T}] LSTM (H={H})", flush=True)


if __name__ == "__main__":
    main()
