"""Round-5 A/B: beam top-k via the TPU PartialReduce unit at recall 1.0.

The round-2 decode trace shows the TopK custom call at ~114 us/iter — the
3rd-largest in-loop slice. `lax.approx_max_k(recall_target=1.0)` lowers to
the hardware PartialReduce unit followed by an exact aggregation; if that
beats the sort-based TopK custom call AND returns the identical candidate
set, the beam can take it as the DEFAULT exact path (unlike
decode_approx_topk < 1.0, which trades recall).

Measures (interleaved, chained-scalar methodology like bench.py):
  1. microbench: [640, 10000] k=5 — top_k vs approx_max_k(1.0) vs
     approx_max_k(0.95)
  2. end-to-end beam-5 decode A/B with the beam's _topk swapped
  3. exactness: candidate sets equal on random + adversarial-tie inputs

Run (TPU): python scripts/ab_topk_r5.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# keep a cpu backend available for host init (mirrors bench.py)
_p = os.environ.get("JAX_PLATFORMS", "")
if _p and "cpu" not in _p.split(","):
    os.environ["JAX_PLATFORMS"] = _p + ",cpu"

import jax
import jax.numpy as jnp
import numpy as np


def _fetch(x):
    return float(np.asarray(x))


def timed_chain(fn, state, repeats=30):
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = fn(state)
        _fetch(state if not isinstance(state, tuple) else state[-1])
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), state


def micro():
    G, V, k = 640, 10000, 5
    rng = np.random.default_rng(0)
    lp = jax.device_put(rng.normal(size=(G, V)).astype(np.float32))

    def mk(fn, steps=26):
        @jax.jit
        def run(c):
            x = lp + c * 1e-9
            acc = jnp.float32(0)
            for _ in range(steps):  # 26 chained top-ks like one decode
                v, i = fn(x, k)
                acc = acc + v[0, 0] + i[0, 0]
                x = x + acc * 1e-12
            return acc

        return run

    null = jax.jit(lambda c: c + 1.0)
    _fetch(null(jnp.float32(0)))
    o, _ = timed_chain(lambda c: null(c), jnp.float32(0))

    out = {}
    for name, fn in (
        ("top_k", jax.lax.top_k),
        ("approx_1.0", lambda x, kk: jax.lax.approx_max_k(x, kk, recall_target=1.0)),
        ("approx_0.95", lambda x, kk: jax.lax.approx_max_k(x, kk, recall_target=0.95)),
    ):
        run = mk(fn)
        _fetch(run(jnp.float32(0)))  # compile+warm
        t, _ = timed_chain(lambda c, r=run: r(c), jnp.float32(0))
        out[name] = (t - o) / 26 * 1e6  # us per top-k over [G,V]
        print(f"micro {name}: {out[name]:.1f} us/call", flush=True)
    return out


def exactness():
    rng = np.random.default_rng(1)
    G, V, k = 640, 10000, 5
    for trial in range(3):
        lp = rng.normal(size=(G, V)).astype(np.float32)
        if trial == 2:  # adversarial ties
            lp[:, :50] = 1.0
        tv, ti = jax.lax.top_k(jnp.asarray(lp), k)
        av, ai = jax.lax.approx_max_k(jnp.asarray(lp), k, recall_target=1.0)
        same_set = [
            set(np.asarray(ti)[g].tolist()) == set(np.asarray(ai)[g].tolist())
            for g in range(G)
        ]
        vals_sorted = np.allclose(
            np.sort(np.asarray(tv), 1), np.sort(np.asarray(av), 1)
        )
        print(
            f"exactness trial {trial}: sets equal {np.mean(same_set):.4f}, "
            f"values match {vals_sorted}",
            flush=True,
        )


def end_to_end():
    from dataclasses import replace

    import bench
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    progs = {}
    for name, cfg_v in (
        # pin the sort-based baseline explicitly: decode_approx_topk=1.0 is
        # the DEFAULT since the round-5 ship, so the bare cfg would compile
        # the same PartialReduce program as the other arm
        ("exact_topk", replace(cfg, decode_approx_topk=0.0)),
        ("approx_1.0", replace(cfg, decode_approx_topk=1.0)),
    ):
        prog = bench.prepare_decode(cfg_v, 10000, 128)
        prog.compile()
        if prog.compiled is None:
            raise prog.error
        progs[name] = prog
    out = {name: [] for name in progs}
    for _ in range(2):  # interleaved rounds so relay drift hits both arms
        for name, prog in progs.items():
            out[name].append(prog.measure() * 1e3)
    for name, ms in out.items():
        best = min(ms)
        print(f"decode {name}: {best:.2f} ms/batch ({128/best*1e3:.0f} "
              f"captions/s) rounds={[f'{m:.2f}' for m in ms]}", flush=True)
    return out


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    if "--e2e_only" not in sys.argv:
        micro()
        exactness()
    end_to_end()
