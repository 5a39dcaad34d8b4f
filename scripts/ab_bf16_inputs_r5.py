"""Round-5 A/B: stage frames/regions as bf16 at the batch level (VERDICT r4 #3/#4).

Under compute_dtype=bfloat16 the encoder's first matmuls cast their operands
to bf16 ANYWAY, so bf16-staged inputs reach the MXU with identical values —
but the [128,26,36,2048] region tensor is read from HBM at half the bytes
(fwd AND the dW pass re-read), and the host->device transfer (the real
train loop's relay bottleneck) moves half the data.

Measures interleaved in one process via bench.prepare_{decode,train}(
input_dtype=...):
  1. beam-5 decode ms/batch, fp32- vs bf16-staged inputs, + token agreement
  2. full GAN train step ms, fp32- vs bf16-staged inputs, + finite metrics

Run (TPU): python scripts/ab_bf16_inputs_r5.py [--skip_train]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_p = os.environ.get("JAX_PLATFORMS", "")
if _p and "cpu" not in _p.split(","):
    os.environ["JAX_PLATFORMS"] = _p + ",cpu"

import jax
import jax.numpy as jnp
import numpy as np


def decode_ids(prog):
    """Run the decode program once more and pull the chained scalar — token
    agreement is checked through the scalar (sum(ids) % 97 collides only on
    identical-sum permutations; combined with equal timings over identical
    programs this is a sufficient smoke signal; the exact per-token check
    lives in tests/test_two_pass.py-style CPU tests)."""
    s = prog.chain(jnp.float32(0))
    return float(np.asarray(s))


def main():
    import bench
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    skip_train = "--skip_train" in sys.argv
    cfg = apply_dataset_overrides(DLSGConfig(dataset="msr-vtt", compute_dtype="bfloat16"))
    V, B = 10000, 128
    print("device:", jax.devices()[0], flush=True)

    d32 = bench.prepare_decode(cfg, V, B, input_dtype=np.float32)
    d16 = bench.prepare_decode(cfg, V, B, input_dtype=jnp.bfloat16)
    for prog in (d32, d16):
        prog.compile()
        if prog.compiled is None:
            raise prog.error

    res32, res16 = [], []
    for _ in range(2):  # interleaved rounds
        res32.append(d32.measure() * 1e3)
        res16.append(d16.measure() * 1e3)
    s32, s16 = decode_ids(d32), decode_ids(d16)
    print(
        f"decode fp32 {min(res32):.2f} ms {res32} | bf16 {min(res16):.2f} ms "
        f"{res16} | chain-scalar agree {s32 == s16} ({s32} vs {s16})",
        flush=True,
    )

    if skip_train:
        return
    t32 = bench.prepare_train(cfg, V, B, input_dtype=np.float32)
    t16 = bench.prepare_train(cfg, V, B, input_dtype=jnp.bfloat16)
    for prog in (t32, t16):
        prog.compile()
        if prog.compiled is None:
            raise prog.error
    ms32a = t32.measure() * 1e3
    ms16a = t16.measure() * 1e3
    ms32b = t32.measure() * 1e3
    ms16b = t16.measure() * 1e3
    print(
        f"train fp32 {min(ms32a, ms32b):.1f} ms ({ms32a:.1f}/{ms32b:.1f}) | "
        f"bf16-staged {min(ms16a, ms16b):.1f} ms ({ms16a:.1f}/{ms16b:.1f})",
        flush=True,
    )


if __name__ == "__main__":
    main()
