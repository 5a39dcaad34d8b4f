"""Two-process multi-host SPMD test (jax.distributed local CPU cluster).

Launches two REAL processes that form a jax.distributed cluster (2 virtual CPU
devices each -> one 4-device global mesh), train CapBaseline1 with the same
sharded-loader -> globalize_batch -> jitted-step plumbing `cli train` uses, and
asserts:

  1. each host consumes a DISJOINT data shard (loader striding),
  2. both processes end with IDENTICAL parameters (the psum gradient exchange
     really synchronized them),
  3. those parameters match a SINGLE-process run over the reassembled global
     batches (multi-host == single-host numerics),
  4. the eval fan-in (`_gather_across_hosts`) merges ragged per-process
     payloads exactly (asserted inside the workers).

Replaces the reference's untestable 4-GPU NCCL path (DistributedSampler +
DDP + all_gather_object with hard-coded world size, utils/data.py:121-131,
run_gun.py:270-276).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers", "multihost_worker.py")
NPROCS = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=REPO,
    )
    return env


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(NPROCS):
        out = tmp_path / f"params_{pid}.npz"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(pid), str(NPROCS), str(port), str(out)],
                env=_worker_env(),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
        assert "WORKER OK" in log

    # (4b) the real evaluate() pipeline scored the MERGED set identically on
    # both processes (each decoded only its own disjoint shard)
    s0 = open(str(outs[0]) + ".scores").read()
    s1 = open(str(outs[1]) + ".scores").read()
    assert s0 == s1 and "Bleu_4" in s0

    got = [np.load(o) for o in outs]
    keys = sorted(k for k in got[0].files if k != "losses")
    assert keys, "no parameters saved"
    # (2) replicated-parameter consistency across processes
    for k in keys:
        np.testing.assert_allclose(got[0][k], got[1][k], atol=1e-6, err_msg=k)
    # logged global-mean losses agree too
    np.testing.assert_allclose(got[0]["losses"], got[1]["losses"], atol=1e-5)

    # (1) disjoint shards: the loader's deterministic striding partitions the
    # epoch permutation — same math the workers ran
    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab

    cfg = tiny_test_config(dropout=0.0, rng_impl="threefry2x32", train_batch_size=2)
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=16)
    order = np.random.default_rng(cfg.seed).permutation(len(ds))
    shards = [set(order[p::NPROCS].tolist()) for p in range(NPROCS)]
    assert shards[0].isdisjoint(shards[1])
    assert len(shards[0] | shards[1]) == len(ds)

    # (3) single-process run over the reassembled global batches
    import jax
    import jax.numpy as jnp

    from dlsg_tpu.data.loader import train_batches
    from dlsg_tpu.models.generator import CapBaseline1
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_ce_train_step

    model = CapBaseline1(cfg, len(vocab))
    s0 = ds[0]
    params = model.init(
        jax.random.PRNGKey(0),
        s0["frames"][None],
        s0["regions"][None, :, : cfg.num_obj],
        s0["captions"][None, : cfg.max_words],
    )["params"]
    state = TrainState.create(params, make_optimizer(cfg.learning_rate))
    step = make_ce_train_step(model, cfg, mesh=None)
    rng = jax.random.key(cfg.seed, impl="threefry2x32")

    iters = [
        train_batches(
            ds, cfg.train_batch_size, seed=cfg.seed, epoch=0,
            shard_index=p, num_shards=NPROCS,
        )
        for p in range(NPROCS)
    ]
    for locals_ in zip(*iters):
        # process-order concat == make_array_from_process_local_data layout
        gbatch = {
            k: np.concatenate([b[k] for b in locals_], axis=0)
            for k in ("frames", "regions", "captions", "lengths")
        }
        gbatch["regions"] = gbatch["regions"][:, :, : cfg.num_obj]
        gbatch["captions"] = gbatch["captions"][:, : cfg.max_words]
        state, _ = step(state, gbatch, rng, jnp.float32(1.0))

    single = {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    assert sorted(single) == keys
    for k in keys:
        np.testing.assert_allclose(single[k], got[0][k], atol=2e-5, err_msg=k)
