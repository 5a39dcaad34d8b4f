"""Worker process for tests/test_multihost.py.

Joins a 2-process jax.distributed CPU cluster (2 virtual devices per process ->
4 global devices), trains `CapBaseline1` for a few CE steps over its OWN data
shard with the SAME multi-host plumbing the trainers use
(`train_batches(shard_index=...)` -> `globalize_batch` -> jitted step over the
global mesh), then writes the final parameters so the parent can assert they
(a) are identical across both processes and (b) match a single-process run
over the reassembled global batches.

Also exercises the eval fan-in (`_gather_across_hosts`).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    proc_id, nprocs, port, out = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    import jax

    jax.distributed.initialize(
        f"127.0.0.1:{port}", num_processes=nprocs, process_id=proc_id
    )
    assert jax.process_count() == nprocs
    assert len(jax.local_devices()) == 2 and len(jax.devices()) == 2 * nprocs

    import jax.numpy as jnp

    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.data.loader import train_batches
    from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
    from dlsg_tpu.models.generator import CapBaseline1
    from dlsg_tpu.parallel.mesh import globalize_batch, make_mesh
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_ce_train_step

    # dropout=0 so the comparison is free of partitioned-RNG layout effects
    cfg = tiny_test_config(dropout=0.0, rng_impl="threefry2x32", train_batch_size=2)
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=16)
    mesh = make_mesh()  # all 4 global devices on the data axis

    model = CapBaseline1(cfg, len(vocab))
    s0 = ds[0]
    params = model.init(
        jax.random.PRNGKey(0),
        s0["frames"][None],
        s0["regions"][None, :, : cfg.num_obj],
        s0["captions"][None, : cfg.max_words],
    )["params"]
    state = TrainState.create(params, make_optimizer(cfg.learning_rate))
    step = make_ce_train_step(model, cfg, mesh)
    rng = jax.random.key(cfg.seed, impl="threefry2x32")

    losses = []
    for batch in train_batches(
        ds, cfg.train_batch_size, seed=cfg.seed, epoch=0,
        shard_index=proc_id, num_shards=nprocs,
    ):
        local = {
            "frames": batch["frames"],
            "regions": batch["regions"][:, :, : cfg.num_obj],
            "captions": batch["captions"][:, : cfg.max_words],
            "lengths": batch["lengths"],
        }
        gbatch = globalize_batch(local, mesh)
        state, metrics = step(state, gbatch, rng, jnp.float32(1.0))
        losses.append(float(metrics["cap_loss"]))

    flat = {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    np.savez(out, losses=np.asarray(losses), **flat)

    # eval fan-in: disjoint per-process payloads must merge identically
    from dlsg_tpu.evaluation.evaluate import _gather_across_hosts

    n = 3 + proc_id  # deliberately ragged across processes
    ids = np.full((n, 4), proc_id, np.int32)
    vids = np.arange(n) + 100 * proc_id
    alphas = np.full((n, 4, 2), float(proc_id) + 0.5, np.float32)
    g_ids, g_vids, g_alpha = _gather_across_hosts(ids, vids, alphas)
    assert g_vids.shape[0] == sum(3 + p for p in range(nprocs)), g_vids
    assert set(g_vids.tolist()) == {
        v for p in range(nprocs) for v in (np.arange(3 + p) + 100 * p).tolist()
    }
    # alpha rows travel with their vids (same keep-mask)
    assert g_alpha.shape == (g_vids.shape[0], 4, 2)
    for v, a in zip(g_vids, g_alpha):
        assert float(a[0, 0]) == (v // 100) + 0.5, (v, a[0, 0])

    # the REAL evaluate() pipeline, process-sharded + cross-host gathered:
    # every process must score the full merged set (identical everywhere)
    from dlsg_tpu.data.loader import eval_batches
    from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn

    eval_ds = ds.eval_view()
    decode_fn = make_decode_fn(model, cfg, beam_size=1)
    eval_iter = eval_batches(
        eval_ds, 4, shard_index=proc_id, num_shards=nprocs
    )
    scores, result, _, _ = evaluate(
        decode_fn,
        {"params": state.params},
        eval_iter,
        vocab,
        ds.references,
        cross_host_gather=True,
    )
    assert len(result) == len(eval_ds), (len(result), len(eval_ds))

    # the TRAINER's in-training eval path: decode_fn jitted over the LOCAL
    # eval mesh while the params are committed to the GLOBAL train mesh
    # (trainer.py _run_eval_inner) — without reshard_for_local_eval this
    # raises 'Received incompatible devices for jitted computation'
    from dlsg_tpu.evaluation.evaluate import reshard_for_local_eval

    eval_mesh = make_mesh(devices=jax.local_devices())
    decode_local = make_decode_fn(model, cfg, beam_size=1, mesh=eval_mesh)
    local_vars = reshard_for_local_eval({"params": state.params}, eval_mesh)
    scores2, result2, _, _ = evaluate(
        decode_local,
        local_vars,
        eval_batches(eval_ds, 4, shard_index=proc_id, num_shards=nprocs),
        vocab,
        ds.references,
        cross_host_gather=True,
    )
    assert result2 == result, "local-eval-mesh decode diverged"
    assert scores2 == scores

    # an EMPTY per-process eval shard must still participate in the fan-in
    # (eval set smaller than the process count): give process 1 a stride that
    # selects nothing while process 0 decodes the full set
    empty_iter = eval_batches(
        eval_ds, 8, shard_index=(9 if proc_id else 0), num_shards=(16 if proc_id else 1)
    )
    scores3, result3, _, _ = evaluate(
        decode_local,
        local_vars,
        empty_iter,
        vocab,
        ds.references,
        cross_host_gather=True,
    )
    assert len(result3) == len(eval_ds), (len(result3), len(eval_ds))
    with open(str(out) + f".scores", "w") as f:
        f.write(repr(sorted(scores.items())))
    print("WORKER OK", proc_id)


if __name__ == "__main__":
    main()
