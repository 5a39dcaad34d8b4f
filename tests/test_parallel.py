"""Multi-device SPMD tests over the 8-way virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu.parallel.mesh import DATA_AXIS, batch_sharding, make_mesh, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape[DATA_AXIS] == 8
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    batch = {"x": np.ones((16, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (2, 3)


def test_sharded_grad_matches_single_device():
    """A jitted loss/grad over a batch-sharded input must equal the
    single-device result — XLA's inserted allreduce replaces DDP."""
    mesh = make_mesh()
    w = jnp.arange(12.0).reshape(3, 4) / 10.0
    x = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    expected = jax.grad(loss)(w, jnp.asarray(x))
    x_sharded = jax.device_put(x, batch_sharding(mesh))
    got = jax.jit(jax.grad(loss))(w, x_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip validation path: full GAN step over the mesh."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "_graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_eval_matches_single_device():
    """An 8-device mesh eval must decode the identical captions (and scores)
    as the single-device path — the replacement for the reference's 4-GPU
    eval fan-in (evaluate.py:101-134, run_gun.py:269-281)."""
    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.data.loader import eval_batches
    from dlsg_tpu.data.synthetic import SyntheticDataset, make_vocab
    from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    cfg = tiny_test_config(test_batch_size=8, beam_size=2)
    vocab = make_vocab()
    ds = SyntheticDataset(cfg, vocab, num_videos=12, captions_per_video=1)
    model = CapGnnModel(cfg, len(vocab))
    b0 = next(eval_batches(ds.eval_view(), cfg.test_batch_size))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(b0["frames"]),
        jnp.asarray(b0["regions"]),
        jnp.zeros((cfg.test_batch_size, cfg.max_words), jnp.int32),
    )

    single = make_decode_fn(model, cfg, return_alpha=True)
    mesh = make_mesh()  # 8-way data axis
    sharded = make_decode_fn(model, cfg, return_alpha=True, mesh=mesh)

    s1, r1, a1, _ = evaluate(
        single, variables, eval_batches(ds.eval_view(), cfg.test_batch_size),
        vocab, ds.references,
    )
    with mesh:
        s8, r8, a8, _ = evaluate(
            sharded, variables, eval_batches(ds.eval_view(), cfg.test_batch_size),
            vocab, ds.references,
        )
    assert r1 == r8  # identical captions, video by video
    np.testing.assert_allclose(a1, a8, atol=2e-5)
    for k in s1:
        assert s1[k] == pytest.approx(s8[k], abs=1e-9), k


def test_tp_param_sharding():
    """Vocab projection sharded over the model axis; loss matches replicated."""
    import jax.numpy as jnp

    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.parallel.mesh import make_mesh, param_sharding_specs, shard_params
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = tiny_test_config(train_batch_size=4)
    model = CapGnnModel(cfg, 64)
    B = 4
    frames = jnp.ones((B, cfg.max_frames, cfg.feature_size))
    regions = jnp.ones((B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size))
    caps = jnp.ones((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, regions, caps)["params"]

    specs = param_sharding_specs(params)
    wr = specs["decoder"]["step"]["word_restore"]["kernel"]
    assert wr == P(None, "model")

    sharded = shard_params(params, mesh)
    out_repl, *_ = model.apply({"params": params}, frames, regions, caps)
    with mesh:
        out_tp, *_ = jax.jit(
            lambda p: model.apply({"params": p}, frames, regions, caps)
        )(sharded)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_repl), atol=2e-5)


def test_tp_sharded_beam_decode_matches_replicated():
    """Full beam-search DECODE under TP-sharded params (vocab head split over
    the model axis) must reproduce the replicated decode token-for-token —
    the inference side of the dp x tp layout (the per-step vocab matmul runs
    column-sharded; XLA all-gathers the logits for top-k)."""
    import jax.numpy as jnp

    from dlsg_tpu.config import tiny_test_config
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.parallel.mesh import make_mesh, shard_params

    mesh = make_mesh(n_data=4, n_model=2)
    cfg = tiny_test_config(test_batch_size=4, beam_size=2)
    model = CapGnnModel(cfg, 64)
    B = 4
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=(B, cfg.max_frames, cfg.feature_size)), jnp.float32)
    regions = jnp.asarray(
        rng.normal(size=(B, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    caps = jnp.ones((B, cfg.max_words), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames, regions, caps)["params"]

    decode_repl = make_decode_fn(model, cfg, beam_size=cfg.beam_size)
    ids_repl = np.asarray(decode_repl({"params": params}, frames, regions))

    sharded = shard_params(params, mesh)
    decode_tp = make_decode_fn(model, cfg, beam_size=cfg.beam_size, mesh=mesh)
    ids_tp = np.asarray(decode_tp({"params": sharded}, frames, regions))
    np.testing.assert_array_equal(ids_tp, ids_repl)
