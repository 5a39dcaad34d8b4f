"""Checkpoint save/restore roundtrip tests (orbax)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlsg_tpu import checkpoint as ckpt
from dlsg_tpu.train.optim import TrainState, make_optimizer


def _state(seed=0):
    params = {
        "w": jax.random.normal(jax.random.PRNGKey(seed), (4, 4)),
        "b": jnp.zeros((4,)),
    }
    return TrainState.create(params, make_optimizer(1e-3))


def test_model_save_restore(tmp_path):
    s = _state()
    ckpt.save_model(str(tmp_path), "best_CIDEr", s.params)
    restored = ckpt.restore_model(str(tmp_path), "best_CIDEr", s.params)
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(s.params["w"]))


def test_train_checkpoint_roundtrip(tmp_path):
    from dlsg_tpu.train.gan_lambda import init_lambda_state, lambda_update

    g = _state(0)
    d = _state(1)
    lstate = init_lambda_state(0.01)
    for loss in (3.0, 2.9, 2.8):
        lstate, _ = lambda_update(lstate, jnp.float32(loss))
    ckpt.save_train(str(tmp_path), epoch=3, gen_state=g, disc_state=d, lambda_state=lstate)
    assert ckpt.latest_epoch(str(tmp_path)) == 3

    g2 = _state(7)  # fresh template with different values
    d2 = _state(8)
    restored = ckpt.restore_train(str(tmp_path), 3, g2, d2, lambda_state=init_lambda_state(0.01))
    assert restored["epoch"] == 3
    np.testing.assert_allclose(
        np.asarray(restored["gen_state"].params["w"]), np.asarray(g.params["w"])
    )
    np.testing.assert_allclose(
        np.asarray(restored["disc_state"].params["w"]), np.asarray(d.params["w"])
    )
    rl = restored["gan_lambda_state"]
    assert int(rl["count"]) == 3
    np.testing.assert_allclose(np.asarray(rl["window"][:3]), [3.0, 2.9, 2.8])


def test_latest_epoch_empty(tmp_path):
    assert ckpt.latest_epoch(str(tmp_path / "nope")) is None


def test_train_checkpoint_roundtrip_tp_sharded(tmp_path):
    """save_train must handle a TENSOR-PARALLEL-sharded TrainState (device_get
    gathers the addressable shards), the step counter must roundtrip, and the
    restored state must re-shard cleanly with the TP rules — the exact
    sequence RunGAN runs on a (data, model) mesh: save mid-training, restore
    into a fresh state, _apply_tp_layout."""
    from dlsg_tpu.parallel.mesh import TP_RULES, make_mesh, shard_train_state

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "decoder": {"step": {"word_restore": {
            "kernel": jax.random.normal(jax.random.PRNGKey(0), (6, 16)),
            "bias": jnp.zeros((16,)),
        }}},
        "other": jnp.ones((3, 3)),
    }
    g = TrainState.create(params, make_optimizer(1e-3))
    g = shard_train_state(g, mesh, TP_RULES)
    g = g.replace(step=jnp.asarray(17, jnp.int32))
    from jax.sharding import PartitionSpec as P

    assert g.params["decoder"]["step"]["word_restore"]["kernel"].sharding.spec == P(None, "model")

    ckpt.save_train(str(tmp_path), epoch=2, gen_state=g)
    g2 = TrainState.create(jax.tree_util.tree_map(jnp.zeros_like, params), make_optimizer(1e-3))
    restored = ckpt.restore_train(str(tmp_path), 2, g2)["gen_state"]
    assert int(restored.step) == 17
    np.testing.assert_allclose(
        np.asarray(restored.params["decoder"]["step"]["word_restore"]["kernel"]),
        np.asarray(g.params["decoder"]["step"]["word_restore"]["kernel"]),
    )
    resharded = shard_train_state(restored, mesh, TP_RULES)
    assert resharded.params["decoder"]["step"]["word_restore"]["kernel"].sharding.spec == P(None, "model")
