"""Multicore host batch assembly: worker processes + shared-memory slots.

The reference feeds its GPUs with 4 DataLoader worker processes
(`utils/data.py:115-130`). The rebuild's in-process `get_batch` path
(~2.3 GiB/s warm, BENCHMARKS.md "input pipeline") is enough wherever the
host->device link is the loop bound (this image's relay tunnel), but on a
co-located production host the single-core ~419 ms/batch assembly would
starve a ~112 ms train step. This module is the process-parallel equivalent:

- The unit of parallelism is a PROCESS, exactly like the reference's
  DataLoader: HDF5 serializes every call in a process under a library-global
  lock (and h5py holds its own on top), so threads cannot scale reads —
  each spawn worker rebuilds its own dataset (own file handles) from
  `dataset.spawn_spec()`.
- Workers assemble feature batches STRAIGHT into preallocated shared-memory
  slots via `dataset.read_batch_into` (zero pickling of the big arrays);
  small fields (captions, lengths, ids) ride the result queue. Slots are
  mmap-backed files under /dev/shm (falling back to the tmp dir) rather than
  `multiprocessing.shared_memory` — Python 3.12's resource tracker
  double-registers child attaches and warns at exit; a plain mmap has a
  deterministic lifecycle owned by this class.
- The parent yields batches in deterministic order — batch-for-batch
  identical to `loader.train_batches` because both consume
  `loader.epoch_batch_indices`.
- Yielded feature arrays are COPIES of the slot by default (`copy=True`):
  mutating a numpy array after `jax.device_put` is undefined behavior
  (PJRT may still be reading the host buffer), so slots are only reused
  once their contents are owned by the consumer. `copy=False` hands out
  direct slot views for consumers that fully materialize a batch before
  requesting the next one; the slot is reclaimed at the next `next()`.

Startup is lazy and persistent: workers spawn once and are reused across
epochs (`epoch_batches` can be called repeatedly); stale results from an
abandoned epoch generator are dropped by generation tag and their slots
recycled. Call `close()` (or use as a context manager) when done.
"""

from __future__ import annotations

import mmap
import multiprocessing as mp
import os
import queue as queue_mod
import tempfile
import traceback
from typing import Dict, Iterator, Optional

import numpy as np

from dlsg_tpu.data.loader import epoch_batch_indices


def _slot_dir() -> str:
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _map_slots(paths, layout, size):
    """mmap each slot file and build per-slot {field: ndarray} views."""
    maps, views = [], []
    for path in paths:
        fd = os.open(path, os.O_RDWR)
        try:
            m = mmap.mmap(fd, size)
        finally:
            os.close(fd)  # the mapping outlives the descriptor
        fields = {
            name: np.ndarray(shape, dtype=dtype, buffer=m, offset=offset)
            for name, offset, shape, dtype in layout
        }
        maps.append(m)
        views.append(fields)
    return maps, views


def _worker(spec, slot_paths, layout, slot_size, tasks, results, free):
    """Worker loop: rebuild the dataset, fill slots until the None sentinel."""
    try:
        cls, args = spec
        ds = cls(*args)
        _, views = _map_slots(slot_paths, layout, slot_size)
    except BaseException:
        results.put(("error", traceback.format_exc()))
        return
    while True:
        task = tasks.get()
        if task is None:
            return
        gen, seq, idxs = task
        slot = free.get()
        try:
            small = ds.read_batch_into(np.asarray(idxs, np.int64), **views[slot])
            # read_batch_into returns the buffers it filled too — the parent
            # reads those from its own views; ship only the small fields
            small = {k: v for k, v in small.items() if k not in views[slot]}
            results.put((gen, seq, slot, small))
        except BaseException:
            free.put(slot)  # don't leak the slot
            results.put(("error", traceback.format_exc()))
            return


class ParallelBatcher:
    """Process-parallel training batch assembly (see module docstring).

    Parameters
    ----------
    dataset : an object with ``spawn_spec()``, ``feature_slot_shapes(B)``,
        ``read_batch_into(idxs, **bufs)`` and ``__len__`` (CaptionDataset /
        EvalVideoDataset).
    batch_size : fixed batch size the slots are sized for (partial final
        batches with ``drop_remainder=False`` are sliced out of a full slot).
    num_workers : worker process count (the reference ships 4,
        utils/data.py:118).
    num_slots : shared-memory slots; default ``num_workers + 2`` (each worker
        holds at most one, the consumer at most one, one in flight).
    copy : yield owned copies of the feature arrays (safe default — see
        module docstring) vs direct slot views.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 2,
        num_slots: Optional[int] = None,
        copy: bool = True,
        result_timeout_s: float = 300.0,
    ):
        if num_workers < 1:
            raise ValueError(f"num_workers must be >= 1, got {num_workers}")
        self._n = len(dataset)
        self._batch_size = batch_size
        self._copy = copy
        self._timeout = result_timeout_s
        self._num_slots = num_slots or num_workers + 2
        self._gen = 0
        self._closed = False
        self._waited = 0.0

        shapes = dataset.feature_slot_shapes(batch_size)
        layout, offset = [], 0
        for name, (shape, dtype) in shapes.items():
            layout.append((name, offset, tuple(shape), np.dtype(dtype).str))
            offset += int(np.prod(shape)) * np.dtype(dtype).itemsize
        self._layout = layout

        self._tmpdir = tempfile.mkdtemp(prefix="dlsg_slots_", dir=_slot_dir())
        self._slot_paths = []
        for i in range(self._num_slots):
            path = os.path.join(self._tmpdir, f"slot_{i}")
            fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o600)
            try:
                os.ftruncate(fd, offset)
            finally:
                os.close(fd)
            self._slot_paths.append(path)
        self._maps, self._views = _map_slots(self._slot_paths, layout, offset)

        ctx = mp.get_context("spawn")  # never fork live HDF5/JAX state
        self._tasks = ctx.Queue()
        self._results = ctx.Queue()
        self._free = ctx.Queue()
        for slot in range(self._num_slots):
            self._free.put(slot)
        self._procs = [
            ctx.Process(
                target=_worker,
                args=(dataset.spawn_spec(), self._slot_paths, layout, offset,
                      self._tasks, self._results, self._free),
                daemon=True,
            )
            for _ in range(num_workers)
        ]
        for p in self._procs:
            p.start()

    # -- iteration ---------------------------------------------------------

    def epoch_batches(
        self,
        *,
        seed: int = 12,
        epoch: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        drop_remainder: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield the epoch's batches — identical content and order to
        ``loader.train_batches(dataset, ...)`` with the same arguments."""
        if self._closed:
            raise RuntimeError("ParallelBatcher is closed")
        order = epoch_batch_indices(
            self._n,
            self._batch_size,
            seed=seed,
            epoch=epoch,
            shard_index=shard_index,
            num_shards=num_shards,
            drop_remainder=drop_remainder,
        )
        self._gen += 1
        gen = self._gen
        for seq, idxs in enumerate(order):
            self._tasks.put((gen, seq, [int(i) for i in idxs]))
        return self._collect(gen, order)

    def _get_result(self):
        while True:
            try:
                item = self._results.get(timeout=min(5.0, self._timeout))
            except queue_mod.Empty:
                dead = [p.exitcode for p in self._procs if not p.is_alive()]
                if dead:
                    raise RuntimeError(
                        f"ParallelBatcher worker(s) died (exitcodes {dead})"
                    ) from None
                self._waited += 5.0
                if self._waited >= self._timeout:
                    raise TimeoutError(
                        f"no batch for {self._timeout:.0f}s with live workers"
                    ) from None
                continue
            self._waited = 0.0
            if item[0] == "error":
                raise RuntimeError(f"ParallelBatcher worker failed:\n{item[1]}")
            return item

    def _collect(self, gen, order):
        pending = {}
        held_slot = None  # slot backing the batch the consumer holds (copy=False)
        try:
            for seq in range(len(order)):
                while seq not in pending:
                    r_gen, r_seq, slot, small = self._get_result()
                    if r_gen != gen:  # stale result from an abandoned epoch
                        self._free.put(slot)
                        continue
                    pending[r_seq] = (slot, small)
                slot, small = pending.pop(seq)
                B = len(order[seq])
                batch = dict(small)
                for name, view in self._views[slot].items():
                    arr = view[:B]
                    batch[name] = arr.copy() if self._copy else arr
                if self._copy:
                    self._free.put(slot)
                else:
                    if held_slot is not None:
                        self._free.put(held_slot)
                    held_slot = slot
                yield batch
        finally:
            if held_slot is not None:
                self._free.put(held_slot)
            for slot, _ in pending.values():
                self._free.put(slot)

    # -- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        """Stop the workers and release the shared memory."""
        if self._closed:
            return
        self._closed = True
        for _ in self._procs:
            self._tasks.put(None)
        # keep recycling slots while workers wind down: after an abandoned
        # epoch a worker may be blocked on free.get() with a stale task in
        # hand — its result must be drained for it to reach the sentinel
        import time as _time

        deadline = _time.monotonic() + 10.0
        while any(p.is_alive() for p in self._procs) and _time.monotonic() < deadline:
            try:
                item = self._results.get(timeout=0.2)
            except queue_mod.Empty:
                continue
            if item[0] != "error":
                self._free.put(item[2])
        for p in self._procs:
            p.join(timeout=5.0)
            if p.is_alive():  # pragma: no cover - stuck worker
                p.terminate()
                p.join(timeout=5.0)
        self._views = []
        for m in self._maps:
            try:
                m.close()
            except BufferError:  # pragma: no cover - a copy=False view escaped
                pass  # memory is freed when the last view dies; file unlinked below
        self._maps = []
        for path in self._slot_paths:
            try:
                os.unlink(path)
            except FileNotFoundError:  # pragma: no cover
                pass
        try:
            os.rmdir(self._tmpdir)
        except OSError:  # pragma: no cover
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - best-effort safety net
        try:
            self.close()
        except Exception:
            pass
