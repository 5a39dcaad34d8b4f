"""Host-side data pipeline: HDF5/pickle readers, batching, synthetic data."""

from dlsg_tpu.data.datasets import CaptionDataset, EvalVideoDataset  # noqa: F401
from dlsg_tpu.data.loader import train_batches, eval_batches  # noqa: F401
from dlsg_tpu.data.parallel_loader import ParallelBatcher  # noqa: F401
