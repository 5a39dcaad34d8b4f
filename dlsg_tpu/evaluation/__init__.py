"""Evaluation: batched decoding, scoring, and best-result tracking."""

from dlsg_tpu.evaluation.evaluate import evaluate, make_decode_fn  # noqa: F401
from dlsg_tpu.evaluation.results import ResultHandler  # noqa: F401
