"""Utilities: scalar logging, timing."""

from dlsg_tpu.utils.logging import MetricsWriter  # noqa: F401
