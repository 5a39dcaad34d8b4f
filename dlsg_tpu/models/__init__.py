"""Model zoo: generator (CapGnnModel family), discriminator (DiscV2), encoders."""

from dlsg_tpu.models.generator import (  # noqa: F401
    CapGnnModel,
    CapModel,
    CapBaselineModel,
    CapBaseline1,
)
from dlsg_tpu.models.discriminator import DiscV2  # noqa: F401
