"""Signal-layer: QAM/OFDM modems, channels, RF impairments, fused datagen."""

from . import qam, ofdm, channel, impairments, datagen  # noqa: F401
from .datagen import DatagenConfig, synthetic_batch, test_batch_at_snr  # noqa: F401
from .channel import ChannelConfig  # noqa: F401
from .impairments import ImpairmentConfig  # noqa: F401
from .ofdm import OFDMSpec  # noqa: F401
