"""Utilities: logging/metrics writer, profiling helpers, wav IO."""

from neraf_tpu.utils.writer import MetricsWriter
from neraf_tpu.utils.wav import read_wav, write_wav

__all__ = ["MetricsWriter", "read_wav", "write_wav"]
