"""Visualization & offline tooling: auralization, loudness maps, STFT panels."""

from neraf_tpu.viz.auralization import auralize, rir_from_log_stft
from neraf_tpu.viz.loudness import loudness_map, render_loudness_grid
from neraf_tpu.viz.panels import stft_comparison_panel, grid_top_view

__all__ = [
    "auralize",
    "rir_from_log_stft",
    "loudness_map",
    "render_loudness_grid",
    "stft_comparison_panel",
    "grid_top_view",
]
