"""Evaluation layer: room-acoustic metrics, spectral losses, evaluators, image metrics."""

from neraf_tpu.metrics.room_acoustics import (
    measure_rt60,
    measure_rt60_advance,
    measure_edt,
    measure_clarity,
    compute_t60,
    evaluate_edt,
    evaluate_clarity,
    batched_rt60,
    batched_edt,
    batched_clarity,
)
from neraf_tpu.metrics.losses import (
    spectral_convergence_loss,
    log_stft_magnitude_loss,
    stft_loss,
    spectral_loss,
)
from neraf_tpu.metrics.evaluators import RAFEvaluator, SoundSpacesEvaluator

# `lpips` is the metric FUNCTION (symmetric with psnr/ssim). The
# implementation lives in the `lpips_impl` submodule — deliberately NOT
# named `lpips`: a submodule of the same name would be rebound over this
# attribute by any later `import neraf_tpu.metrics.lpips`, silently turning
# the function into a module at call sites.
from neraf_tpu.metrics.image import lpips, psnr, ssim

__all__ = [
    "measure_rt60",
    "measure_rt60_advance",
    "measure_edt",
    "measure_clarity",
    "compute_t60",
    "evaluate_edt",
    "evaluate_clarity",
    "batched_rt60",
    "batched_edt",
    "batched_clarity",
    "spectral_convergence_loss",
    "log_stft_magnitude_loss",
    "stft_loss",
    "spectral_loss",
    "RAFEvaluator",
    "SoundSpacesEvaluator",
    "lpips",
    "psnr",
    "ssim",
]
