"""neraf_tpu: TPU-native joint neural radiance + acoustic field framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NeRAF
(AmandineBtto/NeRAF, ICLR 2025) plus the nerfstudio substrate it runs on:

- ``neraf_tpu.dsp``      — STFT / iSTFT / Griffin-Lim / filters / resampling
- ``neraf_tpu.metrics``  — room acoustics (T60/EDT/C50), spectral losses, image metrics
- ``neraf_tpu.ops``      — encodings (NeRF PE, SH, multires hash grid), samplers,
                           volume rendering, Pallas kernels
- ``neraf_tpu.fields``   — radiance + acoustic neural fields
- ``neraf_tpu.models``   — Nerfacto-class vision model, acoustic model, ResNet3D
- ``neraf_tpu.data``     — RAF / SoundSpaces dataparsers, datasets, device loaders
- ``neraf_tpu.engine``   — train loop, optimizers, checkpointing, pipeline
- ``neraf_tpu.parallel`` — mesh/sharding utilities (SPMD over TPU ICI)
- ``neraf_tpu.cli``      — neraf-train / neraf-eval / neraf-render entry points

The compute path is pure-functional JAX compiled with jit/pjit; state (params,
optimizer states, the baked scene grid, cursors, PRNG keys) lives in explicit
pytrees threaded through compiled step functions.
"""

__version__ = "0.1.0"
