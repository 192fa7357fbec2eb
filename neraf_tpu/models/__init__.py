"""Models: acoustic model, Nerfacto-class vision model, ResNet3D scene encoder."""

from neraf_tpu.models.audio import AudioModel

__all__ = ["AudioModel"]
