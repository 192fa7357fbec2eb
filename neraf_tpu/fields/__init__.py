"""Neural fields: acoustic sound field, radiance (Nerfacto-class) field, proposal density fields."""

from neraf_tpu.fields.acoustic import AcousticSoundField

__all__ = ["AcousticSoundField"]
