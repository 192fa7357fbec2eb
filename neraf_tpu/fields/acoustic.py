"""Neural acoustic sound field (NAcF).

The conditional MLP that maps an encoded (mic pose, source pose, orientation,
STFT time index, scene feature) query to one STFT time-frame of per-channel
log-magnitudes. Architecture mirrors the reference NeRAFAudioSoundField
(NeRAF_field.py:37-65): 5 Linear layers in->5096->2048->1024->1024->W with
LeakyReLU(0.1), then one Linear(W, n_freq) head per channel with tanh(h)*10
output (log-magnitudes clamped to [-10, 10] — a faithful reference quirk).

TPU notes: the batch dimension (2048 STFT slices) times the 5096-wide first
layer keeps the MXU busy; the whole stack is three-ish large matmuls that XLA
fuses with the activations. The hidden widths are kept identical to the
reference for capacity parity (XLA pads 5096 -> MXU tiles internally).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class AcousticSoundField(nn.Module):
    """MLP sound field.

    Attributes:
        hidden_w: width of the final trunk layer (reference W_field=512).
        sound_rez: number of output audio channels (1 mono RAF, 2 binaural SS).
        n_frequencies: STFT frequency bins per channel.
    """

    hidden_w: int = 512
    sound_rez: int = 2
    n_frequencies: int = 257
    param_dtype: jnp.dtype = jnp.float32
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 under mixed precision)

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        """h: (B, in_size) encoded query -> (B, sound_rez, n_frequencies) log-mags."""
        widths = (5096, 2048, 1024, 1024, self.hidden_w)
        for i, w in enumerate(widths):
            h = nn.Dense(w, name=f"trunk_{i}", param_dtype=self.param_dtype,
                         dtype=self.dtype)(h)
            h = nn.leaky_relu(h, negative_slope=0.1)

        feat = h
        outs = []
        for ch in range(self.sound_rez):
            o = nn.Dense(self.n_frequencies, name=f"stft_head_{ch}",
                         param_dtype=self.param_dtype, dtype=self.dtype)(feat)
            outs.append(jnp.tanh(o) * 10.0)
        return jnp.stack(outs, axis=-2)
