"""Griffin-Lim phase recovery as a lax.scan loop.

Replaces torchaudio.transforms.GriffinLim (reference NeRAF_model.py:139, used
with power=1 i.e. magnitude input). Matches torchaudio's algorithm: momentum
0.99 (applied as momentum/(1+momentum)), 32 iterations, random phase init.
torchaudio seeds from the global torch RNG; here the caller passes an explicit
JAX PRNG key for determinism.

The whole loop — istft, stft, phase projection — runs fused under jit on
device, so synthesizing a batch of RIR waveforms from predicted magnitudes is
one XLA computation with no host round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from neraf_tpu.dsp.stft import istft, stft_complex

# 'auto' switches to the fused Pallas kernel at this many (..., F, T)
# channels — the measured v5e crossover vs the XLA matmul path (K-vs-1
# harness: 128ch xla wins; 256ch pallas 14.1 vs xla 17.9 ms; 512ch 29.7 vs
# 39.5; 1152ch 75 vs 134)
_PALLAS_MIN_CHANNELS = 256


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_iter", "length",
                     "momentum", "rand_init", "method"),
)
def griffin_lim(
    magnitude: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    key: jax.Array | None = None,
    rand_init: bool = True,
    method: str = "auto",
) -> jnp.ndarray:
    """Recover a waveform from a magnitude spectrogram.

    Args:
        magnitude: (..., F, T) non-negative magnitudes, F = n_fft//2+1.
        length: output waveform length; default (T-1)*hop.
        key: PRNG key for the random phase init (required if rand_init).
        method: 'auto' (default) selects 'pallas' when the batch has at
            least _PALLAS_MIN_CHANNELS channels AND the current backend
            compiles the fused VMEM-resident TPU kernel for this geometry
            (AOT-probed, cached; ~2.1x the matmul path on v5e at scale),
            else 'matmul'; 'matmul' runs the whole loop in real arithmetic with
            DFTs as MXU matmuls — fully fusable, no FFT custom-calls, no
            complex dtype; 'fft' uses jnp.fft (identical math); 'pallas'
            forces the fused kernel (ops/pallas/griffin_lim_kernel.py).
    Returns:
        (..., length) real waveform.
    """
    if win_length is None:
        win_length = n_fft
    if length is None:
        length = hop_length * (magnitude.shape[-1] - 1)
    mom = momentum / (1.0 + momentum)
    mag = magnitude.astype(jnp.float32)

    if method == "auto":
        from neraf_tpu.ops.pallas.griffin_lim_kernel import pallas_gl_available

        F_dim, T = magnitude.shape[-2:]
        n_channels = int(np.prod(magnitude.shape[:-2]))
        # the kernel requires length == hop*(T-1) (OLA scratch layout);
        # below _PALLAS_MIN_CHANNELS its per-dispatch overhead loses to the
        # XLA path (measured crossover between 128 and 256 channels)
        ok = (n_channels >= _PALLAS_MIN_CHANNELS
              and length == hop_length * (T - 1)
              and pallas_gl_available(n_fft, hop_length, win_length, F_dim,
                                      T, length, n_iter))
        method = "pallas" if ok else "matmul"

    if rand_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        ang0 = jax.random.uniform(key, magnitude.shape, dtype=jnp.float32) * (2 * jnp.pi)
        aR0, aI0 = jnp.cos(ang0), jnp.sin(ang0)
    else:
        aR0 = jnp.ones_like(mag)
        aI0 = jnp.zeros_like(mag)

    if method == "pallas":
        from neraf_tpu.ops.pallas.griffin_lim_kernel import griffin_lim_pallas

        return griffin_lim_pallas(
            mag, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            n_iter=n_iter, momentum=momentum, length=length,
            init_angles=(aR0, aI0))

    if method == "matmul":
        return _griffin_lim_matmul(mag, aR0, aI0, n_fft, hop_length, win_length,
                                   n_iter, mom, length)

    angles = (aR0 + 1j * aI0).astype(jnp.complex64)

    def project(angles):
        """One GL projection: spec -> waveform -> spec."""
        inverse = istft(mag * angles, n_fft=n_fft, hop_length=hop_length,
                        win_length=win_length, length=length)
        return stft_complex(inverse, n_fft=n_fft, hop_length=hop_length, win_length=win_length)

    def body(carry, _):
        angles, tprev = carry
        rebuilt = project(angles)
        new = rebuilt - mom * tprev
        new = new / jnp.maximum(jnp.abs(new), 1e-16)
        return (new, rebuilt), None

    init_tprev = jnp.zeros_like(angles)
    (angles, _), _ = jax.lax.scan(body, (angles, init_tprev), None, length=n_iter)

    return istft(mag * angles, n_fft=n_fft, hop_length=hop_length,
                 win_length=win_length, length=length)


def _griffin_lim_matmul(mag, aR0, aI0, n_fft, hop_length, win_length,
                        n_iter, mom, length):
    """GL loop in real arithmetic: DFTs as matmuls, strip-framing/OLA.

    Everything inside the scan body is matmul + elementwise + reshape — one
    fused XLA computation on the MXU with frames staying on-chip.
    """
    from neraf_tpu.dsp.stft import (
        _dft_matrices,
        _padded_window,
        overlap_add,
        spectrogram_frames,
        window_sum_squares,
    )

    Cr, Ci, Ar, Ai = _dft_matrices(n_fft)
    window = _padded_window(n_fft, win_length, jnp.float32)
    T = mag.shape[-1]
    wsq = window_sum_squares(n_fft, hop_length, win_length, T, length)
    pad = n_fft // 2

    def istft_ri(R, I):
        # (..., F, T) real/imag -> (..., length) signal
        fR = jnp.swapaxes(R, -1, -2)  # (..., T, F)
        fI = jnp.swapaxes(I, -1, -2)
        frames = (fR @ Ar + fI @ Ai) * window
        sig = overlap_add(frames, n_fft, hop_length)
        return sig[..., pad : pad + length] / wsq

    def stft_ri(x):
        frames = spectrogram_frames(x, n_fft, hop_length) * window  # (..., T, n_fft)
        R = frames @ Cr
        I = frames @ Ci
        return jnp.swapaxes(R, -1, -2), jnp.swapaxes(I, -1, -2)

    def body(carry, _):
        aR, aI, tR, tI = carry
        x = istft_ri(mag * aR, mag * aI)
        rR, rI = stft_ri(x)
        nR = rR - mom * tR
        nI = rI - mom * tI
        norm = jnp.maximum(jnp.sqrt(nR * nR + nI * nI), 1e-16)
        return (nR / norm, nI / norm, rR, rI), None

    init = (aR0, aI0, jnp.zeros_like(aR0), jnp.zeros_like(aI0))
    (aR, aI, _, _), _ = jax.lax.scan(body, init, None, length=n_iter)
    return istft_ri(mag * aR, mag * aI)
