"""Fused Griffin-Lim as a single Pallas TPU kernel.

The XLA matmul-DFT Griffin-Lim (dsp/griffin_lim.py) round-trips HBM between
ops of every iteration. This kernel keeps one block of RIR-channels resident
in VMEM for the entire 32-iteration loop: DFTs are MXU matmuls against
constant matrices, overlap-add and re-framing are static row-slice adds on a
VMEM scratch signal, and reflect padding is a constant reversal matmul (no
gathers — unsupported on this backend).

Constraints: hop must divide n_fft (true for both dataset geometries) and
win_length == n_fft is assumed by the window input (the caller passes the
zero-padded window, so any win_length works).

Matches the torchaudio-convention GL loop bit-for-bit within float tolerance
(see tests/test_pallas_gl.py parity check against the XLA path).

BACKEND STATUS: COMPILES AND RUNS on the v5e backend (2026-08-16). The
round-1 Mosaic crash (remote-compile HTTP 500, no diagnostic) was minimized
to one construct: a lane-axis concat of differently row-shifted VALUE slices
(see ops/pallas/gl_crash_repro.py). The reframe step now stages the padded
signal in a VMEM scratch and concats REF slices instead, which Mosaic
accepts. Production dispatch: dsp/griffin_lim.py method='auto' selects this
kernel when `pallas_gl_available(...)` confirms the current backend compiles
it for the requested geometry, else the XLA matmul-DFT path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neraf_tpu.dsp.stft import _dft_matrices_np, _wsq_np


def _reversal_matrix(n: int) -> np.ndarray:
    return np.eye(n, dtype=np.float32)[::-1].copy()


def _make_kernel(M_blk: int, F: int, T: int, n_fft: int, hop: int,
                 n_iter: int, mom: float, length: int):
    q = n_fft // hop
    rows = T + q - 1  # OLA signal rows of `hop` samples (padded domain)
    pad = n_fft // 2
    pad_rows = pad // hop  # rows consumed by the center padding

    def kernel(mag_ref, aR0_ref, aI0_ref, Cr_ref, Ci_ref, Ar_ref, Ai_ref,
               win_ref, wsq_ref, rev_ref, wav_ref,
               sig_scr, pad_scr, frames_scr, aR_scr, aI_scr, tR_scr, tI_scr):
        # mag/aR/aI: (M_blk, T, F) time-major; win: (1, n_fft);
        # wsq: (1, length); rev: (pad, pad); wav out: (M_blk, length)
        aR_scr[:] = aR0_ref[:]
        aI_scr[:] = aI0_ref[:]
        tR_scr[:] = jnp.zeros_like(tR_scr)
        tI_scr[:] = jnp.zeros_like(tI_scr)

        mag = mag_ref[:]
        win = win_ref[0, :]

        def synthesize(pR, pI):
            """(M,T,F) spec -> trimmed+normalized signal rows in sig_scr.

            Returns the (M, length) waveform view (padded-domain scratch is
            sig_scr reshaped to rows of hop samples).
            """
            flatR = pR.reshape(M_blk * T, F)
            flatI = pI.reshape(M_blk * T, F)
            frames = (
                jnp.dot(flatR, Ar_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(flatI, Ai_ref[:], preferred_element_type=jnp.float32)
            ) * win
            frames = frames.reshape(M_blk, T, n_fft)

            sig_scr[:] = jnp.zeros_like(sig_scr)
            for c in range(q):
                sig_scr[:, c : c + T, :] += frames[:, :, c * hop : (c + 1) * hop]
            return None

        def reframe():
            """sig_scr (padded-domain rows) -> windowed frames (M, T, n_fft).

            The trimmed signal is sig[pad : pad+length] normalized by wsq;
            re-framing reflect-pads it back to the padded domain. Interior
            frames read the (normalized) scratch directly; the `pad` samples
            at each end are rebuilt by reflecting the normalized edge.
            """
            sig = sig_scr[:].reshape(M_blk, rows * hop)
            core = sig[:, pad : pad + length] / wsq_ref[0, :]
            # reflect: left pad = core[1:pad+1] reversed; right = core[-pad-1:-1] reversed
            left = jnp.dot(core[:, 1 : pad + 1], rev_ref[:],
                           preferred_element_type=jnp.float32)
            right = jnp.dot(core[:, length - pad - 1 : length - 1], rev_ref[:],
                            preferred_element_type=jnp.float32)
            # Stage the padded signal in a scratch, then copy row-shifted
            # strips Ref->Ref into a frames scratch (NO concat): Mosaic
            # crashes (remote-compile HTTP 500) on a lane-axis concat of
            # differently row-shifted slices — value slices always, ref
            # slices whenever the lane dim exceeds 128 (hop=256, RAF) — but
            # accepts shifted strip copies between Refs at any hop. See
            # ops/pallas/gl_crash_repro.py for the minimized repro.
            pad_scr[:, 0:pad_rows, :] = left.reshape(M_blk, pad_rows, hop)
            pad_scr[:, pad_rows : pad_rows + T - 1, :] = core.reshape(
                M_blk, T - 1, hop)
            pad_scr[:, pad_rows + T - 1 : rows, :] = right.reshape(
                M_blk, pad_rows, hop)
            # strip framing: rows of hop samples, frame f = rows f..f+q-1
            for c in range(q):
                frames_scr[:, :, c * hop : (c + 1) * hop] = pad_scr[:, c : c + T, :]
            return frames_scr[:] * win

        def body(i, _):
            pR = mag * aR_scr[:]
            pI = mag * aI_scr[:]
            synthesize(pR, pI)
            frames = reframe()
            flat = frames.reshape(M_blk * T, n_fft)
            rR = jnp.dot(flat, Cr_ref[:], preferred_element_type=jnp.float32)
            rI = jnp.dot(flat, Ci_ref[:], preferred_element_type=jnp.float32)
            rR = rR.reshape(M_blk, T, F)
            rI = rI.reshape(M_blk, T, F)
            nR = rR - mom * tR_scr[:]
            nI = rI - mom * tI_scr[:]
            norm = jnp.maximum(jnp.sqrt(nR * nR + nI * nI), 1e-16)
            aR_scr[:] = nR / norm
            aI_scr[:] = nI / norm
            tR_scr[:] = rR
            tI_scr[:] = rI
            return 0

        jax.lax.fori_loop(0, n_iter, body, 0)

        synthesize(mag * aR_scr[:], mag * aI_scr[:])
        sig = sig_scr[:].reshape(M_blk, rows * hop)
        wav_ref[:] = sig[:, pad : pad + length] / wsq_ref[0, :]

    return kernel, rows


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_iter",
                     "momentum", "length", "block", "interpret"),
)
def griffin_lim_pallas(
    magnitude: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    n_iter: int = 32,
    momentum: float = 0.99,
    length: int | None = None,
    key: jax.Array | None = None,
    block: int = 8,
    init_angles: tuple | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in GL with the loop fused in VMEM. magnitude: (..., F, T).

    init_angles: optional ((..., F, T) cos, (..., F, T) sin) initial phases —
    used by parity tests to share the init with the XLA path.
    """
    assert n_fft % hop_length == 0, "pallas GL needs hop | n_fft"
    if win_length is None:
        win_length = n_fft
    F_dim, T = magnitude.shape[-2:]
    lead = magnitude.shape[:-2]
    if length is None:
        length = hop_length * (T - 1)
    mom = momentum / (1.0 + momentum)
    pad = n_fft // 2
    assert pad % hop_length == 0

    M = int(np.prod(lead)) if lead else 1
    mag = magnitude.reshape(M, F_dim, T).transpose(0, 2, 1)  # (M, T, F)

    if init_angles is not None:
        aR0 = init_angles[0].reshape(M, F_dim, T).transpose(0, 2, 1)
        aI0 = init_angles[1].reshape(M, F_dim, T).transpose(0, 2, 1)
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        ang = jax.random.uniform(key, (M, T, F_dim), dtype=jnp.float32) * (2 * np.pi)
        aR0, aI0 = jnp.cos(ang), jnp.sin(ang)

    # pad M to a multiple of block
    M_pad = (-M) % block
    if M_pad:
        z = jnp.zeros((M_pad, T, F_dim), jnp.float32)
        mag = jnp.concatenate([mag, z], 0)
        aR0 = jnp.concatenate([aR0, jnp.ones_like(z)], 0)
        aI0 = jnp.concatenate([aI0, z], 0)
    Mp = M + M_pad

    Cr, Ci, Ar, Ai = _dft_matrices_np(n_fft)

    # lane-align the frequency axis (Mosaic chokes on unaligned reshapes):
    # pad F to a multiple of 128 with zero magnitude + zero DFT rows/cols —
    # the padded bins carry no energy and never influence the signal.
    F_al = -(-F_dim // 128) * 128
    if F_al != F_dim:
        fpad = F_al - F_dim
        zf = jnp.zeros((Mp, T, fpad), jnp.float32)
        mag = jnp.concatenate([mag, zf], -1)
        aR0 = jnp.concatenate([aR0, jnp.ones_like(zf)], -1)
        aI0 = jnp.concatenate([aI0, zf], -1)
        Cr = np.pad(Cr, ((0, 0), (0, fpad)))
        Ci = np.pad(Ci, ((0, 0), (0, fpad)))
        Ar = np.pad(Ar, ((0, fpad), (0, 0)))
        Ai = np.pad(Ai, ((0, fpad), (0, 0)))
    F_dim = F_al
    # fold the analysis window into the forward-DFT matrices
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        w = np.pad(w, (left, n_fft - win_length - left))
    w = w.astype(np.float32)
    wsq = np.asarray(_wsq_np(n_fft, hop_length, win_length, T, length),
                     dtype=np.float32)
    rev = _reversal_matrix(pad)

    kernel, rows = _make_kernel(block, F_dim, T, n_fft, hop_length,
                                n_iter, mom, length)

    out = pl.pallas_call(
        kernel,
        grid=(Mp // block,),
        in_specs=[
            pl.BlockSpec((block, T, F_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # mag
            pl.BlockSpec((block, T, F_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # aR0
            pl.BlockSpec((block, T, F_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # aI0
            pl.BlockSpec((n_fft, F_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, F_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F_dim, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F_dim, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fft), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, length), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((pad, pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, length), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, length), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, rows, hop_length), jnp.float32),  # signal
            pltpu.VMEM((block, rows, hop_length), jnp.float32),  # padded reframe
            pltpu.VMEM((block, T, n_fft), jnp.float32),  # reframed strips
            pltpu.VMEM((block, T, F_dim), jnp.float32),  # aR
            pltpu.VMEM((block, T, F_dim), jnp.float32),  # aI
            pltpu.VMEM((block, T, F_dim), jnp.float32),  # tR
            pltpu.VMEM((block, T, F_dim), jnp.float32),  # tI
        ],
        interpret=interpret,
        # the kernel sits near the default 16 MB scoped-vmem budget once XLA
        # double-buffers its block inputs inside a larger jit; raise the cap
        # (v5e has 128 MB VMEM) so inlining into eval sweeps can't stack-OOM
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(mag, aR0, aI0, jnp.asarray(Cr), jnp.asarray(Ci), jnp.asarray(Ar),
      jnp.asarray(Ai), jnp.asarray(w)[None, :], jnp.asarray(wsq)[None, :],
      jnp.asarray(rev))

    return out[:M].reshape(*lead, length) if lead else out[0]


@functools.lru_cache(maxsize=None)
def pallas_gl_available(n_fft: int, hop_length: int, win_length: int,
                        n_freq: int, n_frames: int, length: int | None = None,
                        n_iter: int = 32, block: int = 8) -> bool:
    """True iff the fused kernel compiles on the current backend for this
    exact geometry (the skip-unless-compiles canary; cached per geometry).

    Probes an ahead-of-time compile of the real kernel — not a heuristic —
    so a backend regression (or fix) flips dispatch automatically.
    """
    import jax

    if jax.default_backend() != "tpu":
        return False
    if n_fft % hop_length or (n_fft // 2) % hop_length:
        return False  # kernel preconditions
    try:
        mag = jax.ShapeDtypeStruct((block, n_freq, n_frames), jnp.float32)
        key = jax.ShapeDtypeStruct((2,), jnp.uint32)
        griffin_lim_pallas.lower(
            mag, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            n_iter=n_iter, length=length, key=key, block=block).compile()
        return True
    except Exception:
        return False
