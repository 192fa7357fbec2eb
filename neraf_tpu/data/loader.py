"""Device-side batch sampling for STFT-slice training.

Replaces the reference's torch DataLoader + infinite-iterator machinery
(NeRAF_datamanager.py:84-133). With the whole split resident in HBM
(datasets.py), a train batch is: draw (recording, time_bin) indices with the
JAX PRNG, gather poses and STFT columns — all inside jit, so batch prep fuses
into the train step and costs ~nothing. Shapes are fully static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("batch_size", "max_len"))
def sample_audio_batch(
    key: jax.Array,
    arrays: dict,
    batch_size: int,
    max_len: int,
) -> dict:
    """Draw a uniform batch over the (recording x time_bin) index space.

    arrays: dict with mic_pose/source_pose/rot (N,3) and log_stft (N,C,F,T).
    Returns batch dict with data (B,C,F) and time_query (B,).
    """
    n_rec = arrays["log_stft"].shape[0]
    idx = jax.random.randint(key, (batch_size,), 0, n_rec * max_len)
    rec = idx // max_len
    t = idx % max_len
    return gather_audio_batch(arrays, rec, t)


@jax.jit
def gather_audio_batch(arrays: dict, rec: jnp.ndarray, t: jnp.ndarray) -> dict:
    """Gather a batch given explicit (recording, time_bin) indices."""
    data = arrays["log_stft"][rec, :, :, t]  # (B, C, F)
    return {
        "audio_idx": rec,
        "data": data,
        "time_query": t,
        "mic_pose": arrays["mic_pose"][rec],
        "source_pose": arrays["source_pose"][rec],
        "rot": arrays["rot"][rec],
    }


def resolve_audio_batch(key: jax.Array, audio_in: dict, batch_size: int,
                        max_len: int) -> dict:
    """HBM-resident arrays OR a pre-streamed batch -> full batch dict.

    Two accepted structures, distinguished at trace time by dict keys:
    - {"log_stft" (N,C,F,T), poses (N,3)}: whole split in HBM; draw
      (recording, time_bin) with the jax PRNG and gather in-jit, fusing
      batch prep into the train step (loader.sample_audio_batch).
    - {"data" (B,C,F), "audio_idx" (B,), "time_query" (B,), poses (N,3)}:
      the streaming path (data/streaming.py) — STFT columns were gathered
      host-side; only the tiny pose tables are gathered in-jit.
    """
    if "log_stft" in audio_in:
        return sample_audio_batch(key, audio_in, batch_size, max_len)
    rec = audio_in["audio_idx"]
    return {
        "audio_idx": rec,
        # streamed data may arrive bf16 (StreamingAudioSampler
        # transfer_dtype); losses/metrics expect fp32 — upcast in-jit
        "data": audio_in["data"].astype(jnp.float32),
        "time_query": audio_in["time_query"],
        "mic_pose": audio_in["mic_pose"][rec],
        "source_pose": audio_in["source_pose"][rec],
        "rot": audio_in["rot"][rec],
    }


class AudioBatchSampler:
    """Stateful convenience wrapper: owns the PRNG chain for batch draws."""

    def __init__(self, arrays: dict, batch_size: int, max_len: int, seed: int = 0):
        self.arrays = arrays
        self.batch_size = batch_size
        self.max_len = max_len
        self._key = jax.random.PRNGKey(seed)

    def next(self) -> dict:
        self._key, sub = jax.random.split(self._key)
        return sample_audio_batch(sub, self.arrays, self.batch_size, self.max_len)
