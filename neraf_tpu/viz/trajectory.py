"""Trajectory audio-visual rendering (viz/video.ipynb equivalent).

The reference's video flow: a hand-crafted camera/mic trajectory is rendered
to per-pose STFTs via AVN_RENDER_POSES + ns-eval, each STFT becomes an RIR via
Griffin-Lim, and the moving-listener audio track is dry music convolved with
the time-varying RIRs using 50%-overlap Hann crossfades; frames are muxed with
ffmpeg. This module provides:

- make_trajectory_poses / save_trajectory_npy: build + serialize the pose file
  consumed by `AVN_RENDER_POSES=poses.npy neraf-eval` (RAF .npy dict format,
  reference NeRAF_dataparser.py:245-259),
- moving_listener_audio: the overlap-add time-varying convolution,
- assemble_video_cmd: the ffmpeg mux command (ffmpeg is not shipped in this
  environment; the command string is emitted for the user to run).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax.numpy as jnp

from neraf_tpu.dsp.filters import fft_convolve


def make_trajectory_poses(waypoints: np.ndarray, n_steps: int,
                          source_pose: np.ndarray, rot_deg: float = 0.0) -> dict:
    """Interpolate mic positions along waypoints -> AVN_RENDER_POSES dict.

    Args:
        waypoints: (K, 3) control points; linearly interpolated.
        source_pose: (3,) fixed source position.
    Returns:
        {'mic_poses': (n_steps, 3), 'source_poses': (3,), 'rots': (3,)}.
    """
    waypoints = np.asarray(waypoints, dtype=np.float64)
    k = waypoints.shape[0]
    seg = np.linspace(0, k - 1, n_steps)
    i0 = np.clip(np.floor(seg).astype(int), 0, k - 2)
    frac = (seg - i0)[:, None]
    mic = waypoints[i0] * (1 - frac) + waypoints[i0 + 1] * frac

    rad = np.deg2rad(rot_deg)
    rot = (np.array([np.cos(rad), 0.0, np.sin(rad)]) + 1.0) / 2.0
    return {
        "mic_poses": mic,
        "source_poses": np.asarray(source_pose, dtype=np.float64),
        "rots": rot,
    }


def save_trajectory_npy(poses: dict, path: str | Path) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, poses, allow_pickle=True)
    return path


def moving_listener_audio(dry: np.ndarray, rirs: np.ndarray, fs: int,
                          frame_rate: float = 10.0) -> np.ndarray:
    """Time-varying convolution with 50%-overlap Hann crossfades.

    The dry signal is chopped into windows of 2/frame_rate seconds hopped by
    1/frame_rate; window i is convolved with the RIR at trajectory step i and
    the wet windows are overlap-added — the reference video notebook's
    technique for a moving listener.

    Args:
        dry: (L,) mono dry signal.
        rirs: (N, C, Lr) per-step RIRs (N >= number of hops used).
    Returns:
        (C, L_out) wet audio.
    """
    dry = np.asarray(dry, dtype=np.float32)
    rirs = np.asarray(rirs, dtype=np.float32)
    n_steps, n_ch, lr = rirs.shape

    hop = int(fs / frame_rate)
    win = 2 * hop
    window = np.hanning(win).astype(np.float32)

    n_hops = min(n_steps, max(1, (len(dry) - win) // hop + 1))
    out_len = (n_hops - 1) * hop + win + lr - 1
    out = np.zeros((n_ch, out_len), dtype=np.float32)

    for i in range(n_hops):
        seg = dry[i * hop : i * hop + win]
        if len(seg) < win:
            seg = np.pad(seg, (0, win - len(seg)))
        seg = seg * window
        wet = np.asarray(fft_convolve(jnp.asarray(seg)[None, :], jnp.asarray(rirs[i])))
        out[:, i * hop : i * hop + win + lr - 1] += wet
    return out


def assemble_video_cmd(frames_glob: str, audio_wav: str, out_mp4: str,
                       frame_rate: float = 10.0) -> str:
    """The ffmpeg command that muxes rendered frames with the audio track."""
    return (f"ffmpeg -framerate {frame_rate} -pattern_type glob -i '{frames_glob}' "
            f"-i '{audio_wav}' -c:v libx264 -pix_fmt yuv420p -c:a aac -shortest {out_mp4}")
