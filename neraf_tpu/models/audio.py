"""Acoustic-field model: query encoding, forward, losses, full-RIR inference.

Functional port of the reference NeRAFAudioModel (NeRAF_model.py:104-805)
behavior:

- pose normalization into the audio AABB with out-of-box zeroing
  (NeRAF_model.py:541-546),
- NeRF PE for time (1-D, 10 freqs) and positions (3-D, 10 freqs), SH-4 for
  orientation (NeRAF_model.py:158-167),
- optional scene-grid conditioning: the 7x128^3 grid is encoded by a 3D
  ResNet into one n_features-D descriptor broadcast over the batch
  (NeRAF_model.py:553-560) — note the descriptor is *identical for every
  query in the batch*; it is computed once per step, outside this module's
  per-query path,
- SC+LogMag loss with the reference's exact weighting
  (audio_sc_loss * 1e-1 * loss_factor + audio_mag_loss * 1.0 * loss_factor,
  NeRAF_model.py:594-599),
- full-RIR inference as one batched sweep over all time bins
  (NeRAF_model.py:646-692) — on TPU this is a single (max_len, in_dim) matmul
  stack, no loops.

All functions are pure; parameters/state live in pytrees owned by the engine.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from neraf_tpu.configs.config import AudioModelConfig
from neraf_tpu.fields.acoustic import AcousticSoundField
from neraf_tpu.metrics.losses import stft_loss
from neraf_tpu.ops.encodings import nerf_encoding, nerf_encoding_dim, sh_encoding, SH_DIM

TIME_ENC_DIM = nerf_encoding_dim(1, 10)  # 21
POS_ENC_DIM = nerf_encoding_dim(3, 10)  # 63


def normalize_positions(pos: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """SceneBox.get_normalized_positions + out-of-box zeroing (NeRAF_model.py:541-546)."""
    norm = (pos - aabb[0]) / (aabb[1] - aabb[0])
    selector = jnp.all((norm > 0.0) & (norm < 1.0), axis=-1)
    return norm * selector[..., None]


def encode_query(
    mic_pose: jnp.ndarray,
    source_pose: jnp.ndarray,
    rot: jnp.ndarray,
    time_query: jnp.ndarray,
    aabb: jnp.ndarray,
    max_len: int,
) -> jnp.ndarray:
    """Build the (B, 21+63+63+16) encoded pose/time query.

    Args:
        mic_pose, source_pose: (B, 3) world positions.
        rot: (B, 3) direction cosines already normalized to [0,1].
        time_query: (B,) integer STFT time indices.
    """
    t = time_query.astype(jnp.float32)[..., None] / float(max_len - 1.0)
    mic = normalize_positions(mic_pose, aabb)
    src = normalize_positions(source_pose, aabb)
    return jnp.concatenate(
        [
            nerf_encoding(t),
            nerf_encoding(mic),
            nerf_encoding(src),
            sh_encoding(rot),
        ],
        axis=-1,
    )


def camera_to_audio_pose(c2w_camera: "np.ndarray", dataset: str = "SoundSpaces"):
    """Viewer camera pose -> (mic_pose, rot cosine) in audio coordinates.

    Port of the reference's viewer-camera handling
    (NeRAF_model.py:613-646): viewer frame is x-front/y-left/z-up, audio is
    x-front/y-up/z-left; the yaw is extracted as euler 'yxz' (RAF, from the
    source pose) or 'zyx' (SoundSpaces, from the camera), rounded to whole
    degrees and expressed as the [cos, 0, sin] direction cosine in [0,1].
    """
    import numpy as np
    from scipy.spatial.transform import Rotation as R

    c2w = np.eye(4)
    c2w[:3, :4] = np.asarray(c2w_camera)[:3, :4]
    transform_axis = np.array([
        [1, 0, 0, 0],
        [0, 0, 1, 0],
        [0, -1, 0, 0],
        [0, 0, 0, 1],
    ])
    c2w_audio = transform_axis @ c2w
    mic_pose = c2w_audio[:3, 3]

    if dataset == "RAF":
        # The reference derives the source rotation from the CONSTANT matrix
        # transform_axis @ eye(4) (NeRAF_model.py:626-637) — a -90° roll
        # about x, which is exact gimbal lock for the 'yxz' euler sequence.
        # scipy resolves it as (0, -90, 0) ("setting third angle to zero"),
        # so the yaw the reference's arithmetic produces is exactly 0.0; we
        # use that constant directly instead of tripping scipy's gimbal-lock
        # warning on every viewer request. Pinned against the scipy value in
        # tests/test_raf_paths.py::test_raf_viewer_yaw_matches_reference.
        yaw = 0.0
    else:
        yaw = R.from_matrix(c2w[:3, :3]).as_euler("zyx", degrees=True)[0]
    yaw = np.round(yaw, decimals=0)
    rad = np.deg2rad(yaw)
    rot = (np.array([np.cos(rad), 0.0, np.sin(rad)]) + 1.0) / 2.0
    return mic_pose, rot


@dataclasses.dataclass(frozen=True)
class AudioModel:
    """Static model definition; parameters live in external pytrees."""

    config: AudioModelConfig
    grid_feature_dim: int = 0  # 0 when use_grid=False
    compute_dtype: Any = jnp.float32  # bf16 under mixed precision

    @property
    def field(self) -> AcousticSoundField:
        return AcousticSoundField(
            hidden_w=self.config.w_field,
            sound_rez=self.config.mic_ch,
            n_frequencies=self.config.n_freq_stft,
            dtype=self.compute_dtype,
        )

    @property
    def in_dim(self) -> int:
        return self.grid_feature_dim + TIME_ENC_DIM + 2 * POS_ENC_DIM + SH_DIM

    def init(self, key: jax.Array) -> Any:
        h = jnp.zeros((1, self.in_dim))
        return self.field.init(key, h)

    def apply(
        self,
        params: Any,
        batch: dict,
        aabb: jnp.ndarray,
        grid_feature: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Forward over a batch of STFT-slice queries -> (B, C, F) log-mags.

        batch keys: time_query (B,), mic_pose/source_pose (B,3), rot (B,3).
        grid_feature: (n_features,) scene descriptor (required if the model
        was built with grid conditioning).
        """
        h = encode_query(
            batch["mic_pose"], batch["source_pose"], batch["rot"],
            batch["time_query"], aabb, self.config.max_len,
        )
        if self.grid_feature_dim:
            assert grid_feature is not None
            feat = jnp.broadcast_to(grid_feature[None, :], (h.shape[0], self.grid_feature_dim))
            h = jnp.concatenate([feat, h], axis=-1)
        return self.field.apply(params, h)

    def loss(self, predicted: jnp.ndarray, gt: jnp.ndarray) -> dict:
        """Training loss dict with reference weighting (NeRAF_model.py:584-600)."""
        cfg = self.config
        if cfg.criterion == "MSE":
            return {"audio_mse": jnp.mean((predicted - gt) ** 2) * cfg.loss_factor}
        loss_type = "mse" if "MSE" in cfg.criterion else "l1"
        parts = stft_loss(predicted, gt, loss_type=loss_type)
        return {
            "audio_sc_loss": parts["audio_sc_loss"] * 1e-1 * cfg.loss_factor,
            "audio_mag_loss": parts["audio_mag_loss"] * 1.0 * cfg.loss_factor,
        }

    def render_rir(
        self,
        params: Any,
        mic_pose: jnp.ndarray,
        source_pose: jnp.ndarray,
        rot: jnp.ndarray,
        aabb: jnp.ndarray,
        grid_feature: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Full-RIR sweep: all max_len time bins at once -> (C, F, T) log-mags.

        The reference's get_outputs_for_camera eval path (NeRAF_model.py:646-692)
        with the T-major output permuted to spectrogram layout.
        """
        T = self.config.max_len
        batch = {
            "time_query": jnp.arange(T),
            "mic_pose": jnp.broadcast_to(mic_pose[None, :], (T, 3)),
            "source_pose": jnp.broadcast_to(source_pose[None, :], (T, 3)),
            "rot": jnp.broadcast_to(rot[None, :], (T, 3)),
        }
        out = self.apply(params, batch, aabb, grid_feature)  # (T, C, F)
        return jnp.transpose(out, (1, 2, 0))  # (C, F, T)

    def render_rirs_batch(
        self,
        params: Any,
        mic_poses: jnp.ndarray,
        source_poses: jnp.ndarray,
        rots: jnp.ndarray,
        aabb: jnp.ndarray,
        grid_feature: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Render N full RIRs as ONE flat (N*T) query batch -> (N, C, F, T).

        vmapping render_rir over poses produces N small (T, .) matmuls that
        under-utilize the MXU; flattening to a single (N*T, in_dim) batch is
        the fast path for the eval sweep and loudness maps.
        """
        N = mic_poses.shape[0]
        T = self.config.max_len
        batch = {
            "time_query": jnp.tile(jnp.arange(T), N),
            "mic_pose": jnp.repeat(mic_poses, T, axis=0),
            "source_pose": jnp.repeat(source_poses, T, axis=0),
            "rot": jnp.repeat(rots, T, axis=0),
        }
        out = self.apply(params, batch, aabb, grid_feature)  # (N*T, C, F)
        out = out.reshape(N, T, self.config.mic_ch, self.config.n_freq_stft)
        return jnp.transpose(out, (0, 2, 3, 1))  # (N, C, F, T)
