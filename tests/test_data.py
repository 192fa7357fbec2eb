"""Data layer: parsers, datasets, device batch sampler against fixtures."""

import numpy as np

import jax
import jax.numpy as jnp

from neraf_tpu.data.dataparsers import parse_raf, parse_soundspaces
from neraf_tpu.data.datasets import load_raf_dataset, load_soundspaces_dataset
from neraf_tpu.data.loader import AudioBatchSampler, gather_audio_batch

from fixtures import make_raf_scene, make_soundspaces_scene


def test_parse_soundspaces(tmp_path):
    scene = make_soundspaces_scene(tmp_path)
    out = parse_soundspaces(scene, "train")
    assert len(out.audio_filenames) == 4
    assert out.microphone_poses.shape == (4, 3)
    assert out.rotations.shape == (4, 3)
    assert np.all(out.rotations >= 0) and np.all(out.rotations <= 1)
    # AABB has the 1 m margin
    assert np.all(out.aabb[0] <= out.microphone_poses.min(axis=0) - 0.999)
    assert np.all(out.aabb[1] >= out.microphone_poses.max(axis=0) + 0.999)


def test_parse_soundspaces_axis_remap(tmp_path):
    scene = make_soundspaces_scene(tmp_path)
    raw = {}
    for line in open(scene / "metadata" / "points.txt"):
        parts = line.strip().split("\t")
        raw[parts[0]] = [float(v) for v in parts[1:]]
    out = parse_soundspaces(scene, "train")
    name = out.audio_filenames[0]
    rx_id = name.split("/")[1].split("_")[0]
    expected = [raw[rx_id][0], raw[rx_id][2], -raw[rx_id][1]]
    np.testing.assert_allclose(out.microphone_poses[0], expected)


def test_parse_raf(tmp_path):
    scene = make_raf_scene(tmp_path)
    out = parse_raf(scene, "train")
    assert len(out.audio_filenames) == 3
    assert out.microphone_poses.shape == (3, 3)
    assert np.all(out.rotations >= 0) and np.all(out.rotations <= 1)
    # rot[1] must be the zero-component (cosine layout [cos, 0, sin] normalized)
    np.testing.assert_allclose(out.rotations[:, 1], 0.5)


def test_load_soundspaces_dataset(tmp_path):
    scene = make_soundspaces_scene(tmp_path)
    ds = load_soundspaces_dataset(scene, "train", max_len=24)
    assert ds.log_stft.shape == (4, 2, 257, 24)
    assert len(ds) == 4 * 24
    # out-of-range columns are the min-value constant
    mag0 = np.load(scene / "binaural_magnitudes_sr22050" / f"{ds.outputs.audio_filenames[0]}.npy")
    frames = mag0.shape[2]
    if frames < 24:
        expected = np.log(mag0.min() + 1e-3)
        np.testing.assert_allclose(ds.log_stft[0, :, :, frames:], expected, rtol=1e-5)
    np.testing.assert_allclose(
        ds.log_stft[0, :, :, : min(frames, 24)],
        np.log(mag0[:, :, : min(frames, 24)] + 1e-3), rtol=1e-5)


def test_load_soundspaces_eval_waveforms(tmp_path):
    scene = make_soundspaces_scene(tmp_path)
    ds = load_soundspaces_dataset(scene, "test", max_len=24)
    assert ds.waveforms is not None
    assert ds.waveforms.shape == (2, 2, 24 * 128)


def test_load_raf_dataset(tmp_path):
    scene = make_raf_scene(tmp_path)
    ds = load_raf_dataset(scene, "train")
    # 0.32 s at 48 kHz, hop 256 -> 60 frames; 513 bins mono
    assert ds.log_stft.shape == (3, 1, 513, 60)
    assert ds.max_len == 60


def test_batch_sampler(tmp_path):
    scene = make_soundspaces_scene(tmp_path)
    ds = load_soundspaces_dataset(scene, "train", max_len=24)
    sampler = AudioBatchSampler(ds.slice_arrays(), batch_size=16, max_len=24)
    batch = sampler.next()
    assert batch["data"].shape == (16, 2, 257)
    assert batch["mic_pose"].shape == (16, 3)
    assert batch["time_query"].shape == (16,)
    assert int(jnp.max(batch["time_query"])) < 24

    # gather parity with direct indexing
    arrays = ds.slice_arrays()
    rec = jnp.asarray([0, 1, 2])
    t = jnp.asarray([0, 5, 23])
    b = gather_audio_batch(arrays, rec, t)
    np.testing.assert_allclose(
        np.asarray(b["data"][1]), ds.log_stft[1, :, :, 5], rtol=1e-6)


def test_parse_inference_poses_soundspaces(tmp_path):
    """Habitat .pkl trajectory: yaw offset handling + mic-height pinning."""
    import pickle

    from scipy.spatial.transform import Rotation

    from neraf_tpu.data.dataparsers import parse_inference_poses_soundspaces

    obs = []
    for yaw_deg in (-90.0, 45.0):
        quat = Rotation.from_euler("y", yaw_deg, degrees=True).as_quat()
        obs.append({
            "pose": np.array([1.0, 0.2, 3.0]),
            "quat": quat,
            "source": np.array([0.0, 1.5, 0.0]),
        })
    path = tmp_path / "traj.pkl"
    with open(path, "wb") as f:
        pickle.dump({"scene_obs": obs}, f)

    out = parse_inference_poses_soundspaces(str(path))
    assert out.microphone_poses.shape == (2, 3)
    # mic height pinned to the source height (reference :439-440)
    np.testing.assert_allclose(out.microphone_poses[:, 1], 1.5)
    # negative yaw wraps to 360 + yaw: -90 -> 270 degrees
    expected = (np.array([np.cos(np.deg2rad(270)), 0, np.sin(np.deg2rad(270))]) + 1) / 2
    np.testing.assert_allclose(out.rotations[0], expected, atol=1e-6)


def test_inference_mode_raf_via_env(tmp_path, monkeypatch):
    """AVN_RENDER_POSES switches parse_raf to trajectory-inference mode."""
    from neraf_tpu.viz.trajectory import make_trajectory_poses, save_trajectory_npy

    poses = make_trajectory_poses(np.asarray([[0, 0, 0], [1, 1, 1]]), 5,
                                  source_pose=[0.5, 0.5, 0.5])
    path = save_trajectory_npy(poses, tmp_path / "p.npy")
    monkeypatch.setenv("AVN_RENDER_POSES", str(path))
    out = parse_raf(tmp_path, "inference")
    assert out.microphone_poses.shape == (5, 3)
    assert out.source_poses.shape == (5, 3)
