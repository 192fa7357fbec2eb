"""Trajectory tooling: pose files, moving-listener audio."""

import numpy as np

from neraf_tpu.data.dataparsers import parse_inference_poses_raf
from neraf_tpu.viz.trajectory import (
    make_trajectory_poses,
    moving_listener_audio,
    save_trajectory_npy,
)


def test_trajectory_poses_roundtrip(tmp_path):
    poses = make_trajectory_poses(
        waypoints=np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0]]),
        n_steps=10, source_pose=[0.5, 0.5, 0.5], rot_deg=90.0)
    assert poses["mic_poses"].shape == (10, 3)
    np.testing.assert_allclose(poses["mic_poses"][0], [0, 0, 0], atol=1e-9)
    np.testing.assert_allclose(poses["mic_poses"][-1], [1, 1, 0], atol=1e-9)

    path = save_trajectory_npy(poses, tmp_path / "traj.npy")
    # the saved file must load through the AVN_RENDER_POSES parser
    out = parse_inference_poses_raf(str(path))
    assert out.microphone_poses.shape == (10, 3)
    assert out.source_poses.shape == (10, 3)
    np.testing.assert_allclose(out.source_poses[3], [0.5, 0.5, 0.5])


def test_moving_listener_audio():
    fs = 8000
    dry = np.random.default_rng(0).standard_normal(fs).astype(np.float32)
    # identity impulse RIRs -> output ~= windowed-overlap reconstruction of dry
    rirs = np.zeros((20, 2, 50), np.float32)
    rirs[:, :, 0] = 1.0
    wet = moving_listener_audio(dry, rirs, fs, frame_rate=10.0)
    assert wet.shape[0] == 2
    # 50%-overlap symmetric Hann sums to ~0.999 -> interior matches dry
    interior = slice(800, 3200)
    np.testing.assert_allclose(wet[0, interior], dry[interior], atol=6e-3)
