"""Golden-file tests against the REAL metadata shipped with the reference.

The reference ships genuinely usable fixtures (SURVEY.md §4): six SoundSpaces
scenes with split.json + Habitat Train/Eval pose pkls, and two RAF rooms with
Nerfstudio transforms.json (OPENCV model, per-frame intrinsics). Round 1
validated the parsers only on synthetic fixtures; these tests pin them to the
real files — a quaternion-convention slip here silently destroys training on
real data (VERDICT round 1, Missing #3).

All tests skip cleanly when /root/reference/data is not present.
"""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from neraf_tpu.data.dataparsers import (
    parse_inference_poses_soundspaces,
    parse_soundspaces,
)
from neraf_tpu.data.vision_data import load_transforms

REF = Path("/root/reference/data")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference data not available")

# Golden counts recorded from /root/reference/data/SoundSpaces/*/split.json.
SS_SPLIT_GOLDEN = {
    "office_4": (20793, 2311),
    "room_2": (7952, 884),
    "apartment_1": (111513, 12391),
    "apartment_2": (72590, 8066),
    "frl_apartment_2": (56250, 6250),
    "frl_apartment_4": (58064, 6452),
}
# Golden pose counts from the Habitat Train/Eval pkls.
SS_PKL_GOLDEN = {
    "office_4": (45, 50),
    "room_2": (45, 50),
    "apartment_1": (150, 50),
    "apartment_2": (150, 50),
    "frl_apartment_2": (75, 50),
    "frl_apartment_4": (75, 50),
}
SCENES = sorted(SS_SPLIT_GOLDEN)

# The four direction cosines [cos,0,sin]->[0,1] for rot in {0,90,180,270}.
_ROT_COSINES = {
    rot: (np.array([np.cos(np.deg2rad(rot)), 0.0, np.sin(np.deg2rad(rot))]) + 1) / 2
    for rot in (0, 90, 180, 270)
}


@pytest.mark.parametrize("scene", SCENES)
def test_soundspaces_split_json_golden(scene):
    """Real split.json: golden counts, '{rot}/{rx}_{tx}' format, disjoint."""
    with open(REF / "SoundSpaces" / scene / "split.json") as f:
        split = json.load(f)
    assert set(split) == {"train", "test"}
    assert (len(split["train"]), len(split["test"])) == SS_SPLIT_GOLDEN[scene]
    assert not set(split["train"]) & set(split["test"])
    for name in split["train"][:500] + split["test"][:500]:
        rot, pair = name.split("/")
        assert int(rot) in (0, 90, 180, 270)
        rx, tx = pair.split("_")
        int(rx), int(tx)


@pytest.mark.parametrize("scene", ["office_4", "apartment_1"])
def test_parse_soundspaces_on_real_split(scene, tmp_path):
    """parse_soundspaces over a REAL split.json (positions synthesized since
    points.txt isn't shipped): counts, rotation cosines, AABB semantics."""
    with open(REF / "SoundSpaces" / scene / "split.json") as f:
        split = json.load(f)
    ids = set()
    for name in split["train"] + split["test"]:
        rx, tx = name.split("/")[1].split("_")
        ids.update((rx, tx))

    scene_dir = tmp_path / scene
    (scene_dir / "metadata").mkdir(parents=True)
    (scene_dir / "metadata_AudioNeRF").mkdir()
    rng = np.random.default_rng(0)
    # points.txt rows: "<id>\t<x>\t<y>\t<z>" in Habitat coords; the parser
    # must remap to [x, z, -y] (reference NeRAF_dataparser.py:304-312).
    coords = {i: rng.uniform(-4, 4, 3) for i in ids}
    with open(scene_dir / "metadata" / "points.txt", "w") as f:
        for i, c in coords.items():
            f.write(f"{i}\t{c[0]}\t{c[1]}\t{c[2]}\n")
    with open(scene_dir / "metadata_AudioNeRF" / "split.json", "w") as f:
        json.dump(split, f)

    for split_name, golden_n in zip(("train", "test"), SS_SPLIT_GOLDEN[scene]):
        out = parse_soundspaces(scene_dir, split=split_name)
        assert len(out.audio_filenames) == golden_n
        assert out.microphone_poses.shape == (golden_n, 3)

        # axis remap [x, z, -y] for every mic/source pose
        for k in rng.choice(golden_n, size=50, replace=False):
            name = out.audio_filenames[k]
            rot, pair = name.split("/")
            rx, tx = pair.split("_")
            np.testing.assert_allclose(
                out.microphone_poses[k],
                [coords[rx][0], coords[rx][2], -coords[rx][1]])
            np.testing.assert_allclose(
                out.source_poses[k],
                [coords[tx][0], coords[tx][2], -coords[tx][1]])
            np.testing.assert_allclose(
                out.rotations[k], _ROT_COSINES[int(rot)], atol=1e-12)

        # AABB = mic min/max +- 1 m margin
        np.testing.assert_allclose(
            out.aabb[0], out.microphone_poses.min(axis=0) - 1.0)
        np.testing.assert_allclose(
            out.aabb[1], out.microphone_poses.max(axis=0) + 1.0)


@pytest.mark.parametrize("scene", SCENES)
@pytest.mark.parametrize("which", ["Train", "Eval"])
def test_habitat_pkl_quaternion_convention(scene, which, tmp_path):
    """The quaternion->yaw path against REAL Habitat quaternions.

    The shipped pkls are keyed ((x,y,z), rot_deg) with the ground-truth yaw
    IN THE KEY — an exact oracle for the 'yzx'-euler + 360-offset convention
    (reference NeRAF_dataparser.py:424-440). Feeds every real pose through
    parse_inference_poses_soundspaces and recovers the yaw from the emitted
    direction cosine.
    """
    with open(REF / "SoundSpaces" / scene / f"{scene}_{which}.pkl", "rb") as f:
        poses = pickle.load(f)
    n_train, n_eval = SS_PKL_GOLDEN[scene]
    assert len(poses) == (n_train if which == "Train" else n_eval)

    source = np.array([1.0, -0.7, 2.0])
    scene_obs = [
        {"pose": np.asarray(v["Position"], np.float64),
         "quat": np.asarray(v["Quaternion"], np.float64),  # xyzw
         "source": source}
        for v in poses.values()
    ]
    traj = tmp_path / "traj.pkl"
    with open(traj, "wb") as f:
        pickle.dump({"scene_obs": scene_obs}, f)

    out = parse_inference_poses_soundspaces(str(traj))
    gt_yaws = np.array([rot for (_, rot) in poses.keys()]) % 360.0
    got = out.rotations * 2.0 - 1.0  # [0,1] -> [cos, 0, sin]
    got_yaws = np.rad2deg(np.arctan2(got[:, 2], got[:, 0])) % 360.0
    err = np.abs(got_yaws - gt_yaws)
    err = np.minimum(err, 360.0 - err)
    assert err.max() < 1e-6, f"max yaw error {err.max()} deg"

    # mic height pinned to source height; x/z from the Habitat position
    np.testing.assert_allclose(out.microphone_poses[:, 1], source[1])
    gt_pos = np.array([np.asarray(v["Position"]) for v in poses.values()])
    np.testing.assert_allclose(out.microphone_poses[:, 0], gt_pos[:, 0])
    np.testing.assert_allclose(out.microphone_poses[:, 2], gt_pos[:, 2])


RAF_GOLDEN = {"EmptyRoom": 840, "FurnishedRoom": 210}


@pytest.mark.parametrize("room", sorted(RAF_GOLDEN))
def test_raf_transforms_json_golden(room):
    """load_transforms on the REAL RAF transforms.json (OPENCV, per-frame
    intrinsics, 684x1024, nonzero radial+tangential distortion)."""
    data_dir = REF / "RAF" / room
    with open(data_dir / "transforms.json") as f:
        meta = json.load(f)
    assert meta["camera_model"] == "OPENCV"
    assert len(meta["frames"]) == RAF_GOLDEN[room]

    ds = load_transforms(data_dir, split="train", eval_mode="fraction",
                         train_split_fraction=0.9, load_images=False)
    n = RAF_GOLDEN[room]
    n_train = len(np.unique(np.linspace(0, n - 1, int(np.ceil(n * 0.9)), dtype=int)))
    assert len(ds.cameras) == n_train
    ds_eval = load_transforms(data_dir, split="test", eval_mode="fraction",
                              train_split_fraction=0.9, load_images=False)
    assert len(ds_eval.cameras) == n - n_train
    assert not set(ds.indices) & set(ds_eval.indices)

    cams = ds.cameras
    assert (cams.width, cams.height) == (684, 1024)
    # per-frame OPENCV intrinsics with real distortion coefficients
    assert np.all(cams.fx > 300) and np.all(cams.fx < 400)
    assert np.all(cams.distortion[:, 0] != 0)  # k1
    assert np.any(cams.distortion[:, 4:] != 0)  # tangential p1/p2
    assert cams.distortion.shape[1] == 6

    # pose invariants after orient/center/scale: rotations orthonormal with
    # det +1, translations inside the unit cube with max |t| == 1
    R = cams.c2w[:, :3, :3]
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    assert np.all(np.linalg.det(R) > 0.99)
    t_all = np.concatenate([ds.cameras.c2w[:, :3, 3], ds_eval.cameras.c2w[:, :3, 3]])
    assert np.max(np.abs(t_all)) <= 1.0 + 1e-6
    np.testing.assert_allclose(np.max(np.abs(t_all)), 1.0, rtol=1e-5)

    # 'filename' eval mode: RAF frames carry no train/eval markers, so it
    # must fall back to fraction (nerfstudio behavior), not return garbage
    ds_fn = load_transforms(data_dir, split="train", eval_mode="filename",
                            load_images=False)
    assert len(ds_fn.cameras) == n_train
