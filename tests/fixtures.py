"""Synthetic on-disk dataset fixtures in RAF / SoundSpaces layouts."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from scipy.io import wavfile


def make_soundspaces_scene(root: Path, n_points: int = 4, n_train: int = 4,
                           n_test: int = 2, max_frames: int = 20, fs_wav: int = 44100,
                           seed: int = 0) -> Path:
    """Tiny SoundSpaces-layout scene: points.txt, split.json, mag npys, wavs."""
    rng = np.random.default_rng(seed)
    scene = root / "mini_scene"
    (scene / "metadata").mkdir(parents=True, exist_ok=True)
    (scene / "metadata_AudioNeRF").mkdir(exist_ok=True)

    # points.txt: "<id>\tx\ty\tz" with raw coords; parser remaps to [x, z, -y]
    with open(scene / "metadata" / "points.txt", "w") as f:
        for i in range(n_points):
            x, y, z = rng.uniform(-2, 2, 3)
            f.write(f"{i}\t{x:.4f}\t{y:.4f}\t{z:.4f}\n")

    pairs = []
    for rot in (0, 90):
        for rx in range(n_points):
            for tx in range(n_points):
                if rx != tx:
                    pairs.append(f"{rot}/{rx}_{tx}")
    rng.shuffle(pairs)
    split = {"train": pairs[:n_train], "test": pairs[n_train : n_train + n_test]}
    with open(scene / "metadata_AudioNeRF" / "split.json", "w") as f:
        json.dump(split, f)

    mag_dir = scene / "binaural_magnitudes_sr22050"
    wav_dir = scene / "binaural_rirs"
    for name in split["train"] + split["test"]:
        d = mag_dir / name.split("/")[0]
        d.mkdir(parents=True, exist_ok=True)
        frames = int(rng.integers(max_frames // 2, max_frames + 1))
        mag = np.abs(rng.standard_normal((2, 257, frames))).astype(np.float32)
        np.save(mag_dir / f"{name}.npy", mag)

        wd = wav_dir / name.split("/")[0]
        wd.mkdir(parents=True, exist_ok=True)
        t = np.arange(int(fs_wav * 0.1)) / fs_wav
        rir = (rng.standard_normal((len(t), 2)) * np.exp(-t[:, None] * 30)).astype(np.float32)
        wavfile.write(wav_dir / f"{name}.wav", fs_wav, rir)

    return scene


def make_vision_scene(root: Path, n_frames: int = 4, size: int = 16, seed: int = 0,
                      scene_dir: str | None = None) -> Path:
    """Tiny Nerfstudio-format scene: transforms.json + PNG frames.

    Cameras on a circle looking at the origin; images are simple gradients
    (enough for shape/pipeline tests, not photometric convergence).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    scene = root / (scene_dir or "vision_scene")
    (scene / "images").mkdir(parents=True, exist_ok=True)

    frames = []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        pos = np.array([2 * np.cos(ang), 2 * np.sin(ang), 0.5])
        # look-at origin (OpenGL: -z forward)
        forward = -pos / np.linalg.norm(pos)
        up0 = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up0)
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up
        c2w[:3, 2] = -forward
        c2w[:3, 3] = pos

        img = (rng.random((size, size, 3)) * 0.2 + 0.4)
        img[:, : size // 2] += 0.2
        Image.fromarray((img * 255).clip(0, 255).astype(np.uint8)).save(
            scene / "images" / f"frame_{i:03d}.png")

        frames.append({
            "file_path": f"images/frame_{i:03d}.png",
            "transform_matrix": c2w.tolist(),
            "fl_x": size * 1.2, "fl_y": size * 1.2,
            "cx": size / 2, "cy": size / 2,
            "w": size, "h": size,
        })

    with open(scene / "transforms.json", "w") as f:
        json.dump({"frames": frames, "camera_model": "OPENCV"}, f)
    return scene


def make_raf_scene(root: Path, n_recordings: int = 4, fs: int = 48000, seed: int = 0) -> Path:
    """Tiny RAF-layout scene: data-split.json, rx/tx pose txts, rir wavs."""
    rng = np.random.default_rng(seed)
    scene = root / "raf_scene"
    (scene / "metadata").mkdir(parents=True, exist_ok=True)

    names = [f"rec_{i:03d}" for i in range(n_recordings)]
    split = {"train": [names[: n_recordings - 1]], "validation": [names[-1:]],
             "test": [names[-1:]]}
    with open(scene / "metadata" / "data-split.json", "w") as f:
        json.dump(split, f)

    for name in names:
        d = scene / "data" / name
        d.mkdir(parents=True, exist_ok=True)
        rx = rng.uniform(-3, 3, 3)
        with open(d / "rx_pos.txt", "w") as f:
            f.write(",".join(f"{v:.4f}" for v in rx) + "\n")
        # tx: quat xyzw (identity-ish yaw rotation) + source xyz
        yaw = rng.uniform(-np.pi, np.pi)
        quat = [0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)]  # rotation about y
        tx_pos = rng.uniform(-3, 3, 3)
        with open(d / "tx_pos.txt", "w") as f:
            f.write(",".join(f"{v:.6f}" for v in list(quat) + list(tx_pos)) + "\n")

        t = np.arange(int(fs * 0.2)) / fs
        rir = (rng.standard_normal(len(t)) * np.exp(-t * 25)).astype(np.float32)
        wavfile.write(d / "rir.wav", fs, rir)

    return scene
