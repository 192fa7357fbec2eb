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
