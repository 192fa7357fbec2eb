"""Dataset preprocessing: SoundSpaces RIR wavs -> magnitude-STFT .npy files.

Script equivalent of data/SoundSpaces/process_audio.ipynb in the reference:
binaural RIR wav -> clip to [-1,1] -> resample 44.1 kHz -> 22.05 kHz ->
Spectrogram(n_fft=512, hop=128, power=None) -> abs -> save per
"{rot}/{rx}_{tx}" (NAF-compatible layout). Waveforms are front-padded by
n_fft/2 zeros and extended to >= 4410 samples before the STFT, matching the
notebook.

The vision counterpart (generate_vision.ipynb) is `generate_vision` below:
pose loading, Habitat-pose -> nerfstudio camera conversion, intrinsics, and
the transforms.json layout are fully implemented; only the raster renderer
is pluggable (`render_fn`), defaulting to a Habitat-Sim gate since the
simulator and Replica assets are not available in this environment.

Usage:
    python -m neraf_tpu.data.preprocess --scene-dir data/SoundSpaces/office_4 \
        [--in-dir binaural_rirs_44100] [--out-dir binaural_magnitudes_sr22050]
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from neraf_tpu.dsp.resample import resample_poly
from neraf_tpu.dsp.stft import stft_magnitude
from neraf_tpu.utils.wav import read_wav

N_FFT = 512
HOP = 128
TARGET_FS = 22050
MIN_SAMPLES = 4410


def process_rir_wav(path: Path, source_fs: int = 44100) -> np.ndarray:
    """One wav -> (C, 257, T) magnitude spectrogram at 22.05 kHz."""
    sr, wav = read_wav(path)
    wav = np.clip(np.atleast_2d(wav.T if wav.ndim > 1 else wav[None]), -1.0, 1.0)
    if sr != TARGET_FS:
        # framework polyphase (dsp/resample.py) — the librosa/torchaudio
        # replacement; the native ingest (neraf_tpu/native) matches it exactly
        wav = np.asarray(resample_poly(jnp.asarray(wav.astype(np.float32)),
                                       TARGET_FS, sr))
    wav = np.pad(wav, ((0, 0), (N_FFT // 2, 0)))
    if wav.shape[1] < MIN_SAMPLES:
        wav = np.pad(wav, ((0, 0), (0, MIN_SAMPLES - wav.shape[1])))
    mag = stft_magnitude(jnp.asarray(wav.astype(np.float32)),
                         n_fft=N_FFT, hop_length=HOP)
    return np.asarray(mag, dtype=np.float32)


def process_scene(scene_dir: Path, in_dir: str = "binaural_rirs",
                  out_dir: str = "binaural_magnitudes_sr22050") -> int:
    scene_dir = Path(scene_dir)
    src_root = scene_dir / in_dir
    dst_root = scene_dir / out_dir
    paths = sorted(src_root.rglob("*.wav"))

    from neraf_tpu import native

    if native.available() and paths:
        # native C++ batch ingest on a thread pool (parity with
        # process_rir_wav pinned by tests/test_native_ingest.py)
        infos = [native.wav_info(p) for p in paths]
        t_each = []
        for sr, frames, _ in infos:
            import math

            g = math.gcd(TARGET_FS, sr)
            res_len = -(-frames * (TARGET_FS // g) // (sr // g))
            t_each.append(1 + max(res_len + N_FFT // 2, MIN_SAMPLES) // HOP)
        mags, chans = native.process_rir_batch(
            paths, target_fs=TARGET_FS, n_fft=N_FFT, hop=HOP, win=N_FFT,
            front_pad=N_FFT // 2, min_samples=MIN_SAMPLES, max_channels=2,
            n_frames=max(t_each))
        for p, m, c, t in zip(paths, mags, chans, t_each):
            rel = p.relative_to(src_root).with_suffix(".npy")
            dst = dst_root / rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            np.save(dst, np.ascontiguousarray(m[:c, :, :t]))
        return len(paths)

    count = 0
    for wav_path in paths:
        rel = wav_path.relative_to(src_root).with_suffix(".npy")
        dst = dst_root / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        np.save(dst, process_rir_wav(wav_path))
        count += 1
    return count


# Habitat right-up-back camera coords -> left-up-back world coords: the
# axis transform the reference applies to every camera-to-world matrix
# (generate_vision.ipynb cell 15).
_HABITAT_TO_NERFSTUDIO = np.array([[-1.0, 0.0, 0.0, 0.0],
                                   [0.0, 0.0, 1.0, 0.0],
                                   [0.0, 1.0, 0.0, 0.0],
                                   [0.0, 0.0, 0.0, 1.0]])


def habitat_camera_intrinsics(width: int, height: int, hfov_deg: float):
    """Focal lengths in pixels, via the reference's formulas.

    Faithful quirk (generate_vision.ipynb cell 6): the reference computes
    ``fx = 1/tan(hfov/2)`` then ``fx_px = width / (2 * fx)`` — i.e.
    ``width * tan(hfov/2) / 2``, the RECIPROCAL of the standard pinhole
    ``width / (2 * tan(hfov/2))``. At the shipped hfov of 90 deg both give
    the same value (tan = 1, fx_px = 256 for 512 px), so the shipped scenes
    are unaffected; we reproduce the reference arithmetic exactly so any
    other hfov matches reference-generated data, not the textbook.
    """
    aspect = width / height
    fx = 1.0 / np.tan(np.deg2rad(hfov_deg) / 2.0)
    fy = fx * aspect
    return width / (2.0 * fx), height / (2.0 * fy)


def habitat_pose_to_c2w(position, quat_xyzw) -> np.ndarray:
    """Habitat agent pose (pos + xyzw quaternion) -> nerfstudio c2w.

    Matches generate_vision.ipynb cell 15: scipy ``R.from_quat`` (xyzw
    order, same coeff order as habitat's ``quat_from_coeffs``), then the
    right-up-back -> left-up-back axis transform. Faithful quirk: the
    translation is the AGENT position from the pose pkl — the 1.5 m
    sensor-height offset the simulator applies when rendering
    (SimParams ``sensor_height``) is NOT added to the recorded transform,
    exactly as in the reference notebook.
    """
    from scipy.spatial.transform import Rotation

    m = np.eye(4)
    m[:3, :3] = Rotation.from_quat(np.asarray(quat_xyzw, float)).as_matrix()
    m[:3, 3] = np.asarray(position, float)
    return _HABITAT_TO_NERFSTUDIO @ m


class HabitatSession:
    """Habitat-Sim RGB render session for generate_vision.

    Mirrors the reference notebook's simulator construction
    (generate_vision.ipynb: backend/agent config cell 6, sensor spec cell 6,
    Simulator + navmesh cell 8, per-pose agent state + observation cell 10):
    one pinhole COLOR sensor at ``sensor_height`` above the agent, the agent
    teleported to each recorded (position, xyzw-quaternion) pose, and the
    color observation returned as an RGB uint8 (H, W, 3) array.

    ``settings`` is the scene's ``*_SimParams.json`` dict — it carries the
    Replica asset paths (scene / scene_dataset / navmesh). Those paths are
    machine-specific; set ``NERAF_HABITAT_SCENE_ROOT`` to remap the recorded
    dataset root (settings["path"]) onto the local filesystem.
    """

    def __init__(self, settings: dict):
        import habitat_sim

        settings = dict(settings)
        root = os.environ.get("NERAF_HABITAT_SCENE_ROOT")
        if root:
            old = settings.get("path", "")
            for k in ("scene", "scene_dataset", "navmesh"):
                if k in settings and old and settings[k].startswith(old):
                    settings[k] = root + settings[k][len(old):]

        # RGB pinhole sensor, sensor_height above the agent (cell 6)
        rgb = habitat_sim.CameraSensorSpec()
        rgb.uuid = "color_sensor"
        rgb.sensor_type = habitat_sim.SensorType.COLOR
        rgb.sensor_subtype = habitat_sim.SensorSubType.PINHOLE
        rgb.resolution = [int(settings["height"]), int(settings["width"])]
        rgb.position = [0.0, float(settings["sensor_height"]), 0.0]
        rgb.orientation = [0.0, 0.0, 0.0]
        try:  # hfov is a magnum Deg in habitat's API; plain float if absent
            import magnum as mn

            rgb.hfov = mn.Deg(float(settings["hfov"]))
        except ImportError:
            rgb.hfov = float(settings["hfov"])

        backend = habitat_sim.SimulatorConfiguration()
        backend.gpu_device_id = int(settings.get("gpu_device_id", 0))
        backend.scene_id = settings["scene"]
        backend.scene_dataset_config_file = settings["scene_dataset"]
        backend.load_semantic_mesh = True
        backend.enable_physics = False

        agent = habitat_sim.AgentConfiguration()
        agent.sensor_specifications = [rgb]

        self.sim = habitat_sim.Simulator(
            habitat_sim.Configuration(backend, [agent]))
        if settings.get("navmesh"):
            self.sim.pathfinder.load_nav_mesh(settings["navmesh"])
        self.settings = settings

    def render(self, position, quat_xyzw, settings=None) -> "np.ndarray":
        """Teleport the agent and capture one RGB frame (cell 10)."""
        from habitat_sim.utils.common import quat_from_coeffs

        agent = self.sim.get_agent(int(self.settings.get("default_agent", 0)))
        state = agent.get_state()
        state.position = np.asarray(position, np.float32)
        state.rotation = quat_from_coeffs(np.asarray(quat_xyzw, float))
        state.sensor_states = {}  # let the sensor follow the agent
        agent.set_state(state, True)
        obs = self.sim.get_sensor_observations()
        return np.asarray(obs["color_sensor"])[..., :3].astype(np.uint8)

    def close(self) -> None:
        self.sim.close()


def _habitat_render_fn(settings: dict):
    """Default renderer: a Habitat-Sim session (gated on habitat_sim)."""
    try:
        import habitat_sim  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "generate_vision's default renderer needs Habitat-Sim, which is "
            "not installed in this environment. Either install habitat-sim "
            "and the Replica scene assets (paths in the scene's "
            "*_SimParams.json), or pass render_fn=... producing an RGB "
            "uint8 (H, W, 3) array for an agent (position, quat_xyzw) — "
            "the pose conversion, intrinsics and transforms.json layout "
            "are all handled here either way.") from e
    return HabitatSession(settings).render


def generate_vision(scene_dir, render_fn=None, image_dir: str = "images",
                    width: int | None = None, height: int | None = None,
                    limit_per_split: int | None = None,
                    image_ext: str = "jpg") -> Path:
    """Rebuild of data/SoundSpaces/generate_vision.ipynb: render RGB frames
    at the scene's Train/Eval agent poses and write a nerfstudio-style
    transforms.json.

    The reference notebook drives Habitat-Sim (512x512, hfov 90, sensor
    1.5 m above the agent) over the ``{scene}_{Train,Eval}.pkl`` pose dicts
    and converts each Habitat pose to a camera-to-world matrix
    (generate_vision.ipynb cells 5-16). Everything except the raster render
    itself is reimplemented here; the renderer is pluggable via
    ``render_fn(position, quat_xyzw, settings) -> uint8 (H, W, 3)`` so the
    pipeline runs end to end with any renderer (tests use a synthetic one;
    a Habitat environment can wrap the simulator in a few lines).

    Layout notes vs the notebook: frames are written as
    ``{image_dir}/{split}_frame_{i:05d}.{ext}`` with one counter spanning
    train-then-eval (reference naming), but file_path entries are RELATIVE
    to transforms.json (the notebook prefixes them with the scene dir name,
    which only resolves from its parent directory; the relative form loads
    from both nerfstudio and neraf_tpu parsers). The train/eval split is
    recovered downstream by filename ("train" substring), the reference's
    split mode.

    Returns the path of the written transforms.json.
    """
    import pickle

    from PIL import Image

    scene_dir = Path(scene_dir)
    scene = scene_dir.name
    settings = json.loads((scene_dir / f"{scene}_SimParams.json").read_text())
    if width is not None:
        settings["width"] = width
    if height is not None:
        settings["height"] = height
    w, h = int(settings["width"]), int(settings["height"])
    fl_x, fl_y = habitat_camera_intrinsics(w, h, float(settings["hfov"]))
    if render_fn is None:
        render_fn = _habitat_render_fn(settings)

    imdir = scene_dir / image_dir
    imdir.mkdir(parents=True, exist_ok=True)
    transforms = {"camera_model": "OPENCV",
                  "orientation_override": "none",
                  "frames": []}
    i = 1  # single counter across both splits, starting at 1 (reference)
    for split, pkl_name in (("train", f"{scene}_Train.pkl"),
                            ("eval", f"{scene}_Eval.pkl")):
        poses = pickle.loads((scene_dir / pkl_name).read_bytes())
        for n_done, (pt_idx, data) in enumerate(poses.items()):
            if limit_per_split is not None and n_done >= limit_per_split:
                break
            c2w = habitat_pose_to_c2w(data["Position"], data["Quaternion"])
            img = np.asarray(render_fn(np.asarray(data["Position"], float),
                                       np.asarray(data["Quaternion"], float),
                                       settings))
            name = f"{split}_frame_{i:05d}.{image_ext}"
            Image.fromarray(img[..., :3]).save(imdir / name)
            transforms["frames"].append({
                "fl_x": fl_x, "fl_y": fl_y,
                "cx": w / 2, "cy": h / 2, "w": w, "h": h,
                "file_path": f"{image_dir}/{name}",
                "transform_matrix": c2w.tolist(),
            })
            i += 1
    out_path = scene_dir / "transforms.json"
    out_path.write_text(json.dumps(transforms, indent=2))
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(prog="neraf-preprocess-audio")
    p.add_argument("--scene-dir", required=True)
    p.add_argument("--in-dir", default="binaural_rirs")
    p.add_argument("--out-dir", default="binaural_magnitudes_sr22050")
    args = p.parse_args(argv)
    n = process_scene(Path(args.scene_dir), args.in_dir, args.out_dir)
    print(f"processed {n} RIRs")


if __name__ == "__main__":
    main()
