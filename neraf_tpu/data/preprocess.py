"""Dataset preprocessing: SoundSpaces RIR wavs -> magnitude-STFT .npy files.

Script equivalent of data/SoundSpaces/process_audio.ipynb in the reference:
binaural RIR wav -> clip to [-1,1] -> resample 44.1 kHz -> 22.05 kHz ->
Spectrogram(n_fft=512, hop=128, power=None) -> abs -> save per
"{rot}/{rx}_{tx}" (NAF-compatible layout). Waveforms are front-padded by
n_fft/2 zeros and extended to >= 4410 samples before the STFT, matching the
notebook.

The vision counterpart (generate_vision.ipynb) renders RGB frames with
Habitat-Sim, which is not available in this environment; `generate_vision`
documents the required transforms.json contract and raises with instructions.

Usage:
    python -m neraf_tpu.data.preprocess --scene-dir data/SoundSpaces/office_4 \
        [--in-dir binaural_rirs_44100] [--out-dir binaural_magnitudes_sr22050]
"""

from __future__ import annotations

import argparse
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


def generate_vision(*args, **kwargs):
    raise NotImplementedError(
        "Vision-frame generation requires Habitat-Sim (render 512x512 RGB at "
        "the train/eval agent poses with the camera 1.5 m above the agent, "
        "convert Habitat quaternions to a nerfstudio transforms.json with the "
        "right-up-back -> left-up-back axis transform). Run the upstream "
        "generate_vision.ipynb flow in a Habitat environment and point "
        "vision_data.data_dir at the resulting transforms.json.")


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
