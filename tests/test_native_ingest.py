"""Native (C++) ingest parity vs the Python/JAX reference paths.

The native library (neraf_tpu/native/ingest.cpp) replaces the reference's
torchaudio-C++/DataLoader ingest; every function must match the framework's
Python/JAX implementation within float tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from neraf_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ toolchain / native lib unavailable")


def _tone(n, fs=22050, f=500.0, decay=8.0):
    t = np.arange(n) / fs
    return (np.sin(2 * np.pi * f * t) * np.exp(-t * decay)).astype(np.float32)


def test_wav_read_parity_int16_and_float32(tmp_path):
    from scipy.io import wavfile

    from neraf_tpu.utils.wav import read_wav

    x = _tone(4000)
    stereo = np.stack([x, -0.5 * x], axis=1)

    p16 = tmp_path / "i16.wav"
    wavfile.write(p16, 22050, (stereo * 32767).astype(np.int16))
    pf32 = tmp_path / "f32.wav"
    wavfile.write(pf32, 44100, stereo.astype(np.float32))

    for path in (p16, pf32):
        sr_ref, ref = read_wav(path)
        sr_nat, nat = native.read_wav(path)
        assert sr_nat == sr_ref
        assert nat.shape == ref.shape
        np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_wav_read_mono(tmp_path):
    from scipy.io import wavfile

    x = _tone(1000)
    p = tmp_path / "mono.wav"
    wavfile.write(p, 48000, (x * 32767).astype(np.int16))
    sr, data = native.read_wav(p)
    assert sr == 48000 and data.ndim == 1 and data.shape[0] == 1000


def _write_wav_manual(path, sr, channels, bits, fmt_code, frames_bytes):
    """Hand-rolled RIFF writer for formats scipy won't emit (24-bit etc.)."""
    import struct

    byte_rate = sr * channels * bits // 8
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, sr, byte_rate,
                      block_align, bits)
    data = frames_bytes
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt +
            b"data" + struct.pack("<I", len(data)) + data)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_wav_read_24bit_matches_scipy(tmp_path):
    import struct

    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    vals = rng.integers(-(2**23), 2**23, size=256)
    payload = b"".join(
        struct.pack("<i", int(v) << 8)[1:] for v in vals)  # 3 LSB-first bytes
    p = tmp_path / "p24.wav"
    _write_wav_manual(p, 22050, 1, 24, 1, payload)

    sr_ref, ref = wavfile.read(p)  # scipy returns int32 (<<8)
    ref_f = ref.astype(np.float32) / 2147483648.0
    sr, nat = native.read_wav(p)
    assert sr == sr_ref == 22050
    np.testing.assert_allclose(nat, ref_f, atol=1e-7)


def test_malformed_wav_raises_not_crashes(tmp_path):
    # bits_per_sample = 0 used to divide by zero inside the C parser
    p = tmp_path / "bad.wav"
    _write_wav_manual(p, 22050, 1, 0, 1, b"\x00" * 64)
    with pytest.raises(IOError):
        native.wav_info(p)
    # truncated garbage
    q = tmp_path / "garbage.wav"
    q.write_bytes(b"RIFFxxxxWAVE" + b"\x01" * 10)
    with pytest.raises(IOError):
        native.read_wav(q)
    # a corrupt file inside a batch fails that file, not the process
    good = tmp_path / "good.wav"
    from scipy.io import wavfile

    wavfile.write(good, 22050, (_tone(1000) * 32767).astype(np.int16))
    with pytest.raises(IOError):
        native.process_rir_batch([good, p], target_fs=0, n_fft=512, hop=128,
                                 win=512, max_channels=1, n_frames=9,
                                 n_threads=2)


def test_resample_parity_vs_jax():
    from neraf_tpu.dsp.resample import resample_poly as jax_resample

    x = _tone(4410, fs=44100)
    ref = np.asarray(jax_resample(jnp.asarray(x), 1, 2))
    nat = native.resample_poly(x, 1, 2)
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=2e-6)

    # non-integer ratio + batch axis
    xb = np.stack([x, x[::-1].copy()])
    ref2 = np.asarray(jax_resample(jnp.asarray(xb), 3, 7))
    nat2 = native.resample_poly(xb, 3, 7)
    np.testing.assert_allclose(nat2, ref2, atol=2e-6)


@pytest.mark.parametrize("n_fft,hop,win", [(512, 128, 512), (1024, 256, 512)])
def test_stft_parity_vs_jax(n_fft, hop, win):
    from neraf_tpu.dsp.stft import stft_magnitude

    x = _tone(5000)
    ref = np.asarray(stft_magnitude(jnp.asarray(x), n_fft=n_fft,
                                    hop_length=hop, win_length=win))
    nat = native.stft_magnitude(x, n_fft=n_fft, hop_length=hop,
                                win_length=win)
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=2e-4, rtol=1e-4)


def test_process_rir_batch_matches_python_preprocess(tmp_path):
    """The batched native ingest reproduces preprocess.process_rir_wav
    (clip -> resample 44.1k->22.05k -> front pad n_fft/2 -> min 4410 ->
    per-channel STFT magnitudes) across a thread pool."""
    from scipy.io import wavfile

    from neraf_tpu.data.preprocess import MIN_SAMPLES, N_FFT, HOP, TARGET_FS, process_rir_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(6):
        n = int(rng.integers(800, 6000))
        wav = np.stack([_tone(n, fs=44100, f=300 + 100 * i),
                        _tone(n, fs=44100, f=500 + 80 * i)], axis=1)
        p = tmp_path / f"rir_{i}.wav"
        wavfile.write(p, 44100, (wav * 32767 * 0.9).astype(np.int16))
        paths.append(p)

    # n_frames: generous upper bound (resampled+front-padded length or the
    # MIN_SAMPLES floor, whichever wins); python output is per-file variable
    longest = max(-(-6000 * TARGET_FS // 44100) + N_FFT // 2, MIN_SAMPLES)
    n_frames = 2 + longest // HOP
    mags, chans = native.process_rir_batch(
        paths, target_fs=TARGET_FS, n_fft=N_FFT, hop=HOP, win=N_FFT,
        front_pad=N_FFT // 2, min_samples=MIN_SAMPLES, max_channels=2,
        n_frames=n_frames, n_threads=4)

    assert mags.shape[:2] == (6, 2)
    assert list(chans) == [2] * 6
    for i, p in enumerate(paths):
        ref = process_rir_wav(p)  # (C, 257, T_i)
        T = ref.shape[-1]
        np.testing.assert_allclose(mags[i, :, :, :T], ref, atol=3e-4,
                                   rtol=2e-4)
        # beyond the python frame count everything is zero padding
        assert np.all(mags[i, :, :, T:] == 0)


def test_raf_loader_native_matches_python(tmp_path, monkeypatch):
    """load_raf_dataset produces identical tensors through the native ingest
    and the Python fallback."""
    from fixtures import make_raf_scene

    from neraf_tpu.data import datasets as D

    scene = make_raf_scene(tmp_path)
    ds_native = D.load_raf_dataset(scene, "train", with_waveforms=True)

    monkeypatch.setattr("neraf_tpu.native.available", lambda: False)
    ds_python = D.load_raf_dataset(scene, "train", with_waveforms=True)

    np.testing.assert_allclose(ds_native.log_stft, ds_python.log_stft,
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(ds_native.waveforms, ds_python.waveforms,
                               atol=1e-6)


def test_process_scene_native_matches_python(tmp_path, monkeypatch):
    from fixtures import make_soundspaces_scene

    from neraf_tpu.data.preprocess import process_scene

    scene = make_soundspaces_scene(tmp_path)
    n1 = process_scene(scene, in_dir="binaural_rirs", out_dir="mags_native")
    monkeypatch.setattr("neraf_tpu.native.available", lambda: False)
    n2 = process_scene(scene, in_dir="binaural_rirs", out_dir="mags_python")
    assert n1 == n2 > 0

    import pathlib

    for p in sorted((scene / "mags_native").rglob("*.npy")):
        q = scene / "mags_python" / p.relative_to(scene / "mags_native")
        a, b = np.load(p), np.load(q)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-4, rtol=2e-4)


def test_process_rir_batch_truncation():
    """max_samples caps the signal before the STFT (RAF 0.32 s cap)."""
    import scipy.io.wavfile as wavfile
    import tempfile, os

    x = _tone(48000, fs=48000)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "r.wav")
        wavfile.write(p, 48000, (x * 32767).astype(np.int16))
        max_t = int(0.32 * 48000)
        T = max_t // 256
        mags, chans = native.process_rir_batch(
            [p], target_fs=0, n_fft=1024, hop=256, win=512,
            max_samples=max_t, max_channels=1, n_frames=T, n_threads=1)
        from neraf_tpu.dsp.stft import stft_magnitude

        ref = np.asarray(stft_magnitude(jnp.asarray(x[:max_t]), n_fft=1024,
                                        hop_length=256, win_length=512))
        # jax accumulates the DFT in f32, native in f64 — near-zero bins
        # differ at the 1e-3 level (signal magnitudes are ~30)
        np.testing.assert_allclose(mags[0, 0, :, :T], ref[:, :T], atol=1e-3,
                                   rtol=2e-4)
