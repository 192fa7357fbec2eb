"""Viz/tooling layer: auralization, loudness maps, panels, preprocessing."""

import numpy as np

import jax.numpy as jnp

from neraf_tpu.data.preprocess import process_rir_wav, process_scene
from neraf_tpu.viz.auralization import auralize, rir_from_log_stft
from neraf_tpu.viz.loudness import loudness_map, render_loudness_grid
from neraf_tpu.viz.panels import (
    grid_top_view,
    save_eval_images,
    stft_comparison_panel,
)

from fixtures import make_soundspaces_scene


def test_rir_from_log_stft_shapes():
    log = np.full((2, 257, 20), -6.9, np.float32)
    wav = rir_from_log_stft(log, n_fft=512, hop_len=128, win_len=512, n_iter=4)
    assert wav.shape == (2, 128 * 19)
    assert np.all(np.abs(wav) <= 1.0)


def test_auralize():
    fs = 22050
    dry = np.random.default_rng(0).standard_normal(fs).astype(np.float32)
    rir = np.zeros((2, 100), np.float32)
    rir[:, 0] = 1.0  # identity impulse
    wet = auralize(dry, rir, fs)
    assert wet.shape == (2, fs + 99)
    np.testing.assert_allclose(wet[0, : fs], dry, atol=1e-4)


def test_loudness_map():
    def fake_render(mic, src, rot):
        # louder closer to origin
        d = jnp.linalg.norm(mic, axis=-1, keepdims=True)
        base = jnp.full((mic.shape[0], 2, 17, 5), -6.9)
        return base + (2.0 / (1.0 + d))[:, :, None, None]

    out = render_loudness_grid(
        fake_render, source_pose=[0, 0, 0], rot=[1, 0.5, 0.5],
        aabb=np.asarray([[-2, -2, -2], [2, 2, 2]]), height=0.0, resolution=8)
    lm = loudness_map(out["log_stfts"], out["shape"])
    assert lm.shape == (8, 8)
    # center cells are louder than corners
    assert lm[3:5, 3:5].mean() > lm[0, 0]


def test_stft_comparison_panel():
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((33, 20)).astype(np.float32)
    gt = rng.standard_normal((33, 20)).astype(np.float32)
    panel = stft_comparison_panel(pred, gt)
    assert panel.shape == (33, 40, 3)
    assert panel.min() >= 0 and panel.max() <= 1


def test_save_eval_images(tmp_path):
    """The in-training eval-image PNG dump (reference saves per-view PNGs
    during its sweep, NeRAF_pipeline.py:329-338) handles every image kind
    eval_image emits: rgb (H,W,3), scalar maps (H,W)/(H,W,1), panels."""
    rng = np.random.default_rng(0)
    images = {
        "img": rng.random((8, 8, 3)).astype(np.float32),
        "depth": rng.random((8, 8, 1)).astype(np.float32) * 9.0,
        "accumulation": rng.random((8, 8)).astype(np.float32),
        "comparison_ch_0": stft_comparison_panel(
            rng.standard_normal((33, 10)).astype(np.float32),
            rng.standard_normal((33, 10)).astype(np.float32)),
    }
    out_dir = tmp_path / "eval_images"
    written = save_eval_images(images, out_dir, step=1234)
    assert len(written) == 4
    from PIL import Image

    for p in written:
        assert p.exists() and "step_0001234_" in p.name
        img = np.asarray(Image.open(p))
        assert img.ndim == 3 and img.shape[-1] == 3  # all normalized to RGB


def test_grid_top_view():
    grid = np.random.default_rng(0).random((8**3, 7)).astype(np.float32)
    out = grid_top_view(grid, 8)
    assert out["color"].shape == (8, 8, 3)
    assert out["density"].shape == (8, 8, 3)


def test_process_scene(tmp_path):
    scene = make_soundspaces_scene(tmp_path)
    n = process_scene(scene, in_dir="binaural_rirs", out_dir="mags_out")
    assert n > 0
    npys = list((scene / "mags_out").rglob("*.npy"))
    assert len(npys) == n
    mag = np.load(npys[0])
    assert mag.ndim == 3 and mag.shape[1] == 257
    assert np.all(mag >= 0)
