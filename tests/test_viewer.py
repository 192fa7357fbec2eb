"""Viewer: HTTP endpoints against a live tiny pipeline."""

import json
import urllib.error
import urllib.request

import numpy as np

from neraf_tpu.viz.viewer import ViewerBackend, _orbit_camera, serve

from test_joint_pipeline import _make_pipeline


def test_orbit_camera_orthonormal():
    c2w = _orbit_camera(0.7, 0.3, 2.0)
    R = c2w[:, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
    # camera looks at the origin: forward (-z col) points from pos to origin
    fwd = -R[:, 2]
    pos = c2w[:, 3]
    np.testing.assert_allclose(fwd, -pos / np.linalg.norm(pos), atol=1e-5)


def test_viewer_endpoints(tmp_path):
    pipe, vds, ads, _ = _make_pipeline(tmp_path)
    state = pipe.init_state()
    backend = ViewerBackend(pipe, state)
    server = serve(backend, port=0, blocking=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        html = urllib.request.urlopen(f"{base}/").read()
        assert b"neraf-tpu viewer" in html

        png = urllib.request.urlopen(
            f"{base}/render?theta=0&phi=0.3&radius=2&w=16&h=16").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        wav = urllib.request.urlopen(f"{base}/rir?x=0&y=0&z=0").read()
        assert wav[:4] == b"RIFF"

        # source-position + orientation override (the reference's viewer
        # source widget, NeRAF_model.py:215-219): must change the RIR
        wav2 = urllib.request.urlopen(
            f"{base}/rir?x=0&y=0&z=0&sx=1&sy=0.5&sz=0.2&rx=0&ry=1&rz=0").read()
        assert wav2[:4] == b"RIFF"
        assert wav2 != wav

        st = json.loads(urllib.request.urlopen(f"{base}/state").read())
        assert st["grid_res"] == 8
        assert "audio_aabb" in st
    finally:
        server.shutdown()


def test_train_thread_dispatcher():
    """Handler threads enqueue device work; the training thread pumps it
    (the axon jax client aborts on concurrent multi-thread dispatch)."""
    import threading

    from neraf_tpu.viz.viewer import TrainThreadDispatcher

    d = TrainThreadDispatcher(timeout_s=10)
    results = {}

    def handler():
        results["ok"] = d(lambda: 41 + 1)
        try:
            d(lambda: 1 / 0)
        except ZeroDivisionError:
            results["err"] = True

    t = threading.Thread(target=handler)
    t.start()
    # main thread plays the training loop: pump until both thunks ran
    for _ in range(200):
        d.pump()
        if results.get("err"):
            break
        import time

        time.sleep(0.02)
    t.join(timeout=5)
    assert results["ok"] == 42
    assert results["err"] is True


def test_dispatcher_pump_before_refreshes_snapshot():
    """pump(before=...) runs the snapshot callback iff requests are waiting,
    BEFORE the first thunk — so a request enqueued between the training
    loop's pending() check and pump() never renders a stale (possibly
    step-0) state (ADVICE r3, low #3)."""
    import threading
    import time

    from neraf_tpu.viz.viewer import TrainThreadDispatcher

    d = TrainThreadDispatcher(timeout_s=10)
    state = {"v": 0}  # stands in for backend.state
    seen = {}

    def handler():
        seen["v"] = d(lambda: state["v"])

    t = threading.Thread(target=handler)
    t.start()
    # wait for the request to be enqueued, then pump WITHOUT any prior
    # pending() snapshot — before= must deliver the fresh value
    for _ in range(500):
        if d.pending():
            break
        time.sleep(0.01)
    d.pump(before=lambda: state.update(v=7))
    t.join(timeout=5)
    assert seen["v"] == 7
    # empty queue: before must NOT run
    d.pump(before=lambda: state.update(v=99))
    assert state["v"] == 7
    # a failing snapshot surfaces to the handler instead of rendering stale
    err = {}

    def handler2():
        try:
            d(lambda: state["v"])
        except RuntimeError:
            err["raised"] = True

    t2 = threading.Thread(target=handler2)
    t2.start()
    for _ in range(500):
        if d.pending():
            break
        time.sleep(0.01)

    def bad_snapshot():
        raise RuntimeError("snapshot failed")

    d.pump(before=bad_snapshot)
    t2.join(timeout=5)
    assert err.get("raised") is True


def _dry_wav_bytes(fs: int, seconds: float = 0.05) -> bytes:
    import io

    from scipy.io import wavfile

    t = np.arange(int(fs * seconds)) / fs
    dry = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, fs, dry)
    return buf.getvalue()


def test_viewer_auralize_endpoint(tmp_path):
    """POST /auralize: dry WAV body -> wet WAV convolved with the predicted
    RIR at the queried mic pose (reference NeRAF_model.py:221-267)."""
    pipe, _, _, _ = _make_pipeline(tmp_path)
    state = pipe.init_state()
    backend = ViewerBackend(pipe, state, dry_audio_dir=tmp_path / "dry")
    server = serve(backend, port=0, blocking=False)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    fs = pipe.audio_model.config.fs
    try:
        req = urllib.request.Request(
            f"{base}/auralize?x=0&y=0&z=0", data=_dry_wav_bytes(fs),
            method="POST", headers={"Content-Type": "audio/wav"})
        wet = urllib.request.urlopen(req).read()
        assert wet[:4] == b"RIFF"
        # binaural SoundSpaces model -> 2-channel wet audio, in [-1, 1]
        import io

        from scipy.io import wavfile

        got_fs, data = wavfile.read(io.BytesIO(wet))
        assert got_fs == fs
        assert data.ndim == 2 and data.shape[1] == 2
        assert np.abs(data).max() <= 1.0 + 1e-6

        # GET variant: file RELATIVE to dry_audio_dir (resample 48k -> fs)
        (tmp_path / "dry").mkdir()
        (tmp_path / "dry" / "dry48k.wav").write_bytes(_dry_wav_bytes(48000))
        wet2 = urllib.request.urlopen(
            f"{base}/auralize?x=0&y=0&z=0&file=dry48k.wav").read()
        assert wet2[:4] == b"RIFF"

        # traversal outside dry_audio_dir is rejected
        secret = tmp_path / "secret.wav"
        secret.write_bytes(_dry_wav_bytes(fs))
        with np.testing.assert_raises(urllib.error.HTTPError):
            urllib.request.urlopen(
                f"{base}/auralize?x=0&y=0&z=0&file=../secret.wav")
    finally:
        server.shutdown()


def test_viewer_auralize_get_disabled_by_default(tmp_path):
    pipe, _, _, _ = _make_pipeline(tmp_path)
    backend = ViewerBackend(pipe, pipe.init_state())
    server = serve(backend, port=0, blocking=False)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with np.testing.assert_raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/auralize?file=/etc/hostname")
    finally:
        server.shutdown()
