"""Viewer: HTTP endpoints against a live tiny pipeline."""

import json
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

        st = json.loads(urllib.request.urlopen(f"{base}/state").read())
        assert st["grid_res"] == 8
        assert "audio_aabb" in st
    finally:
        server.shutdown()
