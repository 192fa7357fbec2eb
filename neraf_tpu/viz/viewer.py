"""Interactive viewer: an HTTP render server (`ns-viewer` analogue).

The reference inherits nerfstudio's websocket viewer and adds WIP audio hooks
(source-position widget + auralization button, NeRAF_model.py:215-267). This
is a dependency-free equivalent: a stdlib HTTP server exposing

  GET /                 — minimal HTML front end (orbit with arrow keys)
  GET /render?theta=..&phi=..&radius=..&w=..&h=..  — PNG render of that view
  GET /rir?x=..&y=..&z=..                          — WAV RIR at a mic position
  GET /auralize?x=..&y=..&z=..&file=dry.wav        — wet WAV (file relative to
                                                     the configured dry_audio_dir;
                                                     403 when unset)
  POST /auralize?x=..&y=..&z=..  (body = dry WAV)  — wet WAV (uploaded dry audio)
  GET /state                                        — JSON scene info

Rendering runs through the same chunked eval path as neraf-eval. Start with
`neraf-viewer --load-config ...` or programmatically via `serve(...)`.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_INDEX_HTML = """<!doctype html>
<html><head><title>neraf-tpu viewer</title><style>
body{background:#111;color:#eee;font-family:monospace;text-align:center}
img{image-rendering:pixelated;border:1px solid #444;margin-top:1em}
</style></head><body>
<h3>neraf-tpu viewer</h3>
<div>arrow keys: orbit &nbsp; +/-: zoom</div>
<img id="v" width="512" height="512">
<script>
let th=0, ph=0.3, r=2.0;
function refresh(){
  document.getElementById('v').src=`/render?theta=${th}&phi=${ph}&radius=${r}&w=128&h=128&_=${Date.now()}`;
}
document.addEventListener('keydown',e=>{
  if(e.key==='ArrowLeft')th-=0.2; if(e.key==='ArrowRight')th+=0.2;
  if(e.key==='ArrowUp')ph=Math.min(1.4,ph+0.1); if(e.key==='ArrowDown')ph=Math.max(-1.4,ph-0.1);
  if(e.key==='+')r=Math.max(0.3,r-0.2); if(e.key==='-')r+=0.2;
  refresh();
});
refresh();
</script></body></html>"""


def _orbit_camera(theta: float, phi: float, radius: float) -> np.ndarray:
    """c2w for a camera orbiting the origin (OpenGL convention)."""
    pos = np.array([
        radius * np.cos(phi) * np.cos(theta),
        radius * np.cos(phi) * np.sin(theta),
        radius * np.sin(phi),
    ])
    forward = -pos / np.linalg.norm(pos)
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(forward, up0)
    n = np.linalg.norm(right)
    right = np.array([1.0, 0, 0]) if n < 1e-6 else right / n
    up = np.cross(right, forward)
    c2w = np.zeros((3, 4), dtype=np.float32)
    c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, up, -forward, pos
    return c2w


class TrainThreadDispatcher:
    """Marshals viewer device work onto the training thread.

    Some jax clients (the axon tunnel) abort the process when two host
    threads dispatch device computations concurrently, so during live
    training the HTTP handler threads must not touch the device directly:
    they enqueue a thunk here and block; the training loop calls pump() on
    its logging cadence and executes pending thunks on its own thread.
    """

    def __init__(self, timeout_s: float = 300.0):
        import queue

        self._queue = queue.Queue()
        self.timeout_s = timeout_s

    def __call__(self, fn):
        ev = threading.Event()
        box = {}
        self._queue.put((fn, ev, box))
        if not ev.wait(self.timeout_s):
            raise TimeoutError(
                "training loop did not service the viewer request "
                f"within {self.timeout_s:.0f}s")
        if "err" in box:
            raise box["err"]
        return box["out"]

    def pending(self) -> bool:
        """True when at least one viewer request is waiting for pump()."""
        return not self._queue.empty()

    def pump(self, before=None) -> int:
        """Run pending viewer thunks on the calling (training) thread.

        before: optional zero-arg callable run once iff the queue is
        non-empty, BEFORE any thunk executes — the training loop uses it to
        snapshot fresh state so a request enqueued after its own pending()
        check never renders against a stale snapshot (a request arriving
        between pending() and pump() used to see the previous — possibly
        step-0 — state).
        """
        import queue

        n = 0
        while True:
            try:
                fn, ev, box = self._queue.get_nowait()
            except queue.Empty:
                return n
            if n == 0 and before is not None:
                try:
                    before()
                except Exception as e:  # snapshot failed: fail the request
                    box["err"] = e
                    ev.set()
                    continue
            try:
                box["out"] = fn()
            except Exception as e:  # surfaced to the waiting handler
                box["err"] = e
            ev.set()
            n += 1


class ViewerBackend:
    """Bridges HTTP requests to pipeline renders; one render at a time.

    dispatch: optional callable wrapping every device computation (see
    TrainThreadDispatcher). Default runs it inline (standalone neraf-viewer,
    where the handler thread is the only device user).
    """

    def __init__(self, pipeline, state, fs: int = 22050, dispatch=None,
                 dry_audio_dir=None):
        self.pipeline = pipeline
        self.state = state
        self.fs = fs
        # GET /auralize?file=... only serves wavs under this directory; when
        # None the GET variant is disabled (POST the wav body instead) — the
        # HTTP server must not be an arbitrary-file read oracle
        self.dry_audio_dir = dry_audio_dir
        self.step_hint: int | None = None  # host-side step (live training)
        self._dispatch = dispatch or (lambda fn: fn())
        self._lock = threading.Lock()
        # fetched once on the constructing (training) thread — /state must
        # stay device-free when served from handler threads
        self._aabb_list = np.asarray(pipeline.audio_aabb).tolist()

    def render_view(self, theta: float, phi: float, radius: float,
                    w: int, h: int) -> bytes:
        import jax.numpy as jnp
        from PIL import Image

        c2w = _orbit_camera(theta, phi, radius)
        focal = 1.2 * w

        def _work():
            # jnp.asarray is a device put: it must run on the dispatching
            # (training) thread, like every other device op here — the axon
            # jax client aborts on concurrent dispatch from a second thread
            cam_arrays = {
                "c2w": jnp.asarray(c2w)[None],
                "fx": jnp.asarray([focal]), "fy": jnp.asarray([focal]),
                "cx": jnp.asarray([w / 2.0]), "cy": jnp.asarray([h / 2.0]),
            }
            return self.pipeline.render_image(self.state, cam_arrays, 0, h, w)

        with self._lock:
            out = self._dispatch(_work)
        rgb = (np.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="PNG")
        return buf.getvalue()

    def _predict_rir_work(self, mic: np.ndarray, src: np.ndarray | None = None,
                          rot: np.ndarray | None = None) -> np.ndarray:
        """Device work for predict_rir — call only via self._dispatch.

        src/rot default to the scene center and a fixed orientation — the
        reference exposes the same override as a viewer source-position
        widget (NeRAF_model.py:215-219).
        """
        import jax.numpy as jnp

        from neraf_tpu.viz.auralization import rir_from_log_stft

        cfg = self.pipeline.audio_model.config
        if src is None:
            src = np.asarray(self.pipeline.audio_aabb).mean(axis=0)
        if rot is None:
            rot = np.array([1.0, 0.5, 0.5], np.float32)
        log_pred = self.pipeline._render_rirs(
            self.state.params, self.state.batch_stats, self.state.grid,
            jnp.asarray(mic, jnp.float32)[None],
            jnp.asarray(src, jnp.float32)[None],
            jnp.asarray(rot, jnp.float32)[None])[0]
        return rir_from_log_stft(np.asarray(log_pred), n_fft=cfg.n_fft,
                                 hop_len=cfg.hop_len, win_len=cfg.win_len)

    def predict_rir(self, mic: np.ndarray, src: np.ndarray | None = None,
                    rot: np.ndarray | None = None) -> np.ndarray:
        """Render the (C, L) RIR waveform at a mic position."""
        with self._lock:
            return self._dispatch(lambda: self._predict_rir_work(mic, src, rot))

    def _wav_bytes(self, wav: np.ndarray) -> bytes:
        from scipy.io import wavfile

        buf = io.BytesIO()
        wavfile.write(buf, self.pipeline.audio_model.config.fs,
                      np.asarray(wav, np.float32).T)
        return buf.getvalue()

    def render_rir_wav(self, mic: np.ndarray, src: np.ndarray | None = None,
                       rot: np.ndarray | None = None) -> bytes:
        return self._wav_bytes(self.predict_rir(mic, src, rot))

    def auralize_wav(self, mic: np.ndarray, wav_bytes: bytes,
                     src: np.ndarray | None = None,
                     rot: np.ndarray | None = None) -> bytes:
        """Dry WAV bytes -> wet WAV convolved with the RIR at `mic`.

        The viewer auralization button of the reference
        (NeRAF_model.py:221-267: input wav, truncated to 5 s, fftconvolved
        per RIR channel — incl. the fix for its undefined-var bug at :264).
        """
        from scipy.io import wavfile

        from neraf_tpu.dsp.resample import resample_poly
        from neraf_tpu.viz.auralization import auralize

        cfg = self.pipeline.audio_model.config
        in_fs, dry = wavfile.read(io.BytesIO(wav_bytes))
        # PCM scaling decided on the ORIGINAL dtype, before any float cast
        if dry.dtype == np.int16:
            dry = dry.astype(np.float32) / 32768.0
        elif dry.dtype == np.int32:
            dry = dry.astype(np.float32) / 2147483648.0
        elif dry.dtype == np.uint8:
            dry = (dry.astype(np.float32) - 128.0) / 128.0
        else:
            dry = np.asarray(dry, np.float32)
        if dry.ndim == 2:
            dry = dry.mean(axis=-1)

        def _work():  # all device work in ONE dispatch unit (no nesting)
            d = dry
            if in_fs != cfg.fs:
                import math

                g = math.gcd(int(cfg.fs), int(in_fs))
                d = np.asarray(resample_poly(d, cfg.fs // g, in_fs // g),
                               np.float32)
            rir = self._predict_rir_work(mic, src, rot)
            return auralize(d, rir, cfg.fs)

        with self._lock:
            wet = self._dispatch(_work)
        peak = np.abs(wet).max()
        if peak > 1.0:
            wet = wet / peak
        return self._wav_bytes(wet)

    def scene_state(self) -> dict:
        # step_hint keeps this endpoint device-free during live training
        # (np.asarray(state.step) is a device->host transfer, which handler
        # threads must not issue concurrently with the train loop)
        if self.step_hint is not None:
            step = self.step_hint
        else:
            with self._lock:
                step = self._dispatch(
                    lambda: int(np.asarray(self.state.step)))
        return {
            "audio_aabb": self._aabb_list,
            "grid_res": self.pipeline.grid_res,
            "step": step,
        }


def _parse_poses(q: dict):
    """(mic, src, rot) from query params; src/rot None unless overridden.

    sx/sy/sz set the source position, rx/ry/rz the orientation encoding —
    the viewer-side source control of the reference (NeRAF_model.py:215-219).
    """
    mic = np.array([float(q.get("x", 0)), float(q.get("y", 0)),
                    float(q.get("z", 0))])
    src = rot = None
    if any(k in q for k in ("sx", "sy", "sz")):
        src = np.array([float(q.get("sx", 0)), float(q.get("sy", 0)),
                        float(q.get("sz", 0))])
    if any(k in q for k in ("rx", "ry", "rz")):
        rot = np.array([float(q.get("rx", 1.0)), float(q.get("ry", 0.5)),
                        float(q.get("rz", 0.5))], np.float32)
    return mic, src, rot


def make_handler(backend: ViewerBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/":
                    self._send(200, _INDEX_HTML.encode(), "text/html")
                elif url.path == "/render":
                    png = backend.render_view(
                        float(q.get("theta", 0)), float(q.get("phi", 0.3)),
                        float(q.get("radius", 2.0)),
                        int(q.get("w", 128)), int(q.get("h", 128)))
                    self._send(200, png, "image/png")
                elif url.path == "/rir":
                    mic, src, rot = _parse_poses(q)
                    self._send(200, backend.render_rir_wav(mic, src, rot),
                               "audio/wav")
                elif url.path == "/auralize":
                    # GET variant: convolve a server-side dry WAV file,
                    # restricted to backend.dry_audio_dir (no path traversal)
                    mic, src, rot = _parse_poses(q)
                    path = q.get("file")
                    if backend.dry_audio_dir is None:
                        self._send(403, b"server-side dry files disabled; "
                                   b"POST a wav body, or start the viewer "
                                   b"with a dry_audio_dir", "text/plain")
                    elif not path:
                        self._send(400, b"missing ?file= (or POST a wav body)",
                                   "text/plain")
                    else:
                        import os.path as osp

                        root = osp.realpath(str(backend.dry_audio_dir))
                        full = osp.realpath(osp.join(root, path))
                        if not (full == root or
                                full.startswith(root + osp.sep)):
                            self._send(403, b"file outside dry_audio_dir",
                                       "text/plain")
                        else:
                            with open(full, "rb") as f:
                                body = f.read()
                            self._send(200,
                                       backend.auralize_wav(mic, body, src, rot),
                                       "audio/wav")
                elif url.path == "/state":
                    self._send(200, json.dumps(backend.scene_state()).encode(),
                               "application/json")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:  # surface render errors to the client
                self._send(500, str(e).encode(), "text/plain")

        def do_POST(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/auralize":
                    # POST body = dry WAV -> wet WAV at the queried poses
                    mic, src, rot = _parse_poses(q)
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n)
                    self._send(200, backend.auralize_wav(mic, body, src, rot),
                               "audio/wav")
                else:
                    self._send(404, b"not found", "text/plain")
            except Exception as e:
                self._send(500, str(e).encode(), "text/plain")

    return Handler


def serve(backend: ViewerBackend, host: str = "127.0.0.1", port: int = 7007,
          blocking: bool = True) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(backend))
    if blocking:
        print(f"viewer at http://{host}:{server.server_address[1]}")
        server.serve_forever()
    else:
        threading.Thread(target=server.serve_forever, daemon=True).start()
    return server
