"""Vision data stack: transforms.json parsing, pose preprocessing, ray generation.

Rebuilds the nerfstudio data path the reference configures at
NeRAF_config.py:83-91: the Nerfstudio-format dataparser (per-frame OPENCV
intrinsics, orientation/centering/scaling of poses), 'fraction' and
'filename' eval split modes, and a pixel/ray sampler. Images are loaded once
into a device-resident (N, H, W, 3) float tensor ("images_on_gpu=True"
semantics) so ray batches are pure device gathers, like the audio side.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class CameraSet:
    """Per-frame pinhole cameras (OpenGL convention: -z forward, y up)."""

    c2w: np.ndarray  # (N, 3, 4)
    fx: np.ndarray  # (N,)
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    width: int
    height: int
    distortion: np.ndarray  # (N, 6) k1 k2 k3 k4 p1 p2
    scale_factor: float = 1.0  # applied pose scale (dataparser_scale)

    def __len__(self):
        return self.c2w.shape[0]


@dataclasses.dataclass
class VisionDataset:
    cameras: CameraSet
    images: np.ndarray  # (N, H, W, 3) float32 in [0,1]
    indices: np.ndarray  # (N,) original frame indices
    aabb: np.ndarray  # (2, 3) scene box


def _auto_orient_and_center(poses: np.ndarray):
    """nerfstudio auto_orient_and_center_poses(method='up', center='poses').

    Rotates so the average camera up-vector aligns with +z, centers on the
    mean camera position, and returns the applied (3, 4) transform.
    """
    translation = poses[:, :3, 3].mean(axis=0)

    up = poses[:, :3, 1].mean(axis=0)
    up = up / np.linalg.norm(up)
    target = np.array([0.0, 0.0, 1.0])

    v = np.cross(up, target)
    s = np.linalg.norm(v)
    c = float(np.dot(up, target))
    if s < 1e-8:
        rot = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        rot = np.eye(3) + vx + vx @ vx * ((1 - c) / (s**2))

    transform = np.concatenate([rot, rot @ -translation[:, None]], axis=1)  # (3,4)
    ones = np.tile(np.array([0, 0, 0, 1.0]), (poses.shape[0], 1, 1))
    poses_h = np.concatenate([poses[:, :3, :], ones], axis=1)
    oriented = np.einsum("ij,njk->nik", np.concatenate([transform, [[0, 0, 0, 1]]]), poses_h)
    return oriented[:, :3, :], transform


def load_transforms(
    data_dir: str | Path,
    split: str = "train",
    eval_mode: str = "fraction",
    train_split_fraction: float = 0.9,
    downscale_factor: int = 1,
    auto_scale_poses: bool = True,
    load_images: bool = True,
) -> VisionDataset:
    """Load a Nerfstudio-format scene (transforms.json + images)."""
    data_dir = Path(data_dir)
    with open(data_dir / "transforms.json") as f:
        meta = json.load(f)

    frames = meta["frames"]
    n = len(frames)

    def get(frame, key, default=0.0):
        return frame.get(key, meta.get(key, default))

    poses = np.array([f["transform_matrix"] for f in frames], dtype=np.float64)
    fx = np.array([get(f, "fl_x") for f in frames])
    fy = np.array([get(f, "fl_y") for f in frames])
    cx = np.array([get(f, "cx") for f in frames])
    cy = np.array([get(f, "cy") for f in frames])
    width = int(get(frames[0], "w", 0) or meta.get("w"))
    height = int(get(frames[0], "h", 0) or meta.get("h"))
    dist = np.array([
        [get(f, k) for k in ("k1", "k2", "k3", "k4", "p1", "p2")] for f in frames
    ])

    poses3 = poses[:, :3, :]
    poses3, _ = _auto_orient_and_center(poses3)
    scale = 1.0
    if auto_scale_poses:
        scale = 1.0 / max(float(np.max(np.abs(poses3[:, :3, 3]))), 1e-8)
        poses3 = poses3.copy()
        poses3[:, :3, 3] *= scale

    # split selection
    use_fraction = eval_mode != "filename"
    if eval_mode == "filename":
        is_train = np.array(["train" in str(f["file_path"]) for f in frames])
        if is_train.any():
            sel = is_train if split == "train" else ~is_train
            idx = np.where(sel)[0]
        else:  # no filename markers: fall back to fraction splitting
            use_fraction = True
    if use_fraction:  # fraction (nerfstudio eval_interval logic)
        num_train = int(np.ceil(n * train_split_fraction))
        all_idx = np.arange(n)
        train_idx = np.unique(np.linspace(0, n - 1, num_train, dtype=int))
        if split == "train":
            idx = train_idx
        else:
            idx = np.setdiff1d(all_idx, train_idx)
            if idx.size == 0:  # tiny scenes: reuse the last train view
                idx = train_idx[-1:]

    if downscale_factor > 1:
        fx, fy = fx / downscale_factor, fy / downscale_factor
        cx, cy = cx / downscale_factor, cy / downscale_factor
        width, height = width // downscale_factor, height // downscale_factor

    images = None
    if load_images:
        imgs = []
        for i in idx:
            img = Image.open(data_dir / frames[i]["file_path"])
            if downscale_factor > 1:
                img = img.resize((width, height), Image.BILINEAR)
            imgs.append(np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0)
        images = np.stack(imgs) if imgs else np.zeros((0, height, width, 3), np.float32)

    cameras = CameraSet(
        c2w=poses3[idx].astype(np.float32),
        fx=fx[idx].astype(np.float32), fy=fy[idx].astype(np.float32),
        cx=cx[idx].astype(np.float32), cy=cy[idx].astype(np.float32),
        width=width, height=height,
        distortion=dist[idx].astype(np.float32),
        scale_factor=scale,
    )
    aabb = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])  # nerfstudio scene box
    return VisionDataset(cameras=cameras, images=images, indices=idx, aabb=aabb)


# ---------------------------------------------------------------------------
# Ray generation (device-side)
# ---------------------------------------------------------------------------

def camera_arrays(cams: CameraSet) -> dict:
    """Pack cameras into device arrays for jitted ray generation.

    The OPENCV distortion parameters are included only when some camera has
    nonzero distortion — key presence is static under jit, so distortion-free
    scenes compile without the undistortion iterations.
    """
    arrays = dict(
        c2w=jnp.asarray(cams.c2w),
        fx=jnp.asarray(cams.fx), fy=jnp.asarray(cams.fy),
        cx=jnp.asarray(cams.cx), cy=jnp.asarray(cams.cy),
    )
    if np.any(cams.distortion != 0):
        arrays["distortion"] = jnp.asarray(cams.distortion)
    return arrays


def _undistort(x: jnp.ndarray, y: jnp.ndarray, d: jnp.ndarray,
               iters: int = 10) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert the OPENCV distortion model by fixed-point iteration.

    d: (B, 6) = (k1, k2, k3, k4, p1, p2). Matches nerfstudio's
    radial_and_tangential_undistort semantics within float tolerance.
    """
    k1, k2, k3, k4 = d[:, 0], d[:, 1], d[:, 2], d[:, 3]
    p1, p2 = d[:, 4], d[:, 5]
    xu, yu = x, y
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx_t = 2.0 * p1 * xu * yu + p2 * (r2 + 2.0 * xu * xu)
        dy_t = p1 * (r2 + 2.0 * yu * yu) + 2.0 * p2 * xu * yu
        xu = (x - dx_t) / radial
        yu = (y - dy_t) / radial
    return xu, yu


def generate_rays(cam_arrays: dict, cam_idx: jnp.ndarray, px: jnp.ndarray,
                  py: jnp.ndarray) -> dict:
    """Pixel coordinates -> world rays (OpenGL camera: -z forward).

    Args:
        cam_idx, px, py: (B,) camera index and pixel coordinates.
    Returns:
        dict origins (B,3), directions (B,3, unit), camera_indices (B,).
    """
    fx = cam_arrays["fx"][cam_idx]
    fy = cam_arrays["fy"][cam_idx]
    cx = cam_arrays["cx"][cam_idx]
    cy = cam_arrays["cy"][cam_idx]
    c2w = cam_arrays["c2w"][cam_idx]  # (B, 3, 4)

    # pixel center convention (+0.5)
    x = (px.astype(jnp.float32) + 0.5 - cx) / fx
    y = (py.astype(jnp.float32) + 0.5 - cy) / fy
    if "distortion" in cam_arrays:
        x, y = _undistort(x, y, cam_arrays["distortion"][cam_idx])
    dirs_cam = jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)

    dirs_world = jnp.einsum("bij,bj->bi", c2w[:, :3, :3], dirs_cam)
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origins = c2w[:, :3, 3]
    return {"origins": origins, "directions": dirs_world, "camera_indices": cam_idx}


def sample_pixel_batch(key: jax.Array, num_cams: int, height: int, width: int,
                       batch_size: int):
    """Uniform random (camera, y, x) pixel batch."""
    k1, k2, k3 = jax.random.split(key, 3)
    cam = jax.random.randint(k1, (batch_size,), 0, num_cams)
    py = jax.random.randint(k2, (batch_size,), 0, height)
    px = jax.random.randint(k3, (batch_size,), 0, width)
    return cam, py, px
