"""Matched-budget quality comparison: fourier-PE vs hash-grid radiance field.

Settles the hash-vs-fourier default question (the reference's substrate is
tinycudann's hash grid, README.md:45 / NeRAF_model.py:164-167; this
framework defaults to fourier-PE + deep MLP on measured TPU-backend gather
costs, docs/HASH_PERF.md) with quality evidence on a scene materially harder
than round 1's single sphere: five occluding textured spheres + a
checkerboard ground plane + a position-textured enclosing background sphere,
analytic GT via exact ray tracing.

Both encodings train the SAME VisionModel at the SAME step budget, batch
size, LR schedule and proposal annealing; held-out-view PSNR/SSIM is logged
on a cadence. Results are appended to VALIDATION.md.

Run:  python scripts/compare_encodings.py [--steps 3000] [--eval-every 500]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

SPHERES = [  # center, radius, base albedo
    (np.array([0.0, 0.0, 0.0]), 0.45, np.array([0.85, 0.20, 0.15])),
    (np.array([0.7, 0.4, -0.1]), 0.30, np.array([0.15, 0.55, 0.85])),
    (np.array([-0.6, 0.5, 0.2]), 0.25, np.array([0.20, 0.75, 0.25])),
    (np.array([0.2, -0.7, -0.2]), 0.28, np.array([0.90, 0.80, 0.15])),
    (np.array([-0.4, -0.5, 0.35]), 0.18, np.array([0.75, 0.25, 0.80])),
]
PLANE_Z = -0.55
BG_R = 6.0  # textured enclosing background sphere


def _shade(hit_pos: np.ndarray, albedo: np.ndarray) -> np.ndarray:
    """Procedural stripe texture + simple height shading on a sphere hit."""
    stripes = 0.75 + 0.25 * np.sin(12.0 * hit_pos[..., 0:1] +
                                   9.0 * hit_pos[..., 2:3])
    return np.clip(albedo * stripes, 0.0, 1.0)


def render_gt(origin: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Exact nearest-hit ray trace of the multi-object scene."""
    H, W, _ = dirs.shape
    t_best = np.full((H, W), np.inf)
    rgb = np.zeros((H, W, 3), np.float32)

    # background: enclosing textured sphere (radius BG_R) — position-based
    # texture so the background is multi-view-consistent geometry, not pure
    # view dependence (held-out views must be able to generalize)
    oc = origin
    b = 2.0 * dirs @ oc
    c = oc @ oc - BG_R * BG_R
    t_bg = (-b + np.sqrt(np.maximum(b * b - 4 * c, 0))) / 2  # far intersection
    hit = origin[None, None] + t_bg[..., None] * dirs
    bg = 0.5 + 0.2 * np.stack([
        np.sin(2.0 * hit[..., 0] + 1.0),
        np.sin(2.5 * hit[..., 1]),
        np.cos(2.0 * hit[..., 2]),
    ], -1)
    rgb[:] = np.clip(bg, 0, 1)

    # ground plane z = PLANE_Z with a checkerboard
    denom = dirs[..., 2]
    t_pl = np.where(np.abs(denom) > 1e-6, (PLANE_Z - origin[2]) / denom, np.inf)
    valid = t_pl > 1e-3
    hit = origin[None, None] + t_pl[..., None] * dirs
    inside = valid & (np.abs(hit[..., 0]) < 2.5) & (np.abs(hit[..., 1]) < 2.5)
    check = ((np.floor(hit[..., 0] * 2.5) + np.floor(hit[..., 1] * 2.5)) % 2)
    plane_rgb = np.where(check[..., None] > 0.5, 0.82, 0.25).astype(np.float32)
    upd = inside & (t_pl < t_best)
    t_best = np.where(upd, t_pl, t_best)
    rgb = np.where(upd[..., None], np.broadcast_to(plane_rgb, rgb.shape), rgb)

    for center, radius, albedo in SPHERES:
        oc = origin - center
        b = 2.0 * dirs @ oc
        c = oc @ oc - radius * radius
        disc = b * b - 4 * c
        t_sp = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
        upd = (t_sp > 1e-3) & (t_sp < t_best)
        t_best = np.where(upd, t_sp, t_best)
        t_fin = np.where(np.isfinite(t_sp), t_sp, 0.0)  # keep the shade math NaN-free
        hit = origin[None, None] + t_fin[..., None] * dirs
        rgb = np.where(upd[..., None], _shade(hit, albedo[None, None]), rgb)
    return rgb


def make_views(angles, elevations, size: int, radius: float = 2.4):
    c2ws, images = [], []
    focal = 1.2 * size
    for ang, elev in zip(angles, elevations):
        pos = np.array([radius * np.cos(ang) * np.cos(elev),
                        radius * np.sin(ang) * np.cos(elev),
                        radius * np.sin(elev)])
        forward = -pos / np.linalg.norm(pos)
        up0 = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up0)
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        c2w = np.zeros((3, 4), np.float32)
        c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, up, -forward, pos

        ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        x = (xs + 0.5 - size / 2) / focal
        y = (ys + 0.5 - size / 2) / focal
        dirs = np.stack([x, -y, -np.ones_like(x)], -1)
        dirs = dirs @ c2w[:, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        c2ws.append(c2w)
        images.append(render_gt(pos, dirs))
    return np.stack(c2ws), np.stack(images), focal


def rays_for_views(c2ws, focal, size):
    """All pixel rays for a stack of views -> flat (N, ...) arrays."""
    ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    x = (xs + 0.5 - size / 2) / focal
    y = (ys + 0.5 - size / 2) / focal
    cam_dirs = np.stack([x, -y, -np.ones_like(x)], -1)
    origins, dirs = [], []
    for c2w in c2ws:
        d = cam_dirs @ c2w[:, :3].T
        d = d / np.linalg.norm(d, axis=-1, keepdims=True)
        dirs.append(d.reshape(-1, 3))
        origins.append(np.broadcast_to(c2w[:, 3], d.reshape(-1, 3).shape))
    return (np.concatenate(origins).astype(np.float32),
            np.concatenate(dirs).astype(np.float32))


def train_one(encoding: str, steps: int, eval_every: int, seed: int = 0,
              dispatch_chunk: int | None = None):
    import optax

    from neraf_tpu.configs.config import VisionModelConfig
    from neraf_tpu.engine.optimizers import exponential_decay_schedule
    from neraf_tpu.metrics.image import psnr as psnr_fn, ssim as ssim_fn
    from neraf_tpu.models.vision import VisionModel

    size, n_train, n_eval, batch = 64, 32, 4, 4096
    train_angles = [2 * np.pi * i / n_train for i in range(n_train)]
    train_elevs = [0.15 if i % 2 == 0 else 0.45 for i in range(n_train)]
    eval_angles = [2 * np.pi * (i + 0.5) / n_eval for i in range(n_eval)]
    eval_elevs = [0.3] * n_eval

    c2ws, images, focal = make_views(train_angles, train_elevs, size)
    ec2ws, eimages, _ = make_views(eval_angles, eval_elevs, size)

    origins, dirs = rays_for_views(c2ws, focal, size)
    gt_flat = images.reshape(-1, 3)
    # real per-view camera indices so appearance embeddings train per camera;
    # held-out eval views render with the average embedding (nerfstudio
    # eval semantics)
    cam_idx = np.repeat(np.arange(n_train, dtype=np.int32), size * size)
    eorigins, edirs = rays_for_views(ec2ws, focal, size)

    # "hash:L4F8"-style suffixes select the table layout; the scatter-free
    # table gradient (ops/hashgrid.py grad_mode='auto' -> scatter_set on
    # TPU) makes hash TRAINING possible on this backend (round-2's
    # scatter-add backward crashed the worker, docs/HASH_PERF.md)
    enc_name, _, layout = encoding.partition(":")
    layout_kw = {}
    if layout:
        L, F = layout.upper().lstrip("L").split("F")
        layout_kw = dict(num_levels=int(L), features_per_level=int(F))
    cfg = VisionModelConfig(encoding=enc_name, **layout_kw)
    model = VisionModel(config=cfg, num_cameras=n_train, near=0.05, far=20.0)
    params = model.init(jax.random.PRNGKey(seed))

    sched = exponential_decay_schedule(1e-2, 1e-4, steps, 0)
    tx = optax.chain(optax.scale_by_adam(eps=1e-15),
                     optax.scale_by_schedule(lambda s: -sched(s)))
    opt_state = tx.init(params)

    O = jnp.asarray(origins)
    D = jnp.asarray(dirs)
    G = jnp.asarray(gt_flat)
    CI = jnp.asarray(cam_idx)
    n_rays = O.shape[0]

    if dispatch_chunk is None:
        dispatch_chunk = eval_every

    @jax.jit
    def run_chunk(params, opt_state, step0, key):
        """dispatch_chunk steps in ONE dispatch via lax.scan (per-step
        dispatch costs a tunnel round trip on this backend). Hash runs
        dispatch_chunk=1 WITHOUT the scan wrapper: the remote compiler's
        lowering of scan bodies carrying the 12.6M-row fused gather and its
        sort-chunked backward never finishes compiling (>40 min observed;
        the identical un-scanned graph compiles in ~4 min,
        docs/HASH_PERF.md round-3 note)."""

        def body(carry, i):
            params, opt_state, key = carry
            key, kb, kr = jax.random.split(key, 3)
            step = step0 + i
            idx = jax.random.randint(kb, (batch,), 0, n_rays)
            rays = {"origins": O[idx], "directions": D[idx],
                    "camera_indices": CI[idx]}
            frac = jnp.clip(step.astype(jnp.float32) / 1000.0, 0.0, 1.0)
            anneal = 10.0 * frac / (9.0 * frac + 1.0)

            def loss_fn(p):
                out = model.forward(p, rays, kr, train=True, anneal=anneal,
                                    apply_cam_opt=False,
                                    use_average_appearance=True)
                losses = model.loss(out, G[idx])
                return sum(losses.values())

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), loss

        if dispatch_chunk == 1:
            (params, opt_state, key), loss = body((params, opt_state, key),
                                                  jnp.int32(0))
            return params, opt_state, key, loss
        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), jnp.arange(dispatch_chunk))
        return params, opt_state, key, losses[-1]

    @jax.jit
    def render_eval(params, o, d):
        rays = {"origins": o, "directions": d,
                "camera_indices": jnp.zeros((o.shape[0],), jnp.int32)}
        return model.forward(params, rays, jax.random.PRNGKey(0),
                             train=False, apply_cam_opt=False)["rgb"]

    def eval_metrics(params):
        chunks = [render_eval(params, eorigins[i:i + 8192], edirs[i:i + 8192])
                  for i in range(0, eorigins.shape[0], 8192)]
        pred = jnp.concatenate(chunks).reshape(n_eval, size, size, 3)
        ps = [float(psnr_fn(pred[i], jnp.asarray(eimages[i])))
              for i in range(n_eval)]
        ss = [float(ssim_fn(pred[i], jnp.asarray(eimages[i])))
              for i in range(n_eval)]
        return float(np.mean(ps)), float(np.mean(ss))

    eorigins = jnp.asarray(eorigins)
    edirs = jnp.asarray(edirs)

    assert steps % eval_every == 0 and eval_every % dispatch_chunk == 0
    key = jax.random.PRNGKey(seed + 1)
    curve = []
    t0 = time.perf_counter()
    for s0 in range(0, steps, dispatch_chunk):
        params, opt_state, key, loss = run_chunk(params, opt_state,
                                                 jnp.int32(s0), key)
        jax.block_until_ready(loss)
        done = s0 + dispatch_chunk
        if done % eval_every == 0:
            p, m = eval_metrics(params)
            curve.append((done, p, m))
            print(f"  [{encoding}] step {done}: psnr {p:.2f} "
                  f"ssim {m:.4f}", flush=True)
    wall = time.perf_counter() - t0
    return curve, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--encodings", default="fourier,hash",
                    help="comma list; hash accepts layout suffixes, e.g. "
                         "'hash:L8F4,hash:L4F8'")
    ap.add_argument("--hash-steps", type=int, default=None,
                    help="optional step cap for hash runs (full training "
                         "works since the scatter-free backward; the old "
                         "scatter-add crash cap is no longer needed)")
    args = ap.parse_args()

    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    results = {}
    for enc in args.encodings.split(","):
        is_hash = enc.startswith("hash")
        steps = (min(args.steps, args.hash_steps)
                 if is_hash and args.hash_steps else args.steps)
        eval_every = min(args.eval_every, steps)
        print(f"training encoding={enc} for {steps} steps", flush=True)
        results[enc] = train_one(
            enc, steps, eval_every,
            dispatch_chunk=1 if is_hash else None)

    enc_keys = list(results)
    header = "| step |" + "".join(
        f" {k} PSNR | {k} SSIM |" for k in enc_keys)
    lines = [
        "",
        "## Encoding quality comparison: "
        f"{' vs '.join(enc_keys)} (matched {args.steps}-step budget)",
        "",
        f"Scene: 5 occluding striped spheres + checkerboard ground plane + "
        f"position-textured enclosing background sphere; 32 train / 4 "
        f"held-out 64x64 views; 4096-ray batches, identical LR schedule and "
        f"proposal annealing "
        f"(scripts/compare_encodings.py, {time.strftime('%Y-%m-%d')}).",
        "",
        header,
        "|---|" + "---|---|" * len(enc_keys),
    ]
    by_enc = {k: {s: (p, m) for s, p, m in c} for k, (c, _) in results.items()}
    all_steps = sorted({s for d in by_enc.values() for s in d})
    for s in all_steps:
        row = f"| {s} |"
        for k in enc_keys:
            p, m = by_enc[k].get(s, (None, None))
            row += (f" {p:.2f} | {m:.4f} |" if p is not None else " — | — |")
        lines.append(row)
    lines.append("")
    for k in enc_keys:
        curve, wall = results[k]
        if not curve:
            continue
        note = (" via the scatter-free table gradient (ops/hashgrid.py)"
                if k.startswith("hash") else "")
        lines.append(f"{k} wall-clock: {wall:.0f}s for {curve[-1][0]} steps "
                     f"({curve[-1][0] / wall:.1f} steps/s){note}.")
    with open(Path(__file__).resolve().parent.parent / "VALIDATION.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
