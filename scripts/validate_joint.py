"""Joint-pipeline learning validation on a synthetic audio-visual scene.

Scene: a colored sphere at the origin (analytic GT renders) + synthetic
distance-dependent RIRs. Trains the FULL joint pipeline — nerfacto render,
grid bake, ResNet conditioning, acoustic field, 4 optimizer groups — and
checks that BOTH vision PSNR and audio metrics improve, i.e. the whole
cross-coupled loop learns. Appends results to VALIDATION.md.

Run:  python scripts/validate_joint.py [--steps 1200]
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


def make_cameras(n_cams: int, radius: float = 2.0, size: int = 64):
    """Orbit cameras looking at the origin + analytic sphere GT images."""
    c2ws, images = [], []
    focal = 1.2 * size
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang), 0.6])
        forward = -pos / np.linalg.norm(pos)
        up0 = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up0)
        right /= np.linalg.norm(right)
        up = np.cross(right, forward)
        c2w = np.zeros((3, 4), np.float32)
        c2w[:, 0], c2w[:, 1], c2w[:, 2], c2w[:, 3] = right, up, -forward, pos
        c2ws.append(c2w)

        ys, xs = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
        x = (xs + 0.5 - size / 2) / focal
        y = (ys + 0.5 - size / 2) / focal
        dirs = np.stack([x, -y, -np.ones_like(x)], -1)
        dirs = dirs @ c2w[:, :3].T
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        oc = pos
        b = 2 * dirs @ oc
        c = oc @ oc - 0.5**2
        hit = b**2 - 4 * c > 0
        img = np.full((size, size, 3), 0.7, np.float32)
        img[hit] = [0.85, 0.2, 0.15]
        images.append(img)

    cam_arrays = {
        "c2w": jnp.asarray(np.stack(c2ws)),
        "fx": jnp.full((n_cams,), focal), "fy": jnp.full((n_cams,), focal),
        "cx": jnp.full((n_cams,), size / 2.0), "cy": jnp.full((n_cams,), size / 2.0),
    }
    return cam_arrays, np.stack(images)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1200)
    args = p.parse_args()

    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from scripts.validate_learning import synth_scene
    from neraf_tpu.configs.config import (
        AudioModelConfig,
        ExperimentConfig,
        VisionModelConfig,
    )
    from neraf_tpu.engine.pipeline import JointPipeline
    from neraf_tpu.models.audio import AudioModel
    from neraf_tpu.models.resnet3d import ResNet3D
    from neraf_tpu.models.vision import VisionModel
    from neraf_tpu.metrics.image import psnr as psnr_fn

    train_audio = synth_scene(96, seed=0)
    eval_audio = synth_scene(8, seed=1)
    eval_audio.outputs.aabb = train_audio.outputs.aabb
    cam_arrays, images = make_cameras(12, size=64)

    cfg = ExperimentConfig(dataset="SoundSpaces")
    cfg.vision_model = VisionModelConfig(num_nerf_samples=48,
                                         num_proposal_samples=(128, 64),
                                         eval_num_rays_per_chunk=1 << 14)
    cfg.audio_model = AudioModelConfig(
        dataset="SoundSpaces", max_len=60, n_freq_stft=257, w_field=512,
        n_features=1024, resnet_backbone="resnet50").resolve()
    cfg.audio_data.batch_size = 2048
    cfg.vision_data.train_rays_per_batch = 4096
    cfg.trainer.start_step_audio = 100
    cfg.trainer.grid_bake_cells_per_step = 4096
    cfg.optimizers.audio_fields.warmup_steps = 100
    cfg.optimizers.audio_fields.lr = 5e-4
    cfg.optimizers.fields.lr = 5e-3
    cfg.optimizers.proposal_networks.lr = 5e-3
    # synthetic poses are exact: freeze the camera optimizer so eval renders
    # (which use the uncorrected poses) match the optimized scene
    cfg.optimizers.camera_opt.lr = 1e-12
    cfg.optimizers.camera_opt.lr_final = 1e-12

    feat_dim = ResNet3D(backbone="resnet50", n_features=1024).feature_dim
    cdtype = jnp.bfloat16 if cfg.trainer.mixed_precision else jnp.float32
    pipe = JointPipeline(
        config=cfg,
        vision_model=VisionModel(config=cfg.vision_model, num_cameras=12,
                                 near=0.05, far=20.0, compute_dtype=cdtype),
        audio_model=AudioModel(config=cfg.audio_model, grid_feature_dim=feat_dim,
                               compute_dtype=cdtype),
        audio_aabb=jnp.asarray(train_audio.outputs.aabb, jnp.float32),
        vision_aabb=jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]),
        grid_res=128,
    )
    state = pipe.init_state()

    image_arrays = {"images": jnp.asarray(images)}
    audio_arrays = train_audio.slice_arrays()

    before_v = pipe.evaluate_vision(state, cam_arrays, images[:4])
    before_a = pipe.evaluate_audio(state, eval_audio)
    print("untrained psnr:", round(before_v["psnr"], 2),
          "T60:", round(before_a["audio_T60_mean_error"], 2))

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = pipe.train_step(state, cam_arrays, audio_arrays, image_arrays)
        if (i + 1) % 200 == 0:
            print(f"step {i+1}: rgb={float(metrics['rgb_loss']):.5f} "
                  f"audio_mag={float(metrics['audio_mag_loss']):.6f}")
    jax.block_until_ready(state.grid)
    dt = time.perf_counter() - t0
    print(f"{args.steps} joint steps in {dt:.1f}s ({args.steps/dt:.1f} steps/s)")

    after_v = pipe.evaluate_vision(state, cam_arrays, images[:4],
                                   use_average_appearance=False)
    after_v_avg = pipe.evaluate_vision(state, cam_arrays, images[:4])
    print("psnr with avg appearance:", round(after_v_avg["psnr"], 2))
    after_a = pipe.evaluate_audio(state, eval_audio)
    print("trained psnr:", round(after_v["psnr"], 2),
          "T60:", round(after_a["audio_T60_mean_error"], 2),
          "EDT:", round(after_a["audio_EDT"], 4))

    lines = [
        "",
        "## Joint pipeline (vision + grid bake + ResNet + acoustic field)",
        "",
        f"{args.steps} steps @ {args.steps/dt:.1f} steps/s, grid 128^3, resnet50,",
        "sphere scene (12 views, 64x64) + synthetic distance-dependent RIRs.",
        "",
        "| metric | untrained | trained |",
        "|---|---|---|",
        f"| psnr | {before_v['psnr']:.2f} | {after_v['psnr']:.2f} |",
        f"| ssim | {before_v['ssim']:.3f} | {after_v['ssim']:.3f} |",
        f"| audio_T60_mean_error | {before_a['audio_T60_mean_error']:.2f} | {after_a['audio_T60_mean_error']:.2f} |",
        f"| audio_EDT | {before_a['audio_EDT']:.4f} | {after_a['audio_EDT']:.4f} |",
        f"| audio_C50 | {before_a['audio_C50']:.3f} | {after_a['audio_C50']:.3f} |",
    ]
    with open("VALIDATION.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to VALIDATION.md")

    assert after_v["psnr"] > before_v["psnr"] + 5, "vision did not learn"
    assert after_a["audio_T60_mean_error"] < before_a["audio_T60_mean_error"] * 0.5, \
        "audio did not learn"
    print("PASS: joint pipeline learns")


if __name__ == "__main__":
    main()
