"""Benchmark harness: headline TPU numbers for the driver.

Measures, on the available accelerator:
1. RIRs/sec — full acoustic inference: ResNet3D(128^3 grid) scene encoding +
   batched all-time-bins acoustic-MLP sweep + 32-iteration Griffin-Lim
   waveform synthesis (SoundSpaces geometry: 257 bins x 78 frames, binaural).
2. rays/sec — full Nerfacto volume render: 2-level proposal sampling
   (256/96) + 48-sample field eval, 4096-ray batches.

Prints ONE JSON line: the headline metric is RIRs/sec/chip per
BASELINE.json. vs_baseline is measured against an estimated CUDA reference
throughput of 20 RIRs/sec (single consumer GPU running the reference's eval
path: resnet50-3D on 128^3 batch-1 + torch GriffinLim; the repo publishes no
numbers — see BASELINE.md), documented here so the ratio is reproducible.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

CUDA_BASELINE_RIRS_PER_SEC = 20.0  # documented estimate; repo publishes none


def bench_audio(pipe, state, n_rirs: int = 64, iters: int = 5) -> float:
    key = jax.random.PRNGKey(0)
    mic = jax.random.uniform(key, (n_rirs, 3)) * 4 - 2
    src = jnp.zeros((n_rirs, 3))
    rot = jnp.full((n_rirs, 3), 0.5)

    cfg = pipe.audio_model.config

    @jax.jit
    def render_and_synthesize(params, batch_stats, grid, mic, src, rot, key):
        log_pred = pipe._render_rirs_impl(params, batch_stats, grid, mic, src, rot)
        from neraf_tpu.dsp.griffin_lim import griffin_lim
        from neraf_tpu.dsp.stft import log_to_magnitude

        mag = log_to_magnitude(log_pred)
        return griffin_lim(mag, n_fft=cfg.n_fft, hop_length=cfg.hop_len,
                           win_length=cfg.win_len, key=key)

    # warmup/compile
    out = render_and_synthesize(state.params, state.batch_stats, state.grid,
                                mic, src, rot, key)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(iters):
        out = render_and_synthesize(state.params, state.batch_stats, state.grid,
                                    mic, src, rot, key)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return n_rirs / dt


def bench_vision(pipe, state, n_rays: int = 4096, iters: int = 5) -> float:
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (n_rays, 3))
    rays = {
        "origins": jnp.zeros((n_rays, 3)),
        "directions": d / jnp.linalg.norm(d, axis=-1, keepdims=True),
        "camera_indices": jnp.zeros((n_rays,), jnp.int32),
    }

    @jax.jit
    def render(params, rays):
        out = pipe.vision_model.forward(
            pipe._vision_params(params), rays, jax.random.PRNGKey(0), train=False)
        return out["rgb"]

    out = render(state.params, rays)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(state.params, rays)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return n_rays / dt


def bench_audio_raf(n_rirs: int = 64, iters: int = 5) -> float:
    """RAF full-band geometry (48 kHz, 513 bins, 60 frames, mono): grid-free
    acoustic sweep + GL32 — BASELINE config #4's throughput."""
    import jax.numpy as jnp

    from neraf_tpu.configs.config import AudioModelConfig
    from neraf_tpu.dsp.griffin_lim import griffin_lim
    from neraf_tpu.dsp.stft import log_to_magnitude
    from neraf_tpu.models.audio import AudioModel

    key = jax.random.PRNGKey(0)
    cfg = AudioModelConfig(dataset="RAF").resolve()
    model = AudioModel(config=cfg, grid_feature_dim=1024,
                       compute_dtype=jnp.bfloat16)
    params = model.init(key)
    aabb = jnp.asarray([[-3.0, -3.0, -3.0], [3.0, 3.0, 3.0]])
    feat = jax.random.normal(key, (1024,))
    mic = jax.random.uniform(key, (n_rirs, 3)) * 4 - 2
    src = jnp.zeros((n_rirs, 3))
    rot = jnp.full((n_rirs, 3), 0.5)

    @jax.jit
    def render(p, m, s, r):
        log_pred = model.render_rirs_batch(p, m, s, r, aabb, grid_feature=feat)
        mag = log_to_magnitude(log_pred.astype(jnp.float32))
        return griffin_lim(mag, n_fft=cfg.n_fft, hop_length=cfg.hop_len,
                           win_length=cfg.win_len, key=key)

    out = render(params, mic, src, rot)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(params, mic, src, rot)
    out.block_until_ready()
    return n_rirs / ((time.perf_counter() - t0) / iters)


def bench_train_step(pipe, state, iters: int = 10) -> float:
    """Full joint training step at production sizes (4096 rays + 2048 STFT
    slices + 4096-cell grid bake + resnet50(128^3) + 4 optimizer updates)."""
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    n_cams, H, W = 8, 512, 512
    cam_arrays = {
        "c2w": jnp.broadcast_to(
            jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1), (n_cams, 3, 4)),
        "fx": jnp.full((n_cams,), 400.0), "fy": jnp.full((n_cams,), 400.0),
        "cx": jnp.full((n_cams,), W / 2), "cy": jnp.full((n_cams,), H / 2),
    }
    image_arrays = {"images": jax.random.uniform(key, (n_cams, H, W, 3))}
    n_rec, F, T = 100, 257, 78
    audio_arrays = {
        "mic_pose": jax.random.uniform(key, (n_rec, 3)) * 4 - 2,
        "source_pose": jnp.zeros((n_rec, 3)),
        "rot": jnp.full((n_rec, 3), 0.5),
        "log_stft": jax.random.normal(key, (n_rec, 2, F, T)) * 0.5 - 3,
    }
    state = state._replace(step=jnp.int32(3000))  # audio branch active
    state, met = pipe.train_step(state, cam_arrays, audio_arrays, image_arrays)
    jax.block_until_ready(met["total_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, met = pipe.train_step(state, cam_arrays, audio_arrays, image_arrays)
    jax.block_until_ready(met["total_loss"])
    return iters / (time.perf_counter() - t0)


def main():
    from neraf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from __graft_entry__ import _build_pipeline

    pipe = _build_pipeline(grid_res=128, tiny=False)
    state = pipe.init_state(seed=0)

    rirs_per_sec = bench_audio(pipe, state)
    rays_per_sec = bench_vision(pipe, state)
    steps_per_sec = bench_train_step(pipe, state)
    rirs_raf = bench_audio_raf()

    result = {
        "metric": "RIRs/sec/chip (STFT synth + Griffin-Lim); rays/sec volume render; T60 err parity",
        "value": round(rirs_per_sec, 2),
        "unit": "RIRs/sec/chip",
        "vs_baseline": round(rirs_per_sec / CUDA_BASELINE_RIRS_PER_SEC, 3),
        "extras": {
            "rays_per_sec": round(rays_per_sec, 1),
            "train_steps_per_sec": round(steps_per_sec, 2),
            "rirs_per_sec_raf_48k": round(rirs_raf, 1),
            "rir_geometry": "SoundSpaces 257x78 binaural, grid 128^3, resnet50, GL32",
            "cuda_baseline_estimate_rirs_per_sec": CUDA_BASELINE_RIRS_PER_SEC,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
