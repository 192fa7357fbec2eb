"""Audio-only training/eval engine (the grid-free acoustic field path).

This is the framework's minimum end-to-end slice (SURVEY.md §7): config ->
data -> acoustic field -> loss -> optimizer -> eval with Griffin-Lim + room
acoustics. The joint vision+audio pipeline (engine/pipeline.py) builds on the
same structure with the scene-grid bridge added.

Design: one jitted `train_step` threading an explicit state pytree
(params, opt state, step, PRNG key); batch sampling happens inside the step
(device-resident dataset, loader.py), so a training step is a single XLA
computation end to end.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from neraf_tpu.configs.config import ExperimentConfig
from neraf_tpu.data.datasets import AudioSliceDataset
from neraf_tpu.data.loader import sample_audio_batch
from neraf_tpu.dsp.griffin_lim import griffin_lim
from neraf_tpu.dsp.stft import log_to_magnitude
from neraf_tpu.engine.optimizers import make_optimizer
from neraf_tpu.metrics.evaluators import RAFEvaluator, SoundSpacesEvaluator
from neraf_tpu.models.audio import AudioModel


class AudioTrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jax.Array


@dataclasses.dataclass
class AudioEngine:
    """Owns the compiled step functions for the audio-only model."""

    config: ExperimentConfig
    model: AudioModel
    aabb: jnp.ndarray

    def __post_init__(self):
        self.optimizer = make_optimizer(self.config.optimizers.audio_fields)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._render_all = jax.jit(self._render_all_impl)

    def init_state(self, seed: int | None = None) -> AudioTrainState:
        seed = self.config.seed if seed is None else seed
        key = jax.random.PRNGKey(seed)
        pkey, rkey = jax.random.split(key)
        params = self.model.init(pkey)
        return AudioTrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=rkey,
        )

    # ------------------------------------------------------------------ train
    def _train_step_impl(self, state: AudioTrainState, arrays: dict):
        rng, sample_key = jax.random.split(state.rng)
        batch = sample_audio_batch(
            sample_key, arrays, self.config.audio_data.batch_size,
            self.model.config.max_len)

        def loss_fn(params):
            out = self.model.apply(params, batch, self.aabb)
            losses = self.model.loss(out, batch["data"])
            return sum(losses.values()), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        return AudioTrainState(params, opt_state, state.step + 1, rng), metrics

    def train_step(self, state: AudioTrainState, arrays: dict):
        return self._train_step(state, arrays)

    # ------------------------------------------------------------------- eval
    def _render_all_impl(self, params, mic_poses, source_poses, rots):
        """Full-RIR sweep over all eval poses as one flat batch -> (N, C, F, T)."""
        return self.model.render_rirs_batch(
            params, mic_poses, source_poses, rots, self.aabb)

    def evaluate(self, state: AudioTrainState, dataset: AudioSliceDataset,
                 key: jax.Array | None = None) -> dict:
        """Full eval sweep: render all eval RIRs, Griffin-Lim, acoustic metrics.

        Mirrors the audio half of the reference's
        get_average_eval_image_metrics (NeRAF_pipeline.py:291-436): per-RIR
        full metrics averaged (with std), plus throughput counters.
        """
        cfg = self.model.config
        o = dataset.outputs
        n = len(o.audio_filenames)
        if n == 0:
            return {}
        key = jax.random.PRNGKey(0) if key is None else key

        t0 = time.perf_counter()
        log_pred = self._render_all(
            state.params,
            jnp.asarray(o.microphone_poses, jnp.float32),
            jnp.asarray(o.source_poses, jnp.float32),
            jnp.asarray(o.rotations, jnp.float32),
        )  # (N, C, F, T)

        mag_pred = log_to_magnitude(log_pred)
        mag_gt = log_to_magnitude(jnp.asarray(dataset.log_stft))

        wav_pred = griffin_lim(mag_pred, n_fft=cfg.n_fft, hop_length=cfg.hop_len,
                               win_length=cfg.win_len, key=key)
        wav_gt_istft = griffin_lim(mag_gt, n_fft=cfg.n_fft, hop_length=cfg.hop_len,
                                   win_length=cfg.win_len, key=key)
        wav_pred.block_until_ready()
        render_time = time.perf_counter() - t0

        evaluator = (RAFEvaluator(fs=cfg.fs) if cfg.dataset == "RAF"
                     else SoundSpacesEvaluator(fs=cfg.fs))

        log_pred_np = np.asarray(log_pred)
        mag_pred_np = np.asarray(mag_pred)
        mag_gt_np = np.asarray(mag_gt)
        wav_pred_np = np.asarray(wav_pred)
        wav_gt_istft_np = np.asarray(wav_gt_istft)

        per_rir = []
        for i in range(n):
            wav_gt_ff = (dataset.waveforms[i] if dataset.waveforms is not None
                         else wav_gt_istft_np[i])
            m = evaluator.get_full_metrics(
                mag_pred_np[i], mag_gt_np[i], wav_gt_ff,
                wav_pred_np[i], wav_gt_istft_np[i],
                log_pred_np[i], np.asarray(dataset.log_stft[i]))
            per_rir.append(m)

        out = {}
        for k in per_rir[0]:
            vals = np.asarray([m[k] for m in per_rir], dtype=np.float64)
            out[k] = float(np.mean(vals))
            out[f"{k}_std"] = float(np.std(vals))
        out["num_rays_per_sec_audio"] = n * cfg.max_len / render_time
        out["fps_audio"] = n / render_time
        out.update({f"quick_{k}": v for k, v in
                    evaluator.get_stft_metrics(mag_pred_np, mag_gt_np).items()})
        return out
