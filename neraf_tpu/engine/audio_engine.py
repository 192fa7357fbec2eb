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
from neraf_tpu.data.loader import resolve_audio_batch
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
        # jitted ONCE per engine: a fresh jit closure per evaluate() call
        # would re-trace (and without the persistent cache recompile) the
        # full render+Griffin-Lim graph on every in-training eval.
        self._render_chunk = jax.jit(self._render_chunk_impl)

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
        batch = resolve_audio_batch(
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

    def _render_chunk_impl(self, params, mic, src, rot, gt_log, k):
        cfg = self.model.config
        log_pred = self._render_all_impl(params, mic, src, rot)
        mag_pred = log_to_magnitude(log_pred)
        mag_gt = log_to_magnitude(gt_log)
        wav_pred = griffin_lim(mag_pred, n_fft=cfg.n_fft,
                               hop_length=cfg.hop_len,
                               win_length=cfg.win_len, key=k)
        wav_gt_istft = griffin_lim(mag_gt, n_fft=cfg.n_fft,
                                   hop_length=cfg.hop_len,
                                   win_length=cfg.win_len, key=k)
        return log_pred, mag_pred, mag_gt, wav_pred, wav_gt_istft

    def evaluate(self, state: AudioTrainState, dataset: AudioSliceDataset,
                 key: jax.Array | None = None, chunk: int = 512) -> dict:
        """Full eval sweep: render all eval RIRs, Griffin-Lim, acoustic metrics.

        Mirrors the audio half of the reference's
        get_average_eval_image_metrics (NeRAF_pipeline.py:291-436): per-RIR
        full metrics averaged (with std), plus throughput counters. Renders
        + Griffin-Lims in fixed-size chunks so device memory stays O(chunk)
        on apartment-scale eval splits.
        """
        cfg = self.model.config
        o = dataset.outputs
        n = len(o.audio_filenames)
        if n == 0:
            return {}
        key = jax.random.PRNGKey(0) if key is None else key
        chunk = min(n, chunk)

        mic_all = np.asarray(o.microphone_poses, np.float32)
        src_all = np.asarray(o.source_poses, np.float32)
        rot_all = np.asarray(o.rotations, np.float32)
        log_gt_all = np.asarray(dataset.log_stft, np.float32)

        render_chunk = self._render_chunk  # jitted once in __post_init__

        evaluator = (RAFEvaluator(fs=cfg.fs) if cfg.dataset == "RAF"
                     else SoundSpacesEvaluator(fs=cfg.fs))
        per_rir = []
        quick_acc: dict[str, float] = {}
        render_time = 0.0
        for i in range(0, n, chunk):
            sl = slice(i, i + chunk)
            m_count = len(range(*sl.indices(n)))
            pad = chunk - m_count
            pick = (lambda a: np.concatenate(
                [a[sl], np.repeat(a[-1:], pad, axis=0)]) if pad else a[sl])
            gt_log_np = pick(log_gt_all)
            t0 = time.perf_counter()
            outs = render_chunk(state.params, jnp.asarray(pick(mic_all)),
                                jnp.asarray(pick(src_all)),
                                jnp.asarray(pick(rot_all)),
                                jnp.asarray(gt_log_np), key)
            outs[3].block_until_ready()
            render_time += time.perf_counter() - t0
            (log_pred_np, mag_pred_np, mag_gt_np, wav_pred_np,
             wav_gt_istft_np) = (np.asarray(x) for x in outs)
            for j in range(m_count):
                gi = i + j
                wav_gt_ff = (dataset.waveforms[gi]
                             if dataset.waveforms is not None
                             else wav_gt_istft_np[j])
                per_rir.append(evaluator.get_full_metrics(
                    mag_pred_np[j], mag_gt_np[j], wav_gt_ff,
                    wav_pred_np[j], wav_gt_istft_np[j],
                    log_pred_np[j], gt_log_np[j]))
            # chunk-size-weighted running mean of the quick metrics
            qm = evaluator.get_stft_metrics(mag_pred_np[:m_count],
                                            mag_gt_np[:m_count])
            for k2, v in qm.items():
                quick_acc[f"quick_{k2}"] = (
                    quick_acc.get(f"quick_{k2}", 0.0) + float(v) * m_count)

        out = {}
        for k in per_rir[0]:
            vals = np.asarray([m2[k] for m2 in per_rir], dtype=np.float64)
            out[k] = float(np.mean(vals))
            out[f"{k}_std"] = float(np.std(vals))
        out["num_rays_per_sec_audio"] = n * cfg.max_len / render_time
        out["fps_audio"] = n / render_time
        for k2, v in quick_acc.items():
            out[k2] = v / n
        return out
