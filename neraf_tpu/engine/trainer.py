"""Training loop: cadenced eval, checkpointing, logging.

Rebuild of the nerfstudio Trainer engine as configured by the reference
(NeRAF_config.py:70-136): max_num_iterations with periodic eval-batch /
eval-image / eval-all cadences, checkpoint save every steps_per_save keeping
all checkpoints, tensorboard scalar logging, and --load-dir resume.

The loop body is thin: all heavy work is the pipeline's single jitted step.
Metrics fetch is throttled to steps_per_log so device->host syncs don't gate
step throughput.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable

import numpy as np

from neraf_tpu.configs.config import ExperimentConfig, save_config
from neraf_tpu.engine.checkpoints import latest_checkpoint, restore_checkpoint, save_checkpoint
from neraf_tpu.utils.writer import MetricsWriter


@dataclasses.dataclass
class Trainer:
    config: ExperimentConfig
    pipeline: Any  # JointPipeline or AudioEngine
    output_dir: Path | None = None

    def __post_init__(self):
        cfg = self.config
        if self.output_dir is None:
            stamp = time.strftime("%Y-%m-%d_%H%M%S")
            self.output_dir = (Path(cfg.output_dir) / cfg.experiment_name /
                               cfg.method_name / stamp)
        self.output_dir = Path(self.output_dir)
        self.ckpt_dir = self.output_dir / "neraf_models"
        self.writer = MetricsWriter(self.output_dir)

    def save_run_config(self):
        save_config(self.config, self.output_dir / "config.yml")

    def maybe_resume(self, state, load_dir: str | None):
        if load_dir is None:
            return state, 0
        path = latest_checkpoint(load_dir)
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {load_dir}")
        restored = restore_checkpoint(path, state)
        return restored, int(np.asarray(restored.step))

    def train(
        self,
        state,
        step_fn: Callable[[Any], tuple[Any, dict]],
        eval_fns: dict[str, Callable[[Any], dict]] | None = None,
        eval_batch_fn: Callable[[Any], dict] | None = None,
        eval_image_fn: Callable[[Any, int], dict] | None = None,
        max_steps: int | None = None,
        on_metrics: Callable[[int, dict], None] | None = None,
    ):
        """Run the loop. step_fn(state) -> (state, metrics).

        Cadences mirror the reference TrainerConfig (NeRAF_config.py:73-76):
        eval_batch_fn at steps_per_eval_batch, eval_image_fn at
        steps_per_eval_image, eval_fns (the full sweeps) at
        steps_per_eval_all_images, checkpoints at steps_per_save.
        """
        tcfg = self.config.trainer
        max_steps = tcfg.max_num_iterations if max_steps is None else max_steps
        eval_fns = eval_fns or {}
        self.save_run_config()

        start_step = int(np.asarray(state.step))
        t_last = time.perf_counter()
        try:
            state = self._loop(state, step_fn, eval_fns, eval_batch_fn,
                               eval_image_fn, start_step, max_steps,
                               on_metrics, t_last)
        except (KeyboardInterrupt, Exception):
            # emergency checkpoint so preemptions/crashes are resumable
            latest = getattr(self, "_latest_state", state)
            try:
                step_now = int(np.asarray(latest.step))
                save_checkpoint(self.ckpt_dir, step_now, latest,
                                keep_all=not tcfg.save_only_latest_checkpoint)
                print(f"emergency checkpoint saved at step {step_now}")
            except Exception:
                pass
            raise

        save_checkpoint(self.ckpt_dir, max_steps, state,
                        keep_all=not tcfg.save_only_latest_checkpoint)
        return state

    def _loop(self, state, step_fn, eval_fns, eval_batch_fn, eval_image_fn,
              start_step, max_steps, on_metrics, t_last):
        tcfg = self.config.trainer
        for step in range(start_step, max_steps):
            state, metrics = step_fn(state)
            self._latest_state = state

            if (step + 1) % tcfg.steps_per_log == 0:
                now = time.perf_counter()
                scalars = {k: float(np.asarray(v)) for k, v in metrics.items()}
                scalars["steps_per_sec"] = tcfg.steps_per_log / (now - t_last)
                t_last = now
                self.writer.write_scalars(step + 1, scalars, prefix="train")
                if on_metrics is not None:
                    on_metrics(step + 1, scalars)

            if eval_batch_fn is not None and (step + 1) % tcfg.steps_per_eval_batch == 0:
                self.writer.write_scalars(step + 1, eval_batch_fn(state),
                                          prefix="eval_batch")

            if eval_image_fn is not None and (step + 1) % tcfg.steps_per_eval_image == 0:
                self.writer.write_scalars(step + 1, eval_image_fn(state, step + 1),
                                          prefix="eval_image")

            if (step + 1) % tcfg.steps_per_eval_all_images == 0:
                for name, fn in eval_fns.items():
                    results = fn(state)
                    self.writer.write_scalars(step + 1, results, prefix=name)

            if (step + 1) % tcfg.steps_per_save == 0:
                save_checkpoint(self.ckpt_dir, step + 1, state,
                                keep_all=not tcfg.save_only_latest_checkpoint)

        return state

    def write_eval_json(self, results: dict, output_path: str | Path):
        """ns-eval --output-path equivalent."""
        output_path = Path(output_path)
        output_path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "experiment_name": self.config.experiment_name,
            "method_name": self.config.method_name,
            "results": results,
        }
        with open(output_path, "w") as f:
            json.dump(payload, f, indent=2)
