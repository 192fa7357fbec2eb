"""Metrics logging: tensorboard events + JSONL mirror.

The reference logs through nerfstudio's tensorboard writer
(NeRAF_config.py:134). Here scalars go to a torch SummaryWriter when one
is importable (torch is NOT present in this image, so tensorboard event
writing is disabled here) and always to a plain JSONL file so runs are
inspectable without any viewer.
"""

from __future__ import annotations

import json
from pathlib import Path


class MetricsWriter:
    def __init__(self, log_dir: str | Path, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir / "tb"))
            except Exception:
                self._tb = None

    def write_scalars(self, step: int, scalars: dict, prefix: str = ""):
        record = {"step": step, "prefix": prefix, **{
            k: (float(v) if isinstance(v, (int, float)) or hasattr(v, "item") else v)
            for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                try:
                    self._tb.add_scalar(f"{prefix}/{k}" if prefix else k,
                                        float(v), step)
                except (TypeError, ValueError):
                    pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
