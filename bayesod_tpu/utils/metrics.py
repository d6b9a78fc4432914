"""Metrics logging: JSONL stream + optional TensorBoard scalars.

Counterpart of the reference's tf.summary scalar writing (SURVEY.md §5.5),
plus a machine-readable JSONL stream (one record per log step) so scripted
judging / bench harnesses never parse TensorBoard event files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, out_dir: str, tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self._jsonl = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except ImportError:  # pragma: no cover
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        record = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            record[prefix + k] = float(v)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(prefix + k, float(v), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
