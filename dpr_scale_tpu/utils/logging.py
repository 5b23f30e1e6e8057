"""Metric logging: stdout lines + optional JSONL file + optional TensorBoard.

(The reference uses Lightning's TB logger + progress bar; SURVEY.md §5.)
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, jsonl_path: Optional[str] = None, tensorboard_dir: Optional[str] = None):
        self._file = None
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)), exist_ok=True)
            self._file = open(jsonl_path, "a")
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except ImportError:
                pass

    def scalars(self, step: int, metrics: Dict[str, float]) -> None:
        parts = " ".join(f"{k}={v:.6g}" for k, v in metrics.items())
        print(f"[step {step}] {parts}", flush=True)
        if self._file:
            self._file.write(json.dumps({"step": step, "ts": time.time(), **metrics}) + "\n")
            self._file.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
