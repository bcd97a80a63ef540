"""Metric logging: CSV always, TensorBoard when available.

Replaces the reference's Lightning ``self.log_dict`` -> TensorBoard wiring
(/root/reference/base_asr_models.py:84,93; examples/librispeech.sh:10).
"""

from __future__ import annotations

import csv
import os
import time


class MetricLogger:
    def __init__(self, run_dir: str, use_tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._csv_path = os.path.join(run_dir, 'metrics.csv')
        self._csv_file = open(self._csv_path, 'a', newline='')
        self._csv = csv.writer(self._csv_file)
        if os.path.getsize(self._csv_path) == 0:
            self._csv.writerow(['time', 'step', 'metric', 'value'])
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(os.path.join(run_dir, 'tb'))
            except ImportError:
                pass

    def log(self, step: int, metrics: dict):
        now = time.time()
        for key, value in metrics.items():
            value = float(value)
            self._csv.writerow([f'{now:.3f}', step, key, value])
            if self._tb is not None:
                self._tb.add_scalar(key, value, step)
        self._csv_file.flush()

    def close(self):
        self._csv_file.close()
        if self._tb is not None:
            self._tb.close()
