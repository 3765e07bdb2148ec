"""Experiment logger: opt.txt dump, timestamped text log, TF-event scalars.

Reference: src/lib/logger.py:17-77 (opt.txt + log.txt + tensorboardX).
TensorBoard scalars are written via tf.summary when tensorflow is present,
else silently skipped.
"""
from __future__ import annotations

import os
import time
import sys


class Logger:
    def __init__(self, save_dir: str, config_json: str | None = None):
        os.makedirs(save_dir, exist_ok=True)
        self.save_dir = save_dir
        time_str = time.strftime("%Y-%m-%d-%H-%M")
        if config_json is not None:
            with open(os.path.join(save_dir, "opt.txt"), "w") as f:
                f.write(f"==> commandline: {' '.join(sys.argv)}\n")
                f.write(config_json)
        log_dir = os.path.join(save_dir, f"logs_{time_str}")
        os.makedirs(log_dir, exist_ok=True)
        self.log = open(os.path.join(log_dir, "log.txt"), "w")
        self._start_line = True
        self._writer = None
        try:
            import tensorflow as tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            pass

    def write(self, txt: str):
        if self._start_line:
            self.log.write(time.strftime("%Y-%m-%d-%H-%M: "))
        self.log.write(txt)
        self._start_line = txt.endswith("\n")
        self.log.flush()

    def scalar_summary(self, tag: str, value, step: int):
        if self._writer is not None:
            import tensorflow as tf
            with self._writer.as_default():
                tf.summary.scalar(tag, float(value), step=step)

    def close(self):
        self.log.close()
