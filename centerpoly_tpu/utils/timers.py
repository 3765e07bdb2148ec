"""Timing instrumentation.

Mirrors the reference's per-stage wall-clock breakdown
(reference: src/lib/detectors/base_detector.py:105-191 and
src/lib/utils/utils.py:7-23 AverageMeter) with `block_until_ready` fences
in place of cuda.synchronize.
"""
from __future__ import annotations

import time
from typing import Dict


class AverageMeter:
    """Running average (ref utils/utils.py:7-23)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        if self.count > 0:
            self.avg = self.sum / self.count


class StageTimer:
    """Accumulates named stage durations; device stages must pass a fence
    (an array to block_until_ready) so async dispatch is measured honestly."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stage(self, name: str, fence=None):
        if fence is not None:
            # no blanket except: a computation error surfacing at the
            # fence must raise HERE, attributed to this stage — not be
            # swallowed into a bogus ~0 ms time and resurface later at
            # the host fetch blamed on the wrong stage
            import jax
            jax.block_until_ready(fence)
        now = time.perf_counter()
        self.times[name] = self.times.get(name, 0.0) + (now - self._t0)
        self._t0 = now
