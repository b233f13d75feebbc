"""Phase timers + ETA reporting (solver_3dvlp.py:836-930, utils/eta.py)."""

from __future__ import annotations

import time
from collections import defaultdict


class PhaseTimers:
    """Accumulates wall-clock per phase (fetch/forward/backward/eval/iter)."""

    def __init__(self):
        self.times = defaultdict(list)
        self._start = {}

    def start(self, phase: str):
        self._start[phase] = time.perf_counter()

    def stop(self, phase: str):
        self.times[phase].append(time.perf_counter() - self._start[phase])

    def mean(self, phase: str) -> float:
        v = self.times[phase]
        return sum(v) / len(v) if v else 0.0

    def report(self) -> dict:
        return {f"mean_{k}_time": self.mean(k) for k in self.times}

    def reset(self):
        self.times.clear()


def eta_str(mean_iter_time: float, remaining_iters: int) -> str:
    secs = int(mean_iter_time * remaining_iters)
    h, rem = divmod(secs, 3600)
    m, s = divmod(rem, 60)
    return f"{h}h {m}m {s}s"
