"""Training anomaly detection (parity with reference
scripts/phase5_big_run.py:1210-1230, 1862-1872):

- NaN/Inf loss      -> fatal (caller emergency-checkpoints and raises)
- loss spike        -> warning when loss > spike_factor x trailing mean
                       AND loss - mean > spike_floor (absolute headroom:
                       at converged loss scale a purely relative threshold
                       fires on ~0.01-magnitude jitter every few steps —
                       observed in the round-5 30K soak — so production
                       runs set a small floor, e.g. 0.5)
- embedding collapse-> warning when CLS embedding std < collapse_std
"""

from __future__ import annotations

import math
from collections import deque
from dataclasses import dataclass, field


@dataclass
class AnomalyDetector:
    window: int = 10
    spike_factor: float = 2.0
    spike_floor: float = 0.0
    collapse_std: float = 0.01
    _history: deque = field(default_factory=lambda: deque(maxlen=10))

    def check(self, loss: float, embed_std: float) -> tuple[str, str]:
        """Returns (severity, message); severity in {"ok", "warn", "fatal"}."""
        if not math.isfinite(loss):
            return "fatal", f"non-finite loss: {loss}"
        verdict: tuple[str, str] = ("ok", "")
        if len(self._history) >= self.window:
            mean = sum(self._history) / len(self._history)
            if (mean > 0 and loss > self.spike_factor * mean
                    and loss - mean > self.spike_floor):
                verdict = ("warn", f"loss spike: {loss:.4f} > {self.spike_factor}x mean {mean:.4f}")
        if embed_std < self.collapse_std:
            verdict = ("warn", f"possible collapse: embed_std {embed_std:.5f} < {self.collapse_std}")
        self._history.append(loss)
        return verdict
