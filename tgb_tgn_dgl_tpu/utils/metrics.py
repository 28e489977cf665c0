"""Structured metrics + profiling (SURVEY.md §5.1, §5.5).

The reference's only observability is stdout prints of per-epoch
loss/AP/AUC/MRR and wall-clock deltas (reference pyg-mem-tgn.py:53-67,
epoch_utils.py:312-317).  This module provides:

  * ``MetricsLogger`` — jsonl event log (one JSON object per line, with
    step/epoch/wall-time) + the same stdout prints for parity;
  * ``timed`` — lightweight named section timers with EMA summaries;
  * ``profile`` — context manager around ``jax.profiler.trace`` emitting
    TensorBoard/Perfetto traces, plus ``annotate`` for named regions
    (jax.profiler.TraceAnnotation).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only jsonl metrics sink.

    >>> m = MetricsLogger("runs/exp1")   # writes runs/exp1/metrics.jsonl
    >>> m.log("train_epoch", epoch=1, loss=12.3, ap=0.9)
    """

    def __init__(self, log_dir: Optional[str] = None, echo=None):
        self.log_dir = log_dir
        self.echo = echo
        self._fh = None
        self._t0 = time.time()
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._fh = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                            buffering=1)

    def log(self, event: str, **fields) -> Dict:
        rec = {"event": event, "wall_s": round(time.time() - self._t0, 4),
               **fields}
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
        if self.echo is not None:
            self.echo(rec)
        return rec

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class SectionTimers:
    """Named wall-clock section timers with exponential moving averages —
    the per-section breakdown (pack / transfer / device / metrics) that
    identifies the pipeline bottleneck."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: Dict[str, float] = {}
        self.total: Dict[str, float] = {}
        self.count: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.ema[name] = (dt if name not in self.ema
                              else (1 - self.alpha) * self.ema[name]
                              + self.alpha * dt)
            self.total[name] = self.total.get(name, 0.0) + dt
            self.count[name] = self.count.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "ema_ms": round(self.ema[name] * 1e3, 3),
                "mean_ms": round(self.total[name] / self.count[name] * 1e3,
                                 3),
                "total_s": round(self.total[name], 3),
                "count": self.count[name],
            }
            for name in self.total
        }


@contextlib.contextmanager
def profile(log_dir: str, enabled: bool = True):
    """jax.profiler trace (TensorBoard / Perfetto) around a region."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a profile trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)
