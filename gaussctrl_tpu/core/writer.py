"""Metrics logging + profiling hooks.

Replaces the nerfstudio writer/profiler surface the reference inherits
(/root/reference/gaussctrl/gc_trainer.py:120-134, 185-223: event writers,
`TimeWriter` section timers, `@profiler.time_function`): a dependency-free
JSONL event writer with console echo, wall-clock section timers, and a
`jax.profiler` trace context for TPU timeline capture (the xprof-compatible
replacement for torch profiling).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Optional


class MetricsWriter:
    """Append-only JSONL scalar log (`events.jsonl`) with console echo."""

    def __init__(self, log_dir: Optional[str] = None, echo: bool = True,
                 echo_every: int = 50):
        self.path = None
        if log_dir is not None:
            Path(log_dir).mkdir(parents=True, exist_ok=True)
            self.path = Path(log_dir) / "events.jsonl"
            self._fh = open(self.path, "a")
        self.echo = echo
        self.echo_every = echo_every
        self._t0 = time.time()

    def write(self, step: int, scalars: dict, group: str = "train"):
        rec = {"step": step, "group": group, "t": round(time.time() - self._t0, 3),
               **{k: float(v) for k, v in scalars.items()}}
        if self.path is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.echo and step % self.echo_every == 0:
            body = " ".join(f"{k}={v:.5g}" for k, v in scalars.items())
            print(f"[{group} {step}] {body}", flush=True)

    def close(self):
        if self.path is not None:
            self._fh.close()


class SectionTimers:
    """Named wall-clock timers (the TimeWriter role, gc_trainer.py:185-191)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {n: {"total_s": round(self.totals[n], 3),
                    "count": self.counts[n],
                    "mean_s": round(self.totals[n] / max(self.counts[n], 1), 4)}
                for n in self.totals}


@contextlib.contextmanager
def tpu_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
