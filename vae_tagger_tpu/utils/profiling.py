"""Profiling and throughput helpers.

The reference has no tracing/profiling at all (SURVEY.md §5).  Here:
- :func:`trace` — a convenience jax.profiler capture context for ad-hoc
  investigation (training loops have their own ``--profile_steps`` capture,
  train/loop.py);
- :class:`ThroughputMeter` — the images/sec meter used by the inference
  loops (infer/classify.py, infer/latents.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/vae_tagger_trace"):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {log_dir}")


class ThroughputMeter:
    """Sliding-window images/sec counter."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._count = 0

    def update(self, n: int):
        self._count += n

    @property
    def images_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._count / dt if dt > 0 else 0.0

    def report(self, prefix: str = "") -> str:
        return f"{prefix}{self.images_per_sec:.2f} images/sec"
