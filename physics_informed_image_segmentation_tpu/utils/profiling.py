"""Profiling & observability: XLA traces, step timing, throughput.

The reference has no profiler, no timers, not even per-epoch wall clock
(SURVEY.md §5).  This module supplies the TPU-native equivalents:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable XLA trace (op-level timeline incl. fusion view),
* :class:`StepTimer` — wall-clock timing with forced device sync
  (on the axon tunnel `block_until_ready` alone does not wait; a scalar
  fetch does — see bench.py),
* :class:`ThroughputMeter` — images/sec (/chip) counters of the kind
  the headline benchmark reports.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import numpy as np

__all__ = ["trace", "sync", "StepTimer", "ThroughputMeter"]


def sync(value=None) -> None:
    """Force completion of pending device work.

    Fetches a scalar when given one (reliable on all transports,
    including the axon TPU tunnel where ``block_until_ready`` returns
    early); otherwise round-trips a trivial computation.
    """
    if value is not None:
        jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), value
        )
    else:
        np.asarray(jax.device_get(jax.numpy.zeros(())))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace", host_tracer_level: int = 2):
    """Capture an XLA profiler trace: ``with trace("/tmp/tr"): step(...)``.

    View with TensorBoard's profile plugin or xprof.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timing with warmup discard.

    >>> t = StepTimer(warmup=2)
    >>> for _ in range(10):
    ...     with t.step():
    ...         out = step_fn(...)
    ...         t.sync(out)
    >>> t.mean_ms
    """

    warmup: int = 1
    times: List[float] = field(default_factory=list)
    _seen: int = 0
    _t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def sync(self, value) -> None:
        sync(value)

    @property
    def mean_ms(self) -> float:
        return float(np.mean(self.times) * 1e3) if self.times else float("nan")

    @property
    def p50_ms(self) -> float:
        return float(np.percentile(self.times, 50) * 1e3) if self.times else float("nan")

    @property
    def p99_ms(self) -> float:
        return float(np.percentile(self.times, 99) * 1e3) if self.times else float("nan")


@dataclass
class ThroughputMeter:
    """Images/sec and images/sec/chip accounting."""

    n_devices: int = 0
    _images: int = 0
    _start: Optional[float] = None

    def __post_init__(self):
        if self.n_devices == 0:
            self.n_devices = jax.device_count()

    def start(self) -> None:
        self._start = time.perf_counter()
        self._images = 0

    def add(self, n_images: int) -> None:
        if self._start is None:
            self.start()
        self._images += n_images

    @property
    def images_per_sec(self) -> float:
        if self._start is None or self._images == 0:
            return 0.0
        return self._images / (time.perf_counter() - self._start)

    @property
    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / max(1, self.n_devices)

    def report(self) -> dict:
        return {
            "images": self._images,
            "images_per_sec": round(self.images_per_sec, 1),
            "images_per_sec_per_chip": round(self.images_per_sec_per_chip, 1),
            "n_devices": self.n_devices,
        }
