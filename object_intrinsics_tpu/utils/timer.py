"""Wall-clock timing helpers (rebuilds tu/loggers/timer.py:8-30) plus a
jax.profiler trace context for TPU profiling (the reference has no profiler
driver; SURVEY §5 requires a first-class throughput meter)."""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def print_time(tag: str = ""):
    t0 = time.time()
    yield
    logger.info("%s: %.4fs", tag, time.time() - t0)


@contextlib.contextmanager
def named_timeit(tag: str, store: Dict[str, float]):
    t0 = time.time()
    yield
    store[tag] = store.get(tag, 0.0) + (time.time() - t0)


@contextlib.contextmanager
def timeit_as_list(tag: str, store: Dict[str, List[float]]):
    t0 = time.time()
    yield
    store.setdefault(tag, []).append(time.time() - t0)


@contextlib.contextmanager
def jax_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("wrote profiler trace to %s", log_dir)


class ThroughputMeter:
    """Rays/sec + iters/sec meter with fetch-forced synchronization."""

    def __init__(self, rays_per_iter: int):
        self.rays_per_iter = rays_per_iter
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._n = 0

    def tick(self, n: int = 1):
        self._n += n

    def report(self) -> Dict[str, float]:
        dt = max(time.time() - self._t0, 1e-9)
        return {
            "iters_per_sec": self._n / dt,
            "rays_per_sec": self._n * self.rays_per_iter / dt,
        }
