"""Tracing / profiling helpers.

The reference has no profiling beyond wall-clock prints
(evaluate_depth.py:97-98,178-179, trainer.py:1206-1216). Here:
  - `trace(logdir)` — context manager around `jax.profiler` for full
    XLA/TPU traces viewable in TensorBoard/Perfetto;
  - `StepTimer` — EMA step-time + imgs/sec meter (the log_time
    replacement);
  - `time_fn` — compile-excluded steady-state timer for kernels.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last = None
        self.step_time = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        return self.step_time or 0.0

    def images_per_sec(self, batch_size: int) -> float:
        return batch_size / self.step_time if self.step_time else 0.0


def time_fn(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Steady-state seconds/call of a jitted fn (blocks on the result)."""
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
