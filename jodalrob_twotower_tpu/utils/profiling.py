"""Profiling and observability.

The reference had none of this (SURVEY.md §5: throughput was read off tqdm,
timing was ad-hoc time.time()). First-class here:

* :class:`StepTimer` — honest step timing. On the tunneled runtime
  ``block_until_ready`` can return before execution finishes, so the timer
  forces a VALUE fetch of a designated scalar before reading the clock.
* :class:`MetricsLogger` — structured JSONL metrics stream (step, wall
  time, metric dict) next to the human log.
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
* :func:`device_flops_estimate` — utilization = achieved / measured-peak
  matmul throughput (measured once, cached), so "% of speed-of-light" is
  relative to the chip actually attached, not a spec sheet.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Mapping

import numpy as np


class StepTimer:
    """Wall-clock timer whose stop() forces a device value fetch."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, fetch=None) -> float:
        if fetch is not None:
            np.asarray(jax_leaf(fetch)).ravel()[:1]  # force D2H
        assert self._t0 is not None, "start() first"
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        self._t0 = None
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.percentile(self.times, 50)) if self.times else float("nan")

    def summary(self, batch_size: int | None = None) -> dict:
        out = {
            "steps": len(self.times),
            "mean_ms": self.mean * 1e3,
            "p50_ms": self.p50 * 1e3,
        }
        if batch_size and self.times:
            out["examples_per_sec"] = batch_size / self.mean
        return out


def jax_leaf(tree):
    import jax

    leaves = jax.tree.leaves(tree)
    return leaves[0] if leaves else np.zeros(())


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str | Path) -> None:
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = self.path.open("a")
        self._start = time.time()

    def log(self, step: int, metrics: Mapping[str, object], **extra) -> None:
        row = {
            "step": int(step),
            "time": round(time.time() - self._start, 3),
            **{k: (float(v) if isinstance(v, (int, float, np.floating)) or hasattr(v, "item") else v)
               for k, v in metrics.items()},
            **extra,
        }
        self._fh.write(json.dumps(row) + "\n")
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    @staticmethod
    def read(path: str | Path) -> list[dict]:
        with Path(path).open() as fh:
            return [json.loads(line) for line in fh if line.strip()]


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


_PEAK_CACHE: dict[str, float] = {}


def device_flops_estimate(*, dtype="bfloat16", n: int = 2048) -> float:
    """Measured peak matmul FLOP/s of the attached device (cached)."""
    import jax
    import jax.numpy as jnp

    key = f"{jax.devices()[0].device_kind}-{dtype}-{n}"
    if key in _PEAK_CACHE:
        return _PEAK_CACHE[key]
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    a = jnp.ones((n, n), dt)
    b = jnp.ones((n, n), dt)

    @jax.jit
    def mm(x, y):
        return jnp.sum(jnp.dot(x, y, preferred_element_type=jnp.float32))

    float(mm(a, b))  # compile + warm
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = mm(a, b)
    float(out)
    dt_s = (time.perf_counter() - t0) / reps
    peak = 2 * n**3 / dt_s
    _PEAK_CACHE[key] = peak
    return peak


def utilization(step_time_s: float, flops_per_step: float, **peak_kwargs) -> float:
    """Achieved fraction of measured peak."""
    peak = device_flops_estimate(**peak_kwargs)
    return (flops_per_step / step_time_s) / peak
