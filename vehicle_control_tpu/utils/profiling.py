"""Profiling + observability utilities (SURVEY §5).

The reference's tracing story is a wall-clock around each solve
(racing.py:231-234) and IPOPT's own (disabled) timers.  Here:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the actual on-device execution;
* :class:`StepTimer` — wall-clock accumulation compatible with the
  reference's ``elapsed`` artifact arrays;
* :func:`solver_stats` — aggregates per-step :class:`MPCInfo`/FleetStats
  into the health summary (convergence rate, violation percentiles,
  iteration histogram) that replaces the reference's swallowed exceptions
  (racing.py:416-423) as the failure-visibility mechanism.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a code block (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; exports the reference's `elapsed`
    array layout (racing.py:447)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def elapsed(self) -> np.ndarray:
        return np.asarray(self.times)

    def summary(self) -> dict:
        t = self.elapsed * 1e3
        if len(t) == 0:
            return {}
        return {
            "mean_ms": float(t.mean()),
            "p50_ms": float(np.percentile(t, 50)),
            "p95_ms": float(np.percentile(t, 95)),
            "steps": len(t),
        }


def solver_stats(violations, iterations, converged) -> dict:
    """Aggregate per-step solver health arrays into a summary dict."""
    violations = np.asarray(violations)
    iterations = np.asarray(iterations)
    converged = np.asarray(converged)
    return {
        "convergence_rate": float(np.mean(converged)),
        "violation_p50": float(np.percentile(violations, 50)),
        "violation_p95": float(np.percentile(violations, 95)),
        "violation_max": float(np.max(violations)),
        "iterations_mean": float(np.mean(iterations)),
        "iterations_p95": float(np.percentile(iterations, 95)),
        "n_steps": int(len(violations)),
    }
