"""Observability: profiling hooks, step timing, debug-mode numeric checks.

The reference has no tracing in src/ (tests aggregate wall time with
TimerOutputs, `/root/reference/test/runtests.jl:13-17`) and relies on
scattered asserts for numeric sanity (SURVEY.md §5). TPU-native analogue:
`jax.profiler` traces for the compiled hot loop and optional
NaN/negative-variance guards.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/odefilters-trace"):
    """Profile a block with the JAX/XLA profiler (view in TensorBoard or
    Perfetto). Wrap a jitted solve to see per-op TPU timings."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Host-side wall-clock timer for solver phases (the TimerOutputs
    analogue). Blocks on device results, so only use it for benchmarking."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = [f"{'section':<30} {'calls':>6} {'total s':>10}"]
        for k in sorted(self.times, key=self.times.get, reverse=True):
            lines.append(f"{k:<30} {self.counts[k]:>6} {self.times[k]:>10.4f}")
        return "\n".join(lines)


def check_state(x_mean: jax.Array, x_chol: jax.Array, where: str = "") -> None:
    """Debug-mode sanity guard (the reference's
    `assert_nonnegative_diagonal` / NaN asserts,
    `/root/reference/src/numerics_tricks.jl:1-6`, `smoothing.jl:25`).

    Use under `jax.debug.callback` or on concrete arrays; raises on NaN.
    In square-root form negative variances cannot occur, so only NaN/Inf
    are checked.
    """
    if not bool(jnp.all(jnp.isfinite(x_mean))):
        raise FloatingPointError(f"NaN/Inf in state mean {where}")
    if not bool(jnp.all(jnp.isfinite(x_chol))):
        raise FloatingPointError(f"NaN/Inf in covariance factor {where}")


def nan_guard(fn):
    """Wrap a jitted solve with jax.debug NaN checking (debug mode)."""

    def wrapped(*args, **kwargs):
        with jax.debug_nans(True):
            return fn(*args, **kwargs)

    return wrapped
