"""Work-precision analysis: error vs cost curves.

The reference leans on DiffEqDevTools.jl (`WorkPrecisionSet`, `appxtrue`,
`test_convergence`) for this — external tooling it does not ship. Here it
is part of the framework (BASELINE.md: "WP error at rtol=1e-8" is a
headline metric).

The oracle is a scipy ``solve_ivp`` LSODA/BDF solve at rtol=1e-12 (playing
the reference tests' BigFloat Tsit5 role, `test/correctness.jl:19-24`), or
``prob.analytic`` when available.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from odefilters.algorithms import AbstractEK
from odefilters.problem import ODEProblem
from odefilters.solve import solve


@dataclass
class WPPoint:
    abstol: float
    reltol: float
    error_l2: float
    error_final: float
    n_steps: int
    nf: int
    runtime_s: float


@dataclass
class WorkPrecisionResult:
    name: str
    points: list[WPPoint] = field(default_factory=list)

    def as_dict(self):
        return {
            "name": self.name,
            "points": [vars(p) for p in self.points],
        }


def reference_solution(prob: ODEProblem, ts: np.ndarray, stiff: bool = False):
    """High-precision oracle trajectory at times ``ts``."""
    if prob.analytic is not None:
        return np.stack(
            [np.asarray(prob.analytic(prob.u0, prob.p, t)) for t in ts]
        )
    from scipy.integrate import solve_ivp

    # RHS pinned to CPU and jitted once: general vector fields need JAX,
    # but an unjitted call per LSODA evaluation would dominate the oracle
    # (CLAUDE.md note on oracle RHS cost).
    cpu = jax.devices("cpu")[0]
    f_jit = jax.jit(prob.f, device=cpu)
    jac = None
    if prob.jac is not None and not isinstance(prob.jac, tuple):
        jac_jit = jax.jit(prob.jac, device=cpu)
        jac = lambda t, y: np.asarray(jac_jit(jnp.asarray(y), prob.p, t))
    r = solve_ivp(
        lambda t, y: np.asarray(f_jit(jnp.asarray(y), prob.p, t)),
        prob.tspan,
        np.asarray(prob.u0, dtype=np.float64),
        t_eval=ts,
        rtol=1e-12,
        atol=1e-12,
        method="BDF" if stiff else "LSODA",
        jac=jac,
    )
    return r.y.T


def work_precision(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    tols: Sequence[tuple[float, float]] = (
        (1e-4, 1e-2), (1e-6, 1e-4), (1e-8, 1e-6), (1e-10, 1e-8),
    ),
    name: Optional[str] = None,
    stiff: bool = False,
    max_steps: int = 16384,
    timing_iters: int = 2,
) -> WorkPrecisionResult:
    """Solve at a ladder of tolerances; report error + cost per rung."""
    result = WorkPrecisionResult(
        name=name or f"{type(alg).__name__}({alg.order},{alg.diffusionmodel})"
    )
    for abstol, reltol in tols:
        sol = solve(prob, alg, abstol=abstol, reltol=reltol, max_steps=max_steps)
        jax.block_until_ready(sol.u)
        t0 = time.perf_counter()
        for _ in range(timing_iters):
            sol = solve(
                prob, alg, abstol=abstol, reltol=reltol, max_steps=max_steps
            )
            jax.block_until_ready(sol.u)
        runtime = (time.perf_counter() - t0) / timing_iters

        n = int(sol.n_steps)
        ts = np.asarray(sol.ts[: n + 1], dtype=np.float64)
        u = np.asarray(sol.u[: n + 1], dtype=np.float64)
        ref = reference_solution(prob, ts, stiff=stiff)
        err = u - ref
        result.points.append(
            WPPoint(
                abstol=abstol,
                reltol=reltol,
                error_l2=float(np.sqrt(np.mean(err**2))),
                error_final=float(np.linalg.norm(err[-1])),
                n_steps=n,
                nf=int(sol.stats.nf),
                runtime_s=runtime,
            )
        )
    return result
