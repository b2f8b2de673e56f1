"""Iterated extended Kalman smoothing (IEKS).

TPU-native replacement for `/root/reference/src/ieks.jl`: an outer loop that
re-solves the IVP with the EK1 measurement linearized at the previous
smoothed posterior mean (`/root/reference/src/perform_step.jl:111-113`),
yielding the MAP estimate (Tronarp, Sarkka, Hennig: "Bayesian ODE Solvers:
The Maximum A Posteriori Estimate").

Like the reference's ``solve_ieks`` (`ieks.jl:53-61`) this iterates a fixed
number of times with no convergence criterion. For a fully-parallel
in-place variant on a fixed grid, see
``odefilters.parallel.associative.solve_fixed_parallel`` (each IEKS sweep
is a time-parallel associative scan there).
"""

from __future__ import annotations

from typing import Optional

from odefilters.algorithms import IEKS
from odefilters.problem import ODEProblem
from odefilters.solution import ProbODESolution
from odefilters.solve import solve


def solve_ieks(
    prob: ODEProblem,
    alg: Optional[IEKS] = None,
    *,
    iterations: int = 10,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    **kwargs,
) -> ProbODESolution:
    """Solve by iterated extended Kalman smoothing.

    Each iteration solves with ``linearize_at`` = previous posterior mean
    (a dense-output callable, mirroring ``alg.linearize_at(t).mu`` at
    `perform_step.jl:112`); the first iteration linearizes at the predicted
    mean like a plain EK1 solve.
    """
    if alg is None:
        alg = IEKS()
    sol = None
    for _ in range(iterations):
        sol = solve(
            prob, alg, abstol=abstol, reltol=reltol,
            linearize_sol=sol, **kwargs,
        )
    return sol


def solve_ieks_fixed(
    prob: ODEProblem,
    alg: Optional[IEKS] = None,
    *,
    ts,
    iterations: int = 10,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
) -> ProbODESolution:
    """Fixed-grid IEKS: iterate the fixed-grid EK1 solve, linearizing the
    measurement at the previous iteration's smoothed posterior mean ON the
    grid (no dense-output evaluation needed — the grid is shared across
    iterations, so ``linearize_us`` is simply the previous ``sol.u``).

    This is the natural TPU shape of `ieks.jl:53-61` (one fused scan per
    sweep, reverse-mode differentiable) and the XLA reference for the
    fused-kernel ensemble IEKS (`odefilters.ieks_ensemble_pallas`).
    First-order problems only (the second-order measurement has no
    linearization hook).
    """
    from odefilters.fixedgrid import solve_fixed

    if alg is None:
        alg = IEKS()
    if prob.second_order:
        raise NotImplementedError("fixed-grid IEKS is first-order only")
    sol = None
    for _ in range(iterations):
        lin = None if sol is None else sol.u
        sol = solve_fixed(
            prob, alg, ts=ts, abstol=abstol, reltol=reltol,
            linearize_us=lin,
        )
    return sol
