"""odefilters — a TPU-native probabilistic ODE solver framework.

A from-scratch JAX/XLA/Pallas re-design of ProbNumDiffEq.jl (a.k.a.
ODEFilters.jl, reference at /root/reference): EK0/EK1 Gaussian ODE filters
with square-root (QR-based) Kalman filtering/smoothing, IBM priors with
preconditioning, five diffusion-calibration models, Taylor-mode exact
initialization, an adaptive PI-controlled driver, dense posterior output,
posterior sampling, IEKS — plus what the reference never had: `vmap`
ensembles, device-mesh sharding, and time-parallel associative-scan
filtering/smoothing.

Quick start::

    import odefilters as odf
    prob = odf.models.fitzhugh_nagumo()
    sol = odf.solve(prob, odf.EK1(order=3), abstol=1e-6, reltol=1e-3)
    sol.u            # posterior means at the solver grid
    sol(2.5)         # dense output: Gaussian at t=2.5
"""

from odefilters.algorithms import (
    EK0,
    EK1,
    IEKS,
    AbstractEK,
    DiagonalEK1,
    ExpEK,
    RosenbrockExpEK,
)
from odefilters.priors import IOUP, IWP, Matern
from odefilters.linalg import Gaussian
from odefilters.problem import ODEProblem, ode_problem, remake, rescale_time
from odefilters.solution import (
    MeanProbODESolution,
    ProbODESolution,
    evaluate,
    smooth_solution,
)
from odefilters.solve import solve
from odefilters.fixedgrid import solve_fixed
from odefilters.kronsolve import (
    KronProbODESolution,
    solve_adaptive_kron,
    solve_fixed_kron,
)
from odefilters.datalik import data_loglik, filter_with_data
from odefilters.ieks import solve_ieks, solve_ieks_fixed
from odefilters.integrator import Integrator, init
from odefilters.sampling import (
    dense_sample,
    dense_sample_states,
    sample,
    sample_states,
)
from odefilters import models
from odefilters import priors
from odefilters import taylor
from odefilters import sampling
from odefilters import solution
from odefilters import plotting
from odefilters import callbacks
from odefilters import jacobians
from odefilters import workprecision
from odefilters import ensemble
from odefilters.callbacks import (
    ContinuousCallback,
    DiscreteCallback,
    ManifoldUpdate,
)
from odefilters.ensemble import (
    EnsembleKernelSolution,
    ieks_ensemble_pallas,
    sample_ensemble_pallas,
    solve_ensemble_pallas,
)

__version__ = "0.1.0"

__all__ = [
    "EK0",
    "EK1",
    "DiagonalEK1",
    "ExpEK",
    "RosenbrockExpEK",
    "IEKS",
    "AbstractEK",
    "Gaussian",
    "ODEProblem",
    "ode_problem",
    "remake",
    "rescale_time",
    "smooth_solution",
    "ProbODESolution",
    "MeanProbODESolution",
    "evaluate",
    "solve",
    "solve_fixed",
    "solve_fixed_kron",
    "solve_adaptive_kron",
    "KronProbODESolution",
    "solve_ieks",
    "solve_ieks_fixed",
    "init",
    "Integrator",
    "sampling",
    "sample",
    "sample_states",
    "dense_sample",
    "dense_sample_states",
    "plotting",
    "callbacks",
    "jacobians",
    "workprecision",
    "ensemble",
    "EnsembleKernelSolution",
    "solve_ensemble_pallas",
    "sample_ensemble_pallas",
    "ieks_ensemble_pallas",
    "DiscreteCallback",
    "ManifoldUpdate",
    "ContinuousCallback",
    "models",
    "priors",
    "taylor",
    "data_loglik",
    "filter_with_data",
    "IWP",
    "IOUP",
    "Matern",
]
