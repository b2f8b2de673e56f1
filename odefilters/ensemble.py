"""One front door for the fused Pallas ensemble kernels.

The reference solves one IVP at a time (`/root/reference/src/ProbNumDiffEq.jl`
— single-process, single-thread); this framework's flagship workload is
thousands of independent ``(u0, p)`` candidates per chip. The individual
kernels live in :mod:`odefilters.ops.pallas_kernels` with per-kernel
signatures (vector field + Jacobian callables, explicit ``second_order``
flags); this module maps the user-facing problem/algorithm vocabulary of
:func:`odefilters.solve` — an :class:`~odefilters.problem.ODEProblem`
(first- or second-order, with optional ``jac``/``jac_diag``) and an
:class:`~odefilters.algorithms.AbstractEK` (EK0 / EK1 / DiagonalEK1,
``smooth``, ``prior``) — onto the right fused kernel:

===========  ==========================  =========================================
algorithm    adaptive=True               adaptive=False (fixed grid)
===========  ==========================  =========================================
EK0          per-lane-dt adaptive        fused filter; + fused RTS smoother kernel
             kernel; + attempt-stream    when ``alg.smooth``
             RTS smoother kernel when
             ``alg.smooth``
DiagonalEK1  per-dim adaptive kernel;    (no fixed-grid ensemble kernel — use
             + attempt-stream RTS        ``adaptive=True`` or the Kron path)
             smoother when ``alg.smooth``
EK1          full D x D adaptive         full D x D filter (+ smoother kernel)
             kernel; + attempt-stream
             RTS smoother kernel when
             ``alg.smooth``
===========  ==========================  =========================================

All paths accept ``mesh=`` (1-D device mesh; the ensemble axis shards via
``shard_map``, zero hot-loop collectives) and ``prior=`` via the algorithm.
The kernels implement the *dynamic* diffusion model only — the per-step
MLE calibration every fused filter bakes in (`diffusions.jl:72-80`
semantics); other diffusion models raise with guidance to the XLA paths.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax

from odefilters.algorithms import AbstractEK
from odefilters.priors import IWP, normalize_prior
from odefilters.problem import ODEProblem


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnsembleKernelSolution:
    """Batched output of a fused ensemble kernel.

    ``us``: (S+1, d, B) posterior means on the save grid (positions only
    for second-order problems). ``stds``: per-dim marginal stds —
    (S+1, d, B), or (S+1, B) for the EK0 paths whose covariance is
    isotropic across dims. ``lls``: (B,) ODE-residual log-likelihoods
    (fixed-grid filter paths and adaptive paths; None from the fused
    smoother pair, which streams states instead). Adaptive paths also
    fill ``nacc``/``nrej``/``failed`` (per-member accepted/rejected step
    counts and failure flags); fixed-grid paths leave them None.
    """

    us: jax.Array
    stds: jax.Array
    lls: Optional[jax.Array] = None
    nacc: Optional[jax.Array] = None
    nrej: Optional[jax.Array] = None
    failed: Optional[jax.Array] = None
    # Static diffusion models (fixed / fixedMAP / fixedMV on the
    # fixed-grid kernels): the calibrated per-member global sigma^2 —
    # (B,), or (d, B) for fixedMV. None on the dynamic paths.
    diffusions: Optional[jax.Array] = None


def _pair_jac(jac):
    """Normalize a 2nd-order problem's ``(jac_u, jac_du)`` tuple (as stored
    by :func:`odefilters.problem.ode_problem_2nd`) into the pair-returning
    callable the kernels expect; None entries disable the exact path."""
    if jac is None:
        return None
    if isinstance(jac, tuple):
        jac_u, jac_du = jac
        if jac_u is None or jac_du is None:
            return None
        return lambda du, u, p, t: (jac_u(du, u, p, t), jac_du(du, u, p, t))
    return jac


def _diag_from_full(jac, d):
    """Lane-safe Jacobian diagonal from a full ``jac`` callable: explicit
    ``[a, a]`` indexing (a (d, d, sub, lane) array's jnp.diagonal would
    contract the wrong axes inside a kernel)."""
    import jax.numpy as jnp

    def jd(u, p, t):
        J = jac(u, p, t)
        return jnp.stack([J[a, a] for a in range(d)])

    return jd


def solve_ensemble_pallas(
    prob: ODEProblem,
    alg: AbstractEK,
    u0s: jax.Array,
    ps: jax.Array,
    *,
    n_save: int = 20,
    adaptive: bool = True,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: Optional[int] = None,
    mesh=None,
) -> EnsembleKernelSolution:
    """Solve ``B`` independent IVPs ``(u0s[i], ps[i])`` on fused kernels.

    The ensemble analogue of ``solve(prob, alg)`` at fused-kernel
    throughput (~1M adaptive solves/s @ 8192 members on one chip,
    `benchmarks/results.json`). ``u0s``: (B, d) — or (B, 2d) = [u0 | du0]
    when ``prob.second_order``; ``ps``: (B, n_params); B a multiple of
    ``ops.pallas_kernels.BLOCK`` (1024). ``n_save``: number of uniform
    save intervals over ``prob.tspan`` (adaptive lanes land on the save
    grid exactly — tstops semantics); on fixed grids it is the step count.

    Adaptive output statistics mirror the driver's per-member values:
    identical accepted-step sequences for EK0/DiagonalEK1, a few-percent
    sequence divergence for EK1 (MGS vs the driver's QR — documented in
    docs/kernels.md).
    """
    mass_diag = None
    if getattr(prob, "mass_matrix", None) is not None:
        M = prob.mass_matrix
        ok = (
            getattr(M, "ndim", 2) == 1
            and getattr(alg, "is_diagonal_ek1", False)
            and adaptive and not alg.smooth and not prob.second_order
        )
        if not ok:
            raise NotImplementedError(
                "mass-matrix problems on the fused kernels require a "
                "DIAGONAL mass, DiagonalEK1, adaptive=True and "
                "smooth=False (per-dim structure); use the dense solver "
                "paths (odefilters.solve / solve_fixed) otherwise"
            )
        mass_diag = M
    from odefilters.ops import pallas_kernels as pk

    if adaptive and alg.diffusionmodel != "dynamic":
        raise NotImplementedError(
            f"the fused ADAPTIVE kernels implement the dynamic diffusion "
            f"model; got {alg.diffusionmodel!r} — static models are "
            f"per-lane ill-posed under per-lane step control; use "
            f"adaptive=False (fixed-grid kernels support "
            f"fixed/fixedMAP/fixedMV) or the XLA driver"
        )
    prior = None if isinstance(normalize_prior(alg.prior), IWP) else alg.prior
    q = alg.order
    so = bool(prob.second_order)
    d = prob.d
    kw: dict[str, Any] = dict(abstol=abstol, reltol=reltol, mesh=mesh)

    if adaptive:
        if alg.smooth:
            # the smoother pairs' HBM attempt stream is max_iters-sized
            # (~(q+2) x row-width x 4 KiB per attempt per 1024-member
            # block; (D+1) x (D+1) rows for dense EK1), hence the much
            # smaller defaults than the filter path
            mi = 1024 if max_iters is None else max_iters
            if alg.is_ek1 and not getattr(alg, "is_diagonal_ek1", False):
                out = pk.solve_ensemble_ek1_adaptive_smooth_pallas(
                    prob.f, _pair_jac(prob.jac) if so else prob.jac,
                    u0s, ps, prob.tspan, n_save, q=q,
                    max_iters=512 if max_iters is None else max_iters,
                    prior=prior, second_order=so, **kw,
                )
                return EnsembleKernelSolution(*out)
            if getattr(alg, "is_diagonal_ek1", False):
                jd = None
                if not so:
                    jd = prob.jac_diag
                    if jd is None and prob.jac is not None:
                        jd = _diag_from_full(prob.jac, d)
                out = pk.solve_ensemble_ek1d_adaptive_smooth_pallas(
                    prob.f, jd, u0s, ps, prob.tspan, n_save, q=q,
                    max_iters=mi, prior=prior, second_order=so, **kw,
                )
            else:
                out = pk.solve_ensemble_ek0_adaptive_smooth_pallas(
                    prob.f, u0s, ps, prob.tspan, n_save, q=q,
                    max_iters=mi, prior=prior, second_order=so, **kw,
                )
            return EnsembleKernelSolution(*out)
        kw.update(
            max_iters=100_000 if max_iters is None else max_iters,
            prior=prior, second_order=so,
        )
        if getattr(alg, "is_diagonal_ek1", False):
            # prob.jac_diag follows the first-order (u, p, t) signature;
            # second-order needs the pair-returning form — auto-JVP there
            jd = None
            if not so:
                jd = prob.jac_diag
                if jd is None and prob.jac is not None:
                    jd = _diag_from_full(prob.jac, d)
            out = pk.solve_ensemble_ek1d_adaptive_pallas(
                prob.f, jd, u0s, ps, prob.tspan, n_save, q=q,
                mass_diag=mass_diag, **kw
            )
        elif alg.is_ek1:
            out = pk.solve_ensemble_ek1_adaptive_pallas(
                prob.f, _pair_jac(prob.jac) if so else prob.jac,
                u0s, ps, prob.tspan, n_save, q=q, **kw
            )
        else:
            out = pk.solve_ensemble_ek0_adaptive_pallas(
                prob.f, u0s, ps, prob.tspan, n_save, q=q, **kw
            )
        return EnsembleKernelSolution(*out)

    # ---- fixed grid ----
    del kw  # fixed-grid kernels take no tolerances (no controller)
    dm = alg.diffusionmodel
    static = dm in ("fixed", "fixedMAP", "fixedMV")
    if dm in ("dynamicMV",):
        raise NotImplementedError(
            "dynamicMV is not on the fused kernels; use the Kronecker "
            "path (kronsolve.solve_fixed_kron) or the XLA driver"
        )
    if getattr(alg, "is_diagonal_ek1", False):
        if alg.smooth or so:
            raise NotImplementedError(
                "the fixed-grid DiagonalEK1 ensemble kernel is a "
                "first-order filter; use adaptive=True (which covers "
                "second-order) or the Kronecker path "
                "(kronsolve.solve_fixed_kron) for smoothing"
            )
        jd = prob.jac_diag
        if jd is None and prob.jac is not None:
            jd = _diag_from_full(prob.jac, d)
        out = pk.solve_ensemble_ek1d_pallas(
            prob.f, jd, u0s, ps, prob.tspan, n_save, q=q, prior=prior,
            mesh=mesh, diffusion=dm,
        )
        if static:
            us, stds, lls, sig = out
            return EnsembleKernelSolution(us, stds, lls, diffusions=sig)
        return EnsembleKernelSolution(*out)
    if alg.is_ek1:
        if so:
            raise NotImplementedError(
                "second-order fixed-grid ensembles run on the EK0 kernel "
                "or the adaptive EK1 kernel"
            )
        out = pk.solve_ensemble_ek1_pallas(
            prob.f, prob.jac, u0s, ps, prob.tspan, n_save, q=q,
            smooth=alg.smooth, prior=prior, mesh=mesh, diffusion=dm,
        )
        if static:
            us, stds, sig = out
            return EnsembleKernelSolution(us, stds, diffusions=sig)
        return EnsembleKernelSolution(*out)
    if alg.smooth:
        out = pk.solve_ensemble_ek0_pallas_smooth(
            prob.f, u0s, ps, prob.tspan, n_save, q=q, prior=prior,
            mesh=mesh, second_order=so, diffusion=dm,
        )
        if static:
            us, stds, sig = out
            return EnsembleKernelSolution(us, stds, diffusions=sig)
        return EnsembleKernelSolution(*out)
    out = pk.solve_ensemble_ek0_pallas(
        prob.f, u0s, ps, prob.tspan, n_save, q=q, prior=prior, mesh=mesh,
        second_order=so, diffusion=dm,
    )
    if static:
        us, stds, lls, sig = out
        return EnsembleKernelSolution(us, stds, lls, diffusions=sig)
    return EnsembleKernelSolution(*out)


def sample_ensemble_pallas(
    prob: ODEProblem,
    alg: AbstractEK,
    u0s: jax.Array,
    ps: jax.Array,
    key,
    *,
    n_steps: int = 100,
    n_samples: int = 1,
    adaptive: bool = False,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    mesh=None,
) -> jax.Array:
    """Joint smoothing-posterior sample paths per ensemble member.

    The fused-kernel analogue of :func:`odefilters.sample` (reference:
    `/root/reference/src/solution_sampling.jl:15-23`): a fixed-grid forward
    filter kernel + a backward conditioning sampler kernel, returning
    ``(n_steps+1, d, B)`` solution-block samples — or
    ``(n_steps+1, n_samples, d, B)`` for ``n_samples > 1``; all samples of
    a member share one backward pass (the gain/factor work is
    sample-independent), so extra samples amortize — measured 8 samples at
    2.1x the one-sample cost on chip. EK0 + dynamic
    diffusion only (the sampler consumes the EK0 packed state stream);
    like :func:`odefilters.sample`, requires ``alg.smooth`` (a joint
    backward draw IS a smoothing pass).
    """
    from odefilters.ops import pallas_kernels as pk

    if getattr(prob, "mass_matrix", None) is not None:
        raise NotImplementedError(
            "mass-matrix problems are supported on the dense solver paths "
            "(odefilters.solve / solve_fixed + odefilters.sample) only"
        )
    if alg.diffusionmodel != "dynamic":
        raise NotImplementedError(
            "the fused sampler implements the dynamic diffusion model; use "
            "odefilters.sample on an XLA solution for other models"
        )
    if getattr(alg, "is_diagonal_ek1", False):
        raise NotImplementedError(
            "the fused sampler runs on the EK0 or EK1 kernel pairs; use "
            "odefilters.sample on an XLA solution for DiagonalEK1"
        )
    if not alg.smooth:
        raise ValueError("sampling not implemented for non-smoothed posteriors")
    prior = None if isinstance(normalize_prior(alg.prior), IWP) else alg.prior
    if adaptive:
        # ADAPTIVE-solution sampling (round 4): the attempt-stream
        # forward + a backward conditioning sampler over each lane's
        # ragged accepted-step chain — the fused analogue of
        # `odefilters.sample` on an adaptive solve
        # (`solution_sampling.jl:24-62`). EK0 only; ``n_steps`` is the
        # save-grid interval count here.
        if alg.is_ek1:
            raise NotImplementedError(
                "adaptive-solution sampling runs on the EK0 attempt-"
                "stream pair; use adaptive=False for EK1, or "
                "odefilters.sample on an XLA solution"
            )
        us, *_ = pk.sample_ensemble_adaptive_pallas(
            prob.f, u0s, ps, prob.tspan, n_steps, key, q=alg.order,
            n_samples=n_samples, abstol=abstol, reltol=reltol,
            max_iters=max_iters, prior=prior, mesh=mesh,
            second_order=bool(prob.second_order),
        )
        return us
    if alg.is_ek1:
        if prob.second_order:
            raise NotImplementedError(
                "second-order sampling runs on the EK0 kernel pair"
            )
        return pk.sample_ensemble_ek1_pallas(
            prob.f, prob.jac, u0s, ps, prob.tspan, n_steps, key,
            q=alg.order, n_samples=n_samples, prior=prior, mesh=mesh,
        )
    return pk.sample_ensemble_ek0_pallas(
        prob.f, u0s, ps, prob.tspan, n_steps, key, q=alg.order,
        n_samples=n_samples, prior=prior, mesh=mesh,
        second_order=bool(prob.second_order),
    )


def ieks_ensemble_pallas(
    prob: ODEProblem,
    alg: AbstractEK,
    u0s: jax.Array,
    ps: jax.Array,
    *,
    n_steps: int = 100,
    iterations: int = 10,
    mesh=None,
) -> EnsembleKernelSolution:
    """Ensemble IEKS (MAP estimation) on the fused EK1 kernel pair.

    The fused-kernel analogue of :func:`odefilters.ieks.solve_ieks_fixed`
    (`/root/reference/src/ieks.jl:53-61` semantics on a shared fixed grid):
    iterate the fused EK1 filter+smoother, streaming the previous
    iteration's smoothed means into the filter kernel as per-member
    Jacobian linearization points. The first sweep linearizes at the
    predicted mean (a plain EK1 solve); every later sweep re-linearizes
    the WHOLE trajectory at once. B independent MAP problems per call.
    First-order problems, EK1, dynamic diffusion only.
    """
    from odefilters.ops import pallas_kernels as pk

    if getattr(prob, "mass_matrix", None) is not None:
        raise NotImplementedError(
            "mass-matrix problems are supported on the dense solver paths "
            "(odefilters.solve / ieks.solve_ieks_fixed) only"
        )
    if alg.diffusionmodel != "dynamic":
        raise NotImplementedError(
            "the fused kernels implement the dynamic diffusion model"
        )
    if getattr(alg, "is_diagonal_ek1", False) or not alg.is_ek1:
        raise NotImplementedError("ensemble IEKS linearizes on the EK1 kernel")
    if prob.second_order:
        raise NotImplementedError("ensemble IEKS is first-order only")
    if not alg.smooth:
        raise ValueError(
            "IEKS requires smooth=True (it linearizes at smoothed means)"
        )
    prior = None if isinstance(normalize_prior(alg.prior), IWP) else alg.prior
    us = None
    stds = None
    for _ in range(max(int(iterations), 1)):
        us, stds = pk.solve_ensemble_ek1_pallas(
            prob.f, prob.jac, u0s, ps, prob.tspan, n_steps, q=alg.order,
            smooth=True, prior=prior, mesh=mesh, linearize_traj=us,
        )
    return EnsembleKernelSolution(us, stds)
