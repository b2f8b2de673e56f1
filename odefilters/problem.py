"""Problem types: the host-framework surface the reference inherits.

The reference gets ``ODEProblem`` / ``ODEFunction`` from SciML's DiffEqBase
(see SURVEY.md "Host framework"); here they are first-class. The vector
field uses the reference's calling convention ``f(u, p, t)``
(`/root/reference/src/perform_step.jl:106,135-138` — OOP form), so a user
switching over keeps their signature.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ODEProblem:
    """An initial value problem ``u' = f(u, p, t), u(t0) = u0``.

    Equivalent of ``DiffEqBase.ODEProblem`` as used throughout the
    reference's tests (e.g. `/root/reference/test/correctness.jl:33-34`).

    Attributes:
        f: vector field ``f(u, p, t) -> du`` (pure, JAX-traceable). Static.
        u0: initial value, shape ``(d,)``. (Scalar / matrix ``u0`` are
            rejected, mirroring `/root/reference/src/caches.jl:46-49`.)
        tspan: ``(t0, t1)``.
        p: parameters pytree passed through to ``f`` (may be None).
        jac: optional analytic Jacobian ``jac(u, p, t) -> (d, d)``; when
            absent, EK1 uses ``jax.jacfwd`` (the ForwardDiff path at
            `/root/reference/src/perform_step.jl:116-122`). Static.
        analytic: optional closed-form solution ``analytic(u0, p, t)`` for
            error analysis (DiffEqBase's ``has_analytic`` path,
            `/root/reference/src/solution.jl:67-73`). Static.
    """

    u0: jax.Array
    tspan: tuple
    p: Any = None
    f: Callable = dataclasses.field(metadata=dict(static=True), default=None)
    jac: Optional[Callable] = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    jac_diag: Optional[Callable] = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    analytic: Optional[Callable] = dataclasses.field(
        metadata=dict(static=True), default=None
    )
    second_order: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # Mass matrix M of ``M u' = f(u, p, t)`` — dense (d, d) or a (d,)
    # diagonal; None means M = I. A SINGULAR M states an index-1 DAE
    # (use EK1: the EK0 measurement covariance is singular then). The
    # later-upstream ProbNumDiffEq feature (not in v0.1.5): the filter
    # measures ``z = M E1 x - f(E0 x)`` with ``H = (M E1 - J E0) P^-1``.
    mass_matrix: Optional[jax.Array] = None
    # Concrete rank-deficiency of mass_matrix, computed once at
    # :func:`ode_problem` construction (where M is a real array) so the
    # EK0-rejects-DAEs check still fires under jit/vmap, where
    # ``mass_matrix`` itself is a Tracer. None = unknown (problem built
    # directly as a dataclass, or M handed in as a Tracer): the drivers
    # then fall back to a best-effort concrete check and otherwise solve —
    # an EK0+singular-M solve NaNs from the singular innovation covariance.
    mass_singular: Optional[bool] = dataclasses.field(
        metadata=dict(static=True), default=None
    )

    # NOTE: no validation in __post_init__ — JAX reconstructs this pytree
    # with transformed (e.g. batched) leaves during vmap/jit, where shape
    # checks must not fire. Validation lives in :func:`ode_problem`.

    @property
    def d(self) -> int:
        """Dimension of the ODE state u (for 2nd-order problems, u0 holds
        the stacked [u0; du0], so d is half its length)."""
        n = self.u0.shape[-1]
        return n // 2 if self.second_order else n

    @property
    def dtype(self):
        return self.u0.dtype


def remake(prob: ODEProblem, **changes) -> ODEProblem:
    """Functional update, like SciML's ``remake``."""
    return dataclasses.replace(prob, **changes)


def ode_problem(f, u0, tspan, p=None, jac=None, jac_diag=None,
                analytic=None, mass_matrix=None) -> ODEProblem:
    """Convenience constructor with array coercion.

    ``jac_diag(u, p, t) -> (d,)``: optional exact Jacobian *diagonal* used
    by :class:`odefilters.algorithms.DiagonalEK1` — O(d) for pointwise
    reaction terms, where materializing ``jac`` would be O(d^2).

    ``mass_matrix``: M of ``M u' = f(u, p, t)`` — dense (d, d) or a (d,)
    diagonal. A singular M defines an index-1 DAE (ROBER-style); solve it
    with :class:`~odefilters.algorithms.EK1` (EK0's measurement covariance
    ``E1 Σ E1ᵀ`` projected through a singular M is singular). Supported on
    the dense adaptive and fixed-grid paths."""
    u0 = jnp.asarray(u0)
    if u0.ndim != 1:
        raise ValueError(
            "Problems which are not vector-valued (e.g. u0 is a scalar "
            "or a matrix) are currently not supported"
        )
    mass_singular = None
    if mass_matrix is not None:
        mass_matrix = jnp.asarray(mass_matrix)
        d = u0.shape[0]
        if mass_matrix.shape not in ((d, d), (d,)):
            raise ValueError(
                f"mass_matrix must be ({d}, {d}) or a ({d},) diagonal, "
                f"got {mass_matrix.shape}"
            )
        mass_singular = mass_matrix_singular(mass_matrix)
    return ODEProblem(f=f, u0=u0, tspan=tuple(tspan), p=p, jac=jac,
                      jac_diag=jac_diag, analytic=analytic,
                      mass_matrix=mass_matrix, mass_singular=mass_singular)


def mass_matrix_singular(mass_matrix) -> Optional[bool]:
    """Concrete rank-deficiency of a mass matrix; None if unknowable.

    Evaluated eagerly (numpy) at problem-construction time so the
    EK0-rejects-singular-M check survives jit/vmap tracing of the solve.
    Returns None when ``mass_matrix`` is a Tracer (constructor itself
    called under jit with a traced M)."""
    if mass_matrix is None or isinstance(mass_matrix, jax.core.Tracer):
        return None
    import numpy as np

    Mc = np.asarray(mass_matrix)
    Md = np.diag(Mc) if Mc.ndim == 1 else Mc
    return bool(np.linalg.matrix_rank(Md) < Md.shape[0])


def require_ek1_for_singular_mass(prob: "ODEProblem", is_ek1: bool) -> None:
    """Raise if ``prob`` is an index-1 DAE (singular M) and the algorithm
    is not EK1-linearized — the EK0 measurement covariance
    ``M E1 Σ E1ᵀ Mᵀ`` is singular then and the solve NaNs immediately.

    Uses the construction-time :func:`mass_matrix_singular` verdict when
    available (works under jit); falls back to a concrete check. When M is
    a Tracer AND the problem skipped :func:`ode_problem` (so
    ``mass_singular`` is None), the check cannot run — such a solve NaNs
    silently instead of raising (documented jit caveat)."""
    if prob.mass_matrix is None or is_ek1:
        return
    singular = prob.mass_singular
    if singular is None:
        singular = mass_matrix_singular(prob.mass_matrix)
    if singular:
        raise ValueError(
            "singular mass matrices (DAEs) require EK1: the EK0 "
            "measurement covariance M E1 Σ E1ᵀ Mᵀ is singular"
        )


def mass_state_space_f(f, mass_matrix, jac=None):
    """State-space RHS ``u' = h(u, p, t)`` of the index-1 DAE
    ``M u' = f(u, p, t)``.

    On the constraint manifold the DAE's solutions satisfy the ODE
    ``(M + P_n J) u' = P_r f - P_n f_t`` where ``P_r = M M^+`` projects
    onto range(M), ``P_n = I - P_r`` (the algebraic rows ``P_n f(u) = 0``
    are differentiated once — the index-1 reduction), ``J = df/du`` and
    ``f_t = df/dt``. For nonsingular M this reduces to ``M^{-1} f``.

    Used ONLY off the hot path — Taylor-mode initialization and the
    initial-dt heuristic need a genuine ``u'`` (the filter itself measures
    the residual ``M E1 x - f`` and never inverts M). The per-evaluation
    linear solve is QR-based (no LU: unsupported in f64 on the TPU
    backend, CLAUDE.md). The range/null projectors: elementwise for a
    diagonal M (no factorization at all), one SVD (``jnp.linalg.pinv``)
    at setup for dense M — a per-problem constant, so the
    TPU-transcendental caveats apply only if this traces on chip with a
    dense singular M; diagonal-M DAEs (the common case) never touch SVD.
    Reference analogue: upstream ProbNumDiffEq's DAE initialization; the
    pinned v0.1.5 has none.
    """
    M = jnp.asarray(mass_matrix)
    if M.ndim == 1:
        # Elementwise pseudoinverse of a diagonal: exact, SVD-free.
        mpinv_diag = jnp.where(M != 0, 1.0 / jnp.where(M != 0, M, 1.0), 0.0)
        Mpinv = jnp.diag(mpinv_diag)
        M = jnp.diag(M)
    else:
        Mpinv = jnp.linalg.pinv(M)
    P_ran = M @ Mpinv
    P_null = jnp.eye(M.shape[0], dtype=M.dtype) - P_ran

    def h(u, p, t):
        fu = f(u, p, t)
        t_arr = jnp.asarray(t, dtype=u.dtype)
        f_t = jax.jvp(lambda s: f(u, p, s), (t_arr,), (jnp.ones_like(t_arr),))[1]
        J = (jac(u, p, t) if jac is not None
             else jax.jacfwd(lambda v: f(v, p, t))(u))
        S = M.astype(u.dtype) + P_null.astype(u.dtype) @ J
        b = P_ran.astype(u.dtype) @ fu - P_null.astype(u.dtype) @ f_t
        Q, R = jnp.linalg.qr(S)
        return jax.scipy.linalg.solve_triangular(R, Q.T @ b, lower=False)

    return h


def init_rhs(prob: ODEProblem):
    """The RHS to use for state initialization / dt heuristics: ``f``
    itself, or the mass-matrix state-space form when ``M != I``."""
    if prob.mass_matrix is None:
        return prob.f
    return mass_state_space_f(prob.f, prob.mass_matrix, jac=prob.jac)


def ode_problem_2nd(f, u0, du0, tspan, p=None, jac_u=None, jac_du=None) -> ODEProblem:
    """A second-order IVP ``u'' = f(du, u, p, t)``.

    The reference marks `SecondOrderODEProblem` broken
    (`/root/reference/test/specific_problems.jl:114-125`) though its
    solution projection already anticipates it (`caches.jl:66`); here it is
    fully supported. The filter measures the *second* derivative block:
    ``z = E2 x - f(E1 x, E0 x)``, EK1 linearization
    ``H = (E2 - J_du E1 - J_u E0) P^-1``. Solver order must be >= 2.

    ``f(du, u, p, t) -> (d,)`` (SciML argument convention). Solutions carry
    the stacked ``[u; du]`` like the reference's ``[Proj(0); Proj(1)]``
    projection.
    """
    u0 = jnp.asarray(u0)
    du0 = jnp.asarray(du0)
    if u0.ndim != 1 or du0.shape != u0.shape:
        raise ValueError("u0 and du0 must be equal-length vectors")
    jac = None
    if jac_u is not None or jac_du is not None:
        jac = (jac_u, jac_du)
    return ODEProblem(
        f=f, u0=jnp.concatenate([u0, du0]), tspan=tuple(tspan), p=p,
        jac=jac, second_order=True,
    )


def rescale_time(prob: ODEProblem, tau) -> ODEProblem:
    """The same IVP in time units of ``tau``: with ``t = t0 + tau s``,
    ``v(s) := u(t0 + tau s)`` solves ``v' = tau f(v, p, t0 + tau s)`` over
    ``s in [0, (t1 - t0)/tau]`` — mathematically identical trajectories,
    ``sol.ts`` mapping back as ``t0 + tau * ts``.

    Why it exists: on the TPU backend, transcendentals (pow/exp/log/sqrt,
    and hence QR/Cholesky, which use sqrt internally) are range-limited to
    f32 even under f64 — see docs/kernels.md "f64 on TPU". A stiff solve
    whose steps are tiny in absolute units (Van der Pol mu=1e5 takes
    dt ~ 5e-8) drives the preconditioner ``h**(-q-1/2)`` and the
    covariance scales beyond the f32 RANGE and the solve NaNs at the
    first step, in f64 as well as f32. Rescaling time so steps are O(1e-2)
    in solver units keeps every intermediate within range; pick
    ``tau ~ initial_dt / 1e-2`` (e.g. ``1/mu`` for Van der Pol).
    Reference analogue: none (CPU f64 has no such limit) — this is the
    TPU-native answer to `test/specific_problems.jl:44-47` on chip.
    """
    t0, t1 = prob.tspan
    tau = float(tau)
    if tau <= 0.0:
        raise ValueError("tau must be positive")
    f_orig, jac_orig, analytic_orig = prob.f, prob.jac, prob.analytic
    t0f = float(t0)

    if prob.second_order:
        # v'' = tau^2 f(v', v): with w(s) = u(t0 + tau s), w' = tau du,
        # so the [u | du] initial slot scales its derivative half by tau
        def f_s(du, u, p, s):
            return tau * tau * f_orig(du / tau, u, p, t0f + tau * s)

        d = prob.d
        u0_s = jnp.concatenate([prob.u0[:d], tau * prob.u0[d:]])
        jac_s = None
    else:
        def f_s(u, p, s):
            return tau * f_orig(u, p, t0f + tau * s)

        u0_s = prob.u0
        jac_s = (
            None if jac_orig is None
            else (lambda u, p, s: tau * jac_orig(u, p, t0f + tau * s))
        )
    analytic_s = (
        None if analytic_orig is None
        else (lambda u0, p, s: analytic_orig(u0, p, t0f + tau * s))
    )
    return dataclasses.replace(
        prob, f=f_s, jac=jac_s, analytic=analytic_s, u0=u0_s,
        tspan=(0.0, (float(t1) - t0f) / tau),
    )
