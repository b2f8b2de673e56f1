"""The per-attempt step pipeline (L3): precondition -> predict -> measure ->
calibrate -> update -> error estimate -> un-precondition.

TPU-native replacement for `/root/reference/src/perform_step.jl:27-158`.
Differences from the reference (deliberate):

- Pure function: ``attempt_step`` maps (state, t, dt, calibration carry) to
  a :class:`StepResult`; accept/reject and buffer writes live in the driver
  (`odefilters/solve.py`), so the same step serves the adaptive while-loop,
  the fixed-grid scan, and vmapped ensembles.
- The measurement operator ``H = (E1 - J E0) P^-1`` is never materialized
  (`perform_step.jl:125-127` builds the (d, D) matrix): since the
  preconditioner is constant within each derivative block, ``H @ M`` is two
  block-row slices and one (d, d) matmul — see :func:`_h_mul`.
- Branch-free: the dynamic-vs-static calibration order
  (`perform_step.jl:40-62`) is a *static* Python branch on the algorithm
  config, so each config compiles to straight-line XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from odefilters import diffusions as diff
from odefilters.algorithms import AbstractEK
from odefilters.linalg import Gaussian, gaussian_logpdf_zero, qr_stack2, tril_factor
from odefilters.priors import (
    IOUP,
    IWP,
    ibm,
    precond_small,
    transition_precond_full,
)


@dataclasses.dataclass(frozen=True)
class FilterModel:
    """Static per-solve bundle: algorithm config, dimensions, prior constants.

    Equivalent of the constant slots of ``GaussianODEFilterCache``
    (`/root/reference/src/caches.jl:5-24`): d, q, A, Q, R=0 (implicit),
    projections (implicit via slicing), preconditioner, diffusion model.
    """

    alg: AbstractEK
    d: int
    q: int
    f: Callable
    jac: Optional[Callable]
    A: jax.Array       # (D, D) preconditioned IBM transition
    QL: jax.Array      # (D, D) preconditioned process-noise factor
    dtype: Any
    second_order: bool = False
    # (u, p, t) -> (d,) exact Jacobian diagonal (DiagonalEK1 only); when
    # None the diagonal is taken from ``jac`` / the jacfwd Jacobian
    jac_diag: Optional[Callable] = None
    # mass matrix of ``M u' = f`` — (d, d) dense or (d,) diagonal; None = I.
    # Enters the measurement only: z = M E1 x - f, H = (M E1 - J E0) P^-1.
    mass: Optional[jax.Array] = None

    @property
    def D(self) -> int:
        return self.d * (self.q + 1)

    @property
    def sol_d(self) -> int:
        """Dimension of the projected solution: [u] or [u; du]
        (the reference's SolProj 2nd-order branch, `caches.jl:66`)."""
        return 2 * self.d if self.second_order else self.d

    @property
    def is_iwp(self) -> bool:
        return isinstance(self.alg.prior, IWP)

    @property
    def prior_needs_jacobian(self) -> bool:
        """True for ``IOUP(rate='jacobian')`` (RosenbrockExpEK): the prior
        transition is re-linearized at every step."""
        prior = self.alg.prior
        return isinstance(prior, IOUP) and prior.rate_is_jacobian

    def prior_rate(self, u, p_params, t):
        """Per-step prior linearization ``J_f(u)`` for the jacobian-rate
        IOUP; ``None`` for every other prior."""
        if not self.prior_needs_jacobian:
            return None
        if self.jac is not None:
            return self.jac(u, p_params, t)
        return jax.jacfwd(lambda v: self.f(v, p_params, t))(u)

    def transition(self, dt, rate_matrix=None):
        """Preconditioned transition pair ``(A_p, QL_p)`` for a step ``dt``.

        IWP: the stored h-independent constants (the classic preconditioned
        IBM trick, `priors.jl:7-59`). Other priors: computed per step in
        preconditioned coordinates (h-power-overflow-free; see
        ``odefilters/priors.py``). ``rate_matrix`` feeds the jacobian-rate
        IOUP's per-step linearization (:meth:`prior_rate`).
        """
        if self.is_iwp:
            return self.A, self.QL
        return transition_precond_full(
            self.alg.prior, self.d, self.q, dt, self.dtype,
            rate_matrix=rate_matrix,
        )


def make_model(alg: AbstractEK, f, jac, d: int, dtype,
               second_order: bool = False, jac_diag=None,
               mass=None) -> FilterModel:
    if second_order and alg.order < 2:
        raise ValueError("second-order problems need solver order >= 2")
    if second_order and mass is not None:
        raise NotImplementedError(
            "mass matrices are supported for first-order problems only"
        )
    prior = alg.prior
    if second_order and isinstance(prior, IOUP) and prior.rate_is_jacobian:
        raise NotImplementedError(
            "IOUP(rate='jacobian') (RosenbrockExpEK) supports first-order "
            "problems only; rewrite the second-order problem as a "
            "first-order companion system"
        )
    A, QL = ibm(d, alg.order, dtype=dtype)
    return FilterModel(alg=alg, d=d, q=alg.order, f=f, jac=jac, A=A, QL=QL,
                       dtype=dtype, second_order=second_order,
                       jac_diag=jac_diag, mass=mass)


def prior_rate_fn(model: FilterModel, p_params):
    """``(u_left, t_left) -> (d, d)`` per-interval prior linearization for
    the jacobian-rate IOUP, or ``None`` for every other prior. Shared by
    the smoothing / sampling / dense-output consumers so they re-linearize
    intervals exactly like the forward pass."""
    if not model.prior_needs_jacobian:
        return None
    return lambda u, t: model.prior_rate(u, p_params, t)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepResult:
    """Everything the driver needs from one step attempt."""

    x_filt: Gaussian          # un-preconditioned filtered state
    u_filt: jax.Array         # projected solution value E0 x_filt
    err_est: jax.Array        # scalar EEst (already abstol/reltol scaled)
    sigma2_local: jax.Array   # local diffusion (error estimate scale)
    sigma2_global: jax.Array  # global-diffusion candidate (commit on accept)
    log_likelihood: jax.Array # log N(z; 0, S) of this attempt
    z: jax.Array              # innovation (d,)
    S_chol: jax.Array         # (d, d) innovation factor


def _jmul(J, X):
    """``J @ X`` where J is a dense (d, d) Jacobian or a (d,) diagonal
    (the DiagonalEK1 linearization — a row scaling, no matmul)."""
    if J.ndim == 1:
        return J[:, None] * X
    return J @ X


def _mmul(mass, X):
    """``M @ X`` for the mass matrix: None = identity, (d,) = diagonal
    row scaling, (d, d) = dense."""
    if mass is None:
        return X
    if mass.ndim == 1:
        return mass * X if X.ndim == 1 else mass[:, None] * X
    return mass @ X


def _h_mul(M, J, pinv0, pinv1, d: int, is_ek1: bool):
    """``H @ M`` for ``H = (E1 - J E0) P^-1`` without forming H.

    ``M`` is (D, K); the preconditioner is block-constant so ``P^-1 M``
    restricted to blocks 0/1 is a scalar row scaling. EK0 drops the
    Jacobian term (`perform_step.jl:125-127`); DiagonalEK1 passes J as a
    (d,) diagonal.
    """
    out = pinv1 * M[..., d : 2 * d, :]
    if is_ek1:
        out = out - _jmul(J, pinv0 * M[..., :d, :])
    return out


def attempt_step(
    model: FilterModel,
    x: Gaussian,
    u_prev: jax.Array,
    t,
    dt,
    sigma2_prev: jax.Array,
    success_count: jax.Array,
    abstol: float,
    reltol: float,
    p_params,
    linearize_u: Optional[Callable] = None,
    stop_calib_grad: bool = False,
) -> StepResult:
    """One (not necessarily successful) filter step, `perform_step.jl:27-93`.

    Args:
        x: current un-preconditioned state.
        u_prev: last accepted solution value (for the error residual mix,
            `perform_step.jl:80-82`).
        sigma2_prev / success_count: running-calibration carry for the
            static diffusion models.
        linearize_u: optional ``t -> u`` giving the EK1 linearization point
            (the IEKS hook, `perform_step.jl:111-113`); defaults to the
            predicted mean.
    """
    alg, d, q = model.alg, model.d, model.q
    # Jacobian-rate (Rosenbrock) prior: re-linearize at the step's LEFT
    # state (the last accepted mean) — reconstructible from the saved
    # trajectory, so smoothing/dense output/sampling recompute the exact
    # same per-interval transitions
    rate_m = model.prior_rate(x.mean[:d], p_params, t)
    A, QL = model.transition(dt, rate_matrix=rate_m)
    t_new = t + dt

    # -- precondition (perform_step.jl:36-38) --
    p_s, pinv_s = precond_small(dt, q)                 # (q+1,) block scalars
    p_full = jnp.repeat(p_s, d)
    pinv_full = jnp.repeat(pinv_s, d)
    m_p = p_full * x.mean
    L_p = p_full[:, None] * x.chol

    # -- predict mean (filtering.jl:22-25) --
    m_pred = A @ m_p
    u_pred = pinv_s[0] * m_pred[:d]

    # -- measure (perform_step.jl:95-132) --
    if model.second_order:
        # z = E2 x - f(E1 x, E0 x); the reference's broken
        # SecondOrderODEProblem path, implemented (specific_problems.jl:114).
        du_pred = pinv_s[1] * m_pred[d : 2 * d]
        ddu = model.f(du_pred, u_pred, p_params, t_new)
        z = pinv_s[2] * m_pred[2 * d : 3 * d] - ddu
        J_u = J_du = None
        if alg.is_ek1:
            jac_u = jac_du = None
            if isinstance(model.jac, tuple):
                jac_u, jac_du = model.jac
            J_u = (
                jac_u(du_pred, u_pred, p_params, t_new)
                if jac_u is not None
                else jax.jacfwd(
                    lambda uv: model.f(du_pred, uv, p_params, t_new)
                )(u_pred)
            )
            J_du = (
                jac_du(du_pred, u_pred, p_params, t_new)
                if jac_du is not None
                else jax.jacfwd(
                    lambda dv: model.f(dv, u_pred, p_params, t_new)
                )(du_pred)
            )
            if alg.is_diagonal_ek1:
                # diagonal linearization of BOTH partial Jacobians
                if J_u.ndim == 2:
                    J_u = jnp.diagonal(J_u)
                if J_du.ndim == 2:
                    J_du = jnp.diagonal(J_du)

        def Hmul(M):
            out = pinv_s[2] * M[..., 2 * d : 3 * d, :]
            if alg.is_ek1:
                out = out - _jmul(J_du, pinv_s[1] * M[..., d : 2 * d, :])
                out = out - _jmul(J_u, pinv_s[0] * M[..., :d, :])
            return out

    else:
        du = model.f(u_pred, p_params, t_new)
        # z = M E1 x - f (M = I without a mass matrix; a singular M states
        # an index-1 DAE whose algebraic rows are enforced by the update)
        z = _mmul(model.mass, pinv_s[1] * m_pred[d : 2 * d]) - du

        J = None
        if alg.is_ek1:
            u_lin = u_pred if linearize_u is None else linearize_u(t_new)
            if alg.is_diagonal_ek1 and model.jac_diag is not None:
                J = model.jac_diag(u_lin, p_params, t_new)  # (d,)
            elif model.jac is not None:
                J = model.jac(u_lin, p_params, t_new)
            else:
                J = jax.jacfwd(lambda u: model.f(u, p_params, t_new))(u_lin)
            if alg.is_diagonal_ek1 and J.ndim == 2:
                J = jnp.diagonal(J)  # J -> diag(J), the ICML-2022 trick

        if model.mass is None:

            def Hmul(M):
                return _h_mul(M, J, pinv_s[0], pinv_s[1], d, alg.is_ek1)

        else:

            def Hmul(M):
                # H = (mass E1 - J E0) P^-1
                out = _mmul(model.mass, pinv_s[1] * M[..., d : 2 * d, :])
                if alg.is_ek1:
                    out = out - _jmul(J, pinv_s[0] * M[..., :d, :])
                return out

    HQL = Hmul(QL)  # (d, D): factor of H Q H^T (used by calibration + errors)

    # -- calibrate + predict covariance --
    if alg.is_dynamic_diffusion:
        # Calibrate-then-predict order (perform_step.jl:40-55).
        #
        # Range-factored form: HQL entries scale like pinv ~ dt^-(q+1/2)
        # and the dynamic sigma^2 like (|z|/|HQL|)^2 — on TPU, where f64
        # is emulated at f32 DYNAMIC RANGE (two-float format; measured:
        # 1e21^2 -> nan, 1e-21^2 -> 0, docs/kernels.md "f64 on TPU"),
        # both leave the representable range at large dt even though
        # every product the solver actually needs (sigma*|HQL|, the
        # error estimate) is O(1). Measured failure: stiff VdP at
        # dt~8e2 computes sigma2 ~ 4e-44 -> flushes to 0 -> EEst = 0 ->
        # the controller accepts 1e3x-too-large steps (true EEst 1.7).
        # Normalizing HQL by c = max|HQL| makes every intermediate
        # O(|z|); c cancels exactly in the error estimate, and the
        # diffusion enters the prediction as the STD sigma = sigma_n/c
        # (representable), never the variance.
        c_hql = jnp.max(jnp.abs(HQL))
        c_hql = jnp.where(c_hql > 0, c_hql, 1.0)
        HQLn = HQL / c_hql
        if alg.diffusionmodel == "dynamicMV":
            sigma2_n = diff.estimate_dynamic_mv(z, HQLn)  # = sigma2 c^2
        else:
            sigma2_n = diff.estimate_dynamic(z, HQLn)
        if stop_calib_grad:
            # adjoint treats the per-step calibration as part of the
            # (frozen) model: z sits at the solver-accuracy floor, and
            # reverse-mode tangents through 1/sigma2 amplify f32 forward
            # noise without bound in the horizon (the same estimator
            # choice as the static/Fenrir sigma^2 and the step-size
            # controller; benchmarks/grad_horizon_experiment.py)
            sigma2_n = jax.lax.stop_gradient(sigma2_n)
        sigma_std_n = jnp.sqrt(sigma2_n)
        sigma_std = sigma_std_n / c_hql
        if alg.diffusionmodel == "dynamicMV":
            # estimate_dynamic_mv floors sigma^2 at eps in ABSOLUTE
            # units; replicate that floor in std units (c_hql >= 1 in
            # every practical regime, so this matches the un-factored
            # guard exactly)
            sigma_std = jnp.maximum(
                sigma_std, jnp.sqrt(jnp.finfo(z.dtype).eps)
            )
            sigma_std_n = sigma_std * c_hql
        sigma2 = sigma_std * sigma_std
        QL_h = diff.apply_diffusion_chol_std(QL, sigma_std, q)
        L_pred = qr_stack2(A @ L_p, QL_h)
        Z = Hmul(L_pred)
        S_chol = tril_factor(jnp.swapaxes(Z, -1, -2))
        sigma2_local = sigma2
        sigma2_global = sigma2
        # error-estimate inputs: the c's cancel (sigma_n * HQLn = sigma * HQL)
        err_scale_loc = sigma_std_n
        err_HQ = HQLn
    else:
        # Vanilla order: predict, measure, calibrate (perform_step.jl:57-62)
        L_pred = qr_stack2(A @ L_p, QL)
        Z = Hmul(L_pred)
        S_chol = tril_factor(jnp.swapaxes(Z, -1, -2))
        if alg.diffusionmodel == "fixedMV":
            sigma2_local = diff.estimate_fixed_mv_local(z, S_chol)
        else:  # fixed, fixedMAP share the z^T S^-1 z / d statistic
            sigma2_local = diff.estimate_fixed_local(z, S_chol)
        sigma2_global = diff.running_update(
            alg.diffusionmodel, sigma2_prev, sigma2_local, success_count, d
        )
        # static models: sigma^2 is a RATIO (z vs S), O(1)-scaled
        err_scale_loc = jnp.sqrt(sigma2_local)
        err_HQ = HQL

    # -- likelihood (perform_step.jl:66) --
    ll = gaussian_logpdf_zero(z, S_chol)

    # -- update, Joseph square-root form (filtering.jl:79-91) --
    # two triangular solves: batched-safe, unlike jax.scipy cho_solve
    # (CLAUDE.md rule; matches ops/filtering.update)
    LZt = L_pred @ jnp.swapaxes(Z, -1, -2)            # (D, d)
    W = solve_triangular(S_chol, jnp.swapaxes(LZt, -1, -2), lower=True)
    K = jnp.swapaxes(
        solve_triangular(jnp.swapaxes(S_chol, -1, -2), W, lower=False), -1, -2
    )
    m_filt = m_pred - jnp.einsum("...ij,...j->...i", K, z)
    L_filt = L_pred - K @ Z

    # -- un-precondition (perform_step.jl:72-75) --
    x_filt = Gaussian(pinv_full * m_filt, pinv_full[:, None] * L_filt)
    u_filt = x_filt.mean[: model.sol_d]

    # -- error estimate (perform_step.jl:78-84, 148-158) --
    # HQ_loc is a cheap scaling of the already-computed HQL: scalar
    # diffusion commutes with H; the MV models are EK0-only (no Jacobian
    # term in H), so the per-dimension scale factors out row-wise.
    # (err_scale_loc, err_HQ) are the range-factored pair set by the
    # calibration branch: their product equals sqrt(sigma2_local) * HQL
    # with no out-of-range intermediate.
    if err_scale_loc.ndim == 0:
        HQ_loc = err_scale_loc * err_HQ
    else:
        HQ_loc = err_scale_loc[:, None] * err_HQ
    err_unscaled = jnp.sqrt(jnp.sum(HQ_loc * HQ_loc, axis=-1))  # sqrt diag
    scale = abstol + reltol * jnp.maximum(
        jnp.abs(u_prev[:d]), jnp.abs(u_filt[:d])
    )
    err = dt * err_unscaled / scale
    EEst = jnp.sqrt(jnp.mean(err * err))  # Hairer norm

    return StepResult(
        x_filt=x_filt,
        u_filt=u_filt,
        err_est=EEst,
        sigma2_local=sigma2_local,
        sigma2_global=sigma2_global,
        log_likelihood=ll,
        z=z,
        S_chol=S_chol,
    )
