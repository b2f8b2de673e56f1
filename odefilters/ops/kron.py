"""EK0 Kronecker fast path: covariance as a (q+1)x(q+1) factor.

With the EK0 measurement ``H = E1 P^-1`` (no Jacobian) and an isotropic
diffusion, every covariance in the solve stays exactly Kronecker,
``Sigma = (Lt Lt^T) ⊗ I_d`` — the reference hints at this structure (its
priors are built as ``kron`` products, `/root/reference/src/priors.jl:8-10`)
but always carries dense D x D matrices. Carrying only the small factor
makes the per-step covariance cost O(q^3), *independent of the ODE
dimension d*, which is what unlocks the ~1e4-state Brusselator config
(BASELINE.md #4) and makes the ensemble hot loop almost entirely
element-wise (VPU) work.

State layout: ``mean`` is (q+1, d) (derivative-major, matching the dense
path's flat D = d(q+1) vector), ``cov_chol`` is (q+1, q+1).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from odefilters.algorithms import AbstractEK
from odefilters.linalg import tril_factor
from odefilters.priors import ibm_small, precond_small


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KronGaussian:
    """N(mean.ravel(), (chol chol^T) ⊗ I_d) over the D = d(q+1) state."""

    mean: jax.Array      # (..., q+1, d)
    chol: jax.Array      # (..., q+1, q+1)

    @property
    def u(self) -> jax.Array:
        return self.mean[..., 0, :]

    @property
    def std_blocks(self) -> jax.Array:
        """Per-derivative-block marginal std (same for every dim)."""
        return jnp.sqrt(jnp.sum(self.chol * self.chol, axis=-1))


@dataclasses.dataclass(frozen=True)
class KronModel:
    alg: AbstractEK
    d: int
    q: int
    f: Callable
    At: jax.Array        # (q+1, q+1) preconditioned IBM transition
    QLt: jax.Array       # (q+1, q+1) preconditioned noise factor
    dtype: Any
    second_order: bool = False  # measure block 2: z = E2 x - f(du, u)
    # (u, p, t) -> (d,) Jacobian diagonal (DiagonalEK1 only)
    jac_diag: Any = None
    # (d,) diagonal mass matrix of ``M u' = f`` (DiagonalEK1 only; zeros
    # state index-1 algebraic constraints). None = identity. A diagonal M
    # preserves the per-dimension structure exactly: the measurement row
    # becomes ``h_j = M_jj pinv1 e_1 - J_jj pinv0 e_0`` and the residual
    # ``z_j = M_jj (E1 x)_j - f_j`` (dense-path semantics, step.py:282).
    mass_diag: Any = None

    @property
    def is_iwp(self) -> bool:
        from odefilters.priors import IWP

        return isinstance(self.alg.prior, IWP)

    def transition(self, dt):
        """Preconditioned small transition pair for step ``dt``; constants
        for IWP, per-step expm+quadrature otherwise (any Gauss-Markov prior
        keeps the ``(q+1) ⊗ I_d`` Kronecker structure)."""
        if self.is_iwp:
            return self.At, self.QLt
        from odefilters.priors import transition_precond_small

        return transition_precond_small(self.alg.prior, self.q, dt, self.dtype)


def make_kron_model(alg: AbstractEK, f, d: int, dtype,
                    second_order: bool = False, jac_diag=None,
                    mass_diag=None) -> KronModel:
    if alg.is_ek1 and not alg.is_diagonal_ek1:
        raise ValueError(
            "the Kronecker fast path requires EK0 or DiagonalEK1 structure"
        )
    if alg.is_diagonal_ek1 and second_order:
        raise NotImplementedError(
            "second-order DiagonalEK1 runs on the dense path "
            "(odefilters.solve) — the per-dimension fast path is "
            "first-order only"
        )
    if second_order and alg.order < 2:
        raise ValueError("second-order problems need solver order >= 2")
    if mass_diag is not None and not alg.is_diagonal_ek1:
        # EK0's shared isotropic covariance breaks under a non-uniform
        # diagonal M (per-dim measurement rows differ); DiagonalEK1
        # carries per-dim covariances and absorbs it exactly
        raise NotImplementedError(
            "mass matrices on the Kronecker path require DiagonalEK1 "
            "(per-dimension covariances); use the dense path for EK0/EK1"
        )
    At, QLt = ibm_small(alg.order, dtype=dtype)
    return KronModel(alg=alg, d=d, q=alg.order, f=f, At=At, QLt=QLt,
                     dtype=dtype, second_order=second_order,
                     jac_diag=jac_diag, mass_diag=mass_diag)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KronStepResult:
    x_filt: KronGaussian
    u_filt: jax.Array
    err_est: jax.Array
    sigma2_local: jax.Array
    sigma2_global: jax.Array
    log_likelihood: jax.Array


def kron_attempt_step(
    model: KronModel,
    x: KronGaussian,
    u_prev: jax.Array,
    t,
    dt,
    sigma2_prev: jax.Array,
    success_count: jax.Array,
    abstol: float,
    reltol: float,
    p_params,
) -> KronStepResult:
    """One EK0 step entirely in Kronecker coordinates.

    Math identical to the dense `odefilters.step.attempt_step`
    (`/root/reference/src/perform_step.jl:27-93`), specialized:
    ``S = s I_d``, ``K = ktil ⊗ I_d`` — so the only O(d) work is the f
    evaluation and vector axpys.
    """
    from odefilters import diffusions as diff

    alg, d, q = model.alg, model.d, model.q
    if alg.is_diagonal_ek1:
        return _kron_attempt_step_diag(
            model, x, u_prev, t, dt, sigma2_prev, success_count,
            abstol, reltol, p_params,
        )
    At, QLt = model.transition(dt)
    t_new = t + dt

    p_s, pinv_s = precond_small(dt, q)               # (q+1,)
    m_p = p_s[:, None] * x.mean                      # (q+1, d)
    Lt_p = p_s[:, None] * x.chol                     # (q+1, q+1)

    m_pred = At @ m_p
    u_pred = pinv_s[0] * m_pred[0]
    # measurement block: 1 for u' = f(u), 2 for u'' = f(du, u)
    # (the dense path's SecondOrder branch, odefilters/step.py; EK0 keeps
    # the Kronecker structure either way since H = E_b P^-1)
    b = 2 if model.second_order else 1
    if model.second_order:
        du_pred = pinv_s[1] * m_pred[1]
        fval = model.f(du_pred, u_pred, p_params, t_new)
    else:
        fval = model.f(u_pred, p_params, t_new)
    z = pinv_s[b] * m_pred[b] - fval                 # (d,)

    # H Q H^T = pinv_b^2 * (Qt Qt^T)[b,b] * I_d
    q11 = jnp.sum(QLt[b] * QLt[b])
    hq = pinv_s[b] ** 2 * q11

    if alg.diffusionmodel == "dynamic":
        sigma2 = jnp.sum(z * z) / (hq * d)
        sigma2 = jnp.where(jnp.all(z == 0), 0.0, sigma2)
        QLt_h = jnp.sqrt(sigma2) * QLt
        Lt_pred = tril_factor(
            jnp.concatenate([(At @ Lt_p).T, QLt_h.T], axis=0)
        )
        s = pinv_s[b] ** 2 * jnp.sum(Lt_pred[b] * Lt_pred[b])
        sigma2_local = sigma2
        sigma2_global = sigma2
    elif alg.diffusionmodel == "dynamicMV":
        sigma2 = jnp.maximum(z * z / hq, jnp.finfo(z.dtype).eps)  # (d,)
        # per-dim covariance factors: (d, q+1, q+1)
        Lt_p_b = jnp.broadcast_to(Lt_p, (d, q + 1, q + 1))
        QLt_h = jnp.sqrt(sigma2)[:, None, None] * QLt
        Lt_pred = tril_factor(
            jnp.concatenate(
                [jnp.swapaxes(At @ Lt_p_b, -1, -2), jnp.swapaxes(QLt_h, -1, -2)],
                axis=-2,
            )
        )
        s = pinv_s[b] ** 2 * jnp.sum(Lt_pred[..., b, :] ** 2, axis=-1)  # (d,)
        sigma2_local = sigma2
        sigma2_global = sigma2
    else:
        # static models: predict with sigma^2 = 1, calibrate after
        Lt_pred = tril_factor(
            jnp.concatenate([(At @ Lt_p).T, QLt.T], axis=0)
        )
        s = pinv_s[b] ** 2 * jnp.sum(Lt_pred[b] * Lt_pred[b])
        if alg.diffusionmodel == "fixedMV":
            sigma2_local = z * z / s
        else:
            sigma2_local = jnp.sum(z * z) / (s * d)
            sigma2_local = jnp.where(jnp.all(z == 0), 0.0, sigma2_local)
        sigma2_global = diff.running_update(
            alg.diffusionmodel, sigma2_prev, sigma2_local, success_count, d
        )

    # ---- update: K = ktil ⊗ I_d with ktil = Cpred e1 pinv1 / s ----
    if alg.diffusionmodel == "dynamicMV":
        c_col = jnp.einsum("dij,dj->di", Lt_pred, Lt_pred[:, b, :])  # (d, q+1)
        ktil = pinv_s[b] * c_col / s[:, None]                        # (d, q+1)
        m_filt = m_pred - ktil.T * z[None, :]
        Zrow = pinv_s[b] * Lt_pred[:, b, :]                          # (d, q+1)
        Lt_filt = Lt_pred - ktil[:, :, None] * Zrow[:, None, :]
        ll = -0.5 * (
            jnp.sum(z * z / s) + jnp.sum(jnp.log(s)) + d * jnp.log(2 * jnp.pi)
        )
        err_blocks = jnp.sqrt(sigma2_local * hq)                     # (d,)
        err_unscaled = err_blocks
    else:
        c_col = Lt_pred @ Lt_pred[b]                                 # (q+1,)
        ktil = pinv_s[b] * c_col / s
        m_filt = m_pred - ktil[:, None] * z[None, :]
        Zrow = pinv_s[b] * Lt_pred[b]                                # (q+1,)
        Lt_filt = Lt_pred - jnp.outer(ktil, Zrow)
        ll = -0.5 * (
            jnp.sum(z * z) / s + d * jnp.log(2 * jnp.pi * s)
        )
        # scalar (fixed/fixedMAP/dynamic) or per-dim (fixedMV) local scale
        err_unscaled = jnp.broadcast_to(jnp.sqrt(sigma2_local * hq), (d,))

    x_filt = KronGaussian(pinv_s[:, None] * m_filt, _unprecond_chol(pinv_s, Lt_filt))
    u_filt = x_filt.mean[..., 0, :]

    scale = abstol + reltol * jnp.maximum(jnp.abs(u_prev), jnp.abs(u_filt))
    err = dt * err_unscaled / scale
    EEst = jnp.sqrt(jnp.mean(err * err))

    return KronStepResult(
        x_filt=x_filt,
        u_filt=u_filt,
        err_est=EEst,
        sigma2_local=sigma2_local,
        sigma2_global=sigma2_global,
        log_likelihood=ll,
    )


def _kron_attempt_step_diag(
    model: KronModel,
    x: KronGaussian,
    u_prev: jax.Array,
    t,
    dt,
    sigma2_prev: jax.Array,
    success_count: jax.Array,
    abstol: float,
    reltol: float,
    p_params,
) -> KronStepResult:
    """One DiagonalEK1 step in per-dimension coordinates.

    The diagonal linearization ``J -> diag(J)`` (Kraemer, Bosch, Schmidt,
    Hennig: "Probabilistic ODE Solutions in Millions of Dimensions",
    ICML 2022) gives every dimension its own (q+1,) measurement vector
    ``h_i = pinv_1 e_1 - J_ii pinv_0 e_0``, so the filter factorizes into d
    independent scalar-measurement Kalman filters with per-dimension
    (q+1, q+1) covariance factors: O(d q^3) per step, and EXACTLY equal to
    the dense EK1 whenever the true Jacobian is diagonal. S is diagonal(s),
    so the dense static calibration ``z^T S^-1 z / d``
    (`/root/reference/src/diffusions.jl:55-68`) specializes to
    ``mean(z^2 / s)`` with no approximation.
    """
    from odefilters import diffusions as diff

    alg, d, q = model.alg, model.d, model.q
    At, QLt = model.transition(dt)
    t_new = t + dt

    p_s, pinv_s = precond_small(dt, q)
    m_p = p_s[:, None] * x.mean                      # (q+1, d)
    Lt_p = _unprecond_chol(p_s, x.chol)              # per-dim (d, q+1, q+1)
    if Lt_p.ndim == 2:
        Lt_p = jnp.broadcast_to(Lt_p, (d, q + 1, q + 1))

    m_pred = At @ m_p
    u_pred = pinv_s[0] * m_pred[0]
    fval = model.f(u_pred, p_params, t_new)
    md = model.mass_diag
    if md is None:
        z = pinv_s[1] * m_pred[1] - fval             # (d,)
    else:
        # z = M E1 x - f with diagonal M (step.py:282 semantics; zero
        # rows of M state index-1 algebraic constraints)
        z = md * (pinv_s[1] * m_pred[1]) - fval

    if model.jac_diag is not None:
        jd = model.jac_diag(u_pred, p_params, t_new)  # (d,)
    else:
        jd = jnp.diagonal(
            jax.jacfwd(lambda u: model.f(u, p_params, t_new))(u_pred)
        )

    # per-dim measurement row h_i = M_ii pinv_1 e_1 - J_ii pinv_0 e_0
    dtype = z.dtype
    h = jnp.zeros((d, q + 1), dtype)
    h = h.at[:, 1].set(pinv_s[1] if md is None else md * pinv_s[1])
    h = h.at[:, 0].add(-jd * pinv_s[0])

    hql = h @ QLt                                    # rows h_i^T QLt
    hq = jnp.sum(hql * hql, axis=-1)                 # (d,) = (H Q H^T)_ii

    if alg.diffusionmodel == "dynamic":
        sigma2 = jnp.sum(z * z / hq) / d
        sigma2 = jnp.where(jnp.all(z == 0), 0.0, sigma2)
        QLt_h = jnp.sqrt(sigma2) * QLt
    elif alg.diffusionmodel == "dynamicMV":
        sigma2 = jnp.maximum(z * z / hq, jnp.finfo(dtype).eps)  # (d,)
        QLt_h = jnp.sqrt(sigma2)[:, None, None] * QLt
    else:
        QLt_h = QLt

    QLt_hb = jnp.broadcast_to(QLt_h, (d, q + 1, q + 1))
    Lt_pred = tril_factor(
        jnp.concatenate(
            [jnp.swapaxes(At @ Lt_p, -1, -2), jnp.swapaxes(QLt_hb, -1, -2)],
            axis=-2,
        )
    )
    Zrow = jnp.einsum("di,dij->dj", h, Lt_pred)      # (d, q+1) = h_i^T Lp_i
    s = jnp.sum(Zrow * Zrow, axis=-1)                # (d,) innovation vars

    if alg.is_dynamic_diffusion:
        sigma2_local = sigma2
        sigma2_global = sigma2
    else:
        if alg.diffusionmodel == "fixedMV":
            sigma2_local = z * z / s
        else:  # fixed, fixedMAP: z^T S^-1 z / d with S = diag(s)
            sigma2_local = jnp.sum(z * z / s) / d
            sigma2_local = jnp.where(jnp.all(z == 0), 0.0, sigma2_local)
        sigma2_global = diff.running_update(
            alg.diffusionmodel, sigma2_prev, sigma2_local, success_count, d
        )

    # ---- update: d independent scalar-measurement Kalman updates ----
    c_col = jnp.einsum("dij,dj->di", Lt_pred, Zrow)  # (d, q+1) = Lp Lp^T h
    ktil = c_col / s[:, None]
    m_filt = m_pred - ktil.T * z[None, :]
    Lt_filt = Lt_pred - ktil[:, :, None] * Zrow[:, None, :]
    ll = -0.5 * (
        jnp.sum(z * z / s) + jnp.sum(jnp.log(s)) + d * jnp.log(2 * jnp.pi)
    )

    x_filt = KronGaussian(
        pinv_s[:, None] * m_filt, _unprecond_chol(pinv_s, Lt_filt)
    )
    u_filt = x_filt.mean[..., 0, :]

    # dense error estimate specialised: err_i = sqrt(sigma2_local_i hq_i)
    err_unscaled = jnp.broadcast_to(jnp.sqrt(sigma2_local * hq), (d,))
    scale = abstol + reltol * jnp.maximum(jnp.abs(u_prev), jnp.abs(u_filt))
    err = dt * err_unscaled / scale
    EEst = jnp.sqrt(jnp.mean(err * err))

    return KronStepResult(
        x_filt=x_filt,
        u_filt=u_filt,
        err_est=EEst,
        sigma2_local=sigma2_local,
        sigma2_global=sigma2_global,
        log_likelihood=ll,
    )


def _unprecond_chol(pinv_s, Lt):
    """Row-scale small factor(s) by the inverse preconditioner."""
    if Lt.ndim == 2:
        return pinv_s[:, None] * Lt
    return pinv_s[None, :, None] * Lt


def kron_smooth_step(x_curr: KronGaussian, x_next: KronGaussian, At, QLt):
    """RTS step in Kronecker coordinates (small-matrix analogue of
    `/root/reference/src/filtering.jl:119-154`): the gain is
    ``Gt ⊗ I_d``; the mean recursion batches over d."""
    n = At.shape[-1]
    Lt = x_curr.chol
    if Lt.ndim == 3 and QLt.ndim == 2:
        # per-dim state factors (MV diffusions / DiagonalEK1) with an
        # isotropic diffusion: lift the noise factor to the batch
        QLt = jnp.broadcast_to(QLt, Lt.shape)
    Lt_pred = tril_factor(
        jnp.concatenate(
            [jnp.swapaxes(At @ Lt, -1, -2), jnp.swapaxes(QLt, -1, -2)], axis=-2
        )
    )
    m_pred = At @ x_curr.mean
    # Gt = Ct At^T (Lp Lp^T)^-1 via triangular solves
    C_At = Lt @ jnp.swapaxes(At @ Lt, -1, -2)
    W = jax.scipy.linalg.solve_triangular(Lt_pred, jnp.swapaxes(C_At, -1, -2), lower=True)
    Gt = jnp.swapaxes(
        jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(Lt_pred, -1, -2), W, lower=False
        ),
        -1, -2,
    )
    dm = x_next.mean - m_pred                      # (q+1, d)
    if Gt.ndim == 3:
        # per-dimension gains (MV diffusions): column i of the mean uses
        # its own (q+1, q+1) gain
        m_s = x_curr.mean + jnp.einsum("ijk,ki->ji", Gt, dm)
    else:
        m_s = x_curr.mean + Gt @ dm
    I = jnp.eye(n, dtype=Lt.dtype)
    Lt_s = tril_factor(
        jnp.concatenate(
            [
                jnp.swapaxes((I - Gt @ At) @ Lt, -1, -2),
                jnp.swapaxes(Gt @ QLt, -1, -2),
                jnp.swapaxes(Gt @ x_next.chol, -1, -2),
            ],
            axis=-2,
        )
    )
    return KronGaussian(m_s, Lt_s), Gt
