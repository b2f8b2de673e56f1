"""Data conditioning and marginal data likelihood ("physics-enhanced
regression") for ODE parameter inference.

Beyond the reference (which has no data-conditioning machinery; its
parameter-inference story is ForwardDiff through the solver,
`/root/reference/test/specific_problems.jl:141-156`): run the Gaussian ODE
filter over a grid that contains the observation times, and at each
observation perform a SECOND, noisy Kalman update on the data

    y_i = C u(t_i) + e_i,    e_i ~ N(0, R),

accumulating the exact chain-rule marginal likelihood

    log p(y_1..N | ODE pseudo-observations, u0, p)
        = sum_i log N(y_i; C m_i^pred, C Sigma_i^pred C^T + R),

where (m^pred, Sigma^pred) is the filter state at t_i after the ODE update
but before the data update. The whole quantity is a pure jittable function
of (u0, p, R, data), reverse-mode differentiable through the fixed-grid
scan — gradient-based MLE / MAP / HMC over ODE parameters runs at solver
speed. This is the Kalman formulation of Fenrir-style physics-enhanced
regression (Tronarp, Bosch, Hennig, 2022), in square-root form.

The returned solution is the data-conditioned posterior: smoothing, dense
output and sampling all work on it unchanged (the RTS pass is valid for any
per-node measurement structure).

Dynamic diffusion models calibrate per step BEFORE each data update, so a
single pass suffices. Static models calibrate after a pass
(`integrator_utils.jl:4-18`), so they run Fenrir's calibrate-then-condition:
a plain pass estimates sigma^2, then the data pass runs against the
pre-scaled prior (real-scale covariances meet the absolute R correctly).
The calibrated sigma^2 is stop_gradient'd — gradients treat it as part of
the (frozen) model, like the step-size controller.

For LARGE candidate sweeps (SMC / MCMC / grid search) on a uniform grid,
use the fused kernel
``odefilters.ops.pallas_kernels.ensemble_data_loglik_pallas`` — the same
chain-rule quantity (tested equal), entirely in-kernel, ~100x the
batched XLA path on chip (throughput in benchmarks/results.json). It
covers full-state observations (differentiable via a custom VJP; pass
``calib_grad=False`` for long-horizon f32 gradients), partial (one-hot)
observations, per-dimension noise, per-member observation sets, an EK1
variant for dense operators/stiff problems, and second-order problems;
this XLA path remains the reference semantics and the gradient path for
the non-default observation models.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from odefilters.algorithms import AbstractEK
from odefilters.linalg import Gaussian, gaussian_logpdf_zero
from odefilters.ops.filtering import update_noisy
from odefilters.problem import ODEProblem
from odefilters.solution import RETCODE_SUCCESS, DEStats, ProbODESolution


def _obs_operator(C, d: int, q: int, dtype):
    """Full-state observation operator ``[C 0 ... 0]`` of shape (d_obs, D)."""
    C = jnp.eye(d, dtype=dtype) if C is None else jnp.asarray(C, dtype)
    D = d * (q + 1)
    H = jnp.zeros((C.shape[0], D), dtype).at[:, :d].set(C)
    return H


def _noise_chol(obs_noise, d_obs: int, dtype):
    """Accept a scalar std, a (d_obs,) std vector, or a (d_obs, d_obs)
    covariance factor."""
    s = jnp.asarray(obs_noise, dtype)
    if s.ndim == 0:
        return s * jnp.eye(d_obs, dtype=dtype)
    if s.ndim == 1:
        return jnp.diag(s)
    return s


def _merged_grid(prob, ts_data, n_grid, dtype):
    """Host-side grid construction: a uniform n_grid+1 grid over tspan,
    unioned with the (concrete) observation times."""
    t0, t1 = float(prob.tspan[0]), float(prob.tspan[1])
    td = np.asarray(ts_data, dtype=np.float64)
    if td.ndim != 1 or np.any(np.diff(td) <= 0):
        raise ValueError("ts_data must be a strictly increasing 1-D array")
    if td[0] < t0 or td[-1] > t1:
        raise ValueError("ts_data must lie within prob.tspan")
    base = np.linspace(t0, t1, int(n_grid) + 1)
    # drop base points within tol of a data time BEFORE merging: a uniform
    # grid point one ulp away from an observation time would create a
    # ~1e-16 interval whose preconditioner h**(-q-1/2) overflows. The
    # floor is dtype-aware: in f32 an interval of a few f32-ULPs of the
    # span is just as fatal as an f64-ULP one in f64.
    eps_span = (t1 - t0) * float(np.finfo(np.dtype(dtype)).eps)
    tol = max((t1 - t0) / (int(n_grid) + 1) * 1e-6, 64.0 * eps_span)
    # data-vs-data collisions are just as fatal as base-vs-data ones: two
    # observation times closer than an ULP of the span collapse to equal
    # grid points in the solve dtype and the zero-length interval's
    # preconditioner h**(-q-1/2) overflows
    if td.shape[0] > 1 and np.any(np.diff(td) < 64.0 * eps_span):
        raise ValueError(
            "consecutive ts_data values are closer than ~64 ULP of the "
            f"tspan in {np.dtype(dtype).name}; merge the observations or "
            "solve in a wider dtype"
        )
    near = np.min(np.abs(base[:, None] - td[None, :]), axis=1) < tol
    near[0] = near[0] and td[0] - t0 < tol       # keep the endpoints unless
    near[-1] = near[-1] and t1 - td[-1] < tol    # a data time IS the endpoint
    ts = np.union1d(base[~near], td)
    # indices of the data times in the merged grid
    idx = np.searchsorted(ts, td)
    assert np.array_equal(ts[idx], td)
    is_data = np.zeros(ts.shape[0], dtype=bool)
    is_data[idx] = True
    # data row index per grid row (0 where not a data row)
    row_of = np.zeros(ts.shape[0], dtype=np.int32)
    row_of[idx] = np.arange(td.shape[0], dtype=np.int32)
    return (
        jnp.asarray(ts, dtype),
        jnp.asarray(is_data),
        jnp.asarray(row_of),
    )


@partial(
    jax.jit,
    static_argnames=("alg", "n_steps", "taylor_method", "calib_grad"),
)
def _filter_with_data_jit(
    prob, alg, ts, is_data, row_of, ys, R_chol, C_full, abstol, reltol,
    n_steps: int, taylor_method: str, calib_grad: bool = True,
):
    from odefilters.linalg import highest_precision
    from odefilters.solve import _postprocess

    from odefilters.fixedgrid import filter_fixed_grid

    with highest_precision():
        def maybe_data_update(x: Gaussian, i):
            """Masked noisy update on data row i. Non-data rows compute the
            update against the (arbitrary but finite) ys[0] row and discard
            it via the select — R > 0 keeps every intermediate finite, and
            the zero cotangent through the unselected branch is safe."""
            y = jnp.take(ys, row_of[i], axis=0)
            xd, z, S_chol = update_noisy(x, y, C_full, R_chol)
            dll = gaussian_logpdf_zero(z, S_chol)
            has = is_data[i]
            x_out = jax.tree.map(
                lambda a, b: jnp.where(has, a, b), xd, x
            )
            return x_out, jnp.where(has, dll, 0.0)

        n = jnp.asarray(n_steps, jnp.int32)
        stats = DEStats(
            nf=n, njacs=n if alg.is_ek1 else jnp.zeros((), jnp.int32),
            naccept=n, nreject=jnp.zeros((), jnp.int32),
        )
        retcode = jnp.asarray(RETCODE_SUCCESS, jnp.int32)

        if alg.is_static_diffusion:
            # Fenrir's calibrate-then-condition: a static diffusion is
            # calibrated AFTER a pass (`integrator_utils.jl:4-18`), so a
            # single data-conditioned pass would mix sigma^2 = 1 process
            # covariances with the absolute observation noise R. Run the
            # plain filter first to calibrate sigma^2, then run the data
            # pass against the PRE-SCALED prior (real-scale covariances
            # meet R correctly; the likelihood terms are exact).
            *_, sigma2_hat = filter_fixed_grid(
                prob, alg, ts, abstol, reltol, taylor_method,
                stop_calib_grad=not calib_grad,
            )
            sigma2_hat = jax.lax.stop_gradient(sigma2_hat)
            # two full passes ran: honest work counters (workprecision.py
            # builds cost metrics from these)
            stats = DEStats(
                nf=2 * n,
                njacs=2 * n if alg.is_ek1 else jnp.zeros((), jnp.int32),
                naccept=n, nreject=jnp.zeros((), jnp.int32),
            )
            model, x_filt, diff_buf, ll, data_ll, _ = filter_fixed_grid(
                prob, alg, ts, abstol, reltol, taylor_method,
                obs_update=maybe_data_update, prior_scale=sigma2_hat,
                stop_calib_grad=not calib_grad,
            )
            # assembly: the pass-2 states are already real-scale, so skip
            # the static postamble rescale (pretend "dynamic"), hand the
            # smoother per-interval diffusions = sigma2_hat against the
            # UNSCALED prior transitions, and restore the user's alg on
            # the solution. The ODE ll is NaN for static models, matching
            # the reference.
            alg_post = dataclasses.replace(alg, diffusionmodel="dynamic")
            model_post = dataclasses.replace(
                model, alg=alg_post,
            )
            diffs = jnp.broadcast_to(
                sigma2_hat, diff_buf.shape
            ).astype(diff_buf.dtype)
            ll = jnp.asarray(jnp.nan, diff_buf.dtype)
            sol = _postprocess(
                model_post, prob, ts, x_filt, diffs, n, ll, sigma2_hat,
                stats, retcode,
            )
            sol = dataclasses.replace(sol, alg=alg)
            return sol, data_ll

        model, x_filt, diff_buf, ll, data_ll, sigma2_last = filter_fixed_grid(
            prob, alg, ts, abstol, reltol, taylor_method,
            obs_update=maybe_data_update,
            stop_calib_grad=not calib_grad,
        )
        sol = _postprocess(
            model, prob, ts, x_filt, diff_buf, n, ll, sigma2_last, stats,
            retcode,
        )
        return sol, data_ll


def filter_with_data(
    prob: ODEProblem,
    alg: AbstractEK,
    ts_data,
    ys,
    obs_noise,
    *,
    obs_matrix=None,
    n_grid: int = 100,
    abstol: float = 1e-9,
    reltol: float = 1e-6,
    taylor_method: str = "auto",
    calib_grad: bool = True,
) -> tuple[ProbODESolution, jax.Array]:
    """Condition the ODE filter on noisy observations; return the
    data-conditioned posterior and the marginal data log-likelihood.

    Args:
        ts_data: strictly increasing observation times inside ``tspan``
            (concrete — the solver grid is built host-side as the union of
            a uniform ``n_grid`` grid and these times).
        ys: observations, shape ``(len(ts_data), d_obs)``.
        obs_noise: observation noise — scalar std, per-dimension std vector,
            or a full ``(d_obs, d_obs)`` covariance *factor*.
        obs_matrix: optional ``(d_obs, d)`` linear observation operator C
            (default: identity, observe the full solution vector).

    Returns:
        ``(sol, data_ll)`` — the conditioned :class:`ProbODESolution`
        (smoothed if ``alg.smooth``) and ``log p(y | z = 0, u0, p)``.

    Differentiable: ``jax.grad`` of ``data_ll`` w.r.t. ``prob.p`` /
    ``prob.u0`` / ``obs_noise`` runs reverse-mode through the whole scan —
    see :func:`data_loglik`.

    ``calib_grad=False`` stop-gradients the per-step dynamic-diffusion
    calibration in the adjoint (values unchanged). The full gradient
    routes f32 forward noise through ``1/sigma2`` of innovations at the
    solver-accuracy floor and is useless beyond tens of steps in f32
    (6e3x wrong at 500 steps — measured,
    `benchmarks/grad_horizon_experiment.py`); the stop-calibration
    estimator stays ~1e-4-accurate at 500 steps and is the same choice
    the static/Fenrir sigma^2 and the step controller already make. Use
    it for ANY on-chip (f32) gradient-based inference.
    """
    # Second-order problems work unchanged: the default observation
    # operator is the position block [I 0 ... 0] (observe u; pass a custom
    # (d_obs, 2d)-acting C via obs_matrix columns over [u | du] is NOT
    # supported — C acts on the first d state columns only).
    if getattr(prob, "mass_matrix", None) is not None:
        raise NotImplementedError(
            "mass-matrix problems are supported on the dense solver paths "
            "(odefilters.solve / solve_fixed) only"
        )
    if alg.is_static_diffusion:
        from odefilters.priors import IWP

        if not isinstance(alg.prior, IWP):
            # the pre-scaled-prior pass bakes sigma^2 into the constant
            # IWP factor; non-IWP transitions are rebuilt per step and
            # would drop the scale
            raise NotImplementedError(
                "static diffusion models with non-IWP priors are not "
                "supported by filter_with_data; use a dynamic diffusion"
            )
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    ts, is_data, row_of = _merged_grid(prob, ts_data, n_grid, dtype)
    ys = jnp.asarray(ys, dtype)
    if ys.ndim != 2 or ys.shape[0] != int(np.asarray(ts_data).shape[0]):
        raise ValueError("ys must have shape (len(ts_data), d_obs)")
    d_obs = ys.shape[1]
    C_full = _obs_operator(obs_matrix, prob.d, alg.order, dtype)
    if C_full.shape[0] != d_obs:
        raise ValueError(
            f"obs_matrix has {C_full.shape[0]} rows but ys has d_obs={d_obs}"
        )
    R_chol = _noise_chol(obs_noise, d_obs, dtype)
    return _filter_with_data_jit(
        prob, alg, ts, is_data, row_of, ys, R_chol, C_full, abstol, reltol,
        ts.shape[0] - 1, taylor_method, bool(calib_grad),
    )


def data_loglik(prob, alg, ts_data, ys, obs_noise, **kwargs) -> jax.Array:
    """Scalar ``log p(y | z = 0, u0, p)`` — the gradient-ready objective for
    parameter inference: ``jax.grad(lambda p: data_loglik(remake(prob, p=p),
    ...))``.

    The likelihood only needs the forward filter, so smoothing is switched
    off regardless of ``alg.smooth`` (an objective/gradient loop would
    otherwise pay a discarded RTS pass per evaluation)."""
    if alg.smooth:
        alg = dataclasses.replace(alg, smooth=False)
    _, dll = filter_with_data(prob, alg, ts_data, ys, obs_noise, **kwargs)
    return dll
