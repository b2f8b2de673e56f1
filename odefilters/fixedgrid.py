"""Fixed-grid solver: one `lax.scan` over the time grid.

This is the solver shape the reference cannot express (its loop lives in
OrdinaryDiffEq): with a static grid the whole solve is a single fused scan,
reverse-mode differentiable (`jax.grad` through the solve), trivially
`vmap`-able over ensembles, and the basis for the time-parallel
associative-scan backend in ``odefilters/parallel/``.

Equivalent reference behavior: ``solve(prob, alg, adaptive=false, dt=h)``
(`/root/reference/test/correctness.jl:33-35`).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from odefilters.algorithms import AbstractEK
from odefilters.linalg import Gaussian
from odefilters.problem import ODEProblem
from odefilters.solution import RETCODE_SUCCESS, DEStats, ProbODESolution
from odefilters.step import attempt_step, make_model
from odefilters.taylor import initial_state


def _solve_fixed_impl(*args, **kwargs):
    from odefilters.linalg import highest_precision

    with highest_precision():
        return _solve_fixed_impl_inner(*args, **kwargs)


def filter_fixed_grid(
    prob: ODEProblem,
    alg: AbstractEK,
    ts: jax.Array,
    abstol,
    reltol,
    taylor_method: str,
    obs_update=None,
    prior_scale=None,
    stop_calib_grad: bool = False,
    linearize_us=None,
):
    """The shared fixed-grid filter scan (model/Taylor init + one
    ``lax.scan`` of `attempt_step` over the grid).

    ``obs_update(x: Gaussian, i) -> (x, scalar)``: optional per-row hook
    applied to the filtered state of grid row ``i`` (including the initial
    state, i=0) — the data-conditioning entry point (`odefilters.datalik`);
    the scalars are accumulated and returned as ``extra``.

    ``prior_scale``: optional pre-calibrated diffusion sigma^2 (scalar or
    per-dimension) baked into the process-noise factor, so the pass runs
    against the ALREADY-scaled prior (datalik's calibrate-then-condition
    for static diffusion models).

    ``linearize_us``: optional (n_steps+1, d) array of EK1 linearization
    points per grid row — the fixed-grid IEKS hook (the adaptive driver's
    ``linearize_sol`` evaluated on the grid, `perform_step.jl:111-113`);
    row ``i+1`` linearizes the measurement of step ``i -> i+1``.

    Returns ``(model, x_filt, diff_buf, ll, extra, sigma2_last)``.
    """
    import dataclasses

    from odefilters import diffusions as diff
    from odefilters.problem import require_ek1_for_singular_mass

    # Same rejection the adaptive `solve` front door gives — direct
    # fixed-grid calls with EK0 + a singular M must fail loudly too
    # (an EK0 innovation covariance through a singular M is singular).
    require_ek1_for_singular_mass(prob, alg.is_ek1)

    d = prob.d
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    model = make_model(alg, prob.f, prob.jac, d, dtype,
                       second_order=prob.second_order,
                       jac_diag=prob.jac_diag, mass=prob.mass_matrix)
    if prior_scale is not None:
        if not model.is_iwp:
            # the scale is baked into the constant IWP factor only;
            # FilterModel.transition() rebuilds non-IWP transitions per
            # step and would silently drop it
            raise NotImplementedError(
                "prior_scale requires the IWP prior"
            )
        model = dataclasses.replace(
            model,
            QL=diff.apply_diffusion_chol(model.QL, prior_scale, alg.order),
        )
    if prob.second_order:
        from odefilters.taylor import initial_state_2nd

        u0_full = prob.u0.astype(dtype)
        x0 = initial_state_2nd(
            prob.f, u0_full[:d], u0_full[d:], prob.p, prob.tspan[0], alg.order
        )
    else:
        from odefilters.problem import init_rhs

        tm = taylor_method
        if prob.mass_matrix is not None and tm == "auto":
            tm = "jvp"  # jet has no rules for the QR solve in the DAE RHS
        x0 = initial_state(
            init_rhs(prob), prob.u0.astype(dtype), prob.p, prob.tspan[0],
            alg.order, method=tm,
        )
    sigma2_0 = diff.initial_diffusion(alg.diffusionmodel, d, dtype)

    extra0 = jnp.zeros((), dtype)
    if obs_update is not None:
        x0, extra0 = obs_update(x0, 0)

    def body(carry, i):
        x, sigma2, ll, extra, k = carry
        t, dt = ts[i], ts[i + 1] - ts[i]
        lin = None
        if linearize_us is not None:
            u_lin_row = linearize_us[i + 1]
            lin = lambda t_new: u_lin_row  # noqa: E731
        res = attempt_step(
            model, x, x.mean[: model.sol_d], t, dt, sigma2, k, abstol,
            reltol, prob.p, linearize_u=lin,
            stop_calib_grad=stop_calib_grad,
        )
        x1 = res.x_filt
        if obs_update is not None:
            x1, e = obs_update(x1, i + 1)
            extra = extra + e
        ll = ll + res.log_likelihood
        out = (x1.mean, x1.chol, x1.mean[: model.sol_d], res.sigma2_global)
        return (x1, res.sigma2_global, ll, extra, k + 1), out

    n_steps = ts.shape[0] - 1
    init = (x0, sigma2_0, jnp.zeros((), dtype), extra0,
            jnp.zeros((), jnp.int32))
    (x_last, sigma2_last, ll, extra, _), (ms, Ls, us, sgs) = jax.lax.scan(
        body, init, jnp.arange(n_steps)
    )

    x_filt = Gaussian(
        jnp.concatenate([x0.mean[None], ms], axis=0),
        jnp.concatenate([x0.chol[None], Ls], axis=0),
    )
    diff_buf = jnp.concatenate(
        [jnp.ones_like(sigma2_0)[None], sgs], axis=0
    )
    return model, x_filt, diff_buf, ll, extra, sigma2_last


def _solve_fixed_impl_inner(
    prob: ODEProblem,
    alg: AbstractEK,
    ts: jax.Array,
    abstol,
    reltol,
    n_steps: int,
    taylor_method: str,
    calibrate_errors: bool,
    linearize_us=None,
):
    from odefilters.solve import _postprocess  # local import to avoid cycle

    model, x_filt, diff_buf, ll, _, sigma2_last = filter_fixed_grid(
        prob, alg, ts, abstol, reltol, taylor_method,
        linearize_us=linearize_us,
    )
    n = jnp.asarray(n_steps, jnp.int32)
    stats = DEStats(
        nf=n, njacs=n if alg.is_ek1 else jnp.zeros((), jnp.int32),
        naccept=n, nreject=jnp.zeros((), jnp.int32),
    )
    retcode = jnp.asarray(RETCODE_SUCCESS, jnp.int32)
    return _postprocess(
        model, prob, ts, x_filt, diff_buf, n, ll, sigma2_last, stats, retcode
    )


@partial(jax.jit, static_argnames=("alg", "n_steps", "taylor_method", "calibrate_errors"))
def _solve_fixed_jit(prob, alg, ts, abstol, reltol, n_steps, taylor_method,
                     calibrate_errors, linearize_us=None):
    return _solve_fixed_impl(
        prob, alg, ts, abstol, reltol, n_steps, taylor_method,
        calibrate_errors, linearize_us=linearize_us,
    )


def solve_fixed(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    dt: Optional[float] = None,
    ts: Optional[jax.Array] = None,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    taylor_method: str = "auto",
    linearize_us: Optional[jax.Array] = None,
) -> ProbODESolution:
    """Fixed-grid solve: supply either a step size ``dt`` or a grid ``ts``.

    The grid must start at ``tspan[0]`` and end at ``tspan[1]``.
    ``linearize_us``: optional (n+1, d) EK1 linearization points per grid
    row (the fixed-grid IEKS hook; see :func:`odefilters.ieks.solve_ieks_fixed`).
    """
    t0, t1 = prob.tspan
    if ts is None:
        if dt is None:
            raise ValueError("Fixed timestep methods require a choice of dt")
        n = int(round(float(t1 - t0) / float(dt)))
        n = max(n, 1)
        ts = jnp.linspace(t0, t1, n + 1)
    else:
        ts = jnp.asarray(ts)
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    ts = ts.astype(dtype)
    if linearize_us is not None:
        linearize_us = jnp.asarray(linearize_us, dtype)
        if linearize_us.shape != (ts.shape[0], prob.d):
            raise ValueError(
                f"linearize_us must have shape {(ts.shape[0], prob.d)} "
                f"(one linearization point per grid row), got "
                f"{linearize_us.shape}"
            )
    return _solve_fixed_jit(
        prob, alg, ts, abstol, reltol, ts.shape[0] - 1, taylor_method, True,
        linearize_us,
    )
