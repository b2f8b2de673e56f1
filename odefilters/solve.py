"""The solver driver: adaptive PI-controlled loop, fixed-grid scan, and the
public ``solve`` / ``init`` / ``step`` API.

The reference inherits all of this from OrdinaryDiffEq.jl (SURVEY.md "Host
framework"): ``__init``/``solve!``, the adaptive PI step-size controller
(tuned by `/root/reference/src/alg_utils.jl:13-24`), accept/reject, saving,
and the postamble (`/root/reference/src/integrator_utils.jl`). On TPU we own
it: the loop is a ``lax.while_loop`` over a pure carry with fixed-capacity
save buffers, fully ``jit``- and ``vmap``-compatible (an ensemble solve is
``vmap(solve_impl)``; diverged members simply stop writing).

Controller constants follow OrdinaryDiffEq's PI defaults: gamma = 9/10,
qmin = 1/5, qmax = 10, qoldinit = 1e-4, with the reference's per-order
exponents beta1 = 7/(10(q+1)), beta2 = 2/(5(q+1)) (`alg_utils.jl:23-24`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from odefilters import diffusions as diff
from odefilters.algorithms import AbstractEK
from odefilters.linalg import Gaussian
from odefilters.problem import ODEProblem
from odefilters.smoothing import smooth_all
from odefilters.solution import (
    RETCODE_MAXITERS,
    RETCODE_SUCCESS,
    RETCODE_UNSTABLE,
    DEStats,
    ProbODESolution,
)
from odefilters.step import FilterModel, attempt_step, make_model
from odefilters.taylor import initial_state

GAMMA = 0.9
QMIN = 0.2
QMAX = 10.0
QOLDINIT = 1e-4


# --------------------------------------------------------------------------
# Initial step size (Hairer-style, OrdinaryDiffEq's ode_determine_initdt)
# --------------------------------------------------------------------------


def initial_dt(prob: ODEProblem, order: int, abstol, reltol):
    u0, p = prob.u0, prob.p
    if prob.mass_matrix is not None:
        from odefilters.problem import init_rhs

        f = init_rhs(prob)  # state-space u' for the Hairer heuristic
    elif prob.second_order:
        # first-order companion system y = [u; du] for the dt heuristic
        dd = prob.d
        f2 = prob.f

        def f(y, p, t):
            return jnp.concatenate([y[dd:], f2(y[dd:], y[:dd], p, t)])

    else:
        f = prob.f
    t0, t1 = prob.tspan
    tdir_span = t1 - t0

    def hnorm(v):
        return jnp.sqrt(jnp.mean(v * v))

    sc = abstol + jnp.abs(u0) * reltol
    d0 = hnorm(u0 / sc)
    f0 = f(u0, p, t0)
    d1 = hnorm(f0 / sc)
    dt0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    dt0 = jnp.minimum(dt0, tdir_span)
    u1 = u0 + dt0 * f0
    f1 = f(u1, p, t0 + dt0)
    d2 = hnorm((f1 - f0) / sc) / dt0
    maxd = jnp.maximum(d1, d2)
    dt1 = jnp.where(
        maxd <= 1e-15,
        jnp.maximum(1e-6, dt0 * 1e-3),
        (0.01 / maxd) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(jnp.minimum(100 * dt0, dt1), tdir_span)


# --------------------------------------------------------------------------
# Adaptive while-loop driver
# --------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _Carry:
    t: jax.Array
    dt: jax.Array
    x: Gaussian
    u: jax.Array
    qold: jax.Array
    sigma2: jax.Array          # committed global diffusion
    ll: jax.Array
    n: jax.Array               # accepted steps so far (== next write index - 1)
    iters: jax.Array
    failed: jax.Array
    ev_armed: jax.Array        # continuous-event re-arm flag
    stats: DEStats
    ts_buf: jax.Array
    u_buf: jax.Array
    m_buf: jax.Array
    L_buf: jax.Array
    diff_buf: jax.Array


def _controller_accept(EEst, qold, dt, beta1, beta2):
    """PI controller, accept branch (OrdinaryDiffEq stepsize_controller!)."""
    EEst = jnp.maximum(EEst, 1e-35)
    q11 = EEst**beta1
    qq = q11 / (qold**beta2)
    qq = jnp.maximum(1.0 / QMAX, jnp.minimum(1.0 / QMIN, qq / GAMMA))
    dt_new = dt / qq
    qold_new = jnp.maximum(EEst, QOLDINIT)
    return dt_new, qold_new


def _controller_reject(EEst, dt, beta1):
    EEst = jnp.maximum(EEst, 1e-35)
    q11 = EEst**beta1
    return dt / jnp.minimum(1.0 / QMIN, q11 / GAMMA)


def _init_carry(model: FilterModel, prob: ODEProblem, x0: Gaussian, dt0,
                max_steps: int) -> "_Carry":
    alg, d, D = model.alg, model.d, model.D
    sol_d = model.sol_d
    t0, t1 = prob.tspan
    dtype = model.dtype
    N1 = max_steps + 1

    u0 = x0.mean[:sol_d]
    sigma2_0 = diff.initial_diffusion(alg.diffusionmodel, d, dtype)

    ts_buf = jnp.full((N1,), jnp.asarray(t1, dtype), dtype=dtype).at[0].set(t0)
    u_buf = jnp.zeros((N1, sol_d), dtype).at[0].set(u0)
    m_buf = jnp.zeros((N1, D), dtype).at[0].set(x0.mean)
    L_buf = jnp.zeros((N1, D, D), dtype).at[0].set(x0.chol)
    diff_shape = (N1,) + sigma2_0.shape
    diff_buf = jnp.ones(diff_shape, dtype)

    return _Carry(
        t=jnp.asarray(t0, dtype),
        dt=jnp.asarray(dt0, dtype),
        x=x0,
        u=u0,
        qold=jnp.asarray(QOLDINIT, dtype),
        sigma2=sigma2_0,
        ll=jnp.zeros((), dtype),
        n=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32),
        failed=jnp.zeros((), bool),
        ev_armed=jnp.ones((), bool),
        stats=DEStats.zeros(),
        ts_buf=ts_buf,
        u_buf=u_buf,
        m_buf=m_buf,
        L_buf=L_buf,
        diff_buf=diff_buf,
    )


def _make_loop_fns(
    model: FilterModel,
    prob: ODEProblem,
    abstol,
    reltol,
    max_steps: int,
    maxiters: int,
    dtmin,
    linearize_u=None,
    callback=None,
    tstops=None,
    ccallback=None,
):
    """Build the (cond, body) of the adaptive loop; shared by the full
    while-loop solve and the incremental `init`/`step` integrator API."""
    alg = model.alg
    t0, t1 = prob.tspan
    dtype = model.dtype
    N1 = max_steps + 1
    beta1, beta2 = alg.beta1, alg.beta2

    def cond(c: _Carry):
        return (
            (c.t < t1)
            & (~c.failed)
            & (c.n < max_steps)
            & (c.iters < maxiters)
        )

    def body(c: _Carry):
        dt_want = c.dt
        hit_tstop = jnp.zeros((), bool)
        nxt = jnp.asarray(t1, dtype)
        if tstops is not None:
            # land exactly on the next tstop (host-framework tstops
            # semantics; needed for discontinuous forcing)
            nxt = tstops[jnp.searchsorted(tstops, c.t, side="right")]
            hit_tstop = c.t + dt_want >= nxt
            dt_want = jnp.minimum(dt_want, nxt - c.t)
        reach_end = c.t + dt_want >= t1
        dt_eff = jnp.where(reach_end, t1 - c.t, dt_want)
        # snap to the tstop / endpoint exactly
        t_new = jnp.where(
            reach_end, jnp.asarray(t1, dtype),
            jnp.where(hit_tstop, nxt, c.t + dt_eff),
        )

        res = attempt_step(
            model, c.x, c.u, c.t, dt_eff,
            # success_count must be ACCEPTED steps (the reference's
            # integ.success_iter) — c.n also counts dt==0 duplicate rows
            # written by callbacks, which would corrupt the static
            # diffusion running means
            c.sigma2, c.stats.naccept.astype(jnp.int32),
            abstol, reltol, prob.p, linearize_u,
        )
        EEst = jnp.where(jnp.isfinite(res.err_est), res.err_est, 1e10)
        # The step-size controller is non-differentiable: without this,
        # tangents leak through EEst**beta into dt and the time grid and
        # the propagated sensitivities are garbage at tight tolerances
        # (observed 55% gradient error at reltol=1e-9). With it, gradients
        # are the exact sensitivities of the filter on the realized grid
        # (discretize-then-optimize), matching the reference's ForwardDiff
        # behavior (`test/specific_problems.jl:141-156`) to solver accuracy.
        EEst = jax.lax.stop_gradient(EEst)
        accept = EEst <= 1.0

        dt_acc, qold_acc = _controller_accept(EEst, c.qold, dt_eff, beta1, beta2)
        # a step truncated to land on a tstop must not collapse the
        # controller's step size (OrdinaryDiffEq's dtcache behavior)
        dt_acc = jnp.where(hit_tstop & ~reach_end, jnp.maximum(dt_acc, c.dt), dt_acc)
        dt_rej = _controller_reject(EEst, dt_eff, beta1)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        failed = dt_new < dtmin

        # -- continuous event location (beyond the reference, which only
        # has discrete callbacks, test/specific_problems.jl:69-111): on a
        # sign change of g over the accepted interval, bisect on the
        # probabilistic dense-output mean between the bracketing filter
        # states, then RE-TAKE the step to land exactly on the event
        # (tstop semantics) --
        fired_ev = jnp.zeros((), bool)
        if ccallback is not None:
            from odefilters.linalg import scale_rows
            from odefilters.ops.filtering import (
                predict as _predict,
                smooth_step as _smooth_step,
            )
            from odefilters.priors import precond_full

            cc = ccallback
            d_, q_ = model.sol_d, model.q
            g_old = cc.condition(c.u[:d_], c.t, prob.p)
            g_new = cc.condition(res.u_filt[:d_], t_new, prob.p)
            crossed = (g_old * g_new) < 0
            if cc.direction > 0:
                crossed = crossed & (g_old < 0)
            elif cc.direction < 0:
                crossed = crossed & (g_old > 0)
            # re-arm protection: after landing on a root, g(t*) ~ 0 with
            # arbitrary sign, so the immediately following step must not
            # re-detect the same crossing
            fired_ev = accept & crossed & c.ev_armed

            tiny = jnp.finfo(dtype).tiny
            # jacobian-rate prior: the bracketing interval was linearized
            # at its left state c.x (see attempt_step)
            rate_cc = model.prior_rate(c.x.mean[: model.d], prob.p, c.t)

            def interp_u(tau):
                # predict from x(t) over h1, smooth against x_filt(t_new)
                # over h2 — the dense-output bridge (`solution.jl:165-210`)
                h1 = jnp.maximum(tau - c.t, tiny)
                A1, QL1 = model.transition(h1, rate_matrix=rate_cc)
                QLh1 = diff.apply_diffusion_chol(QL1, res.sigma2_local, q_)
                p1, p1i = precond_full(h1, model.d, q_)
                pred = scale_rows(
                    p1i, _predict(scale_rows(p1, c.x), A1, QLh1)
                )
                h2 = jnp.maximum(t_new - tau, tiny)
                A2, QL2 = model.transition(h2, rate_matrix=rate_cc)
                QLh2 = diff.apply_diffusion_chol(QL2, res.sigma2_local, q_)
                p2, p2i = precond_full(h2, model.d, q_)
                sm, _ = _smooth_step(
                    scale_rows(p2, pred), scale_rows(p2, res.x_filt),
                    A2, QLh2,
                )
                return (p2i * sm.mean)[: model.sol_d]

            def _locate(_):
                def bis(_, st):
                    lo, hi, glo = st
                    mid = 0.5 * (lo + hi)
                    gm = cc.condition(interp_u(mid), mid, prob.p)
                    left = glo * gm <= 0
                    return (
                        jnp.where(left, lo, mid),
                        jnp.where(left, mid, hi),
                        jnp.where(left, glo, gm),
                    )

                lo, hi, _ = jax.lax.fori_loop(
                    0, cc.root_iters, bis, (c.t, t_new, g_old)
                )
                # floor the relocated step at 1e-3 of the original: a
                # root within one ulp of c.t would give dt ~ 0, whose
                # preconditioner entries (dt**negative) overflow
                t_star = jnp.maximum(
                    0.5 * (lo + hi), c.t + 1e-3 * (t_new - c.t)
                )
                res2 = attempt_step(
                    model, c.x, c.u, c.t, t_star - c.t,
                    c.sigma2, c.stats.naccept.astype(jnp.int32),
                    abstol, reltol, prob.p, linearize_u,
                )
                # commit the relocated step only if it is finite; else
                # keep the original accepted step (no event landing)
                ok = jnp.all(jnp.isfinite(res2.x_filt.mean)) & jnp.all(
                    jnp.isfinite(res2.x_filt.chol)
                )
                t_out = jnp.where(ok, t_star, t_new)
                res_out = jax.tree.map(
                    lambda a, b: jnp.where(ok, a, b), res2, res
                )
                return t_out, res_out

            t_new, res = jax.lax.cond(
                fired_ev, _locate, lambda _: (t_new, res), None
            )

        # Conditional save: on reject, write to the out-of-bounds slot N1,
        # which scatter-mode "drop" discards (no O(N) select over buffers).
        k = c.n + 1
        wi = jnp.where(accept, k, N1)
        ts_buf = c.ts_buf.at[wi].set(t_new, mode="drop")
        u_buf = c.u_buf.at[wi].set(res.u_filt, mode="drop")
        m_buf = c.m_buf.at[wi].set(res.x_filt.mean, mode="drop")
        L_buf = c.L_buf.at[wi].set(res.x_filt.chol, mode="drop")
        diff_buf = c.diff_buf.at[wi].set(res.sigma2_global, mode="drop")

        x_next = res.x_filt
        u_next = res.u_filt
        if callback is not None:
            # Fire after an accepted step; save the post-affect state as a
            # duplicate-time row (dt == 0), mirroring the host framework.
            fired = accept & callback.condition(res.u_filt, t_new, prob.p)
            x_aff = callback.affect(res.x_filt, t_new, prob.p)
            wi2 = jnp.where(fired, k + 1, N1)
            ts_buf = ts_buf.at[wi2].set(t_new, mode="drop")
            u_buf = u_buf.at[wi2].set(x_aff.mean[..., : model.sol_d], mode="drop")
            m_buf = m_buf.at[wi2].set(x_aff.mean, mode="drop")
            L_buf = L_buf.at[wi2].set(x_aff.chol, mode="drop")
            diff_buf = diff_buf.at[wi2].set(res.sigma2_global, mode="drop")
            x_next = jax.tree.map(
                lambda a, b: jnp.where(fired, a, b), x_aff, res.x_filt
            )
            u_next = jnp.where(fired, x_aff.mean[..., : model.sol_d], res.u_filt)
            # only advance past the duplicate row if it actually fit in the
            # buffer (wi2 out-of-bounds writes are dropped)
            k = jnp.where(fired & (k + 1 <= max_steps), k + 1, k)

        if ccallback is not None and ccallback.affect is not None:
            # apply the event affect, saved as a dt == 0 duplicate row
            x_aff = ccallback.affect(res.x_filt, t_new, prob.p)
            wi2 = jnp.where(fired_ev, k + 1, N1)
            ts_buf = ts_buf.at[wi2].set(t_new, mode="drop")
            u_buf = u_buf.at[wi2].set(x_aff.mean[..., : model.sol_d], mode="drop")
            m_buf = m_buf.at[wi2].set(x_aff.mean, mode="drop")
            L_buf = L_buf.at[wi2].set(x_aff.chol, mode="drop")
            diff_buf = diff_buf.at[wi2].set(res.sigma2_global, mode="drop")
            x_next = jax.tree.map(
                lambda a, b: jnp.where(fired_ev, a, b), x_aff, x_next
            )
            u_next = jnp.where(fired_ev, x_aff.mean[..., : model.sol_d], u_next)
            k = jnp.where(fired_ev & (k + 1 <= max_steps), k + 1, k)

        t_next_val = jnp.where(accept, t_new, c.t)
        if ccallback is not None and ccallback.terminal:
            # terminal event: park t at t1 so the loop exits with Success;
            # the saved grid ends at the event time
            t_next_val = jnp.where(fired_ev, jnp.asarray(t1, dtype), t_next_val)

        x_new = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), x_next, c.x
        )
        st = c.stats
        stats = DEStats(
            nf=st.nf + 1,
            njacs=st.njacs + (1 if alg.is_ek1 else 0),
            naccept=st.naccept + accept.astype(jnp.int32),
            nreject=st.nreject + (~accept).astype(jnp.int32),
        )
        return _Carry(
            t=t_next_val,
            dt=dt_new,
            x=x_new,
            u=jnp.where(accept, u_next, c.u),
            qold=jnp.where(accept, qold_acc, c.qold),
            sigma2=jnp.where(accept, res.sigma2_global, c.sigma2),
            ll=jnp.where(accept, c.ll + res.log_likelihood, c.ll),
            n=jnp.where(accept, k, c.n),
            iters=c.iters + 1,
            failed=failed & ~accept & ~reach_end | c.failed,
            # disarm for the step following a fired event; re-arm after
            # the next accepted step
            ev_armed=jnp.where(fired_ev, False, c.ev_armed | accept),
            stats=stats,
            ts_buf=ts_buf,
            u_buf=u_buf,
            m_buf=m_buf,
            L_buf=L_buf,
            diff_buf=diff_buf,
        )

    return cond, body


def _adaptive_loop(
    model: FilterModel,
    prob: ODEProblem,
    x0: Gaussian,
    dt0,
    abstol,
    reltol,
    max_steps: int,
    maxiters: int,
    dtmin,
    linearize_u=None,
    callback=None,
    tstops=None,
    ccallback=None,
):
    t1 = prob.tspan[1]
    carry0 = _init_carry(model, prob, x0, dt0, max_steps)
    cond, body = _make_loop_fns(
        model, prob, abstol, reltol, max_steps, maxiters, dtmin, linearize_u,
        callback, tstops, ccallback,
    )
    c = jax.lax.while_loop(cond, body, carry0)

    retcode = jnp.where(
        c.t >= t1,
        RETCODE_SUCCESS,
        jnp.where(c.failed, RETCODE_UNSTABLE, RETCODE_MAXITERS),
    ).astype(jnp.int32)
    return c, retcode


# --------------------------------------------------------------------------
# Post-processing: static recalibration + smoothing + solution assembly
# (the reference's postamble!, /root/reference/src/integrator_utils.jl:2-30)
# --------------------------------------------------------------------------


def _postprocess(
    model: FilterModel, prob, ts, x_filt: Gaussian, diffs, n, ll, sigma2_final,
    stats, retcode,
) -> ProbODESolution:
    alg, d, q = model.alg, model.d, model.q

    if alg.is_static_diffusion:
        # Rescale all filter covs by the final global diffusion and backfill
        # sol.diffusions (`integrator_utils.jl:4-18`); ll is set to NaN.
        final = sigma2_final
        if final.ndim == 0:
            scale = jnp.sqrt(final)
            L_cal = x_filt.chol * scale
        else:
            rs = jnp.sqrt(jnp.tile(final, q + 1))
            L_cal = x_filt.chol * rs[None, :, None]
        x_filt = Gaussian(x_filt.mean, L_cal)
        diffs = jnp.broadcast_to(final, diffs.shape).astype(diffs.dtype)
        ll = jnp.asarray(jnp.nan, dtype=model.dtype)

    if alg.smooth:
        from odefilters.step import prior_rate_fn

        x_out = smooth_all(
            x_filt, ts, diffs, n, d, q, prior=alg.prior,
            rate_fn=prior_rate_fn(model, prob.p),
        )
    else:
        x_out = x_filt

    sol_d = model.sol_d
    u = x_out.mean[:, :sol_d]
    pu = Gaussian(x_out.mean[:, :sol_d], x_out.chol[:, :sol_d, :])

    return ProbODESolution(
        ts=ts,
        n_steps=n,
        u=u,
        pu=pu,
        x_filt=x_filt,
        x_smooth=x_out,
        diffusions=diffs,
        log_likelihood=ll,
        stats=stats,
        retcode=retcode,
        prob=prob,
        alg=alg,
    )


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


def _solve_adaptive_impl(*args, **kwargs):
    from odefilters.linalg import highest_precision

    with highest_precision():
        return _solve_adaptive_impl_inner(*args, **kwargs)


def _solve_adaptive_impl_inner(
    prob: ODEProblem,
    alg: AbstractEK,
    abstol,
    reltol,
    dt0,
    max_steps: int,
    maxiters: int,
    dtmin,
    adaptive: bool,
    taylor_method: str,
    linearize_sol,
    callback=None,
    tstops=None,
    ccallback=None,
):
    # IEKS hook: linearize the EK1 measurement at the previous smoothed
    # posterior mean (`perform_step.jl:111-113`). linearize_sol is a
    # dynamic pytree so IEKS iterations do not recompile.
    if linearize_sol is None:
        _linearize_u = None
    else:
        from odefilters.solution import evaluate

        def _linearize_u(t):
            return evaluate(linearize_sol, t).mean

    d = prob.d
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    model = make_model(alg, prob.f, prob.jac, d, dtype,
                       second_order=prob.second_order,
                       jac_diag=prob.jac_diag, mass=prob.mass_matrix)
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
    carry, retcode = _adaptive_loop(
        model, prob, x0, dt0, abstol, reltol, max_steps, maxiters, dtmin,
        linearize_u=_linearize_u, callback=callback, tstops=tstops,
        ccallback=ccallback,
    )
    return _postprocess(
        model, prob, carry.ts_buf, Gaussian(carry.m_buf, carry.L_buf),
        carry.diff_buf, carry.n, carry.ll, carry.sigma2, carry.stats, retcode,
    )


@partial(
    jax.jit,
    static_argnames=(
        "alg", "max_steps", "maxiters", "adaptive", "taylor_method",
        "callback", "ccallback",
    ),
)
def _solve_adaptive_jit(prob, alg, abstol, reltol, dt0, max_steps, maxiters,
                        dtmin, adaptive, taylor_method, linearize_sol,
                        callback=None, tstops=None, ccallback=None):
    return _solve_adaptive_impl(
        prob, alg, abstol, reltol, dt0, max_steps, maxiters, dtmin, adaptive,
        taylor_method, linearize_sol, callback, tstops, ccallback,
    )


def solve(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    dt: Optional[float] = None,
    adaptive: bool = True,
    max_steps: int = 4096,
    maxiters: int = 100_000,
    dtmin: Optional[float] = None,
    taylor_method: str = "auto",
    linearize_sol=None,
    callback=None,
    tstops=None,
    saveat=None,
) -> ProbODESolution:
    """Solve ``prob`` with a Gaussian ODE filter.

    The entry point matching ``solve(prob, EK1(order=q); abstol, reltol)``
    (SURVEY.md call stack 3.1). Fully jittable and differentiable
    (forward-mode through the adaptive loop; use the fixed-grid solver for
    reverse-mode).
    """
    t0, t1 = prob.tspan
    from odefilters.problem import require_ek1_for_singular_mass

    require_ek1_for_singular_mass(prob, alg.is_ek1)
    if not adaptive:
        if dt is None:
            # Mirrors the reference's fixed-step-without-dt rejection
            # (`test/errors.jl:17-20`).
            raise ValueError("Fixed timestep methods require a choice of dt")
        if callback is not None or tstops is not None:
            raise NotImplementedError(
                "callbacks/tstops are supported by the adaptive driver only"
            )
        from odefilters.fixedgrid import solve_fixed

        sol = solve_fixed(
            prob, alg, dt=dt, abstol=abstol, reltol=reltol,
            taylor_method=taylor_method,
        )
        if saveat is not None:
            from odefilters.solution import compact_saveat

            sol = compact_saveat(sol, jnp.asarray(saveat))
        return sol

    if dt is None:
        # stop_gradient: the initial-dt heuristic is part of the (frozen)
        # discretization, like the controller inside the loop
        dt0 = jax.lax.stop_gradient(initial_dt(prob, alg.order, abstol, reltol))
    else:
        dt0 = jnp.asarray(dt)
    if dtmin is None:
        dtmin = 1e-14 * (t1 - t0)

    if tstops is not None:
        # pad with t1 so the searchsorted lookup always lands in-bounds
        tstops = jnp.sort(jnp.concatenate(
            [jnp.asarray(tstops, dtype=jnp.result_type(prob.u0.dtype, jnp.float32)).ravel(),
             jnp.asarray([t1, t1])]
        ))
    from odefilters.callbacks import ContinuousCallback

    ccallback = None
    if isinstance(callback, ContinuousCallback):
        ccallback, callback = callback, None
    sol = _solve_adaptive_jit(
        prob, alg, abstol, reltol, dt0, int(max_steps), int(maxiters),
        dtmin, True, taylor_method, linearize_sol, callback, tstops,
        ccallback,
    )
    if saveat is not None:
        from odefilters.solution import compact_saveat

        sol = compact_saveat(sol, jnp.asarray(saveat))
    return sol
