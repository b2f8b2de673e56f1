"""Fixed-grid EK0 solver on the Kronecker fast path, with its own
smoothing pass and solution type.

Covariance cost is O(q^3) per step independent of d — the backend for the
large-state Brusselator config and the high-throughput ensemble benchmarks
(BASELINE.md #4, #5). Math identical to the dense solver; every covariance
is ``(Lt Lt^T) ⊗ I_d`` throughout (see `odefilters/ops/kron.py`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from odefilters.algorithms import AbstractEK
from odefilters.ops.kron import (
    KronGaussian,
    KronModel,
    kron_attempt_step,
    kron_smooth_step,
    make_kron_model,
)
from odefilters.priors import precond_small
from odefilters.problem import ODEProblem
from odefilters.solution import RETCODE_SUCCESS, DEStats
from odefilters.taylor import taylor_coefficients


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KronProbODESolution:
    """Posterior for EK0-Kronecker solves.

    Mirrors :class:`odefilters.solution.ProbODESolution` but keeps all
    covariances in (q+1, q+1) small-factor form — for d ~ 1e4 the dense
    (N, d, d) projected covariances would be unrepresentable.
    """

    ts: jax.Array            # (N+1,)
    n_steps: jax.Array
    u: jax.Array             # (N+1, d) posterior means
    u_std: jax.Array         # (N+1, d) posterior marginal stds
    x_filt: KronGaussian     # stacked
    x_smooth: KronGaussian
    diffusions: jax.Array
    log_likelihood: jax.Array
    stats: DEStats
    retcode: jax.Array
    prob: ODEProblem
    alg: AbstractEK = dataclasses.field(metadata=dict(static=True))

    @property
    def d(self) -> int:
        return self.u.shape[-1]

    @property
    def q(self) -> int:
        return self.alg.order

    @property
    def retcode_name(self) -> str:
        from odefilters.solution import RETCODE_NAMES

        try:
            return RETCODE_NAMES[int(self.retcode)]
        except Exception:
            return "<traced>"

    def __call__(self, t):
        """Dense output: posterior mean/std of u(t) (vectorized over t)."""
        t_arr = jnp.asarray(t, dtype=self.ts.dtype)
        if t_arr.ndim == 0:
            return _evaluate_one(self, t_arr)
        return jax.vmap(lambda tv: _evaluate_one(self, tv))(t_arr)


def _block_std(chol: jax.Array, mean: jax.Array, block: int = 0) -> jax.Array:
    """Marginal std of one derivative block for every dim.

    ``mean`` is (..., q+1, d). The factor is isotropic (same trailing
    (q+1, q+1), per_dim == False) or per-dimension ((..., d, q+1, q+1)).
    """
    d = mean.shape[-1]
    per_dim = chol.ndim == mean.ndim + 1
    s = jnp.sqrt(jnp.sum(chol[..., block, :] ** 2, axis=-1))
    if per_dim:
        return s  # (..., d)
    return jnp.broadcast_to(s[..., None], s.shape + (d,))


def _sol_u(x: KronGaussian, second_order: bool) -> jax.Array:
    """Projected solution means: block 0, or [u; du] for 2nd-order
    problems (the dense path's SolProj 2nd-order branch, `caches.jl:66`)."""
    if second_order:
        return jnp.concatenate([x.mean[..., 0, :], x.mean[..., 1, :]], axis=-1)
    return x.mean[..., 0, :]


def _sol_u_std(x: KronGaussian, second_order: bool) -> jax.Array:
    if second_order:
        return jnp.concatenate(
            [_block_std(x.chol, x.mean, 0), _block_std(x.chol, x.mean, 1)],
            axis=-1,
        )
    return _block_std(x.chol, x.mean, 0)



def _kron_jac_diag(prob, alg):
    """Resolved (u, p, t) -> (d,) Jacobian diagonal for DiagonalEK1."""
    if not alg.is_diagonal_ek1:
        return None
    from odefilters.jacobians import resolve_jac_diag

    return resolve_jac_diag(prob.f, prob.jac, prob.jac_diag)


@partial(jax.jit, static_argnames=("alg", "n_steps", "taylor_method"))
def _solve_fixed_kron_jit(prob, alg, ts, abstol, reltol, n_steps, taylor_method):
    from odefilters.linalg import highest_precision

    with highest_precision():
        return _solve_fixed_kron_jit_inner(
            prob, alg, ts, abstol, reltol, n_steps, taylor_method
        )


def _solve_fixed_kron_jit_inner(
    prob: ODEProblem,
    alg: AbstractEK,
    ts: jax.Array,
    abstol,
    reltol,
    n_steps: int,
    taylor_method: str,
):
    from odefilters import diffusions as diff

    d = prob.d
    q = alg.order
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    model = make_kron_model(alg, prob.f, d, dtype,
                            second_order=prob.second_order,
                            jac_diag=_kron_jac_diag(prob, alg),
                            mass_diag=_kron_mass_diag(prob, alg, dtype))

    if prob.second_order:
        from odefilters.taylor import taylor_coefficients_2nd

        u0_full = prob.u0.astype(dtype)
        derivs = taylor_coefficients_2nd(
            prob.f, u0_full[:d], u0_full[d:], prob.p, prob.tspan[0], q
        )
    else:
        from odefilters.problem import init_rhs

        tm = taylor_method
        if prob.mass_matrix is not None and tm == "auto":
            tm = "jvp"  # jet has no rules for the DAE RHS's QR solve
        derivs = taylor_coefficients(
            init_rhs(prob), prob.u0.astype(dtype), prob.p, prob.tspan[0], q,
            method=tm,
        )
    m0 = jnp.stack(derivs)  # (q+1, d)
    if alg.diffusionmodel in ("dynamicMV",) or alg.is_diagonal_ek1:
        L0 = jnp.zeros((d, q + 1, q + 1), dtype)
    else:
        L0 = jnp.zeros((q + 1, q + 1), dtype)
    x0 = KronGaussian(m0, L0)
    sigma2_0 = diff.initial_diffusion(alg.diffusionmodel, d, dtype)

    def body(carry, inp):
        x, sigma2, ll, k = carry
        t, dt = inp
        res = kron_attempt_step(
            model, x, x.mean[0], t, dt, sigma2, k, abstol, reltol, prob.p
        )
        ll = ll + res.log_likelihood
        out = (res.x_filt, res.sigma2_global)
        return (res.x_filt, res.sigma2_global, ll, k + 1), out

    dts = ts[1:] - ts[:-1]
    init = (x0, sigma2_0, jnp.zeros((), dtype), jnp.zeros((), jnp.int32))
    (_, sigma2_last, ll, _), (xs, sgs) = jax.lax.scan(body, init, (ts[:-1], dts))

    x_filt = KronGaussian(
        jnp.concatenate([x0.mean[None], xs.mean], axis=0),
        jnp.concatenate([x0.chol[None], xs.chol], axis=0),
    )
    diff_buf = jnp.concatenate([jnp.ones_like(sigma2_0)[None], sgs], axis=0)

    # --- postamble: static recalibration + smoothing ---
    if alg.is_static_diffusion:
        final = sigma2_last
        if final.ndim == 0:
            x_filt = KronGaussian(x_filt.mean, jnp.sqrt(final) * x_filt.chol)
        else:
            # per-dim rescale promotes the factor to (N, d, q+1, q+1)
            # (DiagonalEK1 factors are per-dim already — scale in place)
            L = (x_filt.chol if x_filt.chol.ndim == 4
                 else x_filt.chol[:, None, :, :])
            x_filt = KronGaussian(
                x_filt.mean, jnp.sqrt(final)[None, :, None, None] * L
            )
        diff_buf = jnp.broadcast_to(final, diff_buf.shape).astype(diff_buf.dtype)
        ll = jnp.asarray(jnp.nan, dtype)

    if alg.smooth:
        x_out = _kron_smooth_all(model, x_filt, ts, diff_buf)
    else:
        x_out = x_filt

    n = jnp.asarray(n_steps, jnp.int32)
    stats = DEStats(
        nf=n,
        njacs=n if alg.is_diagonal_ek1 else jnp.zeros((), jnp.int32),
        naccept=n,
        nreject=jnp.zeros((), jnp.int32),
    )
    return KronProbODESolution(
        ts=ts,
        n_steps=n,
        u=_sol_u(x_out, prob.second_order),
        u_std=_sol_u_std(x_out, prob.second_order),
        x_filt=x_filt,
        x_smooth=x_out,
        diffusions=diff_buf,
        log_likelihood=ll,
        stats=stats,
        retcode=jnp.asarray(RETCODE_SUCCESS, jnp.int32),
        prob=prob,
        alg=alg,
    )


def _apply_diff_chol(QLt, sigma2):
    """sqrt(sigma2)-scaled small noise factor; MV promotes to per-dim."""
    if sigma2.ndim == 0:
        return jnp.sqrt(sigma2) * QLt
    return jnp.sqrt(sigma2)[:, None, None] * QLt


def _kron_smooth_all(model: KronModel, x_filt: KronGaussian, ts, diffusions,
                     n_steps=None):
    """Backward RTS pass in small-factor form (mirrors
    `odefilters.smoothing.smooth_all`). ``n_steps`` masks the valid prefix
    for adaptive solves; defaults to the full (fixed) grid."""
    q = model.q
    N1 = ts.shape[0]
    if n_steps is None:
        n_steps = N1 - 1  # fixed grid: every row valid

    x_last = KronGaussian(
        jnp.take(x_filt.mean, n_steps, axis=0),
        jnp.take(x_filt.chol, n_steps, axis=0),
    )

    def sel(pred, a, b):
        return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)

    def body(x_next, i):
        x_i = KronGaussian(x_filt.mean[i], x_filt.chol[i])
        dt = ts[i + 1] - ts[i]
        in_range = (i >= 1) & (i <= n_steps - 1)
        dt_safe = jnp.where(dt > 0, dt, 1.0)
        p, p_inv = precond_small(dt_safe, q)
        At_i, QLt_i = model.transition(dt_safe)
        sigma2 = jnp.take(diffusions, i + 1, axis=0)
        QLt_h = _apply_diff_chol(QLt_i, sigma2)
        xc = KronGaussian(p[:, None] * x_i.mean, _scale_rows(p, x_i.chol))
        xn = KronGaussian(p[:, None] * x_next.mean, _scale_rows(p, x_next.chol))
        xs_p, _ = kron_smooth_step(xc, xn, At_i, QLt_h)
        xs = KronGaussian(
            p_inv[:, None] * xs_p.mean, _scale_rows(p_inv, xs_p.chol)
        )
        out = sel(in_range & (dt > 0), xs, x_i)
        out = sel(in_range & (dt == 0), x_next, out)
        carry = sel(in_range, out, x_next)
        return carry, out

    idxs = jnp.arange(N1 - 2, -1, -1)
    _, outs_rev = jax.lax.scan(body, x_last, idxs)
    outs = jax.tree.map(lambda a: jnp.flip(a, axis=0), outs_rev)
    return KronGaussian(
        jnp.concatenate([outs.mean, x_filt.mean[-1:]], axis=0),
        jnp.concatenate([outs.chol, x_filt.chol[-1:]], axis=0),
    )


def _scale_rows(p, chol):
    """Row-scale small factor(s): shared with the filter step."""
    from odefilters.ops.kron import _unprecond_chol

    return _unprecond_chol(p, chol)


def _evaluate_one(sol: KronProbODESolution, tval):
    """Dense output via small-factor predict/smooth between grid points."""
    from odefilters.ops.kron import kron_smooth_step
    from odefilters.linalg import tril_factor
    from odefilters.priors import transition_precond_small

    q, d = sol.q, sol.d
    dtype = sol.ts.dtype
    ts, n = sol.ts, sol.n_steps

    # clamp below t0; extrapolate from the last state beyond t_end
    tval = jnp.maximum(tval, ts[0])
    i = jnp.clip(jnp.searchsorted(ts, tval, side="right") - 1, 0, n)
    exact = ts[i] == tval
    ii = jnp.clip(i, 0, n)
    sigma2 = jnp.take(sol.diffusions, jnp.minimum(ii + 1, n), axis=0)

    h1 = jnp.maximum(tval - ts[ii], jnp.finfo(dtype).tiny)
    At, QLt = transition_precond_small(sol.alg.prior, q, h1, dtype)
    QLt_h = _apply_diff_chol(QLt, sigma2)
    p1, p1i = precond_small(h1, q)
    xf = KronGaussian(sol.x_filt.mean[ii], sol.x_filt.chol[ii])
    if xf.chol.ndim == 3 and QLt_h.ndim == 2:
        # per-dim factors (DiagonalEK1) with an isotropic diffusion
        QLt_h = jnp.broadcast_to(QLt_h, xf.chol.shape)
    m_p = At @ (p1[:, None] * xf.mean)
    Lt_p = tril_factor(
        jnp.concatenate(
            [
                jnp.swapaxes(At @ _scale_rows(p1, xf.chol), -1, -2),
                jnp.swapaxes(QLt_h, -1, -2),
            ],
            axis=-2,
        )
    )
    pred = KronGaussian(p1i[:, None] * m_p, _scale_rows(p1i, Lt_p))

    if sol.alg.smooth:
        h2 = jnp.maximum(ts[ii + 1] - tval, jnp.finfo(dtype).tiny)
        At2, QLt2 = transition_precond_small(sol.alg.prior, q, h2, dtype)
        QLt2_h = _apply_diff_chol(QLt2, sigma2)
        p2, p2i = precond_small(h2, q)
        xn = KronGaussian(
            sol.x_smooth.mean[jnp.minimum(ii + 1, n)],
            sol.x_smooth.chol[jnp.minimum(ii + 1, n)],
        )
        xc = KronGaussian(p2[:, None] * pred.mean, _scale_rows(p2, pred.chol))
        xn_p = KronGaussian(p2[:, None] * xn.mean, _scale_rows(p2, xn.chol))
        sm, _ = kron_smooth_step(xc, xn_p, At2, QLt2_h)
        sm = KronGaussian(p2i[:, None] * sm.mean, _scale_rows(p2i, sm.chol))
        inside = tval < ts[n]
        pred = jax.tree.map(lambda a, b: jnp.where(inside, a, b), sm, pred)

    stored = KronGaussian(
        (sol.x_smooth if sol.alg.smooth else sol.x_filt).mean[i],
        (sol.x_smooth if sol.alg.smooth else sol.x_filt).chol[i],
    )
    out = jax.tree.map(lambda a, b: jnp.where(exact, a, b), stored, pred)
    so2 = sol.u.shape[-1] == 2 * sol.x_filt.mean.shape[-1]  # 2nd-order sol
    return _sol_u(out, so2), _sol_u_std(out, so2)


def _kron_mass_diag(prob, alg, dtype):
    """Diagonal-mass support on the Kronecker path (DiagonalEK1 only).

    Returns the (d,) mass diagonal or None; raises for configurations the
    per-dim structure cannot absorb (dense M, or EK0/EK1 with any M —
    EK0's shared isotropic covariance breaks under non-uniform rows,
    dense EK1 has no Kron structure at all). Zero diagonal entries state
    index-1 algebraic constraints, handled exactly like the dense path's
    ``z = M E1 x - f`` measurement (step.py:282)."""
    M = getattr(prob, "mass_matrix", None)
    if M is None:
        return None
    M = jnp.asarray(M)
    if M.ndim != 1 or not alg.is_diagonal_ek1:
        raise NotImplementedError(
            "mass-matrix problems on the Kronecker fast path require a "
            "DIAGONAL mass (shape (d,)) and DiagonalEK1; use the dense "
            "solver paths (odefilters.solve / solve_fixed) otherwise"
        )
    return M.astype(dtype)


def solve_fixed_kron(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    dt: Optional[float] = None,
    ts: Optional[jax.Array] = None,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    taylor_method: str = "auto",
) -> KronProbODESolution:
    """Fixed-grid EK0 solve on the Kronecker fast path."""
    if getattr(prob, "mass_matrix", None) is not None:
        # validate eagerly (diagonal + DiagonalEK1 only); used in the jit
        _kron_mass_diag(prob, alg, jnp.float32)
    t0, t1 = prob.tspan
    if ts is None:
        if dt is None:
            raise ValueError("Fixed timestep methods require a choice of dt")
        n = max(int(round(float(t1 - t0) / float(dt))), 1)
        ts = jnp.linspace(t0, t1, n + 1)
    ts = jnp.asarray(ts, dtype=jnp.result_type(prob.u0.dtype, jnp.float32))
    return _solve_fixed_kron_jit(
        prob, alg, ts, abstol, reltol, ts.shape[0] - 1, taylor_method
    )


# --------------------------------------------------------------------------
# Adaptive driver on the Kronecker fast path (EK0, scalar diffusions)
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("alg", "max_steps", "maxiters", "taylor_method"))
def _solve_adaptive_kron_jit(
    prob, alg, abstol, reltol, dt0, max_steps, maxiters, dtmin, taylor_method
):
    from odefilters.linalg import highest_precision

    with highest_precision():
        return _solve_adaptive_kron_impl(
            prob, alg, abstol, reltol, dt0, max_steps, maxiters, dtmin,
            taylor_method,
        )


def _solve_adaptive_kron_impl(
    prob, alg, abstol, reltol, dt0, max_steps, maxiters, dtmin, taylor_method
):
    from odefilters import diffusions as diff
    from odefilters.ops.kron import kron_attempt_step
    from odefilters.solve import (
        QOLDINIT,
        _controller_accept,
        _controller_reject,
    )
    from odefilters.solution import (
        RETCODE_MAXITERS,
        RETCODE_SUCCESS,
        RETCODE_UNSTABLE,
        DEStats,
    )

    d, q = prob.d, alg.order
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    model = make_kron_model(alg, prob.f, d, dtype,
                            second_order=prob.second_order,
                            jac_diag=_kron_jac_diag(prob, alg),
                            mass_diag=_kron_mass_diag(prob, alg, dtype))
    t0, t1 = prob.tspan
    N1 = max_steps + 1

    if prob.second_order:
        from odefilters.taylor import taylor_coefficients_2nd

        u0_full = prob.u0.astype(dtype)
        derivs = taylor_coefficients_2nd(
            prob.f, u0_full[:d], u0_full[d:], prob.p, t0, q
        )
    else:
        from odefilters.problem import init_rhs

        tm = taylor_method
        if prob.mass_matrix is not None and tm == "auto":
            tm = "jvp"
        derivs = taylor_coefficients(
            init_rhs(prob), prob.u0.astype(dtype), prob.p, t0, q, method=tm
        )
    m0 = jnp.stack(derivs)
    if alg.diffusionmodel == "dynamicMV" or alg.is_diagonal_ek1:
        # per-dimension factors from step one (ops/kron.py dynamicMV path)
        L0 = jnp.zeros((d, q + 1, q + 1), dtype)
        L_buf = jnp.zeros((N1, d, q + 1, q + 1), dtype)
    else:
        L0 = jnp.zeros((q + 1, q + 1), dtype)
        L_buf = jnp.zeros((N1, q + 1, q + 1), dtype)
    x0 = KronGaussian(m0, L0)
    sigma2_0 = diff.initial_diffusion(alg.diffusionmodel, d, dtype)

    ts_buf = jnp.full((N1,), jnp.asarray(t1, dtype), dtype).at[0].set(t0)
    m_buf = jnp.zeros((N1, q + 1, d), dtype).at[0].set(m0)
    diff_buf = jnp.ones((N1,) + sigma2_0.shape, dtype)

    beta1, beta2 = alg.beta1, alg.beta2

    carry0 = dict(
        t=jnp.asarray(t0, dtype), dt=jnp.asarray(dt0, dtype), x=x0,
        qold=jnp.asarray(QOLDINIT, dtype), sigma2=sigma2_0,
        ll=jnp.zeros((), dtype), n=jnp.zeros((), jnp.int32),
        iters=jnp.zeros((), jnp.int32), failed=jnp.zeros((), bool),
        stats=DEStats.zeros(),
        ts_buf=ts_buf, m_buf=m_buf, L_buf=L_buf, diff_buf=diff_buf,
    )

    def cond(c):
        return (
            (c["t"] < t1) & (~c["failed"]) & (c["n"] < max_steps)
            & (c["iters"] < maxiters)
        )

    def body(c):
        reach_end = c["t"] + c["dt"] >= t1
        dt_eff = jnp.where(reach_end, t1 - c["t"], c["dt"])
        t_new = jnp.where(reach_end, jnp.asarray(t1, dtype), c["t"] + dt_eff)
        res = kron_attempt_step(
            model, c["x"], c["x"].mean[0], c["t"], dt_eff,
            c["sigma2"], c["n"], abstol, reltol, prob.p,
        )
        EEst = jnp.where(jnp.isfinite(res.err_est), res.err_est, 1e10)
        accept = EEst <= 1.0
        dt_acc, qold_acc = _controller_accept(EEst, c["qold"], dt_eff, beta1, beta2)
        dt_rej = _controller_reject(EEst, dt_eff, beta1)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        failed = (dt_new < dtmin) & ~accept & ~reach_end

        k = c["n"] + 1
        wi = jnp.where(accept, k, N1)
        st = c["stats"]
        return dict(
            t=jnp.where(accept, t_new, c["t"]),
            dt=dt_new,
            x=jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), res.x_filt, c["x"]
            ),
            qold=jnp.where(accept, qold_acc, c["qold"]),
            sigma2=jnp.where(accept, res.sigma2_global, c["sigma2"]),
            ll=jnp.where(accept, c["ll"] + res.log_likelihood, c["ll"]),
            n=jnp.where(accept, k, c["n"]),
            iters=c["iters"] + 1,
            failed=failed | c["failed"],
            stats=DEStats(
                nf=st.nf + 1,
                njacs=st.njacs + (1 if alg.is_diagonal_ek1 else 0),
                naccept=st.naccept + accept.astype(jnp.int32),
                nreject=st.nreject + (~accept).astype(jnp.int32),
            ),
            ts_buf=c["ts_buf"].at[wi].set(t_new, mode="drop"),
            m_buf=c["m_buf"].at[wi].set(res.x_filt.mean, mode="drop"),
            L_buf=c["L_buf"].at[wi].set(res.x_filt.chol, mode="drop"),
            diff_buf=c["diff_buf"].at[wi].set(res.sigma2_global, mode="drop"),
        )

    c = jax.lax.while_loop(cond, body, carry0)
    retcode = jnp.where(
        c["t"] >= t1, RETCODE_SUCCESS,
        jnp.where(c["failed"], RETCODE_UNSTABLE, RETCODE_MAXITERS),
    ).astype(jnp.int32)

    x_filt = KronGaussian(c["m_buf"], c["L_buf"])
    diffs, ll = c["diff_buf"], c["ll"]
    if alg.is_static_diffusion:
        final = c["sigma2"]
        if final.ndim == 0:
            L_cal = jnp.sqrt(final) * x_filt.chol
        else:
            # fixedMV: per-dim rescale promotes (N, q+1, q+1) factors to
            # (N, d, q+1, q+1), as on the fixed-grid path (DiagonalEK1
            # factors are per-dim already — scale in place)
            L = (x_filt.chol if x_filt.chol.ndim == 4
                 else x_filt.chol[:, None, :, :])
            L_cal = jnp.sqrt(final)[None, :, None, None] * L
        x_filt = KronGaussian(x_filt.mean, L_cal)
        diffs = jnp.broadcast_to(final, diffs.shape).astype(diffs.dtype)
        ll = jnp.asarray(jnp.nan, dtype)
    if alg.smooth:
        x_out = _kron_smooth_all(model, x_filt, c["ts_buf"], diffs, c["n"])
    else:
        x_out = x_filt

    return KronProbODESolution(
        ts=c["ts_buf"], n_steps=c["n"],
        u=_sol_u(x_out, prob.second_order),
        u_std=_sol_u_std(x_out, prob.second_order),
        x_filt=x_filt, x_smooth=x_out, diffusions=diffs,
        log_likelihood=ll, stats=c["stats"], retcode=retcode,
        prob=prob, alg=alg,
    )


def solve_adaptive_kron(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    dt: Optional[float] = None,
    max_steps: int = 4096,
    maxiters: int = 100_000,
    dtmin: Optional[float] = None,
    taylor_method: str = "auto",
) -> KronProbODESolution:
    """Adaptive PI-controlled EK0 solve on the Kronecker fast path.

    O(q^3)-per-step covariance cost independent of the ODE dimension: the
    adaptive analogue of :func:`solve_fixed_kron` for large semi-discretized
    PDE states. All EK0 diffusion models, incl. the MV ones (dynamicMV
    carries per-dimension (d, q+1, q+1) factors — O(N d q^2) buffers, so
    prefer scalar models at extreme PDE scale).
    """
    if getattr(prob, "mass_matrix", None) is not None:
        _kron_mass_diag(prob, alg, jnp.float32)  # eager validation
    if alg.is_ek1 and not alg.is_diagonal_ek1:
        raise ValueError(
            "the Kronecker fast path requires EK0 or DiagonalEK1 structure"
        )
    from odefilters.solve import initial_dt

    t0, t1 = prob.tspan
    dt0 = initial_dt(prob, alg.order, abstol, reltol) if dt is None else dt
    if dtmin is None:
        dtmin = 1e-14 * (t1 - t0)
    return _solve_adaptive_kron_jit(
        prob, alg, abstol, reltol, dt0, int(max_steps), int(maxiters),
        dtmin, taylor_method,
    )


# --------------------------------------------------------------------------
# Posterior sampling on the Kronecker path
# --------------------------------------------------------------------------


def sample(key, sol: KronProbODESolution, n: int = 1) -> jax.Array:
    """Joint posterior samples of the solution path, shape (N+1, d, n).

    Kronecker analogue of `odefilters.sampling.sample`
    (`/root/reference/src/solution_sampling.jl`): backward conditioning
    with (q+1)x(q+1) factors; sampling noise is drawn per (block, dim).
    """
    if not sol.alg.smooth:
        raise ValueError("sampling not implemented for non-smoothed posteriors")
    d_state = sol.x_filt.mean.shape[-1]  # true per-block dim (sol.d is 2d
    # for second-order solutions, whose samples expose the u block only)
    return _kron_sample_jit(
        key, sol.ts, sol.x_filt, sol.diffusions, sol.n_steps,
        d_state, sol.q, n, sol.alg.prior,
    )


@partial(jax.jit, static_argnames=("d", "q", "n", "prior"))
def _kron_sample_jit(key, ts, x_filt: KronGaussian, diffusions, n_steps,
                     d: int, q: int, n: int, prior=None):
    from odefilters.priors import transition_precond_small

    dtype = x_filt.mean.dtype
    nq = q + 1
    N1 = ts.shape[0]

    def draw(kk, g: KronGaussian):
        eps = jax.random.normal(kk, (nq, d), dtype)
        if g.chol.ndim == 3:
            # per-dimension factors (MV diffusions): dims are independent
            # (Sigma = sum_j C_j (x) e_j e_j^T), each with its own factor
            return g.mean + jnp.einsum("dij,jd->id", g.chol, eps)
        return g.mean + g.chol @ eps

    key_last, key_scan = jax.random.split(key)
    x_last = KronGaussian(
        jnp.take(x_filt.mean, n_steps, axis=0),
        jnp.take(x_filt.chol, n_steps, axis=0),
    )
    keys_last = jax.random.split(key_last, n)
    last = jax.vmap(lambda kk: draw(kk, x_last))(keys_last)   # (n, nq, d)

    step_keys = jax.random.split(key_scan, N1 - 1)

    def body(carry, inp):
        samp_next = carry                                     # (n, nq, d)
        i, kk = inp
        dt = ts[i + 1] - ts[i]
        in_range = i <= n_steps - 1
        dt_safe = jnp.where(dt > 0, dt, 1.0)
        p, p_inv = precond_small(dt_safe, q)
        # per-interval preconditioned transition (IWP: h-free constants)
        At_i, QLt_i = transition_precond_small(prior, q, dt_safe, dtype)
        sigma2 = jnp.take(diffusions, jnp.minimum(i + 1, n_steps), axis=0)
        QLt_h = _apply_diff_chol(QLt_i, sigma2)
        xf = KronGaussian(
            p[:, None] * x_filt.mean[i], _scale_rows(p, x_filt.chol[i])
        )

        def one(s_next, kk2):
            target = KronGaussian(
                p[:, None] * s_next, jnp.zeros((nq, nq), dtype)
            )
            cond, _ = kron_smooth_step(xf, target, At_i, QLt_h)
            return p_inv[:, None] * draw(kk2, cond)

        keys_n = jax.random.split(kk, n)
        drawn = jax.vmap(one)(samp_next, keys_n)
        out = jnp.where(in_range, drawn, samp_next)
        out = jnp.where(in_range & (dt == 0), samp_next, out)
        return out, out

    idxs = jnp.arange(N1 - 2, -1, -1)
    _, outs_rev = jax.lax.scan(body, last, (idxs, step_keys))
    outs = jnp.flip(outs_rev, axis=0)                         # (N1-1, n, nq, d)
    path = jnp.concatenate([outs, last[None]], axis=0)
    path = path.at[jnp.minimum(n_steps, N1 - 1)].set(last)
    # (N+1, n, nq, d) -> (N+1, d, n) solution block
    return jnp.moveaxis(path[:, :, 0, :], 1, -1)
