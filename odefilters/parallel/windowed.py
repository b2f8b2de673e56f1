"""Windowed iterated time-parallel ODE filtering/smoothing.

The globally-iterated parallel solver (`associative.solve_fixed_parallel`)
relinearizes the WHOLE trajectory every sweep. For EK0 that relinearization
is a Picard map ``u <- smooth(f(u))`` whose contraction constant grows with
the integrated span — measured on FitzHugh-Nagumo over t in [0, 20] it is
non-contractive: the iteration *diverges* at every grid size regardless of
warm start (benchmarks/time_parallel_sweep.json, round-3 analysis). The
reference has no time-parallel solver at all (its hot loop is sequential,
`/root/reference/src/perform_step.jl:27`); the globally-iterated approach
follows the parallel-in-time IEKS literature, which assumes a span short
enough for the iteration to contract.

This module restores contraction *structurally*: partition the N uniform
steps into W windows of M = N/W steps and

1. run the windows SEQUENTIALLY (a `lax.scan`, so the compiled program is
   ONE window reused W times — compile size drops from O(N) to O(M));
2. iterate the linearization *within* each window only, with the incoming
   filtered state held fixed — a Picard/Newton iteration over a span of
   (t1-t0)/W units, contractive for modest W even where the global
   iteration diverges;
3. parallelize inside the window with the same square-root associative
   scans (`associative_sqrt`, optionally the fused Pallas scan kernels of
   `pallas_scan`) — the sequential depth of the whole solve is W * depth
   of one in-window scan, not N;
4. stitch EXACT global fixed-interval smoothing with a cross-window
   backward pass: each window stores its cumulative "map-to-terminal"
   smoothing elements ``x^s_j = g~_j + E~_j x^s_term`` (a reverse
   associative scan of the per-step RTS gain elements), and a cheap
   W-length backward scan applies the incoming smoothed boundary state to
   every stored map at once.

The result matches the sequential filter/smoother to linearization error
(same convergence semantics as the global iterated solver on spans where
that one converges), but converges for EK0 on long spans and compiles in
window-sized programs.

Calibration matches the global path: one static MLE diffusion
``sigma^2 = (1/Nd) sum z_k^T S_k^-1 z_k`` from the final linearization's
innovations (`/root/reference/src/diffusions.jl:11-36` semantics),
accumulated per window during the forward sweep.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from odefilters.algorithms import AbstractEK
from odefilters.linalg import matmul_unrolled as _bmm
from odefilters.linalg import solve_triangular_unrolled
from odefilters.linalg import tril_factor_mgs as tril_factor
from odefilters.parallel.associative_sqrt import (
    _sqrt_smooth_combine,
    parallel_filter_sqrt,
)
from odefilters.priors import precond_full, transition_precond_full
from odefilters.problem import ODEProblem
from odefilters.taylor import taylor_coefficients


def _T(x):
    return jnp.swapaxes(x, -1, -2)


def _suffix_scan_smooth(elems, block):
    """Reverse (suffix) scan of smoothing elements: r_j composes elements
    j..M-1, i.e. maps the window-terminal smoothed state to state j."""
    if isinstance(block, str) and block.startswith("pallas"):
        from odefilters.parallel.pallas_scan import pallas_associative_scan

        return pallas_associative_scan(
            "smooth", elems, reverse=True,
            interpret=block.endswith("interpret"),
        )
    from odefilters.parallel.blocked import blocked_associative_scan

    return blocked_associative_scan(
        _sqrt_smooth_combine, elems, block, reverse=True
    )


@partial(
    jax.jit,
    static_argnames=(
        "alg", "n_windows", "m_steps", "iterations", "taylor_method",
        "block", "has_init",
    ),
)
def _solve_windowed_jit(prob, alg, ts, n_windows, m_steps, iterations,
                        taylor_method, u_init, block, has_init):
    from odefilters.linalg import highest_precision

    with highest_precision():
        return _solve_windowed_inner(
            prob, alg, ts, n_windows, m_steps, iterations, taylor_method,
            u_init, block, has_init,
        )


def _solve_windowed_inner(
    prob: ODEProblem,
    alg: AbstractEK,
    ts: jax.Array,
    n_windows: int,
    m_steps: int,
    iterations: int,
    taylor_method: str,
    u_init,
    block,
    has_init: bool,
):
    d, q = prob.d, alg.order
    D = d * (q + 1)
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    W, M = n_windows, m_steps
    N = W * M

    # Uniform grid: constant preconditioned transition for ANY Gauss-Markov
    # prior (same reasoning as `associative._solve_parallel_jit_inner`).
    h = (ts[-1] - ts[0]) / N
    A, QL = transition_precond_full(alg.prior, d, q, h, dtype)
    p_full, pinv_full = precond_full(h, d, q)
    A_ = jnp.broadcast_to(A, (M, D, D))
    QL_ = jnp.broadcast_to(QL, (M, D, D))

    derivs = taylor_coefficients(
        prob.f, prob.u0.astype(dtype), prob.p, ts[0], q, method=taylor_method
    )
    m0 = p_full * jnp.concatenate(derivs)
    U0 = jnp.zeros((D, D), dtype)

    E0 = jnp.zeros((d, D), dtype).at[:, :d].set(jnp.eye(d, dtype=dtype))
    E1 = jnp.zeros((d, D), dtype).at[:, d : 2 * d].set(jnp.eye(d, dtype=dtype))
    E0p = E0 * pinv_full[None, :]
    E1p = E1 * pinv_full[None, :]

    f_v = jax.vmap(lambda u, t: prob.f(u, prob.p, t))
    if alg.is_diagonal_ek1:
        # J -> diag(J): the dense (N, d, d) element build is unchanged,
        # only the linearization is diagonal (the per-dim structure is NOT
        # exploited here — the time-parallel elements are dense anyway)
        from odefilters.jacobians import resolve_jac_diag

        _jd = resolve_jac_diag(prob.f, prob.jac, prob.jac_diag)
        jac_v = jax.vmap(lambda u, t: jnp.diag(_jd(u, prob.p, t)))
    else:
        jac_v = (
            jax.vmap(lambda u, t: prob.jac(u, prob.p, t))
            if prob.jac is not None
            else jax.vmap(
                lambda u, t: jax.jacfwd(lambda uu: prob.f(uu, prob.p, t))(u)
            )
        )

    def build_elements(u_lin, t_meas):
        fu = f_v(u_lin, t_meas)                            # (M, d)
        if alg.is_ek1:
            J = jac_v(u_lin, t_meas)
            H = E1p[None] - _bmm(J, E0p[None])
            y = fu - _bmm(J, u_lin[..., None])[..., 0]
        else:
            H = jnp.broadcast_to(E1p, (M, d, D))
            y = fu
        return H, y

    t_meas_w = ts[1:].reshape(W, M)
    xs = (t_meas_w,)
    if has_init:
        xs = (t_meas_w, u_init.astype(dtype).reshape(W, M, d))

    def full_sweep(m_in, U_in, u_lin, t_w):
        """One linearize→filter→in-window-smooth sweep; returns everything
        the final pass needs."""
        H, y = build_elements(u_lin, t_w)
        ms, Us = parallel_filter_sqrt(m_in, U_in, A, QL, H, y, block=block)
        # filtered states at local j = 0..M-1 (j=0 is the incoming state)
        mf = jnp.concatenate([m_in[None], ms[:-1]], axis=0)
        Uf = jnp.concatenate([U_in[None], Us[:-1]], axis=0)
        # RTS gain elements j -> j+1 (math of
        # `associative_sqrt.parallel_smoother_sqrt`, no terminal element)
        FUf = _bmm(A_, Uf)
        U_pred = tril_factor(jnp.concatenate([_T(FUf), _T(QL_)], axis=-2))
        CFt = _bmm(Uf, _T(FUf))
        Gt = solve_triangular_unrolled(
            _T(U_pred),
            solve_triangular_unrolled(U_pred, _T(CFt), lower=True),
            lower=False,
        )
        G = _T(Gt)
        g = mf - _bmm(G, _bmm(A_, mf[..., None]))[..., 0]
        I = jnp.eye(D, dtype=dtype)
        P = tril_factor(
            jnp.concatenate(
                [_T(_bmm(I - _bmm(G, A_), Uf)), _T(_bmm(G, QL_))], axis=-2
            )
        )
        # cumulative maps-to-terminal: x^s_j = gc_j + Ec_j x^s_M
        Ec, gc, Pc = _suffix_scan_smooth((G, g, P), block)
        # innovation statistics of THIS linearization (for the global MLE
        # diffusion): z_k = H x_pred - y, S = H P_pred H^T
        m_pred = _bmm(A_, mf[..., None])[..., 0]
        HU = _bmm(H, U_pred)
        S_chol = tril_factor(_T(HU))
        z = _bmm(H, m_pred[..., None])[..., 0] - y
        wvec = solve_triangular_unrolled(S_chol, z[..., None], lower=True)
        stat = jnp.sum(wvec * wvec)
        return ms, Us, Ec, gc, Pc, stat

    def window_body(carry, x):
        m_in, U_in = carry
        t_w = x[0]
        if has_init:
            u_lin = x[1]
        else:
            # constant extrapolation of the incoming solution estimate —
            # O(window-span) initial error, fixed by the inner iteration
            u_in = pinv_full[:d] * m_in[:d]
            u_lin = jnp.broadcast_to(u_in, (M, d))

        def inner(u_lin, _):
            ms, _, Ec, gc, _, _ = full_sweep(m_in, U_in, u_lin, t_w)
            msm = gc + _bmm(Ec, ms[-1][None, :, None])[..., 0]
            u_all = jnp.concatenate([msm[1:], ms[-1:]], axis=0)
            return pinv_full[None, :d] * u_all[:, :d], None

        u_lin, _ = jax.lax.scan(
            inner, u_lin, None, length=max(iterations - 1, 0)
        )
        ms, Us, Ec, gc, Pc, stat = full_sweep(m_in, U_in, u_lin, t_w)
        return (ms[-1], Us[-1]), (Ec, gc, Pc, stat)

    (m_term, U_term), (Ecs, gcs, Pcs, stats) = jax.lax.scan(
        window_body, (m0, U0), xs
    )

    # Cross-window backward smoothing: apply the incoming smoothed boundary
    # state as the terminal suffix element (E=0, g=m_b, P=U_b) of every
    # stored cumulative map — one vmapped combine per window, scanned
    # right-to-left. The new carry is the window's smoothed LEFT boundary
    # (= the previous window's terminal).
    def backward(carry, x):
        m_b, U_b = carry
        Ec, gc, Pc = x
        suffix = (
            jnp.zeros_like(Ec),
            jnp.broadcast_to(m_b, gc.shape),
            jnp.broadcast_to(U_b, Pc.shape),
        )
        _, gs, Ps = jax.vmap(_sqrt_smooth_combine)(suffix, (Ec, gc, Pc))
        return (gs[0], Ps[0]), (gs, Ps)

    _, (gs_all, Ps_all) = jax.lax.scan(
        backward, (m_term, U_term), (Ecs, gcs, Pcs), reverse=True
    )

    ms_s = jnp.concatenate(
        [gs_all.reshape(N, D), m_term[None]], axis=0
    )
    Us_s = jnp.concatenate(
        [Ps_all.reshape(N, D, D), U_term[None]], axis=0
    )

    sigma2 = jnp.sum(stats) / (N * d)
    cov = _bmm(Us_s, _T(Us_s)) * sigma2
    mean_out = pinv_full[None, :] * ms_s
    cov_out = pinv_full[None, :, None] * cov * pinv_full[None, None, :]
    u = mean_out[:, :d]
    u_std = jnp.sqrt(
        jnp.clip(jnp.diagonal(cov_out, axis1=-2, axis2=-1)[:, :d], 0.0)
    )
    return u, u_std, mean_out, cov_out, sigma2
