"""Time-parallel fixed-grid ODE filtering/smoothing via associative scans.

The reference's hot loop is inherently sequential in time
(`/root/reference/src/perform_step.jl:27`, backward pass
`/root/reference/src/smoothing.jl:12-27`). On TPU we replace both with
``lax.associative_scan`` over Sarkka-style conditional-Gaussian elements
(S. Sarkka, A. F. Garcia-Fernandez, "Temporal Parallelization of Bayesian
Smoothers", IEEE TAC 2021; see PAPERS.md), turning N sequential small-matrix
steps into log2(N) rounds of large batched (N, D, D) matmuls that saturate
the MXU.

Because the measurement linearization point of an ODE filter depends on the
(unknown) solution, the parallel solver is *iterated* (parallel IEKS, cf.
Bosch et al., "Parallel-in-time probabilistic numerical ODE solvers"):

    1. initialize a trajectory guess u_k (constant u0, or a coarse solve)
    2. linearize the measurement  0 = E1 x - f(u) at u_k:
       H_k = E1 - J_k E0,  y_k = f(u_k) - J_k u_k   (EK0: J_k = 0)
    3. parallel-filter + parallel-smooth (associative scans)
    4. u_k <- smoothed means; repeat.

Calibration uses the global (static) MLE: covariances are rescaled by
sigma^2 = (1/Nd) sum z_k^T S_k^-1 z_k after the last sweep, matching the
reference's `FixedDiffusion` + postamble recalibration semantics
(`/root/reference/src/diffusions.jl:11-36`,
`/root/reference/src/integrator_utils.jl:4-18`).

This backend works in plain covariance (not square-root) form: the
associative combination needs matrix inverses either way, and on a fixed
preconditioned grid f32/f64 conditioning is benign. Verified against the
sequential square-root path in the test suite.
"""

from __future__ import annotations

import math

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from odefilters.algorithms import AbstractEK
from odefilters.linalg import matmul_unrolled as _bmm
from odefilters.priors import precond_full
from odefilters.problem import ODEProblem
from odefilters.taylor import taylor_coefficients


def _T(x):
    return jnp.swapaxes(x, -1, -2)


def _solve(A, B):
    """A^{-1} B (batched).

    General (possibly non-symmetric) solve used by the element
    *combinations*, where (I + C_i J_j) is not symmetric. Lowered via LU:
    fine on CPU f64 and TPU f32; for f64 on TPU use the square-root
    backend (`sqrt_form=True`), which never hits LU.
    """
    return jnp.linalg.solve(A, B)


def _psd_solve(A, B):
    """A^{-1} B for symmetric PSD A via Cholesky (no LU — CLAUDE.md rule).

    Two batched triangular solves (jax's cho_solve does not broadcast over
    explicit leading batch dimensions).
    """
    from odefilters.linalg import cholesky_psd, solve_triangular_unrolled

    L = cholesky_psd(A)
    B = jnp.broadcast_to(B, A.shape[:-2] + B.shape[-2:])
    y = solve_triangular_unrolled(L, B, lower=True)
    return solve_triangular_unrolled(_T(L), y, lower=False)


# --------------------------------------------------------------------------
# Parallel Kalman filter (Sarkka & Garcia-Fernandez 2021, Lemmas 7-8)
# --------------------------------------------------------------------------


def _filter_element_first(m0, P0, F, Q, H, y):
    """Element e_1: prior pushed through the first transition + update."""
    m_pred = F @ m0
    P_pred = F @ P0 @ _T(F) + Q
    S = H @ P_pred @ _T(H)
    K = _T(_psd_solve(S, H @ P_pred))      # P_pred H^T S^-1
    A = jnp.zeros_like(P_pred)
    b = m_pred + K @ (y - H @ m_pred)
    C = P_pred - K @ S @ _T(K)
    eta = jnp.zeros_like(m0)
    J = jnp.zeros_like(P_pred)
    return A, b, C, eta, J


def _filter_elements_rest(F, Q, H, y):
    """Generic elements e_k, k >= 2 (batched over the time axis)."""
    S = H @ Q @ _T(H)                      # R = 0
    K = _T(_psd_solve(S, H @ Q))           # Q H^T S^-1
    I = jnp.eye(F.shape[-1], dtype=F.dtype)
    IKH = I - K @ H
    A = IKH @ F
    b = (K @ y[..., None])[..., 0]
    C = IKH @ Q
    HtSi = _T(H) @ _psd_solve(S, jnp.eye(S.shape[-1], dtype=F.dtype))
    eta = (_T(F) @ HtSi @ y[..., None])[..., 0]
    J = _T(F) @ HtSi @ H @ F
    return A, b, C, eta, J


def _filter_combine(ei, ej):
    """Associative combination of filtering elements (paper eq. (10))."""
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    D = Ai.shape[-1]
    I = jnp.eye(D, dtype=Ai.dtype)
    # (I + Ci Jj)^-1 applied from the right of Aj: use solves
    M = I + Ci @ Jj
    AjE = _T(_solve(_T(M), _T(Aj)))        # Aj (I + Ci Jj)^-1
    A = AjE @ Ai
    b = (AjE @ (bi[..., None] + Ci @ etaj[..., None]))[..., 0] + bj
    C = AjE @ Ci @ _T(Aj) + Cj
    N = I + Jj @ Ci
    AtiE = _T(_solve(_T(N), Ai))           # Ai^T (I + Jj Ci)^-1
    eta = (AtiE @ (etaj[..., None] - Jj @ bi[..., None]))[..., 0] + etai
    J = AtiE @ Jj @ Ai + Ji
    return A, b, C, eta, J


def parallel_filter(m0, P0, F, Q, H, ys, block=None):
    """All-time filtered means/covs in O(log N) depth.

    Args are batched over time on axis 0 (F, Q may be broadcast from
    constants); returns ``(ms, Ps)`` with shape (N, D) / (N, D, D) for the
    N *post-transition* states x_1..x_N.
    """
    N = ys.shape[0]
    D = m0.shape[-1]
    F_ = jnp.broadcast_to(F, (N, D, D))
    Q_ = jnp.broadcast_to(Q, (N, D, D))
    e_rest = _filter_elements_rest(F_, Q_, H, ys)
    e1 = _filter_element_first(m0, P0, F_[0], Q_[0], H[0], ys[0])
    elems = tuple(
        jnp.concatenate([a[None], rest[1:]], axis=0)
        for a, rest in zip(e1, e_rest)
    )
    from odefilters.parallel.blocked import blocked_associative_scan

    A, b, C, eta, J = blocked_associative_scan(_filter_combine, elems, block)
    return b, C


# --------------------------------------------------------------------------
# Parallel RTS smoother (paper, Section IV)
# --------------------------------------------------------------------------


def _smooth_combine(suffix, elem):
    """Associative combination for the reversed smoothing scan.

    The smoothed state obeys the affine recursion
    ``x^s_k = g_k + E_k x^s_{k+1}``; combining element k with the already-
    combined suffix (k+1..N) composes the maps with k's gain outermost.
    Under ``associative_scan(..., reverse=True)`` the first argument is the
    later-in-time suffix.
    """
    Ea, ga, La = suffix
    Eb, gb, Lb = elem
    E = Eb @ Ea
    g = gb + (Eb @ ga[..., None])[..., 0]
    L = Lb + Eb @ La @ _T(Eb)
    return E, g, L


def parallel_smoother(ms, Ps, F, Q, block=None):
    """Smoothed means/covs from filtered ones, in O(log N) depth."""
    N, D = ms.shape
    F_ = jnp.broadcast_to(F, (N - 1, D, D))
    Q_ = jnp.broadcast_to(Q, (N - 1, D, D))
    # gains for k = 0..N-2 (toward k+1)
    P_pred = F_ @ Ps[:-1] @ _T(F_) + Q_
    G = _T(_psd_solve(P_pred, F_ @ Ps[:-1]))  # P_k F^T P_pred^-1
    g = ms[:-1] - (G @ (F_ @ ms[:-1][..., None]))[..., 0]
    L = Ps[:-1] - G @ F_ @ Ps[:-1]
    # last element: identity-free terminal
    E_last = jnp.zeros((1, D, D), dtype=ms.dtype)
    g_last = ms[-1:][...]
    L_last = Ps[-1:][...]
    E = jnp.concatenate([G, E_last], axis=0)
    gs = jnp.concatenate([g, g_last], axis=0)
    Ls = jnp.concatenate([L, L_last], axis=0)
    from odefilters.parallel.blocked import blocked_associative_scan

    Er, gr, Lr = blocked_associative_scan(
        _smooth_combine, (E, gs, Ls), block, reverse=True
    )
    return gr, Lr


# --------------------------------------------------------------------------
# The iterated parallel ODE filter/smoother
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("alg", "n_steps", "iterations", "taylor_method", "sqrt_form", "time_shard_axis", "block"))
def _solve_parallel_jit(prob, alg, ts, n_steps, iterations, taylor_method,
                        u_init=None, sqrt_form=False, time_shard_axis=None,
                        block=None):
    from odefilters.linalg import highest_precision

    with highest_precision():
        return _solve_parallel_jit_inner(
            prob, alg, ts, n_steps, iterations, taylor_method, u_init,
            sqrt_form, time_shard_axis, block,
        )


def _solve_parallel_jit_inner(
    prob: ODEProblem,
    alg: AbstractEK,
    ts: jax.Array,
    n_steps: int,
    iterations: int,
    taylor_method: str,
    u_init=None,
    sqrt_form: bool = False,
    time_shard_axis=None,
    block=None,
):
    d, q = prob.d, alg.order
    D = d * (q + 1)
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    N = n_steps

    # Uniform-grid preconditioned coordinates: constant A, Q across steps —
    # for ANY Gauss-Markov prior (the step h is the same every interval, so
    # non-IWP preconditioned transitions are constants here too; the
    # matrix-rate IOUP's dimension-coupled transition is likewise one
    # constant dense (D, D) pair via transition_precond_coupled).
    h = (ts[-1] - ts[0]) / N
    from odefilters.priors import IOUP as _IOUP
    from odefilters.priors import normalize_prior as _norm_prior
    from odefilters.priors import transition_precond_full

    _pn = _norm_prior(alg.prior)
    rate_L = None
    jac_rate = isinstance(_pn, _IOUP) and _pn.rate_is_jacobian
    if isinstance(_pn, _IOUP) and _pn.rate_is_matrix:
        rate_L = jnp.asarray(_pn.rate_np, dtype)

    if jac_rate:
        # RosenbrockExpEK: the prior re-linearizes per interval at the
        # interval's LEFT state (dense-path semantics, algorithms.py
        # RosenbrockExpEK) — transitions are (N, D, D) and rebuilt each
        # sweep from the current linearization trajectory; the filter/
        # smoother scans batch over per-step transitions natively.
        A = QL = Qm = None
    else:
        A, QL = transition_precond_full(alg.prior, d, q, h, dtype)
        Qm = QL @ QL.T
    p_full, pinv_full = precond_full(h, d, q)

    derivs = taylor_coefficients(
        prob.f, prob.u0.astype(dtype), prob.p, ts[0], q, method=taylor_method
    )
    m0 = p_full * jnp.concatenate(derivs)      # preconditioned init
    P0 = jnp.zeros((D, D), dtype)

    E0 = jnp.zeros((d, D), dtype).at[:, :d].set(jnp.eye(d, dtype=dtype))
    E1 = jnp.zeros((d, D), dtype).at[:, d : 2 * d].set(jnp.eye(d, dtype=dtype))
    E0p = E0 * pinv_full[None, :]              # E0 P^-1
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

    t_meas = ts[1:]

    def build_elements(u_lin):
        fu = f_v(u_lin, t_meas)                            # (N, d)
        if alg.is_ek1:
            J = jac_v(u_lin, t_meas)                       # (N, d, d)
            H = E1p[None] - _bmm(J, E0p[None])
            y = fu - _bmm(J, u_lin[..., None])[..., 0]
        elif rate_L is not None:
            # ExpEK (EK0 + matrix-rate prior): linearize the measurement
            # with the SAME constant L the prior carries, so the Picard
            # forcing is only the nonlinear remainder g = f - L u. Plain
            # EK0 elements re-inject the stiff linear term as a forcing
            # evaluated at the stale linearization — the global iteration
            # then amplifies by ~||L|| per sweep and diverges (measured:
            # 1e17 after 16 sweeps on the |lambda| = 40 semi-linear
            # oscillator; with the L-linearized elements it contracts at
            # Lip(g) and is seq-accurate after ~4).
            H = jnp.broadcast_to(E1p - rate_L @ E0p, (N, d, D))
            y = fu - u_lin @ rate_L.T
        else:
            H = jnp.broadcast_to(E1p, (N, d, D))
            y = fu
        if time_shard_axis is not None:
            # pin the element time axis to a mesh axis: the associative
            # scans then run as cross-device prefix sums over ICI (the
            # "sequence parallel" axis, SURVEY.md §5)
            from jax.sharding import PartitionSpec as _P

            H = jax.lax.with_sharding_constraint(H, _P(time_shard_axis))
            y = jax.lax.with_sharding_constraint(y, _P(time_shard_axis))
        return H, y

    if u_init is None:
        u_guess = jnp.broadcast_to(prob.u0.astype(dtype), (N, d))
    else:
        u_guess = u_init.astype(dtype)

    def build_transitions(u_lin):
        if not jac_rate:
            return A, QL, Qm
        from odefilters.priors import transition_precond_coupled

        lefts = jnp.concatenate(
            [prob.u0.astype(dtype)[None], u_lin[:-1]], axis=0
        )
        Jk = jac_v(lefts, ts[:-1])                       # (N, d, d)
        Ak, QLk = jax.vmap(
            lambda Jm: transition_precond_coupled(Jm, d, q, h, dtype)
        )(Jk)
        return Ak, QLk, _bmm(QLk, _T(QLk))

    if sqrt_form:
        from odefilters.parallel.associative_sqrt import (
            parallel_filter_sqrt,
            parallel_smoother_sqrt,
        )

        def run_filter_smoother(H, y, A_, QL_, Qm_):
            ms, Us = parallel_filter_sqrt(m0, P0, A_, QL_, H, y, block=block)
            ms_s, Us_s = parallel_smoother_sqrt(
                jnp.concatenate([m0[None], ms], axis=0),
                jnp.concatenate([P0[None], Us], axis=0),
                A_, QL_, block=block,
            )
            Ps = _bmm(Us, _T(Us))
            Ps_s = _bmm(Us_s, _T(Us_s))
            return ms, Ps, ms_s, Ps_s
    else:
        def run_filter_smoother(H, y, A_, QL_, Qm_):
            ms, Ps = parallel_filter(m0, P0, A_, Qm_, H, y, block=block)
            ms_s, Ps_s = parallel_smoother(
                jnp.concatenate([m0[None], ms], axis=0),
                jnp.concatenate([P0[None], Ps], axis=0),
                A_, Qm_, block=block,
            )
            return ms, Ps, ms_s, Ps_s

    def sweep(u_lin, _):
        H, y = build_elements(u_lin)
        A_, QL_, Qm_ = build_transitions(u_lin)
        _, _, ms_s, _ = run_filter_smoother(H, y, A_, QL_, Qm_)
        u_new = pinv_full[None, :d] * ms_s[1:, :d]
        return u_new, None

    u_lin, _ = jax.lax.scan(sweep, u_guess, None, length=max(iterations - 1, 0))

    # Final sweep keeps the full posterior + calibration statistics.
    H, y = build_elements(u_lin)
    A, QL, Qm = build_transitions(u_lin)
    ms, Ps, ms_s, Ps_s = run_filter_smoother(H, y, A, QL, Qm)
    ms_all = jnp.concatenate([m0[None], ms], axis=0)
    Ps_all = jnp.concatenate(
        [jnp.zeros((1,) + Ps.shape[1:], Ps.dtype), Ps], axis=0
    )

    # Global MLE diffusion from the innovations of the final linearization:
    # z_k = H x_pred - y, S_k = H P_pred H^T (sigma^2=1 coordinates).
    A_b = A if jac_rate else A[None]
    Qm_b = Qm if jac_rate else Qm[None]
    m_pred = _bmm(A_b, ms_all[:-1][..., None])[..., 0]
    P_pred = _bmm(_bmm(A_b, Ps_all[:-1]), _T(A_b)) + Qm_b
    z = _bmm(H, m_pred[..., None])[..., 0] - y
    S = _bmm(_bmm(H, P_pred), _T(H))
    sigma2 = jnp.mean(
        jnp.sum(z * _psd_solve(S, z[..., None])[..., 0], axis=-1)
    ) / d

    Ps_cal = sigma2 * Ps_s
    # back to unpreconditioned coordinates
    mean_out = pinv_full[None, :] * ms_s
    cov_out = pinv_full[None, :, None] * Ps_cal * pinv_full[None, None, :]
    u = mean_out[:, :d]
    u_std = jnp.sqrt(
        jnp.clip(jnp.diagonal(cov_out, axis1=-2, axis2=-1)[:, :d], 0.0)
    )
    return u, u_std, mean_out, cov_out, sigma2


@partial(jax.jit, static_argnames=("n_c", "q_c", "t0f", "t1f", "pallas"))
def _warm_start_jit(prob, ts, n_c, q_c, t0f, t1f, pallas):
    """Coarse-solve + interp warm start, jitted once per configuration.

    (An eager version re-traced the fused coarse kernel every call —
    closure identities defeat the jit cache — costing ~2 s of remote
    dispatch per solve; one jit makes it ~1 ms.)
    """
    ts_c = jnp.linspace(t0f, t1f, n_c + 1, dtype=ts.dtype)
    if pallas:
        # ADAPTIVE coarse solve (per-lane adaptive kernel, one problem
        # broadcast over a block): internal step control keeps the coarse
        # trajectory stable at ANY coarsening — a fixed-grid coarse solve
        # blows up once the coarsened step exceeds the dynamics' limit —
        # and the save grid is exactly the uniform ts_c.
        from odefilters.ops.pallas_kernels import solve_adaptive_pallas_single

        us_c = solve_adaptive_pallas_single(
            prob.f, prob.u0.astype(jnp.float32),
            jnp.atleast_1d(prob.p).astype(jnp.float32),
            (t0f, t1f), n_c, q=q_c, abstol=1e-6, reltol=1e-3,
        )[0]
        coarse_u = us_c.astype(ts.dtype)               # (n_c+1, d)
    else:
        from odefilters.algorithms import EK0
        from odefilters.kronsolve import solve_fixed_kron

        coarse_u = solve_fixed_kron(
            prob, EK0(order=q_c, smooth=True), ts=ts_c
        ).u
    u_init = jax.vmap(
        lambda tv: jnp.stack(
            [jnp.interp(tv, ts_c, coarse_u[:, i]) for i in range(prob.d)]
        )
    )(ts[1:])
    # The fixed-grid coarse solve can legitimately blow up when the
    # coarsened step is too large for the dynamics (FHN needs h <~ 0.04:
    # a 20/512 grid is fine, 20/128 overflows) — sometimes to huge
    # FINITE values rather than NaN/Inf. A poisoned warm start wrecks
    # every sweep — fall back to the constant-u0 start pointwise for
    # non-finite or outrageously scaled entries.
    u0_row = jnp.broadcast_to(prob.u0.astype(u_init.dtype), u_init.shape)
    scale = 1.0 + jnp.max(jnp.abs(prob.u0)).astype(u_init.dtype)
    bad = ~jnp.isfinite(u_init) | (jnp.abs(u_init) > 1e6 * scale)
    return jnp.where(bad, u0_row, u_init)


def solve_fixed_parallel(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    dt: Optional[float] = None,
    ts: Optional[jax.Array] = None,
    iterations: int = 4,
    taylor_method: str = "auto",
    warm_start: Optional[int] = None,
    sqrt_form: bool = True,
    time_shard_axis: Optional[str] = None,
    block: Optional[int] = None,
    windows: Optional[int] = None,
):
    """Time-parallel fixed-grid solve (uniform grid).

    Returns ``(u, u_std, state_means, state_covs, sigma2)`` — posterior
    means/stds at the grid, full smoothed states, and the calibrated global
    diffusion. Select this backend for long fixed grids where log-depth
    beats the sequential scan.

    ``warm_start`` (coarse-grid factor) defaults to 8 for EK0 — its
    linearization iteration is Picard-type (linear convergence, ~25-30
    cold-start sweeps), and a coarse sequential warm start cuts that to
    ~4-6. EK1 iterates Newton-type and defaults to no warm start. Pass 0
    to disable.

    ``sqrt_form=True`` (default) runs the square-root associative elements
    — exact vs the covariance form and the only f32-stable choice on TPU
    (plain-covariance RTS smoothing NaNs in f32; CLAUDE.md). The
    covariance form (``sqrt_form=False``) also routes its element
    combinations through LU, which has no f64 lowering on TPU — use it for
    CPU/f64 cross-checks only. The grid must be *uniform* (constant
    preconditioned transition per step). Generalized priors (IOUP/Matern)
    are supported: on a uniform grid their preconditioned transition is a
    constant too, so the associative elements are unchanged (the EK0 warm
    start runs its coarse Kronecker solve with the IWP prior — it only
    seeds the linearization trajectory). Matrix-rate priors run too:
    ExpEK's coupled transition is one constant dense (D, D) pair here,
    with the measurement elements linearized at the SAME constant L the
    prior carries (plain EK0 elements re-inject the stiff linear term as
    stale forcing and the global iteration diverges — so the converged
    solution is the L-semi-implicit smoother, more accurate than the
    sequential EK0-linearized ExpEK); RosenbrockExpEK rebuilds per-
    interval transitions each sweep from the linearization trajectory.

    ``windows=W`` switches to the WINDOWED iterated solver
    (`parallel.windowed`): N/W-step windows run sequentially (one
    window-sized compiled program), the linearization iterates within each
    window, and the associative scans parallelize inside it. Use it for
    EK0 on long spans — the global Picard relinearization diverges there
    (measured: FHN t=[0,20] at every N) while the windowed one contracts —
    and wherever global-program compile time is the binding cost. Requires
    ``sqrt_form=True`` and no ``time_shard_axis``.
    """
    if getattr(prob, "mass_matrix", None) is not None:
        raise NotImplementedError(
            "mass-matrix problems are supported on the dense solver paths "
            "(odefilters.solve / solve_fixed) only"
        )
    t0, t1 = prob.tspan
    if ts is None:
        if dt is None:
            raise ValueError("solve_fixed_parallel requires dt or ts")
        n = max(int(round(float(t1 - t0) / float(dt))), 1)
        ts = jnp.linspace(t0, t1, n + 1)
    ts = jnp.asarray(ts, dtype=jnp.result_type(prob.u0.dtype, jnp.float32))
    import numpy as _np

    ts_np = _np.asarray(ts)
    dts = _np.diff(ts_np)
    if not _np.allclose(dts, dts[0], rtol=1e-6):
        raise ValueError(
            "solve_fixed_parallel requires a uniform grid (constant "
            "preconditioned transition per step); use solve_fixed / "
            "solve_fixed_kron for non-uniform grids"
        )

    if windows:
        return _solve_windowed(
            prob, alg, ts, int(windows), int(iterations), taylor_method,
            warm_start, sqrt_form, time_shard_axis, block,
        )

    # resolve the scan backend first (the warm-start default depends on it)
    if isinstance(block, str) and block.startswith("pallas"):
        if not sqrt_form:
            raise ValueError(
                "block='pallas' runs the square-root fused scan kernels; "
                "pass sqrt_form=True (the covariance form is CPU-only)"
            )
        if time_shard_axis is not None:
            raise ValueError(
                "block='pallas' is single-device; sharded time axes use "
                "the plain XLA scan (its rounds partition over the mesh)"
            )
    if block is None and time_shard_axis is None:
        if sqrt_form and jax.default_backend() != "cpu" and ts.shape[0] > 1024:
            # On an accelerator the fused Pallas scan kernels are the
            # default at large N: ~2.5 ms per scan at N=4096..16384 and
            # nearly N-independent (the XLA blocked scan is 20..220 ms
            # there), measured 2.6x/10.7x end-to-end vs the sequential
            # solve. Pass block=0/int to force the XLA scans.
            block = "pallas"
        else:
            # blocked hybrid scan by default at large N: O(2N) combine
            # work instead of O(N log N), and a compile-size win (one
            # scan body vs log2 N unrolled wide rounds). Sharded time
            # axes keep the plain scan — its rounds partition over the
            # mesh axis. Pass block=0 to force the plain scan.
            from odefilters.parallel.blocked import auto_block

            block = auto_block(ts.shape[0] - 1)
    if not block:
        block = None

    pallas_path = isinstance(block, str) and block == "pallas"
    on_accel = jax.default_backend() != "cpu"
    if warm_start is None:
        # Warm start defaults ON where the coarse solve is trustworthy:
        # on an accelerator it runs the ADAPTIVE Pallas kernel (stable at
        # any coarsening), and the EK0 Picard iteration needs it (its
        # cold start takes ~25-30 sweeps). On CPU the only coarse solver
        # is the fixed-grid Kron scan, which can blow up to finite
        # garbage once the coarsened step passes the dynamics' stability
        # limit (measured: FHN h >= ~0.15), so cold start stays the EK1
        # default there — short-span/CPU configs converge in a handful of
        # Newton sweeps.
        # DiagonalEK1's off-diagonal couplings relinearize Picard-like
        # (linear convergence, like EK0) — warm-start it too
        warm_start = 8 if (
            pallas_path or on_accel or not alg.is_ek1 or alg.is_diagonal_ek1
        ) else 0
    u_init = None
    if warm_start:
        # Warm-start the linearization trajectory from a cheap coarse-grid
        # solve, linearly interpolated onto the fine grid. Without it the
        # iteration starts from a constant-u0 trajectory, and neither the
        # Picard-type EK0 iteration nor the Newton-type EK1 one converges
        # in a handful of sweeps over long spans (measured: FHN t=[0,20],
        # iterations=4 cold leaves O(1) solution error at EVERY N; warm
        # 2 sweeps reach the sequential solve).
        ts_f = _np.asarray(ts)
        n_c = max(int(math.ceil((ts.shape[0] - 1) / int(warm_start))), 1)
        t0f, t1f = float(ts_f[0]), float(ts_f[-1])
        q_c = min(alg.order, 3)
        if pallas_path or on_accel:
            # On an accelerator the coarse solve runs through the
            # ADAPTIVE Pallas kernel (one problem broadcast over a lane
            # block) regardless of the scan backend: the XLA Kron scan
            # costs a multi-minute remote compile for a ~1 ms warm
            # start, and a fixed-grid coarse solve is unstable at large
            # coarsening (round-3 sweep: the N=1024 XLA row's Kron warm
            # start at h=0.156 seeded finite garbage under the 1e6
            # guard and left the sweep unconverged, max_diff 4.5).
            # Falls back to the Kron scan for vector fields the kernels
            # cannot trace.
            try:
                u_init = _warm_start_jit(prob, ts, n_c, q_c, t0f, t1f, True)
            except Exception:
                u_init = None
        if u_init is None:
            u_init = _warm_start_jit(prob, ts, n_c, q_c, t0f, t1f, False)
    return _solve_parallel_jit(
        prob, alg, ts, ts.shape[0] - 1, int(iterations), taylor_method,
        u_init, bool(sqrt_form), time_shard_axis, block,
    )


def _solve_windowed(prob, alg, ts, windows, iterations, taylor_method,
                    warm_start, sqrt_form, time_shard_axis, block):
    """Resolve the windowed solver's config (block/warm-start against the
    WINDOW length, not N) and dispatch to `parallel.windowed`."""
    if not sqrt_form:
        raise ValueError(
            "windows= runs the square-root windowed solver; the "
            "covariance form (sqrt_form=False) has no windowed path"
        )
    if time_shard_axis is not None:
        raise ValueError(
            "windows= processes windows sequentially; a sharded time "
            "axis needs the global solver (windows=None)"
        )
    n = ts.shape[0] - 1
    W = int(windows)
    if n % W:
        raise ValueError(
            f"windows={W} must divide the number of grid steps ({n})"
        )
    M = n // W
    on_accel = jax.default_backend() != "cpu"
    if block is None:
        if on_accel and M >= 1024:
            block = "pallas"
        else:
            from odefilters.parallel.blocked import auto_block

            block = auto_block(M)
    if not block:
        block = None

    if warm_start is None:
        # the in-window constant-extrapolation start already contracts;
        # a global coarse warm start (adaptive kernel) still saves a
        # sweep or two on an accelerator, where it is trustworthy+cheap
        warm_start = 8 if on_accel else 0
    u_init = None
    if warm_start:
        import numpy as _np

        ts_f = _np.asarray(ts)
        n_c = max(int(math.ceil(n / int(warm_start))), 1)
        t0f, t1f = float(ts_f[0]), float(ts_f[-1])
        q_c = min(alg.order, 3)
        if on_accel:
            try:
                u_init = _warm_start_jit(prob, ts, n_c, q_c, t0f, t1f, True)
            except Exception:
                u_init = None
        if u_init is None:
            u_init = _warm_start_jit(prob, ts, n_c, q_c, t0f, t1f, False)

    from odefilters.parallel.windowed import _solve_windowed_jit

    return _solve_windowed_jit(
        prob, alg, ts, W, M, int(iterations), taylor_method, u_init,
        block, u_init is not None,
    )
