"""Square-root time-parallel Kalman filtering/smoothing.

The covariance-based parallel scans (`associative.py`) mirror Sarkka &
Garcia-Fernandez directly but inherit the usual f32 fragility of plain
covariance recursions. This module re-derives the associative elements in
*square-root* form (cf. "Parallel-in-Time Kalman Smoothing Using Orthogonal
Transformations", PAPERS.md): every PSD quantity is carried as a factor,
every combination is one QR of stacked factors plus Woodbury solves against
small triangular matrices — f32-stable on TPU.

Filtering element: ``(A, b, U, eta, Z)`` with ``C = U U^T``, ``J = Z Z^T``
(same five-tuple semantics as the covariance version). Combination uses

    (I + C1 J2)^-1      = I - U1 (I + W W^T)^-1 W Z2^T,   W = U1^T Z2
    (I + C1 J2)^-1 C1   = V1 V1^T,   V1 = U1 Lw^-T,  Lw = chol(I + W W^T)
    (I + J2 C1)^-1 J2   = V2 V2^T,   V2 = Z2 Lv^-T,  Lv = chol(I + W^T W)

so the combined factors are QRs of two-block stacks.

Smoothing element: ``(E, g, P)`` with the covariance carried as a factor;
combination re-factorizes ``[P_b^T ; (E_b P_a)^T]``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Unrolled MGS factorization and substitution instead of Householder QR /
# TriangularSolve: on TPU each jnp.linalg.qr or solve_triangular instance
# is a serial loop nest with dynamic slices that costs the compiler
# seconds and runs latency-bound at these (K, D~8) sizes — the combines
# below instantiate dozens of them per associative round. Identical
# contracts (match the scipy/QR paths to roundoff; see linalg).
from odefilters.linalg import matmul_unrolled as _bmm
from odefilters.linalg import solve_triangular_unrolled
from odefilters.linalg import tril_factor_mgs as tril_factor


def solve_triangular(A, B, lower=True):
    return solve_triangular_unrolled(A, B, lower=lower)


def _T(x):
    return jnp.swapaxes(x, -1, -2)


def _chol_of_I_plus_MMt(M):
    """Triangular factor of ``I + M M^T`` via QR of ``[M^T ; I]``."""
    D = M.shape[-2]
    I = jnp.broadcast_to(jnp.eye(D, dtype=M.dtype), M.shape[:-2] + (D, D))
    return tril_factor(jnp.concatenate([_T(M), I], axis=-2))


def _rsolve_lt(X, L):
    """``X @ L^-T`` for lower-triangular L (right triangular solve)."""
    return _T(solve_triangular(L, _T(X), lower=True))


# --------------------------------------------------------------------------
# Filtering
# --------------------------------------------------------------------------


def sqrt_filter_elements_rest(F, QL, H, y):
    """Generic square-root elements e_k (k >= 2), batched over time.

    With R = 0: ``S = (H QL)(H QL)^T``, ``K = Q H^T S^-1``,
    ``C = (I - K H) Q`` with exact factor ``(I - K H) QL``,
    ``Z = F^T H^T S_chol^-T`` (rank d, zero-padded to D columns).
    """
    D = F.shape[-1]
    d = H.shape[-2]
    HQ = _bmm(H, QL)                          # (N, d, D)
    S_chol = tril_factor(_T(HQ))              # (N, d, d)
    # K = QL (H QL)^T S^-1
    QHt = _bmm(QL, _T(HQ))                    # (N, D, d)
    Kt = solve_triangular(
        _T(S_chol),
        solve_triangular(S_chol, _T(QHt), lower=True),
        lower=False,
    )                                          # (N, d, D) = K^T
    K = _T(Kt)
    I = jnp.eye(D, dtype=F.dtype)
    IKH = I - _bmm(K, H)
    A = _bmm(IKH, F)
    b = _bmm(K, y[..., None])[..., 0]
    U = _bmm(IKH, QL)                          # exact factor of (I-KH)Q
    # eta = F^T H^T S^-1 y ; Z = F^T H^T S_chol^-T
    FtHt = _bmm(_T(F), _T(H))                  # (N, D, d)
    Z_thin = _rsolve_lt(FtHt, S_chol)          # (N, D, d)
    eta = _bmm(
        Z_thin, solve_triangular(S_chol, y[..., None], lower=True)
    )[..., 0]
    Z = jnp.concatenate(
        [Z_thin, jnp.zeros(Z_thin.shape[:-1] + (D - d,), F.dtype)], axis=-1
    )
    return A, b, U, eta, Z


def sqrt_filter_element_first(m0, U0, F, QL, H, y):
    """First element: prior through the transition, then a sqrt update."""
    D = m0.shape[-1]
    m_pred = _bmm(F, m0[..., None])[..., 0]
    U_pred = tril_factor(jnp.concatenate([_T(_bmm(F, U0)), _T(QL)], axis=-2))
    HU = _bmm(H, U_pred)
    S_chol = tril_factor(_T(HU))
    PHt = _bmm(U_pred, _T(HU))
    Kt = solve_triangular(
        _T(S_chol), solve_triangular(S_chol, _T(PHt), lower=True), lower=False
    )
    K = _T(Kt)
    A = jnp.zeros((D, D), m0.dtype)
    b = m_pred + _bmm(K, (y - _bmm(H, m_pred[..., None])[..., 0])[..., None])[..., 0]
    I = jnp.eye(D, dtype=m0.dtype)
    U = _bmm(I - _bmm(K, H), U_pred)           # exact Joseph factor (R=0)
    eta = jnp.zeros_like(m0)
    Z = jnp.zeros((D, D), m0.dtype)
    return A, b, U, eta, Z


def _sqrt_filter_combine(ei, ej):
    """Square-root associative combination."""
    Ai, bi, Ui, etai, Zi = ei
    Aj, bj, Uj, etaj, Zj = ej
    D = Ai.shape[-1]
    W = _T(Ui) @ Zj                            # (..., D, D)
    Lw = _chol_of_I_plus_MMt(W)                # chol(I + W W^T)
    Lv = _chol_of_I_plus_MMt(_T(W))            # chol(I + W^T W)

    # T(x) = (I + Ci Jj)^-1 x = x - Ui (LwLw^T)^-1 W (Zj^T x)
    def Tmul(X):
        ZtX = _T(Zj) @ X
        inner = solve_triangular(
            _T(Lw), solve_triangular(Lw, W @ ZtX, lower=True), lower=False
        )
        return X - Ui @ inner

    AjT = Aj @ Tmul(jnp.broadcast_to(jnp.eye(D, dtype=Ai.dtype), Ai.shape))
    A = AjT @ Ai
    b = (
        AjT @ (bi[..., None] + Ui @ (_T(Ui) @ etaj[..., None]))
    )[..., 0] + bj
    V1 = _rsolve_lt(Ui, Lw)                    # factor of (I+CiJj)^-1 Ci
    U = tril_factor(
        jnp.concatenate([_T(Aj @ V1), _T(Uj)], axis=-2)
    )
    # eta/J side: (I + Jj Ci)^-1 Jj = V2 V2^T with V2 = Zj Lv^-T
    V2 = _rsolve_lt(Zj, Lv)
    # eta = Ai^T (I + Jj Ci)^-1 (etaj - Jj bi) + etai
    #     = Ai^T [ (etaj - Jj bi) - Zj (LvLv^T)^-1 W^T Ui^T (etaj - Jj bi) ]
    r = etaj[..., None] - Zj @ (_T(Zj) @ bi[..., None])
    UtR = _T(Ui) @ r
    inner = solve_triangular(
        _T(Lv), solve_triangular(Lv, _T(W) @ UtR, lower=True), lower=False
    )
    eta = (_T(Ai) @ (r - Zj @ inner))[..., 0] + etai
    Z = tril_factor(
        jnp.concatenate([_T(_T(Ai) @ V2), _T(Zi)], axis=-2)
    )
    return A, b, U, eta, Z


def parallel_filter_sqrt(m0, U0, F, QL, H, ys, block=None):
    """All-time filtered means + covariance *factors*, log-depth.

    Square-root counterpart of ``associative.parallel_filter``; returns
    ``(ms, Us)`` with ``C_k = U_k U_k^T``. ``block``: chunk length for the
    blocked hybrid scan (`parallel.blocked`) — cuts the O(N log N) combine
    work and the minutes-long large-N compile; None = plain scan.
    """
    N = ys.shape[0]
    D = m0.shape[-1]
    F_ = jnp.broadcast_to(F, (N, D, D))
    QL_ = jnp.broadcast_to(QL, (N, D, D))
    e_rest = sqrt_filter_elements_rest(F_, QL_, H, ys)
    e1 = sqrt_filter_element_first(m0, U0, F_[0], QL_[0], H[0], ys[0])
    elems = tuple(
        jnp.concatenate([a[None], rest[1:]], axis=0)
        for a, rest in zip(e1, e_rest)
    )
    if isinstance(block, str) and block.startswith("pallas"):
        from odefilters.parallel.pallas_scan import pallas_associative_scan

        _, b, U, _, _ = pallas_associative_scan(
            "filter", elems, interpret=block.endswith("interpret")
        )
        return b, U
    from odefilters.parallel.blocked import blocked_associative_scan

    A, b, U, eta, Z = blocked_associative_scan(
        _sqrt_filter_combine, elems, block
    )
    return b, U


# --------------------------------------------------------------------------
# Smoothing
# --------------------------------------------------------------------------


def _sqrt_smooth_combine(suffix, elem):
    Ea, ga, Pa = suffix
    Eb, gb, Pb = elem
    E = Eb @ Ea
    g = gb + (Eb @ ga[..., None])[..., 0]
    P = tril_factor(jnp.concatenate([_T(Pb), _T(Eb @ Pa)], axis=-2))
    return E, g, P


def parallel_smoother_sqrt(ms, Us, F, QL, block=None):
    """Smoothed means + covariance factors from filtered ones, log-depth.

    Per-element: predicted factor by QR, gain by two triangular solves,
    element covariance by the Joseph 2-block QR
    ``[(I - G F) U_f | G QL]`` (cf. `/root/reference/src/smoothing.jl:53-56`).
    """
    N, D = ms.shape
    F_ = jnp.broadcast_to(F, (N - 1, D, D))
    QL_ = jnp.broadcast_to(QL, (N - 1, D, D))
    Uf = Us[:-1]
    FUf = _bmm(F_, Uf)
    U_pred = tril_factor(
        jnp.concatenate([_T(FUf), _T(QL_)], axis=-2)
    )
    # G = C_f F^T Cp^-1
    CFt = _bmm(Uf, _T(FUf))
    Gt = solve_triangular(
        _T(U_pred),
        solve_triangular(U_pred, _T(CFt), lower=True),
        lower=False,
    )
    G = _T(Gt)
    g = ms[:-1] - _bmm(G, _bmm(F_, ms[:-1][..., None]))[..., 0]
    I = jnp.eye(D, dtype=ms.dtype)
    P = tril_factor(
        jnp.concatenate([_T(_bmm(I - _bmm(G, F_), Uf)), _T(_bmm(G, QL_))], axis=-2)
    )
    E = jnp.concatenate([G, jnp.zeros((1, D, D), ms.dtype)], axis=0)
    gs = jnp.concatenate([g, ms[-1:]], axis=0)
    Ps = jnp.concatenate([P, Us[-1:]], axis=0)
    if isinstance(block, str) and block.startswith("pallas"):
        from odefilters.parallel.pallas_scan import pallas_associative_scan

        _, gr, Pr = pallas_associative_scan(
            "smooth", (E, gs, Ps), reverse=True,
            interpret=block.endswith("interpret"),
        )
        return gr, Pr
    from odefilters.parallel.blocked import blocked_associative_scan

    Er, gr, Pr = blocked_associative_scan(
        _sqrt_smooth_combine, (E, gs, Ps), block, reverse=True
    )
    return gr, Pr
