"""Square-root Kalman filtering/smoothing kernels (the math core, L2).

TPU-native replacement for `/root/reference/src/filtering.jl` and the
per-interval smoother step of `/root/reference/src/smoothing.jl:31-63`.

Everything here is a pure function over :class:`~odefilters.linalg.Gaussian`
square-root states; there are no in-place variants (JAX is functional) and
no Cholesky-vs-QR branching (`filtering.jl:36-47` — we always QR, which is
branch-free, vmap-safe and maps onto batched Householder on TPU).

All kernels broadcast over leading batch dimensions and are `vmap`-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from odefilters.linalg import (
    Gaussian,
    cholesky_psd,
    gaussian_logpdf_zero,
    qr_stack2,
    qr_stack3,
    tril_factor,
)


def _T(x):
    return jnp.swapaxes(x, -1, -2)


def predict_mean(m: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """``m_pred = A m`` (`/root/reference/src/filtering.jl:22-25`)."""
    return jnp.einsum("...ij,...j->...i", A, m)


def predict_chol(L: jnp.ndarray, A: jnp.ndarray, QL: jnp.ndarray) -> jnp.ndarray:
    """Factor of ``A Sigma A^T + Q`` via one QR of the stacked factors.

    Square-root covariance prediction
    (`/root/reference/src/filtering.jl:33-48`), minus the Cholesky-first
    fallback: QR of ``[ (A L)^T ; QL^T ]`` is the single always-valid path.
    """
    return qr_stack2(A @ L, QL)


def predict(x: Gaussian, A: jnp.ndarray, QL: jnp.ndarray) -> Gaussian:
    """Kalman PREDICT (`/root/reference/src/filtering.jl:17-60`)."""
    return Gaussian(predict_mean(x.mean, A), predict_chol(x.chol, A, QL))


def update(x_pred: Gaussian, z: jnp.ndarray, H: jnp.ndarray) -> tuple[Gaussian, jnp.ndarray]:
    """Kalman UPDATE with zero measurement noise (R = 0), Joseph form.

    Conditions ``x_pred`` on the observation ``0 = z`` with Jacobian ``H``:

        S = H Sigma H^T,  K = Sigma H^T S^{-1}
        m_out = m_pred - K z
        L_out = (I - K H) L_pred      (exact Joseph square root when R = 0)

    Returns ``(x_filt, S_chol)`` where ``S_chol`` is the triangular factor
    of the innovation covariance (for likelihoods and calibration).
    Reference: `/root/reference/src/filtering.jl:79-102` (R = 0 asserted at
    `:81`; here R = 0 is baked into the signature).
    """
    L = x_pred.chol
    Z = H @ L                                  # (..., d, D): factor of S
    S_chol = tril_factor(_T(Z))                # (..., d, d)
    # K = Sigma H^T S^-1 = (L Z^T) S^-1 via two triangular solves, which
    # (unlike jax.scipy cho_solve) broadcast over leading batch dims.
    LZt = L @ _T(Z)                            # (..., D, d)
    W = solve_triangular(S_chol, _T(LZt), lower=True)
    K = _T(solve_triangular(_T(S_chol), W, lower=False))  # (..., D, d)
    m_out = x_pred.mean - jnp.einsum("...ij,...j->...i", K, z)
    L_out = L - K @ Z                          # (I - K H) L
    return Gaussian(m_out, L_out), S_chol


def update_noisy(
    x: Gaussian, y: jnp.ndarray, H: jnp.ndarray, R_chol: jnp.ndarray
) -> tuple[Gaussian, jnp.ndarray, jnp.ndarray]:
    """Kalman UPDATE on a NOISY observation ``y = H x + e``, ``e ~ N(0, R)``.

    The reference supports only the R = 0 solver pseudo-observations
    (`/root/reference/src/filtering.jl:81`); this noisy variant powers data
    conditioning / parameter inference (`odefilters.datalik`). Square-root
    Joseph form throughout:

        z      = y - H m
        S_chol = qr-factor of [ (H L)^T ; R_chol^T ]     (S = H Sigma H^T + R)
        K      = Sigma H^T S^{-1}                        (triangular solves)
        m_out  = m + K z
        L_out  = qr-factor of [ (I - K H) L | K R_chol ]

    Returns ``(x_out, z, S_chol)`` — innovation and its factor feed
    ``log N(z; 0, S)`` marginal-likelihood terms.
    """
    L = x.chol
    z = y - jnp.einsum("...ij,...j->...i", H, x.mean)
    Z = H @ L                                  # (..., d_obs, D)
    S_chol = qr_stack2(Z, R_chol)
    LZt = L @ _T(Z)                            # Sigma H^T = L (H L)^T
    W = solve_triangular(S_chol, _T(LZt), lower=True)
    K = _T(solve_triangular(_T(S_chol), W, lower=False))
    m_out = x.mean + jnp.einsum("...ij,...j->...i", K, z)
    # The incoming factor can carry EXACT zero rows (the R = 0 ODE update
    # annihilates the measured block: (I - KH)L row_1 = 0 identically for
    # EK0), which the data update preserves — and the QR derivative at a
    # rank-deficient stack divides by the zero diagonal (NaN gradients).
    # A relative eps*I third block restores full rank; the covariance
    # perturbation is O(eps^2) ~ dtype-roundoff of Sigma. (Same spirit as
    # linalg.cholesky_psd's diagonal guard.) The eps scale comes from the
    # OUTPUT blocks, not the incoming factor: with a huge prior and a
    # small R the posterior is R-sized, and an input-sized jitter would
    # swamp it (observed with the astronomic sigma^2 a misspecified
    # static-diffusion calibration produces).
    D = L.shape[-1]
    dtype = L.dtype
    A1 = L - K @ Z
    A2 = K @ R_chol
    scale = jnp.sqrt(
        jnp.mean(A1 * A1, axis=(-2, -1), keepdims=True)
        + jnp.mean(A2 * A2, axis=(-2, -1), keepdims=True)
        + jnp.finfo(dtype).tiny
    )
    eps = scale * jnp.asarray(float(jnp.finfo(dtype).eps) ** 0.75, dtype)
    L_out = qr_stack3(A1, A2, eps * jnp.eye(D, dtype=dtype))
    return Gaussian(m_out, L_out), z, S_chol


def update_loglikelihood(z: jnp.ndarray, S_chol: jnp.ndarray) -> jnp.ndarray:
    """``log N(z; 0, S)`` (`/root/reference/src/perform_step.jl:66`)."""
    return gaussian_logpdf_zero(z, S_chol)


def smoother_gain(
    x_curr: Gaussian, x_pred: Gaussian, A: jnp.ndarray, jitter: float = 0.0
) -> jnp.ndarray:
    """RTS gain ``G = Sigma_n A^T (Sigma_pred)^{-1}`` in square-root form.

    ``Sigma_pred`` is supplied via its factor; we form the small triangular
    solve chain instead of the reference's dense ``inv(P_p)``
    (`/root/reference/src/filtering.jl:124-137`).

    ``jitter`` (static, relative): floors the predicted factor at
    ``jitter * max|diag(Lp)|`` by appending a scaled identity block to the
    QR stack (``Sigma_pred + (jitter * s)^2 I``). A fully converged filter
    collapses covariance directions to ~eps of the state scale; states
    computed with reduced-precision arithmetic (the TPU's ~1e-8 QR,
    docs/kernels.md "f64 on TPU") are then *inconsistent* at a level the
    exact gain amplifies without bound — measured: the mu=1e5 Van der Pol
    chip filter is finite but its host-smoothed means overflow to inf.
    The floor bounds the amplification at ~(state error)/(jitter * s)
    while biasing the posterior by only O(jitter^2) relative.
    """
    Lp = tril_factor(_T(x_pred.chol))  # ensure triangular for solves
    if jitter:
        D = Lp.shape[-1]
        # Floor scale: the larger of the factor's own diagonal scale and
        # the predicted MEAN scale. Chip-collapsed steps can carry an
        # identically-zero factor (double-single flush, docs/kernels.md),
        # where a factor-relative floor alone would still be zero; the
        # mean scale encodes "states are known to ~jitter relative", the
        # actual consistency level of chip arithmetic.
        s = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(Lp, axis1=-2, axis2=-1)), axis=-1),
            jnp.max(jnp.abs(x_pred.mean), axis=-1),
        )
        eye = jnp.eye(D, dtype=Lp.dtype)
        Lp = tril_factor(jnp.concatenate(
            [_T(Lp), (jitter * s)[..., None, None] * eye], axis=-2
        ))
    C = x_curr.chol @ _T(A @ x_curr.chol)      # Sigma_n A^T
    # G = C (Lp Lp^T)^-1
    W = solve_triangular(Lp, _T(C), lower=True)
    G = _T(solve_triangular(_T(Lp), W, lower=False))
    return G


def smooth_step(
    x_curr: Gaussian,
    x_next_smoothed: Gaussian,
    A: jnp.ndarray,
    QL: jnp.ndarray,
    jitter: float = 0.0,
) -> tuple[Gaussian, jnp.ndarray]:
    """One Rauch-Tung-Striebel smoothing step, Joseph/QR square-root form.

    Exactly the math of `/root/reference/src/filtering.jl:119-154`:

        x_pred = predict(x_curr)
        G      = Sigma_n A^T Sigma_pred^{-1}
        m_s    = m_n + G (m_{n+1}^S - m_pred)
        L_s    = qr-factor of [ (I-GA) L_n | G QL | G L_{n+1}^S ]

    Returns ``(x_smoothed, G)``.
    """
    x_pred = predict(x_curr, A, QL)
    G = smoother_gain(x_curr, x_pred, A, jitter=jitter)
    m_s = x_curr.mean + jnp.einsum(
        "...ij,...j->...i", G, x_next_smoothed.mean - x_pred.mean
    )
    D = x_curr.mean.shape[-1]
    I = jnp.eye(D, dtype=x_curr.chol.dtype)
    L_s = qr_stack3((I - G @ A) @ x_curr.chol, G @ QL, G @ x_next_smoothed.chol)
    return Gaussian(m_s, L_s), G


def condition_on(x: Gaussian, H: jnp.ndarray, data: jnp.ndarray) -> Gaussian:
    """Exact Kalman conditioning ``x | (H x = data)`` used for state init.

    Reference: ``condition_on!`` at
    `/root/reference/src/state_initialization.jl:45-53`. Unlike
    :func:`update`, the innovation covariance here can be exactly singular
    along already-conditioned directions, so the solve goes through a
    guarded Cholesky (:func:`~odefilters.linalg.cholesky_psd`).
    """
    z = jnp.einsum("...ij,...j->...i", H, x.mean)
    Z = H @ x.chol
    S = Z @ _T(Z)
    S_chol = cholesky_psd(S)
    LZt = x.chol @ _T(Z)
    W = solve_triangular(S_chol, _T(LZt), lower=True)
    K = _T(solve_triangular(_T(S_chol), W, lower=False))
    m_out = x.mean + jnp.einsum("...ij,...j->...i", K, data - z)
    L_out = x.chol - K @ Z
    return Gaussian(m_out, L_out)
