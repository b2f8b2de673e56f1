"""Gauss-Markov priors: q-times Integrated Brownian Motion (IBM / IWP).

TPU-native replacement for `/root/reference/src/priors.jl` (L1 layer).

State layout matches the reference (derivative-major blocks of size ``d``,
`priors.jl:4-10`): the full state is ``X = [u^(0); u^(1); ...; u^(q)]`` with
dimension ``D = d (q+1)``, so both the transition ``A`` and process noise
``Q`` are Kronecker products ``Atil ⊗ I_d`` / ``Qtil ⊗ I_d`` of small
``(q+1, q+1)`` matrices with the identity. We exploit that everywhere:

- the *small* factors are what the EK0 Kronecker fast path consumes
  (O(q^3) covariance cost independent of d — enables ~1e4-state problems);
- the *full* ``D x D`` expansion feeds the dense EK1 path.

All matrices here are solver *constants*: they are built host-side with
numpy in float64 from exact integer arithmetic (``fractions.Fraction``), so
there is no factorial overflow for any q (the reference needs a BigFloat
escape hatch for q > 10, `priors.jl:31-35`) and no tracing overhead.

The preconditioned variants are step-size independent (`priors.jl:7-59`);
the vanilla variants depend on h (`priors.jl:63-99`) and are used only by
tests and the un-preconditioned public API.
"""

from __future__ import annotations

import dataclasses
import math
from fractions import Fraction
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _ibm_small_np(q: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact preconditioned (q+1)x(q+1) IBM blocks in float64.

    Returns ``(Atil, Qtil, Qtil_chol)`` with
    ``Atil[j, k] = 1/(k-j)!`` for ``k >= j`` (cf. `priors.jl:15-22`:
    ``A[j, j+d*i] = 1/i!``) and
    ``Qtil[row, col] = 1 / ((2q+1-row-col) (q-row)! (q-col)!)``
    (cf. ``_transdiff_ibm_element`` at `priors.jl:28-38` with h=1).
    """
    n = q + 1
    fact = [1] * (n + 1)
    for i in range(1, n + 1):
        fact[i] = fact[i - 1] * i

    A = np.zeros((n, n))
    for j in range(n):
        for k in range(j, n):
            A[j, k] = float(Fraction(1, fact[k - j]))

    Qf = [[Fraction(0)] * n for _ in range(n)]
    for row in range(n):
        for col in range(n):
            idx = 2 * q + 1 - row - col
            Qf[row][col] = Fraction(1, idx * fact[q - row] * fact[q - col])
    Q = np.array([[float(x) for x in r] for r in Qf])

    # Exact-rational Cholesky of Qtil, then cast: avoids f64 roundoff in the
    # factorization of this Hilbert-like (but preconditioned) matrix.
    Lf = [[Fraction(0)] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = sum(Lf[i][k] * Lf[j][k] for k in range(j))
            if i == j:
                val = Qf[i][i] - s
                # rational sqrt is not exact in general -> do it in float,
                # but on the exactly-accumulated remainder
                Lf[i][j] = Fraction(float(val) ** 0.5)
            else:
                Lf[i][j] = (Qf[i][j] - s) / Lf[j][j]
    L = np.array([[float(x) for x in r] for r in Lf])
    return A, Q, L


def ibm_small(q: int, dtype=jnp.float64):
    """Preconditioned IBM blocks ``(Atil, Qtil_chol)``, each ``(q+1, q+1)``."""
    A, _, L = _ibm_small_np(q)
    return jnp.asarray(A, dtype=dtype), jnp.asarray(L, dtype=dtype)


def ibm(d: int, q: int, dtype=jnp.float64):
    """Full preconditioned IBM transition: ``(A, Q_chol)``, each ``(D, D)``.

    Equivalent of ``ibm(d, q, elType)`` at `/root/reference/src/priors.jl:7-59`
    (which returns ``A`` and an SRMatrix of Q). ``A = Atil ⊗ I_d``,
    ``Q_chol = chol(Qtil) ⊗ I_d`` (Cholesky commutes with ⊗ I).
    """
    Atil, Qtil_chol = ibm_small(q, dtype)
    I_d = jnp.eye(d, dtype=dtype)
    return jnp.kron(Atil, I_d), jnp.kron(Qtil_chol, I_d)


def vanilla_ibm_small(q: int):
    """h-dependent (unpreconditioned) IBM blocks as host functions.

    Returns ``(A_fn, Q_fn)`` with ``A_fn(h) -> (q+1, q+1)`` and
    ``Q_fn(h, sigma2) -> (q+1, q+1)``; JAX-traceable in ``h``.
    Equivalent of `vanilla_ibm` at `/root/reference/src/priors.jl:63-99`.
    """
    n = q + 1
    fact = [1] * (n + 1)
    for i in range(1, n + 1):
        fact[i] = fact[i - 1] * i

    # A(h)[j, j+i] = h^i / i!
    pow_i = np.zeros((n, n), dtype=np.int64)   # exponent of h per entry
    coef_a = np.zeros((n, n))
    for j in range(n):
        for k in range(j, n):
            pow_i[j, k] = k - j
            coef_a[j, k] = 1.0 / fact[k - j]

    # Q(h)[r, c] = h^(2q+1-r-c) / ((2q+1-r-c) (q-r)! (q-c)!)
    pow_q = np.zeros((n, n), dtype=np.int64)
    coef_q = np.zeros((n, n))
    for r in range(n):
        for c in range(n):
            idx = 2 * q + 1 - r - c
            pow_q[r, c] = idx
            coef_q[r, c] = 1.0 / (idx * fact[q - r] * fact[q - c])

    pow_i_j, coef_a_j = jnp.asarray(pow_i), jnp.asarray(coef_a)
    pow_q_j, coef_q_j = jnp.asarray(pow_q), jnp.asarray(coef_q)

    def A_fn(h):
        return coef_a_j.astype(jnp.result_type(h)) * h ** pow_i_j

    def Q_fn(h, sigma2=1.0):
        return sigma2 * coef_q_j.astype(jnp.result_type(h)) * h ** pow_q_j

    return A_fn, Q_fn


def vanilla_ibm(d: int, q: int):
    """Full ``(D, D)`` h-dependent IBM, mirroring `priors.jl:63-99`."""
    A_fn, Q_fn = vanilla_ibm_small(q)

    def A_full(h):
        return jnp.kron(A_fn(h), jnp.eye(d, dtype=jnp.result_type(h)))

    def Q_full(h, sigma2=1.0):
        return jnp.kron(Q_fn(h, sigma2), jnp.eye(d, dtype=jnp.result_type(h)))

    return A_full, Q_full


def precond_small(h, q: int):
    """Per-derivative-block preconditioner entries and their inverses.

    ``p[j] = h^(j - q - 1/2)`` for j = 0..q — the diagonal blocks of the
    reference's ``preconditioner`` closure
    (`/root/reference/src/preconditioning.jl:1-17`). Returns ``(p, p_inv)``
    each of shape ``(q+1,)``; traceable in ``h``.
    """
    j = jnp.arange(q + 1, dtype=jnp.result_type(h, float))
    p = h ** (j - q - 0.5)
    return p, 1.0 / p


def precond_full(h, d: int, q: int):
    """Full length-D diagonal ``(p, p_inv)`` (derivative-major repeat)."""
    p, p_inv = precond_small(h, q)
    return jnp.repeat(p, d), jnp.repeat(p_inv, d)


# --------------------------------------------------------------------------
# Generalized Gauss-Markov priors: IWP (== the reference's :ibm), IOUP, Matern
#
# The reference hardcodes the IBM/IWP prior (`/root/reference/src/priors.jl`,
# `algorithms.jl:24` only accepts prior=:ibm). Here any prior of the form
# dX = F X dt + e_q dW — q-times-integrated Wiener (IWP), q-times-integrated
# Ornstein-Uhlenbeck (IOUP), and Matern(q + 1/2) — is supported on the dense
# solver path. The transition pair (A(h), Q(h)) is computed *directly in
# preconditioned coordinates*, which is both well-conditioned and free of
# h**(+-k) overflow:
#
#   A_p(h)  = P(h) expm(F h) P(h)^-1 = expm(M_p),  M_p := h P(h) F P(h)^-1,
#             where M_p's entries are F[j,k] * h^(j-k+1) — the companion
#             structure (F nonzero only on the superdiagonal and in row q)
#             makes every exponent >= 0, so M_p -> const as h -> 0;
#   Q_p(h)  = int_0^1 a(c) a(c)^T dc with a(c) = expm(M_p c)[:, q]
#             (change of variables s = c h absorbs BOTH the h of "ds" and
#             the P e_q = h^(-1/2) e_q row scaling), evaluated by
#             Gauss-Legendre quadrature in SQUARE-ROOT form: stack the
#             weighted columns and re-triangularize with one QR — the
#             factors-only rule, no Cholesky of a formed Q.
#
# For the IWP, M_p is nilpotent and the integrand polynomial, so this
# machinery reproduces `ibm_small` exactly (tested); IWP keeps its
# closed-form constant path. Quadrature with K nodes is exact for IWP
# (degree 2q <= 2K-1); for IOUP/Matern the integrand carries exp(alpha c)
# factors with alpha ~ rate*h (IOUP) / lambda*h (Matern), and the default
# K = 48 is accurate to <~1e-8 up to |alpha| ~ 130 (verified against an
# adaptive scipy quad_vec oracle — NOT Van Loan, which itself loses all
# relative accuracy beyond |alpha| ~ 30). Cost is negligible: a batched
# expm of (K+1) matrices of size (q+1).
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IWP:
    """q-times integrated Wiener process — the reference's ``:ibm`` prior."""


@dataclasses.dataclass(frozen=True)
class IOUP:
    """q-times integrated Ornstein-Uhlenbeck prior.

    The q-th derivative mean-reverts with drift ``rate`` (negative = stable):
    ``d u^(q) = rate * u^(q) dt + dW``. Useful for ODEs with known decay or
    (rate matching the dominant eigenvalue) semi-stiff dynamics.

    ``rate`` may also be a square ``(d, d)`` matrix ``L`` (array-like; stored
    as a nested tuple so the config stays hashable): the *dimension-coupled*
    prior ``d u^(q) = L u^(q) dt + dW`` of probabilistic EXPONENTIAL
    integrators — with ``L`` the (dominant) linear part of the vector field,
    the prior's extrapolation is ``expm(L h)``-exact, so semi-linear stiff
    problems take L-driven steps instead of resolving the fast scales
    (Bosch, Hennig, Tronarp, "Probabilistic Exponential Integrators",
    NeurIPS 2023; shipped by later upstream versions — the reference v0.1.5
    has only the IWP, `/root/reference/src/priors.jl`). Matrix rates couple
    the state dimensions, so they run on the dense solver path only (no
    Kronecker small factor exists; `transition_precond_small` raises).
    See :func:`odefilters.algorithms.ExpEK`.

    ``rate="jacobian"`` is the *Rosenbrock* variant (same paper, upstream's
    ``RosenbrockExpEK``): the rate matrix is re-linearized at every solver
    step as the vector field's Jacobian at the step's left (last accepted)
    state, so the prior locally tracks ``expm(J_f(u) h)`` without the user
    naming a linear part. Smoothing, dense output and sampling re-linearize
    each interval at the same left filter state, so they use exactly the
    transitions the forward pass used. Dense-path only, like matrix rates.
    See :func:`odefilters.algorithms.RosenbrockExpEK`.
    """

    rate: object = -1.0

    def __post_init__(self):
        r = self.rate
        if isinstance(r, str):
            if r.lower() != "jacobian":
                raise ValueError(
                    f"IOUP rate must be a number, a square matrix, or the "
                    f"string 'jacobian' (per-step re-linearization), got "
                    f"{r!r}"
                )
            object.__setattr__(self, "rate", "jacobian")
            return
        if isinstance(r, (int, float)) and not isinstance(r, bool):
            if not math.isfinite(r):
                raise ValueError(f"IOUP rate must be finite, got {r!r}")
            object.__setattr__(self, "rate", float(r))
            return
        arr = np.asarray(r, dtype=float)
        if arr.ndim == 0:
            if not np.isfinite(arr):
                raise ValueError(f"IOUP rate must be finite, got {r!r}")
            object.__setattr__(self, "rate", float(arr))
            return
        if arr.ndim != 2 or arr.shape[0] != arr.shape[1] or arr.shape[0] == 0:
            raise ValueError(
                f"IOUP rate must be a scalar or a square (d, d) matrix, got "
                f"shape {arr.shape}"
            )
        if not np.all(np.isfinite(arr)):
            raise ValueError("IOUP rate matrix must be finite")
        object.__setattr__(self, "rate", tuple(map(tuple, arr.tolist())))

    @property
    def rate_is_matrix(self) -> bool:
        return isinstance(self.rate, tuple)

    @property
    def rate_is_jacobian(self) -> bool:
        """True for the per-step re-linearized (Rosenbrock) rate."""
        return self.rate == "jacobian"

    @property
    def rate_np(self) -> np.ndarray:
        """The rate as a float64 numpy array (matrix rates only)."""
        if self.rate_is_jacobian:
            raise ValueError(
                "IOUP(rate='jacobian') has no static rate matrix; it is "
                "re-linearized per step from the vector field's Jacobian"
            )
        return np.asarray(self.rate, dtype=np.float64)


@dataclasses.dataclass(frozen=True)
class Matern:
    """Matern process prior with smoothness ``nu = q + 1/2``.

    ``lengthscale`` sets the correlation time; the companion drift is the
    characteristic polynomial ``(s + lambda)^(q+1)``, ``lambda =
    sqrt(2 nu) / lengthscale``. A stationary prior: posterior uncertainty
    saturates instead of growing without bound between observations.
    """

    lengthscale: float = 1.0

    def __post_init__(self):
        if not (math.isfinite(self.lengthscale) and self.lengthscale > 0):
            raise ValueError(
                f"Matern lengthscale must be positive and finite, got "
                f"{self.lengthscale!r}"
            )


Prior = IWP | IOUP | Matern


def _reject_matrix_rate(prior, where: str) -> None:
    """Matrix-rate (and jacobian-rate) IOUP has no per-dimension
    (q+1)-block structure: the coupled drift makes A/Q dense over all
    D = d(q+1) states, so every path that relies on the Kronecker small
    factor must reject it."""
    if isinstance(prior, IOUP) and (
        prior.rate_is_matrix or prior.rate_is_jacobian
    ):
        raise ValueError(
            f"{where} supports dimension-factorized priors only; the "
            "matrix-rate / rate='jacobian' IOUP (probabilistic exponential "
            "integrator) couples dimensions — use the dense solver path "
            "(odefilters.solve / solve_fixed with EK0/EK1, e.g. via "
            "algorithms.ExpEK / RosenbrockExpEK)"
        )


def normalize_prior(prior) -> Prior:
    """Map the user-facing ``prior=`` argument to a Prior instance.

    Accepts the reference-compatible string ``"ibm"`` (and alias ``"iwp"``)
    or an instance of :class:`IWP` / :class:`IOUP` / :class:`Matern`.
    """
    if prior is None:
        return IWP()
    if isinstance(prior, str):
        if prior.lower() in ("ibm", "iwp"):
            return IWP()
        raise ValueError(
            f"unknown prior {prior!r}: use 'ibm' or an IWP()/IOUP(rate)/"
            "Matern(lengthscale) instance"
        )
    if isinstance(prior, (IWP, IOUP, Matern)):
        return prior
    raise TypeError(f"prior must be a string or Prior instance, got {prior!r}")


@lru_cache(maxsize=None)
def _drift_np(prior: Prior, q: int) -> np.ndarray:
    """Companion-form drift matrix F of the (q+1)-dim state SDE (float64)."""
    n = q + 1
    F = np.zeros((n, n))
    for j in range(q):
        F[j, j + 1] = 1.0
    if isinstance(prior, IOUP):
        if prior.rate_is_matrix or prior.rate_is_jacobian:
            raise ValueError(
                "matrix-rate / jacobian-rate IOUP couples the ODE "
                "dimensions: there is no (q+1)-dim companion drift; use the "
                "dense-path transition_precond_coupled/_full machinery"
            )
        F[q, q] = prior.rate
    elif isinstance(prior, Matern):
        nu = q + 0.5
        lam = math.sqrt(2.0 * nu) / prior.lengthscale
        for i in range(n):
            F[q, i] = -math.comb(n, i) * lam ** (n - i)
    return F


_EXPM_MAX_SQUARINGS = 30
_EXPM_TAYLOR_TERMS = 14


def expm_small(M: jnp.ndarray) -> jnp.ndarray:
    """Solver-free matrix exponential for small matrices, batched.

    Scaling-and-squaring with a Taylor series: no LU/solve anywhere (the
    TPU backend has no f64 LU — CLAUDE.md), branch-free (traced scaling
    exponent + masked squarings), works under vmap/jit on any backend.
    After scaling the 1-norm is <= 1/2, so 14 Taylor terms give ~2e-17
    relative truncation error; accuracy is f64-roundoff-limited.
    """
    M = jnp.asarray(M)
    n = M.shape[-1]
    norm = jnp.max(jnp.sum(jnp.abs(M), axis=-2), axis=-1)  # 1-norm, (...)
    # s >= log2(norm) + 1  =>  norm(M / 2^s) <= 1/2
    s = jnp.ceil(jnp.log2(jnp.maximum(norm, 1e-30))).astype(jnp.int32) + 1
    s = jnp.clip(s, 0, _EXPM_MAX_SQUARINGS)
    Ms = M / (2.0 ** s.astype(M.dtype))[..., None, None]

    eye = jnp.broadcast_to(jnp.eye(n, dtype=M.dtype), M.shape)
    R = eye + Ms
    T = Ms
    for k in range(2, _EXPM_TAYLOR_TERMS + 1):
        T = (T @ Ms) / k
        R = R + T

    def body(i, Rc):
        sq = Rc @ Rc
        take = (i < s)[..., None, None]
        return jnp.where(take, sq, Rc)

    return jax.lax.fori_loop(0, _EXPM_MAX_SQUARINGS, body, R)


@lru_cache(maxsize=None)
def _gl_nodes(K: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights on [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(K)
    return (x + 1.0) / 2.0, w / 2.0


def default_quad_nodes(q: int) -> int:
    return max(q + 3, 48)


def transition_precond_small(
    prior: Prior, q: int, h, dtype=jnp.float64, quad_nodes: int | None = None
):
    """Preconditioned small transition pair ``(A_p(h), QL_p(h))``.

    Traceable in ``h``. For :class:`IWP` this is the h-independent constant
    pair :func:`ibm_small` (``h`` is ignored); for IOUP/Matern it is
    computed per call via :func:`expm_small` + square-root quadrature (see
    the block comment above).
    """
    prior = normalize_prior(prior)
    if isinstance(prior, IWP):
        return ibm_small(q, dtype)
    _reject_matrix_rate(prior, "transition_precond_small")

    from odefilters.linalg import tril_factor

    n = q + 1
    K = default_quad_nodes(q) if quad_nodes is None else quad_nodes
    if K < n:
        raise ValueError(f"need at least {n} quadrature nodes for full rank")
    Fnp = _drift_np(prior, q)
    h = jnp.asarray(h, dtype)
    jj = np.arange(n)
    expo = jj[:, None] - jj[None, :] + 1
    expo_safe = jnp.asarray(np.where(Fnp != 0, expo, 0), dtype)
    # exponents are clamped to 0 where F == 0 (companion structure keeps
    # every *used* exponent >= 0), so no h**negative is ever evaluated
    Mp = jnp.asarray(Fnp, dtype) * h**expo_safe

    c, w0 = _gl_nodes(K)
    scal = jnp.concatenate(
        [jnp.ones((1,), dtype), jnp.asarray(c, dtype)]
    )  # (K+1,)
    E = expm_small(Mp[None] * scal[:, None, None])  # (K+1, n, n)
    A_p = E[0]
    X = E[1:, :, q] * jnp.sqrt(jnp.asarray(w0, dtype))[:, None]  # (K, n)
    QL_p = tril_factor(X)
    return A_p, QL_p


def transition_precond_small_np(prior: Prior, q: int, h: float):
    """Host-side float64 numpy twin of :func:`transition_precond_small`.

    For *static* step sizes (fixed grids, Pallas kernel constants) the
    preconditioned transition pair of ANY Gauss-Markov prior is a
    compile-time constant; this computes it with scipy expm + the same
    square-root Gauss-Legendre quadrature, so kernels can bake it in
    exactly like the IWP constants.
    """
    import scipy.linalg as _sla

    prior = normalize_prior(prior)
    if isinstance(prior, IWP):
        A, _, L = _ibm_small_np(q)
        return A, L
    _reject_matrix_rate(prior, "the structured (Kronecker / Pallas-kernel)")
    n = q + 1
    h = float(h)
    F = _drift_np(prior, q)
    jj = np.arange(n)
    expo = np.where(F != 0, jj[:, None] - jj[None, :] + 1, 0)
    Mp = F * h**expo
    A_p = _sla.expm(Mp)
    K = default_quad_nodes(q)
    c, w0 = _gl_nodes(K)
    X = np.stack(
        [np.sqrt(w0[k]) * _sla.expm(Mp * c[k])[:, q] for k in range(K)]
    )  # (K, n)
    R = np.linalg.qr(X, mode="r")
    L = R.T
    sign = np.sign(np.diag(L))
    sign[sign == 0] = 1.0
    return A_p, L * sign[None, :]


def transition_precond_coupled(
    L, d: int, q: int, h, dtype=jnp.float64, quad_nodes: int | None = None,
):
    """Preconditioned ``(D, D)`` transition of the dimension-COUPLED IOUP
    prior ``d u^(q) = L u^(q) dt + dW`` with ``L`` a ``(d, d)`` matrix — the
    Gauss-Markov prior of probabilistic exponential integrators (Bosch,
    Hennig, Tronarp, NeurIPS 2023; the reference v0.1.5 has only the IWP,
    `/root/reference/src/priors.jl`).

    The scalar construction of :func:`transition_precond_small` lifted to
    block form. In preconditioned coordinates ``M_p := h P F P^-1`` has
    blocks ``F[j,k] * h^(j-k+1)``: identity superdiagonal blocks (exponent
    0) and ``h L`` in the (q, q) block — every used exponent >= 0, no
    h-power overflow. Then ``A_p = expm(M_p)`` and
    ``Q_p = int_0^1 a(c) a(c)^T dc`` with ``a(c) = expm(M_p c)[:, q-block]``
    of shape (D, d) (the change of variables s = c h absorbs both the
    ``ds`` Jacobian and the ``P E_q = h^-1/2 E_q`` row scaling), evaluated
    by Gauss-Legendre quadrature in square-root form: stack the weighted
    block columns (K d rows) and re-triangularize with one QR.

    ``L`` may be a traced array (per-step re-linearized priors); ``h`` is
    traceable. Solver-free (expm via scaling-and-squaring Taylor, QR
    factorization) — TPU-f64-legal per the no-LU rule.
    """
    from odefilters.linalg import tril_factor

    n = q + 1
    D = n * d
    K = default_quad_nodes(q) if quad_nodes is None else quad_nodes
    if K * d < D:
        raise ValueError(f"need at least {n} quadrature nodes for full rank")
    h = jnp.asarray(h, dtype)
    L = jnp.asarray(L, dtype)
    base = np.zeros((D, D))
    for j in range(q):
        base[j * d : (j + 1) * d, (j + 1) * d : (j + 2) * d] = np.eye(d)
    M = jnp.asarray(base, dtype)
    M = M.at[q * d :, q * d :].set(h * L)

    c, w0 = _gl_nodes(K)
    scal = jnp.concatenate([jnp.ones((1,), dtype), jnp.asarray(c, dtype)])
    E = expm_small(M[None] * scal[:, None, None])  # (K+1, D, D)
    A_p = E[0]
    cols = E[1:, :, q * d :] * jnp.sqrt(jnp.asarray(w0, dtype))[:, None, None]
    X = jnp.swapaxes(cols, 1, 2).reshape(K * d, D)  # rows: weighted a(c)^T
    QL_p = tril_factor(X)
    return A_p, QL_p


def transition_precond_full(
    prior: Prior, d: int, q: int, h, dtype=jnp.float64,
    quad_nodes: int | None = None, rate_matrix=None,
):
    """Full ``(D, D)`` preconditioned transition pair (Kronecker with I_d;
    dimension-coupled expm for the matrix-rate IOUP).

    ``rate_matrix``: the per-step linearization for
    ``IOUP(rate="jacobian")`` (RosenbrockExpEK) — a traced ``(d, d)``
    array, typically ``J_f`` at the interval's left filter state. Required
    for (and only consulted by) the jacobian-rate prior.
    """
    prior = normalize_prior(prior)
    if isinstance(prior, IOUP) and prior.rate_is_jacobian:
        if rate_matrix is None:
            raise ValueError(
                "IOUP(rate='jacobian') (RosenbrockExpEK) re-linearizes the "
                "prior at every step, but this path supplies no per-step "
                "rate matrix — supported paths: the dense adaptive/"
                "fixed-grid solvers, smoothing, dense output, and sampling"
            )
        Lr = jnp.asarray(rate_matrix, dtype)
        if Lr.shape != (d, d):
            raise ValueError(
                f"jacobian rate matrix has shape {Lr.shape}; expected "
                f"({d}, {d})"
            )
        return transition_precond_coupled(Lr, d, q, h, dtype, quad_nodes)
    if isinstance(prior, IOUP) and prior.rate_is_matrix:
        Lr = prior.rate_np
        if Lr.shape != (d, d):
            raise ValueError(
                f"IOUP matrix rate has shape {Lr.shape}; the problem has "
                f"d = {d} dimensions — expected ({d}, {d})"
            )
        return transition_precond_coupled(Lr, d, q, h, dtype, quad_nodes)
    A_s, QL_s = transition_precond_small(prior, q, h, dtype, quad_nodes)
    I_d = jnp.eye(d, dtype=dtype)
    return jnp.kron(A_s, I_d), jnp.kron(QL_s, I_d)


def discretize_small(
    prior: Prior, q: int, h, dtype=jnp.float64, quad_nodes: int | None = None
):
    """Unpreconditioned ``(A(h), QL(h))`` of the prior's discrete transition.

    ``A(h) = expm(F h)``, ``Q(h) = int_0^h expm(F s) e_q e_q^T expm(F s)^T
    ds`` returned as a square-root factor. Generalizes ``vanilla_ibm_small``
    (`/root/reference/src/priors.jl:63-99`) to IOUP/Matern. Prefer the
    preconditioned variant inside solvers (conditioning, no h-power
    overflow).
    """
    prior = normalize_prior(prior)
    A_p, QL_p = transition_precond_small(prior, q, h, dtype, quad_nodes)
    p, pinv = precond_small(h, q)
    A = pinv[:, None] * A_p * p[None, :]
    QL = pinv[:, None] * QL_p
    return A, QL


def projection_matrix(d: int, q: int, deriv: int, dtype=jnp.float64) -> jnp.ndarray:
    """Selector ``E_deriv = e_deriv^T ⊗ I_d`` of shape ``(d, D)``.

    Reference: ``Proj(deriv)`` at `/root/reference/src/caches.jl:63-64`.
    In practice the solver slices blocks directly instead of multiplying by
    these; they exist for API parity and tests.
    """
    if deriv > q:
        raise ValueError("Projection called for non-modeled derivative")
    e = jnp.zeros((1, q + 1), dtype=dtype).at[0, deriv].set(1.0)
    return jnp.kron(e, jnp.eye(d, dtype=dtype))


def chebyshev_transition_fit(
    prior: Prior, q: int, h_lo: float, h_hi: float,
    n_terms: int = 32, tol: float = 3e-7, max_terms: int = 128,
):
    """Chebyshev tabulation of the preconditioned transition over a step
    range — the per-lane-dt prior evaluation for the ADAPTIVE Pallas
    kernels (VERDICT r2 item 7).

    For non-IWP priors the preconditioned ``(At(h), QLt(h))`` depend on h,
    so a per-lane adaptive kernel cannot bake them as compile-time
    constants. But every entry is an analytic function of ``log h``
    (smooth combinations of phi-functions of rate*h), so a Chebyshev
    series in ``xi = affine(log h)`` over the controller's step range
    converges geometrically; the kernel evaluates it per lane with a
    Clenshaw recurrence — pure VPU fma chains, no gathers, no dynamic
    SMEM indexing (which Mosaic compiles ~100x slower).

    Doubles ``n_terms`` until the max abs entry error over a dense log-h
    sample grid is below ``tol`` (f32 kernels can't use better than
    ~1e-7). Returns ``dict(cA, cL, llo, lhi, err)`` with coefficient
    arrays of shape (n_terms, q+1, q+1); raises if ``max_terms`` cannot
    reach ``tol``.
    """
    prior = normalize_prior(prior)
    if isinstance(prior, IWP):
        raise ValueError("IWP needs no tabulation (h-free constants)")
    _reject_matrix_rate(prior, "chebyshev_transition_fit (adaptive kernels)")
    llo, lhi = float(np.log(h_lo)), float(np.log(h_hi))
    if not lhi > llo:
        raise ValueError("h_hi must exceed h_lo")

    def sample(lhs):
        As, Ls = [], []
        for lh in np.atleast_1d(lhs):
            A, L = transition_precond_small_np(prior, q, float(np.exp(lh)))
            As.append(A)
            Ls.append(L)
        return np.stack(As), np.stack(Ls)

    # dense validation grid (shared across refinements)
    lh_dense = np.linspace(llo, lhi, 513)
    xi_dense = (2.0 * lh_dense - (llo + lhi)) / (lhi - llo)
    A_ref, L_ref = sample(lh_dense)

    K = int(n_terms)
    while True:
        k = np.arange(K)
        xi_nodes = np.cos(np.pi * (k + 0.5) / K)
        lh_nodes = 0.5 * (llo + lhi) + 0.5 * (lhi - llo) * xi_nodes
        As, Ls = sample(lh_nodes)
        Tj = np.cos(np.arange(K)[:, None] * np.arccos(xi_nodes)[None, :])
        cA = (2.0 / K) * np.einsum("jk,kab->jab", Tj, As)
        cL = (2.0 / K) * np.einsum("jk,kab->jab", Tj, Ls)
        cA[0] *= 0.5
        cL[0] *= 0.5
        Td = np.cos(np.arange(K)[:, None] * np.arccos(xi_dense)[None, :])
        errA = np.abs(np.einsum("jab,jx->xab", cA, Td) - A_ref).max()
        errL = np.abs(np.einsum("jab,jx->xab", cL, Td) - L_ref).max()
        err = max(errA, errL)
        if err < tol:
            return dict(cA=cA, cL=cL, llo=llo, lhi=lhi, err=float(err))
        if K >= max_terms:
            raise ValueError(
                f"chebyshev_transition_fit: {err:.2e} > tol {tol:.1e} at "
                f"{K} terms over h in [{h_lo:.3g}, {h_hi:.3g}]; narrow the "
                "range (tighter dtmin / shorter tspan) or raise tol"
            )
        K *= 2
