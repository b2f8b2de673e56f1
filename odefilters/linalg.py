"""Square-root linear algebra substrate.

TPU-native replacement for the reference's L0 layer
(`/root/reference/src/squarerootmatrix.jl:9-42`, Gaussian glue in
`/root/reference/src/ProbNumDiffEq.jl:34-66`).

Design differences from the reference (deliberate, TPU-first):

- Covariances are carried *only* as a factor ``L`` with ``Sigma = L @ L.T``.
  The reference eagerly materializes the dense matrix next to the factor
  (`squarerootmatrix.jl:16`, TODO at `:19` admits it should be lazy); we never do.
- All re-factorizations go through a single always-QR path
  (:func:`tril_factor`) instead of the reference's "try Cholesky, fall back
  to QR" dance (`filtering.jl:33-48`): branch-free code is what XLA wants,
  and a Householder QR of a tall stacked factor is batched-friendly on TPU.
- ``Gaussian`` is a registered JAX pytree so it flows through ``jit`` /
  ``vmap`` / ``lax.scan`` / ``grad`` unchanged.

Factors are *not* required to be triangular: any ``L`` with ``Sigma = L L^T``
is a valid carrier (this mirrors the reference, whose Joseph-form update also
produces non-triangular square roots, `filtering.jl:79-91`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Gaussian:
    """A Gaussian ``N(mean, chol @ chol.T)`` carried in square-root form.

    Equivalent of the reference's ``SRGaussian`` alias
    (`/root/reference/src/ProbNumDiffEq.jl:47-48`). ``chol`` is any square
    root of the covariance, not necessarily triangular. Batch dimensions are
    allowed on the left: ``mean: (..., D)``, ``chol: (..., D, D)``.
    """

    mean: jax.Array
    chol: jax.Array

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    @property
    def cov(self) -> jax.Array:
        """Dense covariance (materialized on demand, never stored)."""
        return self.chol @ _T(self.chol)

    @property
    def std(self) -> jax.Array:
        """Marginal standard deviations, sqrt(diag(Sigma))."""
        return jnp.sqrt(jnp.sum(self.chol * self.chol, axis=-1))

    @property
    def var(self) -> jax.Array:
        return jnp.sum(self.chol * self.chol, axis=-1)

    def __matmul__(self, other: Any):  # pragma: no cover - convenience only
        raise TypeError("use linalg.pushforward(M, g) for M * Gaussian")


def _T(x: jax.Array) -> jax.Array:
    return jnp.swapaxes(x, -1, -2)


def pushforward(M: jax.Array, g: Gaussian) -> Gaussian:
    """Linear pushforward ``M * N(m, LL^T) = N(Mm, (ML)(ML)^T)``.

    Reference: ``Base.:*(M, g::Gaussian)`` at
    `/root/reference/src/ProbNumDiffEq.jl:58`.
    """
    return Gaussian(mean=jnp.einsum("...ij,...j->...i", M, g.mean), chol=M @ g.chol)


def scale_rows(p: jax.Array, g: Gaussian) -> Gaussian:
    """Diagonal pushforward ``diag(p) * g`` without materializing diag(p).

    Used for the preconditioner coordinate changes
    (`/root/reference/src/perform_step.jl:36-38,72-75`).
    """
    return Gaussian(mean=p * g.mean, chol=p[..., :, None] * g.chol)


def X_A_Xt(A_chol: jax.Array, X: jax.Array) -> jax.Array:
    """Square-root congruence transform: factor of ``X (LL^T) X^T``.

    Reference: `/root/reference/src/squarerootmatrix.jl:38-39` — the result
    is simply ``X @ L``, kept in factor form.
    """
    return X @ A_chol


def tril_factor(stacked_T: jax.Array) -> jax.Array:
    """Re-triangularize a wide factor via QR.

    Given ``M`` with ``Sigma = M @ M.T`` (``M``: ``(..., D, K)``, ``K >= D``),
    pass in ``M.T`` (shape ``(..., K, D)``) and get back a lower-triangular
    ``L`` (``(..., D, D)``) with ``L @ L.T = Sigma``.

    This is the single, branch-free path replacing the reference's
    Cholesky-then-QR fallback (`/root/reference/src/filtering.jl:33-48`).
    The diagonal sign is fixed to be non-negative so the factor is
    deterministic (helps bitwise test reproducibility across backends).
    """
    R = jnp.linalg.qr(stacked_T, mode="r")
    L = _T(R)
    sign = jnp.sign(jnp.diagonal(L, axis1=-2, axis2=-1))
    sign = jnp.where(sign == 0, 1.0, sign)
    return L * sign[..., None, :]


def tril_factor_mgs(stacked_T: jax.Array, max_unroll: int = 32) -> jax.Array:
    """:func:`tril_factor` via an UNROLLED batched modified Gram-Schmidt.

    Same contract (``L @ L.T == stacked_T.T @ stacked_T``, lower-triangular,
    non-negative diagonal), different lowering: ``jnp.linalg.qr`` on TPU is
    a serial Householder while-loop with dynamic slices — for the small
    ``(K, D)`` stacks of the time-parallel combines (D = d(q+1) ~ 8) each
    QR instance costs the TPU compiler seconds and runs latency-bound.
    This version unrolls D columns of vector arithmetic (the XLA analogue
    of the Pallas kernels' ``_list_mgs_tril``): no loops, no dynamic
    slices, batch-friendly.

    Zero-residual columns (rank-deficient stacks, e.g. the exactly-known
    initial state) get a zero diagonal and a zeroed direction vector —
    ``L L^T = X^T X`` still holds exactly, and the guarded ``where`` keeps
    reverse-mode gradients finite (the same guard as the in-kernel MGS).

    Falls back to the Householder path above ``max_unroll`` columns, where
    unrolling would bloat the program instead of shrinking it.
    """
    D = stacked_T.shape[-1]
    if D > max_unroll:
        return tril_factor(stacked_T)
    dtype = stacked_T.dtype
    qs = []
    rows = []
    for j in range(D):
        v = stacked_T[..., :, j]
        lrow = []
        for qi in qs:
            r = jnp.sum(qi * v, axis=-1)
            v = v - r[..., None] * qi
            lrow.append(r)
        nrm2 = jnp.sum(v * v, axis=-1)
        safe = jnp.where(nrm2 > 0, nrm2, 1.0)
        nrm = jnp.where(nrm2 > 0, jnp.sqrt(safe), 0.0)
        inv = jnp.where(nrm2 > 0, 1.0 / jnp.sqrt(safe), 0.0)
        qs.append(v * inv[..., None])
        zero = jnp.zeros_like(nrm)
        rows.append(
            jnp.stack(lrow + [nrm] + [zero] * (D - j - 1), axis=-1)
        )
    return jnp.stack(rows, axis=-2).astype(dtype)


def solve_triangular_unrolled(
    A: jax.Array, B: jax.Array, *, lower: bool = True, max_unroll: int = 32
) -> jax.Array:
    """``jax.scipy.linalg.solve_triangular(A, B)`` by unrolled substitution.

    ``A``: ``(..., D, D)`` triangular, ``B``: ``(..., D, M)``. Same
    motivation as :func:`tril_factor_mgs`: XLA's TriangularSolve lowers to
    a loop nest per instance on TPU; at D ~ 8 an unrolled substitution is
    pure batched vector arithmetic. Falls back to scipy's above
    ``max_unroll``.
    """
    D = A.shape[-1]
    if D > max_unroll:
        from jax.scipy.linalg import solve_triangular

        return solve_triangular(A, B, lower=lower)
    order = range(D) if lower else range(D - 1, -1, -1)
    xs: dict[int, jax.Array] = {}
    for i in order:
        acc = B[..., i, :]
        for j, xj in xs.items():
            acc = acc - A[..., i, j, None] * xj
        xs[i] = acc / A[..., i, i, None]
    return jnp.stack([xs[i] for i in range(D)], axis=-2)


def matmul_unrolled(a: jax.Array, b: jax.Array, max_dim: int = 16) -> jax.Array:
    """``a @ b`` for small trailing dims by unrolled vector arithmetic.

    ``a``: (..., m, k), ``b``: (..., k, n), leading dims broadcast. Exact
    f32 products — on TPU a batched tiny ``dot_general`` is either bf16
    (default precision: measurement models rounded to ~3 digits) or a
    6-pass "highest" lowering measured at a 4-38x runtime multiplier on
    the time-parallel solver's (N, 8, 8) chains. Unrolled multiplies pay
    neither. Falls back to ``a @ b`` beyond ``max_dim`` (real matmuls
    belong on the MXU).
    """
    m, k = a.shape[-2:]
    k2, n = b.shape[-2:]
    if max(m, k, n) > max_dim:
        return a @ b
    rows = []
    for i in range(m):
        cols = []
        for j in range(n):
            s = a[..., i, 0] * b[..., 0, j]
            for kk in range(1, k):
                s = s + a[..., i, kk] * b[..., kk, j]
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def qr_stack2(A: jax.Array, B: jax.Array) -> jax.Array:
    """Factor of ``A A^T + B B^T`` via QR of the stacked transpose."""
    return tril_factor(jnp.concatenate([_T(A), _T(B)], axis=-2))


def qr_stack3(A: jax.Array, B: jax.Array, C: jax.Array) -> jax.Array:
    """Factor of ``A A^T + B B^T + C C^T`` (3-block QR, cf. the smoother's
    stacked factor at `/root/reference/src/smoothing.jl:53-56`)."""
    return tril_factor(jnp.concatenate([_T(A), _T(B), _T(C)], axis=-2))


def cholesky_psd(mat: jax.Array, max_unroll: int = 32) -> jax.Array:
    """Cholesky with a tiny diagonal guard for PSD (rank-deficient) inputs.

    Small matrices (D <= ``max_unroll``) factor by UNROLLED batched
    substitution — ``jnp.linalg.cholesky`` is a serial loop nest per
    instance on TPU, latency-bound at the (..., 2, 2)..(8, 8) sizes the
    solver produces (same motivation as :func:`tril_factor_mgs`). Pivots
    are floored at a tiny normal, which also keeps rank-deficient inputs
    finite (the dense path NaNs there).
    """
    eps = jnp.finfo(mat.dtype).eps
    d = mat.shape[-1]
    jitter = eps * jnp.trace(mat, axis1=-2, axis2=-1)[..., None] / d
    mat = mat + jitter[..., None] * jnp.eye(d, dtype=mat.dtype)
    if d > max_unroll:
        return jnp.linalg.cholesky(mat)
    tiny = jnp.asarray(1e-30 if mat.dtype == jnp.float32 else 1e-60, mat.dtype)
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = mat[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, tiny))
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(mat[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(d)], axis=-1)
        for i in range(d)
    ]
    return jnp.stack(rows, axis=-2)


def logdet_from_chol(L: jax.Array) -> jax.Array:
    """log|Sigma| from a *triangular* factor L (Sigma = LL^T)."""
    return 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))), axis=-1
    )


def gaussian_logpdf_zero(z: jax.Array, S_chol: jax.Array) -> jax.Array:
    """``log N(0; z, S)`` with ``S = S_chol @ S_chol.T`` (triangular factor).

    Reference: per-step likelihood `logpdf(measurement, zeros(d))` at
    `/root/reference/src/perform_step.jl:66`.
    """
    d = z.shape[-1]
    w = jax.scipy.linalg.solve_triangular(S_chol, z[..., None], lower=True)[..., 0]
    maha = jnp.sum(w * w, axis=-1)
    logdet = logdet_from_chol(S_chol)
    return -0.5 * (maha + logdet + d * jnp.log(2.0 * jnp.pi))


@partial(jax.jit, static_argnames=("n",))
def _sample(mean: jax.Array, chol: jax.Array, eps: jax.Array, n: int) -> jax.Array:
    del n
    return mean[..., None] + chol @ eps


def sample_gaussian(key: jax.Array, g: Gaussian, n: int = 1) -> jax.Array:
    """Draw ``n`` samples: ``m + L @ randn(D, n)``; returns ``(..., D, n)``.

    Reference: ``_rand`` at `/root/reference/src/solution_sampling.jl:6-12`
    (deterministic in directions where the factor is zero).
    """
    eps = jax.random.normal(
        key, g.chol.shape[:-1] + (n,), dtype=g.mean.dtype
    )
    return g.mean[..., None] + g.chol @ eps


def assert_nonnegative_diagonal(chol: jax.Array) -> jax.Array:
    """Debug guard mirroring `/root/reference/src/numerics_tricks.jl:1-6`.

    Returns the variance diagonal; wrap in `jax.debug` checks when needed —
    in square-root form diag(LL^T) is a sum of squares, so this is a no-op
    numerically but kept for API parity with the reference's sanitizer.
    """
    return jnp.sum(chol * chol, axis=-1)


def highest_precision():
    """Context: full-f32 matmuls on TPU.

    TPU XLA lowers f32 matmuls to bf16 MXU passes by default, which wrecks
    solver accuracy (observed ~0.27 trajectory error on FHN vs ~2e-6 with
    full precision). Every solver entry point runs under this context; the
    Pallas kernels are unaffected (pure VPU code).
    """
    import jax

    return jax.default_matmul_precision("highest")
