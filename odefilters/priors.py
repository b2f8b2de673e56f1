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

from fractions import Fraction
from functools import lru_cache

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
