"""Prior closed-form tests, mirroring `/root/reference/test/priors.jl` and
`/root/reference/test/preconditioning.jl`."""

import jax.numpy as jnp
import numpy as np
import pytest

from odefilters import priors


def test_vanilla_ibm_q1_closed_form():
    """Hand-written A(h), Q(h) for q=1 (cf. test/priors.jl:13-35)."""
    h, s2 = 0.1, 0.25
    A_fn, Q_fn = priors.vanilla_ibm_small(1)
    A_ref = np.array([[1.0, h], [0.0, 1.0]])
    Q_ref = s2 * np.array([[h**3 / 3, h**2 / 2], [h**2 / 2, h]])
    np.testing.assert_allclose(A_fn(h), A_ref, rtol=1e-14)
    np.testing.assert_allclose(Q_fn(h, s2), Q_ref, rtol=1e-14)


def test_vanilla_ibm_q2_closed_form():
    """q=2 hand-written matrices (cf. test/priors.jl's 3x3 case)."""
    h = 0.37
    A_fn, Q_fn = priors.vanilla_ibm_small(2)
    A_ref = np.array([[1, h, h**2 / 2], [0, 1, h], [0, 0, 1]])
    Q_ref = np.array(
        [
            [h**5 / 20, h**4 / 8, h**3 / 6],
            [h**4 / 8, h**3 / 3, h**2 / 2],
            [h**3 / 6, h**2 / 2, h],
        ]
    )
    np.testing.assert_allclose(A_fn(h), A_ref, rtol=1e-13)
    np.testing.assert_allclose(Q_fn(h), Q_ref, rtol=1e-13)


@pytest.mark.parametrize("d,q", [(1, 1), (2, 3), (3, 5), (1, 8)])
def test_preconditioned_equivalence(d, q):
    """Q_p == P Q(h) P^T and A_p == P A(h) P^-1 (test/preconditioning.jl:29-38)."""
    h = 0.05
    A_p, QL_p = priors.ibm(d, q, dtype=jnp.float64)
    Q_p = QL_p @ QL_p.T
    A_fn, Q_fn = priors.vanilla_ibm(d, q)
    p, p_inv = priors.precond_full(h, d, q)
    np.testing.assert_allclose(
        Q_p, p[:, None] * Q_fn(h) * p[None, :], rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(
        A_p, p[:, None] * A_fn(h) * p_inv[None, :], rtol=1e-8, atol=1e-12
    )


@pytest.mark.parametrize("q", [1, 2, 3, 5])
def test_preconditioning_improves_conditioning(q):
    """cond(Q(h)) > cond(Q_p)^2 (test/preconditioning.jl:37-38)."""
    h = 0.1 ** 2
    _, Q_fn = priors.vanilla_ibm_small(q)
    _, QL_p = priors.ibm_small(q)
    Q_p = QL_p @ QL_p.T
    c_raw = np.linalg.cond(np.asarray(Q_fn(h)))
    c_pre = np.linalg.cond(np.asarray(Q_p))
    assert c_raw > c_pre**2


@pytest.mark.parametrize("q", [1, 3, 6, 11])
def test_qtil_chol_is_exact_factor(q):
    """No BigFloat escape hatch needed: exact-rational build covers q>10
    (reference falls back to BigFloat at priors.jl:31-35)."""
    _, Qtil, L = priors._ibm_small_np(q)
    np.testing.assert_allclose(L @ L.T, Qtil, rtol=1e-12, atol=1e-300)


def test_kron_structure():
    d, q = 3, 2
    A, QL = priors.ibm(d, q)
    At, QLt = priors.ibm_small(q)
    np.testing.assert_allclose(A, np.kron(At, np.eye(d)))
    np.testing.assert_allclose(QL, np.kron(QLt, np.eye(d)))


def test_projection_matrix():
    d, q = 2, 2
    E1 = priors.projection_matrix(d, q, 1)
    x = np.arange(d * (q + 1), dtype=float)
    np.testing.assert_allclose(E1 @ x, x[d : 2 * d])
    with pytest.raises(ValueError):
        priors.projection_matrix(d, q, q + 1)


def test_precond_vector_matches_reference_formula():
    d, q, h = 2, 3, 0.01
    p, p_inv = priors.precond_full(h, d, q)
    ref = np.array([h ** (j - q - 0.5) for j in range(q + 1) for _ in range(d)])
    np.testing.assert_allclose(p, ref, rtol=1e-13)
    np.testing.assert_allclose(p * p_inv, 1.0, rtol=1e-13)
