"""State-init exactness, mirroring `/root/reference/test/state_init.jl`:
Taylor derivatives up to q=6 against hand-derived solutions."""

import jax.numpy as jnp
import numpy as np
import pytest

from odefilters import taylor
from odefilters.linalg import Gaussian


@pytest.mark.parametrize("method", ["jvp", "jet"])
@pytest.mark.parametrize("q", [1, 3, 6])
def test_exponential_derivatives(method, q):
    """u' = a u  =>  u^(k) = a^k u0 (cf. test/state_init.jl:9-45)."""
    a = -0.7
    u0 = jnp.array([1.0, 2.0])

    def f(u, p, t):
        return p * u

    derivs = taylor.taylor_coefficients(f, u0, a, 0.0, q, method=method)
    assert len(derivs) == q + 1
    for k, dk in enumerate(derivs):
        np.testing.assert_allclose(dk, (a**k) * u0, rtol=1e-12)


@pytest.mark.parametrize("method", ["jvp", "jet"])
def test_logistic_derivatives(method):
    """Nonlinear check: logistic u' = u(1-u), closed-form derivatives."""
    u0v = 0.23
    u0 = jnp.array([u0v])

    def f(u, p, t):
        return u * (1 - u)

    derivs = taylor.taylor_coefficients(f, u0, None, 0.0, 3, method=method)
    d1 = u0v * (1 - u0v)
    d2 = d1 * (1 - 2 * u0v)
    d3 = d2 * (1 - 2 * u0v) - 2 * d1 * d1
    np.testing.assert_allclose(derivs[1], [d1], rtol=1e-12)
    np.testing.assert_allclose(derivs[2], [d2], rtol=1e-12)
    np.testing.assert_allclose(derivs[3], [d3], rtol=1e-12)


@pytest.mark.parametrize("method", ["jvp", "jet"])
def test_time_dependent_field(method):
    """u' = t (the reference *asserts this away*,
    state_initialization.jl:22; we support it via augmentation):
    u'' = 1, u''' = 0."""
    u0 = jnp.array([5.0])

    def f(u, p, t):
        return jnp.full_like(u, t)

    derivs = taylor.taylor_coefficients(f, u0, None, 2.0, 3, method=method)
    np.testing.assert_allclose(derivs[1], [2.0], rtol=1e-12)
    np.testing.assert_allclose(derivs[2], [1.0], atol=1e-12)
    np.testing.assert_allclose(derivs[3], [0.0], atol=1e-12)


def test_jet_matches_jvp_high_order():
    def f(u, p, t):
        return jnp.stack([u[1], -jnp.sin(u[0])])  # pendulum

    u0 = jnp.array([0.3, -0.2])
    a = taylor.taylor_coefficients(f, u0, None, 0.0, 7, method="jvp")
    b = taylor.taylor_coefficients(f, u0, None, 0.0, 7, method="jet")
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, rtol=1e-9, atol=1e-12)


def test_initial_state_zero_cov():
    """Conditioning on all derivative blocks collapses cov to zero
    (test/solution.jl: 'zero initial cov')."""

    def f(u, p, t):
        return -u

    x0 = taylor.initial_state(f, jnp.array([1.0, 2.0]), None, 0.0, 2)
    assert isinstance(x0, Gaussian)
    np.testing.assert_allclose(x0.chol, 0.0)
    np.testing.assert_allclose(x0.mean, [1.0, 2.0, -1.0, -2.0, 1.0, 2.0])
