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


# ---------------------------------------------------------------------------
# Alternative initialization schemes (later upstream: SimpleInit /
# ClassicSolverInit; v0.1.5 has Taylor-mode only)
# ---------------------------------------------------------------------------


def test_simple_init_blocks():
    """SimpleInit: exact (u0, f(u0)), N(0, I) prior on blocks 2..q."""
    lam = -1.3
    u0 = jnp.array([2.0, -0.5])

    def f(u, p, t):
        return lam * u

    x = taylor.initial_state(f, u0, None, 0.0, 3, method="simple")
    m = np.asarray(x.mean)
    np.testing.assert_allclose(m[:2], np.asarray(u0))
    np.testing.assert_allclose(m[2:4], lam * np.asarray(u0))
    np.testing.assert_array_equal(m[4:], 0.0)
    diag = np.diag(np.asarray(x.chol))
    np.testing.assert_array_equal(diag[:4], 0.0)
    np.testing.assert_array_equal(diag[4:], 1.0)


def test_classic_init_estimates_derivatives_with_honest_std():
    """ClassicSolverInit: the RK4-probe smoother estimates u^(k) = lam^k u0
    accurately, with a posterior std that covers the residual error."""
    lam = -1.3
    u0 = jnp.array([2.0])
    q = 4

    def f(u, p, t):
        return lam * u

    x = taylor.initial_state(f, u0, None, 0.0, q, method="classic")
    exact = np.array([lam**k * 2.0 for k in range(q + 1)])
    m = np.asarray(x.mean)
    std = np.sqrt(np.diag(np.asarray(x.chol @ x.chol.T)))
    np.testing.assert_allclose(m[:2], exact[:2], rtol=1e-12)  # known exactly
    np.testing.assert_allclose(m, exact, rtol=0.05)
    err = np.abs(m - exact)
    assert np.all(err <= 3.0 * std + 1e-6), (err, std)
    # the estimate is genuinely better than the SimpleInit zero guess
    assert err[2:].max() < 0.1 * np.abs(exact[2:]).max()


@pytest.mark.parametrize("method", ["simple", "classic"])
def test_alt_init_end_to_end(method):
    """Both uncertain inits reach oracle accuracy on FHN (the filter learns
    the missing derivatives within the first steps)."""
    import odefilters as odf
    from scipy.integrate import solve_ivp

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 10.0))
    sol = odf.solve(prob, odf.EK1(order=3), abstol=1e-8, reltol=1e-6,
                    taylor_method=method)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    p_np = np.asarray(prob.p, dtype=np.float64)

    def f_np(t, y):
        a, b, tinv, izero = p_np
        return np.array([y[0] - y[0] ** 3 / 3 - y[1] + izero,
                         tinv * (y[0] + a - b * y[1])])

    r = solve_ivp(f_np, (0.0, 10.0), np.asarray(prob.u0, dtype=np.float64),
                  t_eval=np.asarray(sol.ts[: n + 1]),
                  rtol=1e-12, atol=1e-12, method="LSODA")
    assert np.abs(np.asarray(sol.u[: n + 1]) - r.y.T).max() < 1e-5


def test_alt_init_rejected_on_structured_paths():
    import jax
    import odefilters as odf

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    with pytest.raises(ValueError, match="dense solver path"):
        odf.solve_fixed_kron(
            prob, odf.EK0(order=3), ts=jnp.linspace(0.0, 1.0, 9),
            taylor_method="classic",
        )
