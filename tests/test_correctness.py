"""Oracle-based correctness sweep, mirroring
`/root/reference/test/correctness.jl`: solver trajectories vs a
high-precision classic solve (scipy LSODA at rtol=1e-12 plays the
reference's BigFloat Tsit5 role). Trimmed cartesian product to keep
single-core compile time sane; the full math paths are all hit."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

import odefilters as odf

TSPAN = (0.0, 2.0)


@pytest.fixture(scope="module")
def prob():
    return odf.models.fitzhugh_nagumo(tspan=TSPAN)


def oracle(prob, ts):
    r = solve_ivp(
        lambda t, y: np.asarray(prob.f(y, prob.p, t)),
        prob.tspan,
        np.asarray(prob.u0),
        t_eval=np.asarray(ts),
        rtol=1e-12,
        atol=1e-12,
        method="LSODA",
    )
    return r.y.T


ADAPTIVE_CASES = [
    (odf.EK0, 2, "dynamic"),
    (odf.EK0, 3, "dynamicMV"),
    (odf.EK0, 3, "fixedMV"),
    (odf.EK1, 3, "dynamic"),
    (odf.EK1, 2, "fixed"),
    (odf.EK1, 3, "fixedMAP"),
]


@pytest.mark.parametrize("Alg,order,diffusion", ADAPTIVE_CASES)
def test_adaptive_correctness(prob, Alg, order, diffusion):
    """Adaptive steps, rtol 1e-3 vs oracle incl. dense output
    (test/correctness.jl:62-66)."""
    alg = Alg(order=order, diffusionmodel=diffusion)
    sol = odf.solve(prob, alg, abstol=1e-9, reltol=1e-8)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    u = np.asarray(sol.u[: n + 1])
    ref = oracle(prob, ts)
    np.testing.assert_allclose(u, ref, rtol=1e-3, atol=1e-5)

    # dense output on a uniform grid
    tq = np.linspace(0.05, 1.95, 20)
    g = sol(jnp.asarray(tq))
    np.testing.assert_allclose(np.asarray(g.mean), oracle(prob, tq), rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("Alg,order", [(odf.EK0, 3), (odf.EK1, 3)])
def test_fixed_step_correctness(prob, Alg, order):
    """Fixed dt=5e-3: rtol 1e-5 vs oracle (test/correctness.jl:33-35)."""
    sol = odf.solve_fixed(prob, Alg(order=order), dt=5e-3)
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    ref = oracle(prob, ts)
    np.testing.assert_allclose(np.asarray(sol.u[: n + 1]), ref, rtol=1e-5, atol=1e-8)


def test_oop_longer_solve(prob):
    """Longer horizon keeps calibrated accuracy (regression guard)."""
    p2 = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    sol = odf.solve(p2, odf.EK1(order=4), abstol=1e-10, reltol=1e-9)
    n = int(sol.n_steps)
    ref = oracle(p2, np.asarray(sol.ts[: n + 1]))
    np.testing.assert_allclose(np.asarray(sol.u[: n + 1]), ref, rtol=1e-5, atol=1e-7)
