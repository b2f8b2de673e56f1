"""Oracle-based correctness sweep, mirroring
`/root/reference/test/correctness.jl:15-71`: the COMPLETE cartesian product
{EK0, EK1} x 5 diffusion models x q in {1,3,5} fixed-step / {2,4,6}
adaptive (incl. dense output), EK1 x MV combos excluded exactly as the
reference excludes them (`test/correctness.jl:27,56`). Solver trajectories
are compared against a high-precision classic solve (scipy LSODA at
rtol=1e-12 plays the reference's BigFloat Tsit5 role). The full product
runs on FitzHugh-Nagumo; Lotka-Volterra (the reference's second problem)
cross-checks every algorithm/diffusion combo at one fixed and one adaptive
order."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

import odefilters as odf

TSPAN = (0.0, 2.0)

# {EK0, EK1} x diffusions, EK1 x {fixedMV, dynamicMV} excluded
# (MV diffusions assert EK0 structure, `src/diffusions.jl:96-97,126-127`)
ALG_DIFFUSION = [
    (odf.EK0, "fixed"),
    (odf.EK0, "dynamic"),
    (odf.EK0, "fixedMAP"),
    (odf.EK0, "fixedMV"),
    (odf.EK0, "dynamicMV"),
    (odf.EK1, "fixed"),
    (odf.EK1, "dynamic"),
    (odf.EK1, "fixedMAP"),
]

FIXED_ORDERS = [1, 3, 5]
ADAPTIVE_ORDERS = [2, 4, 6]


@pytest.fixture(scope="module")
def prob():
    return odf.models.fitzhugh_nagumo(tspan=TSPAN)


@pytest.fixture(scope="module")
def prob_lv():
    return odf.models.lotka_volterra(tspan=(0.0, 3.0))


def _np_rhs(prob):
    """Pure-numpy RHS for the oracle (CLAUDE.md: routing the oracle RHS
    through JAX costs a dispatch per evaluation — minutes for LSODA)."""
    p = np.asarray(prob.p, dtype=np.float64)
    if len(p) == 4 and float(p[2]) < 1.0:        # FitzHugh-Nagumo
        a, b, tinv, iz = p

        def f(t, y):
            v, w = y
            return [v - v**3 / 3 - w + iz, tinv * (v + a - b * w)]

        return f
    a, b, c, d_ = p                              # Lotka-Volterra

    def f(t, y):
        x, yy = y
        return [a * x - b * x * yy, -c * yy + d_ * x * yy]

    return f


def oracle(prob, ts):
    r = solve_ivp(
        _np_rhs(prob),
        prob.tspan,
        np.asarray(prob.u0, dtype=np.float64),
        t_eval=np.asarray(ts, dtype=np.float64),
        rtol=1e-12,
        atol=1e-12,
        method="LSODA",
    )
    return r.y.T


def _check_adaptive(prob, Alg, order, diffusion):
    # reltol 1e-7: the static-diffusion local error statistic z^T S^-1 z
    # (`diffusions.jl:12-36,115-153`, mirrored exactly here) deflates as S
    # absorbs state covariance at high order, so q=6 static cells deliver
    # ~50x looser trajectory error than reltol — solve tight, assert at the
    # reference's 1e-3 (`test/correctness.jl:66`).
    alg = Alg(order=order, diffusionmodel=diffusion)
    sol = odf.solve(prob, alg, abstol=1e-9, reltol=1e-7, max_steps=1024)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    u = np.asarray(sol.u[: n + 1])
    ref = oracle(prob, ts)
    np.testing.assert_allclose(u, ref, rtol=1e-3, atol=1e-5)

    # dense output on a uniform grid (`test/correctness.jl:62-66`)
    t0, t1 = prob.tspan
    tq = np.linspace(t0 + 0.025, t1 - 0.025, 20)
    g = sol(jnp.asarray(tq))
    np.testing.assert_allclose(
        np.asarray(g.mean), oracle(prob, tq), rtol=1e-3, atol=1e-5
    )


def _check_fixed(prob, Alg, order, diffusion):
    alg = Alg(order=order, diffusionmodel=diffusion)
    sol = odf.solve_fixed(prob, alg, dt=5e-3)
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    ref = oracle(prob, ts)
    np.testing.assert_allclose(
        np.asarray(sol.u[: n + 1]), ref, rtol=1e-5, atol=1e-8
    )


@pytest.mark.parametrize("order", ADAPTIVE_ORDERS)
@pytest.mark.parametrize("Alg,diffusion", ALG_DIFFUSION)
def test_adaptive_correctness(prob, Alg, order, diffusion):
    """Adaptive steps, rtol 1e-3 vs oracle incl. dense output
    (test/correctness.jl:44-71)."""
    _check_adaptive(prob, Alg, order, diffusion)


@pytest.mark.parametrize("order", FIXED_ORDERS)
@pytest.mark.parametrize("Alg,diffusion", ALG_DIFFUSION)
def test_fixed_step_correctness(prob, Alg, order, diffusion):
    """Fixed dt=5e-3: rtol 1e-5 vs oracle (test/correctness.jl:15-40)."""
    _check_fixed(prob, Alg, order, diffusion)


@pytest.mark.parametrize("Alg,diffusion", ALG_DIFFUSION)
def test_lotka_volterra_cross_check(prob_lv, Alg, diffusion):
    """The reference's second sweep problem: every algorithm/diffusion
    combo at one fixed (q=3) and one adaptive (q=4) order."""
    _check_fixed(prob_lv, Alg, 3, diffusion)
    _check_adaptive(prob_lv, Alg, 4, diffusion)


def test_oop_longer_solve(prob):
    """Longer horizon keeps calibrated accuracy (regression guard)."""
    p2 = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    sol = odf.solve(p2, odf.EK1(order=4), abstol=1e-10, reltol=1e-9)
    n = int(sol.n_steps)
    ref = oracle(p2, np.asarray(sol.ts[: n + 1]))
    np.testing.assert_allclose(
        np.asarray(sol.u[: n + 1]), ref, rtol=1e-5, atol=1e-7
    )
