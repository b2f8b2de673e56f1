"""Convergence-order tests, mirroring `/root/reference/test/convergence.jl`:
empirical order ~ q+1 on a scalar linear problem."""

import numpy as np
import pytest

import odefilters as odf


def empirical_order(Alg, order, dts):
    prob = odf.models.logistic(u0=(0.1,), p=(2.0,), tspan=(0.0, 1.0))
    errs = []
    for dt in dts:
        sol = odf.solve_fixed(prob, Alg(order=order, smooth=False), dt=dt)
        n = int(sol.n_steps)
        ref = np.asarray(
            prob.analytic(prob.u0, prob.p, sol.ts[n])
        )
        errs.append(abs(float(sol.u[n, 0]) - float(ref[0])))
    errs = np.array(errs)
    slopes = np.diff(np.log(errs)) / np.diff(np.log(np.asarray(dts)))
    return slopes.mean()


@pytest.mark.parametrize("order", [1, 2, 3])
def test_ek0_convergence_order(order):
    """Empirical order ≈ q+1 within 0.3 (test/convergence.jl:17-30)."""
    dts = [0.1, 0.05, 0.025, 0.0125]
    p = empirical_order(odf.EK0, order, dts)
    assert abs(p - (order + 1)) < 0.35, f"EK0({order}): got order {p:.2f}"


@pytest.mark.parametrize("order", [2, 3])
def test_ek1_convergence_order(order):
    dts = [0.1, 0.05, 0.025, 0.0125]
    p = empirical_order(odf.EK1, order, dts)
    assert abs(p - (order + 1)) < 0.35, f"EK1({order}): got order {p:.2f}"


def test_high_order_ek1():
    """q=5 at loose grid still beats q=2 at fine grid (high-order payoff);
    also exercises the jet-based init auto-selection at q=6."""
    prob = odf.models.logistic(u0=(0.1,), p=(2.0,), tspan=(0.0, 1.0))
    s5 = odf.solve_fixed(prob, odf.EK1(order=5, smooth=False), dt=0.1)
    s2 = odf.solve_fixed(prob, odf.EK1(order=2, smooth=False), dt=0.025)
    ref = float(prob.analytic(prob.u0, prob.p, 1.0)[0])
    e5 = abs(float(s5.u[-1, 0]) - ref)
    e2 = abs(float(s2.u[-1, 0]) - ref)
    assert e5 < e2
    s6 = odf.solve(prob, odf.EK1(order=6), abstol=1e-10, reltol=1e-9)
    assert s6.retcode_name == "Success"
    n = int(s6.n_steps)
    assert abs(float(s6.u[n, 0]) - ref) < 1e-8
