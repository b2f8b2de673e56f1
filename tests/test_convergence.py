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
