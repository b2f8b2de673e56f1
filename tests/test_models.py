"""Model-library oracle checks for the benchmark-gallery problems
(upstream's benchmark suite models; v0.1.5 pulls its test problems from
DiffEqProblemLibrary — `/root/reference/test/correctness.jl:10-13`). Each
model solves end-to-end against a pure-numpy scipy oracle (LSODA/Radau at
rtol=1e-12, the BigFloat-Tsit5 stand-in)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

import odefilters as odf


def _oracle(f_np, prob, ts, method="LSODA"):
    r = solve_ivp(
        f_np, tuple(float(t) for t in prob.tspan),
        np.asarray(prob.u0, dtype=np.float64), t_eval=np.asarray(ts),
        rtol=1e-12, atol=1e-12, method=method,
    )
    assert r.success
    return r.y.T


def _solve_and_check(prob, f_np, alg, tol, method="LSODA", d=None):
    sol = odf.solve(prob, alg, abstol=1e-9, reltol=1e-7)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    ref = _oracle(f_np, prob, np.asarray(sol.ts[: n + 1]), method=method)
    u = np.asarray(sol.u[: n + 1])
    if d is not None:          # second-order solutions carry [u; du]
        u = u[:, :d]
    err = np.abs(u - ref).max()
    assert err < tol, err
    return sol


def test_lorenz63_oracle():
    prob = odf.models.lorenz63(tspan=(0.0, 2.0))

    def f_np(t, y):
        s, r, b = 10.0, 28.0, 8.0 / 3.0
        x, yy, z = y
        return [s * (yy - x), x * (r - z) - yy, x * yy - b * z]

    _solve_and_check(prob, f_np, odf.EK1(order=4), 2e-4)


def test_lorenz96_oracle():
    N = 10
    prob = odf.models.lorenz96(N=N, tspan=(0.0, 1.0))

    def f_np(t, y):
        return (np.roll(y, -1) - np.roll(y, 2)) * np.roll(y, 1) - y + 8.0

    _solve_and_check(prob, f_np, odf.EK1(order=3), 5e-4)


def test_rober_stiff_oracle():
    prob = odf.models.rober(tspan=(0.0, 100.0))

    def f_np(t, y):
        y1, y2, y3 = y
        r1, r2, r3 = 0.04 * y1, 3e7 * y2 * y2, 1e4 * y2 * y3
        return [-r1 + r3, r1 - r2 - r3, r2]

    def jac_np(t, y):
        y1, y2, y3 = y
        return [
            [-0.04, 1e4 * y3, 1e4 * y2],
            [0.04, -6e7 * y2 - 1e4 * y3, -1e4 * y2],
            [0.0, 6e7 * y2, 0.0],
        ]

    sol = odf.solve(prob, odf.EK1(order=3), abstol=1e-10, reltol=1e-8)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    r = solve_ivp(f_np, (0.0, 100.0), [1.0, 0.0, 0.0],
                  t_eval=np.asarray(sol.ts[: n + 1]), rtol=1e-12, atol=1e-14,
                  method="Radau", jac=jac_np)
    assert r.success
    assert np.abs(np.asarray(sol.u[: n + 1]) - r.y.T).max() < 1e-6
    # mass conservation (y1+y2+y3 = 1) should hold to solver accuracy
    assert np.abs(np.asarray(sol.u[: n + 1]).sum(axis=1) - 1.0).max() < 1e-7


def test_rigid_body_oracle_and_invariant():
    prob = odf.models.rigid_body(tspan=(0.0, 10.0))

    def f_np(t, y):
        return [-2.0 * y[1] * y[2], 1.25 * y[0] * y[2], -0.5 * y[0] * y[1]]

    sol = _solve_and_check(prob, f_np, odf.EK1(order=4), 1e-6)
    n = int(sol.n_steps)
    # with rates (i1, i2, i3) = (-2, 1.25, -0.5) the exact flow conserves
    # the weighted norm w . u^2 for any w with w . i = 0, e.g. (1, 2, 1)
    u = np.asarray(sol.u[: n + 1])
    nrm = u[:, 0] ** 2 + 2 * u[:, 1] ** 2 + u[:, 2] ** 2
    assert np.abs(nrm - nrm[0]).max() < 1e-6


def test_orego_stiff_oracle():
    prob = odf.models.orego(tspan=(0.0, 30.0))

    def f_np(t, y):
        s, w, qp = 77.27, 8.375e-6, 0.161
        y1, y2, y3 = y
        return [s * (y2 + y1 * (1 - w * y1 - y2)),
                (y3 - (1 + y1) * y2) / s, qp * (y1 - y3)]

    sol = odf.solve(prob, odf.EK1(order=4), abstol=1e-10, reltol=1e-8,
                    max_steps=16384)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    r = solve_ivp(f_np, (0.0, 30.0), [1.0, 2.0, 3.0],
                  t_eval=np.asarray(sol.ts[: n + 1]), rtol=1e-12, atol=1e-12,
                  method="Radau")
    assert r.success
    # states span ~5 orders of magnitude over the BZ spike; compare
    # relative to the per-component scale
    scale = np.abs(r.y.T).max(axis=0)
    assert (np.abs(np.asarray(sol.u[: n + 1]) - r.y.T) / scale).max() < 1e-5


def test_hodgkin_huxley_oracle():
    prob = odf.models.hodgkin_huxley(tspan=(0.0, 20.0))

    def f_np(t, y):
        V, m, h, n = y
        a_m = 0.1 * (V + 40.0) / (1.0 - np.exp(-(V + 40.0) / 10.0))
        b_m = 4.0 * np.exp(-(V + 65.0) / 18.0)
        a_h = 0.07 * np.exp(-(V + 65.0) / 20.0)
        b_h = 1.0 / (1.0 + np.exp(-(V + 35.0) / 10.0))
        a_n = 0.01 * (V + 55.0) / (1.0 - np.exp(-(V + 55.0) / 10.0))
        b_n = 0.125 * np.exp(-(V + 65.0) / 80.0)
        dV = (10.0 - 120.0 * m**3 * h * (V - 50.0)
              - 36.0 * n**4 * (V + 77.0) - 0.3 * (V + 54.4))
        return [dV, a_m * (1 - m) - b_m * m, a_h * (1 - h) - b_h * h,
                a_n * (1 - n) - b_n * n]

    sol = odf.solve(prob, odf.EK1(order=4), abstol=1e-9, reltol=1e-7)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    r = solve_ivp(f_np, (0.0, 20.0), [-70.0, 0.05, 0.6, 0.32],
                  t_eval=np.asarray(sol.ts[: n + 1]), rtol=1e-12, atol=1e-12,
                  method="LSODA")
    assert r.success
    # V spikes to ~+40 mV; absolute error in mV units
    assert np.abs(np.asarray(sol.u[: n + 1]) - r.y.T).max() < 2e-3


def test_pleiades_second_order_oracle():
    prob = odf.models.pleiades(tspan=(0.0, 3.0))
    m = np.arange(1.0, 8.0)

    def f_np(t, y):
        x, yy, vx, vy = y[:7], y[7:14], y[14:21], y[21:]
        dx = x[None, :] - x[:, None]
        dy = yy[None, :] - yy[:, None]
        r2 = dx * dx + dy * dy + np.eye(7)
        w = m[None, :] / (r2 * np.sqrt(r2)) * (1.0 - np.eye(7))
        return np.concatenate([vx, vy, (w * dx).sum(1), (w * dy).sum(1)])

    sol = odf.solve(prob, odf.EK1(order=4), abstol=1e-9, reltol=1e-7,
                    max_steps=16384)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    y0 = np.concatenate([np.asarray(prob.u0, dtype=np.float64)[:14],
                         np.asarray(prob.u0, dtype=np.float64)[14:]])
    r = solve_ivp(f_np, (0.0, 3.0), y0, t_eval=np.asarray(sol.ts[: n + 1]),
                  rtol=1e-12, atol=1e-12, method="LSODA")
    assert r.success
    # positions (u block of the [u; du] solution)
    assert np.abs(np.asarray(sol.u[: n + 1, :14]) - r.y.T[:, :14]).max() < 1e-4


def test_new_models_well_formed():
    """Every library model constructs and evaluates its field (and
    Jacobian, where supplied) at (u0, t0)."""
    for name in odf.models.__all__:
        ctor = getattr(odf.models, name)
        prob = ctor()
        if prob.second_order:
            du = prob.f(prob.u0[prob.d:], prob.u0[: prob.d], prob.p,
                        prob.tspan[0])
        else:
            du = prob.f(prob.u0, prob.p, prob.tspan[0])
        assert du.shape == (prob.d,)
        assert bool(jnp.all(jnp.isfinite(du)))
        if prob.jac is not None and not prob.second_order:
            J = prob.jac(prob.u0, prob.p, prob.tspan[0])
            assert J.shape == (prob.d, prob.d)


def test_rober_dae_matches_ode_form():
    """The index-1 DAE formulation (mass_matrix=diag(1,1,0)) agrees with
    the ODE-form rober solve — same chemistry, constraint-eliminated."""
    probd = odf.models.rober_dae(tspan=(0.0, 50.0))
    probo = odf.models.rober(tspan=(0.0, 50.0))
    # analytic jac of the DAE residual matches jacfwd
    J = probd.jac(probd.u0, probd.p, 0.0)
    Jf = jax.jacfwd(lambda u: probd.f(u, probd.p, 0.0))(probd.u0)
    np.testing.assert_allclose(np.asarray(J), np.asarray(Jf), rtol=1e-12)
    sd = odf.solve(probd, odf.EK1(order=3), abstol=1e-9, reltol=1e-8)
    so = odf.solve(probo, odf.EK1(order=3), abstol=1e-9, reltol=1e-8)
    assert sd.retcode_name == "Success"
    ud = np.asarray(sd.u[int(sd.n_steps)])
    uo = np.asarray(so.u[int(so.n_steps)])
    assert np.abs(ud - uo).max() < 1e-7
    assert abs(ud.sum() - 1.0) < 1e-12
