"""DiagonalEK1: EK1 with a diagonal first-order linearization.

Beyond the reference (v0.1.5 ships only EK0/EK1); the algorithm is from
Kraemer, Bosch, Schmidt, Hennig: "Probabilistic ODE Solutions in Millions
of Dimensions" (ICML 2022). Test strategy:

1. exactness: on a problem whose Jacobian IS diagonal, DiagonalEK1 must be
   bit-identical to the dense EK1 (the linearizations coincide);
2. per-dimension fast path: the Kronecker driver must match the dense
   driver on a *coupled* nonlinear problem for every diffusion model
   (dense and per-dim paths implement the same math two ways);
3. oracle + convergence + stiffness: LSODA cross-check, empirical order,
   and the paper's selling point — fewer steps than EK0 on a stiff
   diagonal-dominant semi-discretized PDE.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

import odefilters as odf
from odefilters.problem import ode_problem_2nd
from odefilters.kronsolve import (
    sample as kron_sample,
    solve_adaptive_kron,
    solve_fixed_kron,
)

DIFFUSIONS = ["dynamic", "dynamicMV", "fixed", "fixedMV", "fixedMAP"]


def _lv_problem(tmax=7.0, jac_mode="diag"):
    def f(u, p, t):
        return jnp.array(
            [p[0] * u[0] - p[1] * u[0] * u[1], -p[2] * u[1] + p[3] * u[0] * u[1]]
        )

    def jac(u, p, t):
        return jnp.array(
            [
                [p[0] - p[1] * u[1], -p[1] * u[0]],
                [p[3] * u[1], -p[2] + p[3] * u[0]],
            ]
        )

    def jd(u, p, t):
        return jnp.array([p[0] - p[1] * u[1], -p[2] + p[3] * u[0]])

    p = (1.5, 1.0, 3.0, 1.0)
    kw = {}
    if jac_mode == "diag":
        kw["jac_diag"] = jd
    elif jac_mode == "full":
        kw["jac"] = jac
    return odf.ode_problem(f, jnp.array([1.0, 1.0]), (0.0, tmax), p=p, **kw)


def test_equals_ek1_when_jacobian_is_diagonal():
    """Decoupled linear system: diag(J) == J, so DiagonalEK1 == EK1 exactly
    (same steps, same states) on the dense path."""
    lam = jnp.array([-0.5, -80.0, -3.0])
    prob = odf.ode_problem(
        lambda u, p, t: lam * u,
        jnp.ones(3),
        (0.0, 1.0),
        jac=lambda u, p, t: jnp.diag(lam),
        jac_diag=lambda u, p, t: lam,
    )
    s1 = odf.solve(prob, odf.EK1(order=3), abstol=1e-8, reltol=1e-8)
    s2 = odf.solve(prob, odf.DiagonalEK1(order=3), abstol=1e-8, reltol=1e-8)
    n = int(s1.n_steps)
    assert int(s2.n_steps) == n
    np.testing.assert_array_equal(
        np.asarray(s1.u)[: n + 1], np.asarray(s2.u)[: n + 1]
    )
    # and both hit the analytic solution
    exact = np.exp(np.asarray(lam))
    assert abs(np.asarray(s2.u)[n] - exact).max() < 1e-8


@pytest.mark.parametrize("dm", DIFFUSIONS)
def test_kron_matches_dense(dm):
    """Per-dimension Kronecker driver == dense driver on coupled LV, for
    every diffusion model (adaptive grids, so step counts must agree too)."""
    prob = _lv_problem()
    alg = odf.DiagonalEK1(order=3, diffusionmodel=dm)
    sd = odf.solve(prob, alg, abstol=1e-8, reltol=1e-6)
    sk = solve_adaptive_kron(prob, alg, abstol=1e-8, reltol=1e-6)
    n = int(sd.n_steps)
    assert int(sk.n_steps) == n
    np.testing.assert_allclose(
        np.asarray(sk.u)[: n + 1], np.asarray(sd.u)[: n + 1],
        rtol=0, atol=1e-7,
    )
    lld, llk = float(sd.log_likelihood), float(sk.log_likelihood)
    if np.isfinite(lld):
        assert abs(lld - llk) < 1e-5 * max(1.0, abs(lld))
    else:  # static models report NaN ll (reference parity)
        assert not np.isfinite(llk)


def test_jac_diag_resolution_fallbacks():
    """jac_diag > diagonal(jac) > diagonal(jacfwd) all give the same solve."""
    sols = []
    for mode in ["diag", "full", "none"]:
        prob = _lv_problem(jac_mode=mode)
        s = solve_adaptive_kron(
            prob, odf.DiagonalEK1(order=3), abstol=1e-8, reltol=1e-6
        )
        sols.append((int(s.n_steps), np.asarray(s.u)))
    n = sols[0][0]
    for ns, u in sols[1:]:
        assert ns == n
        np.testing.assert_allclose(u[: n + 1], sols[0][1][: n + 1], atol=1e-10)


def test_kron_dense_output_and_sampling():
    """Dense output of the per-dim path matches the dense solver
    mid-interval; posterior samples are finite and hug the posterior."""
    prob = _lv_problem()
    alg = odf.DiagonalEK1(order=3, smooth=True)
    sd = odf.solve(prob, alg, abstol=1e-8, reltol=1e-6)
    sk = solve_adaptive_kron(prob, alg, abstol=1e-8, reltol=1e-6)
    tq = jnp.linspace(0.3, 6.7, 9)
    uk, stdk = sk(tq)
    ud = sd(tq).mean[:, :2]
    np.testing.assert_allclose(np.asarray(uk), np.asarray(ud), atol=1e-8)

    samps = kron_sample(jax.random.PRNGKey(0), sk, n=4)
    n = int(sk.n_steps)
    arr = np.asarray(samps)[: n + 1]
    assert np.isfinite(arr).all()
    # samples stay within ~6 sigma + solver error of the posterior mean
    u = np.asarray(sk.u)[: n + 1]
    std = np.asarray(sk.u_std)[: n + 1]
    dev = np.abs(arr - u[:, :, None])
    assert (dev <= 6 * std[:, :, None] + 1e-6).all()


def test_oracle_lsoda():
    """Adaptive per-dim DiagonalEK1 vs LSODA, mirroring the oracle tier of
    `/root/reference/test/correctness.jl:15-71`."""
    prob = _lv_problem()
    sk = solve_adaptive_kron(
        prob, odf.DiagonalEK1(order=4), abstol=1e-9, reltol=1e-8
    )
    n = int(sk.n_steps)
    ts = np.asarray(sk.ts)[: n + 1]
    p = (1.5, 1.0, 3.0, 1.0)

    def f_np(t, u):
        return [
            p[0] * u[0] - p[1] * u[0] * u[1],
            -p[2] * u[1] + p[3] * u[0] * u[1],
        ]

    ref = solve_ivp(
        f_np, (0.0, 7.0), [1.0, 1.0], method="LSODA", t_eval=ts,
        rtol=1e-11, atol=1e-11,
    )
    err = np.abs(np.asarray(sk.u)[: n + 1] - ref.y.T).max()
    assert err < 1e-5


def test_convergence_order():
    """Empirical fixed-grid convergence ~ q+1 (same rate as EK1;
    mirrors `/root/reference/test/convergence.jl:17-38`)."""
    lam = jnp.array([-1.0, -2.0])
    prob = odf.ode_problem(
        lambda u, p, t: lam * u, jnp.ones(2), (0.0, 2.0),
        jac_diag=lambda u, p, t: lam,
    )
    q = 2
    errs = []
    dts = [0.2, 0.1, 0.05]
    for dt in dts:
        s = solve_fixed_kron(prob, odf.DiagonalEK1(order=q, smooth=False), dt=dt)
        exact = np.exp(np.outer(np.asarray(s.ts), np.asarray(lam)))
        errs.append(np.abs(np.asarray(s.u) - exact).max())
    rates = [
        np.log(errs[i] / errs[i + 1]) / np.log(dts[i] / dts[i + 1])
        for i in range(len(dts) - 1)
    ]
    assert min(rates) > q + 0.5  # observed ~q+1


def test_fewer_steps_than_ek0_on_stiff_rd():
    """The paper's point: on a stiff diagonal-dominant reaction-diffusion
    system the diagonal linearization needs far fewer steps than EK0 at
    equal tolerance, at the same O(d q^3) per-step cost."""
    d = 48
    dx = 1.0 / (d + 1)
    nu = 0.05 / dx**2

    def f(u, p, t):
        lap = jnp.roll(u, 1) - 2 * u + jnp.roll(u, -1)
        return p[0] * lap + u * (1 - u) * (u - 0.1)

    def jdg(u, p, t):
        return -2 * p[0] + (1 - u) * (u - 0.1) - u * (u - 0.1) + u * (1 - u)

    u0 = jnp.exp(-100 * (jnp.linspace(0, 1, d) - 0.5) ** 2)
    prob = odf.ode_problem(f, u0, (0.0, 1.0), p=(nu,), jac_diag=jdg)

    n0 = int(
        solve_adaptive_kron(
            prob, odf.EK0(order=3, smooth=False), abstol=1e-6, reltol=1e-3,
            max_steps=16384, maxiters=100_000,
        ).n_steps
    )
    n1 = int(
        solve_adaptive_kron(
            prob, odf.DiagonalEK1(order=3, smooth=False), abstol=1e-6,
            reltol=1e-3, max_steps=16384, maxiters=100_000,
        ).n_steps
    )
    assert n1 < 0.7 * n0, (n1, n0)


def test_second_order_dense_path():
    """2nd-order problems run DiagonalEK1 on the dense path; with a
    diagonal true Jacobian it equals the full EK1 (harmonic oscillator:
    J_u = -I, J_du = 0)."""
    prob = ode_problem_2nd(
        lambda du, u, p, t: -u, jnp.array([1.0, 0.5]), jnp.zeros(2), (0.0, 3.0)
    )
    s1 = odf.solve(prob, odf.EK1(order=3), abstol=1e-8, reltol=1e-8)
    s2 = odf.solve(prob, odf.DiagonalEK1(order=3), abstol=1e-8, reltol=1e-8)
    n = int(s1.n_steps)
    assert int(s2.n_steps) == n
    np.testing.assert_allclose(
        np.asarray(s2.u)[: n + 1], np.asarray(s1.u)[: n + 1], atol=1e-12
    )


def test_time_parallel_accepts_diagonal():
    """Converged time-parallel solve with DiagonalEK1 == the sequential
    fixed-grid solve on the same grid (dense elements, diagonal
    linearization — mirrors test_parallel.py's EK1 check)."""
    from odefilters.parallel.associative import solve_fixed_parallel

    prob = _lv_problem(tmax=2.0)
    sd = odf.solve_fixed(
        prob, odf.DiagonalEK1(order=3, diffusionmodel="fixed"), dt=2.0 / 128
    )
    # the diagonal linearization relinearizes Picard-like in the
    # off-diagonal couplings (linear convergence, like EK0): warm-started
    # by default, ~16 sweeps reach ~1e-5 on this span (measured: cold 8
    # sweeps leave 5.7e-2, warm 8 leave 6.5e-4, cold 24 reach 1.2e-5)
    u_par, *_ = solve_fixed_parallel(
        prob, odf.DiagonalEK1(order=3), dt=2.0 / 128, iterations=16
    )
    n = int(sd.n_steps)
    np.testing.assert_allclose(
        np.asarray(u_par), np.asarray(sd.u)[: n + 1], atol=2e-4
    )


def test_api_errors():
    # MV diffusions allowed with DiagonalEK1 (per-dim structure preserved)
    odf.DiagonalEK1(diffusionmodel="dynamicMV")
    odf.DiagonalEK1(diffusionmodel="fixedMV")
    # ... but still rejected for the dense EK1
    with pytest.raises(ValueError):
        odf.EK1(diffusionmodel="dynamicMV")
    # second-order problems are dense-path-only for DiagonalEK1
    prob2 = ode_problem_2nd(
        lambda du, u, p, t: -u, jnp.ones(2), jnp.zeros(2), (0.0, 1.0)
    )
    with pytest.raises(NotImplementedError):
        solve_adaptive_kron(prob2, odf.DiagonalEK1(order=3))
