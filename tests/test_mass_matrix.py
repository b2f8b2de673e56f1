"""Mass-matrix problems ``M u' = f(u, p, t)`` incl. index-1 DAEs.

Later-upstream ProbNumDiffEq feature (the pinned v0.1.5 reference has
none): the filter measures ``z = M E1 x - f`` with ``H = (M E1 - J E0)
P^-1``; a singular M states an index-1 DAE whose algebraic rows are
enforced by the EK1 update. Oracles are scipy BDF on the classic ODE
forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf
from odefilters.algorithms import EK0, EK1
from odefilters.problem import mass_state_space_f


def _lv(u, p, t):
    a, b, c, d = p
    return jnp.array([a * u[0] - b * u[0] * u[1], -c * u[1] + d * u[0] * u[1]])


_LV_P = (1.5, 1.0, 3.0, 1.0)


def _rober_dae(y, p, t):
    k1, k2, k3 = p
    return jnp.array(
        [
            -k1 * y[0] + k3 * y[1] * y[2],
            k1 * y[0] - k2 * y[1] ** 2 - k3 * y[1] * y[2],
            y[0] + y[1] + y[2] - 1.0,
        ]
    )


_ROBER_P = (0.04, 3e7, 1e4)


def _rober_oracle(t1):
    from scipy.integrate import solve_ivp

    k1, k2, k3 = _ROBER_P

    def f(t, y):
        return [
            -k1 * y[0] + k3 * y[1] * y[2],
            k1 * y[0] - k2 * y[1] ** 2 - k3 * y[1] * y[2],
            k2 * y[1] ** 2,
        ]

    ref = solve_ivp(f, (0.0, t1), [1.0, 0.0, 0.0], method="BDF",
                    rtol=1e-10, atol=1e-12)
    return ref.y[:, -1]


def test_nonsingular_mass_equals_plain_ode():
    """M u' = M g(u) must reproduce u' = g(u) (nonsingular diagonal M)."""
    M = jnp.array([2.0, 0.5])

    def lv_m(u, p, t):
        return M * _lv(u, p, t)

    prob0 = odf.ode_problem(_lv, [1.0, 1.0], (0.0, 7.0), p=_LV_P)
    probM = odf.ode_problem(lv_m, [1.0, 1.0], (0.0, 7.0), p=_LV_P,
                            mass_matrix=M)
    for alg in (EK1(order=3), EK0(order=3)):
        s0 = odf.solve(prob0, alg, abstol=1e-9, reltol=1e-7)
        sM = odf.solve(probM, alg, abstol=1e-9, reltol=1e-7)
        n0, nM = int(s0.n_steps), int(sM.n_steps)
        assert sM.retcode_name == "Success"
        # step sequences differ (the error estimate diag(H Q H^T) is not
        # invariant under row scaling), but the solutions must agree
        assert float(jnp.abs(s0.u[n0] - sM.u[nM]).max()) < 1e-6


def test_identity_mass_matches_no_mass():
    prob0 = odf.ode_problem(_lv, [1.0, 1.0], (0.0, 5.0), p=_LV_P)
    probI = odf.ode_problem(_lv, [1.0, 1.0], (0.0, 5.0), p=_LV_P,
                            mass_matrix=jnp.eye(2))
    s0 = odf.solve(prob0, EK1(order=3))
    sI = odf.solve(probI, EK1(order=3))
    n = int(s0.n_steps)
    assert int(sI.n_steps) == n
    # identical step sequence; ~1e-11 value drift from the extra I @ x
    # matmuls re-associating the accumulation order
    np.testing.assert_allclose(s0.u[: n + 1], sI.u[: n + 1],
                               rtol=1e-9, atol=1e-9)


def test_rober_dae_vs_bdf_oracle():
    """The classic ROBER index-1 DAE: M = diag(1, 1, 0), EK1.

    Upstream solves this with EK1 + mass matrix (their DAE tutorial);
    v0.1.5 cannot. Accuracy vs scipy BDF at rtol=1e-10, and the algebraic
    constraint must hold at machine precision at every saved point.
    """
    prob = odf.ode_problem(
        _rober_dae, [1.0, 0.0, 0.0], (0.0, 100.0), p=_ROBER_P,
        mass_matrix=jnp.array([1.0, 1.0, 0.0]),
    )
    sol = odf.solve(prob, EK1(order=3), abstol=1e-8, reltol=1e-8)
    n = int(sol.n_steps)
    assert sol.retcode_name == "Success"
    u_end = np.asarray(sol.u[n])
    assert np.max(np.abs(u_end - _rober_oracle(100.0))) < 1e-7
    us = np.asarray(sol.u[: n + 1])
    assert np.max(np.abs(us.sum(axis=1) - 1.0)) < 1e-12


def test_rober_dae_smoothed_and_dense_output():
    prob = odf.ode_problem(
        _rober_dae, [1.0, 0.0, 0.0], (0.0, 10.0), p=_ROBER_P,
        mass_matrix=jnp.array([1.0, 1.0, 0.0]),
    )
    sol = odf.solve(prob, EK1(order=3, smooth=True), abstol=1e-8, reltol=1e-8)
    assert sol.retcode_name == "Success"
    from odefilters.solution import evaluate

    u10 = np.asarray(evaluate(sol, 10.0).mean[:3])
    assert np.max(np.abs(u10 - _rober_oracle(10.0))) < 1e-7
    # dense output between grid points stays near the manifold
    u_mid = np.asarray(evaluate(sol, 5.05).mean[:3])
    assert abs(u_mid.sum() - 1.0) < 1e-6


def test_dense_singular_mass_matrix_form():
    """The same DAE posed with a DENSE (rank-deficient) mass matrix."""
    M = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    prob = odf.ode_problem(_rober_dae, [1.0, 0.0, 0.0], (0.0, 1.0),
                           p=_ROBER_P, mass_matrix=M)
    sol = odf.solve(prob, EK1(order=3), abstol=1e-8, reltol=1e-8)
    n = int(sol.n_steps)
    assert sol.retcode_name == "Success"
    assert np.max(np.abs(np.asarray(sol.u[n]) - _rober_oracle(1.0))) < 1e-7


def test_fixed_grid_mass_matrix():
    M = jnp.array([2.0, 0.5])

    def lv_m(u, p, t):
        return M * _lv(u, p, t)

    prob0 = odf.ode_problem(_lv, [1.0, 1.0], (0.0, 2.0), p=_LV_P)
    probM = odf.ode_problem(lv_m, [1.0, 1.0], (0.0, 2.0), p=_LV_P,
                            mass_matrix=M)
    s0 = odf.solve(prob0, EK1(order=3), adaptive=False, dt=1e-3)
    sM = odf.solve(probM, EK1(order=3), adaptive=False, dt=1e-3)
    n = int(s0.n_steps)
    assert float(jnp.abs(s0.u[n] - sM.u[int(sM.n_steps)]).max()) < 1e-8


def test_state_space_rhs_consistent_derivative():
    """mass_state_space_f yields the consistent u' on the manifold."""
    h = mass_state_space_f(_rober_dae, jnp.array([1.0, 1.0, 0.0]))
    u0 = jnp.array([1.0, 0.0, 0.0])
    du = h(u0, _ROBER_P, 0.0)
    f0 = _rober_dae(u0, _ROBER_P, 0.0)
    np.testing.assert_allclose(du[:2], f0[:2], rtol=1e-12)
    # differentiated constraint: sum(u') = 0
    assert abs(float(du.sum())) < 1e-14


def test_mass_matrix_rejections():
    prob = odf.ode_problem(
        _rober_dae, [1.0, 0.0, 0.0], (0.0, 1.0), p=_ROBER_P,
        mass_matrix=jnp.array([1.0, 1.0, 0.0]),
    )
    with pytest.raises(ValueError, match="require EK1"):
        odf.solve(prob, EK0(order=3))
    with pytest.raises(ValueError, match="mass_matrix must be"):
        odf.ode_problem(_lv, [1.0, 1.0], (0.0, 1.0), p=_LV_P,
                        mass_matrix=jnp.ones((3, 3)))
    from odefilters.kronsolve import solve_adaptive_kron
    with pytest.raises(NotImplementedError, match="dense solver paths"):
        solve_adaptive_kron(prob, EK0(order=3))
    from odefilters.datalik import filter_with_data
    with pytest.raises(NotImplementedError, match="dense solver paths"):
        filter_with_data(prob, EK1(order=3), jnp.array([0.5]),
                         jnp.zeros((1, 3)), 0.1)
    from odefilters.ensemble import solve_ensemble_pallas
    with pytest.raises(NotImplementedError, match="dense solver paths"):
        solve_ensemble_pallas(prob, EK1(order=3), jnp.zeros((1024, 3)),
                              jnp.zeros((1024, 3)))
    from odefilters.step import make_model
    with pytest.raises(NotImplementedError, match="first-order"):
        make_model(EK1(order=3), _lv, None, 2, jnp.float64,
                   second_order=True, mass=jnp.eye(2))


def test_mass_matrix_fixed_grid_grad():
    """Reverse-mode gradients flow through the mass-matrix measurement
    (fixed-grid path; parameter sensitivity vs finite differences)."""
    from odefilters.fixedgrid import solve_fixed

    M = jnp.array([2.0, 0.5])

    def lv_m(u, p, t):
        return M * _lv(u, p, t)

    def loss(a):
        prob = odf.ode_problem(lv_m, [1.0, 1.0], (0.0, 1.0),
                               p=(a, 1.0, 3.0, 1.0), mass_matrix=M)
        sol = solve_fixed(prob, EK1(order=3), dt=0.02)
        return sol.u[int(round(1.0 / 0.02))].sum()

    g = jax.grad(loss)(1.5)
    eps = 1e-6
    fd = (loss(1.5 + eps) - loss(1.5 - eps)) / (2 * eps)
    assert abs(float(g) - float(fd)) < 1e-5 * max(1.0, abs(float(fd)))


def test_diagonal_mass_on_structured_paths():
    """Diagonal mass matrices beyond the dense paths (round-3 VERDICT
    item 8): a (d,) diagonal M preserves the per-dimension structure
    exactly, so DiagonalEK1 absorbs it on the Kronecker fast path
    (``h_j = M_jj pinv1 e1 - J_jj pinv0 e0``, ``z = M E1 x - f`` — dense
    step.py:282 semantics) and on the fused adaptive ensemble kernel.
    kron == dense at machine precision (fixed grid and adaptive with
    identical step sequences); kernel == driver; EK0/dense-M still
    reject with a pointer."""
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from odefilters.kronsolve import solve_adaptive_kron, solve_fixed_kron
    from odefilters.ops import pallas_kernels as pk

    prob0 = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    M = jnp.array([2.0, 0.5])
    prob = odf.ode_problem(
        prob0.f, prob0.u0, prob0.tspan, p=prob0.p, mass_matrix=M
    )
    alg = odf.DiagonalEK1(order=3, smooth=True)

    # --- kron == dense, fixed grid ---
    solk = solve_fixed_kron(prob, alg, dt=0.05)
    sold = odf.solve(prob, alg, adaptive=False, dt=0.05)
    np.testing.assert_allclose(
        np.asarray(solk.u), np.asarray(sold.u), rtol=1e-12, atol=1e-14
    )
    xstd = np.sqrt(np.einsum(
        "sij,sij->si", np.asarray(sold.pu.chol), np.asarray(sold.pu.chol)
    ))
    np.testing.assert_allclose(
        np.asarray(solk.u_std), xstd, rtol=1e-9, atol=1e-15
    )

    # --- kron == dense, adaptive (identical accepted-step sequences) ---
    solka = solve_adaptive_kron(prob, alg, abstol=1e-8, reltol=1e-6)
    solda = odf.solve(prob, alg, abstol=1e-8, reltol=1e-6)
    n = int(solka.n_steps)
    assert n == int(solda.n_steps)
    np.testing.assert_allclose(
        np.asarray(solka.u[: n + 1]), np.asarray(solda.u[: n + 1]),
        rtol=1e-8, atol=1e-12,
    )

    # --- ROBER index-1 DAE on the Kron path == dense DiagonalEK1 ---
    probr = odf.remake(odf.models.rober_dae(), tspan=(0.0, 0.3))
    algr = odf.DiagonalEK1(order=3, smooth=False)
    srk = solve_adaptive_kron(probr, algr, abstol=1e-8, reltol=1e-6)
    srd = odf.solve(probr, algr, abstol=1e-8, reltol=1e-6)
    nr = int(srk.n_steps)
    assert srk.retcode_name == "Success"
    # the stiff controller is chaotic near EEst ~ 1 (per-path op-order
    # roundoff flips accepts), so step sequences may differ — compare
    # the solutions and the algebraic constraint instead
    uk = np.asarray(srk.u[nr])
    ud = np.asarray(srd.u[int(srd.n_steps)])
    np.testing.assert_allclose(uk, ud, rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(float(uk.sum()), 1.0, rtol=1e-9)

    # --- fused adaptive DiagonalEK1 ensemble kernel == dense driver ---
    B, S = pk.BLOCK, 8
    key = jax.random.PRNGKey(0)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(
        jnp.float64
    )
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float64)
    with pltpu.force_tpu_interpret_mode():
        eks = odf.solve_ensemble_pallas(
            odf.remake(prob, u0=u0s[0]),
            odf.DiagonalEK1(order=3, smooth=False),
            u0s, ps, n_save=S, abstol=1e-8, reltol=1e-6,
        )
    assert int(eks.failed.sum()) == 0
    grid = np.linspace(0.0, 2.0, S + 1)
    idx = 300
    pr = odf.remake(prob, u0=u0s[idx], p=ps[idx])
    sol = odf.solve(
        pr, odf.DiagonalEK1(order=3, smooth=False),
        abstol=1e-8, reltol=1e-6, tstops=jnp.asarray(grid[1:-1]),
    )
    assert int(eks.nacc[idx]) == int(sol.n_steps)
    g = sol(jnp.asarray(grid))
    np.testing.assert_allclose(
        np.asarray(eks.us[:, :, idx]), np.asarray(g.mean),
        rtol=1e-10, atol=1e-12,
    )
    xstd2 = np.sqrt(np.einsum(
        "sij,sij->si", np.asarray(g.chol), np.asarray(g.chol)
    ))
    np.testing.assert_allclose(
        np.asarray(eks.stds[1:, :, idx]), xstd2[1:], rtol=1e-5
    )

    # --- structured-path rejections narrowed, not removed ---
    with pytest.raises(NotImplementedError, match="DiagonalEK1"):
        solve_fixed_kron(prob, odf.EK0(order=3), dt=0.05)
    dense_M = odf.ode_problem(
        prob0.f, prob0.u0, prob0.tspan, p=prob0.p,
        mass_matrix=jnp.diag(M),
    )
    with pytest.raises(NotImplementedError, match="DIAGONAL"):
        solve_fixed_kron(dense_M, alg, dt=0.05)
    with pytest.raises(NotImplementedError, match="DIAGONAL"):
        odf.solve_ensemble_pallas(
            dense_M, odf.DiagonalEK1(order=3, smooth=False), u0s, ps,
            n_save=S,
        )
