"""Statistical solution tests, mirroring `/root/reference/test/solution.jl`:
solution invariants, interpolation behavior, sampler calibration, stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf
from odefilters import sampling


@pytest.fixture(scope="module")
def sol():
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    return odf.solve(prob, odf.EK1(order=3), abstol=1e-9, reltol=1e-8)


def test_tspan_hit(sol):
    n = int(sol.n_steps)
    assert float(sol.ts[0]) == 0.0
    assert float(sol.ts[n]) == 2.0
    assert sol.retcode_name == "Success"


def test_u_equals_pu_mean(sol):
    """sol.u == sol.pu.mean (test/solution.jl:15-16)."""
    np.testing.assert_allclose(sol.u, sol.pu.mean)


def test_zero_initial_cov(sol):
    """Initial state exactly known (test/solution.jl:17)."""
    np.testing.assert_allclose(sol.pu.chol[0], 0.0, atol=1e-12)


def test_eval_at_grid_returns_stored(sol):
    """sol(sol.t) == sol.pu (test/solution.jl:18)."""
    n = int(sol.n_steps)
    g = sol(sol.ts[: n + 1])
    np.testing.assert_allclose(g.mean, sol.pu.mean[: n + 1], rtol=1e-12)
    np.testing.assert_allclose(
        np.einsum("nij,nkj->nik", np.asarray(g.chol), np.asarray(g.chol)),
        np.einsum(
            "nij,nkj->nik",
            np.asarray(sol.pu.chol[: n + 1]),
            np.asarray(sol.pu.chol[: n + 1]),
        ),
        atol=1e-12,
    )


def test_interp_variance_grows_between_points(sol):
    """Variance at midpoints exceeds variance at the surrounding grid
    points for the *filter* posterior (test/solution.jl interp tests)."""
    n = int(sol.n_steps)
    i = n // 2
    t0, t1 = float(sol.ts[i]), float(sol.ts[i + 1])
    tm = 0.5 * (t0 + t1)
    g_mid = sol(jnp.asarray(tm), smoothed=False)
    g_l = sol(jnp.asarray(t0), smoothed=False)
    assert np.all(np.asarray(g_mid.std) >= np.asarray(g_l.std) - 1e-14)


def test_sampler_calibration(sol):
    """< 5% of samples outside 3 sigma (test/solution.jl:71-72,95-96)."""
    key = jax.random.PRNGKey(7)
    n_samp = 60
    samp = sampling.sample(key, sol, n_samp)  # (N+1, d, n)
    n = int(sol.n_steps)
    samp = np.asarray(samp[: n + 1])
    mean = np.asarray(sol.pu.mean[: n + 1])[..., None]
    std = np.asarray(sol.pu.std[: n + 1])[..., None]
    # skip t0 (zero std -> exact)
    viol = np.abs(samp[1:] - mean[1:]) > 3 * std[1:] + 1e-12
    assert viol.mean() < 0.05


def test_dense_sample_shapes(sol):
    key = jax.random.PRNGKey(3)
    samp, times = sampling.dense_sample(key, sol, n=2, n_grid=50)
    assert samp.shape == (50, 2, 2)
    assert times.shape == (50,)
    assert np.all(np.isfinite(samp))


def test_mean_solution_adapter(sol):
    """mean(sol) callable adapter (solution.jl:95-130)."""
    m = sol.mean()
    out = m(jnp.asarray(1.234))
    g = sol(jnp.asarray(1.234))
    np.testing.assert_allclose(out, g.mean)


def test_stats_sane(sol):
    """destats sanity (test/solution.jl:20-23)."""
    st = sol.stats
    assert int(st.naccept) == int(sol.n_steps)
    assert int(st.nf) == int(st.naccept) + int(st.nreject)
    assert int(st.njacs) == int(st.nf)  # EK1: one jac per f eval


def test_errors_vs_analytic():
    prob = odf.models.logistic()
    sol = odf.solve(prob, odf.EK0(order=3), abstol=1e-9, reltol=1e-8)
    errs = odf.solution.errors_vs_analytic(sol)
    assert float(errs["final"]) < 1e-6
    assert float(errs["l2"]) < 1e-6


def test_grad_through_dense_output_exact_hits():
    """Reverse-mode gradients through dense output evaluated AT stored
    grid points stay finite: the unselected interpolation branch used to
    compute tiny**(-q-1/2) = inf, and 0 * inf = NaN poisoned the shared
    x_filt cotangents."""
    import jax

    prob = odf.models.logistic(u0=(0.1,), p=(2.0,), tspan=(0.0, 1.0))

    def loss(p):
        s = odf.solve_fixed(odf.remake(prob, p=p), odf.EK1(order=2), dt=0.25)
        # evaluate exactly on stored grid points (incl. t0) + one interior
        g = s(jnp.asarray([0.0, 0.25, 0.6, 1.0]))
        return jnp.sum(g.mean)

    g = jax.grad(loss)(prob.p)
    assert np.all(np.isfinite(np.asarray(g)))

    # saveat resampling (which always hits t0 exactly) is also grad-safe
    def loss2(p):
        s = odf.solve_fixed(odf.remake(prob, p=p), odf.EK1(order=2), dt=0.25)
        from odefilters.solution import compact_saveat

        s2 = compact_saveat(s, jnp.asarray([0.0, 0.5, 1.0]))
        return jnp.sum(s2.u)

    g2 = jax.grad(loss2)(prob.p)
    assert np.all(np.isfinite(np.asarray(g2)))
