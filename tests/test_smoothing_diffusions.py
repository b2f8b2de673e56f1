"""Smoothing behavior (`/root/reference/test/smoothing.jl`) and
diffusion-model integration tests (`/root/reference/test/diffusions.jl`)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

import odefilters as odf


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


@pytest.fixture(scope="module")
def prob():
    return odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))


def test_smoothing_improves_or_matches(prob):
    """Smoothed trajectory error <= ~2x filtered; endpoints equal, interior
    differs (test/smoothing.jl:13-48)."""
    sol = odf.solve_fixed(prob, odf.EK1(order=3), dt=0.05)
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    ref = oracle(prob, ts)
    filt = np.asarray(sol.x_filt.mean[: n + 1, :2])
    smth = np.asarray(sol.x_smooth.mean[: n + 1, :2])
    err_f = np.abs(filt - ref).sum()
    err_s = np.abs(smth - ref).sum()
    assert err_s <= 2 * err_f
    # endpoints identical
    np.testing.assert_allclose(filt[n], smth[n], rtol=1e-12)
    np.testing.assert_allclose(filt[0], smth[0], rtol=1e-12)
    # interior differs
    assert np.abs(filt[1:n] - smth[1:n]).max() > 0


def test_smooth_solution_post_pass(prob):
    """`smooth_solution` on a filter-only solve matches the in-solve
    smoother and re-enables sampling/dense output (the host post-pass
    used for extremely stiff on-chip solves, docs/kernels.md)."""
    import jax

    alg_f = odf.EK1(order=3, smooth=False)
    alg_s = odf.EK1(order=3, smooth=True)
    sol_f = odf.solve(prob, alg_f, abstol=1e-8, reltol=1e-6)
    sol_s = odf.solve(prob, alg_s, abstol=1e-8, reltol=1e-6)
    # device_get mimics the production host-post-pass pattern (numpy leaves)
    sol_post = odf.smooth_solution(jax.device_get(sol_f))
    n = int(sol_s.n_steps)
    np.testing.assert_allclose(
        np.asarray(sol_post.x_smooth.mean[: n + 1]),
        np.asarray(sol_s.x_smooth.mean[: n + 1]),
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sol_post.u[: n + 1]), np.asarray(sol_s.u[: n + 1]),
        rtol=1e-9, atol=1e-12,
    )
    # the post-pass result is marked smoothed: sampling must work
    assert sol_post.alg.smooth
    draws = odf.sample(jax.random.PRNGKey(0), sol_post, n=3)
    assert np.isfinite(np.asarray(draws)).all()


def test_smooth_solution_jitter(prob):
    """`jitter` floors the RTS gain's predicted factor: at 1e-7 the
    smoothed trajectory stays within solver accuracy of the exact
    smoother on a clean solve, and on filter states perturbed at the
    TPU's ~1e-8 arithmetic-consistency level (docs/kernels.md "f64 on
    TPU") the jittered smoother's error stays bounded near the filter's
    while the exact gain amplifies the inconsistency by orders of
    magnitude."""
    import dataclasses

    import jax

    sol_f = jax.device_get(
        odf.solve(prob, odf.EK1(order=3, smooth=False),
                  abstol=1e-8, reltol=1e-6)
    )
    n = int(sol_f.n_steps)
    ref = oracle(prob, np.asarray(sol_f.ts[: n + 1]))

    # clean states: jitter=1e-7 is a no-op at solver accuracy
    sol_ex = odf.smooth_solution(sol_f)
    sol_j = odf.smooth_solution(sol_f, jitter=1e-7)
    np.testing.assert_allclose(
        np.asarray(sol_j.u[: n + 1]), np.asarray(sol_ex.u[: n + 1]),
        rtol=1e-4, atol=1e-8,
    )

    # inconsistent states: relative mean perturbation at the chip's
    # arithmetic-error scale
    rng = np.random.default_rng(0)
    m = np.asarray(sol_f.x_filt.mean)
    m_pert = m * (1.0 + 1e-8 * rng.standard_normal(m.shape))
    sol_p = dataclasses.replace(
        sol_f,
        x_filt=dataclasses.replace(sol_f.x_filt, mean=jnp.asarray(m_pert)),
    )
    err_ex = np.abs(
        np.asarray(odf.smooth_solution(sol_p).u[: n + 1]) - ref
    ).max()
    err_j = np.abs(
        np.asarray(odf.smooth_solution(sol_p, jitter=1e-7).u[: n + 1]) - ref
    ).max()
    err_f = np.abs(np.asarray(sol_f.u[: n + 1]) - ref).max()
    assert err_j <= 100 * max(err_f, 1e-8)
    # the guarantee is BOUNDED amplification, not dominance: on mild
    # problems the exact gain also copes and jitter adds O(jitter^2)
    # bias, so only require the jittered error stays the same order
    assert err_j <= 10 * max(err_ex, err_f, 1e-8)


@pytest.mark.parametrize(
    "Alg,diffusion",
    [
        (odf.EK0, "dynamic"),
        (odf.EK0, "dynamicMV"),
        (odf.EK0, "fixed"),
        (odf.EK0, "fixedMV"),
        (odf.EK0, "fixedMAP"),
    ],
)
def test_diffusion_models_solve_accurately(prob, Alg, diffusion):
    """Each diffusion model solves FHN on a fine fixed grid to oracle
    accuracy (test/diffusions.jl:8-37, dt there 1e-4; 2e-3 here —
    single-core CI budget)."""
    sol = odf.solve_fixed(prob, Alg(order=3, diffusionmodel=diffusion), dt=2e-3)
    n = int(sol.n_steps)
    ref = oracle(prob, np.asarray(sol.ts[: n + 1]))
    np.testing.assert_allclose(
        np.asarray(sol.u[: n + 1]), ref, rtol=1e-5, atol=1e-7
    )


def test_static_diffusion_recalibration(prob):
    """Static models: sol.diffusions all equal the final estimate and ll is
    NaN (integrator_utils.jl:4-18)."""
    sol = odf.solve(prob, odf.EK0(order=3, diffusionmodel="fixed"),
                    abstol=1e-8, reltol=1e-6)
    n = int(sol.n_steps)
    d = np.asarray(sol.diffusions[: n + 1])
    assert np.allclose(d, d[0])
    assert np.isnan(float(sol.log_likelihood))


def test_dynamic_diffusions_vary(prob):
    sol = odf.solve(prob, odf.EK0(order=3), abstol=1e-8, reltol=1e-6)
    n = int(sol.n_steps)
    d = np.asarray(sol.diffusions[1 : n + 1])
    assert d.std() > 0
    assert np.isfinite(float(sol.log_likelihood))
