"""Data conditioning + marginal data likelihood (`odefilters.datalik`) —
beyond the reference (its parameter-inference story is only ForwardDiff
through the solver, `/root/reference/test/specific_problems.jl:141-156`).

Tiers: (1) the noisy square-root update against the textbook dense formula;
(2) behavioral checks of the conditioned posterior; (3) the likelihood as an
inference objective — maximized near the true parameters, with
finite-difference-consistent gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf
from odefilters.linalg import Gaussian
from odefilters.ops.filtering import update_noisy


def test_update_noisy_matches_textbook(rng):
    D, d_obs = 6, 2
    Lx = np.tril(rng.standard_normal((D, D))) + 3 * np.eye(D)
    m = rng.standard_normal(D)
    H = rng.standard_normal((d_obs, D))
    Rc = np.tril(rng.standard_normal((d_obs, d_obs))) + 2 * np.eye(d_obs)
    y = rng.standard_normal(d_obs)

    x_out, z, S_chol = update_noisy(
        Gaussian(jnp.asarray(m), jnp.asarray(Lx)), jnp.asarray(y),
        jnp.asarray(H), jnp.asarray(Rc),
    )

    # dense reference
    P = Lx @ Lx.T
    R = Rc @ Rc.T
    S = H @ P @ H.T + R
    K = P @ H.T @ np.linalg.inv(S)
    m_ref = m + K @ (y - H @ m)
    P_ref = (np.eye(D) - K @ H) @ P @ (np.eye(D) - K @ H).T + K @ R @ K.T

    np.testing.assert_allclose(np.asarray(z), y - H @ m, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(S_chol @ S_chol.T), S, rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(x_out.mean), m_ref, rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(x_out.chol @ x_out.chol.T), P_ref, rtol=1e-9, atol=1e-11
    )


@pytest.fixture(scope="module")
def lv_data():
    """Noisy observations of a Lotka-Volterra trajectory."""
    prob = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    sol = odf.solve(prob, odf.EK1(order=4), abstol=1e-10, reltol=1e-8)
    ts_data = np.linspace(0.3, 2.7, 9)
    truth = np.asarray(sol(jnp.asarray(ts_data)).mean)
    rng = np.random.default_rng(7)
    sigma = 0.05
    ys = truth + sigma * rng.standard_normal(truth.shape)
    return prob, ts_data, ys, sigma


def test_conditioning_pulls_posterior_to_data(lv_data):
    """Solve with WRONG parameters on a coarse grid (q=1: wide ODE
    posterior), then condition on data — the posterior must move from the
    wrong trajectory (error ~2) onto the observations (error < 0.2).

    On fine grids / high orders the ODE posterior is (correctly) much
    tighter than the 0.05 observation noise, so the pull is small — for
    parameter inference the signal then lives in the likelihood, not the
    posterior mean (see the tests below)."""
    prob, ts_data, ys, sigma = lv_data
    p_wrong = jnp.asarray(prob.p) * jnp.asarray([1.3, 0.8, 1.2, 0.9])
    prob_w = odf.remake(prob, p=p_wrong)
    alg = odf.EK0(order=1, smooth=True, diffusionmodel="dynamic")

    ts_plain = np.union1d(np.linspace(0, 3, 13), ts_data)
    sol_plain = odf.solve_fixed(prob_w, alg, ts=jnp.asarray(ts_plain))
    sol_cond, dll = odf.filter_with_data(
        prob_w, alg, ts_data, ys, sigma, n_grid=12
    )
    tq = jnp.asarray(ts_data)
    err_plain = np.abs(np.asarray(sol_plain(tq).mean) - ys).mean()
    err_cond = np.abs(np.asarray(sol_cond(tq).mean) - ys).mean()
    assert np.isfinite(float(dll))
    assert err_plain > 1.0          # the wrong trajectory misses the data
    assert err_cond < 0.2 * err_plain   # conditioning lands on it
    # and the conditioned posterior is tighter at the data points
    std_plain = np.asarray(sol_plain(tq).std).mean()
    std_cond = np.asarray(sol_cond(tq).std).mean()
    assert std_cond < std_plain


def test_loglik_peaks_at_true_parameters(lv_data):
    prob, ts_data, ys, sigma = lv_data
    alg = odf.EK1(order=3, smooth=False)

    def ll(scale):
        pr = odf.remake(prob, p=jnp.asarray(prob.p) * scale)
        return odf.data_loglik(pr, alg, ts_data, ys, sigma, n_grid=60)

    ll_true = float(ll(1.0))
    for s in (0.8, 0.9, 1.1, 1.25):
        assert ll_true > float(ll(s)), (s, ll_true, float(ll(s)))


def test_loglik_gradient_matches_finite_differences(lv_data):
    prob, ts_data, ys, sigma = lv_data
    alg = odf.EK1(order=2, smooth=False)

    def ll(p):
        return odf.data_loglik(
            odf.remake(prob, p=p), alg, ts_data, ys, sigma, n_grid=40
        )

    p0 = jnp.asarray(prob.p) * 1.05
    g = np.asarray(jax.grad(ll)(p0))
    assert np.all(np.isfinite(g))
    eps = 1e-6
    for i in range(p0.shape[0]):
        e = np.zeros(p0.shape[0])
        e[i] = eps
        fd = (float(ll(p0 + e)) - float(ll(p0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-4, atol=1e-8)


def test_gradient_step_improves_loglik(lv_data):
    prob, ts_data, ys, sigma = lv_data
    alg = odf.EK1(order=2, smooth=False)

    def negll(p):
        return -odf.data_loglik(
            odf.remake(prob, p=p), alg, ts_data, ys, sigma, n_grid=40
        )

    vg = jax.jit(jax.value_and_grad(negll))
    p = jnp.asarray(prob.p) * 1.15
    v0, _ = vg(p)
    lr = 1e-3
    for _ in range(25):
        v, g = vg(p)
        p = p - lr * g / (1.0 + jnp.abs(g))
    v1, _ = vg(p)
    assert float(v1) < float(v0) - 1.0  # materially improved
    # moved toward the true parameters
    assert float(jnp.abs(p - prob.p).mean()) < float(
        jnp.abs(jnp.asarray(prob.p) * 0.15).mean()
    )


def test_datalik_vmaps_over_parameters(lv_data):
    """Likelihood sweeps: vmap the objective over a batch of parameter
    candidates (the realistic inference workload — one compile, batched
    solves)."""
    prob, ts_data, ys, sigma = lv_data
    alg = odf.EK1(order=2, smooth=False)

    def ll(p):
        return odf.data_loglik(
            odf.remake(prob, p=p), alg, ts_data, ys, sigma, n_grid=40
        )

    scales = jnp.asarray([0.8, 0.9, 1.0, 1.1, 1.25])
    ps = jnp.asarray(prob.p)[None, :] * scales[:, None]
    lls = jax.vmap(ll)(ps)
    assert lls.shape == (5,)
    assert bool(jnp.all(jnp.isfinite(lls)))
    assert int(jnp.argmax(lls)) == 2  # true parameters win


def test_partial_observation_operator(lv_data):
    """Observe only the first LV component through C = [1 0]."""
    prob, ts_data, ys, sigma = lv_data
    alg = odf.EK0(order=3)
    C = np.array([[1.0, 0.0]])
    sol, dll = odf.filter_with_data(
        prob, alg, ts_data, ys[:, :1], sigma, obs_matrix=C, n_grid=80
    )
    assert np.isfinite(float(dll))
    assert bool(jnp.all(jnp.isfinite(sol.u)))


def test_datalik_validation(lv_data):
    prob, ts_data, ys, sigma = lv_data
    alg = odf.EK0(order=2)
    with pytest.raises(ValueError):
        odf.filter_with_data(prob, alg, ts_data[::-1], ys, sigma)
    with pytest.raises(ValueError):
        odf.filter_with_data(prob, alg, ts_data + 10.0, ys, sigma)
    with pytest.raises(ValueError):
        odf.filter_with_data(prob, alg, ts_data, ys[:, :1], sigma,
                             obs_matrix=np.eye(2))
    with pytest.raises(NotImplementedError):
        # static diffusion + non-IWP prior: the pre-scaled-prior pass bakes
        # sigma^2 into the constant IWP factor only
        from odefilters.priors import IOUP

        odf.filter_with_data(
            prob, odf.EK0(order=2, diffusionmodel="fixed",
                          prior=IOUP(rate=-1.0)),
            ts_data, ys, sigma,
        )


def test_static_diffusion_calibrate_then_condition(lv_data):
    """Static diffusion models run Fenrir's calibrate-then-condition: a
    plain pass calibrates sigma^2, the data pass runs against the
    pre-scaled prior. With wrong parameters the calibrated prior is
    (correctly) diffuse, so the posterior lands ON the data with std =
    the observation noise — the regression this path originally shipped
    with reported ~10x-too-wide bands."""
    prob, ts_data, ys, sigma = lv_data
    p_wrong = jnp.asarray(prob.p) * jnp.asarray([1.3, 0.8, 1.2, 0.9])
    prob_w = odf.remake(prob, p=p_wrong)
    for dm in ("fixed", "fixedMAP", "fixedMV"):
        alg = odf.EK0(order=1, smooth=True, diffusionmodel=dm)
        sol_c, dll = odf.filter_with_data(
            prob_w, alg, ts_data, ys, sigma, n_grid=12
        )
        assert np.isfinite(float(dll))
        tq = jnp.asarray(ts_data)
        g = sol_c(tq)
        err = np.abs(np.asarray(g.mean) - ys).mean()
        std = np.asarray(g.std).mean()
        assert err < 0.05, (dm, err)            # sits on the data
        assert 0.2 * sigma < std < 3 * sigma, (dm, std)  # R-sized bands

    # the likelihood remains a usable objective: peaks at the truth
    def ll(scale):
        pr = odf.remake(prob, p=jnp.asarray(prob.p) * scale)
        return float(odf.data_loglik(
            pr, odf.EK1(order=2, diffusionmodel="fixed", smooth=False),
            ts_data, ys, sigma, n_grid=40,
        ))

    assert ll(1.0) > ll(0.9) and ll(1.0) > ll(1.1)
    # and differentiable (stop_gradient on the calibrated sigma^2)
    g = jax.grad(lambda p: odf.data_loglik(
        odf.remake(prob, p=p),
        odf.EK1(order=2, diffusionmodel="fixed", smooth=False),
        ts_data, jnp.asarray(ys), sigma, n_grid=40,
    ))(jnp.asarray(prob.p))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_f32_data_time_near_grid_point(lv_data):
    """f32: an observation time a few f32-ULPs away from a uniform grid
    point must not create a collapsing interval (dtype-aware merge tol)."""
    prob, _, ys, sigma = lv_data
    prob32 = odf.remake(
        prob, u0=prob.u0.astype(jnp.float32), p=prob.p.astype(jnp.float32)
    )
    ts_data = np.array([0.3 + 4e-8, 1.0, 2.0])
    with jax.enable_x64(False):
        sol, dll = odf.filter_with_data(
            prob32, odf.EK0(order=4), ts_data, ys[:3].astype(np.float32),
            sigma, n_grid=100,
        )
        ok = bool(jnp.isfinite(dll)) and bool(jnp.all(jnp.isfinite(sol.u)))
    assert ok


def test_second_order_data_conditioning():
    """u'' = f(du, u): condition on noisy POSITION observations — the
    default obs operator is the u block; the physical-parameter likelihood
    peaks at the truth and is differentiable."""
    prob = odf.models.pendulum_2nd(tspan=(0.0, 3.0))
    sol = odf.solve(prob, odf.EK0(order=4), abstol=1e-10, reltol=1e-8)
    ts_data = np.linspace(0.3, 2.7, 9)
    truth = np.asarray(sol(jnp.asarray(ts_data)).mean)[:, :1]
    rng = np.random.default_rng(5)
    ys = truth + 0.02 * rng.standard_normal(truth.shape)

    sol_c, dll = odf.filter_with_data(
        prob, odf.EK0(order=3, smooth=True), ts_data, ys, 0.02, n_grid=60
    )
    assert np.isfinite(float(dll))
    g = sol_c(jnp.asarray(ts_data))
    assert np.abs(np.asarray(g.mean)[:, :1] - truth).max() < 0.01

    def ll(gl):
        return odf.data_loglik(
            odf.remake(prob, p=gl), odf.EK0(order=3, smooth=False),
            ts_data, ys, 0.02, n_grid=60,
        )

    assert float(ll(jnp.asarray(9.81))) > float(ll(jnp.asarray(8.0)))
    assert float(ll(jnp.asarray(9.81))) > float(ll(jnp.asarray(12.0)))
    gr = jax.grad(ll)(jnp.asarray(9.0))
    assert np.isfinite(float(gr)) and float(gr) > 0  # pushes toward 9.81


def test_second_order_dense_sampling():
    """Dense-path sampling on a second-order solution (sol.d is 2d; the
    sampler must use the per-block state dim)."""
    prob = odf.models.pendulum_2nd(tspan=(0.0, 1.0))
    sol = odf.solve_fixed(
        prob, odf.EK0(order=3, smooth=True), ts=jnp.linspace(0.0, 1.0, 21)
    )
    s = odf.sample(jax.random.PRNGKey(0), sol, n=2)
    assert s.shape[1] == 2  # [u; du]
    assert bool(jnp.all(jnp.isfinite(s)))
    spread = np.abs(np.asarray(s) - np.asarray(sol.u)[:, :, None]).max()
    assert spread < 0.5


def test_data_times_closer_than_ulp_rejected():
    """Two observation times closer than ~an f32 ULP of the span collapse
    to one f32 grid point (zero-length interval -> preconditioner
    overflow); _merged_grid must reject them up front."""
    import odefilters as odf
    from odefilters.datalik import _merged_grid

    prob = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    t = 1.0
    ts_bad = np.array([0.5, t, t + 1e-8])  # ~0.03 f32 ULP of span apart
    with pytest.raises(ValueError, match="ULP"):
        _merged_grid(prob, ts_bad, 10, jnp.float32)
    # fine in f64 (the same gap is ~4e10 f64 ULPs)
    ts64, *_ = _merged_grid(prob, ts_bad, 10, jnp.float64)
    assert ts64.shape[0] >= 13


def test_calib_grad_false_matches_xla_and_changes_only_gradient():
    """`calib_grad=False` (the long-horizon f32 gradient estimator,
    VERDICT r2 item 8): values identical to the default; gradients match
    the XLA stop-calibration path; and the two estimators genuinely
    differ (guards the flag actually reaching the adjoint)."""
    from jax.experimental.pallas import tpu as pltpu

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    T = 40
    dt = 3.0 / T
    ts_data = np.array([8, 20, 32]) * dt
    rng = np.random.default_rng(3)
    ys = np.abs(rng.normal(1.5, 0.5, (3, 2)))
    B = pk.BLOCK
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float64)
    u0s = jnp.broadcast_to(prob.u0, (B, 2)).astype(jnp.float64)

    def kloss(p_, calib_grad):
        dll, _ = pk.ensemble_data_loglik_pallas(
            prob.f, u0s, p_, prob.tspan, T, ts_data, ys, 0.1, q=3,
            calib_grad=calib_grad,
        )
        return jnp.sum(dll[:1]), dll

    with pltpu.force_tpu_interpret_mode():
        (v_full, dll_full), g_full = jax.value_and_grad(
            lambda p_: kloss(p_, True), has_aux=True
        )(ps)
        (v_stop, dll_stop), g_stop = jax.value_and_grad(
            lambda p_: kloss(p_, False), has_aux=True
        )(ps)
    # primal values identical
    np.testing.assert_array_equal(np.asarray(dll_full), np.asarray(dll_stop))
    # the estimators differ in the adjoint
    assert float(jnp.abs(g_full[0] - g_stop[0]).max()) > 1e-10

    def xla_loss(p_):
        return odf.data_loglik(
            odf.remake(prob, p=p_), odf.EK0(order=3, smooth=False),
            ts_data, ys, 0.1, n_grid=T, calib_grad=False,
        )

    g_x = jax.grad(xla_loss)(ps[0].astype(jnp.float64))
    np.testing.assert_allclose(
        np.asarray(g_stop[0]), np.asarray(g_x), rtol=1e-8, atol=1e-10
    )
