"""Error-path tests (`/root/reference/test/errors.jl`), IEKS smoke test
(`test/ieks.jl`), and integrator-API tests (reference call stack 3.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf


def test_scalar_problem_rejected():
    """Scalar u0 rejected (test/errors.jl:11-15)."""
    with pytest.raises(ValueError, match="not.*vector-valued|not vector"):
        odf.ode_problem(lambda u, p, t: -u, 1.0, (0.0, 1.0))


def test_fixed_step_without_dt_rejected():
    """Fixed-step without dt rejected (test/errors.jl:17-20)."""
    with pytest.raises(ValueError, match="choice of dt"):
        odf.solve(odf.models.logistic(), odf.EK0(order=2), adaptive=False)


def test_unknown_diffusion_rejected():
    with pytest.raises(ValueError, match="diffusionmodel"):
        odf.EK1(diffusionmodel="bogus")


def test_mv_diffusion_needs_ek0():
    """EK1 x MV diffusion combos are excluded (test/correctness.jl:27,56;
    src/diffusions.jl:96-101)."""
    with pytest.raises(ValueError, match="EK0"):
        odf.EK1(diffusionmodel="fixedMV")
    with pytest.raises(ValueError, match="EK0"):
        odf.EK1(diffusionmodel="dynamicMV")


def test_non_ibm_prior_rejected():
    with pytest.raises(ValueError, match="ibm"):
        odf.EK0(prior="iou")


def test_max_steps_gives_maxiters_retcode():
    sol = odf.solve(
        odf.models.fitzhugh_nagumo(), odf.EK1(order=3),
        abstol=1e-12, reltol=1e-11, max_steps=8,
    )
    assert sol.retcode_name == "MaxIters"
    assert int(sol.n_steps) == 8


def test_ieks_smoke():
    """IEKS converges on FHN (test/ieks.jl:10-13)."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    sol = odf.solve_ieks(prob, odf.IEKS(order=2), iterations=3,
                         abstol=1e-8, reltol=1e-6)
    assert sol.retcode_name == "Success"
    n = int(sol.n_steps)
    assert np.all(np.isfinite(np.asarray(sol.u[: n + 1])))


def test_integrator_init_step():
    """init/step!/solve! integrator interface (reference call stack 3.2,
    examples/fitzhughnagumo_animation.jl:23-27)."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    integ = odf.init(prob, odf.EK1(order=3), abstol=1e-8, reltol=1e-6)
    assert integ.t == 0.0
    integ.step()
    assert integ.n_steps == 1
    assert integ.t > 0.0
    partial = integ.sol  # mid-solve solution is usable
    assert partial.u.shape[-1] == 2
    sol = integ.solve_fin()
    assert sol.retcode_name == "Success"
    assert float(sol.ts[int(sol.n_steps)]) == 1.0


def test_state_dimension_via_init():
    """State dim D = d(q+1) (test/priors.jl:64-74)."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    for q in [1, 3]:
        integ = odf.init(prob, odf.EK0(order=q))
        assert integ.x.mean.shape == (2 * (q + 1),)
        assert integ.x.chol.shape == (2 * (q + 1), 2 * (q + 1))


def test_saveat():
    """saveat returns the solution on the requested grid (host-framework
    saveat semantics)."""
    prob = odf.models.logistic()
    sv = jnp.linspace(0.0, 3.0, 7)
    sol = odf.solve(prob, odf.EK1(order=3), abstol=1e-9, reltol=1e-7, saveat=sv)
    assert sol.u.shape == (7, 1)
    np.testing.assert_allclose(sol.ts, sv)
    ref = np.stack([np.asarray(prob.analytic(prob.u0, prob.p, t)) for t in sv])
    np.testing.assert_allclose(np.asarray(sol.u), ref, atol=1e-6)
    # dense output still works on the compacted solution
    g = sol(jnp.asarray(1.3))
    np.testing.assert_allclose(
        g.mean, prob.analytic(prob.u0, prob.p, 1.3), atol=1e-5
    )


def test_solve_ieks_fixed_first_sweep_is_plain_ek1():
    """Fixed-grid IEKS: sweep 1 linearizes at the predicted mean, i.e. IS
    the plain fixed-grid EK1 solve (`ieks.jl:53-61`: the first iteration
    has linearize_at == nothing); and the iteration converges."""
    import jax.numpy as jnp
    import numpy as np

    from odefilters.ieks import solve_ieks_fixed

    prob = odf.models.lotka_volterra(tspan=(0.0, 2.0))
    ts = jnp.linspace(0.0, 2.0, 41)
    alg = odf.IEKS(order=2)
    s1 = solve_ieks_fixed(prob, alg, ts=ts, iterations=1)
    sp = odf.solve_fixed(prob, alg, ts=ts)
    np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(sp.u))

    s4 = solve_ieks_fixed(prob, alg, ts=ts, iterations=4)
    s5 = solve_ieks_fixed(prob, alg, ts=ts, iterations=5)
    d14 = float(jnp.max(jnp.abs(s4.u - s1.u)))
    d45 = float(jnp.max(jnp.abs(s5.u - s4.u)))
    assert d45 < 0.1 * max(d14, 1e-12), (d14, d45)
    with pytest.raises(NotImplementedError, match="first-order"):
        solve_ieks_fixed(
            odf.models.pendulum_2nd(), alg, ts=ts, iterations=1
        )
