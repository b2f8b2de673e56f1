"""Examples smoke tests + the stiff Van der Pol regression.

The reference asserts stiff VdP solves as a routine regression
(`/root/reference/test/specific_problems.jl:44-47`); the examples are the
user-facing entry points and must not rot. Each example supports
ODEFILTERS_SMOKE=1 (tiny grids/iterations) so the smoke runs stay cheap.
"""

import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stiff_van_der_pol_ek1():
    """Stiff Van der Pol (mu=1e5), EK1(5), adaptive: solves to tolerance
    against a BDF oracle (test/specific_problems.jl:44-47 analogue).
    A stiffness regression (NaNs, dtmin failure, error blowup) fails here."""
    from scipy.integrate import solve_ivp

    prob = odf.models.van_der_pol(mu=1e5, tspan=(0.0, 0.5))
    sol = odf.solve(
        prob, odf.EK1(order=5), abstol=1e-7, reltol=1e-5, max_steps=8192
    )
    n = int(sol.n_steps)
    assert sol.retcode_name == "Success", f"retcode={sol.retcode_name}"
    assert 0 < n < 8192

    def f(t, y):
        x, v = y
        return [v, 1e5 * ((1 - x**2) * v - x)]

    def jac(t, y):
        x, v = y
        return [[0.0, 1.0], [1e5 * (-2 * x * v - 1.0), 1e5 * (1 - x**2)]]

    ref = solve_ivp(
        f, (0.0, 0.5), np.asarray(prob.u0, np.float64),
        t_eval=np.asarray(sol.ts[: n + 1], np.float64),
        rtol=1e-12, atol=1e-12, method="BDF", jac=jac,
    )
    err = np.abs(np.asarray(sol.u[: n + 1]) - ref.y.T).max()
    assert err < 1e-4, f"stiff VdP max error {err}"
    # smoothing + sampling stay finite on the stiff solve
    from odefilters import sampling
    import jax

    samp = sampling.sample(jax.random.PRNGKey(0), sol, 3)
    assert np.isfinite(np.asarray(samp)).all()


_EXAMPLES = [
    "fitzhugh_nagumo_animation.py",
    "data_conditioning.py",
    "inference_sweep.py",
    "parameter_inference.py",
]


@pytest.mark.parametrize("name", _EXAMPLES)
def test_example_smoke(name, tmp_path):
    """Each example runs end-to-end under ODEFILTERS_SMOKE=1."""
    env = dict(os.environ)
    env["ODEFILTERS_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # the examples run from tmp_path; make the repo importable regardless
    # of whether odefilters is installed in the venv
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    env.pop("XLA_FLAGS", None)  # no need for 8 virtual devices in examples
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", name)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (
        f"{name} failed\nstdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-4000:]}"
    )


def test_rescale_time_equivalence():
    """rescale_time yields the identical trajectory in mapped time (the
    TPU-range workaround for stiff solves; docs/kernels.md "f64 on TPU")."""
    import jax

    prob = odf.models.van_der_pol(mu=1e5, tspan=(0.0, 0.5))
    tau = 1e-5
    prob_s = odf.rescale_time(prob, tau)
    sol = odf.solve(
        prob, odf.EK1(order=5), abstol=1e-7, reltol=1e-5, max_steps=8192
    )
    sol_s = odf.solve(
        prob_s, odf.EK1(order=5), abstol=1e-7, reltol=1e-5, max_steps=8192
    )
    assert sol_s.retcode_name == "Success"
    n, ns = int(sol.n_steps), int(sol_s.n_steps)
    # same trajectory: evaluate both at shared absolute times
    ts_abs = np.linspace(0.05, 0.45, 7)
    u_a = np.asarray(sol(jnp.asarray(ts_abs)).mean)
    u_b = np.asarray(sol_s(jnp.asarray(ts_abs / tau)).mean)
    np.testing.assert_allclose(u_b, u_a, rtol=1e-5, atol=1e-7)
    # the controller sees an equivalent problem: comparable step counts
    assert 0.5 < ns / n < 2.0
