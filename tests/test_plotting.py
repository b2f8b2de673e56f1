"""Plot-recipe smoke tests, mirroring the reference's plotting checks in
`/root/reference/test/solution.jl` (plot-recipe smoke) and the 3-tuple
`vars` branch of `/root/reference/src/solution_plotting.jl:26-41`."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf
from odefilters.plotting import plot_samples, plot_solution


@pytest.fixture(scope="module")
def sol3d():
    # 3-component system so vars=(0,1,2) is meaningful
    def lorenz(u, p, t):
        s, r, b = p
        return jnp.stack([
            s * (u[1] - u[0]),
            u[0] * (r - u[2]) - u[1],
            u[0] * u[1] - b * u[2],
        ])

    prob = odf.ode_problem(
        lorenz, jnp.array([1.0, 0.0, 0.0]), (0.0, 0.5),
        p=jnp.array([10.0, 28.0, 8.0 / 3.0]),
    )
    return odf.solve(prob, odf.EK1(order=3), abstol=1e-6, reltol=1e-4)


def test_plot_timeseries_dense_and_grid(sol3d):
    ax = plot_solution(sol3d, dense=True, n_grid=50)
    assert len(ax.lines) == 3
    ax2 = plot_solution(sol3d, dense=False)
    assert len(ax2.lines) == 3
    # ribbons are fill_between collections, one per component
    assert len(ax.collections) == 3


def test_plot_phase_2d(sol3d):
    ax = plot_solution(sol3d, vars=(0, 1), dense=False)
    assert ax.get_xlabel() == "u[0]" and ax.get_ylabel() == "u[1]"
    assert len(ax.lines) == 1


def test_plot_phase_3d(sol3d):
    ax = plot_solution(sol3d, vars=(0, 1, 2), dense=False)
    assert ax.name == "3d"
    assert ax.get_zlabel() == "u[2]"


def test_plot_samples_smoke(sol3d):
    s = odf.sample(jax.random.PRNGKey(0), sol3d, 2)
    ax = plot_samples(sol3d, s)
    assert len(ax.lines) > 0
