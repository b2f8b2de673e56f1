"""Ribbon plotting of probabilistic solutions (matplotlib).

Replacement for the reference's Plots.jl recipe
(`/root/reference/src/solution_plotting.jl:4-55`): posterior mean lines
with ``ribbon_width * std`` uncertainty bands (default 1.96), optionally on
a dense grid, plus ``vars=(i, j)`` phase plots. Import is gated so headless
installs without matplotlib still work.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def plot_solution(
    sol,
    *,
    ax=None,
    dense: bool = True,
    n_grid: int = 300,
    ribbon_width: float = 1.96,
    vars: Optional[Sequence[int]] = None,
    labels: Optional[Sequence[str]] = None,
    **line_kwargs,
):
    """Plot posterior means with uncertainty ribbons.

    Args:
        dense: evaluate the posterior on a uniform ``n_grid`` grid
            (the recipe's `denseplot`), else use the solver grid.
        ribbon_width: half-width of the band in standard deviations
            (recipe default 1.96, `solution_plotting.jl:6`).
        vars: ``(i, j)`` produces a phase plot of component j vs i,
            ``(i, j, k)`` a 3-D phase plot (no ribbons, like the recipe's
            vars branch, `solution_plotting.jl:26-41`); None plots every
            component against time.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        if vars is not None and len(vars) == 3:
            fig = plt.figure()
            ax = fig.add_subplot(projection="3d")
        else:
            _, ax = plt.subplots()

    n = int(sol.n_steps)
    if dense:
        t_end = float(sol.ts[n])
        ts = np.linspace(float(sol.ts[0]), t_end, n_grid)
        g = sol(jnp.asarray(ts))
        mean, std = np.asarray(g.mean), np.asarray(g.std)
    else:
        ts = np.asarray(sol.ts[: n + 1])
        mean = np.asarray(sol.pu.mean[: n + 1])
        std = np.asarray(sol.pu.std[: n + 1])

    if vars is not None:
        if len(vars) == 3:
            if getattr(ax, "name", "") != "3d":
                raise ValueError(
                    "vars=(i, j, k) needs a 3-D axes; pass "
                    "ax=fig.add_subplot(projection='3d') or ax=None"
                )
            i, j, k = vars
            ax.plot(mean[:, i], mean[:, j], mean[:, k], **line_kwargs)
            ax.set_xlabel(f"u[{i}]")
            ax.set_ylabel(f"u[{j}]")
            ax.set_zlabel(f"u[{k}]")
            return ax
        i, j = vars[0], vars[1]
        ax.plot(mean[:, i], mean[:, j], **line_kwargs)
        ax.set_xlabel(f"u[{i}]")
        ax.set_ylabel(f"u[{j}]")
        return ax

    d = mean.shape[1]
    names = labels or [f"u[{i}]" for i in range(d)]
    for i in range(d):
        (line,) = ax.plot(ts, mean[:, i], label=names[i], **line_kwargs)
        ax.fill_between(
            ts,
            mean[:, i] - ribbon_width * std[:, i],
            mean[:, i] + ribbon_width * std[:, i],
            alpha=0.25,
            color=line.get_color(),
            linewidth=0,
        )
    ax.set_xlabel("t")
    ax.legend()
    return ax


def plot_samples(sol, samples, *, ax=None, alpha: float = 0.4, **kwargs):
    """Overlay joint posterior samples (from ``odefilters.sampling``)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    s = np.asarray(samples)[: n + 1]
    for j in range(s.shape[-1]):
        ax.plot(ts, s[:, :, j], alpha=alpha, linewidth=0.7, **kwargs)
    return ax
