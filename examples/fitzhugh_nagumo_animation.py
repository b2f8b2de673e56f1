"""Animate a probabilistic solve of the FitzHugh-Nagumo model.

Python/JAX counterpart of the reference's
`examples/fitzhughnagumo_animation.jl`: step the integrator interactively,
plotting the partial filtering posterior and its dense extrapolation after
every accepted step.

Usage: python examples/fitzhugh_nagumo_animation.py  (writes fhn_solve.gif)
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.animation as animation
import matplotlib.pyplot as plt
import numpy as np

import odefilters as odf

# ODEFILTERS_SMOKE=1: tiny configuration for the CI smoke test
SMOKE = os.environ.get("ODEFILTERS_SMOKE") == "1"

prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0 if SMOKE else 20.0))

# high-accuracy approximate solution for comparison
_tol = 1e-6 if SMOKE else 1e-10
appxsol = odf.solve(prob, odf.EK1(order=5), abstol=_tol, reltol=_tol)
n_appx = int(appxsol.n_steps)

# integrator interface: fixed steps, order-1 EK0 like the reference example
integ = odf.init(prob, odf.EK0(order=1, smooth=False), dt=7e-2, abstol=1e-1,
                 reltol=1e-2)

fig, ax = plt.subplots(figsize=(7, 4))
colors = ["C0", "C1"]


def draw(_frame):
    integ.step()
    ax.clear()
    sol = integ.sol
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    mean = np.asarray(sol.pu.mean[: n + 1])
    std = np.asarray(sol.pu.std[: n + 1])
    for i in range(2):
        ax.plot(ts, mean[:, i], color=colors[i], label=f"u{i+1}(t)")
        ax.fill_between(ts, mean[:, i] - 3 * std[:, i],
                        mean[:, i] + 3 * std[:, i],
                        color=colors[i], alpha=0.25, linewidth=0)
        ax.scatter(ts, mean[:, i], color=colors[i], s=6)
    # dense extrapolation beyond the current time
    t_future = np.arange(integ.t, prob.tspan[1], 0.1)
    if len(t_future) > 1:
        g = sol(jnp.asarray(t_future), smoothed=False)
        gm, gs = np.asarray(g.mean), np.asarray(g.std)
        for i in range(2):
            ax.plot(t_future, gm[:, i], ":", color=colors[i])
            ax.fill_between(t_future, gm[:, i] - 3 * gs[:, i],
                            gm[:, i] + 3 * gs[:, i],
                            color=colors[i], alpha=0.15, linewidth=0)
    ax.plot(np.asarray(appxsol.ts[: n_appx + 1]),
            np.asarray(appxsol.u[: n_appx + 1]), "--", color="k", lw=0.8)
    ax.axvline(integ.t, color="k", lw=0.8)
    ax.set_xlim(*prob.tspan)
    ax.set_ylim(-2.5, 2.5)
    ax.set_xlabel("t")
    ax.set_ylabel("u(t)")
    ax.legend(loc="upper right")


if __name__ == "__main__":
    frames = int(prob.tspan[1] / 7e-2) - 1
    anim = animation.FuncAnimation(
        fig, draw, frames=min(frames, 3 if SMOKE else 60)
    )
    anim.save("fhn_solve.gif", writer="pillow", fps=10)
    print("wrote fhn_solve.gif")
