"""Quick end-to-end smoke: solve FHN with EK0/EK1, compare to scipy oracle."""
import os
import sys

# Runnable from a clean shell as `python scripts/smoke.py` (no editable
# install / PYTHONPATH needed): put the repo root on sys.path.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from scipy.integrate import solve_ivp

import odefilters as odf

prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 10.0))


def oracle(ts):
    r = solve_ivp(
        lambda t, y: np.asarray(prob.f(y, prob.p, t)),
        prob.tspan,
        np.asarray(prob.u0),
        t_eval=ts,
        rtol=1e-12,
        atol=1e-12,
        method="LSODA",
    )
    return r.y.T


for alg in [odf.EK0(order=3), odf.EK1(order=3), odf.EK1(order=5, diffusionmodel="fixed")]:
    sol = odf.solve(prob, alg, abstol=1e-9, reltol=1e-6)
    n = int(sol.n_steps)
    ts = np.asarray(sol.ts[: n + 1])
    u = np.asarray(sol.u[: n + 1])
    ref = oracle(ts)
    err = np.max(np.abs(u - ref))
    print(
        f"{alg.__class__.__name__}(order={alg.order},{alg.diffusionmodel}) "
        f"steps={n} naccept={int(sol.stats.naccept)} nreject={int(sol.stats.nreject)} "
        f"retcode={sol.retcode_name} ll={float(sol.log_likelihood):.2f} maxerr={err:.2e}"
    )

# dense output + smoothing sanity
sol = odf.solve(prob, odf.EK1(order=3), abstol=1e-9, reltol=1e-6)
tq = np.linspace(0.1, 9.9, 50)
g = sol(tq)
ref = oracle(tq)
print("dense maxerr:", np.max(np.abs(np.asarray(g.mean) - ref)))
print("dense std range:", float(g.std.min()), float(g.std.max()))

# fixed grid
solf = odf.solve_fixed(prob, odf.EK1(order=3), dt=0.01)
n = int(solf.n_steps)
err = np.max(np.abs(np.asarray(solf.u[: n + 1]) - oracle(np.asarray(solf.ts[: n + 1]))))
print("fixed-grid maxerr:", err)
