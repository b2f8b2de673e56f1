"""Physics-enhanced regression: condition the ODE posterior on noisy data
and recover parameters by gradient ascent on the marginal data likelihood.

Workflow (all CPU f64; runs in ~1 min):

1. simulate noisy observations of a Lotka-Volterra trajectory;
2. solve with WRONG parameters on a coarse grid -> the prior posterior
   misses the data;
3. `filter_with_data` -> the conditioned posterior lands on the data;
4. `jax.grad(data_loglik)` -> a few Adam-ish steps recover the true
   parameters.

Writes `examples/data_conditioning.png` (three panels).

Run:  python examples/data_conditioning.py
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# ODEFILTERS_SMOKE=1: tiny configuration for the CI smoke test
SMOKE = os.environ.get("ODEFILTERS_SMOKE") == "1"

import jax.numpy as jnp  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import odefilters as odf  # noqa: E402

# --- 1. simulate data ------------------------------------------------------
prob = odf.models.lotka_volterra(tspan=(0.0, 3.0))
truth_sol = odf.solve(prob, odf.EK1(order=4), abstol=1e-10, reltol=1e-8)
ts_data = np.linspace(0.3, 2.7, 9)
rng = np.random.default_rng(7)
SIGMA = 0.05
ys = np.asarray(truth_sol(jnp.asarray(ts_data)).mean)
ys = ys + SIGMA * rng.standard_normal(ys.shape)

# --- 2./3. wrong-parameter solve, then condition on the data ---------------
p_wrong = jnp.asarray(prob.p) * jnp.asarray([1.3, 0.8, 1.2, 0.9])
prob_w = odf.remake(prob, p=p_wrong)
alg = odf.EK0(order=1, smooth=True, diffusionmodel="dynamic")
sol_plain = odf.solve_fixed(
    prob_w, alg, ts=jnp.asarray(np.union1d(np.linspace(0, 3, 13), ts_data))
)
sol_cond, dll = odf.filter_with_data(prob_w, alg, ts_data, ys, SIGMA, n_grid=12)
print(f"wrong-parameter data log-likelihood: {float(dll):.1f}")

# --- 4. gradient-based recovery of the parameters --------------------------
alg_ll = odf.EK1(order=2, smooth=False)


@jax.jit
def negll(p):
    return -odf.data_loglik(
        odf.remake(prob, p=p), alg_ll, ts_data, ys, SIGMA, n_grid=40
    )


vg = jax.jit(jax.value_and_grad(negll))
p = jnp.asarray(prob.p) * 1.15
m = v2 = jnp.zeros_like(p)
path = [np.asarray(p)]
LR, B1, B2 = 0.02, 0.9, 0.999
for k in range(3 if SMOKE else 200):
    v, g = vg(p)
    m = B1 * m + (1 - B1) * g
    v2 = B2 * v2 + (1 - B2) * g * g
    mhat = m / (1 - B1 ** (k + 1))
    vhat = v2 / (1 - B2 ** (k + 1))
    p = p - LR * mhat / (jnp.sqrt(vhat) + 1e-8)
    path.append(np.asarray(p))
print("true p:     ", np.asarray(prob.p))
print("recovered p:", np.asarray(p), f"  (-ll {float(v):.1f})")

# --- plot ------------------------------------------------------------------
fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
tq = jnp.linspace(0.0, 3.0, 200)

for ax, sol, title in [
    (axes[0], sol_plain, "wrong parameters, no data"),
    (axes[1], sol_cond, "same, conditioned on data"),
]:
    g = sol(tq)
    for i, c in enumerate(("C0", "C1")):
        m = np.asarray(g.mean[:, i])
        s = np.asarray(g.std[:, i])
        ax.plot(tq, m, c, lw=1.5)
        ax.fill_between(np.asarray(tq), m - 1.96 * s, m + 1.96 * s,
                        color=c, alpha=0.2)
    ax.plot(ts_data, ys[:, 0], "kx", ms=6)
    ax.plot(ts_data, ys[:, 1], "k+", ms=7)
    ax.set_title(title)
    ax.set_xlabel("t")

path_arr = np.stack(path)
for i in range(4):
    axes[2].plot(path_arr[:, i] / np.asarray(prob.p)[i], label=f"p[{i}]")
axes[2].axhline(1.0, color="k", lw=0.8, ls="--")
axes[2].set_title("parameter recovery (ratio to truth)")
axes[2].set_xlabel("gradient step")
axes[2].legend(fontsize=8)
fig.tight_layout()
_out = "data_conditioning.png" if SMOKE else "examples/data_conditioning.png"
fig.savefig(_out, dpi=110)
print(f"wrote {_out}")
