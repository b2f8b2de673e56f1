"""Likelihood-surface sweep with the fused data-likelihood kernel.

8192 Lotka-Volterra parameter candidates — a 128 x 64 grid over the two
interaction rates (b, d) — each scored with the marginal data likelihood
log p(y | z=0, p) of 9 noisy observations, in ONE kernel call
(`ops.pallas_kernels.ensemble_data_loglik_pallas`, ~3 ms on chip after
compile; the same sweep through vmapped XLA `data_loglik` is ~50x slower).

Writes `examples/inference_sweep.png`: the likelihood surface with the
true parameters marked — the workload shape of SMC / ABC / grid-search
inference over ODE parameters.

Run:  python examples/inference_sweep.py          (TPU f32; CPU works too)
"""

import os

import jax

# ODEFILTERS_SMOKE=1: tiny XLA-path run for CI. Must force CPU *in
# process* BEFORE backend init — the container's sitecustomize overrides
# JAX_PLATFORMS from the environment (CLAUDE.md), so the env var the test
# harness sets is ignored and the smoke would compile on the remote TPU.
if os.environ.get("ODEFILTERS_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import odefilters as odf  # noqa: E402
from odefilters.ops import pallas_kernels as pk  # noqa: E402

SMOKE = os.environ.get("ODEFILTERS_SMOKE") == "1"

# --- observations of the true system --------------------------------------
prob = odf.models.lotka_volterra(tspan=(0.0, 3.0))
# SMOKE: a short grid — interpret mode traces every lane op on the host,
# so the CI run must stay tiny
T = 16 if SMOKE else 120
dt = 3.0 / T
kidx = (
    np.array([4, 9, 14]) if SMOKE
    else np.array([12, 32, 48, 64, 76, 88, 100, 110, 116])
)
ts_data = kidx * dt

from scipy.integrate import solve_ivp  # noqa: E402

p64 = np.asarray(prob.p, np.float64)


def rhs(t, y):
    a, b, c, d = p64
    x, yy = y
    return [a * x - b * x * yy, -c * yy + d * x * yy]


truth = solve_ivp(
    rhs, (0.0, 3.0), np.asarray(prob.u0, np.float64), t_eval=ts_data,
    rtol=1e-12, atol=1e-12, method="LSODA",
).y.T
rng = np.random.default_rng(0)
SIGMA = 0.05
ys = truth + SIGMA * rng.standard_normal(truth.shape)

# --- 8192-candidate grid over (b, d), one kernel call ----------------------
NB, ND = (8, 8) if SMOKE else (128, 64)
b_grid = np.linspace(0.6, 1.5, NB)
d_grid = np.linspace(0.6, 1.5, ND)
bb, dd = np.meshgrid(b_grid, d_grid, indexing="ij")
ps = np.tile(np.asarray(prob.p, np.float32), (NB * ND, 1))
ps[:, 1] = bb.ravel()
ps[:, 3] = dd.ravel()
ps = jnp.asarray(ps)
u0s = jnp.broadcast_to(prob.u0, (NB * ND, 2)).astype(jnp.float32)

if SMOKE:
    # CI smoke: interpret-mode Pallas over a full 1024-lane block is too
    # slow for the suite; the XLA `data_loglik` path computes the SAME
    # chain-rule quantity (tested equal in the kernel tests) on a tiny
    # candidate grid, keeping the example end-to-end on one CPU core
    sweep = jax.jit(
        jax.vmap(
            lambda u, p: odf.data_loglik(
                odf.remake(prob, u0=u, p=p), odf.EK1(order=2, smooth=False),
                ts_data, ys, SIGMA, n_grid=T,
            )
        )
    )
else:
    sweep = jax.jit(
        lambda u, p: pk.ensemble_data_loglik_pallas(
            prob.f, u, p, prob.tspan, T, ts_data, ys, obs_noise_std=SIGMA,
            q=3,
        )[0]
    )
import time  # noqa: E402

t0 = time.time()
dll = sweep(u0s, ps)
float(jnp.sum(dll))
print(f"first call (incl. compile): {time.time() - t0:.1f} s")
t0 = time.perf_counter()
dll = sweep(u0s, ps)
float(jnp.sum(dll))
print(f"steady-state sweep of {NB * ND} candidates: "
      f"{(time.perf_counter() - t0) * 1e3:.1f} ms")

surface = np.asarray(dll).reshape(NB, ND)
j = np.unravel_index(np.argmax(surface), surface.shape)
print(f"true (b, d) = ({float(prob.p[1])}, {float(prob.p[3])}); "
      f"argmax of the surface = ({b_grid[j[0]]:.3f}, {d_grid[j[1]]:.3f})")

# --- plot ------------------------------------------------------------------
fig, ax = plt.subplots(figsize=(6.4, 4.6))
lev = np.quantile(surface, [0.5, 0.8, 0.9, 0.96, 0.99, 0.999])
m = ax.contourf(b_grid, d_grid, surface.T, levels=50, cmap="viridis")
ax.contour(b_grid, d_grid, surface.T, levels=lev, colors="w", linewidths=0.5)
ax.plot([float(prob.p[1])], [float(prob.p[3])], "r*", ms=14,
        label="true (b, d)")
ax.plot([b_grid[j[0]]], [d_grid[j[1]]], "wo", ms=6, mfc="none",
        label="surface argmax")
ax.set_xlabel("b (predation rate)")
ax.set_ylabel("d (reproduction rate)")
ax.set_title("marginal data log-likelihood over 8192 candidates (one kernel call)")
fig.colorbar(m, ax=ax, label="log p(y | p)")
ax.legend(loc="lower right", fontsize=8)
fig.tight_layout()
_out = "inference_sweep.png" if SMOKE else "examples/inference_sweep.png"
fig.savefig(_out, dpi=110)
print(f"wrote {_out}")
