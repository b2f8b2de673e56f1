"""Gradient-based ODE parameter inference at kernel throughput.

The fused EK0 ensemble filter outputs the per-member data log-likelihood
(the reference's ``sol.log_likelihood``, `perform_step.jl:66`, accumulated
per ensemble member) and is differentiable via a custom VJP whose backward
pass is itself a Pallas kernel — so a full likelihood-gradient sweep over
thousands of parameter candidates costs ~1.3x one forward ensemble solve.

Demo: recover the Lotka-Volterra rates from noisy-ish initial conditions
by gradient ascent on the summed trajectory fit of the ensemble. Keeps the
horizon short (30 steps) — on-chip f32 adjoints are only accurate over
short windows (docs/kernels.md "Accuracy semantics"); run on CPU f64
(interpret mode) for long horizons.

Run:  python examples/parameter_inference.py            (TPU, f32)
      JAX_PLATFORMS=cpu python ... --interpret          (CPU f64, exact)
"""

import os
import sys

import jax
import jax.numpy as jnp

# ODEFILTERS_SMOKE=1: tiny interpret-mode run for the CI smoke test
SMOKE = os.environ.get("ODEFILTERS_SMOKE") == "1"
INTERPRET = "--interpret" in sys.argv or SMOKE
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import odefilters as odf  # noqa: E402
from odefilters.ops import pallas_kernels as pk  # noqa: E402
from odefilters.taylor import taylor_coefficients  # noqa: E402


def main():
    dtype = jnp.float64 if INTERPRET else jnp.float32
    B, T, q = pk.BLOCK, 10 if SMOKE else 60, 3
    tspan = (0.0, 3.0)
    dt = (tspan[1] - tspan[0]) / T
    prob = odf.models.lotka_volterra(tspan=tspan)
    p_true = prob.p.astype(dtype)

    # "data": the solution mean under the true parameters
    key = jax.random.PRNGKey(0)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(dtype)

    def init_ensemble(ps_flat):
        ps = jnp.broadcast_to(ps_flat, (B, ps_flat.shape[0])).astype(dtype)
        m0 = jax.vmap(
            lambda u0, p: jnp.stack(taylor_coefficients(prob.f, u0, p, 0.0, q))
        )(u0s, ps).transpose(1, 2, 0)
        return m0, ps.T

    def run(ps_flat):
        m0, psT = init_ensemble(ps_flat)
        us, stds, lls = pk.ek0_fused_filter(
            prob.f, m0, psT, 0.0, float(dt), T, q
        )
        return us

    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode if INTERPRET else _nullctx

    with ctx():
        data = run(p_true)

        # loss: mean-squared trajectory misfit of the whole ensemble
        def loss(ps_flat):
            return jnp.mean((run(ps_flat) - data) ** 2)

        p0 = p_true * jnp.asarray([1.3, 0.7, 1.2, 0.8], dtype)
        vg = jax.jit(jax.value_and_grad(loss))
        # Adam: the misfit surface's curvature varies strongly across the
        # four rates
        p, m, v2 = p0, jnp.zeros_like(p0), jnp.zeros_like(p0)
        lr, b1, b2, eps = 0.05, 0.9, 0.999, 1e-8
        for i in range(3 if SMOKE else 150):
            v, g = vg(p)
            m = b1 * m + (1 - b1) * g
            v2 = b2 * v2 + (1 - b2) * g * g
            mh = m / (1 - b1 ** (i + 1))
            vh = v2 / (1 - b2 ** (i + 1))
            p = p - lr * mh / (jnp.sqrt(vh) + eps)
            if i % 25 == 0:
                print(f"iter {i:3d}  loss {float(v):.3e}  p = {np.asarray(p)}")

    err = float(jnp.max(jnp.abs(p - p_true) / p_true))
    print(f"\ntrue p      = {np.asarray(p_true)}")
    print(f"recovered p = {np.asarray(p)}   (max rel err {err:.2e})")


class _nullctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
