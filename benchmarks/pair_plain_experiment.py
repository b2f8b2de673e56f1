"""A/B the pair's sqrt backward vs the plain-Joseph backward on chip.

The round-5 sqrt backward is issue-bound (flat across interleave factors,
pair_u.json); the plain-Joseph variant (`_ek0_pair_bwd_step_plain`)
carries the smoothed covariance plain through the additive Joseph form,
eliminating the per-step chol(C_f), sqrt(s2) and the 3(q+1)-row MGS (~7
transcendentals + ~40 mult-adds per member-step). This script times both
backwards on the same forward stream at the headline config (8192 FHN,
T=500, f32), checks their on-chip f32 agreement, and records which one
`ek0_fused_solve` should default to. f64-interpret exactness of the
plain form is covered by `test_pallas_ek0_smooth_plain_backward`.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        float(jnp.sum(fn(*args)))
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        per_call = (time.perf_counter() - t0) / iters
        if per_call >= 20e-3:
            return per_call
        iters = max(iters, min(400, int(round(0.3 / max(per_call, 1e-5)))))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import odefilters as odf
    from odefilters.ops import pallas_kernels as pk
    from odefilters.taylor import taylor_coefficients

    B, T, q = 8192, 500, 3
    tspan = (0.0, 20.0)
    dtype = jnp.float32
    prob = odf.models.fitzhugh_nagumo(tspan=tspan)
    key = jax.random.PRNGKey(0)
    u0s = (prob.u0.astype(dtype)
           + 0.1 * jax.random.normal(key, (B, 2))).astype(dtype)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(dtype)
    t0f, t1f = tspan
    dt = (t1f - t0f) / T

    def init_one(u0_, p_):
        return jnp.stack(taylor_coefficients(prob.f, u0_, p_, t0f, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)

    runs = {}
    outs = {}
    for name, plain in (("sqrt", False), ("plain", True)):
        fn = jax.jit(lambda m0_, ps_, _p=plain: pk.ek0_fused_solve(
            prob.f, m0_, ps_, t0f, dt, T, q, _bwd_plain=_p))
        timed = jax.jit(
            lambda m0_, ps_, _f=fn: _f(m0_, ps_)[0][-1].sum()
        )
        t = _timeit(timed, m0, ps.T)
        us, stds = fn(m0, ps.T)
        runs[name] = {"pair_s": t, "solves_per_s": B / t}
        outs[name] = (np.asarray(us, np.float64), np.asarray(stds, np.float64))
        print(name, f"{t * 1e3:.3f} ms  {B / t:.3e} solves/s", flush=True)

    du = float(np.abs(outs["plain"][0] - outs["sqrt"][0]).max())
    s_s, s_p = outs["sqrt"][1], outs["plain"][1]
    mask = s_s > 1e-12
    ds = float(np.abs((s_p[mask] - s_s[mask]) / s_s[mask]).max())
    out = {
        "config": "FHN B=8192 T=500 q=3 f32",
        **{f"{k}_{kk}": vv for k, v in runs.items() for kk, vv in v.items()},
        "max_abs_diff_us": du,
        "max_rel_diff_stds": ds,
        "speedup_plain_over_sqrt": runs["sqrt"]["pair_s"] / runs["plain"]["pair_s"],
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out, indent=2))
    Path(__file__).with_name("pair_plain.json").write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
