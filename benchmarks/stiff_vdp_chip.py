"""BASELINE config #3 on-chip: stiff Van der Pol (mu=1e5), EK1(5).

VERDICT r2 item 2: the stiff config previously had no on-chip number.
Round-3 diagnosis (measured, /tmp probes + docs/kernels.md "f64 on
TPU"): TPU f64 ADD/MUL/matmul are true f64, but transcendentals
(pow/exp/log/sqrt — hence QR and Cholesky, which use sqrt internally)
are range-limited to f32 and only ~1e-8-accurate. A stiff solve in
absolute time units needs preconditioner entries h**(-q-1/2) ~ 1e40 and
covariance scales ~ 1e57, so the un-rescaled solve NaNs at the first
step in f64 AND f32 — not a precision problem but a RANGE problem.

The TPU-native answer is `odefilters.rescale_time`: solve in time units
tau ~ initial_dt / 1e-2 (tau = 1/mu for VdP), which keeps every
intermediate within f32 range. This script measures, on chip:
  * the un-rescaled f64 attempt (documents the failure mode),
  * the RESCALED f64 solve (the headline: steps > 0, error vs the
    CPU-f64 BDF oracle),
  * the rescaled f32 solve + a mu-sweep locating the f32 accuracy
    boundary (f32 precision, not range, is then the limit).

Writes benchmarks/stiff_vdp_chip.json. Reference analogue:
/root/reference/test/specific_problems.jl:44-47 (stiff VdP regression).
Usage: python benchmarks/stiff_vdp_chip.py [--quick]
"""

import os as _os
import sys as _sys

# runnable as `python benchmarks/<script>.py` from anywhere: the repo
# root (odefilters package) goes on sys.path ahead of the script dir
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys
import time

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _oracle(u0, mu, ts):
    from scipy.integrate import solve_ivp

    def f(t, y):
        x, v = y
        return [v, mu * ((1 - x**2) * v - x)]

    def jac(t, y):
        x, v = y
        return [[0.0, 1.0], [mu * (-2 * x * v - 1.0), mu * (1 - x**2)]]

    r = solve_ivp(
        f, (float(ts[0]), float(ts[-1])), np.asarray(u0, np.float64),
        t_eval=np.asarray(ts, np.float64), rtol=1e-12, atol=1e-12,
        method="BDF", jac=jac,
    )
    return r.y.T


def solve_on(device, dtype, mu=1e5, tspan=(0.0, 0.5), max_steps=8192,
             abstol=1e-7, reltol=1e-5, tau=None, smooth=False):
    """One adaptive EK1(5) solve; ``tau``: solve in rescaled time units
    (odefilters.rescale_time) and map the grid back for the oracle.

    ``smooth=False`` by default: the chip entries report FILTER accuracy
    (an extreme-stiffness RTS pass on chip-collapsed covariances is
    noise-dominated — see the smoothed-posterior section below)."""
    import odefilters as odf

    prob = odf.models.van_der_pol(mu=mu, tspan=tspan)
    if tau is not None:
        prob = odf.rescale_time(prob, tau)
    prob = odf.remake(
        prob, u0=prob.u0.astype(dtype), p=jnp.asarray(prob.p, dtype)
    )
    alg = odf.EK1(order=5, smooth=smooth)

    run = jax.jit(
        lambda u0, p: odf.solve(
            odf.remake(prob, u0=u0, p=p), alg,
            abstol=abstol, reltol=reltol, max_steps=max_steps,
        )
    )
    u0 = jax.device_put(prob.u0, device)
    p = jax.device_put(prob.p, device)
    with jax.default_device(device):
        t0 = time.time()
        sol = run(u0, p)
        n = int(sol.n_steps)
        compile_s = time.time() - t0
        iters = 2
        t0 = time.perf_counter()
        for _ in range(iters):
            sol = run(u0, p)
        n = int(sol.n_steps)  # device->host sync (tunnel-safe)
        t = (time.perf_counter() - t0) / iters
    out = {
        "mu": mu, "dtype": str(np.dtype(dtype)), "steps": n,
        "retcode": sol.retcode_name, "compile_s": compile_s,
        "runtime_s": t, "steps_per_sec": n / t if n else 0.0,
        "device": str(device), "tau": tau,
    }
    if sol.retcode_name == "Success" and 0 < n < max_steps:
        ts = np.asarray(sol.ts[: n + 1], np.float64)
        ts_abs = ts * tau if tau is not None else ts
        err = np.abs(
            np.asarray(sol.u[: n + 1], np.float64)
            - _oracle(prob.u0, mu, ts_abs)
        ).max()
        out["max_error"] = float(err)
    return out


def main(quick=False):
    results = {}
    tpu = jax.devices()[0]
    cpu = jax.devices("cpu")[0]

    # --- un-rescaled f64 on chip: documents the RANGE failure mode ---
    r = solve_on(tpu, jnp.float64)
    r["note"] = (
        "expected failure: absolute-time-units stiff solve exceeds the "
        "f32 RANGE of TPU transcendentals/QR (docs/kernels.md)"
    )
    results["tpu_vdp_mu1e5_ek1_5_f64_unscaled"] = r
    print(json.dumps(r), flush=True)

    # --- the headline: RESCALED f64 EK1(5) on the TPU chip ---
    results["tpu_vdp_mu1e5_ek1_5_f64"] = solve_on(
        tpu, jnp.float64, tau=1e-5
    )
    print(json.dumps(results["tpu_vdp_mu1e5_ek1_5_f64"]), flush=True)

    # --- BASELINE #3 asks for smoothing + sampling too. Two measured
    # facts shape the answer (docs/kernels.md "f64 on TPU"):
    #   1. The smoother's covariance range exceeds the TPU's
    #      f32-range-limited transcendentals/QR, so the O(N D^2)
    #      backward pass must run on HOST regardless.
    #   2. Chip filter states carry ~1e-8 arithmetic error while the
    #      converged filter covariances collapse far below that — the
    #      exact RTS gain amplifies the inconsistency without bound.
    #      `smooth_solution(jitter=...)` floors the predicted factor,
    #      bounding the amplification; we record the smoothed error it
    #      achieves honestly, next to the CPU-f64 end-to-end smoothed
    #      solve (the production recommendation when the smoothed
    #      posterior itself — not just the trajectory — is the product).
    import odefilters as odf
    from odefilters import sampling

    prob_s = odf.rescale_time(
        odf.models.van_der_pol(mu=1e5, tspan=(0.0, 0.5)), 1e-5
    )
    with jax.default_device(tpu):
        sol = jax.jit(
            lambda u0, p: odf.solve(
                odf.remake(prob_s, u0=u0, p=p),
                odf.EK1(order=5, smooth=False),
                abstol=1e-7, reltol=1e-5, max_steps=8192,
            )
        )(
            jax.device_put(prob_s.u0, tpu),
            jax.device_put(jnp.asarray(prob_s.p), tpu),
        )
        n = int(sol.n_steps)
    oracle_sm = _oracle(
        prob_s.u0, 1e5, np.asarray(sol.ts[: n + 1], np.float64) * 1e-5
    )
    t0 = time.perf_counter()
    with jax.default_device(cpu):
        sol_h = jax.device_get(sol)
        sol_sm = odf.smooth_solution(sol_h, jitter=1e-7)
        samp = sampling.sample(jax.random.PRNGKey(0), sol_sm, 10, jitter=1e-7)
        finite = bool(np.isfinite(np.asarray(samp)[: n + 1]).all())
    t_host = time.perf_counter() - t0
    err_sm = np.abs(
        np.asarray(sol_sm.u[: n + 1], np.float64) - oracle_sm
    ).max()
    results["tpu_vdp_mu1e5_smooth_sample_host"] = {
        "steps": n, "host_smooth_sample_s": t_host,
        "max_error_smoothed": float(err_sm), "samples_finite": finite,
        "jitter": 1e-7,
        "note": "forward adaptive filter on chip; jittered RTS smoothing "
                "+ 10 posterior samples on host. Chip filter states carry "
                "~1e-8 arithmetic error below the converged covariance "
                "scale; the jitter floor bounds the RTS gain's "
                "amplification of that inconsistency (exact gain -> inf).",
    }
    print(json.dumps(results["tpu_vdp_mu1e5_smooth_sample_host"]), flush=True)

    # CPU-f64 end-to-end smoothed solve: the production path when the
    # smoothed posterior is the deliverable at extreme stiffness.
    r = solve_on(cpu, jnp.float64, smooth=True)
    results["cpu_vdp_mu1e5_ek1_5_f64_smoothed"] = r
    print(json.dumps(r), flush=True)

    # --- rescaled f32 on chip ---
    results["tpu_vdp_mu1e5_ek1_5_f32"] = solve_on(
        tpu, jnp.float32, tau=1e-5
    )
    print(json.dumps(results["tpu_vdp_mu1e5_ek1_5_f32"]), flush=True)

    # --- CPU f64 for the same config (context) ---
    results["cpu_vdp_mu1e5_ek1_5_f64"] = solve_on(cpu, jnp.float64)
    print(json.dumps(results["cpu_vdp_mu1e5_ek1_5_f64"]), flush=True)

    # --- f32 accuracy sweep (rescaled): where does f32 PRECISION bite? ---
    mus = [1e1, 1e2] if quick else [1e1, 1e2, 1e3, 1e4, 1e5]
    sweep = []
    for mu in mus:
        r = solve_on(tpu, jnp.float32, mu=mu, tau=1.0 / mu)
        ok = (
            r["retcode"] == "Success"
            and r.get("max_error", np.inf) < 1e-2
        )
        r["viable"] = bool(ok)
        sweep.append(r)
        print(json.dumps(r), flush=True)
    results["tpu_vdp_f32_mu_sweep_rescaled"] = sweep
    viable = [r["mu"] for r in sweep if r["viable"]]
    results["f32_viability_boundary_mu"] = max(viable) if viable else 0.0

    with open("benchmarks/stiff_vdp_chip.json", "w") as fh:
        json.dump(results, fh, indent=2)
    print("wrote benchmarks/stiff_vdp_chip.json")


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
