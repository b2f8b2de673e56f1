"""Run the full BASELINE.md benchmark config set; write benchmarks/results.json.

Configs (BASELINE.md / BASELINE.json):
  1. FitzHugh-Nagumo, EK0(1), abstol=1e-1 reltol=1e-2 (README example)
  2. Lotka-Volterra, EK1(3), adaptive + dynamic diffusion
  3. Van der Pol stiff (mu=1e5), EK1(5) + smoothing + sampling
  4. Brusselator 2D (~1e4 states), EK0 Kronecker
  5. 8192-member FHN ensemble, fixed grid (fused Pallas kernel +
     time-parallel associative-scan smoother variant)

Accuracy oracles are pure-numpy scipy solves (never route the oracle RHS
through the remote TPU). Usage: python benchmarks/run_all.py [--quick]
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
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x))


_LAST_TIMING = {}


def _time(fn, *args, iters=5, repeats=3):
    """Best (min) per-iteration wall time over ``repeats`` pipelined
    batches of ``iters`` dispatches each (sync once per batch via a tiny
    device->host transfer — block_until_ready is unreliable over the
    remote-TPU tunnel; per-dispatch syncing would add the tunnel RTT to
    every sample).

    The MIN is the contention-robust estimator: this single shared CPU
    core shows 2-3x batch-to-batch swings from host noise (measured —
    the round-3 "regressions" of lv_ek1_3/brusselator_2d were the axon
    backend's runtime threads stealing the core; CPU configs now run in
    an axon-free subprocess, see cpu_main), and timing noise on a quiet
    machine is strictly additive, so the minimum is the least-biased
    estimate of the true cost (the same reason `timeit` reports min).
    The full spread still lands in the governance fields
    (n_runs/std_s/mean_s); a large std_s flags contention during the
    run.

    DISPATCH AMORTIZATION (round-4): the remote-TPU tunnel costs
    ~15-40 ms per sync batch PLUS ~250 us per dispatched call — at the
    old iters=10 a sub-millisecond kernel measured the TUNNEL, not the
    chip (the round-3 ensemble_8192_pallas_filter artifact reported
    2.84M solves/s where the chip does ~17M). Sub-5ms calls are now
    re-timed with enough queued dispatches that the per-batch sync
    amortizes below ~2%; the residual ~250 us/call dispatch is part of
    the honest per-call figure and noted in `dispatch_floor_us`."""
    _sync(fn(*args))  # warmup / compile
    # two-round pilot: the dispatch floor inflates a shallow pilot's
    # per-call estimate (a 0.5 ms kernel reads ~3-6 ms at depth 10), so
    # deepen, re-estimate, deepen again — batches target ~0.3 s so the
    # ~15-40 ms per-batch sync amortizes below ~10%
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        per_call = (time.perf_counter() - t0) / iters
        if per_call >= 20e-3:
            break
        iters = max(iters, min(400, int(round(0.3 / max(per_call, 1e-5)))))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        samples.append((time.perf_counter() - t0) / iters)
    _LAST_TIMING.clear()
    _LAST_TIMING.update(
        n_runs=repeats, iters_per_run=iters,
        std_s=float(np.std(samples)), mean_s=float(np.mean(samples)),
        dispatch_floor_us=250.0,
    )
    return float(np.min(samples))


def _timing_fields():
    return dict(_LAST_TIMING)


def _entry(results, name, builder, retries=1, **static_fields):
    """Record one bench entry; retry on remote-compile crashes.

    The chipless AOT compile helper behind the remote-TPU tunnel
    segfaults nondeterministically (~once per battery, observed on two
    different large datalik kernels); a fresh helper subprocess almost
    always succeeds on retry. A persistent failure records an honest
    error entry instead of killing the whole battery.
    """
    err = None
    for attempt in range(retries + 1):
        try:
            results[name] = {**static_fields, **builder()}
            return
        except Exception as e:  # compile-helper crash = JaxRuntimeError
            err = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"[bench] {name} attempt {attempt + 1} failed: {err}",
                  file=sys.stderr)
    results[name] = {**static_fields, "error": err}


# Pure-numpy oracle RHS (routing the reference solve's RHS through JAX costs
# a dispatch per evaluation — minutes for an LSODA solve).
def _np_rhs(name, p):
    p = np.asarray(p, dtype=np.float64)
    if name == "fhn":
        a, b, tinv, iz = p

        def f(t, y):
            v, w = y
            return [v - v**3 / 3 - w + iz, tinv * (v + a - b * w)]

        return f, None
    if name == "lv":
        a, b, c, d = p

        def f(t, y):
            x, yy = y
            return [a * x - b * x * yy, -c * yy + d * x * yy]

        return f, None
    if name == "vdp":
        mu = float(p)

        def f(t, y):
            x, v = y
            return [v, mu * ((1 - x**2) * v - x)]

        def jac(t, y):
            x, v = y
            return [[0.0, 1.0], [mu * (-2 * x * v - 1.0), mu * (1 - x**2)]]

        return f, jac
    raise KeyError(name)


def oracle(prob, ts, name, stiff=False):
    from scipy.integrate import solve_ivp

    f, jac = _np_rhs(name, prob.p)
    r = solve_ivp(
        f, prob.tspan, np.asarray(prob.u0, dtype=np.float64),
        t_eval=np.asarray(ts, dtype=np.float64), rtol=1e-12, atol=1e-12,
        method="BDF" if stiff else "LSODA", jac=jac,
    )
    return r.y.T


def cpu_main(quick=False):
    """Configs 1-4 + the CPU time-parallel variant, axon-free.

    MUST run in a process where the remote-TPU ("axon") platform was
    never initialized: its runtime threads contend for the single host
    core and inflate x64 CPU wall times by a run-dependent 1.2-2x
    (measured: brusselator_2d 1.11 s/solve cpu-only vs 1.3-2.4 s with
    the axon backend live — the committed 930->424 steps/s "regression"
    was exactly this). ``main`` invokes this via a ``--cpu-only``
    subprocess.
    """
    # the CPU accuracy configs (esp. stiff VdP at mu=1e5) need f64
    jax.config.update("jax_enable_x64", True)

    import odefilters as odf
    from odefilters import sampling
    from odefilters.kronsolve import solve_fixed_kron

    cpu = jax.devices("cpu")[0]
    results = {}

    # ---------------- config 1: FHN EK0(1) README example ----------------
    name = "fhn"
    with jax.default_device(cpu):
        prob = odf.models.fitzhugh_nagumo()
        t = _time(
            lambda: odf.solve(prob, odf.EK0(order=1), abstol=1e-1, reltol=1e-2).u,
            iters=3,
        )
        sol = odf.solve(prob, odf.EK0(order=1), abstol=1e-1, reltol=1e-2)
        n = int(sol.n_steps)
        err = np.abs(
            np.asarray(sol.u[: n + 1]) - oracle(prob, sol.ts[: n + 1], name)
        ).max()
        results["fhn_ek0_1"] = {
            "steps": n, "runtime_s": t, "max_error": float(err),
            "steps_per_sec": n / t, **_timing_fields(),
        }

    # ---------------- config 2: Lotka-Volterra EK1(3) adaptive -----------
    name = "lv"
    with jax.default_device(cpu):
        prob = odf.models.lotka_volterra()
        alg = odf.EK1(order=3)
        t = _time(lambda: odf.solve(prob, alg, abstol=1e-8, reltol=1e-6).u, iters=3)
        sol = odf.solve(prob, alg, abstol=1e-8, reltol=1e-6)
        n = int(sol.n_steps)
        err = np.abs(
            np.asarray(sol.u[: n + 1]) - oracle(prob, sol.ts[: n + 1], name)
        ).max()
        results["lv_ek1_3"] = {
            "steps": n, "runtime_s": t, "max_error": float(err),
            "steps_per_sec": n / t, **_timing_fields(),
        }

    # ------------- config 3: stiff VdP EK1(5)+smooth+sampling ------------
    name = "vdp"
    with jax.default_device(cpu):
        prob = odf.models.van_der_pol(mu=1e5, tspan=(0.0, 0.5))
        alg = odf.EK1(order=5)
        sol = odf.solve(prob, alg, abstol=1e-7, reltol=1e-5, max_steps=8192)
        n = int(sol.n_steps)
        err = np.abs(
            np.asarray(sol.u[: n + 1]) - oracle(prob, sol.ts[: n + 1], name, stiff=True)
        ).max()
        t = _time(
            lambda: odf.solve(prob, alg, abstol=1e-7, reltol=1e-5, max_steps=8192).u,
            iters=2,
        )
        samp = sampling.sample(jax.random.PRNGKey(0), sol, 10)
        results["vdp_stiff_ek1_5"] = {
            "steps": n, "runtime_s": t, "max_error": float(err),
            "steps_per_sec": n / t,
            "samples_finite": bool(np.isfinite(np.asarray(samp)).all()),
            **_timing_fields(),
        }

    # ------------- config 4: Brusselator 2D, EK0 Kronecker ---------------
    with jax.default_device(cpu):
        N = 16 if quick else 70
        prob = odf.models.brusselator_2d(N=N, tspan=(0.0, 0.01))
        dt = 1e-5
        t = _time(
            lambda: solve_fixed_kron(prob, odf.EK0(order=3), dt=dt).u, iters=2
        )
        sol = solve_fixed_kron(prob, odf.EK0(order=3), dt=dt)
        results["brusselator_2d"] = {
            "d_states": prob.d, "steps": int(sol.n_steps), "runtime_s": t,
            "steps_per_sec": int(sol.n_steps) / t,
            "finite": bool(np.isfinite(np.asarray(sol.u)).all()),
            **_timing_fields(),
        }

    # time-parallel associative-scan smoother variant (CPU, 1 solve)
    from odefilters.parallel.associative import solve_fixed_parallel

    with jax.default_device(cpu):
        prob_c = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
        t = _time(
            lambda: solve_fixed_parallel(prob_c, odf.EK1(order=3), dt=0.04,
                                         iterations=4)[0],
            iters=2,
        )
        results["parallel_assoc_scan_ek1"] = {
            "grid_steps": 500, "runtime_s": t, "device": "cpu",
            "steps_per_sec": 500 / t, **_timing_fields(),
        }

    return results


def tpu_main(quick=False):
    """The on-chip configs (Pallas kernels + XLA chip drivers)."""
    jax.config.update("jax_enable_x64", True)

    import odefilters as odf
    from odefilters.ops import pallas_kernels as pk

    results = {}

    # ---- configs 1-3 on-chip: adaptive single-solve latency (f32) -------
    # The adaptive while-loop driver on the TPU chip itself. Compile time
    # reported separately (remote-TPU tunnel). Stiff VdP at mu=1e5 is not
    # f32-viable (initial dt underflows against t); it stays a CPU/f64
    # config above — recorded here with its retcode for honesty.
    def _bench_chip(prob, alg, kw, iters=5):
        run = jax.jit(
            lambda u0, p: odf.solve(
                odf.remake(prob, u0=u0, p=p), alg, **kw
            ).n_steps
        )
        u0 = prob.u0.astype(jnp.float32)
        p = prob.p.astype(jnp.float32)
        t0 = time.time()
        n = int(run(u0, p))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            n = run(u0, p)
        n = int(n)
        t = (time.perf_counter() - t0) / iters
        return {
            "compile_s": compile_s, "runtime_s": t, "steps": n,
            "steps_per_sec": n / t if n else 0.0,
            "device": str(jax.devices()[0]),
        }

    results["tpu_single_fhn_ek0_1"] = _bench_chip(
        odf.models.fitzhugh_nagumo(), odf.EK0(order=1),
        dict(abstol=1e-1, reltol=1e-2),
    )
    results["tpu_single_lv_ek1_3"] = _bench_chip(
        odf.models.lotka_volterra(), odf.EK1(order=3),
        dict(abstol=1e-8, reltol=1e-6),
    )
    vdp32 = _bench_chip(
        odf.models.van_der_pol(mu=1e5, tspan=(0.0, 0.5)), odf.EK1(order=5),
        dict(abstol=1e-7, reltol=1e-5, max_steps=8192), iters=2,
    )
    vdp32["note"] = (
        "EXPECTED failure in absolute time units (TPU transcendental "
        "range, docs/kernels.md); the on-chip stiff answer is the "
        "RESCALED solve in benchmarks/stiff_vdp_chip.json "
        "(tpu_vdp_mu1e5_ek1_5_f64: 683 steps, Success, via rescale_time)"
    )
    results["tpu_single_vdp_ek1_5_f32"] = vdp32

    # single-solve kernel latency: one problem broadcast across a block of
    # the per-lane adaptive kernel — ~1-2 s compiles vs 20 s+ for the XLA
    # driver, and in f32 also more accurate (docs/kernels.md)
    prob_lv = odf.models.lotka_volterra()
    u0_lv = prob_lv.u0.astype(jnp.float32)
    p_lv = prob_lv.p.astype(jnp.float32)
    run_single = jax.jit(
        lambda u0, p: pk.solve_adaptive_pallas_single(
            prob_lv.f, u0, p, prob_lv.tspan, 20, q=3,
            abstol=1e-8, reltol=1e-6, ek1=True, jac=prob_lv.jac,
        )
    )
    t0 = time.time()
    r = run_single(u0_lv, p_lv)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        r = run_single(u0_lv, p_lv)
    _sync(r[0])
    t = (time.perf_counter() - t0) / 5
    n = float(r[3])
    results["tpu_single_lv_ek1_3_pallas"] = {
        "compile_s": compile_s, "runtime_s": t, "steps": n,
        "steps_per_sec": n / t, "device": str(jax.devices()[0]),
        "note": (
            "single-solve story (BASELINE #1): the XLA while-loop driver "
            "has the lower per-step cost but pays multi-minute COLD "
            "remote compiles (its compile_s field here is whatever this "
            "process pays — warm in-process jit caches make it seconds; "
            "a fresh process pays the cold cost); this kernel path "
            "compiles in ~2 s cold and pays save-grid barrier "
            "truncations (n_save=20) that inflate its accepted-step "
            "count for one trajectory — pick per workload"
        ),
    }

    # config 1 through the same kernel single-solve path (EK0, low order)
    prob_f1 = odf.models.fitzhugh_nagumo()
    run_single_f = jax.jit(
        lambda u0, p: pk.solve_adaptive_pallas_single(
            prob_f1.f, u0, p, prob_f1.tspan, 20, q=1,
            abstol=1e-1, reltol=1e-2,
        )
    )
    u0_f = prob_f1.u0.astype(jnp.float32)
    p_f = prob_f1.p.astype(jnp.float32)
    t0 = time.time()
    r = run_single_f(u0_f, p_f)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        r = run_single_f(u0_f, p_f)
    _sync(r[0])
    t = (time.perf_counter() - t0) / 5
    n = float(r[3])
    results["tpu_single_fhn_ek0_1_pallas"] = {
        "compile_s": compile_s, "runtime_s": t, "steps": n,
        "steps_per_sec": n / t, "device": str(jax.devices()[0]),
    }

    # ------- config 5: 8192 FHN ensemble (Pallas kernel, on TPU) ---------
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    B, T = 8192, 500
    key = jax.random.PRNGKey(0)
    u0s = (prob.u0 + 0.1 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)

    @jax.jit
    def run(u0s, ps):
        us, stds, lls = pk.solve_ensemble_ek0_pallas(prob.f, u0s, ps, prob.tspan, T, q=3)
        return us[-1].sum() + stds[-1].sum()

    t = _time(run, u0s, ps, iters=10)
    results["ensemble_8192_pallas_filter"] = {
        "B": B, "grid_steps": T, "runtime_s": t,
        "solves_per_sec": B / t, "filter_steps_per_sec": B * T / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    @jax.jit
    def run_sm(u0s, ps):
        us, stds = pk.solve_ensemble_ek0_pallas_smooth(
            prob.f, u0s, ps, prob.tspan, T, q=3
        )
        return us[-1].sum() + stds[0].sum()

    t = _time(run_sm, u0s, ps, iters=10)
    results["ensemble_8192_pallas_filter_smoother"] = {
        "B": B, "grid_steps": T, "runtime_s": t,
        "solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    @jax.jit
    def run_sample(u0s, ps, key):
        us = pk.sample_ensemble_ek0_pallas(
            prob.f, u0s, ps, prob.tspan, T, key, q=3
        )
        return us[-1].sum()

    t = _time(run_sample, u0s, ps, key, iters=10)
    results["ensemble_8192_pallas_sampler"] = {
        "B": B, "grid_steps": T, "runtime_s": t,
        "sample_paths_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    @jax.jit
    def run_sample8(u0s, ps, key):
        us = pk.sample_ensemble_ek0_pallas(
            prob.f, u0s, ps, prob.tspan, T, key, q=3, n_samples=8
        )
        return us[-1].sum()

    t = _time(run_sample8, u0s, ps, key, iters=10)
    results["ensemble_8192_pallas_sampler_x8"] = {
        "B": B, "grid_steps": T, "n_samples": 8, "runtime_s": t,
        "sample_paths_per_sec": 8 * B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
        "note": (
            "all 8 samples share one backward pass; the gain/factor work "
            "is sample-independent"
        ),
    }

    @jax.jit
    def run_ek1(u0s, ps):
        us, stds = pk.solve_ensemble_ek1_pallas(
            prob.f, prob.jac, u0s, ps, prob.tspan, T, q=3, smooth=False
        )
        return us[-1].sum() + stds[0].sum()

    t = _time(run_ek1, u0s, ps, iters=10)
    results["ensemble_8192_pallas_ek1_filter"] = {
        "B": B, "grid_steps": T, "runtime_s": t,
        "solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    @jax.jit
    def run_ek1_sm(u0s, ps):
        us, stds = pk.solve_ensemble_ek1_pallas(
            prob.f, prob.jac, u0s, ps, prob.tspan, T, q=3, smooth=True
        )
        return us[-1].sum() + stds[0].sum()

    t = _time(run_ek1_sm, u0s, ps, iters=10)
    results["ensemble_8192_pallas_ek1_filter_smoother"] = {
        "B": B, "grid_steps": T, "runtime_s": t,
        "solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    @jax.jit
    def run_ek1_sample4(u0s, ps, key):
        us = pk.sample_ensemble_ek1_pallas(
            prob.f, prob.jac, u0s, ps, prob.tspan, T, key, q=3, n_samples=4
        )
        return us[-1].sum()

    t = _time(run_ek1_sample4, u0s, ps, key, iters=10)
    results["ensemble_8192_pallas_ek1_sampler_x4"] = {
        "B": B, "grid_steps": T, "n_samples": 4, "runtime_s": t,
        "sample_paths_per_sec": 4 * B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # ensemble IEKS (MAP): 4 sweeps of the fused EK1 pair, re-linearizing
    # at the previous sweep's smoothed means (kernel lin-trajectory stream)
    prob_lv5 = odf.models.lotka_volterra(tspan=(0.0, 5.0))
    u0s_lv = (prob_lv5.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(
        jnp.float32
    )
    ps_lv = jnp.broadcast_to(prob_lv5.p, (B, 4)).astype(jnp.float32)
    alg_ieks = odf.IEKS(order=3)

    @jax.jit
    def run_ieks(u0s, ps):
        sol = odf.ieks_ensemble_pallas(
            prob_lv5, alg_ieks, u0s, ps, n_steps=200, iterations=4
        )
        return sol.us[-1].sum()

    t = _time(run_ieks, u0s_lv, ps_lv, iters=5)
    results["ensemble_8192_pallas_ieks"] = {
        "B": B, "grid_steps": 200, "iterations": 4, "runtime_s": t,
        "map_solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # config 4 on-chip: fused Kron-grid kernel (whole PDE solve in VMEM)
    run_br = jax.jit(
        lambda: pk.solve_brusselator_ek0_pallas(
            70, (0.0, 0.01), 1000, q=3, save_every=50, dtype=jnp.float32
        )[0]
    )
    t = _time(run_br, iters=5)
    results["brusselator_2d_pallas"] = {
        "d_states": 2 * 70 * 70, "steps": 1000, "runtime_s": t,
        "steps_per_sec": 1000 / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # DiagonalEK1 grid kernel: same PDE, per-point gains (the stiff-PDE
    # production path; covariance lifts to (q+1)^2 per-point fields)
    run_br1d = jax.jit(
        lambda: pk.solve_brusselator_ek1d_pallas(
            70, (0.0, 0.01), 1000, q=3, save_every=50, dtype=jnp.float32
        )[0]
    )
    t = _time(run_br1d, iters=5)
    results["brusselator_2d_pallas_ek1d"] = {
        "d_states": 2 * 70 * 70, "steps": 1000, "runtime_s": t,
        "steps_per_sec": 1000 / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # adaptive per-lane-dt ensemble kernel (the realistic parameter-
    # inference workload: every member runs its own PI controller)
    run_ad = jax.jit(
        lambda u, p: pk.solve_ensemble_ek0_adaptive_pallas(
            prob.f, u, p, prob.tspan, 20, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=20_000,
        )
    )
    t = _time(lambda u, p: run_ad(u, p)[0], u0s, ps, iters=5)
    _, _, _, nacc, _, fail = run_ad(u0s, ps)
    results["ensemble_8192_pallas_adaptive"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "solves_per_sec": B / t,
        "mean_accepted_steps": float(nacc.mean()),
        "failed_members": int(fail.sum()),
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    run_ad1 = jax.jit(
        lambda u, p: pk.solve_ensemble_ek1_adaptive_pallas(
            prob.f, prob.jac, u, p, prob.tspan, 20, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=20_000,
        )[0]
    )
    t = _time(run_ad1, u0s, ps, iters=5)
    results["ensemble_8192_pallas_adaptive_ek1"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # DiagonalEK1 adaptive ensemble kernel: EK1-style linearization at
    # near-EK0 per-dim cost (d JVP diagonals in-kernel)
    run_ad1d = jax.jit(
        lambda u, p: pk.solve_ensemble_ek1d_adaptive_pallas(
            prob.f, None, u, p, prob.tspan, 20, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=20_000,
        )[0]
    )
    t = _time(run_ad1d, u0s, ps, iters=5)
    results["ensemble_8192_pallas_adaptive_ek1d"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # adaptive filter + RTS smoother fused pair (the reference's DEFAULT
    # solve config): forward streams one row per attempt to HBM, the
    # backward kernel smooths each lane's ragged accepted-step chain.
    # max_iters sizes the attempt stream (shared block counter: barrier
    # waits at save points inflate it past per-member attempt counts).
    run_adsm = jax.jit(
        lambda u, p: pk.solve_ensemble_ek0_adaptive_smooth_pallas(
            prob.f, u, p, prob.tspan, 20, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=4096,
        )
    )
    t = _time(lambda u, p: run_adsm(u, p)[0], u0s, ps, iters=5)
    _, _, _, nacc_sm, _, fail_sm = run_adsm(u0s, ps)
    results["ensemble_8192_pallas_adaptive_smooth"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "solves_per_sec": B / t,
        "mean_accepted_steps": float(nacc_sm.mean()),
        "failed_members": int(fail_sm.sum()),
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    run_adsm1d = jax.jit(
        lambda u, p: pk.solve_ensemble_ek1d_adaptive_smooth_pallas(
            prob.f, None, u, p, prob.tspan, 20, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=4096,
        )[0]
    )
    t = _time(run_adsm1d, u0s, ps, iters=5)
    results["ensemble_8192_pallas_adaptive_smooth_ek1d"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # adaptive-SOLUTION sampling (round 4): attempt-stream forward +
    # backward conditioning sampler over each lane's ragged chain
    key_as = jax.random.PRNGKey(3)
    run_adsmp = jax.jit(
        lambda u, p, k: pk.sample_ensemble_adaptive_pallas(
            prob.f, u, p, prob.tspan, 20, k, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=4096,
        )[0]
    )
    t = _time(run_adsmp, u0s, ps, key_as, iters=5)
    results["ensemble_8192_pallas_adaptive_sampler"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "sample_paths_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # dense-EK1 adaptive+smooth pair (round-4: the reference's literal
    # default EK1 config at kernel speed; streams committed D x D
    # factors per attempt — max_iters sized well below the EK0 pair's)
    run_adsm1 = jax.jit(
        lambda u, p: pk.solve_ensemble_ek1_adaptive_smooth_pallas(
            prob.f, prob.jac, u, p, prob.tspan, 20, q=3,
            abstol=1e-6, reltol=1e-4, max_iters=2048,
        )
    )
    t = _time(lambda u, p: run_adsm1(u, p)[0], u0s, ps, iters=5)
    _, _, _, nacc_e1, _, fail_e1 = run_adsm1(u0s, ps)
    results["ensemble_8192_pallas_adaptive_smooth_ek1"] = {
        "B": B, "save_points": 20, "runtime_s": t,
        "solves_per_sec": B / t,
        "mean_accepted_steps": float(nacc_e1.mean()),
        "failed_members": int(fail_e1.sum()),
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # gradient of the per-member log-likelihood through the fused filter
    # (custom VJP; backward pass is a second Pallas kernel)
    def loss(m0_, ps_):
        us, stds, lls = pk.ek0_fused_filter(
            prob.f, m0_, ps_, 0.0, 20.0 / T, T, 3
        )
        return jnp.sum(lls)

    from odefilters.taylor import taylor_coefficients

    m0 = jax.vmap(
        lambda u0, p: jnp.stack(taylor_coefficients(prob.f, u0, p, 0.0, 3))
    )(u0s, ps).transpose(1, 2, 0).astype(jnp.float32)
    gfn = jax.jit(lambda m, p: jax.grad(loss, argnums=1)(m, p))
    t = _time(gfn, m0, ps.T, iters=10)
    results["ensemble_8192_pallas_likelihood_grad"] = {
        "B": B, "grid_steps": T, "runtime_s": t,
        "grad_solves_per_sec": B / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
        "note": (
            "gradient of the ODE-RESIDUAL log-likelihood: in f32 this "
            "objective's gradient is trustworthy over tens of steps "
            "only (innovations sit at the solver-accuracy floor — "
            "benchmarks/grad_horizon.json); for long-horizon parameter "
            "inference use the DATA likelihood with calib_grad=False "
            "(8e-5 rel at T=500), same kernel family"
        ),
    }

    # ---- data-likelihood parameter sweep on chip: vmap(data_loglik) over
    # a batch of candidate parameter vectors (the physics-enhanced
    # regression / inference workload, odefilters.datalik) ----
    prob_lv = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    ts_d = np.linspace(0.3, 2.7, 9)
    truth = oracle(prob_lv, ts_d, "lv")
    rng_d = np.random.default_rng(7)
    ys_d = (truth + 0.05 * rng_d.standard_normal(truth.shape)).astype(
        np.float32
    )
    prob_lv32 = odf.remake(
        prob_lv, u0=prob_lv.u0.astype(jnp.float32),
        p=prob_lv.p.astype(jnp.float32),
    )

    def one_ll(p):
        return odf.data_loglik(
            odf.remake(prob_lv32, p=p), odf.EK1(order=2, smooth=False),
            ts_d, ys_d, 0.05, n_grid=40,
        )

    Bs = 1024
    ps_cand = (
        jnp.asarray(prob_lv.p, jnp.float32)[None, :]
        * jnp.asarray(
            rng_d.uniform(0.8, 1.2, (Bs, 4)), jnp.float32
        )
    )
    sweep = jax.jit(jax.vmap(one_ll))
    t = _time(lambda ps_: sweep(ps_), ps_cand, iters=10)
    from odefilters.datalik import _merged_grid

    n_rows = int(
        _merged_grid(prob_lv32, ts_d, 40, jnp.float32)[0].shape[0]
    )
    results["tpu_datalik_sweep"] = {
        "B_candidates": Bs, "grid_rows": n_rows, "n_obs": 9, "runtime_s": t,
        "candidates_per_sec": Bs / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # the same workload through the FUSED data-likelihood kernel
    # (ensemble_data_loglik_pallas): observations on the uniform grid,
    # per-member chain-rule marginal likelihood entirely in-kernel
    Tk = 120
    dtk = 3.0 / Tk
    ts_k = np.array([12, 40, 52, 64, 80, 96, 104, 112, 116]) * dtk
    ys_k = np.asarray(
        oracle(prob_lv, ts_k, "lv")
        + 0.05 * rng_d.standard_normal((9, 2))
    )
    Bk = 8192
    ps_k = jnp.asarray(
        np.asarray(prob_lv.p)[None, :]
        * rng_d.uniform(0.8, 1.2, (Bk, 4)),
        jnp.float32,
    )
    u0s_k = jnp.broadcast_to(prob_lv.u0, (Bk, 2)).astype(jnp.float32)
    kfn = jax.jit(
        lambda u, p: pk.ensemble_data_loglik_pallas(
            prob_lv.f, u, p, prob_lv.tspan, Tk, ts_k, ys_k,
            obs_noise_std=0.05, q=3,
        )[0]
    )
    def _bench_rate(fn, iters, rate_key, denom=None):
        def build():
            t = _time(fn, u0s_k, ps_k, iters=iters)
            return {
                "runtime_s": t, rate_key: (denom or Bk) / t,
                "device": str(jax.devices()[0]), **_timing_fields(),
            }
        return build

    _entry(
        results, "tpu_datalik_sweep_pallas",
        _bench_rate(kfn, 20, "candidates_per_sec"),
        B_candidates=Bk, grid_steps=Tk, n_obs=9,
    )

    # ... and its gradient (custom VJP: streamed states + segmented
    # adjoint kernel) — gradient-based inference at kernel speed
    def kloss(u, p):
        dll, _ = pk.ensemble_data_loglik_pallas(
            prob_lv.f, u, p, prob_lv.tspan, Tk, ts_k, ys_k,
            obs_noise_std=0.05, q=3,
        )
        return jnp.sum(dll)

    kgrad = jax.jit(jax.grad(kloss, argnums=(0, 1)))
    _entry(
        results, "tpu_datalik_grad_sweep_pallas",
        _bench_rate(lambda u, p: kgrad(u, p)[1], 20, "grad_candidates_per_sec"),
        B_candidates=Bk, grid_steps=Tk, n_obs=9,
    )

    # partial observations (prey-only) through the per-dim EK0 kernel —
    # the realistic inference workload VERDICT r2 flagged as 100x slower
    # on the XLA path; now at kernel speed
    C_part = np.array([[1.0, 0.0]])
    kfn_pd = jax.jit(
        lambda u, p: pk.ensemble_data_loglik_pallas(
            prob_lv.f, u, p, prob_lv.tspan, Tk, ts_k, ys_k[:, :1],
            obs_noise_std=0.05, q=3, obs_matrix=C_part,
        )[0]
    )
    _entry(
        results, "tpu_datalik_partial_obs_pallas",
        _bench_rate(kfn_pd, 20, "candidates_per_sec"),
        B_candidates=Bk, grid_steps=Tk, n_obs=9, d_obs=1,
    )

    # ... and its gradient (per-dim custom VJP kernel)
    def kloss_pd(u, p):
        dll, _ = pk.ensemble_data_loglik_pallas(
            prob_lv.f, u, p, prob_lv.tspan, Tk, ts_k, ys_k[:, :1],
            obs_noise_std=0.05, q=3, obs_matrix=C_part, calib_grad=False,
        )
        return jnp.sum(dll)

    kgrad_pd = jax.jit(jax.grad(kloss_pd, argnums=(0, 1)))
    _entry(
        results, "tpu_datalik_partial_obs_grad_pallas",
        _bench_rate(lambda u, p: kgrad_pd(u, p)[1], 10,
                    "grad_candidates_per_sec"),
        B_candidates=Bk, grid_steps=Tk, n_obs=9, d_obs=1,
    )

    # ... the same workload on the XLA path (the comparison point)
    def one_ll_part(p):
        return odf.data_loglik(
            odf.remake(prob_lv32, p=p), odf.EK1(order=2, smooth=False),
            ts_d, ys_d[:, :1], 0.05, obs_matrix=C_part, n_grid=40,
        )

    sweep_part = jax.jit(jax.vmap(one_ll_part))
    t = _time(lambda ps_: sweep_part(ps_), ps_cand, iters=10)
    results["tpu_datalik_partial_obs_xla"] = {
        "B_candidates": Bs, "n_obs": 9, "d_obs": 1, "runtime_s": t,
        "candidates_per_sec": Bs / t,
        "device": str(jax.devices()[0]), **_timing_fields(),
    }

    # EK1 data-likelihood kernel (dense-covariance square-root filter +
    # joint noisy updates): the stiff-inference configuration
    kfn_e1 = jax.jit(
        lambda u, p: pk.ensemble_data_loglik_pallas(
            prob_lv.f, u, p, prob_lv.tspan, Tk, ts_k, ys_k,
            obs_noise_std=0.05, q=3, ek1=True, jac=prob_lv.jac,
        )[0]
    )
    _entry(
        results, "tpu_datalik_ek1_pallas",
        _bench_rate(kfn_e1, 10, "candidates_per_sec"),
        B_candidates=Bk, grid_steps=Tk, n_obs=9,
    )

    # DiagonalEK1 data-likelihood kernel: stiff-robust linearization at
    # the per-dim kernel's cost (Jacobian diagonal from d in-kernel JVPs)
    kfn_e1d = jax.jit(
        lambda u, p: pk.ensemble_data_loglik_pallas(
            prob_lv.f, u, p, prob_lv.tspan, Tk, ts_k, ys_k,
            obs_noise_std=0.05, q=3, diagonal_ek1=True,
        )[0]
    )
    _entry(
        results, "tpu_datalik_ek1d_pallas",
        _bench_rate(kfn_e1d, 10, "candidates_per_sec"),
        B_candidates=Bk, grid_steps=Tk, n_obs=9,
    )

    return results


_CPU_RESULTS_PATH = "benchmarks/.cpu_results.json"


def main(quick=False):
    # CPU configs in an axon-free subprocess (see cpu_main docstring)
    import subprocess

    cmd = [sys.executable, __file__, "--cpu-only"]
    if quick:
        cmd.append("--quick")
    subprocess.run(cmd, check=True)
    with open(_CPU_RESULTS_PATH) as fh:
        results = json.load(fh)

    results.update(tpu_main(quick))

    out = json.dumps(results, indent=2)
    print(out)
    with open("benchmarks/results.json", "w") as fh:
        fh.write(out)

    # governance gate: refuse to let a silent throughput/accuracy drift
    # into the committed numbers (benchmarks/check_regression.py)
    sys.path.insert(0, "benchmarks")
    from check_regression import report

    if not report(results):
        sys.exit(1)


if __name__ == "__main__":
    if "--cpu-only" in sys.argv:
        # force real CPU before any backend init (shell env is ignored:
        # the container's sitecustomize force-registers axon)
        jax.config.update("jax_platforms", "cpu")
        res = cpu_main(quick="--quick" in sys.argv)
        with open(_CPU_RESULTS_PATH, "w") as fh:
            json.dump(res, fh, indent=2)
    else:
        main(quick="--quick" in sys.argv)
