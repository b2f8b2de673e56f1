"""Time-parallel vs sequential solver sweep over grid length N (on-chip).

Sweeps N on FitzHugh-Nagumo over t in [0, 20], fixed uniform grid, f32,
and compares wall-clock AND solution accuracy for:

- the sequential dense XLA scan (`solve_fixed`, D x D square-root filter
  + smoother),
- the sequential EK0-Kronecker scan (`solve_fixed_kron`),
- the iterated square-root time-parallel solver (`solve_fixed_parallel`)
  with the fused Pallas scan kernels (`block="pallas"`) and with the XLA
  blocked hybrid scan (`block=auto`), both warm-started.

Every row (par AND seq) records `max_diff` against the CPU f64
sequential solve of the same discrete problem — the exactness oracle —
and an explicit ``diverged`` flag when max_diff > 1e-2. (Round 4
compared par to the CHIP F32 sequential solve; round 5's attribution
experiment, `benchmarks/tp_accuracy.json`, showed that at N=16384 that
baseline itself drifts 0.035 from the oracle while the log-depth
parallel scan sits at 1.1e-4 — the flag was measuring the baseline.)
History:
round-3 found the round-2 sweep had benchmarked UNCONVERGED solutions
(cold-start iterations=4 leaves O(1) error at every N; the GLOBAL EK0
Picard iteration outright diverges with more sweeps on this span).
Round-4 adds the WINDOWED solver rows (`windows=`): EK0's Picard
contracts inside short windows, giving EK0 a *convergent* time-parallel
configuration — the performance story the global rows cannot provide.

Compile cost: rows record the COLD compile of this process. Run with
--cached to enable the JAX persistent compilation cache
(benchmarks/.jax_cache) — a refresh on unchanged code then reloads each
program in seconds; the JSON notes which mode produced it.

Writes benchmarks/time_parallel_sweep.json. Usage:
    python benchmarks/time_parallel_sweep.py [--quick] [--cached]
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


def _sync(x):
    return float(jnp.sum(x))


def _time(fn, iters=3):
    t0 = time.perf_counter()
    _sync(fn())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, compile_s


def main(quick=False, cached=False):
    if cached:
        import os

        os.makedirs("benchmarks/.jax_cache", exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          "benchmarks/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import odefilters as odf
    from odefilters.kronsolve import solve_fixed_kron
    from odefilters.parallel.associative import solve_fixed_parallel

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    Ns = [1024, 4096] if quick else [1024, 4096, 16384]
    results = {"device": str(jax.devices()[0]),
               "compile_mode": "persistent-cache" if cached else "cold",
               "sweep": []}

    for N in Ns:
        ts = jnp.linspace(0.0, 20.0, N + 1, dtype=jnp.float32)
        row = {"N": N}

        t, _ = _time(lambda: solve_fixed_kron(
            prob, odf.EK0(order=3), ts=ts).u)
        row["seq_kron_ek0_s"] = t

        t, _ = _time(lambda: odf.solve_fixed(prob, odf.EK1(order=3), ts=ts).u)
        row["seq_dense_ek1_s"] = t
        u_seq1 = odf.solve_fixed(prob, odf.EK1(order=3), ts=ts).u
        u_seq0 = odf.solve_fixed(prob, odf.EK0(order=3), ts=ts).u

        # f64 accuracy oracle (CPU): the SAME discrete problem, exactly.
        # Round-5 finding (benchmarks/tp_accuracy.json): at N=16384 the
        # chip f32 SEQUENTIAL solve drifts 0.035 from this oracle while
        # the log-depth parallel scan sits at 1.1e-4 — comparing par to
        # the f32 sequential solve (the round-4 metric) flagged the
        # parallel solver for the baseline's own serial f32
        # accumulation. max_diff is therefore measured against the f64
        # oracle for par AND seq rows alike.
        import numpy as np

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu), jax.enable_x64(True):
            ts64 = jnp.linspace(0.0, 20.0, N + 1, dtype=jnp.float64)
            prob64 = odf.remake(prob, u0=prob.u0.astype(jnp.float64),
                                p=prob.p.astype(jnp.float64))
            ref1 = np.asarray(odf.solve_fixed(prob64, odf.EK1(order=3),
                                              ts=ts64).u)
            ref0 = np.asarray(odf.solve_fixed(prob64, odf.EK0(order=3),
                                              ts=ts64).u)

        def _md(u, ref):
            return float(np.max(np.abs(np.asarray(u, np.float64) - ref)))

        row["seq_ek1_max_diff"] = _md(u_seq1, ref1)
        row["seq_ek0_max_diff"] = _md(u_seq0, ref0)

        # fused Pallas scan kernels (warm-started Newton, 2 sweeps)
        par_pl = lambda: solve_fixed_parallel(
            prob, odf.EK1(order=3), ts=ts, iterations=2, block="pallas")[0]
        t, c = _time(par_pl, iters=5)
        row["par_ek1_pallas_s"] = t
        row["par_ek1_pallas_compile_s"] = c
        row["par_ek1_pallas_max_diff"] = _md(par_pl(), ref1)

        # XLA blocked hybrid scan (same math, no kernels). Default warm
        # start (adaptive coarse kernel): round-3 pinned warm_start=8,
        # whose N=1024 coarse grid was too coarse — the row was an
        # UNCONVERGED configuration benchmarked as comparable
        # (max_diff 4.48); the default converges at every N here.
        from odefilters.parallel.blocked import auto_block

        par_xla = lambda: solve_fixed_parallel(
            prob, odf.EK1(order=3), ts=ts, iterations=2,
            block=auto_block(N) or 64)[0]
        t, c = _time(par_xla, iters=3)
        row["par_ek1_xla_s"] = t
        row["par_ek1_xla_compile_s"] = c
        row["par_ek1_xla_max_diff"] = _md(par_xla(), ref1)

        # EK0, GLOBAL Picard: kept for the honest divergence record
        par_e0 = lambda: solve_fixed_parallel(
            prob, odf.EK0(order=3), ts=ts, iterations=4, block="pallas")[0]
        t, c = _time(par_e0, iters=5)
        row["par_ek0_pallas_s"] = t
        row["par_ek0_pallas_compile_s"] = c
        row["par_ek0_pallas_max_diff"] = _md(par_e0(), ref0)

        # EK0, WINDOWED (round-4): N/W-step windows run sequentially,
        # the Picard iteration contracts inside each — the convergent
        # EK0 time-parallel configuration (parallel/windowed.py). W is
        # CONSTANT: the window span (20/16 = 1.25 time units) is what
        # keeps FHN's relinearization contractive, and a constant window
        # count lets the in-window associative scans grow with N (a
        # W ~ N/64 choice makes windowed time scale like the sequential
        # solve — measured 0.31x at N=1024 before this fix).
        W = 16
        par_e0w = lambda: solve_fixed_parallel(
            prob, odf.EK0(order=3), ts=ts, windows=W, iterations=4)[0]
        t, c = _time(par_e0w, iters=3)
        row["par_ek0_windowed_s"] = t
        row["par_ek0_windowed_windows"] = W
        row["par_ek0_windowed_compile_s"] = c
        row["par_ek0_windowed_max_diff"] = _md(par_e0w(), ref0)
        row["speedup_ek0_windowed_vs_seq_kron"] = (
            row["seq_kron_ek0_s"] / row["par_ek0_windowed_s"]
        )

        # warm-started 2-sweep windowed EK0 (round 5): the windowed rows
        # above spend 4 in-window sweeps; with the adaptive coarse warm
        # start (the accelerator default) the window linearization
        # starts ~1e-3 from the solution and 2 sweeps suffice — the
        # speed configuration. (Round-5 CPU attribution: the round-4
        # "f32 drift at length >= 256" was Picard UNDER-CONVERGENCE of
        # the cold 4-sweep config — f64 shows the same 0.21 at 4 sweeps
        # and 3e-3 at 8; benchmarks/tp_accuracy.json context.)
        par_e0w2 = lambda: solve_fixed_parallel(
            prob, odf.EK0(order=3), ts=ts, windows=W, iterations=2)[0]
        t, c = _time(par_e0w2, iters=3)
        row["par_ek0_windowed2_s"] = t
        row["par_ek0_windowed2_compile_s"] = c
        row["par_ek0_windowed2_max_diff"] = _md(par_e0w2(), ref0)
        row["speedup_ek0_windowed2_vs_seq_kron"] = (
            row["seq_kron_ek0_s"] / row["par_ek0_windowed2_s"]
        )

        row["speedup_ek1_pallas_vs_seq"] = (
            row["seq_dense_ek1_s"] / row["par_ek1_pallas_s"]
        )
        # explicit divergence flags: a timed row either converged
        # (max_diff < 1e-2 vs the f64 oracle of the same discrete
        # problem) or says so — seq rows carry the flag too
        for kk in list(row):
            if kk.endswith("_max_diff"):
                md = row[kk]
                row[kk.replace("_max_diff", "_diverged")] = bool(
                    not (md == md) or md >= 1e-2
                )
        results["sweep"].append(row)
        print(json.dumps(row), flush=True)

    with open("benchmarks/time_parallel_sweep.json", "w") as fh:
        fh.write(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv, cached="--cached" in sys.argv)
