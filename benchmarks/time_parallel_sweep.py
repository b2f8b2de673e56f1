"""Time-parallel vs sequential solver sweep over grid length N (on-chip).

Sweeps N on FitzHugh-Nagumo over t in [0, 20], fixed uniform grid, f32,
and compares wall-clock AND solution accuracy for:

- the sequential dense XLA scan (`solve_fixed`, D x D square-root filter
  + smoother) — the accuracy reference for `max_diff`,
- the sequential EK0-Kronecker scan (`solve_fixed_kron`),
- the iterated square-root time-parallel solver (`solve_fixed_parallel`)
  with the fused Pallas scan kernels (`block="pallas"`) and with the XLA
  blocked hybrid scan (`block=auto`), both warm-started.

Every par row records `max_diff` against the sequential solve of the
same algorithm: round-3 found the round-2 sweep had benchmarked
UNCONVERGED solutions (cold-start iterations=4 leaves O(1) error at
every N; the EK0 Picard iteration outright diverges with more sweeps on
this span, so EK0 rows carry their honest error). Warm-started EK1
converges in 2 sweeps (~5e-3 in f32).

Writes benchmarks/time_parallel_sweep.json. Usage:
    python benchmarks/time_parallel_sweep.py [--quick]
"""

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


def main(quick=False):
    import odefilters as odf
    from odefilters.kronsolve import solve_fixed_kron
    from odefilters.parallel.associative import solve_fixed_parallel

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    Ns = [1024, 4096] if quick else [1024, 4096, 16384]
    results = {"device": str(jax.devices()[0]), "sweep": []}

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

        # fused Pallas scan kernels (warm-started Newton, 2 sweeps)
        par_pl = lambda: solve_fixed_parallel(
            prob, odf.EK1(order=3), ts=ts, iterations=2, block="pallas")[0]
        t, c = _time(par_pl, iters=5)
        row["par_ek1_pallas_s"] = t
        row["par_ek1_pallas_compile_s"] = c
        row["par_ek1_pallas_max_diff"] = float(jnp.abs(u_seq1 - par_pl()).max())

        # XLA blocked hybrid scan (same math, no kernels)
        from odefilters.parallel.blocked import auto_block

        par_xla = lambda: solve_fixed_parallel(
            prob, odf.EK1(order=3), ts=ts, iterations=2, warm_start=8,
            block=auto_block(N) or 64)[0]
        t, c = _time(par_xla, iters=3)
        row["par_ek1_xla_s"] = t
        row["par_ek1_xla_compile_s"] = c
        row["par_ek1_xla_max_diff"] = float(jnp.abs(u_seq1 - par_xla()).max())

        # EK0 par (Picard): honest accuracy — diverges on long spans
        par_e0 = lambda: solve_fixed_parallel(
            prob, odf.EK0(order=3), ts=ts, iterations=4, block="pallas")[0]
        t, c = _time(par_e0, iters=5)
        row["par_ek0_pallas_s"] = t
        row["par_ek0_pallas_compile_s"] = c
        row["par_ek0_pallas_max_diff"] = float(jnp.abs(u_seq0 - par_e0()).max())

        row["speedup_ek1_pallas_vs_seq"] = (
            row["seq_dense_ek1_s"] / row["par_ek1_pallas_s"]
        )
        results["sweep"].append(row)
        print(json.dumps(row), flush=True)

    with open("benchmarks/time_parallel_sweep.json", "w") as fh:
        fh.write(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
