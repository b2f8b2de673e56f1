"""Time-parallel vs sequential solver sweep over grid length N (on-chip).

Sweeps N in {2^8 .. 2^14} on FitzHugh-Nagumo, fixed uniform grid, and
compares wall-clock per solve for:

- the sequential dense XLA scan (`solve_fixed`, D x D square-root filter
  + smoother),
- the sequential EK0-Kronecker scan (`solve_fixed_kron`),
- the square-root time-parallel associative-scan solver
  (`solve_fixed_parallel`, EK1 Newton-type iterations=4; EK0 warm-start
  default + iterations=4).

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
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters, compile_s


def main(quick=False):
    import odefilters as odf
    from odefilters.kronsolve import solve_fixed_kron
    from odefilters.parallel.associative import solve_fixed_parallel

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    Ns = [256, 1024, 4096] if quick else [256, 1024, 4096, 16384]
    results = {"device": str(jax.devices()[0]), "sweep": []}

    for N in Ns:
        ts = jnp.linspace(0.0, 20.0, N + 1, dtype=jnp.float32)
        row = {"N": N}

        t, _ = _time(lambda: solve_fixed_kron(
            prob, odf.EK0(order=3), ts=ts).u)
        row["seq_kron_ek0_s"] = t

        t, _ = _time(lambda: odf.solve_fixed(prob, odf.EK1(order=3), ts=ts).u)
        row["seq_dense_ek1_s"] = t

        # blocked hybrid scans kick in automatically at N >= 2048
        # (parallel.blocked.auto_block): O(2N) combine work and one scan
        # body to compile instead of log2(N) unrolled rounds (the plain
        # scan at N=16384 compiled for ~820 s in round 2)
        t, c = _time(lambda: solve_fixed_parallel(
            prob, odf.EK0(order=3), ts=ts, iterations=4)[0])
        row["par_sqrt_ek0_s"] = t
        row["par_ek0_compile_s"] = c

        t, c = _time(lambda: solve_fixed_parallel(
            prob, odf.EK1(order=3), ts=ts, iterations=4)[0])
        row["par_sqrt_ek1_s"] = t
        row["par_ek1_compile_s"] = c

        row["speedup_ek1_par_vs_seq"] = row["seq_dense_ek1_s"] / row["par_sqrt_ek1_s"]
        row["speedup_ek0_par_vs_kron"] = row["seq_kron_ek0_s"] / row["par_sqrt_ek0_s"]
        results["sweep"].append(row)
        print(json.dumps(row))

    with open("benchmarks/time_parallel_sweep.json", "w") as fh:
        fh.write(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
