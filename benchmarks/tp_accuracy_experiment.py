"""Attribute the N=16384 time-parallel `diverged` flag to its true cause.

The round-4 sweep flags every N=16384 row because max|par - seq| = 0.035
on chip — but `seq` there is the CHIP f32 sequential solve, which carries
its own 16k-step f32 accumulation. This experiment separates the three
candidate error sources by comparing everything against the CPU f64
sequential solve of the SAME discrete problem (the exactness oracle):

  err_seq32   = max|chip f32 seq  - f64 seq|   (sequential f32 accumulation)
  err_par32   = max|chip f32 par  - f64 seq|   (parallel total error)
  err_par64   = max|cpu  f64 par  - f64 seq|   (iteration/algebra error,
                                                no f32 anywhere)
  diff_ps     = max|chip par - chip seq|       (the sweep's current metric)

plus a 4-sweep par row to test iteration-convergence sensitivity.

If err_par32 ~ err_seq32, the 0.035 is mutual drift of two equally-good
f32 answers and the sweep's metric — not the parallel solver — is what
needs fixing. If err_par32 >> err_seq32, the parallel combine genuinely
accumulates worse and needs compensated arithmetic.

Writes benchmarks/tp_accuracy.json.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np


def main(N=16384, quick=False):
    _os.makedirs("benchmarks/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "benchmarks/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import odefilters as odf
    from odefilters.parallel.associative import solve_fixed_parallel
    from odefilters.parallel.blocked import auto_block

    if quick:
        N = 4096
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    alg = odf.EK1(order=3)
    cpu = jax.devices("cpu")[0]

    # ---- f64 sequential oracle (CPU) ----
    with jax.default_device(cpu), jax.enable_x64(True):
        ts64 = jnp.linspace(0.0, 20.0, N + 1, dtype=jnp.float64)
        prob64 = odf.remake(
            prob, u0=prob.u0.astype(jnp.float64), p=prob.p.astype(jnp.float64)
        )
        ref = np.asarray(odf.solve_fixed(prob64, alg, ts=ts64).u)

        # ---- f64 PARALLEL (CPU, blocked xla scan): algebra/iteration
        # error with no f32 anywhere ----
        par64 = np.asarray(solve_fixed_parallel(
            prob64, alg, ts=ts64, iterations=2, block=auto_block(N) or 64
        )[0])

    # ---- chip f32 rows ----
    ts = jnp.linspace(0.0, 20.0, N + 1, dtype=jnp.float32)
    seq32 = np.asarray(odf.solve_fixed(prob, alg, ts=ts).u, np.float64)
    par32 = np.asarray(solve_fixed_parallel(
        prob, alg, ts=ts, iterations=2, block="pallas")[0], np.float64)
    par32_it4 = np.asarray(solve_fixed_parallel(
        prob, alg, ts=ts, iterations=4, block="pallas")[0], np.float64)

    def mx(a, b):
        return float(np.max(np.abs(a - b)))

    out = {
        "N": N,
        "err_seq32_vs_ref": mx(seq32, ref),
        "err_par32_vs_ref": mx(par32, ref),
        "err_par32_it4_vs_ref": mx(par32_it4, ref),
        "err_par64_vs_ref": mx(par64, ref),
        "diff_par32_vs_seq32": mx(par32, seq32),
        "diff_it4_vs_it2": mx(par32_it4, par32),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=2))
    with open("benchmarks/tp_accuracy.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main(quick="--quick" in _sys.argv)
