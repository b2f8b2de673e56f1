"""Diagnose time-parallel solver compile-time scaling.

Separates TRACE time (jax.jit(...).lower()) from XLA COMPILE time
(.compile()) for the square-root time-parallel solver at several N,
plain scan vs blocked scan, and records HLO module sizes. Motivation:
the round-3 sweep measured 243 s (N=4096) / 710 s (N=16384) end-to-end
compiles even with the blocked hybrid scan — this pins down which stage
scales and with what.

Usage:
    python benchmarks/compile_diag.py [--cpu] [N ...]
"""

import os as _os
import sys as _sys

# runnable as `python benchmarks/<script>.py` from anywhere: the repo
# root (odefilters package) goes on sys.path ahead of the script dir
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import sys
import time


def main(argv):
    cpu = "--cpu" in argv
    ns = [int(a) for a in argv if a.isdigit()] or [1024, 4096]
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import odefilters as odf
    from odefilters.parallel.associative import (
        _solve_parallel_jit,
        solve_fixed_parallel,
    )

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    rows = []
    for N in ns:
        ts = jnp.linspace(0.0, 20.0, N + 1, dtype=jnp.float32)
        for label, block in (("plain", 0), ("blocked", None)):
            # resolve block the way solve_fixed_parallel does
            from odefilters.parallel.blocked import auto_block

            blk = auto_block(N) if block is None else None
            lowered = None

            t0 = time.perf_counter()
            lowered = _solve_parallel_jit.lower(
                prob, odf.EK1(order=3), ts, N, 4, "jvp", None, True,
                None, blk,
            )
            trace_s = time.perf_counter() - t0
            hlo_chars = len(lowered.as_text())
            t0 = time.perf_counter()
            compiled = lowered.compile()
            compile_s = time.perf_counter() - t0
            row = {
                "N": N, "variant": label, "block": blk,
                "trace_s": round(trace_s, 2),
                "xla_compile_s": round(compile_s, 2),
                "hlo_chars": hlo_chars,
                "backend": str(jax.devices()[0]),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open("benchmarks/compile_diag.json", "w") as fh:
        fh.write(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
