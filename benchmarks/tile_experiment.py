"""Measure flagship-kernel throughput vs per-scalar tile height (sublanes).

The fused ensemble kernels lay each per-member scalar out as one
(_SUB, _LANE) = (8, 128) vector tile and iterate ensemble blocks
sequentially through the Pallas grid.  The roofline
(benchmarks/roofline.json) shows the filter kernel at ~10% of VPU peak,
bound by the *serial dependency chain* of the filter recursion — each
(8, 128) op waits on the previous one's result.  Widening the tile to
(16/32/64, 128) makes Mosaic split every logical op into 2/4/8
independent hardware ops, interleaving that many ensemble blocks through
the same dependency chain (classic software pipelining, no code changes).

This script times solve_ensemble_ek0_pallas (filter) and the
filter+smoother pair at B=8192 FHN EK0(3), 500 steps, for several tile
heights, by rebinding the module constants before trace time.  Run on a
QUIET chip (CLAUDE.md: contention invalidates timing).

Writes benchmarks/tile_experiment.json.
"""

import os as _os
import sys as _sys

# runnable as `python benchmarks/<script>.py` from anywhere: the repo
# root (odefilters package) goes on sys.path ahead of the script dir
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import time

import jax
import jax.numpy as jnp


def _timeit(fn, *args, warmup=2, iters=20, repeats=3):
    for _ in range(warmup):
        float(jnp.sum(fn(*args)))  # force sync over the remote-TPU tunnel
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import odefilters as odf
    from odefilters.ops import pallas_kernels as pk

    B = 8192
    N_STEPS = 500
    tspan = (0.0, 20.0)
    dtype = jnp.float32

    prob = odf.models.fitzhugh_nagumo(tspan=tspan)
    u0 = prob.u0.astype(dtype)
    p = prob.p.astype(dtype)
    key = jax.random.PRNGKey(0)
    u0s = (u0 + 0.1 * jax.random.normal(key, (B, 2))).astype(dtype)
    ps = jnp.broadcast_to(p, (B, 4)).astype(dtype)

    # data-likelihood probe config: no big VMEM outputs, no DMA — the
    # timing isolates the serial-dependency-chain (ILP) effect of the
    # tile height from memory-capacity effects
    ts_data = jnp.linspace(2.0, 18.0, 9)
    ys = u0[None, :] + 0.0 * ts_data[:, None]

    results = {"device": str(jax.devices()[0].device_kind), "B": B,
               "grid_steps": N_STEPS, "configs": {}}
    orig = (pk._SUB, pk.BLOCK)
    try:
        for sub in (8, 16, 32, 64):
            pk._SUB, pk.BLOCK = sub, sub * pk._LANE
            label = f"sub{sub}_block{pk.BLOCK}"
            entry = {}
            try:
                @jax.jit
                def run_dl(u0s, ps):
                    dll, ll = pk.ensemble_data_loglik_pallas(
                        prob.f, u0s, ps, tspan, N_STEPS, ts_data, ys,
                        0.1, q=3,
                    )
                    return dll.sum() + ll.sum()

                t = _timeit(run_dl, u0s, ps)
                entry["datalik_s"] = t
                entry["datalik_solves_per_s"] = B / t
            except Exception as e:  # noqa: BLE001
                entry["datalik_error"] = f"{type(e).__name__}: {e}"[:400]
            try:
                @jax.jit
                def run_f(u0s, ps):
                    us, stds, ll = pk.solve_ensemble_ek0_pallas(
                        prob.f, u0s, ps, tspan, N_STEPS, q=3
                    )
                    return us[-1].sum() + stds[0].sum()

                t = _timeit(run_f, u0s, ps)
                entry["filter_s"] = t
                entry["filter_solves_per_s"] = B / t
            except Exception as e:  # noqa: BLE001 - record and move on
                entry["filter_error"] = f"{type(e).__name__}: {e}"[:400]
            try:
                @jax.jit
                def run_fs(u0s, ps):
                    us, stds = pk.solve_ensemble_ek0_pallas_smooth(
                        prob.f, u0s, ps, tspan, N_STEPS, q=3
                    )
                    return us[-1].sum() + stds[0].sum()

                t = _timeit(run_fs, u0s, ps)
                entry["smooth_s"] = t
                entry["smooth_solves_per_s"] = B / t
            except Exception as e:  # noqa: BLE001
                entry["smooth_error"] = f"{type(e).__name__}: {e}"[:400]
            results["configs"][label] = entry
            print(label, entry, flush=True)
    finally:
        pk._SUB, pk.BLOCK = orig

    with open("benchmarks/tile_experiment.json", "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
