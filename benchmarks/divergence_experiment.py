"""Adaptive-kernel SIMD-divergence measurement + sorted-binning attempt.

Round-3 VERDICT item 6: the per-lane adaptive EK0 kernel sits at ~2% of
VPU peak, attributed to "SIMD divergence + per-attempt preconditioning".
This experiment separates the divergence tax from everything else and
measures whether stiffness-sorted member binning (sort members by their
Hairer initial dt before blocking, un-sort on output) recovers any of it.

Design (8192-member FHN ensemble, q=3, f32, dispatch-amortized timing):

1. ``homogeneous``: all members identical (u0 broadcast) — zero
   divergence by construction; every lane accepts/rejects in lockstep.
   This is the kernel's divergence-free throughput ceiling.
2. ``perturbed``: the benchmark's 0.1-std u0 perturbation (the
   committed `ensemble_8192_pallas_adaptive` config).
3. ``spread``: a deliberately heterogeneous ensemble (u0 scale swept
   over a 4x range across members) — worst-case step-scale spread.
4. Each of (2) and (3) timed unsorted AND sorted by per-member Hairer
   initial dt (`odefilters.solve.initial_dt`), inverse-permuted after.

The divergence tax is t_config / t_homogeneous; sorted-binning recovery
is t_unsorted / t_sorted. Writes benchmarks/divergence_experiment.json.
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
import numpy as np


def _time(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))
    per_call = (time.perf_counter() - t0) / iters
    if per_call < 5e-3:
        iters = max(iters, min(200, int(round(0.1 / max(per_call, 1e-5)))))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out[0]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import odefilters as odf
    from odefilters.ops import pallas_kernels as pk
    from odefilters.solve import initial_dt

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    B = 8192
    key = jax.random.PRNGKey(0)
    kw = dict(n_save=20, q=3, abstol=1e-6, reltol=1e-4, max_iters=100_000)

    run = jax.jit(
        lambda u, p: pk.solve_ensemble_ek0_adaptive_pallas(
            prob.f, u, p, prob.tspan, **kw
        )
    )

    def run_sorted(u0s, ps):
        dt0 = jax.vmap(
            lambda u0, p: initial_dt(
                odf.remake(prob, u0=u0, p=p), 3, 1e-6, 1e-4
            )
        )(u0s, ps)
        order = jnp.argsort(dt0)
        inv = jnp.argsort(order)
        out = run(u0s[order], ps[order])
        return tuple(
            a[..., inv] if a.ndim > 1 else a[inv] for a in out
        )

    run_sorted_j = jax.jit(run_sorted)

    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    configs = {
        "homogeneous": jnp.broadcast_to(prob.u0, (B, 2)).astype(jnp.float32),
        "perturbed": (
            prob.u0 + 0.1 * jax.random.normal(key, (B, 2))
        ).astype(jnp.float32),
        "spread": (
            prob.u0 * (0.5 + 1.5 * jax.random.uniform(key, (B, 1)))
            + 0.1 * jax.random.normal(key, (B, 2))
        ).astype(jnp.float32),
    }

    results = {"device": str(jax.devices()[0]), "B": B, "configs": {}}
    for name, u0s in configs.items():
        t_un = _time(run, u0s, ps)
        out = run(u0s, ps)
        nacc, nrej, fail = out[3], out[4], out[5]
        entry = {
            "runtime_unsorted_s": t_un,
            "solves_per_sec_unsorted": B / t_un,
            "mean_accepted": float(nacc.mean()),
            "mean_rejected": float(nrej.mean()),
            "max_accepted": float(nacc.max()),
            "min_accepted": float(nacc.min()),
            "failed": int(fail.sum()),
        }
        if name != "homogeneous":
            t_s = _time(run_sorted_j, u0s, ps)
            entry["runtime_sorted_s"] = t_s
            entry["solves_per_sec_sorted"] = B / t_s
            entry["sorted_recovery_x"] = t_un / t_s

            # ---- ORACLE-sorted binning (round 5, VERDICT task 4): sort
            # lanes by their TRUE total attempt count from the unsorted
            # run — the information ceiling for ANY sorting/compaction
            # predictor (a two-phase relaunch scheme can at best match
            # it, minus relaunch cost). If even this loses, the thread
            # closes: no lane-permutation scheme can beat the unsorted
            # kernel on this workload. ----
            attempts = np.asarray(nacc + nrej)
            order = jnp.asarray(np.argsort(attempts))
            inv = jnp.argsort(order)

            def run_oracle(u0s_, ps_, order_, inv_):
                out_ = run(u0s_[order_], ps_[order_])
                return tuple(
                    a[..., inv_] if a.ndim > 1 else a[inv_] for a in out_
                )

            run_oracle_j = jax.jit(run_oracle)
            t_o = _time(run_oracle_j, u0s, ps, order, inv)
            entry["runtime_oracle_sorted_s"] = t_o
            entry["solves_per_sec_oracle_sorted"] = B / t_o
            entry["oracle_sorted_recovery_x"] = t_un / t_o
            # predicted ceiling if block cost were the per-block MAX of
            # total attempts (free-running lanes), sorted vs unsorted
            att_sorted = np.sort(attempts)
            blocks = att_sorted.reshape(8, -1)
            entry["oracle_block_max_sum_sorted"] = float(
                blocks.max(axis=1).sum()
            )
            rng = np.random.default_rng(0)
            sh = attempts.copy()
            rng.shuffle(sh)
            entry["block_max_sum_unsorted"] = float(
                sh.reshape(8, -1).max(axis=1).sum()
            )
        results["configs"][name] = entry
        print(name, json.dumps(entry), flush=True)

    homog = results["configs"]["homogeneous"]["runtime_unsorted_s"]
    for name, e in results["configs"].items():
        e["divergence_tax_x"] = e["runtime_unsorted_s"] / homog
    with open("benchmarks/divergence_experiment.json", "w") as fh:
        fh.write(json.dumps(results, indent=2))
    print(json.dumps({k: v["divergence_tax_x"]
                      for k, v in results["configs"].items()}))


if __name__ == "__main__":
    main()
