"""Benchmark: batched probabilistic ODE solves on TPU vs single-solve CPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config (BASELINE.md config 5): an 8192-member FitzHugh-Nagumo
ensemble, fixed-grid EK0(3) filter + RTS smoothing, on one TPU chip.
``vs_baseline`` is the throughput multiple over a single-trajectory solve
run on one CPU core in this same process (the stand-in for the reference's
single-core sequential solve; the reference publishes no numbers —
BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp


def _timeit(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import odefilters as odf
    from odefilters.parallel.sharding import solve_ensemble

    B = 8192
    N_STEPS = 500
    tspan = (0.0, 20.0)
    alg = odf.EK0(order=3)

    # --- TPU (default backend): batched ensemble ---
    prob = odf.models.fitzhugh_nagumo(tspan=tspan)
    dtype = jnp.float32
    prob = odf.remake(prob, u0=prob.u0.astype(dtype), p=prob.p.astype(dtype))
    ts = jnp.linspace(tspan[0], tspan[1], N_STEPS + 1, dtype=dtype)
    key = jax.random.PRNGKey(0)
    u0s = prob.u0 + 0.1 * jax.random.normal(key, (B, 2), dtype)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(dtype)

    from odefilters.kronsolve import solve_fixed_kron

    def run(u0s, ps):
        def one(u0, p):
            sol = solve_fixed_kron(odf.remake(prob, u0=u0, p=p), alg, ts=ts)
            return sol.u
        return jax.vmap(one)(u0s, ps)

    t_tpu = _timeit(jax.jit(run), u0s, ps)
    solves_per_sec = B / t_tpu

    # --- CPU single-core, single trajectory (baseline proxy) ---
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        prob_c = odf.remake(prob)
        ts_c = jnp.linspace(tspan[0], tspan[1], N_STEPS + 1, dtype=dtype)

        from odefilters.kronsolve import solve_fixed_kron as sfk

        def run_one(u0, p):
            sol = sfk(odf.remake(prob_c, u0=u0, p=p), alg, ts=ts_c)
            return sol.u

        t_cpu = _timeit(
            jax.jit(run_one), prob.u0, prob.p, warmup=1, iters=3
        )
    cpu_solves_per_sec = 1.0 / t_cpu

    vs_baseline = solves_per_sec / cpu_solves_per_sec
    print(
        json.dumps(
            {
                "metric": "batched FHN EK0(3)+smooth solves/sec @ 8192 ensemble, 500-step grid",
                "value": round(solves_per_sec, 2),
                "unit": "solves/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
