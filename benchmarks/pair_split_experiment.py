"""Measure the forward/backward split of the fused EK0 filter+smoother pair.

The round-4 roofline flags the pair as issue/latency-bound at ~15% of VPU
peak while the filter-only kernel runs at 62%. This experiment times, at
the bench.py headline config (8192-member FHN, T=500, q=3, f32):

  - the pair's FORWARD kernel alone (`_ek0_pair_fwd_kernel` via a
    replicated pallas_call),
  - the full pair (`ek0_fused_solve`),
  - the filter-only fast kernel (`ek0_fused_filter`) for reference,

with the dispatch-amortized timing from run_all (two-round pilot deepening
the queue). Quiet host required (CLAUDE.md timing rules).
"""
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, warmup=2, iters=10):
    for _ in range(warmup):
        float(jnp.sum(fn(*args)))
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        per_call = (time.perf_counter() - t0) / iters
        if per_call >= 20e-3:
            return per_call
        iters = max(iters, min(400, int(round(0.3 / max(per_call, 1e-5)))))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import odefilters as odf
    from odefilters.ops import pallas_kernels as pk
    from odefilters.taylor import taylor_coefficients

    B, T, q = 8192, 500, 3
    tspan = (0.0, 20.0)
    dtype = jnp.float32
    prob = odf.models.fitzhugh_nagumo(tspan=tspan)
    u0 = prob.u0.astype(dtype)
    p = prob.p.astype(dtype)
    key = jax.random.PRNGKey(0)
    u0s = (u0 + 0.1 * jax.random.normal(key, (B, 2))).astype(dtype)
    ps = jnp.broadcast_to(p, (B, 4)).astype(dtype)
    t0f, t1f = tspan
    dt = (t1f - t0f) / T

    def init_one(u0_, p_):
        return jnp.stack(taylor_coefficients(prob.f, u0_, p_, t0f, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)

    # ---- full pair ----
    @jax.jit
    def pair(m0, ps_t):
        us, stds = pk.ek0_fused_solve(prob.f, m0, ps_t, t0f, dt, T, q)
        return us[-1].sum() + stds[0].sum()

    t_pair = _timeit(pair, m0, ps.T)

    # ---- the pair's forward alone: copy the _ek0_pair_fwd_kernel
    # wiring from ek0_fused_solve, reduce a stream slice so XLA keeps
    # only the forward pallas_call ----
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nq = q + 1
    d = 2
    nb = B // pk.BLOCK
    At_np, QLt_np = pk._prior_consts_np(None, q, float(dt))
    Qt_np = QLt_np @ QLt_np.T
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, pk._SUB, pk._LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.T.reshape(4, nb, pk._SUB, pk._LANE).transpose(1, 0, 2, 3)
    _, V = pk._pair_layout(nq, d, 1)
    U_f = next(u for u in (4, 2, 1) if nb % u == 0)
    ng_f = nb // U_f
    fkernel = functools.partial(
        pk._ek0_pair_fwd_kernel, f=prob.f, At=At_np.astype(np.float32),
        Qt=Qt_np.astype(np.float32), pinv0=float(1.0 / p_np[0]),
        pinv1=float(1.0 / p_np[1]), T=T, dt=float(dt), t0=float(t0f),
        d=d, nq=nq, U=U_f,
    )
    scratch = [
        pltpu.VMEM((U_f, 2, V, pk._SUB, pk._LANE), dtype),
        pltpu.SemaphoreType.DMA((U_f, 2)),
    ]

    def fentry(m0_blk, p_blk, st_hbm, row, sem):
        base = pl.program_id(0) * U_f
        fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                [st_hbm.at[base + u] for u in range(U_f)], row, sem)

    @jax.jit
    def fwd_only(m0_p, ps_b):
        st = pl.pallas_call(
            fentry,
            grid=(ng_f,),
            in_specs=[
                pl.BlockSpec((1, U_f, nq, d, pk._SUB, pk._LANE),
                             lambda b: (b, 0, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, U_f, 4, pk._SUB, pk._LANE),
                             lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct(
                (nb, T + 1, V, pk._SUB, pk._LANE), dtype),
            scratch_shapes=scratch,
        )(
            m0_p.reshape(ng_f, U_f, nq, d, pk._SUB, pk._LANE),
            ps_b.reshape(ng_f, U_f, 4, pk._SUB, pk._LANE),
        )
        return st[:, T, 0].sum()

    t_fwd = _timeit(fwd_only, m0_p, ps_b)

    # ---- filter-only fast kernel (reference point) ----
    @jax.jit
    def filt(m0, ps_t):
        us, stds, lls = pk.ek0_fused_filter(prob.f, m0, ps_t, t0f, dt, T, q)
        return us[-1].sum() + lls.sum()

    t_filt = _timeit(filt, m0, ps.T)

    out = {
        "config": "FHN B=8192 T=500 q=3 f32",
        "pair_s": t_pair,
        "pair_solves_per_s": B / t_pair,
        "fwd_stream_s": t_fwd,
        "bwd_inferred_s": t_pair - t_fwd,
        "filter_only_s": t_filt,
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(out, indent=2))
    Path(__file__).with_name("pair_split.json").write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
