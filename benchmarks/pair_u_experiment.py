"""A/B the chain-interleave factor U of the fused pair's two kernels.

Round-5 record (committed in pair_u.json): U=4/U=4 is the shipped
config; this script times each pass alone at U in {2, 4, 8} on the
headline 8192-member FHN T=500 config, interleaved in one process on a
quiet host (CLAUDE.md timing rules). The backward reads a pre-built
stream so only the kernel under test runs in the timed region.
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
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import odefilters as odf
    from odefilters.ops import pallas_kernels as pk
    from odefilters.taylor import taylor_coefficients

    B, T, q = 8192, 500, 3
    tspan = (0.0, 20.0)
    dtype = jnp.float32
    prob = odf.models.fitzhugh_nagumo(tspan=tspan)
    key = jax.random.PRNGKey(0)
    u0s = (prob.u0.astype(dtype)
           + 0.1 * jax.random.normal(key, (B, 2))).astype(dtype)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(dtype)
    t0f, t1f = tspan
    dt = (t1f - t0f) / T

    def init_one(u0_, p_):
        return jnp.stack(taylor_coefficients(prob.f, u0_, p_, t0f, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)

    nq, d, bx = q + 1, 2, 1
    nb = B // pk.BLOCK
    At_np, QLt_np = pk._prior_consts_np(None, q, float(dt))
    Qt_np = QLt_np @ QLt_np.T
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, pk._SUB, pk._LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.T.reshape(4, nb, pk._SUB, pk._LANE).transpose(1, 0, 2, 3)
    _, V = pk._pair_layout(nq, d, bx)
    consts = dict(At=At_np.astype(np.float32), Qt=Qt_np.astype(np.float32),
                  pinv0=float(1.0 / p_np[0]), T=T, d=d, nq=nq)

    def fwd_fn(U_f):
        ng = nb // U_f
        fkernel = functools.partial(
            pk._ek0_pair_fwd_kernel, f=prob.f,
            pinv1=float(1.0 / p_np[1]), dt=float(dt), t0=float(t0f),
            U=U_f, **consts,
        )

        def fentry(m0_blk, p_blk, st_hbm, row, sem):
            base = pl.program_id(0) * U_f
            fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                    [st_hbm.at[base + u] for u in range(U_f)], row, sem)

        @jax.jit
        def run(m0_p, ps_b):
            st = pl.pallas_call(
                fentry,
                grid=(ng,),
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
                scratch_shapes=[
                    pltpu.VMEM((U_f, 2, V, pk._SUB, pk._LANE), dtype),
                    pltpu.SemaphoreType.DMA((U_f, 2)),
                ],
            )(
                m0_p.reshape(ng, U_f, nq, d, pk._SUB, pk._LANE),
                ps_b.reshape(ng, U_f, 4, pk._SUB, pk._LANE),
            )
            return st

        return run

    # materialize one stream for the backward timings
    st = jax.jit(lambda a, b: fwd_fn(4)(a, b))(m0_p, ps_b)
    st = jax.block_until_ready(st)

    def bwd_fn(U_b):
        ng = nb // U_b
        skernel = functools.partial(
            pk._ek0_pair_bwd_kernel, QLt=QLt_np.astype(np.float32),
            bx=bx, U=U_b, **consts,
        )

        def sentry(st_hbm, out_hbm, row, sem, orow, osem):
            base = pl.program_id(0) * U_b
            skernel([st_hbm.at[base + u] for u in range(U_b)],
                    [out_hbm.at[base + u] for u in range(U_b)],
                    row, sem, orow, osem)

        @jax.jit
        def run(st):
            out = pl.pallas_call(
                sentry,
                grid=(ng,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                out_shape=jax.ShapeDtypeStruct(
                    (nb, T + 1, d + 1, pk._SUB, pk._LANE), dtype),
                scratch_shapes=[
                    pltpu.VMEM((U_b, 2, V, pk._SUB, pk._LANE), dtype),
                    pltpu.SemaphoreType.DMA((U_b, 2)),
                    pltpu.VMEM((U_b, 2, d + 1, pk._SUB, pk._LANE), dtype),
                    pltpu.SemaphoreType.DMA((U_b, 2)),
                ],
            )(st)
            return out[:, 0].sum()

        return run

    out = {"config": "FHN B=8192 T=500 q=3 f32", "fwd": {}, "bwd": {}}
    fns = {}
    for U in (2, 4, 8):
        f = fwd_fn(U)
        fns[("fwd", U)] = jax.jit(lambda a, b, _f=f: _f(a, b)[:, T, 0].sum())
        fns[("bwd", U)] = bwd_fn(U)
    # interleaved A/B, min-of-N inside _timeit
    for (kind, U), fn in fns.items():
        args = (m0_p, ps_b) if kind == "fwd" else (st,)
        t = _timeit(fn, *args)
        out[kind][str(U)] = t
        print(kind, U, f"{t * 1e3:.3f} ms", flush=True)
    print(json.dumps(out))
    Path(__file__).with_name("pair_u.json").write_text(
        json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
