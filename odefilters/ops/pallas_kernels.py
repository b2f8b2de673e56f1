"""Fused Pallas TPU kernel: the whole EK0 ensemble solve in one kernel.

The XLA path runs the ensemble filter as a `lax.scan` whose per-step ops
(tiny matmuls, row updates) each round-trip HBM. This kernel instead keeps
the complete filter state of an ensemble block in VMEM for the *entire*
time loop and lays the ensemble across lanes:

- batch block = 1024 members, shaped (8, 128) = (sublanes, lanes);
- every per-member scalar (state entries, covariance entries, innovations)
  is one (8, 128) vector register;
- the (q+1)x(q+1) transition/noise constants are *Python floats* baked into
  fully unrolled loops — the whole step is straight-line VPU code with no
  matmul units, no gathers, no HBM traffic except the per-step result row.

Math: EK0 with dynamic diffusion in *preconditioned* coordinates (uniform
grid => the coordinate change is applied once at entry/exit, not per step
as in `/root/reference/src/perform_step.jl:36-38,72-75`), covariance in
plain (not square-root) form — exact same recursion as
`odefilters/ops/kron.py`, validated against it in the tests.

The user vector field is traced *inside* the kernel: any `f` written in
index-and-stack style (like every model in `odefilters.models`) vectorizes
transparently from shape (d,) to (d, 8, 128).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odefilters.priors import _ibm_small_np

BLOCK = 1024
_SUB, _LANE = 8, 128


def _ek0_kernel(
    m0_ref, p_ref, us_ref, std_ref, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, T: int, dt: float, t0: float,
    d: int, nq: int,
):
    hq = pinv1 * pinv1 * Qt[1, 1]

    # initial state (already preconditioned); zero covariance (exact init)
    m_init = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m_init[0][0])
    C_init = [[zero for _ in range(nq)] for _ in range(nq)]

    p_block = p_ref[:]  # (n_params, 8, 128)

    for j in range(d):
        us_ref[0, j] = pinv0 * m_init[0][j]
    std_ref[0] = zero

    def body(k, carry):
        m, C = carry
        # -- predict mean: mp = At m (At upper-triangular, unrolled) --
        mp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, l] * m[l][j] for l in range(i, nq)],
                )
                for j in range(d)
            ]
            for i in range(nq)
        ]
        # -- measure --
        t_new = t0 + (k + 1) * dt
        u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
        du = f(u_pred, p_block, t_new)
        z = [pinv1 * mp[1][j] - du[j] for j in range(d)]
        # -- dynamic diffusion: s2 = |z|^2 / (d hq) --
        zz = functools.reduce(lambda a, b: a + b, [zj * zj for zj in z])
        s2 = zz / (d * hq)
        # -- predict cov: Cp = At C At^T + s2 Qt --
        tmp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, a] * C[a][b] for a in range(i, nq)],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        Cp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [tmp[i][b] * At[l, b] for b in range(l, nq)],
                )
                + Qt[i, l] * s2
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        # -- update (R = 0): s = pinv1^2 Cp[1,1]; K = pinv1 Cp[:,1] / s --
        s = pinv1 * pinv1 * Cp[1][1]
        inv_s = 1.0 / s
        kg = [pinv1 * Cp[i][1] * inv_s for i in range(nq)]
        m_new = [
            [mp[i][j] - kg[i] * z[j] for j in range(d)] for i in range(nq)
        ]
        C_new = [
            [Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)]
            for i in range(nq)
        ]
        # -- save the projected solution row --
        for j in range(d):
            us_ref[k + 1, j] = pinv0 * m_new[0][j]
        std_ref[k + 1] = pinv0 * jnp.sqrt(jnp.maximum(C_new[0][0], 0.0))
        return m_new, C_new

    jax.lax.fori_loop(0, T, body, (m_init, C_init))


def ek0_fused_filter(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
):
    """Run the fused EK0 filter over an ensemble of B members.

    Returns ``(us, stds)`` with shapes (T+1, d, B) and (T+1, B):
    posterior (filter) means of the solution and their marginal stds.
    B must be a multiple of 1024.
    """
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    T = int(n_steps)

    At_np, _, QLt_np = _ibm_small_np(q)
    Qt_np = QLt_np @ QLt_np.T
    # preconditioner entries for this (static) dt
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)

    dtype = m0.dtype
    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)                      # (nb, nq, d, 8, 128)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)

    kernel = functools.partial(
        _ek0_kernel,
        f=f,
        At=At_np.astype(np.float32 if dtype == jnp.float32 else np.float64),
        Qt=Qt_np.astype(np.float32 if dtype == jnp.float32 else np.float64),
        pinv0=float(1.0 / p_np[0]),
        pinv1=float(1.0 / p_np[1]),
        T=T, dt=float(dt), t0=float(t0), d=d, nq=nq,
    )

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ps_b.shape[1], _SUB, _LANE), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, T + 1, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, T + 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )

    def kernel_entry(m0_blk, p_blk, us_blk, std_blk):
        kernel(
            m0_blk.at[0], p_blk.at[0], us_blk.at[0], std_blk.at[0]
        )

    us, stds = pl.pallas_call(
        kernel_entry,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, T + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T + 1, _SUB, _LANE), dtype),
        ],
    )(m0_p, ps_b)

    us = us.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    stds = stds.transpose(1, 0, 2, 3).reshape(T + 1, B)
    return us, stds


def solve_ensemble_ek0_pallas(
    prob_f: Callable,
    u0s: jax.Array,     # (B, d)
    ps: jax.Array,      # (B, n_params)
    tspan,
    n_steps: int,
    q: int = 3,
    p_template=None,
):
    """Convenience wrapper: Taylor-init the ensemble, run the fused kernel.

    ``prob_f(u, p, t)`` must be written in index-and-stack style so it
    vectorizes over trailing batch dims (all `odefilters.models` qualify).
    """
    from odefilters.taylor import taylor_coefficients

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d = u0s.shape

    def init_one(u0, p):
        return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps)            # (B, q+1, d)
    m0 = m0.transpose(1, 2, 0)                  # (q+1, d, B)
    return ek0_fused_filter(
        prob_f, m0, ps.T, float(t0), float(dt), n_steps, q
    )
