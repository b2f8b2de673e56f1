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
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odefilters.priors import _ibm_small_np

BLOCK = 1024
_SUB, _LANE = 8, 128


def _ens_spec(axis: int, name: str):
    """PartitionSpec sharding dimension ``axis`` over mesh axis ``name``."""
    from jax.sharding import PartitionSpec as P

    return P(*([None] * axis + [name]))


def _shard_over_ens(mesh, body, arrays, in_axes, out_axes):
    """Run ``body(*arrays)`` under ``jax.shard_map`` over a 1-D device mesh.

    The fused ensemble kernels are embarrassingly parallel over ensemble
    blocks, so multi-chip execution shards the batch axis and runs the
    unmodified single-device kernel per shard — **zero collectives in the
    hot loop** (SURVEY.md §2 "Data-parallel sharding"); XLA's only inserted
    communication is at already-sharded outputs. ``in_axes``/``out_axes``
    give the batch-dimension index of each input/output array (``None`` =
    fully replicated, e.g. shared observations).

    Each shard's batch slice must itself be a multiple of ``BLOCK`` — the
    per-shard kernel re-validates, so an uneven split fails loudly.

    Interpret-mode caveat (tests/dryrun only, not hardware): the
    kernels that STREAM state rows to HBM via DMA (the filter+smoother
    pairs, samplers and the custom-VJP forward passes) deadlock when the
    interpret-mode DMA emulation runs on several virtual devices
    concurrently. Multi-shard validation for those runs the shards
    SEQUENTIALLY through this same entry point (1-device mesh per shard,
    concatenate, compare bit-exact to the unsharded batch —
    `test_parallel.py::test_pallas_streaming_kernels_8shard_sequential_
    bitexact`); that is exactly the decomposition shard_map performs,
    minus the concurrency, which hardware provides via per-chip DMA
    engines. Non-streaming kernels (filter / adaptive / datalik forward)
    validate bit-exact on the full 8-virtual-device mesh directly.
    """
    if len(mesh.axis_names) != 1:
        raise ValueError(
            "fused-kernel sharding expects a 1-D ensemble mesh, got axes "
            f"{mesh.axis_names}; reshape your mesh (ens only) or use the "
            "XLA path (odefilters.parallel.sharding) for 2-D meshes"
        )
    from jax.sharding import PartitionSpec as P

    ax = mesh.axis_names[0]
    in_specs = tuple(
        _ens_spec(a, ax) if a is not None else P() for a in in_axes
    )
    out_specs = tuple(_ens_spec(a, ax) for a in out_axes)
    # check_vma=False: pallas_call outputs don't carry varying-mesh-axes
    # metadata, so the vma checker rejects them; correctness of the
    # sharded forward AND backward (incl. the psum of replicated inputs'
    # cotangents) is covered by tests/test_parallel.py against the
    # unsharded kernels.
    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )(*arrays)


def _no_x64(fn):
    """Trace the kernel wrapper with 32-bit default types.

    The global x64 flag makes every Python int/float constant trace as a
    64-bit value, which Mosaic cannot lower; the kernels are 32/64-bit
    clean by dtype of their array inputs.
    """
    import functools as _ft

    @_ft.wraps(fn)
    def wrapped(*args, **kwargs):
        import numpy as _np

        # 64-bit inputs (interpret-mode validation) must keep x64 tracing;
        # the scan is pytree-aware (custom-VJP rules take tuple residuals)
        # only JAX arrays dictate the trace dtype: static numpy
        # constants (observation matrices, noise factors) are cast to
        # the working dtype inside the kernels and must not force x64
        needs64 = any(
            isinstance(a, jax.Array)
            and _np.dtype(a.dtype).itemsize == 8
            for a in jax.tree.leaves((args, kwargs))
            if not isinstance(a, (int, float, bool))
        )
        if needs64:
            return fn(*args, **kwargs)
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapped


def _static_local_update(static_diff, calib, zz, z, inv_s, d):
    """In-kernel running update for the static diffusion models
    (`diffusions.jl:11-36,46-68,115-153` — exact `odefilters.diffusions`
    semantics on the per-step statistic ``z^T S^-1 z`` with the scalar /
    per-dim innovation variance already in hand as ``inv_s``).

    ``calib = (sig, k)``: the running estimate (lane vector, or list of d
    lane vectors for ``fixedMV``) and the committed-step count. ``inv_s``:
    scalar ``1/s`` (EK0: S = s I_d) or a list of d per-dim ``1/s_j``
    (DiagonalEK1). Returns the updated ``(sig, k+1)``."""
    sig, k = calib
    kf = k  # float lane vector counting previous steps (success_iter)

    def _fixed_run(prev, local):
        kmax = jnp.maximum(kf, 1.0)
        cand = prev + (local - prev) / kmax
        return jnp.where(kf == 0.0, local, cand)

    if static_diff == "fixedMV":
        if isinstance(inv_s, list):
            local = [z[j] * z[j] * inv_s[j] for j in range(d)]
        else:
            local = [z[j] * z[j] * inv_s for j in range(d)]
        sig_new = [_fixed_run(sig[j], local[j]) for j in range(d)]
    elif static_diff == "fixed":
        if isinstance(inv_s, list):
            local = _sreduce(
                [z[j] * z[j] * inv_s[j] for j in range(d)]
            ) / d
        else:
            local = zz * inv_s / d
        sig_new = _fixed_run(sig, local)
    elif static_diff == "fixedMAP":
        # InverseGamma(1/2, 1/2) MAP updated online
        # (`diffusions.jl:46-68`; odefilters.diffusions.map_fixed_...)
        if isinstance(inv_s, list):
            local = _sreduce(
                [z[j] * z[j] * inv_s[j] for j in range(d)]
            ) / d
        else:
            local = zz * inv_s / d
        alpha, beta = 0.5, 0.5
        N = kf + 1.0
        first = (beta + 0.5 * local) / (alpha + N * d / 2 + 1)
        res_prev = (sig * (alpha + (N - 1.0) * d / 2 + 1) - beta) * 2.0
        later = (beta + 0.5 * (res_prev + local)) / (alpha + N * d / 2 + 1)
        sig_new = jnp.where(kf == 0.0, first, later)
    else:
        raise ValueError(f"unknown static diffusion {static_diff!r}")
    return sig_new, kf + 1.0


def _ek0_step_lists(
    m, C, p_block, t_new, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, d: int, nq: int,
    so: bool = False, pinv_b: float = 0.0, stop_calib: bool = False,
    static_diff=None, calib=None, collapsed: bool = False,
    want_var: bool = False, want_outputs: bool = True,
):
    """One EK0(dynamic) step on list-of-lanes state; pure function of
    ``(m, C, p)`` so it is both the fused-kernel body and the target of the
    in-kernel ``jax.vjp`` in the backward (gradient) kernel.

    Returns ``(m_new, C_new, ll_inc, us_row, std_val)`` — plus the
    updated ``calib`` carry when ``static_diff`` is set (the filter then
    runs with the UNSCALED prior sigma^2 = 1, per-step MLE statistics
    accumulate in ``calib``, and the caller rescales factors at exit —
    `integrator_utils.jl:4-18` semantics).

    ``want_outputs=False`` (the filter+smoother pair's forward, whose
    solution outputs fall out of the backward pass): skips the ll/us/std
    work entirely and returns ``(m_new, C_new, s2[, calib_new])`` — ``s2``
    is the step's diffusion (the Python float 1.0 under a static model).
    """
    b = 2 if so else 1               # measured derivative block
    pb = pinv_b if so else pinv1     # its preconditioner entry
    hq = pb * pb * Qt[b, b]
    # -- predict mean: mp = At m (At upper-triangular, unrolled) --
    mp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [At[i, l] * m[l][j] for l in range(nq) if At[i, l] != 0.0],
            )
            for j in range(d)
        ]
        for i in range(nq)
    ]
    # -- measure --
    u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
    if so:  # z = E2 x - f(du, u): the 2nd-order measurement (step.py)
        du_pred = jnp.stack([pinv1 * mp[1][j] for j in range(d)])
        du = f(du_pred, u_pred, p_block, t_new)
    else:
        du = f(u_pred, p_block, t_new)
    z = [pb * mp[b][j] - du[j] for j in range(d)]
    # -- dynamic diffusion: s2 = |z|^2 / (d hq) --
    zz = functools.reduce(lambda a, b: a + b, [zj * zj for zj in z])
    if static_diff is not None:
        s2 = 1.0  # static models filter with the unscaled prior
    else:
        s2 = zz / (d * hq)
    if stop_calib and static_diff is None:
        # calibration treated as part of the (frozen) model in the
        # adjoint: the innovations z sit at the solver-accuracy floor, so
        # reverse-mode tangents through 1/s2 amplify f32 forward noise
        # without bound in the horizon (measured: full data-ll gradient
        # 6e3 x wrong at 500 steps, stop-calib 8e-5 — the same estimator
        # choice as the static/Fenrir sigma^2 and the step controller,
        # benchmarks/grad_horizon_experiment.py)
        s2 = jax.lax.stop_gradient(s2)
    if collapsed:
        # Op-mix fast path (roofline lever, round-4): the COMMITTED EK0
        # covariance has (a) an exactly-zero measured row/column — the
        # R = 0 update collapses block b structurally (C_new[i][b] =
        # Cp[i][b] - Cp[i][b] (Cp[b][b]/Cp[b][b]) = 0 in exact
        # arithmetic; the caller's carry keeps roundoff-sized junk there
        # that this path treats as the exact zero it represents) — and
        # (b) symmetry. Skipping all terms through row/col b and
        # computing only the upper triangle (mirrors aliased) cuts the
        # covariance FLOPs per step ~2x on an issue-bound kernel. The
        # caller must guarantee every committed/initial C it feeds back
        # has the collapsed row/col (exact zero init; the filter commit
        # and the R-noisy data update both preserve it).
        act = [a for a in range(nq) if a != b]
        tmp_c = {
            (i, c): _sreduce([
                _smul(At[i, a], C[a][c])
                for a in act if At[i, a] != 0.0
            ])
            for i in range(nq) for c in act
        }
        Cp = [[None] * nq for _ in range(nq)]
        for i in range(nq):
            for l in range(i, nq):
                terms = [
                    _smul(tmp_c[(i, c)], At[l, c])
                    for c in act if At[l, c] != 0.0
                ] + ([Qt[i, l] * s2] if Qt[i, l] != 0.0 else [])
                Cp[i][l] = _sreduce(terms) if terms else zz * 0.0
                Cp[l][i] = Cp[i][l]          # aliased mirror (no compute)
        s = pb * pb * Cp[b][b]
        inv_s = 1.0 / s
        kg = [pb * Cp[i][b] * inv_s for i in range(nq)]
        m_new = [
            [mp[i][j] - kg[i] * z[j] for j in range(d)] for i in range(nq)
        ]
        zero_c = jnp.zeros_like(s)
        C_new = [[zero_c] * nq for _ in range(nq)]
        for i in act:
            for l in act:
                if l < i:
                    continue
                C_new[i][l] = Cp[i][l] - kg[i] * kg[l] * s
                C_new[l][i] = C_new[i][l]    # aliased mirror
    else:
        # -- predict cov: Cp = At C At^T + s2 Qt --
        tmp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, a] * C[a][b] for a in range(nq)
                     if At[i, a] != 0.0],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        Cp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [tmp[i][b] * At[l, b] for b in range(nq)
                     if At[l, b] != 0.0],
                )
                + Qt[i, l] * s2
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        # -- update (R = 0): s = pb^2 Cp[b,b]; K = pb Cp[:,b] / s --
        s = pb * pb * Cp[b][b]
        inv_s = 1.0 / s
        kg = [pb * Cp[i][b] * inv_s for i in range(nq)]
        m_new = [
            [mp[i][j] - kg[i] * z[j] for j in range(d)] for i in range(nq)
        ]
        C_new = [
            [Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)]
            for i in range(nq)
        ]
    if not want_outputs:
        if static_diff is not None:
            calib_new = _static_local_update(
                static_diff, calib, zz, z, inv_s, d
            )
            return m_new, C_new, s2, calib_new
        return m_new, C_new, s2
    # -- per-member data log-likelihood: log N(z; 0, s I_d)
    #    (perform_step.jl:66) --
    ll_inc = -0.5 * (
        zz * inv_s + d * (jnp.log(jnp.maximum(s, 1e-30)) + _LOG_2PI)
    )
    us_row = [pinv0 * m_new[0][j] for j in range(d)]
    if want_var:
        # issue-bound fast path: emit the raw variance; the caller's XLA
        # epilogue applies pinv0 * sqrt once over the whole (T+1, B)
        # output instead of one VPU sqrt per step inside the kernel
        std_val = C_new[0][0]
    else:
        # 1e-30 floor (not 0): keeps the VJP of sqrt finite when only the
        # likelihood is differentiated (0-cotangent x inf would poison dC)
        std_val = pinv0 * jnp.sqrt(jnp.maximum(C_new[0][0], 1e-30))
    if static_diff is not None:
        calib_new = _static_local_update(static_diff, calib, zz, z, inv_s, d)
        return m_new, C_new, ll_inc, us_row, std_val, calib_new
    return m_new, C_new, ll_inc, us_row, std_val


def _step_time(k, t0: float, dt: float, dtype):
    """t_{k+1} as a traced scalar matching the lane dtype."""
    return jnp.asarray(t0, dtype) + jnp.asarray(dt, dtype) * (
        k.astype(dtype) + jnp.asarray(1.0, dtype)
    )


def _ek0_kernel(
    m0_ref, p_ref, us_ref, std_ref, ll_ref, sig_ref=None, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, T: int, dt: float, t0: float,
    d: int, nq: int, so: bool = False, pinv_b: float = 0.0,
    static_diff=None, U: int = 1,
):
    """Fixed-grid fused EK0 filter over ``U`` INTERLEAVED independent
    1024-member chains per program (refs carry a leading U axis when
    U > 1). The filter recursion is serial per chain; interleaving U
    chains in one loop body fills the VPU's latency slots between
    dependent ops — measured on chip (8192 FHN, T=500, dispatch
    amortized): U=4 is ~1.2x over U=1 on top of the collapsed-row
    op-mix cut (docs/kernels.md "Roofline")."""
    # refs always carry a leading U axis (size 1 when U == 1): the
    # blocked wrappers' BlockSpecs are (1, U, ...) and `.at[0]` strips
    # only the grid-block dim
    def at(ref, u, *idx):
        return ref[(u,) + idx]

    def put(ref, u, *idx_and_val):
        *idx, val = idx_and_val
        ref[(u,) + tuple(idx)] = val

    ms, Cs, lls, calibs, pbs = [], [], [], [], []
    zero = None
    for u in range(U):
        m_init = [[at(m0_ref, u, i, j) for j in range(d)] for i in range(nq)]
        zero = jnp.zeros_like(m_init[0][0])
        C_init = [[zero for _ in range(nq)] for _ in range(nq)]
        for j in range(d):
            put(us_ref, u, jnp.int32(0), j, pinv0 * m_init[0][j])
        put(std_ref, u, jnp.int32(0), zero)
        if static_diff == "fixedMV":
            calib0 = ([zero for _ in range(d)], zero)
        else:
            calib0 = (zero, zero)
        ms.append(m_init)
        Cs.append(C_init)
        lls.append(zero)
        calibs.append(calib0)
        pbs.append(p_ref[u])

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, static_diff=static_diff,
        collapsed=True, want_var=True,
    )

    def body(k, carry):
        ms, Cs, lls, calibs = carry
        k1 = k + jnp.ones((), k.dtype)  # match the loop-index dtype
        t_new = _step_time(k, t0, dt, zero.dtype)
        ms2, Cs2, lls2, calibs2 = [], [], [], []
        for u in range(U):
            if static_diff is not None:
                m_new, C_new, ll_inc, us_row, std_val, cal = step(
                    ms[u], Cs[u], pbs[u], t_new, calib=calibs[u]
                )
            else:
                m_new, C_new, ll_inc, us_row, std_val = step(
                    ms[u], Cs[u], pbs[u], t_new
                )
                cal = calibs[u]
            for j in range(d):
                put(us_ref, u, k1, j, us_row[j])
            put(std_ref, u, k1, std_val)
            ms2.append(m_new)
            Cs2.append(C_new)
            lls2.append(lls[u] + ll_inc)
            calibs2.append(cal)
        return ms2, Cs2, lls2, calibs2

    _, _, lls, calibs = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (ms, Cs, lls, calibs)
    )
    for u in range(U):
        ll_ref[u] = lls[u]
        if static_diff is not None:
            sig = calibs[u][0]
            for j in range(d):
                put(sig_ref, u, j,
                    sig[j] if static_diff == "fixedMV" else sig)


_LOG_2PI = float(np.log(2.0 * np.pi))

def _prior_consts_np(prior, q: int, dt: float):
    """(At, QLt) float64 numpy transition constants for a static dt."""
    if prior is None:
        At_np, _, QLt_np = _ibm_small_np(q)
        return At_np, QLt_np
    from odefilters.priors import transition_precond_small_np

    return transition_precond_small_np(prior, q, dt)


def _auto_jac(f: Callable) -> Callable:
    """In-kernel Jacobian from d forward-mode JVP columns.

    One-hot tangents are built with jnp.stack — a .at[b].set one-hot would
    lower to scatter, which Mosaic does not support. The reference derives
    Jacobians with ForwardDiff the same way (perform_step.jl:116-122).
    """

    def jac(u, p, t):
        dd = u.shape[0]
        cols = []
        for b in range(dd):
            tangent = jnp.stack(
                [jnp.ones_like(u[b]) if i == b else jnp.zeros_like(u[b])
                 for i in range(dd)]
            )
            _, col = jax.jvp(lambda uu: f(uu, p, t), (u,), (tangent,))
            cols.append(col)                    # J[:, b]
        return jnp.stack(cols, axis=1)          # (d, d[, batch...])

    return jac


def _auto_jac_2nd(f: Callable) -> Callable:
    """Both full partial Jacobians of a second-order RHS
    ``f(du, u, p, t)`` from 2d in-kernel JVP columns: returns
    ``(J_u, J_du)``, each ``(d, d[, batch...])`` (`step.py:186-199`)."""

    def jac2(du, u, p, t):
        dd = u.shape[0]
        cols_u, cols_du = [], []
        for b in range(dd):
            tangent = jnp.stack(
                [jnp.ones_like(u[b]) if i == b else jnp.zeros_like(u[b])
                 for i in range(dd)]
            )
            _, col = jax.jvp(lambda uu: f(du, uu, p, t), (u,), (tangent,))
            cols_u.append(col)
            _, col = jax.jvp(lambda dv: f(dv, u, p, t), (du,), (tangent,))
            cols_du.append(col)
        return jnp.stack(cols_u, axis=1), jnp.stack(cols_du, axis=1)

    return jac2



def _ek0_consts(q: int, dt: float, np_dtype, prior=None):
    """Shared static constants: (At, Qt, pinv0, pinv1) for a given order.

    ``prior``: None / IWP -> the h-free IBM constants; IOUP/Matern -> the
    preconditioned transition at this (static) dt, computed host-side
    (`priors.transition_precond_small_np`) — on a uniform grid it is a
    compile-time constant for ANY Gauss-Markov prior."""
    At_np, QLt_np = _prior_consts_np(prior, q, dt)
    Qt_np = QLt_np @ QLt_np.T
    j = np.arange(q + 1, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    return (
        At_np.astype(np_dtype), Qt_np.astype(np_dtype),
        float(1.0 / p_np[0]), float(1.0 / p_np[1]), p_np,
    )


# --------------------------------------------------------------------------
# Differentiable fused filter: custom VJP.
#
# Primal = the plain fused kernel above. The VJP forward re-runs it while
# streaming the per-step carry (m, C) to HBM (double-buffered DMA, like the
# filter+smoother pair below); the backward kernel walks the stream in
# reverse and applies the *in-kernel* `jax.vjp` of the step function —
# i.e. the exact adjoint of the filter recursion, including through the
# user vector field and the dynamic-diffusion calibration, entirely on the
# VPU. Reference behavior matched: differentiability of the whole solve
# (`/root/reference/test/specific_problems.jl:141-156`) at kernel speed.
# --------------------------------------------------------------------------


def _ek0_grad_fwd_kernel(
    m0_ref, p_ref, us_ref, std_ref, ll_ref, st_ref,
    row, sem, *,
    f, At, Qt, pinv0, pinv1, T, dt, t0, d, nq,
    so=False, pinv_b=0.0,
):
    """Forward pass with state streaming: packs (m | C) per step."""
    m_init = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m_init[0][0])
    C_init = [[zero for _ in range(nq)] for _ in range(nq)]
    p_block = p_ref[:]

    for j in range(d):
        us_ref[0, j] = pinv0 * m_init[0][j]
    std_ref[0] = zero

    def pack_and_send(k_idx, m, C):
        _pack_mc_and_send(row, st_ref, sem, k_idx, m, C, d, nq)

    pack_and_send(jnp.int32(0), m_init, C_init)

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, collapsed=True,
    )

    def body(k, carry):
        m, C, ll = carry
        k1 = k + jnp.ones((), k.dtype)
        t_new = _step_time(k, t0, dt, zero.dtype)
        m_new, C_new, ll_inc, us_row, std_val = step(m, C, p_block, t_new)
        for j in range(d):
            us_ref[k1, j] = us_row[j]
        std_ref[k1] = std_val
        pack_and_send(k1, m_new, C_new)
        return m_new, C_new, ll + ll_inc

    _, _, ll = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m_init, C_init, zero)
    )
    ll_ref[...] = ll
    pltpu.make_async_copy(
        row.at[jnp.int32(T % 2)], st_ref.at[jnp.int32(T)],
        sem.at[jnp.int32(T % 2)],
    ).wait()
    if T >= 1:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 1) % 2)], st_ref.at[jnp.int32(T - 1)],
            sem.at[jnp.int32((T - 1) % 2)],
        ).wait()


def _ek0_grad_bwd_kernel(
    p_ref, dus_ref, dstd_ref, dll_ref, st_ref,
    dm0_ref, dp_ref,
    row, sem, *,
    f, At, Qt, pinv0, pinv1, T, dt, t0, d, nq,
    so=False, pinv_b=0.0,
):
    """Adjoint sweep: reads the streamed (m, C) states in reverse and
    applies the VJP of the step, accumulating input cotangents."""
    p_block = p_ref[:]
    dll = dll_ref[:]                    # cotangent of the summed ll output
    zero = jnp.zeros_like(dll)

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        C = [[row[slot, i, d + l] for l in range(nq)] for i in range(nq)]
        return m, C

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, collapsed=True,
    )

    dm0 = [[zero for _ in range(d)] for _ in range(nq)]
    dC0 = [[zero for _ in range(nq)] for _ in range(nq)]
    dp0 = jnp.zeros_like(p_block)

    if T >= 1:
        start_load(jnp.int32(T - 1))

    def body(s, carry):
        dm, dC, dp = carry
        k = jnp.asarray(T, s.dtype) - jnp.ones((), s.dtype) - s
        m_k, C_k = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.ones((), k.dtype))

        t_new = _step_time(k, t0, dt, zero.dtype)
        _, vjp_fn = jax.vjp(
            lambda m, C, p: step(m, C, p, t_new), m_k, C_k, p_block
        )
        k1 = k + jnp.ones((), k.dtype)
        dus_row = [dus_ref[k1, j] for j in range(d)]
        dstd_val = dstd_ref[k1]
        dm_k, dC_k, dp_k = vjp_fn((dm, dC, dll, dus_row, dstd_val))
        return dm_k, dC_k, dp + dp_k

    dm, dC, dp = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (dm0, dC0, dp0)
    )
    # us[0] = pinv0 * m0[0]; std[0] is constant 0; C0 is a constant.
    for j in range(d):
        dm[0][j] = dm[0][j] + pinv0 * dus_ref[jnp.int32(0), j]
    for i in range(nq):
        for j in range(d):
            dm0_ref[i, j] = dm[i][j]
    dp_ref[...] = dp


def _ek0_blocked_specs(nq, d, n_params, T):
    in_specs = [
        pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, T + 1, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T + 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return in_specs, out_specs


def _chain_interleave(nb: int, T: int = 0, d: int = 1) -> int:
    """Independent filter chains per program: largest of (4, 2, 1)
    dividing nb whose per-program output blocks fit a ~13 MiB VMEM
    budget. Interleaving fills the VPU's latency slots between the
    serial recursion's dependent ops (measured ~1.1-1.2x on the 8192
    FHN filter with dispatch amortized); beyond the budget Mosaic's
    scoped-vmem allocator rejects the kernel (observed at exactly
    16.09/16.00 MiB with U=4, T=500)."""
    budget = 13 * 2**20
    per_chain = (T + 1) * (d + 1) * _SUB * _LANE * 4
    for U in (4, 2):
        if nb % U == 0 and U * per_chain <= budget:
            return U
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6))
def _ek0_filter_blocked(f, q, T, dt, t0, so, prior, m0_p, ps_b):
    """Blocked fused EK0 filter (differentiable): inputs/outputs in the
    (nb, ..., 8, 128) lane layout; ``m0_p`` already preconditioned.
    Runs U interleaved chains per program (see `_chain_interleave`)."""
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    pinv_b = float(1.0 / p_np[2]) if so else 0.0
    U = _chain_interleave(nb, T, d)
    ng = nb // U
    kernel = functools.partial(
        _ek0_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        T=T, dt=float(dt), t0=float(t0), d=d, nq=nq, so=so, pinv_b=pinv_b,
        U=U,
    )

    def entry(m0_blk, p_blk, us_blk, std_blk, ll_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)],
        )

    us, var, lls = pl.pallas_call(
        entry,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, U, nq, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, n_params, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, U, T + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, T + 1, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, U, T + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((ng, U, T + 1, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((ng, U, _SUB, _LANE), dtype),
        ],
    )(
        m0_p.reshape(ng, U, nq, d, _SUB, _LANE),
        ps_b.reshape(ng, U, n_params, _SUB, _LANE),
    )
    us = us.reshape(nb, T + 1, d, _SUB, _LANE)
    var = var.reshape(nb, T + 1, _SUB, _LANE)
    lls = lls.reshape(nb, _SUB, _LANE)
    # XLA epilogue: the kernel streams raw variances (want_var) so the
    # hot loop carries no per-step sqrt; one fused sqrt over (T+1, B)
    stds = pinv0 * jnp.sqrt(jnp.maximum(var, 1e-30))
    return us, stds, lls


@_no_x64
def _ek0_filter_blocked_fwd(f, q, T, dt, t0, so, prior, m0_p, ps_b):
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    pinv_b = float(1.0 / p_np[2]) if so else 0.0
    kernel = functools.partial(
        _ek0_grad_fwd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        T=T, dt=float(dt), t0=float(t0), d=d, nq=nq, so=so, pinv_b=pinv_b,
    )
    in_specs, out_specs = _ek0_blocked_specs(nq, d, n_params, T)
    W = d + nq
    scratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(m0_blk, p_blk, us_blk, std_blk, ll_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], st_hbm.at[b], row, sem,
        )

    us, stds, lls, st = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs + [pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, T + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T + 1, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T + 1, nq, W, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_p, ps_b)
    return (us, stds, lls), (st, ps_b)


@_no_x64
def _ek0_filter_blocked_bwd(f, q, T, dt, t0, so, prior, res, cts):
    st, ps_b = res
    dus, dstds, dlls = cts
    nb = st.shape[0]
    nq, W = st.shape[2], st.shape[3]
    d = W - nq
    n_params = ps_b.shape[1]
    dtype = ps_b.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    pinv_b = float(1.0 / p_np[2]) if so else 0.0
    kernel = functools.partial(
        _ek0_grad_bwd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        T=T, dt=float(dt), t0=float(t0), d=d, nq=nq, so=so, pinv_b=pinv_b,
    )
    scratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(p_blk, dus_blk, dstd_blk, dll_blk, st_hbm, dm0_blk, dp_blk,
              row, sem):
        b = pl.program_id(0)
        kernel(
            p_blk.at[jnp.int32(0)], dus_blk.at[jnp.int32(0)],
            dstd_blk.at[jnp.int32(0)], dll_blk.at[jnp.int32(0)],
            st_hbm.at[b],
            dm0_blk.at[jnp.int32(0)], dp_blk.at[jnp.int32(0)],
            row, sem,
        )

    dm0, dps = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + 1, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nq, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_params, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(ps_b, dus, dstds, dlls, st)
    return dm0, dps


_ek0_filter_blocked.defvjp(_ek0_filter_blocked_fwd, _ek0_filter_blocked_bwd)


def _ek0_filter_blocked_static(f, q, T, dt, t0, so, prior, static_diff,
                               m0_p, ps_b):
    """Blocked fused EK0 filter with a STATIC diffusion model: the filter
    runs with the unscaled prior (sigma^2 = 1), the per-step MLE/MAP
    statistic accumulates in-kernel, and the final per-member sigma^2 is
    returned alongside (nb, d, 8, 128) — the caller applies the exit
    rescale (`integrator_utils.jl:4-18`). Not differentiable (the static
    calibration path has no VJP kernel; use the dynamic model for
    gradient-based inference)."""
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    pinv_b = float(1.0 / p_np[2]) if so else 0.0
    U = _chain_interleave(nb, T, d)
    ng = nb // U
    kernel = functools.partial(
        _ek0_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        T=T, dt=float(dt), t0=float(t0), d=d, nq=nq, so=so, pinv_b=pinv_b,
        static_diff=static_diff, U=U,
    )

    def entry(m0_blk, p_blk, us_blk, std_blk, ll_blk, sig_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], sig_blk.at[jnp.int32(0)],
        )

    us, var, lls, sig = pl.pallas_call(
        entry,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec((1, U, nq, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, n_params, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, U, T + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, T + 1, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, U, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ng, U, T + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((ng, U, T + 1, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((ng, U, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((ng, U, d, _SUB, _LANE), dtype),
        ],
    )(
        m0_p.reshape(ng, U, nq, d, _SUB, _LANE),
        ps_b.reshape(ng, U, n_params, _SUB, _LANE),
    )
    us = us.reshape(nb, T + 1, d, _SUB, _LANE)
    var = var.reshape(nb, T + 1, _SUB, _LANE)
    lls = lls.reshape(nb, _SUB, _LANE)
    sig = sig.reshape(nb, d, _SUB, _LANE)
    stds = pinv0 * jnp.sqrt(jnp.maximum(var, 1e-30))
    return us, stds, lls, sig


@_no_x64
def ek0_fused_filter(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    second_order: bool = False,
    prior=None,
    mesh=None,
    diffusion: str = "dynamic",
):
    """Run the fused EK0 filter over an ensemble of B members.

    Returns ``(us, stds, lls)``: posterior (filter) means of the solution
    (T+1, d, B), their marginal stds (T+1, B), and the per-member data
    log-likelihood (B,) — the reference's ``sol.log_likelihood``
    accumulated per ensemble member, enabling likelihood sweeps for
    parameter inference at kernel throughput. B must be a multiple of 1024.

    Differentiable: ``jax.grad`` w.r.t. ``(m0, ps)`` runs a custom VJP
    whose backward pass is itself a Pallas kernel (the exact adjoint of
    the filter recursion via in-kernel ``jax.vjp`` of the step), so
    likelihood gradients for parameter inference run at kernel speed.

    ``diffusion``: "dynamic" (per-step MLE, default), or a STATIC model
    — "fixed" / "fixedMAP" (scalar) / "fixedMV" (per-dimension): the
    filter runs with the unscaled prior, an in-kernel running MLE/MAP
    accumulates the per-member global sigma^2, and the output stds carry
    the exit rescale (`integrator_utils.jl:4-18` semantics; means are
    gain-invariant, so they equal the sigma^2 = 1 filter's exactly). For
    static models the return is ``(us, stds, lls, sigma2)`` with
    ``lls = nan`` (reference behavior) and ``sigma2`` of shape (B,) —
    or (d, B) for fixedMV, where ``stds`` also becomes per-dimension
    (T+1, d, B). Static models are forward-only (no VJP kernel).

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — shards the ensemble
    axis across devices via ``shard_map`` (B per shard still a multiple
    of 1024); the custom VJP composes, so sharded gradients work too.
    """
    static = None if diffusion == "dynamic" else str(diffusion)
    if static is not None and static not in ("fixed", "fixedMAP", "fixedMV"):
        raise NotImplementedError(
            f"diffusion={diffusion!r}: fused fixed-grid kernels support "
            "dynamic / fixed / fixedMAP / fixedMV"
        )
    if mesh is not None:
        out_axes = (2, 1, 0) if static is None else (
            (2, 2, 0, 1) if static == "fixedMV" else (2, 1, 0, 0)
        )
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_: ek0_fused_filter(
                f, m0_, ps_, t0, dt, n_steps, q,
                second_order=second_order, prior=prior, diffusion=diffusion,
            ),
            (m0, ps), in_axes=(2, 1), out_axes=out_axes,
        )
    nq = q + 1
    if second_order and q < 2:
        raise ValueError("second-order problems need solver order >= 2")
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    T = int(n_steps)

    # preconditioner entries for this (static) dt
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)

    dtype = m0.dtype
    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)                      # (nb, nq, d, 8, 128)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)

    if static is not None:
        us, stds, lls, sig = _ek0_filter_blocked_static(
            f, q, T, float(dt), float(t0), bool(second_order), prior,
            static, m0_p, ps_b,
        )
        us = us.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
        stds = stds.transpose(1, 0, 2, 3).reshape(T + 1, B)
        lls = jnp.full((B,), jnp.nan, dtype)
        if static == "fixedMV":
            sig = sig.transpose(1, 0, 2, 3).reshape(d, B)
            stds = stds[:, None, :] * jnp.sqrt(sig)[None]
        else:
            sig = sig[:, 0].reshape(B)
            stds = stds * jnp.sqrt(sig)[None]
        return us, stds, lls, sig

    us, stds, lls = _ek0_filter_blocked(
        f, q, T, float(dt), float(t0), bool(second_order), prior, m0_p, ps_b
    )

    us = us.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    stds = stds.transpose(1, 0, 2, 3).reshape(T + 1, B)
    lls = lls.reshape(B)
    return us, stds, lls


def solve_ensemble_ek0_pallas(
    prob_f: Callable,
    u0s: jax.Array,     # (B, d)
    ps: jax.Array,      # (B, n_params)
    tspan,
    n_steps: int,
    q: int = 3,
    p_template=None,
    second_order: bool = False,
    prior=None,
    mesh=None,
    diffusion: str = "dynamic",
):
    """Convenience wrapper: Taylor-init the ensemble, run the fused kernel.

    ``prob_f(u, p, t)`` must be written in index-and-stack style so it
    vectorizes over trailing batch dims (all `odefilters.models` qualify).

    ``second_order=True`` solves ``u'' = f(du, u, p, t)`` directly (the
    measurement moves to derivative block 2, mirroring the dense path's
    2nd-order branch in `odefilters/step.py`): pass ``u0s = [u0 | du0]``
    of shape (B, 2d) and an ``f(du, u, p, t)``. Outputs expose the
    position block u. ``diffusion``: see :func:`ek0_fused_filter` —
    static models return ``(us, stds, lls=nan, sigma2)``.
    """
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    if second_order:
        def init_one(u0_full, p):
            return jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
    else:
        def init_one(u0, p):
            return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps)            # (B, q+1, d)
    m0 = m0.transpose(1, 2, 0)                  # (q+1, d, B)
    return ek0_fused_filter(
        prob_f, m0, ps.T, float(t0), float(dt), n_steps, q,
        second_order=second_order, prior=prior, mesh=mesh,
        diffusion=diffusion,
    )


# ==========================================================================
# Fused data-likelihood kernel: physics-enhanced regression at kernel
# speed. The ODE filter runs as usual; at observation rows a SECOND,
# noisy Kalman update conditions on y_k = u(t_k) + e, e ~ N(0, r2 I_d).
# Full-state EK0 observations keep the Kronecker structure exactly
# (S_data = (pinv0^2 C[0,0] + r2) I_d, K = ktil (x) I_d), so the data
# update is a handful of lane ops. The per-member accumulated
# log N(y_k; u_pred, S_data) is the same chain-rule marginal likelihood
# `odefilters.datalik.data_loglik` computes on the XLA path (tested
# equal in interpret mode) — at fused-kernel throughput, for SMC / MCMC /
# likelihood sweeps over thousands of parameter candidates per chip.
# ==========================================================================


def _ek0_data_update_lists(m, C, y_row, dmask, *, pinv0, r2, d, nq):
    """Masked isotropic data update on derivative block 0 (lists-of-lanes).

    ``y_row``: d SMEM scalars; ``dmask``: 0/1 scalar — rows without an
    observation apply a zero-gain update (exact no-op, branch-free).
    """
    zd = [y_row[j] - pinv0 * m[0][j] for j in range(d)]
    s_d = pinv0 * pinv0 * C[0][0] + r2
    inv_sd = 1.0 / s_d
    kgd = [dmask * pinv0 * C[i][0] * inv_sd for i in range(nq)]
    m_new = [
        [m[i][j] + kgd[i] * zd[j] for j in range(d)] for i in range(nq)
    ]
    C_new = [
        [C[i][l] - kgd[i] * kgd[l] * s_d for l in range(nq)]
        for i in range(nq)
    ]
    zzd = functools.reduce(lambda a, b: a + b, [z * z for z in zd])
    dll_inc = dmask * (-0.5) * (
        zzd * inv_sd + d * (jnp.log(s_d) + _LOG_2PI)
    )
    return m_new, C_new, dll_inc


def _sched_total_steps(sched) -> int:
    """Total ODE steps of an off-grid schedule (= stream length)."""
    T = 0
    for it in sched:
        T += (it[2] - it[1]) if it[0] == "run" else 1
    return T


def _sched_odd_consts(sched, q: int, dt: float, prior, fdtype):
    """Static per-odd-dt' step constants for an off-grid schedule.

    For each distinct non-base step size dt' in the schedule:
    ``(At', Qt', pinv0', pinv1', pinv_b', r)`` where ``r`` are the
    STATIC rescale factors ``p_i(dt')/p_i(dt)`` taking a state carried
    preconditioned at the base dt into the dt' frame (and back by
    division). All exact host floats — no traced exp/log in-kernel."""
    out = {}
    nq = q + 1
    for it in sched:
        if it[0] == "one":
            dtp = it[3]
            if dtp != dt and dtp not in out:
                At_o, Qt_o, pinv0_o, pinv1_o, p_np_o = _ek0_consts(
                    q, dtp, fdtype, prior
                )
                jj = np.arange(nq, dtype=np.float64)
                r = tuple(
                    float(v) for v in
                    (float(dtp) ** (jj - q - 0.5))
                    / (float(dt) ** (jj - q - 0.5))
                )
                out[dtp] = (At_o, Qt_o, pinv0_o, pinv1_o,
                            float(1.0 / p_np_o[2]), r)
    return out


def _build_offgrid_sched(ts_np, is_data, dt: float, t0: float, tol: float):
    """Static step schedule from a merged (base grid + observation times)
    grid, for the off-grid data-likelihood kernels.

    Items (hashable, suitable as custom-vjp nondiff args):

    * ``("run", k0, k1, off)`` — a maximal run of base-lattice uniform
      steps with lattice indices k in [k0, k1) (step time
      t0 + dt (k+1)); stream position = k + off.
    * ``("one", pos, t_b, dtp, si)`` — a single step to the static time
      ``t_b`` with step size ``dtp`` (== dt for a lattice step that ends
      at an observation row); ``si`` >= 0 applies data update si after
      the step (-1: none); stream position = pos.

    Stream positions are the sequential step index 0..T-1, so the
    backward kernel's decreasing-prefetch DMA chain is preserved."""
    items = []
    T = len(ts_np) - 1
    run = None  # [k0, k1, off]
    si_counter = 0
    for i in range(T):
        t_b = float(ts_np[i + 1])
        dti = float(ts_np[i + 1] - ts_np[i])
        m_lat = int(round((t_b - t0) / dt))
        uniform = (
            abs(dti - dt) <= tol
            and abs(t_b - (t0 + m_lat * dt)) <= tol
        )
        data_after = bool(is_data[i + 1])
        if uniform and not data_after:
            k = m_lat - 1
            if run is not None and run[1] == k and run[2] == i - k:
                run[1] = k + 1
            else:
                if run is not None:
                    items.append(("run", run[0], run[1], run[2]))
                run = [k, k + 1, i - k]
        else:
            if run is not None:
                items.append(("run", run[0], run[1], run[2]))
                run = None
            si = si_counter if data_after else -1
            if data_after:
                si_counter += 1
            items.append((
                "one", i, t_b, float(dt) if uniform else dti, si
            ))
    if run is not None:
        items.append(("run", run[0], run[1], run[2]))
    assert _sched_total_steps(items) == T
    return tuple(items)


def _ek0_datalik_kernel(
    m0_ref, p_ref, y_ref, dll_ref, ll_ref, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, r2: float, seg_lens: tuple,
    dt: float, t0: float, d: int, nq: int,
    so: bool = False, pinv_b: float = 0.0, stop_calib: bool = False,
    sched=None, odd_consts=None,
):
    """Filter + data updates with a STATICALLY segmented time loop.

    ``seg_lens``: static tuple of inter-observation step counts (sum = T);
    after each of the first len(seg_lens)-1 segments the observation with
    the same index is applied unconditionally. This keeps every data access
    a static SMEM index — a masked per-step dynamic read compiles ~100x
    slower in Mosaic (measured 6 min for T=30).
    """
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m[0][0])
    C = [[zero for _ in range(nq)] for _ in range(nq)]
    p_block = p_ref[:]

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, stop_calib=stop_calib,
        collapsed=True,
    )
    dupd = functools.partial(
        _ek0_data_update_lists, pinv0=pinv0, r2=r2, d=d, nq=nq
    )
    one = zero + 1.0

    def body(k, carry):
        m, C, ll = carry
        t_new = _step_time(k, t0, dt, zero.dtype)
        m_new, C_new, ll_inc, _, _ = step(m, C, p_block, t_new)
        return m_new, C_new, ll + ll_inc

    ll = zero
    dll = zero
    if sched is not None:
        for it in sched:
            if it[0] == "run":
                _, k0, k1, _off = it
                m, C, ll = jax.lax.fori_loop(
                    jnp.int32(k0), jnp.int32(k1), body, (m, C, ll)
                )
            else:
                _, _pos, t_b, dtp, si = it
                t_tr = zero + jnp.asarray(t_b, zero.dtype)
                if dtp == dt:
                    m, C, ll_inc, _, _ = step(m, C, p_block, t_tr)
                else:
                    m, C, ll_inc = _odd_step_lists(
                        m, C, p_block, t_tr, odd_consts[dtp], f=f, d=d,
                        nq=nq, so=so, stop_calib=stop_calib,
                    )
                ll = ll + ll_inc
                if si >= 0:
                    y_row = [y_ref[si, j] for j in range(d)]
                    m, C, dll_inc = dupd(m, C, y_row, one)
                    dll = dll + dll_inc
        dll_ref[...] = dll
        ll_ref[...] = ll
        return
    k_base = 0
    for si, L in enumerate(seg_lens):
        if L > 0:
            m, C, ll = jax.lax.fori_loop(
                jnp.int32(k_base), jnp.int32(k_base + L), body, (m, C, ll)
            )
        k_base += L
        if si < len(seg_lens) - 1:  # observation after this segment
            y_row = [y_ref[si, j] for j in range(d)]    # static index
            m, C, dll_inc = dupd(m, C, y_row, one)
            dll = dll + dll_inc
    dll_ref[...] = dll
    ll_ref[...] = ll


def _odd_step_lists(m, C, p_block, t_new, consts, *, f, d, nq, so,
                    stop_calib):
    """One EK0 step at a non-base step size: rescale the base-dt
    preconditioned state into the dt' frame (static factors r), run the
    standard step with the dt' constants, rescale back. Pure function of
    ``(m, C, p)`` — vjp-able like `_ek0_step_lists`."""
    At_o, Qt_o, pinv0_o, pinv1_o, pinv_b_o, r = consts
    mh = [[m[i][j] * r[i] for j in range(d)] for i in range(nq)]
    Ch = [[C[i][l] * (r[i] * r[l]) for l in range(nq)] for i in range(nq)]
    m1, C1, ll_inc, _, _ = _ek0_step_lists(
        mh, Ch, p_block, t_new, f=f, At=At_o, Qt=Qt_o, pinv0=pinv0_o,
        pinv1=pinv1_o, d=d, nq=nq, so=so, pinv_b=pinv_b_o if so else 0.0,
        stop_calib=stop_calib, collapsed=True,
    )
    m1 = [[m1[i][j] / r[i] for j in range(d)] for i in range(nq)]
    C1 = [[C1[i][l] / (r[i] * r[l]) for l in range(nq)] for i in range(nq)]
    return m1, C1, ll_inc


@_no_x64
def _ek0_datalik_blocked(
    f, q, dt, t0, r2, prior, seg_lens, m0_p, ps_b, y_arr, so=False,
    sched=None,
):
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    n_obs = y_arr.shape[0]
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    odd_consts = (None if sched is None else
                  _sched_odd_consts(sched, q, float(dt), prior, fdtype))
    kernel = functools.partial(
        _ek0_datalik_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        r2=float(r2), seg_lens=None if sched is not None else tuple(seg_lens),
        dt=float(dt), t0=float(t0),
        d=d, nq=nq, so=bool(so),
        pinv_b=float(1.0 / p_np[2]) if so else 0.0,
        sched=sched, odd_consts=odd_consts,
    )

    def entry(m0_blk, p_blk, y_blk, dll_blk, ll_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)], y_blk,
            dll_blk.at[jnp.int32(0)], ll_blk.at[jnp.int32(0)],
        )

    in_specs = [
        pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        # observations are SHARED across members: unblocked SMEM scalars
        pl.BlockSpec((n_obs, d), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
        ],
    )(m0_p, ps_b, y_arr)


def _seg_offsets(seg_lens):
    offs = [0]
    for L in seg_lens:
        offs.append(offs[-1] + L)
    return offs


def _ek0_datalik_grad_fwd_kernel(
    m0_ref, p_ref, y_ref, dll_ref, ll_ref, st_ref,
    row, sem, *,
    f, At, Qt, pinv0, pinv1, r2, seg_lens, dt, t0, d, nq,
    so: bool = False, pinv_b: float = 0.0, stop_calib: bool = False,
    sched=None, odd_consts=None,
):
    """Segmented data-likelihood filter, streaming the state at entry of
    every ODE step (post any data update) for the adjoint sweep."""
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m[0][0])
    C = [[zero for _ in range(nq)] for _ in range(nq)]
    p_block = p_ref[:]
    one = zero + 1.0

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, stop_calib=stop_calib,
        collapsed=True,
    )
    dupd = functools.partial(
        _ek0_data_update_lists, pinv0=pinv0, r2=r2, d=d, nq=nq
    )

    def pack_and_send(k_idx, m, C):
        _pack_mc_and_send(row, st_ref, sem, k_idx, m, C, d, nq)

    def body_off(off):
        def body(k, carry):
            m, C, ll = carry
            pack_and_send(k + jnp.int32(off), m, C)  # entry of stream pos
            t_new = _step_time(k, t0, dt, zero.dtype)
            m_new, C_new, ll_inc, _, _ = step(m, C, p_block, t_new)
            return m_new, C_new, ll + ll_inc

        return body

    body = body_off(0)

    ll = zero
    dll = zero
    if sched is not None:
        for it in sched:
            if it[0] == "run":
                _, k0, k1, off = it
                m, C, ll = jax.lax.fori_loop(
                    jnp.int32(k0), jnp.int32(k1), body_off(off), (m, C, ll)
                )
            else:
                _, pos, t_b, dtp, si = it
                pack_and_send(jnp.int32(pos), m, C)
                t_tr = zero + jnp.asarray(t_b, zero.dtype)
                if dtp == dt:
                    m, C, ll_inc, _, _ = step(m, C, p_block, t_tr)
                else:
                    m, C, ll_inc = _odd_step_lists(
                        m, C, p_block, t_tr, odd_consts[dtp], f=f, d=d,
                        nq=nq, so=so, stop_calib=stop_calib,
                    )
                ll = ll + ll_inc
                if si >= 0:
                    y_row = [y_ref[si, j] for j in range(d)]
                    m, C, dll_inc = dupd(m, C, y_row, one)
                    dll = dll + dll_inc
        T = _sched_total_steps(sched)
    else:
        k_base = 0
        for si, L in enumerate(seg_lens):
            if L > 0:
                m, C, ll = jax.lax.fori_loop(
                    jnp.int32(k_base), jnp.int32(k_base + L), body, (m, C, ll)
                )
            k_base += L
            if si < len(seg_lens) - 1:
                y_row = [y_ref[si, j] for j in range(d)]
                m, C, dll_inc = dupd(m, C, y_row, one)
                dll = dll + dll_inc
        T = sum(seg_lens)
    dll_ref[...] = dll
    ll_ref[...] = ll
    # drain in-flight copies (entries T-1, T-2)
    if T >= 1:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 1) % 2)], st_ref.at[jnp.int32(T - 1)],
            sem.at[jnp.int32((T - 1) % 2)],
        ).wait()
    if T >= 2:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 2) % 2)], st_ref.at[jnp.int32(T - 2)],
            sem.at[jnp.int32((T - 2) % 2)],
        ).wait()


def _ek0_datalik_grad_bwd_kernel(
    p_ref, y_ref, ddll_ref, dall_ref, st_ref,
    dm0_ref, dp_ref, dy_ref,
    row, sem, *,
    f, At, Qt, pinv0, pinv1, r2, seg_lens, dt, t0, d, nq,
    so: bool = False, pinv_b: float = 0.0, stop_calib: bool = False,
    sched=None, odd_consts=None,
):
    """Adjoint of the segmented data-likelihood filter: walks the streamed
    states in reverse, vjp-ing the ODE step per step and (at the static
    segment boundaries) the composed step+data-update."""
    p_block = p_ref[:]
    ddll = ddll_ref[:]                 # cotangent of the data-ll output
    dall = dall_ref[:]                 # cotangent of the ODE-ll output
    zero = jnp.zeros_like(ddll)

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        C = [[row[slot, i, d + l] for l in range(nq)] for i in range(nq)]
        return m, C

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, stop_calib=stop_calib,
        collapsed=True,
    )
    dupd = functools.partial(
        _ek0_data_update_lists, pinv0=pinv0, r2=r2, d=d, nq=nq
    )
    one_c = zero + 1.0

    def stepr(m, C, p, t_new):
        m1, C1, ll_inc, _, _ = step(m, C, p, t_new)
        return m1, C1, ll_inc

    dm = [[zero for _ in range(d)] for _ in range(nq)]
    dC = [[zero for _ in range(nq)] for _ in range(nq)]
    dp = jnp.zeros_like(p_block)

    def plain_body(s, carry, a, b, off=0):
        del a  # segment start only fixes the static trip count
        dm, dC, dp = carry
        k = jnp.asarray(b - 1, jnp.int32) - s
        pos = k + jnp.int32(off)
        m_k, C_k = wait_and_read(pos)

        @pl.when(pos >= 1)
        def _():
            start_load(pos - jnp.ones((), pos.dtype))

        t_new = _step_time(k, t0, dt, zero.dtype)
        _, vjp_fn = jax.vjp(
            lambda m, C, p: stepr(m, C, p, t_new), m_k, C_k, p_block
        )
        dm_k, dC_k, dp_k = vjp_fn((dm, dC, dall))
        return dm_k, dC_k, dp + dp_k

    if sched is not None:
        T = _sched_total_steps(sched)
        if T >= 1:
            start_load(jnp.int32(T - 1))
        for it in reversed(sched):
            if it[0] == "run":
                _, k0, k1, off = it
                dm, dC, dp = jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(k1 - k0),
                    functools.partial(plain_body, a=k0, b=k1, off=off),
                    (dm, dC, dp),
                )
            else:
                _, pos, t_b, dtp, si = it
                m_k, C_k = wait_and_read(jnp.int32(pos))
                if pos >= 1:
                    start_load(jnp.int32(pos - 1))
                t_tr = zero + jnp.asarray(t_b, zero.dtype)
                if dtp == dt:
                    def one_step(m, C, p, _t=t_tr):
                        return stepr(m, C, p, _t)
                else:
                    def one_step(m, C, p, _t=t_tr, _c=odd_consts[dtp]):
                        return _odd_step_lists(
                            m, C, p, _t, _c, f=f, d=d, nq=nq, so=so,
                            stop_calib=stop_calib,
                        )
                if si >= 0:
                    y_row = [y_ref[si, j] for j in range(d)]

                    def comp(m, C, p, y, _s=one_step):
                        m1, C1, ll_inc = _s(m, C, p)
                        m2, C2, dll_inc = dupd(m1, C1, y, one_c)
                        return m2, C2, ll_inc, dll_inc

                    _, vjp_fn = jax.vjp(comp, m_k, C_k, p_block, y_row)
                    dm, dC, dp_k, dy_row = vjp_fn((dm, dC, dall, ddll))
                    dp = dp + dp_k
                    for j in range(d):
                        dy_ref[si, j] = dy_row[j] + jnp.zeros_like(ddll)
                else:
                    _, vjp_fn = jax.vjp(one_step, m_k, C_k, p_block)
                    dm, dC, dp_k = vjp_fn((dm, dC, dall))
                    dp = dp + dp_k
        for i in range(nq):
            for j in range(d):
                dm0_ref[i, j] = dm[i][j]
        dp_ref[...] = dp
        return

    offs = _seg_offsets(seg_lens)
    n_obs = len(seg_lens) - 1
    T = offs[-1]
    # prefetch chain: start T-1 once; every consumer (fori body or static
    # boundary single) waits on k and immediately starts k-1, so the next
    # HBM->VMEM transfer overlaps the per-step vjp compute
    if T >= 1:
        start_load(jnp.int32(T - 1))
    for si in range(len(seg_lens) - 1, -1, -1):
        a, b = offs[si], offs[si + 1]
        if si < n_obs:
            # boundary step b-1: ODE step composed with data update si
            y_row = [y_ref[si, j] for j in range(d)]
            m_k, C_k = wait_and_read(jnp.int32(b - 1))
            if b - 1 >= 1:
                start_load(jnp.int32(b - 2))
            t_new = _step_time(jnp.int32(b - 1), t0, dt, zero.dtype)

            def comp(m, C, p, y):
                m1, C1, ll_inc = stepr(m, C, p, t_new)
                m2, C2, dll_inc = dupd(m1, C1, y, one_c)
                return m2, C2, ll_inc, dll_inc

            _, vjp_fn = jax.vjp(comp, m_k, C_k, p_block, y_row)
            dm, dC, dp_k, dy_row = vjp_fn((dm, dC, dall, ddll))
            dp = dp + dp_k
            for j in range(d):
                # the vjp of the scalar->lanes broadcast is already the
                # lane sum: a scalar per (obs, dim), one partial per block,
                # broadcast into a lane block (SMEM outputs of shape (9, 2)
                # violate Mosaic's 128-lane tiling)
                dy_ref[si, j] = dy_row[j] + jnp.zeros_like(ddll)
            b = b - 1
        if b > a:
            dm, dC, dp = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(b - a),
                functools.partial(plain_body, a=a, b=b), (dm, dC, dp),
            )

    for i in range(nq):
        for j in range(d):
            dm0_ref[i, j] = dm[i][j]
    dp_ref[...] = dp


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
)
@_no_x64
def _ek0_datalik_vjp(
    f, q, dt, t0, r2, prior, seg_lens, stop_calib, so, sched,
    m0_p, ps_b, y_arr
):
    return _ek0_datalik_blocked(
        f, q, dt, t0, r2, prior, seg_lens, m0_p, ps_b, y_arr, so=so,
        sched=sched,
    )


@_no_x64
def _ek0_datalik_vjp_fwd(
    f, q, dt, t0, r2, prior, seg_lens, stop_calib, so, sched,
    m0_p, ps_b, y_arr
):
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    n_obs = y_arr.shape[0]
    T = (int(sum(seg_lens)) if sched is None
         else _sched_total_steps(sched))
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    odd_consts = (None if sched is None else
                  _sched_odd_consts(sched, q, float(dt), prior, fdtype))
    kernel = functools.partial(
        _ek0_datalik_grad_fwd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0,
        pinv1=pinv1, r2=float(r2),
        seg_lens=None if sched is not None else tuple(seg_lens),
        dt=float(dt), t0=float(t0), d=d, nq=nq,
        so=bool(so), pinv_b=float(1.0 / p_np[2]) if so else 0.0,
        stop_calib=bool(stop_calib),
        sched=sched, odd_consts=odd_consts,
    )
    W = d + nq
    scratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(m0_blk, p_blk, y_blk, dll_blk, ll_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)], y_blk,
            dll_blk.at[jnp.int32(0)], ll_blk.at[jnp.int32(0)],
            st_hbm.at[b], row, sem,
        )

    in_specs = [
        pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_obs, d), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    dll, ll, st = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T, nq, W, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_p, ps_b, y_arr)
    return (dll, ll), (st, ps_b, y_arr)


@_no_x64
def _ek0_datalik_vjp_bwd(
    f, q, dt, t0, r2, prior, seg_lens, stop_calib, so, sched, res, cts
):
    st, ps_b, y_arr = res
    ddll, dall = cts
    nb = st.shape[0]
    nq, W = st.shape[2], st.shape[3]
    d = W - nq
    n_params = ps_b.shape[1]
    n_obs = y_arr.shape[0]
    dtype = ps_b.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, dt, fdtype, prior)
    odd_consts = (None if sched is None else
                  _sched_odd_consts(sched, q, float(dt), prior, fdtype))
    kernel = functools.partial(
        _ek0_datalik_grad_bwd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0,
        pinv1=pinv1, r2=float(r2),
        seg_lens=None if sched is not None else tuple(seg_lens),
        dt=float(dt), t0=float(t0), d=d, nq=nq,
        so=bool(so), pinv_b=float(1.0 / p_np[2]) if so else 0.0,
        stop_calib=bool(stop_calib),
        sched=sched, odd_consts=odd_consts,
    )
    scratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(p_blk, y_blk, ddll_blk, dall_blk, st_hbm,
              dm0_blk, dp_blk, dy_blk, row, sem):
        b = pl.program_id(0)
        kernel(
            p_blk.at[jnp.int32(0)], y_blk,
            ddll_blk.at[jnp.int32(0)], dall_blk.at[jnp.int32(0)],
            st_hbm.at[b],
            dm0_blk.at[jnp.int32(0)], dp_blk.at[jnp.int32(0)],
            dy_blk.at[jnp.int32(0)],
            row, sem,
        )

    dm0, dps, dy_blocks = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_obs, d), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_obs, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nq, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_params, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_obs, d, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(ps_b, y_arr, ddll, dall, st)
    # y is SHARED by all members: every lane of a block holds the same
    # per-block partial (the broadcast-vjp lane sum); take one lane and
    # sum over blocks
    dy = jnp.sum(dy_blocks[..., 0, 0], axis=0).astype(y_arr.dtype)
    return dm0, dps, dy


_ek0_datalik_vjp.defvjp(_ek0_datalik_vjp_fwd, _ek0_datalik_vjp_bwd)


def ensemble_data_loglik_pallas(
    prob_f: Callable,
    u0s: jax.Array,      # (B, d) — or (B, 2d) = [u0 | du0] if second_order
    ps: jax.Array,       # (B, n_params)
    tspan,
    n_steps: int,
    ts_data,             # (n_obs,) concrete times ON the uniform grid
    ys,                  # (n_obs, d_obs) shared or (B, n_obs, d_obs) per-member
    obs_noise_std,       # scalar std or (d_obs,) per-dimension stds
    q: int = 3,
    prior=None,
    mesh=None,
    obs_matrix=None,     # optional static (d_obs, d) observation operator
    ek1: bool = False,
    jac=None,
    second_order: bool = False,
    calib_grad: bool = True,
    diagonal_ek1: bool = False,
    jac_diag=None,
):
    """Per-member marginal data log-likelihood from one fused kernel.

    The kernel analogue of ``odefilters.datalik.data_loglik`` (same
    chain-rule quantity, dynamic diffusion; `datalik.py:127-214`),
    vectorized over B (u0, p) candidates: the inference sweep for
    SMC/MCMC/grid search runs at fused-filter throughput instead of the
    batched XLA path. ``ts_data`` must be strictly increasing and inside
    ``(t0, t1]``; times may lie OFF the uniform grid on the default
    isotropic path — they are merged into the grid host-side exactly as
    `datalik.py:86-120` does and the kernel walks a static per-step
    schedule (base-lattice runs as fori_loops; the 1-2 odd-dt steps
    around each observation as unrolled steps with their own static
    preconditioner constants — differentiable like the uniform path).
    The structured paths (ek1 / diagonal_ek1 / partial obs / per-member
    data) still require grid-aligned times (within 1e-6 dt).

    Observation models (VERDICT r2 item 3 — all tested against the XLA
    path in interpret mode):

    * default: full-state observations, scalar noise, observations shared
      by all members — the isotropic fast path, differentiable via a
      custom VJP whose backward pass is itself a Pallas kernel.
    * ``obs_matrix``: static (d_obs, d) operator. (Scaled) one-hot rows
      run on the per-dimension EK0 kernel; dense rows require
      ``ek1=True``.
    * ``obs_noise_std``: scalar or per-dimension (d_obs,) stds.
    * per-member observations: pass ``ys`` with a leading batch axis
      (B, n_obs, d_obs) — each candidate conditions on its own data set.
    * ``ek1=True``: the full D x D square-root EK1(dynamic) filter with
      joint noisy updates (Joseph square-root form) — stiff inference
      problems and dense observation operators. ``jac`` optional.
    * ``diagonal_ek1=True``: DiagonalEK1 on the per-dimension kernel —
      stiff-but-weakly-coupled inference at EK0's per-dim cost
      (`algorithms.DiagonalEK1`; the ODE step linearizes on the
      Jacobian diagonal, ``jac_diag`` optional — derived from d
      in-kernel JVPs if omitted). Same observation models as the EK0
      per-dim path: (scaled) one-hot ``obs_matrix`` rows, per-dimension
      noise, per-member observation sets.
    * ``second_order=True``: u'' = f(du, u, p, t) with
      ``u0s = [u0 | du0]``; full-state observations of u only.

    Every observation model is differentiable via its own custom VJP
    (streamed states + segmented adjoint kernel — the EK1 variant vjp's
    through the in-kernel square-root step including its MGS QRs;
    ``second_order`` shares the isotropic EK0 VJP with the generalized
    step threaded through).

    ``calib_grad=False`` (recommended for on-chip f32 gradients):
    stop-gradient through the per-step dynamic-diffusion calibration in
    the custom VJP — identical values, but the gradient stays
    ~1e-4-accurate at 500-step horizons where the full f32 gradient is
    orders of magnitude wrong (benchmarks/grad_horizon_experiment.py;
    same estimator family as Fenrir's calibrate-then-condition).

    Returns ``(data_ll, ode_ll)``, each ``(B,)``.

    ``mesh``: optional 1-D device mesh — candidates shard across chips;
    shared observations are replicated (their cotangent is the psum of
    per-shard contributions, inserted by shard_map), per-member
    observations shard with their candidates.
    """
    if mesh is not None:
        ys_m = jnp.asarray(ys)
        return _shard_over_ens(
            mesh,
            lambda u0s_, ps_, ys_: ensemble_data_loglik_pallas(
                prob_f, u0s_, ps_, tspan, n_steps, ts_data, ys_,
                obs_noise_std, q=q, prior=prior, obs_matrix=obs_matrix,
                ek1=ek1, jac=jac, second_order=second_order,
                calib_grad=calib_grad, diagonal_ek1=diagonal_ek1,
                jac_diag=jac_diag,
            ),
            (u0s, ps, ys_m),
            in_axes=(0, 0, 0 if ys_m.ndim == 3 else None),
            out_axes=(0, 0),
        )
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    T = int(n_steps)
    dt = (t1 - t0) / T
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    d = d_in // 2 if second_order else d_in
    td = np.asarray(ts_data, dtype=np.float64)
    n_obs = td.shape[0]
    ys = jnp.asarray(ys)  # may be traced (differentiable w.r.t. the data)

    C_np = None if obs_matrix is None else np.asarray(obs_matrix, np.float64)
    if C_np is not None and (C_np.ndim != 2 or C_np.shape[1] != d):
        raise ValueError(f"obs_matrix must have shape (d_obs, {d})")
    d_obs = d if C_np is None else C_np.shape[0]
    y_batched = ys.ndim == 3
    expect = (B, n_obs, d_obs) if y_batched else (n_obs, d_obs)
    if ys.shape != expect:
        raise ValueError(f"ys must have shape {expect}, got {ys.shape}")
    r_std = np.asarray(obs_noise_std, np.float64)
    if r_std.ndim == 0:
        r2_vec = np.full(d_obs, float(r_std) ** 2)
    elif r_std.shape == (d_obs,):
        r2_vec = r_std**2
    else:
        raise ValueError(
            f"obs_noise_std must be a scalar or ({d_obs},) vector"
        )

    dtype = u0s.dtype
    kidx = np.round((td - float(t0)) / float(dt)).astype(int)
    on_grid = not np.any(
        np.abs(td - (float(t0) + kidx * float(dt))) > 1e-6 * float(dt)
    )
    sched = None
    if on_grid:
        if np.any(kidx < 1) or np.any(kidx > T):
            raise ValueError("ts_data must be in (t0, t1]")
        if np.any(np.diff(kidx) <= 0):
            raise ValueError("ts_data must be strictly increasing (unique rows)")
        # static segmentation: ODE steps between consecutive observations
        bounds = np.concatenate([[0], kidx, [T]])
        seg_lens = tuple(int(x) for x in np.diff(bounds))
    else:
        # OFF-GRID observation times: merge them into the uniform grid
        # host-side exactly as the XLA path does (`datalik.py:86-120`)
        # and walk a static per-step schedule — base-lattice runs stay
        # fori_loops, the 1-2 odd-dt steps around each observation are
        # single unrolled steps with their own static constants.
        from types import SimpleNamespace

        from odefilters.datalik import _merged_grid

        ts_m, is_data_m, _ = _merged_grid(
            SimpleNamespace(tspan=(float(t0), float(t1))), td, T, dtype
        )
        ts_np = np.asarray(ts_m, np.float64)
        is_data_np = np.asarray(is_data_m)
        if is_data_np[0]:
            raise ValueError("ts_data must be strictly after t0")
        eps_span = (float(t1) - float(t0)) * float(
            np.finfo(np.dtype(dtype)).eps
        )
        tol = max(float(dt) * 1e-6, 64.0 * eps_span)
        sched = _build_offgrid_sched(
            ts_np, is_data_np, float(dt), float(t0), tol
        )
        seg_lens = None

    if second_order:
        def init_one(u0_full, p):
            return jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
    else:
        def init_one(u0, p):
            return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)   # (q+1, d, B)
    nq = q + 1
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.T.reshape(ps.shape[1], nb, _SUB, _LANE).transpose(1, 0, 2, 3)

    if ek1 and diagonal_ek1:
        raise ValueError("pass ek1=True OR diagonal_ek1=True, not both")
    iso = (
        not ek1 and not diagonal_ek1
        and not y_batched and C_np is None and r_std.ndim == 0
    )
    if second_order and not iso:
        raise NotImplementedError(
            "second_order data likelihood supports full-state "
            "observations with scalar noise shared by all members"
        )
    if sched is not None and not iso:
        raise NotImplementedError(
            "off-grid ts_data on the fused kernels is supported for the "
            "isotropic EK0 path (full-state obs, scalar noise, shared "
            "data); snap observations to the grid or use "
            "odefilters.datalik.filter_with_data / data_loglik for the "
            "other observation models"
        )
    if iso:
        dll, ll = _ek0_datalik_vjp(
            prob_f, q, float(dt), float(t0), float(r_std) ** 2,
            prior, seg_lens, not calib_grad, bool(second_order), sched,
            m0_p, ps_b, ys.astype(dtype),
        )
        return dll.reshape(B), ll.reshape(B)

    if y_batched:
        y_arr = ys.astype(dtype).transpose(1, 2, 0).reshape(
            n_obs, d_obs, nb, _SUB, _LANE
        ).transpose(2, 0, 1, 3, 4)
    else:
        y_arr = ys.astype(dtype)

    if ek1:
        C_full = np.eye(d) if C_np is None else C_np
        R_chol = np.diag(np.sqrt(r2_vec))
        # nondiff custom-vjp args must be hashable: matrices as tuples
        C_key = tuple(tuple(float(v) for v in row) for row in C_full)
        R_key = tuple(tuple(float(v) for v in row) for row in R_chol)
        dll, ll = _ek1_datalik_vjp(
            prob_f, jac if jac is not None else _auto_jac(prob_f),
            q, float(dt), float(t0), prior, seg_lens, C_key, R_key,
            y_batched, not calib_grad, m0_p, ps_b, y_arr,
        )
        return dll.reshape(B), ll.reshape(B)

    # per-dim path (EK0 or DiagonalEK1): (scaled) one-hot obs rows only
    C_sel = np.eye(d) if C_np is None else C_np
    obs_dims, obs_scales = [], []
    for a in range(d_obs):
        nz = np.nonzero(C_sel[a])[0]
        if nz.size != 1:
            raise ValueError(
                "EK0/DiagonalEK1 partial observations require (scaled) "
                "one-hot obs_matrix rows (each row observes one state "
                "dimension); use ek1=True for dense observation operators"
            )
        obs_dims.append(int(nz[0]))
        obs_scales.append(float(C_sel[a, nz[0]]))
    jd_fn = None
    if diagonal_ek1:
        jd_fn = jac_diag if jac_diag is not None else _auto_jac_diag(prob_f)
    dll, ll = _ek0_datalik_pd_vjp(
        prob_f, q, float(dt), float(t0), prior, seg_lens,
        tuple(obs_dims), tuple(obs_scales), tuple(float(r) for r in r2_vec),
        y_batched, not calib_grad, jd_fn, m0_p, ps_b, y_arr,
    )
    return dll.reshape(B), ll.reshape(B)


# ==========================================================================
# Generalized data-likelihood kernels (VERDICT r2 item 3): the realistic
# inference observation models at fused-kernel speed.
#
#   * EK0 per-dim kernel: partial observations via a (scaled) one-hot
#     observation matrix, per-dimension observation noise, and per-member
#     observation sets. A one-hot row observes a single state dimension,
#     so conditioning forks the shared (Kronecker) nq x nq covariance into
#     d independent per-dimension nq x nq covariances — still exactly
#     block-diagonal over dims (the EK0 ODE update and the IWP transition
#     both preserve that structure), so the kernel stays pure-VPU lane
#     arithmetic with d x the covariance state of the isotropic kernel.
#     Sequential scalar conditioning on the rows of a diagonal-noise
#     observation equals the joint update exactly (standard Kalman chain
#     rule), including the accumulated log-likelihood.
#
#   * EK1 datalik kernel: the full D x D square-root EK1(dynamic) filter
#     with noisy data updates for an ARBITRARY static observation matrix
#     C (d_obs x d) and noise factor R — the joint d_obs-dim update in
#     square-root form: S = Z Z^T + R R^T with Z = C P0 L, and the
#     posterior factor re-orthonormalized by one in-kernel MGS QR of the
#     (D + d_obs) x D stack [L - K Z | K R]^T (Joseph square-root form,
#     exact for noisy updates where the plain L - K Z downdate is not).
#
# Semantics match `odefilters.datalik.filter_with_data` (same chain-rule
# marginal likelihood; datalik.py:127-214) — tested equal in interpret
# mode. Each model carries its own custom VJP (streamed states +
# segmented adjoint kernels below), so partial-obs inference sweeps get
# exact gradients at kernel speed too.
# ==========================================================================


def _ek0_pd_step_lists(
    m, C, p_block, t_new, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, d: int, nq: int,
    stop_calib: bool = False,
):
    """One EK0(dynamic) step with PER-DIMENSION covariances.

    ``m[i][j]``: mean lanes; ``C[j][i][l]``: dim j's nq x nq covariance.
    Identical math to `_ek0_step_lists` except every covariance op runs
    per dim (after a partial-obs data update the dims genuinely differ).
    Returns ``(m_new, C_new, ll_inc)``.
    """
    hq = pinv1 * pinv1 * Qt[1, 1]
    mp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [At[i, l] * m[l][j] for l in range(nq) if At[i, l] != 0.0],
            )
            for j in range(d)
        ]
        for i in range(nq)
    ]
    u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
    du = f(u_pred, p_block, t_new)
    z = [pinv1 * mp[1][j] - du[j] for j in range(d)]
    zz = functools.reduce(lambda a, b: a + b, [zj * zj for zj in z])
    s2 = zz / (d * hq)
    if stop_calib:
        # see _ek0_step_lists: the long-horizon f32 gradient estimator
        s2 = jax.lax.stop_gradient(s2)

    m_new = [[None] * d for _ in range(nq)]
    C_new = [None] * d
    ll_inc = None
    for j in range(d):
        Cj = C[j]
        tmp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, a] * Cj[a][b] for a in range(nq) if At[i, a] != 0.0],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        Cp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [tmp[i][b] * At[l, b] for b in range(nq) if At[l, b] != 0.0],
                )
                + Qt[i, l] * s2
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        s = pinv1 * pinv1 * Cp[1][1]
        inv_s = 1.0 / s
        kg = [pinv1 * Cp[i][1] * inv_s for i in range(nq)]
        for i in range(nq):
            m_new[i][j] = mp[i][j] - kg[i] * z[j]
        C_new[j] = [
            [Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)]
            for i in range(nq)
        ]
        inc = -0.5 * (
            z[j] * z[j] * inv_s
            + jnp.log(jnp.maximum(s, 1e-30)) + _LOG_2PI
        )
        ll_inc = inc if ll_inc is None else ll_inc + inc
    return m_new, C_new, ll_inc


def _ek1d_pd_step_lists(
    m, C, p_block, t_new, *,
    f: Callable, jac_diag: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, d: int, nq: int,
    stop_calib: bool = False, static_diff=None, calib=None,
):
    """One DiagonalEK1(dynamic) step with PER-DIMENSION covariances.

    Same contract as `_ek0_pd_step_lists`, but the measurement row sees
    the Jacobian diagonal: ``h_j = pinv1 e_1 - J_jj pinv0 e_0`` (diagonal
    linearization, Kraemer et al. ICML 2022; per-dim semantics of
    `ops/kron.py _kron_attempt_step_diag` / the dense DiagonalEK1 path).
    ``jac_diag(u, p, t) -> (d,...)`` — exact or JVP-derived.
    """
    mp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [At[i, l] * m[l][j] for l in range(nq) if At[i, l] != 0.0],
            )
            for j in range(d)
        ]
        for i in range(nq)
    ]
    u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
    du = f(u_pred, p_block, t_new)
    jd = jac_diag(u_pred, p_block, t_new)
    z = [pinv1 * mp[1][j] - du[j] for j in range(d)]

    # h_j M h_j^T for h_j = pinv1 e_1 - jd_j pinv0 e_0 (M symmetric)
    def h_quad(M, j):
        return (
            pinv1 * pinv1 * M[1][1]
            - 2.0 * jd[j] * (pinv0 * pinv1) * M[0][1]
            + jd[j] * jd[j] * (pinv0 * pinv0) * M[0][0]
        )

    Qtl = [[float(Qt[i, l]) for l in range(nq)] for i in range(nq)]
    if static_diff is not None:
        s2 = 1.0  # static models filter with the unscaled prior
    else:
        hq = [h_quad(Qtl, j) for j in range(d)]
        s2 = functools.reduce(
            lambda a, b: a + b, [z[j] * z[j] / hq[j] for j in range(d)]
        ) / d
        if stop_calib:
            s2 = jax.lax.stop_gradient(s2)

    m_new = [[None] * d for _ in range(nq)]
    C_new = [None] * d
    inv_s_list = [None] * d
    ll_inc = None
    for j in range(d):
        Cj = C[j]
        tmp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, a] * Cj[a][b] for a in range(nq) if At[i, a] != 0.0],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        Cp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [tmp[i][b] * At[l, b] for b in range(nq) if At[l, b] != 0.0],
                )
                + Qt[i, l] * s2
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        s = h_quad(Cp, j)
        inv_s = 1.0 / s
        inv_s_list[j] = inv_s
        kg = [
            (pinv1 * Cp[i][1] - jd[j] * pinv0 * Cp[i][0]) * inv_s
            for i in range(nq)
        ]
        for i in range(nq):
            m_new[i][j] = mp[i][j] - kg[i] * z[j]
        C_new[j] = [
            [Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)]
            for i in range(nq)
        ]
        inc = -0.5 * (
            z[j] * z[j] * inv_s
            + jnp.log(jnp.maximum(s, 1e-30)) + _LOG_2PI
        )
        ll_inc = inc if ll_inc is None else ll_inc + inc
    if static_diff is not None:
        calib_new = _static_local_update(
            static_diff, calib, None, z, inv_s_list, d
        )
        return m_new, C_new, ll_inc, calib_new
    return m_new, C_new, ll_inc


def _pd_step_fn(jac_diag, f, At, Qt, pinv0, pinv1, d, nq, stop_calib=False):
    """Select the per-dim ODE-step closure: EK0 (``jac_diag=None``) or
    DiagonalEK1 — shared by the pd datalik kernel and its VJP pair."""
    if jac_diag is None:
        return functools.partial(
            _ek0_pd_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0,
            pinv1=pinv1, d=d, nq=nq, stop_calib=stop_calib,
        )
    return functools.partial(
        _ek1d_pd_step_lists, f=f, jac_diag=jac_diag, At=At, Qt=Qt,
        pinv0=pinv0, pinv1=pinv1, d=d, nq=nq, stop_calib=stop_calib,
    )


def _ek0_pd_data_update(
    m, C, y_row, *, obs_dims, obs_scales, r2s, pinv0, nq,
):
    """Sequential scalar conditioning on one observation row.

    ``obs_dims[a]``: the state dim observed by row a; ``obs_scales[a]``:
    its (static) coefficient c in y_a = c u_jd + e; ``r2s[a]``: its noise
    variance. Exact joint update for diagonal noise. Returns
    ``(m, C, dll_inc)``; ``y_row[a]`` may be SMEM scalars or lane arrays.
    """
    dll = None
    for a, jd in enumerate(obs_dims):
        c = float(obs_scales[a])
        r2 = float(r2s[a])
        Cj = C[jd]
        z = y_row[a] - c * pinv0 * m[0][jd]
        s_d = c * c * pinv0 * pinv0 * Cj[0][0] + r2
        inv_sd = 1.0 / s_d
        kg = [c * pinv0 * Cj[i][0] * inv_sd for i in range(nq)]
        for i in range(nq):
            m[i][jd] = m[i][jd] + kg[i] * z
        C[jd] = [
            [Cj[i][l] - kg[i] * kg[l] * s_d for l in range(nq)]
            for i in range(nq)
        ]
        inc = -0.5 * (z * z * inv_sd + jnp.log(s_d) + _LOG_2PI)
        dll = inc if dll is None else dll + inc
    return m, C, dll


def _ek0_datalik_pd_kernel(
    m0_ref, p_ref, y_ref, dll_ref, ll_ref, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, seg_lens: tuple,
    obs_dims: tuple, obs_scales: tuple, r2s: tuple,
    dt: float, t0: float, d: int, nq: int, y_batched: bool,
    jac_diag: Optional[Callable] = None,
):
    """Statically segmented per-dim EK0 filter + partial-obs data updates.

    ``y_ref``: (n_obs, d_obs) SMEM scalars when observations are shared,
    or a (n_obs, d_obs, 8, 128) VMEM block when per-member
    (``y_batched``). Static segment bounds keep every observation access
    a static index (dynamic SMEM reads compile ~100x slower in Mosaic).
    ``jac_diag``: switches the ODE step to DiagonalEK1 (same per-dim
    structure — the data update is linearization-agnostic).
    """
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m[0][0])
    C = [
        [[zero for _ in range(nq)] for _ in range(nq)] for _ in range(d)
    ]
    p_block = p_ref[:]

    step = _pd_step_fn(jac_diag, f, At, Qt, pinv0, pinv1, d, nq)
    dupd = functools.partial(
        _ek0_pd_data_update, obs_dims=obs_dims, obs_scales=obs_scales,
        r2s=r2s, pinv0=pinv0, nq=nq,
    )

    def body(k, carry):
        m, C, ll = carry
        t_new = _step_time(k, t0, dt, zero.dtype)
        m_new, C_new, ll_inc = step(m, C, p_block, t_new)
        return m_new, C_new, ll + ll_inc

    ll = zero
    dll = zero
    k_base = 0
    d_obs = len(obs_dims)
    for si, L in enumerate(seg_lens):
        if L > 0:
            m, C, ll = jax.lax.fori_loop(
                jnp.int32(k_base), jnp.int32(k_base + L), body, (m, C, ll)
            )
        k_base += L
        if si < len(seg_lens) - 1:
            y_row = [y_ref[si, a] for a in range(d_obs)]
            m, C, dll_inc = dupd(m, C, y_row)
            dll = dll + dll_inc
    dll_ref[...] = dll
    ll_ref[...] = ll


@_no_x64
def _ek0_datalik_pd_blocked(
    f, q, dt, t0, prior, seg_lens, obs_dims, obs_scales, r2s, y_batched,
    m0_p, ps_b, y_arr, jac_diag=None,
):
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    n_obs = len(seg_lens) - 1
    d_obs = len(obs_dims)
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, _ = _ek0_consts(q, dt, fdtype, prior)
    kernel = functools.partial(
        _ek0_datalik_pd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0,
        pinv1=pinv1, seg_lens=tuple(seg_lens), obs_dims=tuple(obs_dims),
        obs_scales=tuple(obs_scales), r2s=tuple(r2s), dt=float(dt),
        t0=float(t0), d=d, nq=nq, y_batched=bool(y_batched),
        jac_diag=jac_diag,
    )

    def entry(m0_blk, p_blk, y_blk, dll_blk, ll_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            y_blk.at[jnp.int32(0)] if y_batched else y_blk,
            dll_blk.at[jnp.int32(0)], ll_blk.at[jnp.int32(0)],
        )

    if y_batched:
        y_spec = pl.BlockSpec(
            (1, n_obs, d_obs, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        y_spec = pl.BlockSpec(
            (n_obs, d_obs), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
    in_specs = [
        pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        y_spec,
    ]
    out_specs = [
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
        ],
    )(m0_p, ps_b, y_arr)


def _ek1_data_update_lists(
    m, L, y_row, *, C_obs: np.ndarray, R_chol: np.ndarray,
    pinv0: float, d: int, D: int,
):
    """Joint noisy data update in square-root form (dense covariance).

    ``C_obs``: static (d_obs, d) observation matrix acting on the position
    block; ``R_chol``: static (d_obs, d_obs) lower noise factor. Joseph
    square-root form: the posterior factor is one MGS QR of the
    (D + d_obs) x D stack [L - K Z | K R]^T — exact for noisy updates
    (the plain L - K Z downdate drops the K R R^T K^T term). Returns
    ``(m_new, L_new, dll_inc)``.
    """
    d_obs = C_obs.shape[0]
    RRT = R_chol @ R_chol.T
    zero = jnp.zeros_like(m[0])
    # residual and projected factor rows: Z = C P0 L (d_obs x D)
    z = []
    for a in range(d_obs):
        yhat = functools.reduce(
            lambda x, y: x + y,
            [C_obs[a, j] * (pinv0 * m[j]) for j in range(d)
             if C_obs[a, j] != 0.0],
            zero,
        )
        z.append(y_row[a] - yhat)
    Z = [
        [
            functools.reduce(
                lambda x, y: x + y,
                [C_obs[a, j] * (pinv0 * L[j][c]) for j in range(d)
                 if C_obs[a, j] != 0.0],
                zero,
            )
            for c in range(D)
        ]
        for a in range(d_obs)
    ]
    S = [
        [
            functools.reduce(
                lambda x, y: x + y, [Z[a][c] * Z[b][c] for c in range(D)]
            )
            + float(RRT[a, b])
            for b in range(d_obs)
        ]
        for a in range(d_obs)
    ]
    Ls = _list_chol(S, d_obs)
    w = _list_cho_solve(Ls, z, d_obs)
    zSz = functools.reduce(
        lambda x, y: x + y, [z[a] * w[a] for a in range(d_obs)]
    )
    logdet = functools.reduce(
        lambda x, y: x + y,
        [2.0 * jnp.log(jnp.maximum(Ls[a][a], 1e-30)) for a in range(d_obs)],
    )
    dll_inc = -0.5 * (zSz + logdet + d_obs * _LOG_2PI)
    LZt = [
        [
            functools.reduce(
                lambda x, y: x + y, [L[r][c] * Z[a][c] for c in range(D)]
            )
            for a in range(d_obs)
        ]
        for r in range(D)
    ]
    Kg = [_list_cho_solve(Ls, LZt[r], d_obs) for r in range(D)]
    m_new = [
        m[r]
        + functools.reduce(
            lambda x, y: x + y, [Kg[r][a] * z[a] for a in range(d_obs)]
        )
        for r in range(D)
    ]
    # Joseph sqrt: rows of [L - K Z | K R_chol]^T, re-orthonormalized
    rows = [
        [
            L[r][k]
            - functools.reduce(
                lambda x, y: x + y, [Kg[r][a] * Z[a][k] for a in range(d_obs)]
            )
            for r in range(D)
        ]
        for k in range(D)
    ] + [
        [
            functools.reduce(
                lambda x, y: x + y,
                [Kg[r][b] * float(R_chol[b, a]) for b in range(d_obs)
                 if R_chol[b, a] != 0.0],
                zero,
            )
            for r in range(D)
        ]
        for a in range(d_obs)
    ]
    L_new = _list_mgs_tril(rows, D + d_obs, D)
    return m_new, L_new, dll_inc


def _ek1_datalik_kernel(
    m0_ref, p_ref, y_ref, dll_ref, ll_ref, *,
    f, jac, At, QLt, pinv0, pinv1, seg_lens: tuple,
    C_obs: np.ndarray, R_chol: np.ndarray,
    dt: float, t0: float, d: int, nq: int, y_batched: bool,
):
    """Statically segmented EK1(dynamic) filter + noisy data updates.

    The EK1 data-likelihood analogue of `_ek0_datalik_kernel` for stiff
    inference problems and dense observation operators.
    """
    D = d * nq
    d_obs = C_obs.shape[0]
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))
    m = [m0_ref[i // d, i % d] for i in range(D)]
    zero = jnp.zeros_like(m[0])
    L = [[zero for _ in range(D)] for _ in range(D)]
    p_block = p_ref[:]

    dupd = functools.partial(
        _ek1_data_update_lists, C_obs=C_obs, R_chol=R_chol,
        pinv0=pinv0, d=d, D=D,
    )

    def body(k, carry):
        m, L, ll = carry
        t_new = _step_time(k, t0, dt, zero.dtype)
        m_new, L_new, _, ll_inc = _ek1_step_lists(
            m, L, p_block, t_new, f=f, jac=jac, Af=Af, QLf=QLf,
            pinv0=pinv0, pinv1=pinv1, d=d, D=D, want_ll=True,
        )
        return m_new, L_new, ll + ll_inc

    ll = zero
    dll = zero
    k_base = 0
    for si, Lseg in enumerate(seg_lens):
        if Lseg > 0:
            m, L, ll = jax.lax.fori_loop(
                jnp.int32(k_base), jnp.int32(k_base + Lseg), body, (m, L, ll)
            )
        k_base += Lseg
        if si < len(seg_lens) - 1:
            y_row = [y_ref[si, a] for a in range(d_obs)]
            m, L, dll_inc = dupd(m, L, y_row)
            dll = dll + dll_inc
    dll_ref[...] = dll
    ll_ref[...] = ll


@_no_x64
def _ek1_datalik_blocked(
    f, jac, q, dt, t0, prior, seg_lens, C_obs, R_chol, y_batched,
    m0_p, ps_b, y_arr,
):
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    n_obs = len(seg_lens) - 1
    d_obs = C_obs.shape[0]
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    At = At_np.astype(fdtype)
    QLt = QLt_np.astype(fdtype)
    pinv0, pinv1 = float(1.0 / p_np[0]), float(1.0 / p_np[1])
    kernel = functools.partial(
        _ek1_datalik_kernel, f=f, jac=jac, At=At, QLt=QLt, pinv0=pinv0,
        pinv1=pinv1, seg_lens=tuple(seg_lens),
        C_obs=np.asarray(C_obs, fdtype), R_chol=np.asarray(R_chol, fdtype),
        dt=float(dt), t0=float(t0), d=d, nq=nq, y_batched=bool(y_batched),
    )

    def entry(m0_blk, p_blk, y_blk, dll_blk, ll_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            y_blk.at[jnp.int32(0)] if y_batched else y_blk,
            dll_blk.at[jnp.int32(0)], ll_blk.at[jnp.int32(0)],
        )

    if y_batched:
        y_spec = pl.BlockSpec(
            (1, n_obs, d_obs, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        y_spec = pl.BlockSpec(
            (n_obs, d_obs), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
    in_specs = [
        pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        y_spec,
    ]
    out_specs = [
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
        ],
    )(m0_p, ps_b, y_arr)


def _pd_pack_and_send(row, st_ref, sem, k_idx, m, C, d, nq):
    """Double-buffered (m | per-dim C) state-row DMA for the pd grad
    kernels: row layout ``[m (d) | C_0 (nq) | ... | C_{d-1} (nq)]`` per
    derivative row i."""
    slot = jax.lax.rem(k_idx, jnp.int32(2))

    @pl.when(k_idx >= 2)
    def _():
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).wait()

    for i in range(nq):
        for j in range(d):
            row[slot, i, j] = m[i][j]
        for jd in range(d):
            for l in range(nq):
                row[slot, i, d + jd * nq + l] = C[jd][i][l]
    pltpu.make_async_copy(
        row.at[slot], st_ref.at[k_idx], sem.at[slot]
    ).start()


def _ek0_datalik_pd_grad_fwd_kernel(
    m0_ref, p_ref, y_ref, dll_ref, ll_ref, st_ref,
    row, sem, *,
    f, At, Qt, pinv0, pinv1, seg_lens, obs_dims, obs_scales, r2s,
    dt, t0, d, nq, stop_calib, jac_diag=None,
):
    """Per-dim datalik filter streaming the state at entry of every ODE
    step (post any data update) for the adjoint sweep — the pd analogue
    of `_ek0_datalik_grad_fwd_kernel`."""
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m[0][0])
    C = [
        [[zero for _ in range(nq)] for _ in range(nq)] for _ in range(d)
    ]
    p_block = p_ref[:]

    step = _pd_step_fn(
        jac_diag, f, At, Qt, pinv0, pinv1, d, nq, stop_calib=stop_calib
    )
    dupd = functools.partial(
        _ek0_pd_data_update, obs_dims=obs_dims, obs_scales=obs_scales,
        r2s=r2s, pinv0=pinv0, nq=nq,
    )

    # One UNIFORM fori_loop over all T steps (observation boundaries
    # via select/where inside the body): the per-segment form emitted
    # O(n_obs) copies of the step + DMA body and SIGSEGV'd the TPU AOT
    # compile helper beyond ~4 observations (program-size-dependent);
    # this form emits them once. Observation accesses stay
    # static-indexed (see _ek0_datalik_pd_kernel on dynamic SMEM reads).
    d_obs = len(obs_dims)
    offs = _seg_offsets(seg_lens)
    n_obs = len(seg_lens) - 1
    T = offs[-1]
    boundary_ks = [int(offs[si + 1] - 1) for si in range(n_obs)]
    y_all = [
        [y_ref[si, a] for a in range(d_obs)] for si in range(n_obs)
    ]

    def body(k, carry):
        m, C, ll, dll = carry
        _pd_pack_and_send(row, st_ref, sem, k, m, C, d, nq)
        t_new = _step_time(k, t0, dt, zero.dtype)
        m, C, ll_inc = step(m, C, p_block, t_new)
        ll = ll + ll_inc
        if n_obs:
            is_obs = functools.reduce(
                lambda a, b: a | b, [k == bk for bk in boundary_ks],
                jnp.zeros((), jnp.bool_),
            )
            y_row = list(y_all[0])
            for si in range(1, n_obs):
                sel = k == boundary_ks[si]
                y_row = [
                    jnp.where(sel, y_all[si][a], y_row[a])
                    for a in range(d_obs)
                ]
            # dupd mutates its inputs in place: hand it copies (row
            # copies for m, a top-level copy for C — it replaces C[jd]
            # wholesale) and select-merge the result
            mu, Cu, dll_inc = dupd([list(r) for r in m], list(C), y_row)
            m = [
                [jnp.where(is_obs, mu[i][j], m[i][j]) for j in range(d)]
                for i in range(nq)
            ]
            C = [
                [
                    [jnp.where(is_obs, Cu[jd][i][l], C[jd][i][l])
                     for l in range(nq)]
                    for i in range(nq)
                ]
                for jd in range(d)
            ]
            dll = dll + jnp.where(is_obs, dll_inc, zero)
        return m, C, ll, dll

    ll = zero
    dll = zero
    if T >= 1:
        m, C, ll, dll = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(T), body, (m, C, ll, dll)
        )
    dll_ref[...] = dll
    ll_ref[...] = ll
    if T >= 1:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 1) % 2)], st_ref.at[jnp.int32(T - 1)],
            sem.at[jnp.int32((T - 1) % 2)],
        ).wait()
    if T >= 2:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 2) % 2)], st_ref.at[jnp.int32(T - 2)],
            sem.at[jnp.int32((T - 2) % 2)],
        ).wait()


def _ek0_datalik_pd_grad_bwd_kernel(
    p_ref, y_ref, ddll_ref, dall_ref, st_ref,
    dm0_ref, dp_ref, dy_ref,
    row, sem, *,
    f, At, Qt, pinv0, pinv1, seg_lens, obs_dims, obs_scales, r2s,
    dt, t0, d, nq, stop_calib, jac_diag=None,
):
    """Adjoint of the per-dim datalik filter: reverse walk of the
    streamed states, in-kernel jax.vjp of the pd step (and of the step
    composed with the pd data update at segment boundaries)."""
    p_block = p_ref[:]
    ddll = ddll_ref[:]
    dall = dall_ref[:]
    zero = jnp.zeros_like(ddll)
    d_obs = len(obs_dims)

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        C = [
            [[row[slot, i, d + jd * nq + l] for l in range(nq)]
             for i in range(nq)]
            for jd in range(d)
        ]
        return m, C

    step = _pd_step_fn(
        jac_diag, f, At, Qt, pinv0, pinv1, d, nq, stop_calib=stop_calib
    )
    dupd = functools.partial(
        _ek0_pd_data_update, obs_dims=obs_dims, obs_scales=obs_scales,
        r2s=r2s, pinv0=pinv0, nq=nq,
    )

    dm = [[zero for _ in range(d)] for _ in range(nq)]
    dC = [
        [[zero for _ in range(nq)] for _ in range(nq)] for _ in range(d)
    ]
    dp = jnp.zeros_like(p_block)

    # One UNIFORM reverse fori_loop over all T steps, with the
    # observation boundaries handled by select/`pl.when` inside the
    # body. The segmented form (a composed step+update jax.vjp unrolled
    # per observation) emitted O(n_obs) copies of the step adjoint and
    # crashed the TPU AOT compile helper beyond ~4 observations
    # (SIGSEGV, program-size-dependent); this form emits the step
    # adjoint exactly once and the small data-update adjoint once.
    # Observation accesses stay static-indexed (static SMEM reads +
    # select chains — dynamic SMEM reads compile ~100x slower in
    # Mosaic, see _ek0_datalik_pd_kernel).
    offs = _seg_offsets(seg_lens)
    n_obs = len(seg_lens) - 1
    T = offs[-1]
    # state index of observation si (the step INTO which it folds)
    boundary_ks = [int(offs[si + 1] - 1) for si in range(n_obs)]
    y_all = [
        [y_ref[si, aa] for aa in range(d_obs)] for si in range(n_obs)
    ]

    def body(s, carry):
        dm, dC, dp = carry
        k = jnp.int32(T - 1) - s
        m_k, C_k = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.ones((), k.dtype))

        t_new = _step_time(k, t0, dt, zero.dtype)
        (m1, C1, _), vjp_step = jax.vjp(
            lambda m, C, p: step(m, C, p, t_new), m_k, C_k, p_block
        )

        # data-update adjoint, applied only at observation boundaries
        is_obs = functools.reduce(
            lambda a, b: a | b, [k == bk for bk in boundary_ks],
            jnp.zeros((), jnp.bool_),
        )
        y_row = list(y_all[0]) if n_obs else []
        for si in range(1, n_obs):
            sel = k == boundary_ks[si]
            y_row = [
                jnp.where(sel, y_all[si][aa], y_row[aa])
                for aa in range(d_obs)
            ]
        if n_obs:
            _, vjp_dupd = jax.vjp(
                lambda m, C, y: dupd(m, C, y), m1, C1, y_row
            )
            dmu, dCu, dy_row = vjp_dupd((dm, dC, ddll))
            for si in range(n_obs):
                @pl.when(k == boundary_ks[si])
                def _(si=si):
                    for aa in range(d_obs):
                        # shared-y case: y is an SMEM scalar, its vjp is
                        # already the lane sum (broadcast back into a
                        # lane block for the 128-lane-tiled output);
                        # per-member case: y is a lane block and this is
                        # the per-lane cotangent directly
                        dy_ref[si, aa] = dy_row[aa] + jnp.zeros_like(ddll)
            dm = [
                [jnp.where(is_obs, dmu[i][j], dm[i][j]) for j in range(d)]
                for i in range(nq)
            ]
            dC = [
                [
                    [jnp.where(is_obs, dCu[jd][i][l], dC[jd][i][l])
                     for l in range(nq)]
                    for i in range(nq)
                ]
                for jd in range(d)
            ]

        dm_k, dC_k, dp_k = vjp_step((dm, dC, dall))
        return dm_k, dC_k, dp + dp_k

    if T >= 1:
        start_load(jnp.int32(T - 1))
        dm, dC, dp = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(T), body, (dm, dC, dp)
        )

    for i in range(nq):
        for j in range(d):
            dm0_ref[i, j] = dm[i][j]
    dp_ref[...] = dp


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
)
@_no_x64
def _ek0_datalik_pd_vjp(
    f, q, dt, t0, prior, seg_lens, obs_dims, obs_scales, r2s, y_batched,
    stop_calib, jac_diag, m0_p, ps_b, y_arr,
):
    return _ek0_datalik_pd_blocked(
        f, q, dt, t0, prior, seg_lens, obs_dims, obs_scales, r2s,
        y_batched, m0_p, ps_b, y_arr, jac_diag=jac_diag,
    )


@_no_x64
def _ek0_datalik_pd_vjp_fwd(
    f, q, dt, t0, prior, seg_lens, obs_dims, obs_scales, r2s, y_batched,
    stop_calib, jac_diag, m0_p, ps_b, y_arr,
):
    nb, nq, d = m0_p.shape[:3]
    n_params = ps_b.shape[1]
    n_obs = len(seg_lens) - 1
    d_obs = len(obs_dims)
    T = int(sum(seg_lens))
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, _ = _ek0_consts(q, dt, fdtype, prior)
    kernel = functools.partial(
        _ek0_datalik_pd_grad_fwd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0,
        pinv1=pinv1, seg_lens=tuple(seg_lens), obs_dims=tuple(obs_dims),
        obs_scales=tuple(obs_scales), r2s=tuple(r2s), dt=float(dt),
        t0=float(t0), d=d, nq=nq, stop_calib=bool(stop_calib),
        jac_diag=jac_diag,
    )
    W = d + d * nq
    scratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(m0_blk, p_blk, y_blk, dll_blk, ll_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            y_blk.at[jnp.int32(0)] if y_batched else y_blk,
            dll_blk.at[jnp.int32(0)], ll_blk.at[jnp.int32(0)],
            st_hbm.at[b], row, sem,
        )

    if y_batched:
        y_spec = pl.BlockSpec(
            (1, n_obs, d_obs, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        y_spec = pl.BlockSpec(
            (n_obs, d_obs), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
    in_specs = [
        pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        y_spec,
    ]
    out_specs = [
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    dll, ll, st = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T, nq, W, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_p, ps_b, y_arr)
    return (dll, ll), (st, ps_b, y_arr)


@_no_x64
def _ek0_datalik_pd_vjp_bwd(
    f, q, dt, t0, prior, seg_lens, obs_dims, obs_scales, r2s, y_batched,
    stop_calib, jac_diag, res, cts,
):
    st, ps_b, y_arr = res
    ddll, dall = cts
    nb = st.shape[0]
    nq = st.shape[2]
    W = st.shape[3]
    d = W // (nq + 1)
    n_params = ps_b.shape[1]
    n_obs = len(seg_lens) - 1
    d_obs = len(obs_dims)
    dtype = ps_b.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, _ = _ek0_consts(q, dt, fdtype, prior)
    kernel = functools.partial(
        _ek0_datalik_pd_grad_bwd_kernel, f=f, At=At, Qt=Qt, pinv0=pinv0,
        pinv1=pinv1, seg_lens=tuple(seg_lens), obs_dims=tuple(obs_dims),
        obs_scales=tuple(obs_scales), r2s=tuple(r2s), dt=float(dt),
        t0=float(t0), d=d, nq=nq, stop_calib=bool(stop_calib),
        jac_diag=jac_diag,
    )
    scratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(p_blk, y_blk, ddll_blk, dall_blk, st_hbm,
              dm0_blk, dp_blk, dy_blk, row, sem):
        b = pl.program_id(0)
        kernel(
            p_blk.at[jnp.int32(0)],
            y_blk.at[jnp.int32(0)] if y_batched else y_blk,
            ddll_blk.at[jnp.int32(0)], dall_blk.at[jnp.int32(0)],
            st_hbm.at[b],
            dm0_blk.at[jnp.int32(0)], dp_blk.at[jnp.int32(0)],
            dy_blk.at[jnp.int32(0)],
            row, sem,
        )

    if y_batched:
        y_spec = pl.BlockSpec(
            (1, n_obs, d_obs, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        y_spec = pl.BlockSpec(
            (n_obs, d_obs), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
    dm0, dps, dy_blocks = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            y_spec,
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_obs, d_obs, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nq, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_params, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_obs, d_obs, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(ps_b, y_arr, ddll, dall, st)
    if y_batched:
        dy = dy_blocks
    else:
        # y SHARED by all members: one lane-summed partial per block
        dy = jnp.sum(dy_blocks[..., 0, 0], axis=0).astype(y_arr.dtype)
    return dm0, dps, dy


_ek0_datalik_pd_vjp.defvjp(_ek0_datalik_pd_vjp_fwd, _ek0_datalik_pd_vjp_bwd)


def _ek1_pack_and_send(row, st_ref, sem, k_idx, m, L, D):
    """Double-buffered (L | m) state-row DMA for the EK1 datalik grad
    kernels: row r = [ L[r][0..D-1] | m[r] ]."""
    slot = jax.lax.rem(k_idx, jnp.int32(2))

    @pl.when(k_idx >= 2)
    def _():
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).wait()

    for r in range(D):
        for c in range(D):
            row[slot, r, c] = L[r][c]
        row[slot, r, D] = m[r]
    pltpu.make_async_copy(
        row.at[slot], st_ref.at[k_idx], sem.at[slot]
    ).start()


def _ek1_datalik_grad_fwd_kernel(
    m0_ref, p_ref, y_ref, dll_ref, ll_ref, st_ref,
    row, sem, *,
    f, jac, At, QLt, pinv0, pinv1, seg_lens, C_obs, R_chol,
    dt, t0, d, nq, stop_calib,
):
    """EK1 datalik filter streaming (m, L) at entry of every ODE step."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))
    d_obs = C_obs.shape[0]
    m = [m0_ref[i // d, i % d] for i in range(D)]
    zero = jnp.zeros_like(m[0])
    L = [[zero for _ in range(D)] for _ in range(D)]
    p_block = p_ref[:]

    dupd = functools.partial(
        _ek1_data_update_lists, C_obs=C_obs, R_chol=R_chol,
        pinv0=pinv0, d=d, D=D,
    )

    def body(k, carry):
        m, L, ll = carry
        _ek1_pack_and_send(row, st_ref, sem, k, m, L, D)
        t_new = _step_time(k, t0, dt, zero.dtype)
        m_new, L_new, _, ll_inc = _ek1_step_lists(
            m, L, p_block, t_new, f=f, jac=jac, Af=Af, QLf=QLf,
            pinv0=pinv0, pinv1=pinv1, d=d, D=D, want_ll=True,
            stop_calib=stop_calib,
        )
        return m_new, L_new, ll + ll_inc

    ll = zero
    dll = zero
    k_base = 0
    for si, Lseg in enumerate(seg_lens):
        if Lseg > 0:
            m, L, ll = jax.lax.fori_loop(
                jnp.int32(k_base), jnp.int32(k_base + Lseg), body, (m, L, ll)
            )
        k_base += Lseg
        if si < len(seg_lens) - 1:
            y_row = [y_ref[si, a] for a in range(d_obs)]
            m, L, dll_inc = dupd(m, L, y_row)
            dll = dll + dll_inc
    dll_ref[...] = dll
    ll_ref[...] = ll
    T = sum(seg_lens)
    if T >= 1:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 1) % 2)], st_ref.at[jnp.int32(T - 1)],
            sem.at[jnp.int32((T - 1) % 2)],
        ).wait()
    if T >= 2:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 2) % 2)], st_ref.at[jnp.int32(T - 2)],
            sem.at[jnp.int32((T - 2) % 2)],
        ).wait()


def _ek1_datalik_grad_bwd_kernel(
    p_ref, y_ref, ddll_ref, dall_ref, st_ref,
    dm0_ref, dp_ref, dy_ref,
    row, sem, *,
    f, jac, At, QLt, pinv0, pinv1, seg_lens, C_obs, R_chol,
    dt, t0, d, nq, stop_calib,
):
    """Adjoint of the EK1 datalik filter (reverse streamed-state walk,
    in-kernel jax.vjp of the square-root EK1 step incl. its MGS QRs)."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))
    d_obs = C_obs.shape[0]
    p_block = p_ref[:]
    ddll = ddll_ref[:]
    dall = dall_ref[:]
    zero = jnp.zeros_like(ddll)

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [row[slot, r, D] for r in range(D)]
        L = [[row[slot, r, c] for c in range(D)] for r in range(D)]
        return m, L

    def stepr(m, L, p, t_new):
        m1, L1, _, ll_inc = _ek1_step_lists(
            m, L, p, t_new, f=f, jac=jac, Af=Af, QLf=QLf,
            pinv0=pinv0, pinv1=pinv1, d=d, D=D, want_ll=True,
            stop_calib=stop_calib,
        )
        return m1, L1, ll_inc

    dupd = functools.partial(
        _ek1_data_update_lists, C_obs=C_obs, R_chol=R_chol,
        pinv0=pinv0, d=d, D=D,
    )

    dm = [zero for _ in range(D)]
    dL = [[zero for _ in range(D)] for _ in range(D)]
    dp = jnp.zeros_like(p_block)

    def plain_body(s, carry, a, b):
        del a
        dm, dL, dp = carry
        k = jnp.asarray(b - 1, jnp.int32) - s
        m_k, L_k = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.ones((), k.dtype))

        t_new = _step_time(k, t0, dt, zero.dtype)
        _, vjp_fn = jax.vjp(
            lambda m, L, p: stepr(m, L, p, t_new), m_k, L_k, p_block
        )
        dm_k, dL_k, dp_k = vjp_fn((dm, dL, dall))
        return dm_k, dL_k, dp + dp_k

    offs = _seg_offsets(seg_lens)
    n_obs = len(seg_lens) - 1
    T = offs[-1]
    if T >= 1:
        start_load(jnp.int32(T - 1))
    for si in range(len(seg_lens) - 1, -1, -1):
        a, b = offs[si], offs[si + 1]
        if si < n_obs:
            y_row = [y_ref[si, aa] for aa in range(d_obs)]
            m_k, L_k = wait_and_read(jnp.int32(b - 1))
            if b - 1 >= 1:
                start_load(jnp.int32(b - 2))
            t_new = _step_time(jnp.int32(b - 1), t0, dt, zero.dtype)

            def comp(m, L, p, y):
                m1, L1, ll_inc = stepr(m, L, p, t_new)
                m2, L2, dll_inc = dupd(m1, L1, y)
                return m2, L2, ll_inc, dll_inc

            _, vjp_fn = jax.vjp(comp, m_k, L_k, p_block, y_row)
            dm, dL, dp_k, dy_row = vjp_fn((dm, dL, dall, ddll))
            dp = dp + dp_k
            for aa in range(d_obs):
                dy_ref[si, aa] = dy_row[aa] + jnp.zeros_like(ddll)
            b = b - 1
        if b > a:
            dm, dL, dp = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(b - a),
                functools.partial(plain_body, a=a, b=b), (dm, dL, dp),
            )

    for i in range(nq):
        for j in range(d):
            dm0_ref[i, j] = dm[i * d + j]
    dp_ref[...] = dp


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
)
@_no_x64
def _ek1_datalik_vjp(
    f, jac, q, dt, t0, prior, seg_lens, C_key, R_key, y_batched,
    stop_calib, m0_p, ps_b, y_arr,
):
    return _ek1_datalik_blocked(
        f, jac, q, dt, t0, prior, seg_lens,
        np.asarray(C_key), np.asarray(R_key), y_batched,
        m0_p, ps_b, y_arr,
    )


@_no_x64
def _ek1_datalik_vjp_fwd(
    f, jac, q, dt, t0, prior, seg_lens, C_key, R_key, y_batched,
    stop_calib, m0_p, ps_b, y_arr,
):
    nb, nq, d = m0_p.shape[:3]
    D = d * nq
    n_params = ps_b.shape[1]
    n_obs = len(seg_lens) - 1
    C_obs = np.asarray(C_key)
    R_chol = np.asarray(R_key)
    d_obs = C_obs.shape[0]
    T = int(sum(seg_lens))
    dtype = m0_p.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    kernel = functools.partial(
        _ek1_datalik_grad_fwd_kernel, f=f, jac=jac,
        At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        pinv0=float(1.0 / p_np[0]), pinv1=float(1.0 / p_np[1]),
        seg_lens=tuple(seg_lens), C_obs=C_obs.astype(fdtype),
        R_chol=R_chol.astype(fdtype), dt=float(dt), t0=float(t0),
        d=d, nq=nq, stop_calib=bool(stop_calib),
    )
    W = D + 1
    scratch = [
        pltpu.VMEM((2, D, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(m0_blk, p_blk, y_blk, dll_blk, ll_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            y_blk.at[jnp.int32(0)] if y_batched else y_blk,
            dll_blk.at[jnp.int32(0)], ll_blk.at[jnp.int32(0)],
            st_hbm.at[b], row, sem,
        )

    if y_batched:
        y_spec = pl.BlockSpec(
            (1, n_obs, d_obs, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        y_spec = pl.BlockSpec(
            (n_obs, d_obs), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
    dll, ll, st = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            y_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T, D, W, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_p, ps_b, y_arr)
    return (dll, ll), (st, ps_b, y_arr)


@_no_x64
def _ek1_datalik_vjp_bwd(
    f, jac, q, dt, t0, prior, seg_lens, C_key, R_key, y_batched,
    stop_calib, res, cts,
):
    st, ps_b, y_arr = res
    ddll, dall = cts
    nb = st.shape[0]
    D = st.shape[2]
    nq = q + 1
    d = D // nq
    n_params = ps_b.shape[1]
    n_obs = len(seg_lens) - 1
    C_obs = np.asarray(C_key)
    R_chol = np.asarray(R_key)
    d_obs = C_obs.shape[0]
    dtype = ps_b.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    kernel = functools.partial(
        _ek1_datalik_grad_bwd_kernel, f=f, jac=jac,
        At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        pinv0=float(1.0 / p_np[0]), pinv1=float(1.0 / p_np[1]),
        seg_lens=tuple(seg_lens), C_obs=C_obs.astype(fdtype),
        R_chol=R_chol.astype(fdtype), dt=float(dt), t0=float(t0),
        d=d, nq=nq, stop_calib=bool(stop_calib),
    )
    scratch = [
        pltpu.VMEM((2, D, D + 1, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def entry(p_blk, y_blk, ddll_blk, dall_blk, st_hbm,
              dm0_blk, dp_blk, dy_blk, row, sem):
        b = pl.program_id(0)
        kernel(
            p_blk.at[jnp.int32(0)],
            y_blk.at[jnp.int32(0)] if y_batched else y_blk,
            ddll_blk.at[jnp.int32(0)], dall_blk.at[jnp.int32(0)],
            st_hbm.at[b],
            dm0_blk.at[jnp.int32(0)], dp_blk.at[jnp.int32(0)],
            dy_blk.at[jnp.int32(0)],
            row, sem,
        )

    if y_batched:
        y_spec = pl.BlockSpec(
            (1, n_obs, d_obs, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        y_spec = pl.BlockSpec(
            (n_obs, d_obs), lambda b: (0, 0), memory_space=pltpu.SMEM
        )
    dm0, dps, dy_blocks = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            y_spec,
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_params, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_obs, d_obs, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nq, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_params, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, n_obs, d_obs, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(ps_b, y_arr, ddll, dall, st)
    if y_batched:
        dy = dy_blocks
    else:
        dy = jnp.sum(dy_blocks[..., 0, 0], axis=0).astype(y_arr.dtype)
    return dm0, dps, dy


_ek1_datalik_vjp.defvjp(_ek1_datalik_vjp_fwd, _ek1_datalik_vjp_bwd)


# ==========================================================================
# Filter + smoother kernel pair: the complete probabilistic solve fused.
#
# The forward kernel streams the full (preconditioned) filter state of each
# step to HBM via explicit DMA; the backward kernel streams it back in and
# runs the RTS recursion with an unrolled per-lane Cholesky solve. On a
# uniform grid both passes stay in preconditioned coordinates end to end
# (the reference re-scales per step, `perform_step.jl:36-38,72-75`).
# ==========================================================================


def _list_chol(C, nq):
    """Unrolled Cholesky of a symmetric list-of-lists of lane vectors."""
    L = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for j in range(i + 1):
            s = C[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                # 1e-30 is a *normal* f32 (1e-38 flushes to zero on TPU)
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    return L


def _list_cho_solve(L, b, nq):
    """Solve (L L^T) x = b for one rhs list of lane vectors."""
    y = [None] * nq
    for i in range(nq):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * nq
    for i in range(nq - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, nq):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _list_chol_inv(C, nq):
    """Unrolled Cholesky returning ``(L, inv_diag)``: one rsqrt per pivot
    and multiplicative inverses throughout — VPU divide/sqrt throughput is
    the pair backward's hot resource (the sqrt+divide `_list_chol` stays
    for the paths whose tests pin exact bit patterns)."""
    L = [[None] * nq for _ in range(nq)]
    invd = [None] * nq
    for i in range(nq):
        for j in range(i + 1):
            s = C[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                inv = jax.lax.rsqrt(jnp.maximum(s, 1e-30))
                invd[i] = inv
                L[i][j] = s * inv           # == sqrt(s) up to rounding
            else:
                L[i][j] = s * invd[j]
    return L, invd


def _list_cho_solve_inv(L, invd, b, nq):
    """`_list_cho_solve` with the pivot reciprocals precomputed by
    `_list_chol_inv` — 2 nq multiplications instead of divisions per
    solve."""
    y = [None] * nq
    for i in range(nq):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * invd[i]
    x = [None] * nq
    for i in range(nq - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, nq):
            s = s - L[k][i] * x[k]
        x[i] = s * invd[i]
    return x


def _list_cholesky_rs(Cm, nq, zero_row=None):
    """`_list_cholesky` (structural zero row/column) with rsqrt pivots,
    multiplicative inverses, and NUMERICALLY-dependent rows zeroed: a
    pivot below ``eps_rel`` of its own diagonal (the previous columns
    explain the row to f32 roundoff — or the f32 committed covariance is
    slightly indefinite there, observed on perturbed FHN lanes at
    collapsed-diffusion steps) would otherwise put 1/sqrt(roundoff)
    junk in the factor row; such a row carries ~zero residual variance
    and is zeroed instead. Bit-level different from the sqrt+divide
    `_list_cholesky`, so the adaptive kernels keep that one — their
    equivalence tests pin exact accept sequences."""
    eps_rel = 1e-7
    L = [[0.0] * nq for _ in range(nq)]
    for i in range(nq):
        if i == zero_row:
            continue
        s = Cm[i][i]
        for k in range(i):
            s = s - _smul(L[i][k], L[i][k])
        thresh = eps_rel * Cm[i][i] + 1e-35
        inv = jnp.where(
            s > thresh, jax.lax.rsqrt(jnp.maximum(s, 1e-30)),
            jnp.zeros_like(s),
        )
        L[i][i] = s * inv
        for l in range(i + 1, nq):
            if l == zero_row:
                continue
            v = Cm[l][i]
            for k in range(i):
                v = v - _smul(L[l][k], L[i][k])
            L[l][i] = _smul(v, inv)
    return L


def _matmul_lists(A, B, nq):
    """C = A @ B for list-of-lists of lane vectors (or float constants)."""
    return [
        [
            functools.reduce(
                lambda a, b: a + b, [A[i][k] * B[k][j] for k in range(nq)]
            )
            for j in range(nq)
        ]
        for i in range(nq)
    ]



def _is0(x):
    """Static (trace-time) zero: a Python float 0.0 entry in a list block."""
    return isinstance(x, (int, float)) and x == 0.0


def _smul(a, b):
    if _is0(a) or _is0(b):
        return 0.0
    if isinstance(a, float) and a == 1.0:
        return b          # unit static factors are free (At diagonals)
    if isinstance(b, float) and b == 1.0:
        return a
    return a * b


def _sreduce(terms):
    live = [t for t in terms if not _is0(t)]
    if not live:
        return 0.0
    return functools.reduce(lambda a, b: a + b, live)


def _list_mgs_tril(rows, K, nq, rsqrt=False):
    """Lower-triangular factor of M^T M via modified Gram-Schmidt.

    ``rows`` is a K x nq list-of-lists of lane vectors representing M;
    returns L (nq x nq lists) with L L^T = M^T M. Fully unrolled
    straight-line VPU code; zero columns are guarded (exact zero factors
    occur at the exactly-initialized first step).

    Entries that are the Python float ``0.0`` are STATIC zeros: every
    multiply/add touching them is skipped at trace time, and — because a
    zero pivot entry gives a zero qcol entry — rows that start zero in
    the leading columns are never fill-in'd until their own column
    arrives. Callers stacking a triangular noise block (the filter's
    [A L | s QL] stack) get ~20% fewer VPU ops by passing 0.0 instead of
    a zero lane vector for the structural zeros.
    """
    v = [[rows[k][j] for j in range(nq)] for k in range(K)]
    R = [[None] * nq for _ in range(nq)]
    qcol = [None] * K
    for j in range(nq):
        ss = _sreduce([_smul(v[k][j], v[k][j]) for k in range(K)])
        if _is0(ss):  # statically zero column: zero factor row
            if rsqrt:
                # rsqrt mode spends no sqrt/divide on the structural
                # zero (the pair backward's collapsed column)
                for l in range(j, nq):
                    R[j][l] = 0.0
                continue
            ss = jnp.zeros_like(next(x for r_ in rows for x in r_
                                     if not _is0(x)))
        if rsqrt:
            inv = jax.lax.rsqrt(jnp.maximum(ss, 1e-30))
            R[j][j] = ss * inv
        else:
            R[j][j] = jnp.sqrt(jnp.maximum(ss, 1e-30))
            inv = 1.0 / R[j][j]
        for k in range(K):
            qcol[k] = _smul(v[k][j], inv)
        for l in range(j + 1, nq):
            r = _sreduce([_smul(qcol[k], v[k][l]) for k in range(K)])
            R[j][l] = r
            if _is0(r):
                continue
            for k in range(K):
                if not _is0(qcol[k]):
                    v[k][l] = (
                        -r * qcol[k] if _is0(v[k][l])
                        else v[k][l] - r * qcol[k]
                    )
    # L = R^T (lower triangular)
    zero = jnp.zeros_like(next(x for r_ in rows for x in r_ if not _is0(x)))

    def as_lane(x):
        return zero if _is0(x) else x

    return [
        [as_lane(R[l][i]) if l <= i else zero for l in range(nq)]
        for i in range(nq)
    ]




def _pack_mc_and_send(row, st_ref, sem, k_idx, m, C, d, nq):
    """Double-buffered (m | C) state-row DMA used by both streamed-state
    gradient forward kernels: wait for the copy issued two rows earlier on
    this slot, fill it, start the async store."""
    slot = jax.lax.rem(k_idx, jnp.int32(2))

    @pl.when(k_idx >= 2)
    def _():
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).wait()

    for i in range(nq):
        for j in range(d):
            row[slot, i, j] = m[i][j]
        for l in range(nq):
            row[slot, i, d + l] = C[i][l]
    pltpu.make_async_copy(
        row.at[slot], st_ref.at[k_idx], sem.at[slot]
    ).start()


def _t_rows(X, nq):
    """Transpose a list-of-lists block (rows <-> columns)."""
    return [[X[i][b] for i in range(nq)] for b in range(nq)]


def _ek0_filter_states_kernel(
    m0_ref, p_ref, st_ref,
    row, sem, sig_ref=None,
    *, f, At, Qt, pinv0, pinv1, T, dt, t0, d, nq,
    so: bool = False, pinv_b: float = 0.0, static_diff=None,
):
    """Forward EK0 filter; streams one packed (mean | factor | s2) row of
    preconditioned square-root state to HBM per step (single DMA). The
    stream is the kernel's ONLY output — filtered means/stds fall out of
    the smoother pass for free, so no (T+1)-sized VMEM output blocks.

    ``static_diff``: a static diffusion model name — the filter then
    streams s2 = 1 rows (unscaled prior; the smoother's uniform-scale
    invariance lets the caller rescale its outputs at exit) and
    accumulates the running per-member sigma^2 into ``sig_ref`` (d rows).

    Streaming the predicted factor Lp alongside (so the smoother skips
    its 2(q+1) x (q+1) re-factorization) was measured a NET LOSS here
    (6.10 -> 6.76 ms on the 8192-member FHN solve): the tril adds
    nq(nq+1)/2 packed lanes per step to an issue-bound filter and +nq
    stream columns to both DMAs, which outweighs the skipped small QR.
    The EK1 pair, whose skipped QR is 2D x D, DOES stream Lp — see
    `_ek1_filter_states_kernel`."""
    bx = 2 if so else 1             # measured derivative block
    pb = pinv_b if so else pinv1    # its preconditioner entry
    # Qt here is the noise *factor* QLt: Q[b,b] = sum of squares of row b
    hq = pb * pb * float((Qt[bx] ** 2).sum())

    m_init = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m_init[0][0])
    L_init = [[zero for _ in range(nq)] for _ in range(nq)]
    p_block = p_ref[:]

    # Double-buffered streaming: two packed rows in flight; before reusing
    # a slot, wait for the copy issued two rows earlier on that slot.
    # Row layout (nq, W): [ mean (d) | L (nq) | s2 (1) ].
    def pack_and_send(k_idx, m, L, s2):
        slot = jax.lax.rem(k_idx, jnp.int32(2))

        @pl.when(k_idx >= 2)
        def _():
            pltpu.make_async_copy(
                row.at[slot], st_ref.at[k_idx], sem.at[slot]
            ).wait()

        for i in range(nq):
            for j in range(d):
                row[slot, i, j] = m[i][j]
            for l in range(nq):
                row[slot, i, d + l] = L[i][l]
        row[slot, 0, d + nq] = s2
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).start()

    pack_and_send(jnp.int32(0), m_init, L_init, zero + 1.0)

    sqlt = jnp.sqrt
    QLt_c = Qt

    if static_diff == "fixedMV":
        calib0 = ([zero for _ in range(d)], zero)
    else:
        calib0 = (zero, zero)

    def body(k, carry):
        m, L, calib = carry
        mp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, l] * m[l][j] for l in range(nq) if At[i, l] != 0.0],
                )
                for j in range(d)
            ]
            for i in range(nq)
        ]
        _dt = zero.dtype
        k1 = k + jnp.ones((), k.dtype)
        t_new = jnp.asarray(t0, _dt) + jnp.asarray(dt, _dt) * (
            k.astype(_dt) + jnp.asarray(1.0, _dt)
        )
        u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
        if so:  # z = E2 x - f(du, u): the 2nd-order measurement (step.py)
            du_pred = jnp.stack([pinv1 * mp[1][j] for j in range(d)])
            du = f(du_pred, u_pred, p_block, t_new)
        else:
            du = f(u_pred, p_block, t_new)
        z = [pb * mp[bx][j] - du[j] for j in range(d)]
        zz = functools.reduce(lambda a, b: a + b, [zj * zj for zj in z])
        if static_diff is not None:
            s2 = zero + 1.0
        else:
            s2 = zz / (d * hq)
        sq_s2 = sqlt(s2)
        AtL = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, a] * L[a][b] for a in range(nq) if At[i, a] != 0.0],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        qT = [
            [sq_s2 * QLt_c[i, a] if QLt_c[i, a] != 0.0 else 0.0
             for i in range(nq)]
            for a in range(nq)
        ]
        Lp = _list_mgs_tril(_t_rows(AtL, nq) + qT, 2 * nq, nq)
        s = pb * pb * functools.reduce(
            lambda a, b: a + b, [Lp[bx][l] * Lp[bx][l] for l in range(nq)]
        )
        inv_s = 1.0 / s
        c_col = [
            functools.reduce(
                lambda a, b: a + b, [Lp[i][l] * Lp[bx][l] for l in range(nq)]
            )
            for i in range(nq)
        ]
        kg = [pb * c_col[i] * inv_s for i in range(nq)]
        m_new = [[mp[i][j] - kg[i] * z[j] for j in range(d)] for i in range(nq)]
        Zrow = [pb * Lp[bx][l] for l in range(nq)]
        L_new = [
            [Lp[i][l] - kg[i] * Zrow[l] for l in range(nq)] for i in range(nq)
        ]
        if static_diff is not None:
            calib = _static_local_update(static_diff, calib, zz, z, inv_s, d)
        pack_and_send(k1, m_new, L_new, s2)
        return m_new, L_new, calib

    out_c = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m_init, L_init, calib0)
    )
    if static_diff is not None:
        sig = out_c[2][0]
        for j in range(d):
            sig_ref[j] = sig[j] if static_diff == "fixedMV" else sig
    # drain the last (up to two) in-flight copies
    pltpu.make_async_copy(
        row.at[jnp.int32(T % 2)], st_ref.at[jnp.int32(T)], sem.at[jnp.int32(T % 2)]
    ).wait()
    if T >= 1:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 1) % 2)], st_ref.at[jnp.int32(T - 1)],
            sem.at[jnp.int32((T - 1) % 2)],
        ).wait()


def _pair_layout(nq, d, bx):
    """Packed-row layout of the pair's plain-covariance state stream: per
    step ``[ mean (nq*d) | active covariance upper triangle | s2 ]``.

    The COMMITTED EK0 covariance's measured row/column ``bx`` is exactly
    zero after the R = 0 update (see `_ek0_step_lists` collapsed path), so
    only the (nq-1)nq/2 active-triangle entries are streamed — 15 instead
    of 32 (8, 128) registers per step at the headline (d=2, q=3) config,
    ~2x less HBM traffic than the round-4 (mean | factor | s2) rows."""
    triu = [(i, l) for i in range(nq) if i != bx
            for l in range(i, nq) if l != bx]
    return triu, nq * d + len(triu) + 1


def _ek0_pair_fwd_kernel(
    m0_ref, p_ref, st_refs, row, sem, sig_ref=None,
    *, f, At, Qt, pinv0, pinv1, T, dt, t0, d, nq,
    so: bool = False, pinv_b: float = 0.0, static_diff=None, U: int = 1,
):
    """Forward filter of the fused filter+smoother pair: the collapsed
    plain-covariance recursion of the fast filter kernel (the same
    `_ek0_step_lists` body as `_ek0_kernel`, so the two stay equal by
    construction) over ``U`` interleaved 1024-member chains, streaming one
    packed (mean | active-cov-triangle | s2) row per chain per step to HBM
    (double-buffered DMA per chain).

    vs the round-4 forward (`_ek0_filter_states_kernel`, kept for the
    sampler kernels): no in-kernel MGS re-factorization (~2x fewer
    covariance FLOPs via the collapsed symmetric algebra), no ll/us/std
    epilogue work (the smoother recomputes the solution outputs for
    free), a ~2x smaller streamed row, and U-way chain interleaving to
    fill the serial recursion's latency slots."""
    bx = 2 if so else 1
    triu, V = _pair_layout(nq, d, bx)

    def pack_and_send(u, k_idx, m, C, s2):
        slot = jax.lax.rem(k_idx, jnp.int32(2))

        @pl.when(k_idx >= 2)
        def _():
            pltpu.make_async_copy(
                row.at[u, slot], st_refs[u].at[k_idx], sem.at[u, slot]
            ).wait()

        idx = 0
        for i in range(nq):
            for j in range(d):
                row[u, slot, idx] = m[i][j]
                idx += 1
        for (i, l) in triu:
            row[u, slot, idx] = C[i][l]
            idx += 1
        row[u, slot, idx] = s2
        pltpu.make_async_copy(
            row.at[u, slot], st_refs[u].at[k_idx], sem.at[u, slot]
        ).start()

    ms, Cs, calibs, pbs = [], [], [], []
    zero = None
    for u in range(U):
        m_init = [[m0_ref[u, i, j] for j in range(d)] for i in range(nq)]
        zero = jnp.zeros_like(m_init[0][0])
        Cs.append([[zero for _ in range(nq)] for _ in range(nq)])
        ms.append(m_init)
        if static_diff == "fixedMV":
            calibs.append(([zero for _ in range(d)], zero))
        else:
            calibs.append((zero, zero))
        pbs.append(p_ref[u])
        pack_and_send(u, jnp.int32(0), m_init, Cs[u], zero + 1.0)

    step = functools.partial(
        _ek0_step_lists, f=f, At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1,
        d=d, nq=nq, so=so, pinv_b=pinv_b, static_diff=static_diff,
        collapsed=True, want_outputs=False,
    )

    def body(k, carry):
        ms, Cs, calibs = carry
        k1 = k + jnp.ones((), k.dtype)
        t_new = _step_time(k, t0, dt, zero.dtype)
        ms2, Cs2, calibs2 = [], [], []
        for u in range(U):
            if static_diff is not None:
                m_new, C_new, s2, cal = step(
                    ms[u], Cs[u], pbs[u], t_new, calib=calibs[u]
                )
                s2 = zero + 1.0   # stream the unscaled-prior diffusion
            else:
                m_new, C_new, s2 = step(ms[u], Cs[u], pbs[u], t_new)
                cal = calibs[u]
            pack_and_send(u, k1, m_new, C_new, s2)
            ms2.append(m_new)
            Cs2.append(C_new)
            calibs2.append(cal)
        return ms2, Cs2, calibs2

    out_c = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (ms, Cs, calibs)
    )
    if static_diff is not None:
        for u in range(U):
            sig = out_c[2][u][0]
            for j in range(d):
                sig_ref[u, j] = sig[j] if static_diff == "fixedMV" else sig
    for u in range(U):   # drain the last (up to two) in-flight copies
        pltpu.make_async_copy(
            row.at[u, jnp.int32(T % 2)], st_refs[u].at[jnp.int32(T)],
            sem.at[u, jnp.int32(T % 2)],
        ).wait()
        if T >= 1:
            pltpu.make_async_copy(
                row.at[u, jnp.int32((T - 1) % 2)],
                st_refs[u].at[jnp.int32(T - 1)],
                sem.at[u, jnp.int32((T - 1) % 2)],
            ).wait()


def _ek0_pair_bwd_step_lists(
    m_f, C_f, m_s, Ls, s2, *,
    At_st, QL_st, Q_st, nq: int, d: int, bx: int, jitter: float = 0.0,
):
    """One backward RTS step of the fused pair on list-of-lanes state —
    the pure math between the kernel's DMA read and its output emit,
    extracted so the roofline counts ITS jaxpr. All structural zeros
    (row/col ``bx`` of C_f, G, b1, GQ, b3, Ls) are Python-float 0.0 at
    trace time. Returns ``(m_new, Ls_new)``."""
    sq_s2 = jnp.sqrt(s2)
    L_f = _list_cholesky_rs(C_f, nq, zero_row=bx)
    # tmp = At C_f (column bx statically zero); the smoother's
    # cross term M = C_f At^T is tmp transposed — free
    tmp = [
        [
            _sreduce([_smul(At_st[i][a], C_f[a][c])
                      for a in range(nq)])
            for c in range(nq)
        ]
        for i in range(nq)
    ]
    # predicted covariance, plain symmetric (upper + aliased
    # mirror); full-rank — Q restores the measured direction
    Cp = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for l in range(i, nq):
            Cp[i][l] = _sreduce(
                [_smul(tmp[i][c], At_st[l][c]) for c in range(nq)]
                + [_smul(s2, Q_st[i][l])]
            )
            Cp[l][i] = Cp[i][l]
    if jitter:
        # relative diagonal jitter — see `_ek0_pair_bwd_step_plain`
        for i in range(nq):
            Cp[i][i] = Cp[i][i] * (1.0 + jitter)
    Lp, Lp_inv = _list_chol_inv(Cp, nq)
    # gain rows (row bx structurally zero: smoothed == filtered
    # at the measured block)
    G = [[0.0] * nq for _ in range(nq)]
    for i in range(nq):
        if i == bx:
            continue
        G[i] = _list_cho_solve_inv(
            Lp, Lp_inv, [tmp[l][i] for l in range(nq)], nq
        )
    mp = [
        [
            _sreduce([_smul(At_st[i][l], m_f[l][j])
                      for l in range(nq)])
            for j in range(d)
        ]
        for i in range(nq)
    ]
    dm = [[m_s[i][j] - mp[i][j] for j in range(d)]
          for i in range(nq)]
    m_new = []
    for i in range(nq):
        rowm = []
        for j in range(d):
            inc = _sreduce(
                [_smul(G[i][l], dm[l][j]) for l in range(nq)]
            )
            rowm.append(
                m_f[i][j] if _is0(inc) else m_f[i][j] + inc
            )
        m_new.append(rowm)
    GA = [
        [
            _sreduce([_smul(G[i][a], At_st[a][l])
                      for a in range(nq)])
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    IGA = [
        [(1.0 - GA[i][l]) if i == l else
         (0.0 - GA[i][l] if not _is0(GA[i][l]) else 0.0)
         for l in range(nq)]
        for i in range(nq)
    ]
    b1 = [
        [
            _sreduce([_smul(IGA[i][a], L_f[a][l])
                      for a in range(nq)])
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    GQ = [
        [
            _smul(sq_s2,
                  _sreduce([_smul(G[i][a], QL_st[a][l])
                            for a in range(nq)]))
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    b3 = [
        [
            _sreduce([_smul(G[i][a], Ls[a][l])
                      for a in range(nq)])
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    Ls_new = _list_mgs_tril(
        _t_rows(b1, nq) + _t_rows(GQ, nq) + _t_rows(b3, nq),
        3 * nq, nq, rsqrt=True,
    )
    return m_new, Ls_new


def _ek0_pair_bwd_step_plain(
    m_f, C_f, m_s, Cs, s2, *,
    At_st, QL_st, Q_st, nq: int, d: int, bx: int, jitter: float = 0.0,
):
    """Plain-covariance Joseph backward step: carries the SMOOTHED
    covariance plain (active upper triangle, aliased mirror) instead of
    a factor, via the additive Joseph form

        C_s' = (I-GA) C_f (I-GA)^T + s2 (G QL)(G QL)^T + G C_s G^T

    — three PSD terms, no subtraction, so it is f32-stable in the
    preconditioned frame (unlike the classical C_f + G(C_s - Cp)G^T,
    which is the plain form CLAUDE.md forbids). Eliminates the sqrt
    path's per-step chol(C_f), sqrt(s2) and the 3(q+1)-row MGS — ~7
    transcendentals and ~40 mult-adds per member-step on an issue-bound
    kernel. Validated == the sqrt backward to ~1e-12 (f64 interpret)
    and ~1e-6 relative stds on-chip f32 (pair_plain experiment).
    Returns ``(m_new, Cs_new)`` with row/col ``bx`` statically zero."""
    tmp = [
        [
            _sreduce([_smul(At_st[i][a], C_f[a][c])
                      for a in range(nq)])
            for c in range(nq)
        ]
        for i in range(nq)
    ]
    Cp = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for l in range(i, nq):
            Cp[i][l] = _sreduce(
                [_smul(tmp[i][c], At_st[l][c]) for c in range(nq)]
                + [_smul(s2, Q_st[i][l])]
            )
            Cp[l][i] = Cp[i][l]
    if jitter:
        # relative diagonal jitter (the `smooth_solution(jitter=)` house
        # mechanism, CLAUDE.md): at steps whose dynamic diffusion
        # collapses (s2 ~ 1e-10 observed on perturbed FHN lanes), the
        # PLAIN Cp's conditioning is the factor form's SQUARED — its
        # f32 eigmin goes (slightly) negative and an unjittered solve
        # amplifies roundoff without bound (NaN stds; measured). The
        # jitter bounds the gain's amplification at ~1/jitter and
        # perturbs results by <= ~jitter relatively — dtype-scaled by
        # the caller (1e-6 in f32, 1e-12 in f64).
        for i in range(nq):
            Cp[i][i] = Cp[i][i] * (1.0 + jitter)
    Lp, Lp_inv = _list_chol_inv(Cp, nq)
    G = [[0.0] * nq for _ in range(nq)]
    for i in range(nq):
        if i == bx:
            continue
        G[i] = _list_cho_solve_inv(
            Lp, Lp_inv, [tmp[l][i] for l in range(nq)], nq
        )
    mp = [
        [
            _sreduce([_smul(At_st[i][l], m_f[l][j])
                      for l in range(nq)])
            for j in range(d)
        ]
        for i in range(nq)
    ]
    dm = [[m_s[i][j] - mp[i][j] for j in range(d)]
          for i in range(nq)]
    m_new = []
    for i in range(nq):
        rowm = []
        for j in range(d):
            inc = _sreduce(
                [_smul(G[i][l], dm[l][j]) for l in range(nq)]
            )
            rowm.append(m_f[i][j] if _is0(inc) else m_f[i][j] + inc)
        m_new.append(rowm)
    GA = [
        [
            _sreduce([_smul(G[i][a], At_st[a][l]) for a in range(nq)])
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    IGA = [
        [(1.0 - GA[i][l]) if i == l else
         (0.0 - GA[i][l] if not _is0(GA[i][l]) else 0.0)
         for l in range(nq)]
        for i in range(nq)
    ]
    # B1 = (I-GA) C_f (I-GA)^T  (C_f row/col bx statically zero)
    Y = [
        [
            _sreduce([_smul(IGA[i][a], C_f[a][c]) for a in range(nq)])
            for c in range(nq)
        ]
        for i in range(nq)
    ]
    # GL = G QL  (QL lower triangular static)
    GL = [
        [
            _sreduce([_smul(G[i][a], QL_st[a][l]) for a in range(nq)])
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    # V = G C_s  (C_s row/col bx statically zero)
    V = [
        [
            _sreduce([_smul(G[i][a], Cs[a][c]) for a in range(nq)])
            for c in range(nq)
        ]
        for i in range(nq)
    ]
    Cs_new = [[0.0] * nq for _ in range(nq)]
    for i in range(nq):
        if i == bx:
            continue
        for l in range(i, nq):
            if l == bx:
                continue
            b1 = _sreduce([_smul(Y[i][c], IGA[l][c]) for c in range(nq)])
            b2 = _smul(s2, _sreduce(
                [_smul(GL[i][k], GL[l][k]) for k in range(nq)]
            ))
            b3 = _sreduce([_smul(V[i][c], G[l][c]) for c in range(nq)])
            Cs_new[i][l] = _sreduce([b1, b2, b3])
            Cs_new[l][i] = Cs_new[i][l]          # aliased mirror
    return m_new, Cs_new


def _ek0_pair_bwd_kernel(
    st_refs, out_refs, row, sem, orow, osem,
    *, At, QLt, Qt, pinv0, T, d, nq, bx, U, plain: bool = False,
    jitter: float = 0.0,
):
    """Backward square-root RTS pass over the packed plain-covariance
    stream, ``U`` chains interleaved (`smoothing.jl:12-27` semantics on
    the uniform preconditioned grid).

    Per chain per step: Cholesky-factor the streamed committed covariance
    with the measured block's row/column treated as a STRUCTURAL zero
    (`_list_cholesky(zero_row=bx)` — the exact-zero treatment the
    adaptive pair established; a guarded pivot there divides
    roundoff-sized junk by ~1e-15 and destroys the factor), rebuild the
    predicted covariance with the collapsed symmetric plain algebra
    (M = C_f At^T falls out of it transposed, for free), and run the
    Joseph square-root smoothing stack. Structural zeros propagate at
    trace time: the gain's row ``bx`` is exactly zero (the R = 0 update
    pinned that block, so smoothed == filtered there), hence b1/GQ/b3
    rows ``bx`` vanish and the 3(q+1)-row MGS skips its ``bx`` column.

    Emits smoothed solution means and RAW first-block variances as
    DMA-streamed (us | var) rows to HBM (``out_refs``; double-buffered per
    chain) — with VMEM output blocks the (T+1, d+1) windows cap the
    interleave at U = 2, streamed outputs free it to 4. The caller applies
    one fused ``pinv0 * sqrt`` XLA epilogue instead of a per-step VPU
    sqrt."""
    triu, V = _pair_layout(nq, d, bx)
    At_st = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
    QL_st = [[float(QLt[i, l]) for l in range(nq)] for i in range(nq)]
    Q_st = [[float(Qt[i, l]) for l in range(nq)] for i in range(nq)]
    tril_act = [(i, l) for i in range(nq) if i != bx
                for l in range(i + 1) if l != bx]

    def start_load(u, k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(
            st_refs[u].at[k], row.at[u, slot], sem.at[u, slot]
        ).start()

    def wait_and_read(u, k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(
            st_refs[u].at[k], row.at[u, slot], sem.at[u, slot]
        ).wait()
        m = [[row[u, slot, i * d + j] for j in range(d)] for i in range(nq)]
        C = [[0.0] * nq for _ in range(nq)]
        idx = nq * d
        for (i, l) in triu:
            C[i][l] = row[u, slot, idx]
            C[l][i] = C[i][l]
            idx += 1
        return m, C, row[u, slot, idx]

    def emit(u, k, us_row, var):
        # k walks T, T-1, ..., 0: the copy sharing this slot was issued
        # two rows earlier (k + 2)
        slot = jax.lax.rem(k, jnp.int32(2))

        @pl.when(k <= T - 2)
        def _():
            pltpu.make_async_copy(
                orow.at[u, slot], out_refs[u].at[k], osem.at[u, slot]
            ).wait()

        for j in range(d):
            orow[u, slot, j] = us_row[j]
        orow[u, slot, d] = var
        pltpu.make_async_copy(
            orow.at[u, slot], out_refs[u].at[k], osem.at[u, slot]
        ).start()

    # --- init from the final filter row: smoothed == filtered at t1 ---
    for u in range(U):
        start_load(u, jnp.int32(T))
    ms, Lacts, s2s = [], [], []
    for u in range(U):
        m_T, C_T, s2_T = wait_and_read(u, jnp.int32(T))
        if T >= 1:
            start_load(u, jnp.int32(T - 1))   # prefetch first backward row
        if plain:
            # plain-Joseph carry: the smoothed covariance at t1 IS the
            # filtered one — no factorization needed at all
            emit(u, jnp.int32(T), [pinv0 * m_T[0][j] for j in range(d)],
                 C_T[0][0])
            Lacts.append([C_T[i][l] for (i, l) in triu])
        else:
            L_T = _list_cholesky_rs(C_T, nq, zero_row=bx)
            emit(u, jnp.int32(T), [pinv0 * m_T[0][j] for j in range(d)],
                 L_T[0][0] * L_T[0][0])
            Lacts.append([L_T[i][l] for (i, l) in tril_act])
        ms.append(m_T)
        s2s.append(s2_T)

    def body(step, carry):
        ms, Lacts, s2s = carry
        k = jnp.asarray(T, step.dtype) - jnp.ones((), step.dtype) - step
        ms2, Lacts2, s2s2 = [], [], []
        for u in range(U):
            m_s = ms[u]
            m_f, C_f, s2_k = wait_and_read(u, k)

            @pl.when(k >= 1)
            def _():
                start_load(u, k - jnp.ones((), k.dtype))

            s2 = s2s[u]               # diffusion of interval k -> k+1
            if plain:
                Cs = [[0.0] * nq for _ in range(nq)]
                for (i, l), v in zip(triu, Lacts[u]):
                    Cs[i][l] = v
                    Cs[l][i] = Cs[i][l]
                m_new, Cs_new = _ek0_pair_bwd_step_plain(
                    m_f, C_f, m_s, Cs, s2,
                    At_st=At_st, QL_st=QL_st, Q_st=Q_st,
                    nq=nq, d=d, bx=bx, jitter=jitter,
                )
                emit(u, k, [pinv0 * m_new[0][j] for j in range(d)],
                     Cs_new[0][0])
                Lacts2.append([Cs_new[i][l] for (i, l) in triu])
            else:
                Ls = [[0.0] * nq for _ in range(nq)]
                for (i, l), v in zip(tril_act, Lacts[u]):
                    Ls[i][l] = v
                m_new, Ls_new = _ek0_pair_bwd_step_lists(
                    m_f, C_f, m_s, Ls, s2,
                    At_st=At_st, QL_st=QL_st, Q_st=Q_st,
                    nq=nq, d=d, bx=bx, jitter=jitter,
                )
                v00 = Ls_new[0][0]
                emit(u, k, [pinv0 * m_new[0][j] for j in range(d)],
                     v00 * v00)
                Lacts2.append([Ls_new[i][l] for (i, l) in tril_act])
            ms2.append(m_new)
            s2s2.append(s2_k)
        return ms2, Lacts2, s2s2

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), body, (ms, Lacts, s2s))
    for u in range(U):   # drain the last (up to two) in-flight output rows
        pltpu.make_async_copy(
            orow.at[u, jnp.int32(0)], out_refs[u].at[jnp.int32(0)],
            osem.at[u, jnp.int32(0)],
        ).wait()
        if T >= 1:
            pltpu.make_async_copy(
                orow.at[u, jnp.int32(1)], out_refs[u].at[jnp.int32(1)],
                osem.at[u, jnp.int32(1)],
            ).wait()


@_no_x64
def ek0_filter_state_stream(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    prior=None,
    second_order: bool = False,
):
    """Packed (mean | factor | s2) SQUARE-ROOT state stream of the
    streaming filter the sampler kernels consume, shape
    (nb, T+1, nq, d+nq+1, 8, 128). Test hook: `ek0_fused_sample` builds
    the identical stream inline; the sampler replica tests read it here to
    drive the numpy backward replica on the exact same rows."""
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    T = int(n_steps)
    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    fkernel = functools.partial(
        _ek0_filter_states_kernel, f=f, At=At_np.astype(fdtype),
        Qt=QLt_np.astype(fdtype), pinv0=float(1.0 / p_np[0]),
        pinv1=float(1.0 / p_np[1]), T=T, d=d, nq=nq,
        dt=float(dt), t0=float(t0), so=bool(second_order),
        pinv_b=float(1.0 / p_np[2]) if second_order else 0.0,
    )
    W = d + nq + 1

    def fentry(m0_blk, p_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                st_hbm.at[b], row, sem)

    return pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nb, T + 1, nq, W, _SUB, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(m0_p, ps_b)


@_no_x64
def ek0_fused_solve(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    _debug: bool = False,
    prior=None,
    mesh=None,
    second_order: bool = False,
    diffusion: str = "dynamic",
    _bwd_plain: bool = True,
):
    """Complete fused probabilistic solve: filter + RTS smoother kernels.

    Returns ``(us, stds)`` — the *smoothed* posterior means/stds of the
    solution, shapes (T+1, d, B) / (T+1, B). ``mesh``: optional 1-D device
    mesh sharding the ensemble axis (both kernels run per-shard; the
    intermediate state stream stays shard-local, no collectives).
    ``second_order``: measurement block 2 in the filter kernel; the RTS
    smoother pass is measurement-agnostic and runs unchanged.

    Round-5 design: the forward is the collapsed plain-covariance filter
    (`_ek0_pair_fwd_kernel` — the fast filter's step body) streaming
    (mean | active-cov-triangle | s2) rows; the backward Cholesky-factors
    each streamed covariance with the measured block's row/column as a
    structural zero and runs the Joseph square-root RTS stack
    (`_ek0_pair_bwd_kernel`); both passes interleave independent member
    chains to fill the serial recursion's latency slots. Measured on chip
    (8192-member FHN, T=500, q=3): 3.84 ms -> see benchmarks/results.json
    `ensemble_8192_pallas_filter_smoother`.
    """
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    static = None if diffusion == "dynamic" else str(diffusion)
    if static is not None and static not in ("fixed", "fixedMAP", "fixedMV"):
        raise NotImplementedError(
            f"diffusion={diffusion!r}: fused fixed-grid kernels support "
            "dynamic / fixed / fixedMAP / fixedMV"
        )
    if mesh is not None:
        if _debug:
            raise ValueError("_debug outputs are not available under mesh=")
        out_axes = (2, 1) if static is None else (
            (2, 2, 1) if static == "fixedMV" else (2, 1, 0)
        )
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_: ek0_fused_solve(
                f, m0_, ps_, t0, dt, n_steps, q, prior=prior,
                second_order=second_order, diffusion=diffusion,
                _bwd_plain=_bwd_plain,
            ),
            (m0, ps), in_axes=(2, 1), out_axes=out_axes,
        )
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    T = int(n_steps)
    bx = 2 if second_order else 1

    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    Qt_np = QLt_np @ QLt_np.T
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    pinv0 = float(1.0 / p_np[0])

    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    n_params = ps_b.shape[1]

    _, V = _pair_layout(nq, d, bx)

    # Chain interleaving: neither pass holds large VMEM output blocks
    # (the backward DMA-streams its (us | var) rows), so both take the
    # largest divisor of nb up to 4 (measured best on the 8192 config).
    U_f = next(u for u in (4, 2, 1) if nb % u == 0)
    U_b = U_f
    ng_f, ng_b = nb // U_f, nb // U_b

    fkernel = functools.partial(
        _ek0_pair_fwd_kernel, f=f, At=At_np.astype(fdtype),
        Qt=Qt_np.astype(fdtype), pinv0=pinv0,
        pinv1=float(1.0 / p_np[1]), T=T, dt=float(dt), t0=float(t0),
        d=d, nq=nq, so=bool(second_order),
        pinv_b=float(1.0 / p_np[2]) if second_order else 0.0,
        static_diff=static, U=U_f,
    )
    fscratch = [
        pltpu.VMEM((U_f, 2, V, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((U_f, 2)),
    ]
    st_shape = jax.ShapeDtypeStruct((nb, T + 1, V, _SUB, _LANE), dtype)
    m0_g = m0_p.reshape(ng_f, U_f, nq, d, _SUB, _LANE)
    ps_g = ps_b.reshape(ng_f, U_f, n_params, _SUB, _LANE)
    f_in_specs = [
        pl.BlockSpec((1, U_f, nq, d, _SUB, _LANE),
                     lambda b: (b, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, U_f, n_params, _SUB, _LANE),
                     lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
    ]

    if static is not None:
        def fentry(m0_blk, p_blk, st_hbm, sig_blk, row, sem):
            base = pl.program_id(0) * U_f
            fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                    [st_hbm.at[base + u] for u in range(U_f)],
                    row, sem, sig_blk.at[jnp.int32(0)])

        st, sig = pl.pallas_call(
            fentry,
            grid=(ng_f,),
            in_specs=f_in_specs,
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, U_f, d, _SUB, _LANE),
                             lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                st_shape,
                jax.ShapeDtypeStruct((ng_f, U_f, d, _SUB, _LANE), dtype),
            ],
            scratch_shapes=fscratch,
        )(m0_g, ps_g)
        sig = sig.reshape(nb, d, _SUB, _LANE)
    else:
        def fentry(m0_blk, p_blk, st_hbm, row, sem):
            base = pl.program_id(0) * U_f
            fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                    [st_hbm.at[base + u] for u in range(U_f)], row, sem)

        st = pl.pallas_call(
            fentry,
            grid=(ng_f,),
            in_specs=f_in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=st_shape,
            scratch_shapes=fscratch,
        )(m0_g, ps_g)

    # relative Cp jitter for the backward solves: at collapsed-diffusion
    # steps the plain predicted covariance's f32 conditioning is the
    # factor form's squared and its eigmin dips (slightly) negative —
    # the jitter bounds the smoothing gain's amplification (the
    # `smooth_solution(jitter=)` mechanism; measured NaN stds without
    # it on perturbed-FHN chip lanes). 1e-12 in f64 keeps the interpret
    # equivalence tests at their exactness tolerances.
    jit_eps = 1e-6 if fdtype == np.float32 else 1e-12
    skernel = functools.partial(
        _ek0_pair_bwd_kernel, At=At_np.astype(fdtype),
        QLt=QLt_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        pinv0=pinv0, T=T, d=d, nq=nq, bx=bx, U=U_b, plain=_bwd_plain,
        jitter=jit_eps,
    )
    sscratch = [
        pltpu.VMEM((U_b, 2, V, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((U_b, 2)),
        pltpu.VMEM((U_b, 2, d + 1, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((U_b, 2)),
    ]

    def sentry(st_hbm, out_hbm, row, sem, orow, osem):
        base = pl.program_id(0) * U_b
        skernel([st_hbm.at[base + u] for u in range(U_b)],
                [out_hbm.at[base + u] for u in range(U_b)],
                row, sem, orow, osem)

    out = pl.pallas_call(
        sentry,
        grid=(ng_b,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (nb, T + 1, d + 1, _SUB, _LANE), dtype
        ),
        scratch_shapes=sscratch,
    )(st)

    us = out[:, :, :d].transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    var = out[:, :, d].transpose(1, 0, 2, 3).reshape(T + 1, B)
    # XLA epilogue: the backward emits raw preconditioned variances so its
    # hot loop carries no per-step sqrt; one fused sqrt over (T+1, B)
    stds = pinv0 * jnp.sqrt(jnp.maximum(var, 0.0))
    if static is not None:
        # exit rescale (`integrator_utils.jl:4-18`): the smoother ran on
        # sigma^2 = 1 covariances; uniform scaling commutes with the RTS
        # recursion (the gain is scale-invariant), so scaling the output
        # stds IS smoothing the rescaled filter states
        if static == "fixedMV":
            sigv = sig.transpose(1, 0, 2, 3).reshape(d, B)
            stds = stds[:, None, :] * jnp.sqrt(sigv)[None]
        else:
            sigv = sig[:, 0].reshape(B)
            stds = stds * jnp.sqrt(sigv)[None]
        if _debug:
            return us, stds, sigv, st
        return us, stds, sigv
    if _debug:
        return us, stds, st
    return us, stds


def solve_ensemble_ek0_pallas_smooth(
    prob_f: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_steps: int,
    q: int = 3,
    prior=None,
    mesh=None,
    second_order: bool = False,
    diffusion: str = "dynamic",
):
    """Taylor-init + fused filter + fused RTS smoother over an ensemble.

    ``prior``: optional IOUP/Matern instance — on the (uniform) kernel grid
    any Gauss-Markov prior's preconditioned transition is a compile-time
    constant, so generalized priors run at identical kernel speed.
    ``second_order``: ``u0s = [u0 | du0]`` (B, 2d) with
    ``prob_f(du, u, p, t)``; outputs expose the position block."""
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    if second_order:
        def init_one(u0_full, p):
            return jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
    else:
        def init_one(u0, p):
            return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)
    return ek0_fused_solve(prob_f, m0, ps.T, float(t0), float(dt), n_steps, q,
                           prior=prior, mesh=mesh,
                           second_order=second_order, diffusion=diffusion)


def _ek0_sampler_kernel(
    st_ref, z_ref, us_ref,
    row, sem, zrow, zsem, orow, osem,
    *, At, Qt, pinv0, T, d, nq, S,
):
    """Backward joint-posterior sampling over the packed streamed states.

    The RTS smoother recursion with the carried smoothed state replaced by
    the carried *samples*: condition the filtered state on the drawn next
    value (a zero-covariance target, so the 3-block smoothing stack loses
    its ``G L_s`` term) and re-draw from the conditional using streamed
    (S, q+1, d) blocks of standard normals per step. Mirrors the
    reference's per-sample backward loop
    (`/root/reference/src/solution_sampling.jl:44-59`) with the whole lane
    block advancing in lockstep — and amortizes it: the expensive per-step
    work (predicted factor MGS, gain solve, conditional-factor MGS) is
    sample-independent, so all ``S`` samples share it and extra samples
    cost only the O(nq·d) draw each. Streamed normals (not in-kernel RNG)
    keep the kernel deterministic and exactly replicable by the numpy
    reference in the tests. Outputs are DMA-streamed ((S, d) rows) — a
    (T+1, S, d) VMEM block would not fit at the headline T=500.
    """
    QLt_c = Qt  # the noise *factor* QLt

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()
        pltpu.make_async_copy(z_ref.at[k], zrow.at[slot], zsem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        pltpu.make_async_copy(z_ref.at[k], zrow.at[slot], zsem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        L = [[row[slot, i, d + l] for l in range(nq)] for i in range(nq)]
        z = [
            [[zrow[slot, s, i, j] for j in range(d)] for i in range(nq)]
            for s in range(S)
        ]
        return m, L, row[slot, 0, d + nq], z

    def emit(k, xs):
        # double-buffered (S, d) solution-sample row -> HBM, backward order
        slot = jax.lax.rem(k, jnp.int32(2))

        @pl.when(k <= jnp.int32(T - 2))
        def _():
            pltpu.make_async_copy(
                orow.at[slot], us_ref.at[k + jnp.int32(2)], osem.at[slot]
            ).wait()

        for s in range(S):
            for j in range(d):
                orow[slot, s, j] = pinv0 * xs[s][0][j]
        pltpu.make_async_copy(
            orow.at[slot], us_ref.at[k], osem.at[slot]
        ).start()

    start_load(jnp.int32(T))
    m_T, L_T, s2_T, z_T = wait_and_read(jnp.int32(T))
    if T >= 1:
        start_load(jnp.int32(T - 1))   # prefetch the first backward row
    # x_T = m_T + L_T z_T in preconditioned coordinates (the diagonal
    # preconditioner commutes with sampling: P^-1 (m + L z) has exactly the
    # unpreconditioned posterior's mean and factor)
    xs = [
        [
            [
                m_T[i][j]
                + _sreduce([_smul(L_T[i][l], z_T[s][l][j]) for l in range(nq)])
                for j in range(d)
            ]
            for i in range(nq)
        ]
        for s in range(S)
    ]
    emit(jnp.int32(T), xs)

    def body(step, carry):
        xs, s2_next = carry
        k = jnp.asarray(T, step.dtype) - jnp.ones((), step.dtype) - step
        m_f, L_f, s2_k, z = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.ones((), k.dtype))
        sq_s2 = jnp.sqrt(s2_next)   # diffusion of interval k -> k+1

        AtL = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, a] * L_f[a][b] for a in range(nq) if At[i, a] != 0.0],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        qT = [
            [sq_s2 * QLt_c[i, a] if QLt_c[i, a] != 0.0 else 0.0
             for i in range(nq)]
            for a in range(nq)
        ]
        Lp = _list_mgs_tril(_t_rows(AtL, nq) + qT, 2 * nq, nq)

        M = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [L_f[i][b] * AtL[l][b] for b in range(nq)],
                )
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        G = [_list_cho_solve(Lp, M[i], nq) for i in range(nq)]

        mp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [At[i, l] * m_f[l][j] for l in range(nq) if At[i, l] != 0.0],
                )
                for j in range(d)
            ]
            for i in range(nq)
        ]
        # conditional factor: the smoothing stack with the G L_s block
        # dropped (the conditioning target has zero covariance). Shared by
        # every sample — as are Lp, G, mp above; only the draws below are
        # per-sample.
        GA = _matmul_lists(G, [[At[i, l] for l in range(nq)] for i in range(nq)], nq)
        IGA = [
            [
                (1.0 if i == l else 0.0) - GA[i][l]
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        b1 = _matmul_lists(IGA, L_f, nq)
        GQ = [
            [
                sq_s2
                * functools.reduce(
                    lambda a, b: a + b,
                    [G[i][a] * QLt_c[a, l] for a in range(l, nq)],
                )
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        L_c = _list_mgs_tril(_t_rows(b1, nq) + _t_rows(GQ, nq), 2 * nq, nq)

        xs_new = []
        for s in range(S):
            dm = [
                [xs[s][i][j] - mp[i][j] for j in range(d)] for i in range(nq)
            ]
            xs_new.append([
                [
                    m_f[i][j]
                    + functools.reduce(
                        lambda a, b: a + b,
                        [G[i][l] * dm[l][j] for l in range(nq)],
                    )
                    + _sreduce(
                        [_smul(L_c[i][l], z[s][l][j]) for l in range(i + 1)]
                    )  # L_c is lower-triangular by construction
                    for j in range(d)
                ]
                for i in range(nq)
            ])
        emit(k, xs_new)
        return xs_new, s2_k

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(T), body, (xs, s2_T))
    # drain the last (up to two) in-flight sample-row copies
    pltpu.make_async_copy(
        orow.at[jnp.int32(0)], us_ref.at[jnp.int32(0)], osem.at[jnp.int32(0)]
    ).wait()
    if T >= 1:
        pltpu.make_async_copy(
            orow.at[jnp.int32(1)], us_ref.at[jnp.int32(1)], osem.at[jnp.int32(1)]
        ).wait()


@_no_x64
def ek0_fused_sample(
    f: Callable,
    m0: jax.Array,        # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,        # (n_params, B)
    normals: jax.Array,   # (T+1, S, q+1, d, B) standard normals
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Fused joint-posterior sampling: filter kernel + backward sampler kernel.

    Returns ``us`` (T+1, S, d, B) — ``S`` joint samples of the solution
    path per ensemble member, drawn from the exact smoothing posterior (the
    marginals match the fused smoother's mean/std; tested). All ``S``
    samples share one backward pass and its sample-independent gain/factor
    work, so extra samples are nearly free. ``normals`` must be i.i.d.
    standard normals; pass the SAME array to the numpy replica for
    bit-level validation. ``mesh``: optional 1-D device mesh sharding the
    ensemble axis. Reference: `/root/reference/src/solution_sampling.jl:24-62`.
    """
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, z_: (ek0_fused_sample(
                f, m0_, ps_, z_, t0, dt, n_steps, q, prior=prior,
                second_order=second_order,
            ),),
            (m0, ps, normals), in_axes=(2, 1, 4), out_axes=(3,),
        )[0]
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    if (
        normals.ndim != 5
        or normals.shape[0] != n_steps + 1
        or normals.shape[2:] != (nq, d, B)
    ):
        raise ValueError(
            f"normals must have shape {(n_steps + 1, 'S', nq, d, B)}, got "
            f"{normals.shape}"
        )
    S = int(normals.shape[1])
    nb = B // BLOCK
    T = int(n_steps)

    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    z_b = normals.astype(dtype).reshape(
        T + 1, S, nq, d, nb, _SUB, _LANE
    ).transpose(4, 0, 1, 2, 3, 5, 6)

    common = dict(At=At_np.astype(fdtype), Qt=QLt_np.astype(fdtype),
                  pinv0=float(1.0 / p_np[0]), T=T, d=d, nq=nq)

    fkernel = functools.partial(
        _ek0_filter_states_kernel, f=f, pinv1=float(1.0 / p_np[1]),
        dt=float(dt), t0=float(t0), so=bool(second_order),
        pinv_b=float(1.0 / p_np[2]) if second_order else 0.0, **common,
    )

    W = d + nq + 1
    fscratch = [
        pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def fentry(m0_blk, p_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                st_hbm.at[b], row, sem)

    st = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
                pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                             lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nb, T + 1, nq, W, _SUB, _LANE), dtype),
        scratch_shapes=fscratch,
    )(m0_p, ps_b)

    skernel = functools.partial(_ek0_sampler_kernel, S=S, **common)

    def sentry(st_hbm, z_hbm, us_hbm, row, sem, zrow, zsem, orow, osem):
        b = pl.program_id(0)
        skernel(st_hbm.at[b], z_hbm.at[b], us_hbm.at[b],
                row, sem, zrow, zsem, orow, osem)

    us_s = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # samples are DMA-streamed row-by-row (a (T+1, S, d) VMEM output
        # block would not fit at the headline T=500)
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nb, T + 1, S, d, _SUB, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nq, W, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, S, nq, d, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, S, d, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(st, z_b)

    return us_s.transpose(1, 2, 3, 0, 4, 5).reshape(T + 1, S, d, B)


def sample_ensemble_ek0_pallas(
    prob_f: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_steps: int,
    key,
    q: int = 3,
    n_samples: int = 1,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Joint posterior samples over an ensemble at kernel speed.

    ``n_samples`` exact smoothing-posterior sample paths per member —
    (T+1, d, B) for ``n_samples=1``, else (T+1, n_samples, d, B): Taylor
    init + fused forward filter + fused backward conditioning sampler
    (`/root/reference/src/solution_sampling.jl:15-23` semantics on the
    uniform kernel grid). All samples of a member share one backward pass
    and its gain/factor work, so extra samples amortize (measured on chip:
    8 samples cost 2.1x one sample — 3.9M sample paths/s @ 8192 members,
    T=500; the residual per-sample cost is the normals/output DMA streams).
    ``second_order``: ``u0s = [u0 | du0]`` (B, 2d); samples expose the
    position block."""
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    if second_order:
        def init_one(u0_full, p):
            return jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
    else:
        def init_one(u0, p):
            return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)
    S = int(n_samples)
    normals = jax.random.normal(
        key, (int(n_steps) + 1, S, q + 1, d, B), m0.dtype
    )
    us = ek0_fused_sample(
        prob_f, m0, ps.T, normals, float(t0), float(dt), n_steps, q,
        prior=prior, mesh=mesh, second_order=second_order,
    )
    return us[:, 0] if S == 1 else us


# ==========================================================================
# EK1 fused kernel pair: full D x D square-root extended Kalman filtering
# inside the kernel (D = d(q+1)). EK1 breaks the Kronecker structure, so
# the covariance factor is carried as a dense D x D list-of-lists of lane
# vectors; the IBM transition A = At (x) I_d stays block-sparse and is
# unrolled with its zeros skipped. The user's analytic Jacobian is traced
# into the kernel alongside the vector field.
# ==========================================================================



def _ek1_step_lists(
    m, L, p_block, t_new, *,
    f, jac, Af, QLf, pinv0, pinv1, d, D, want_ll=False,
    stop_calib: bool = False,
    want_Lp: bool = False,
    u_lin=None,
    static_diff=None, calib=None,
):
    """One square-root EK1(dynamic) step on D-vector mean / D x D factor
    lists of lanes. Shared by the streamed-state filter kernel and the
    EK1 data-likelihood kernel. Returns ``(m_new, L_new, s2, ll_inc)``
    (``ll_inc`` is None unless ``want_ll``); with ``want_Lp`` the
    predicted factor Lp is appended so the caller can stream it to the
    backward smoother (which then skips its own 2D x D re-factorization).
    ``u_lin``: optional (d, 8, 128) linearization point for the Jacobian
    (the IEKS hook, `perform_step.jl:111-113`); the residual still
    evaluates ``f`` at the predicted mean, only J moves."""
    zero = jnp.zeros_like(m[0])

    def Amul_vec(v):
        return [
            functools.reduce(
                lambda a, b: a + b,
                [Af[r, c] * v[c] for c in range(D) if Af[r, c] != 0.0],
            )
            for r in range(D)
        ]

    def Amul_mat(M):
        return [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Af[r, c] * M[c][k] for c in range(D) if Af[r, c] != 0.0],
                )
                for k in range(D)
            ]
            for r in range(D)
        ]

    mp = Amul_vec(m)
    u_pred = jnp.stack([pinv0 * mp[j] for j in range(d)])
    du = f(u_pred, p_block, t_new)
    J = jac(u_pred if u_lin is None else u_lin, p_block, t_new)  # (d,d,8,128)
    z = [pinv1 * mp[d + a] - du[a] for a in range(d)]

    def Hmul_cols(M, K):
        # H M for H = (E1 - J E0) P^-1; M is D x K lists
        out = []
        for a in range(d):
            row = []
            for kk in range(K):
                v = pinv1 * M[d + a][kk]
                for b in range(d):
                    v = v - J[a, b] * (pinv0 * M[b][kk])
                row.append(v)
            out.append(row)
        return out

    if static_diff is not None:
        # static models filter with the unscaled prior; the per-step
        # statistic comes from the measurement covariance S below
        sq_s2 = 1.0
    else:
        # dynamic diffusion: s2 = z^T (H Q H^T)^-1 z / d, HQ = Hmul(QLf)
        QL_lists = [[jnp.zeros_like(zero) if QLf[r, c] == 0.0 else
                     QLf[r, c] + zero for c in range(D)] for r in range(D)]
        HQ = Hmul_cols(QL_lists, D)              # d x D
        Sq = [
            [
                functools.reduce(
                    lambda x, y: x + y, [HQ[a][c] * HQ[b][c] for c in range(D)]
                )
                for b in range(d)
            ]
            for a in range(d)
        ]
        Lq = _list_chol(Sq, d)
        w = _list_cho_solve(Lq, z, d)
        s2 = functools.reduce(
            lambda x, y: x + y, [z[a] * w[a] for a in range(d)]
        ) / d
        if stop_calib:
            # see _ek0_step_lists: the long-horizon f32 gradient estimator
            s2 = jax.lax.stop_gradient(s2)
        sq_s2 = jnp.sqrt(jnp.maximum(s2, 0.0))

    # predicted factor: MGS of [ (A L)^T ; sqrt(s2) QLf^T ]  (2D x D)
    AL = Amul_mat(L)
    qT = [
        [sq_s2 * QLf[r, c] if QLf[r, c] != 0.0 else 0.0
         for r in range(D)]
        for c in range(D)
    ]
    Lp = _list_mgs_tril(_t_rows(AL, D) + qT, 2 * D, D)

    # update: Z = H Lp (d x D), S = Z Z^T, K = Lp Z^T S^-1
    Z = Hmul_cols(Lp, D)
    S = [
        [
            functools.reduce(
                lambda x, y: x + y, [Z[a][c] * Z[b][c] for c in range(D)]
            )
            for b in range(d)
        ]
        for a in range(d)
    ]
    Ls = _list_chol(S, d)
    # K rows: K[r] = (Lp Z^T)[r, :] S^-1
    LpZt = [
        [
            functools.reduce(
                lambda x, y: x + y, [Lp[r][c] * Z[a][c] for c in range(D)]
            )
            for a in range(d)
        ]
        for r in range(D)
    ]
    Kg = [_list_cho_solve(Ls, LpZt[r], d) for r in range(D)]
    m_new = [
        mp[r]
        - functools.reduce(
            lambda x, y: x + y, [Kg[r][a] * z[a] for a in range(d)]
        )
        for r in range(D)
    ]
    L_new = [
        [
            Lp[r][c]
            - functools.reduce(
                lambda x, y: x + y, [Kg[r][a] * Z[a][c] for a in range(d)]
            )
            for c in range(D)
        ]
        for r in range(D)
    ]
    ll_inc = None
    if want_ll:
        # log N(z; 0, S) via the already-computed Cholesky of S
        ws = _list_cho_solve(Ls, z, d)
        zSz = functools.reduce(
            lambda x, y: x + y, [z[a] * ws[a] for a in range(d)]
        )
        logdet = functools.reduce(
            lambda x, y: x + y,
            [2.0 * jnp.log(jnp.maximum(Ls[a][a], 1e-30)) for a in range(d)],
        )
        ll_inc = -0.5 * (zSz + logdet + d * _LOG_2PI)
    if static_diff is not None:
        # per-step statistic z^T S^-1 z / d (`diffusions.jl:12-36`) from
        # the already-factored dense measurement covariance
        ws2 = _list_cho_solve(Ls, z, d)
        zSz2 = functools.reduce(
            lambda x, y: x + y, [z[a] * ws2[a] for a in range(d)]
        )
        # fixed / fixedMAP share the d-divided statistic; fixedMV needs
        # per-dim S_ii and is EK0/DiagonalEK1-only — guarded by callers
        sig, k = calib
        local = zSz2 / d
        kmax = jnp.maximum(k, 1.0)
        if static_diff == "fixed":
            sig_new = jnp.where(k == 0.0, local,
                                sig + (local - sig) / kmax)
        else:  # fixedMAP
            alpha, beta = 0.5, 0.5
            N = k + 1.0
            first = (beta + 0.5 * local) / (alpha + N * d / 2 + 1)
            res_prev = (sig * (alpha + (N - 1.0) * d / 2 + 1) - beta) * 2.0
            later = (beta + 0.5 * (res_prev + local)) / (
                alpha + N * d / 2 + 1
            )
            sig_new = jnp.where(k == 0.0, first, later)
        s2 = zero + 1.0
        if want_Lp:
            return m_new, L_new, s2, ll_inc, Lp, (sig_new, k + 1.0)
        return m_new, L_new, s2, ll_inc, (sig_new, k + 1.0)
    if want_Lp:
        return m_new, L_new, s2, ll_inc, Lp
    return m_new, L_new, s2, ll_inc


def _ek1_filter_states_kernel(
    m0_ref, p_ref, st_ref,
    row, sem,
    *, f, jac, At, QLt, pinv0, pinv1, T, dt, t0, d, nq,
    stream_Lp: bool = False,
    lin_ref=None, lrow=None, lsem=None,
    sig_ref=None, static_diff=None,
):
    """Forward EK1 filter (dynamic diffusion), streaming sqrt states.

    ``lin_ref``: optional HBM ref of (T+1, d) linearization-point rows
    (the IEKS hook) — double-buffered DMA reads in forward order; row k+1
    linearizes the Jacobian of step k -> k+1."""
    D = d * nq
    Af = np.kron(At, np.eye(d))          # (D, D) floats
    QLf = np.kron(QLt, np.eye(d))        # (D, D) lower floats
    # H Q H^T needs H QL; Q row-block 1 columns: constant part E1 QL
    m_init = [m0_ref[i // d, i % d] for i in range(D)]
    zero = jnp.zeros_like(m_init[0])
    L_init = [[zero for _ in range(D)] for _ in range(D)]
    p_block = p_ref[:]

    # packed row layout:
    # [ L row (D) | mean (1) | s2 (1, in row 0) | tril(Lp) row (D) ],
    # two slots for double-buffered DMA. With ``stream_Lp`` (set when a
    # smoother pass will consume the stream) Lp — the predicted factor
    # the step computed anyway — rides along so the smoother skips its
    # own 2D x D MGS-QR per step (measured: 14.4 -> 13.1 ms on the
    # 8192-member FHN filter+smoother solve). Without a smoother the
    # extra tril packing + stream width is pure loss (6.34 -> 6.87 ms
    # on the filter-only solve), so ``smooth=False`` keeps W = D + 2.
    def pack_and_send(k_idx, m, L, Lp, s2):
        slot = jax.lax.rem(k_idx, jnp.int32(2))

        @pl.when(k_idx >= 2)
        def _():
            pltpu.make_async_copy(
                row.at[slot], st_ref.at[k_idx], sem.at[slot]
            ).wait()

        for r in range(D):
            for c in range(D):
                row[slot, r, c] = L[r][c]
            row[slot, r, D] = m[r]
            if stream_Lp:
                for c in range(r + 1):  # Lp is lower triangular
                    row[slot, r, D + 2 + c] = Lp[r][c]
        row[slot, 0, D + 1] = s2
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).start()

    pack_and_send(jnp.int32(0), m_init, L_init, L_init, zero + 1.0)

    if lin_ref is not None:
        def start_lin(k1):
            slot = jax.lax.rem(k1, jnp.int32(2))
            pltpu.make_async_copy(
                lin_ref.at[k1], lrow.at[slot], lsem.at[slot]
            ).start()

        start_lin(jnp.int32(1))   # prefetch the first measurement row

    calib0 = (zero, zero)

    def body(k, carry):
        m, L, calib = carry
        _dt = zero.dtype
        k1 = k + jnp.ones((), k.dtype)  # match the loop-index dtype
        t_new = jnp.asarray(t0, _dt) + jnp.asarray(dt, _dt) * (
            k.astype(_dt) + jnp.asarray(1.0, _dt)
        )
        u_lin = None
        if lin_ref is not None:
            slot = jax.lax.rem(k1, jnp.int32(2))
            pltpu.make_async_copy(
                lin_ref.at[k1], lrow.at[slot], lsem.at[slot]
            ).wait()
            u_lin = jnp.stack([lrow[slot, j] for j in range(d)])

            @pl.when(k1 < jnp.int32(T))
            def _():
                start_lin(k1 + jnp.ones((), k1.dtype))
        if static_diff is not None:
            m_new, L_new, s2, _, Lp, calib = _ek1_step_lists(
                m, L, p_block, t_new, f=f, jac=jac, Af=Af, QLf=QLf,
                pinv0=pinv0, pinv1=pinv1, d=d, D=D, want_Lp=True,
                u_lin=u_lin, static_diff=static_diff, calib=calib,
            )
        else:
            m_new, L_new, s2, _, Lp = _ek1_step_lists(
                m, L, p_block, t_new, f=f, jac=jac, Af=Af, QLf=QLf,
                pinv0=pinv0, pinv1=pinv1, d=d, D=D, want_Lp=True,
                u_lin=u_lin,
            )
        pack_and_send(k1, m_new, L_new, Lp, s2)
        return m_new, L_new, calib

    out_c = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m_init, L_init, calib0)
    )
    if static_diff is not None:
        sig_ref[0] = out_c[2][0]
    pltpu.make_async_copy(
        row.at[jnp.int32(T % 2)], st_ref.at[jnp.int32(T)],
        sem.at[jnp.int32(T % 2)],
    ).wait()
    if T >= 1:
        pltpu.make_async_copy(
            row.at[jnp.int32((T - 1) % 2)], st_ref.at[jnp.int32(T - 1)],
            sem.at[jnp.int32((T - 1) % 2)],
        ).wait()


def _ekd_smoother_kernel(
    st_ref, us_ref, std_ref,
    row, sem,
    *, At, QLt, pinv0, T, d, nq,
):
    """Backward RTS pass over D x D sqrt states (EK1 or any dense-factor
    filter); algorithm-agnostic — smoothing never touches H. Packed
    double-buffered reads: prefetch row k-1 while computing row k."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [row[slot, r, D] for r in range(D)]
        L = [[row[slot, r, c] for c in range(D)] for r in range(D)]
        # tril(Lp) of the interval k-1 -> k, streamed from the filter;
        # flat so the loop carry holds no structural zeros
        Lp_low = [row[slot, r, D + 2 + c]
                  for r in range(D) for c in range(r + 1)]
        return m, L, Lp_low, row[slot, 0, D + 1]

    def _unflatten_tril(low):
        out = [[0.0] * D for _ in range(D)]
        idx = 0
        for r in range(D):
            for c in range(r + 1):
                out[r][c] = low[idx]
                idx += 1
        return out

    def block_std(Lrow):
        return pinv0 * jnp.sqrt(
            functools.reduce(lambda a, b: a + b, [x * x for x in Lrow])
        )

    start_load(jnp.int32(T))
    m_T, L_T, Lp_T_low, s2_T = wait_and_read(jnp.int32(T))
    if T >= 1:
        start_load(jnp.int32(T - 1))
    for j in range(d):
        us_ref[T, j] = pinv0 * m_T[j]
        std_ref[T, j] = block_std(L_T[j])

    def Amul_vec(m):
        return [
            functools.reduce(
                lambda a, b: a + b,
                [Af[r, c] * m[c] for c in range(D) if Af[r, c] != 0.0],
            )
            for r in range(D)
        ]

    def body(step, carry):
        m_s, L_s, s2_next, Lp_next_low = carry
        k = jnp.asarray(T, step.dtype) - jnp.ones((), step.dtype) - step
        m_f, L_f, Lp_low_k, s2_k = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.ones((), k.dtype))

        sq_s2 = jnp.sqrt(jnp.maximum(s2_next, 0.0))
        zero = jnp.zeros_like(sq_s2)

        AL = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Af[r, c] * L_f[c][kk] for c in range(D) if Af[r, c] != 0.0],
                )
                for kk in range(D)
            ]
            for r in range(D)
        ]
        # predicted factor of interval k -> k+1: streamed from the filter
        # (bit-identical to the 2D x D MGS-QR it would take to recompute)
        Lp = _unflatten_tril(Lp_next_low)

        # G = C_f A^T Cp^-1 with C_f A^T = L_f (A L_f)^T
        M = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [L_f[r][b] * AL[l][b] for b in range(D)],
                )
                for l in range(D)
            ]
            for r in range(D)
        ]
        G = [_list_cho_solve(Lp, M[r], D) for r in range(D)]

        mp = Amul_vec(m_f)
        dm = [m_s[r] - mp[r] for r in range(D)]
        m_new = [
            m_f[r]
            + functools.reduce(
                lambda a, b: a + b, [G[r][l] * dm[l] for l in range(D)]
            )
            for r in range(D)
        ]

        GA = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [G[r][c] * Af[c, l] for c in range(D) if Af[c, l] != 0.0],
                )
                for l in range(D)
            ]
            for r in range(D)
        ]
        IGA = [
            [(1.0 if r == l else 0.0) - GA[r][l] for l in range(D)]
            for r in range(D)
        ]
        b1 = _matmul_lists(IGA, L_f, D)
        GQ = [
            [
                sq_s2
                * functools.reduce(
                    lambda a, b: a + b,
                    [G[r][c] * QLf[c, l] for c in range(D) if QLf[c, l] != 0.0],
                )
                for l in range(D)
            ]
            for r in range(D)
        ]
        b3 = _matmul_lists(G, L_s, D)
        L_new = _list_mgs_tril(
            _t_rows(b1, D) + _t_rows(GQ, D) + _t_rows(b3, D), 3 * D, D
        )

        for j in range(d):
            us_ref[k, j] = pinv0 * m_new[j]
            std_ref[k, j] = block_std(L_new[j])
        return m_new, L_new, s2_k, Lp_low_k

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m_T, L_T, s2_T, Lp_T_low)
    )


def _ekd_sampler_kernel(
    st_ref, z_ref, us_ref,
    row, sem, zrow, zsem, orow, osem,
    *, At, QLt, pinv0, T, d, nq, S,
):
    """Backward joint-posterior sampling over D x D sqrt states (EK1 or any
    dense-factor filter) — the `_ekd_smoother_kernel` recursion with the
    carried smoothed state replaced by ``S`` carried samples: condition on
    the drawn next value (zero-covariance target, so the 3-block smoothing
    stack loses its ``G L_s`` term) and re-draw from the conditional
    (`/root/reference/src/solution_sampling.jl:44-59`). The predicted
    factor is streamed from the filter; the gain solve and the 2D x D
    conditional-factor MGS are sample-independent, so all ``S`` samples
    share them. Normals streamed from HBM; (S, d) solution-sample rows
    DMA-streamed out."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()
        pltpu.make_async_copy(z_ref.at[k], zrow.at[slot], zsem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        pltpu.make_async_copy(z_ref.at[k], zrow.at[slot], zsem.at[slot]).wait()
        m = [row[slot, r, D] for r in range(D)]
        L = [[row[slot, r, c] for c in range(D)] for r in range(D)]
        Lp_low = [row[slot, r, D + 2 + c]
                  for r in range(D) for c in range(r + 1)]
        z = [[zrow[slot, s, r] for r in range(D)] for s in range(S)]
        return m, L, Lp_low, row[slot, 0, D + 1], z

    def _unflatten_tril(low):
        out = [[0.0] * D for _ in range(D)]
        idx = 0
        for r in range(D):
            for c in range(r + 1):
                out[r][c] = low[idx]
                idx += 1
        return out

    def emit(k, xs):
        slot = jax.lax.rem(k, jnp.int32(2))

        @pl.when(k <= jnp.int32(T - 2))
        def _():
            pltpu.make_async_copy(
                orow.at[slot], us_ref.at[k + jnp.int32(2)], osem.at[slot]
            ).wait()

        for s in range(S):
            for j in range(d):
                orow[slot, s, j] = pinv0 * xs[s][j]
        pltpu.make_async_copy(
            orow.at[slot], us_ref.at[k], osem.at[slot]
        ).start()

    start_load(jnp.int32(T))
    m_T, L_T, Lp_T_low, s2_T, z_T = wait_and_read(jnp.int32(T))
    if T >= 1:
        start_load(jnp.int32(T - 1))
    # the streamed updated factor is a general (non-triangular) square root
    xs = [
        [
            m_T[r]
            + _sreduce([_smul(L_T[r][c], z_T[s][c]) for c in range(D)])
            for r in range(D)
        ]
        for s in range(S)
    ]
    emit(jnp.int32(T), xs)

    def Amul_vec(m):
        return [
            functools.reduce(
                lambda a, b: a + b,
                [Af[r, c] * m[c] for c in range(D) if Af[r, c] != 0.0],
            )
            for r in range(D)
        ]

    def body(step, carry):
        xs, s2_next, Lp_next_low = carry
        k = jnp.asarray(T, step.dtype) - jnp.ones((), step.dtype) - step
        m_f, L_f, Lp_low_k, s2_k, z = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.ones((), k.dtype))

        sq_s2 = jnp.sqrt(jnp.maximum(s2_next, 0.0))

        AL = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Af[r, c] * L_f[c][kk] for c in range(D) if Af[r, c] != 0.0],
                )
                for kk in range(D)
            ]
            for r in range(D)
        ]
        Lp = _unflatten_tril(Lp_next_low)

        M = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [L_f[r][b] * AL[l][b] for b in range(D)],
                )
                for l in range(D)
            ]
            for r in range(D)
        ]
        G = [_list_cho_solve(Lp, M[r], D) for r in range(D)]

        mp = Amul_vec(m_f)

        GA = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [G[r][c] * Af[c, l] for c in range(D) if Af[c, l] != 0.0],
                )
                for l in range(D)
            ]
            for r in range(D)
        ]
        IGA = [
            [(1.0 if r == l else 0.0) - GA[r][l] for l in range(D)]
            for r in range(D)
        ]
        b1 = _matmul_lists(IGA, L_f, D)
        GQ = [
            [
                sq_s2
                * functools.reduce(
                    lambda a, b: a + b,
                    [G[r][c] * QLf[c, l] for c in range(D) if QLf[c, l] != 0.0],
                )
                for l in range(D)
            ]
            for r in range(D)
        ]
        # conditional factor: smoothing stack without the G L_s block
        # (zero-covariance conditioning target); shared by every sample
        L_c = _list_mgs_tril(_t_rows(b1, D) + _t_rows(GQ, D), 2 * D, D)

        xs_new = []
        for s in range(S):
            dm = [xs[s][r] - mp[r] for r in range(D)]
            xs_new.append([
                m_f[r]
                + functools.reduce(
                    lambda a, b: a + b, [G[r][l] * dm[l] for l in range(D)]
                )
                + _sreduce([_smul(L_c[r][c], z[s][c]) for c in range(r + 1)])
                for r in range(D)
            ])
        emit(k, xs_new)
        return xs_new, s2_k, Lp_low_k

    jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (xs, s2_T, Lp_T_low)
    )
    # drain the last (up to two) in-flight sample-row copies
    pltpu.make_async_copy(
        orow.at[jnp.int32(0)], us_ref.at[jnp.int32(0)], osem.at[jnp.int32(0)]
    ).wait()
    if T >= 1:
        pltpu.make_async_copy(
            orow.at[jnp.int32(1)], us_ref.at[jnp.int32(1)], osem.at[jnp.int32(1)]
        ).wait()


@_no_x64
def ek1_fused_solve(
    f: Callable,
    jac: Callable,
    m0: jax.Array,      # (q+1, d, B)
    ps: jax.Array,      # (n_params, B)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    smooth: bool = True,
    prior=None,
    mesh=None,
    _debug: bool = False,
    linearize_traj=None,
    diffusion: str = "dynamic",
):
    """Fused EK1 solve (dynamic diffusion) over an ensemble: the full
    D x D square-root extended Kalman filter (+ optional RTS smoother)
    inside Pallas kernels. ``jac(u, p, t) -> (d, d[, batch...])`` must be
    index-and-stack style like ``f``; pass ``None`` to derive it inside the
    kernel via forward-mode JVP columns (trace-time autodiff). Returns
    ``(us, stds)`` with shapes (T+1, d, B) each (per-dimension marginal
    stds). ``mesh``: optional 1-D device mesh sharding the ensemble axis.
    ``_debug`` appends the packed state stream to the outputs.
    ``linearize_traj``: optional (T+1, d, B) per-member Jacobian
    linearization points (the IEKS hook — row k+1 linearizes step
    k -> k+1), DMA-streamed into the filter kernel."""
    static = None if diffusion == "dynamic" else str(diffusion)
    if static is not None and static not in ("fixed", "fixedMAP"):
        raise NotImplementedError(
            f"diffusion={diffusion!r}: the fused EK1 kernels support "
            "dynamic / fixed / fixedMAP (MV models require EK0 / "
            "DiagonalEK1 structure)"
        )
    if jac is None:
        jac = _auto_jac(f)
    if mesh is not None:
        if _debug:
            raise ValueError("_debug outputs are not available under mesh=")
        if linearize_traj is None:
            return _shard_over_ens(
                mesh,
                lambda m0_, ps_: ek1_fused_solve(
                    f, jac, m0_, ps_, t0, dt, n_steps, q,
                    smooth=smooth, prior=prior, diffusion=diffusion,
                ),
                (m0, ps), in_axes=(2, 1),
                out_axes=(2, 2) if static is None else (2, 2, 0),
            )
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, lin_: ek1_fused_solve(
                f, jac, m0_, ps_, t0, dt, n_steps, q,
                smooth=smooth, prior=prior, linearize_traj=lin_,
            ),
            (m0, ps, linearize_traj), in_axes=(2, 1, 2), out_axes=(2, 2),
        )

    nq = q + 1
    _, d, B = m0.shape
    D = d * nq
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    T = int(n_steps)

    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)

    common = dict(At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
                  pinv0=float(1.0 / p_np[0]), T=T, d=d, nq=nq)
    fkernel = functools.partial(
        _ek1_filter_states_kernel, f=f, jac=jac,
        pinv1=float(1.0 / p_np[1]), dt=float(dt), t0=float(t0),
        stream_Lp=smooth, static_diff=static, **common,
    )

    # packed row: [ L row (D) | mean (1) | s2 (1) | tril(Lp) (D) ],
    # double-buffered; the Lp columns (smooth only) let the smoother
    # skip re-factorizing — see _ek1_filter_states_kernel
    W = (2 * D + 2) if smooth else (D + 2)
    scratch = [
        pltpu.VMEM((2, D, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    if linearize_traj is None:
        if static is not None:
            def fentry(m0_blk, p_blk, st_hbm, sig_blk, row, sem):
                b = pl.program_id(0)
                fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                        st_hbm.at[b], row, sem,
                        sig_ref=sig_blk.at[jnp.int32(0)])
        else:
            def fentry(m0_blk, p_blk, st_hbm, row, sem):
                b = pl.program_id(0)
                fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                        st_hbm.at[b], row, sem)

        fin_specs = []
        fin_args = ()
        fscratch = scratch
    else:
        if linearize_traj.shape != (T + 1, d, B):
            raise ValueError(
                f"linearize_traj must have shape {(T + 1, d, B)}, got "
                f"{linearize_traj.shape}"
            )
        lin_b = linearize_traj.astype(dtype).reshape(
            T + 1, d, nb, _SUB, _LANE
        ).transpose(2, 0, 1, 3, 4)

        def fentry(m0_blk, p_blk, lin_hbm, st_hbm, row, sem, lrow, lsem):
            b = pl.program_id(0)
            fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                    st_hbm.at[b], row, sem,
                    lin_ref=lin_hbm.at[b], lrow=lrow, lsem=lsem)

        fin_specs = [pl.BlockSpec(memory_space=pl.ANY)]
        fin_args = (lin_b,)
        fscratch = scratch + [
            pltpu.VMEM((2, d, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    f_out_specs = pl.BlockSpec(memory_space=pl.ANY)
    f_out_shape = jax.ShapeDtypeStruct((nb, T + 1, D, W, _SUB, _LANE), dtype)
    if static is not None:
        if linearize_traj is not None:
            raise NotImplementedError(
                "IEKS linearization streams require the dynamic model"
            )
        f_out_specs = [
            f_out_specs,
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        f_out_shape = [
            f_out_shape, jax.ShapeDtypeStruct((nb, 1, _SUB, _LANE), dtype),
        ]
    out_f = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ] + fin_specs,
        out_specs=f_out_specs,
        out_shape=f_out_shape,
        scratch_shapes=fscratch,
    )(m0_p, ps_b, *fin_args)
    if static is not None:
        st, sig = out_f
        sigv = sig[:, 0].reshape(B)
        sscale = jnp.sqrt(sigv)
    else:
        st = out_f

    if not smooth:
        # filter means/stds derived from the packed stream (preconditioned)
        pinv0 = common["pinv0"]
        us = pinv0 * st[:, :, :d, D]
        stds = pinv0 * jnp.sqrt(jnp.sum(st[:, :, :d, :D] ** 2, axis=3))
        us = us.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
        stds = stds.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
        if static is not None:
            return us, stds * sscale[None, None], sigv
        return us, stds

    skernel = functools.partial(_ekd_smoother_kernel, **common)

    def sentry(st_hbm, us_blk, std_blk, row, sem):
        b = pl.program_id(0)
        skernel(st_hbm.at[b], us_blk.at[jnp.int32(0)],
                std_blk.at[jnp.int32(0)], row, sem)

    us_s, std_s = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, T + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, T + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, T + 1, d, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(st)

    us = us_s.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    stds = std_s.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    if static is not None:
        # exit rescale: uniform scaling commutes with the RTS recursion
        stds = stds * sscale[None, None]
        if _debug:
            return us, stds, sigv, st
        return us, stds, sigv
    if _debug:
        return us, stds, st
    return us, stds


@_no_x64
def ek1_fused_sample(
    f: Callable,
    jac: Callable,
    m0: jax.Array,        # (q+1, d, B)
    ps: jax.Array,        # (n_params, B)
    normals: jax.Array,   # (T+1, S, D, B), D = d(q+1)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    prior=None,
    mesh=None,
):
    """Fused EK1 joint-posterior sampling: D x D filter kernel + backward
    dense-factor sampler kernel. Returns ``us`` (T+1, S, d, B) — ``S``
    joint solution-path samples per member from the exact smoothing
    posterior; the gain/factor work per step is sample-independent and
    shared (measured: S=4 on FHN q=3 runs at the fused smoother's cost —
    1.9M sample paths/s @ 8192 members). Remote-chip compile of the
    D x D sampler unroll is slow (~18 min at q=3, S=4; cached after).
    Reference: `/root/reference/src/solution_sampling.jl:24-62`."""
    if jac is None:
        jac = _auto_jac(f)
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, z_: (ek1_fused_sample(
                f, jac, m0_, ps_, z_, t0, dt, n_steps, q, prior=prior,
            ),),
            (m0, ps, normals), in_axes=(2, 1, 3), out_axes=(3,),
        )[0]
    nq = q + 1
    _, d, B = m0.shape
    D = d * nq
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    if (
        normals.ndim != 4
        or normals.shape[0] != n_steps + 1
        or normals.shape[2:] != (D, B)
    ):
        raise ValueError(
            f"normals must have shape {(n_steps + 1, 'S', D, B)}, got "
            f"{normals.shape}"
        )
    S = int(normals.shape[1])
    nb = B // BLOCK
    T = int(n_steps)

    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    z_b = normals.astype(dtype).reshape(
        T + 1, S, D, nb, _SUB, _LANE
    ).transpose(3, 0, 1, 2, 4, 5)

    common = dict(At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
                  pinv0=float(1.0 / p_np[0]), T=T, d=d, nq=nq)
    fkernel = functools.partial(
        _ek1_filter_states_kernel, f=f, jac=jac,
        pinv1=float(1.0 / p_np[1]), dt=float(dt), t0=float(t0),
        stream_Lp=True, **common,
    )

    W = 2 * D + 2
    fscratch = [
        pltpu.VMEM((2, D, W, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def fentry(m0_blk, p_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                st_hbm.at[b], row, sem)

    st = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nb, T + 1, D, W, _SUB, _LANE), dtype),
        scratch_shapes=fscratch,
    )(m0_p, ps_b)

    skernel = functools.partial(_ekd_sampler_kernel, S=S, **common)

    def sentry(st_hbm, z_hbm, us_hbm, row, sem, zrow, zsem, orow, osem):
        b = pl.program_id(0)
        skernel(st_hbm.at[b], z_hbm.at[b], us_hbm.at[b],
                row, sem, zrow, zsem, orow, osem)

    us_s = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((nb, T + 1, S, d, _SUB, _LANE), dtype),
        scratch_shapes=[
            pltpu.VMEM((2, D, W, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, S, D, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, S, d, _SUB, _LANE), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(st, z_b)

    return us_s.transpose(1, 2, 3, 0, 4, 5).reshape(T + 1, S, d, B)


def sample_ensemble_ek1_pallas(
    prob_f: Callable,
    prob_jac: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_steps: int,
    key,
    q: int = 3,
    n_samples: int = 1,
    prior=None,
    mesh=None,
):
    """Joint EK1 posterior samples over an ensemble at kernel speed:
    Taylor init + fused D x D filter + fused backward sampler.
    (T+1, d, B) for ``n_samples=1``, else (T+1, n_samples, d, B)."""
    from odefilters.taylor import taylor_coefficients

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d = u0s.shape

    def init_one(u0, p):
        return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)
    S = int(n_samples)
    normals = jax.random.normal(
        key, (int(n_steps) + 1, S, d * (q + 1), B), m0.dtype
    )
    us = ek1_fused_sample(
        prob_f, prob_jac, m0, ps.T, normals, float(t0), float(dt),
        n_steps, q, prior=prior, mesh=mesh,
    )
    return us[:, 0] if S == 1 else us


def solve_ensemble_ek1_pallas(
    prob_f: Callable,
    prob_jac: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_steps: int,
    q: int = 3,
    smooth: bool = True,
    prior=None,
    mesh=None,
    linearize_traj=None,
    diffusion: str = "dynamic",
):
    """Taylor-init + fused EK1 filter(+smoother) over an ensemble.
    ``diffusion``: dynamic (default) or a static scalar model
    (fixed / fixedMAP) — static returns ``(us, stds, sigma2)`` with
    exit-rescaled stds (see :func:`ek0_fused_filter`)."""
    from odefilters.taylor import taylor_coefficients

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d = u0s.shape

    def init_one(u0, p):
        return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)
    return ek1_fused_solve(
        prob_f, prob_jac, m0, ps.T, float(t0), float(dt), n_steps, q,
        smooth=smooth, prior=prior, mesh=mesh,
        linearize_traj=linearize_traj, diffusion=diffusion,
    )


# ==========================================================================
# Adaptive-step ensemble kernel: each lane (ensemble member) carries its
# own (t, dt, PI-controller memory) and the full per-member filter state
# stays in VMEM for the whole solve. Step-size divergence across the SIMD
# lanes is handled with masked commits; solution output lands on a shared
# uniform save grid which acts as a global barrier (every lane's step is
# truncated to land exactly on the next save point, the host driver's
# tstops semantics, `odefilters/solve.py` body / alg_utils.jl:13-24).
#
# Per-lane preconditioning: the state lives in preconditioned coordinates
# w.r.t. each lane's *current* step size h (constant A, Q — priors.jl:7-59);
# when the controller changes h, the coordinates are rescaled by
# (h_new/h_old)^(i - q - 1/2) per derivative block (exact, pure VPU
# exp/log). This keeps f32 viable where vanilla (h-dependent) coordinates
# would be catastrophically ill-conditioned (preconditioning.jl:1-17).
# ==========================================================================

_GAMMA, _QMIN, _QMAX, _QOLDINIT = 0.9, 0.2, 10.0, 1e-4


def _cheb_transition_lists(cheb, lh, nq):
    """Per-lane preconditioned transition for non-IWP priors in the
    ADAPTIVE kernels: Clenshaw-evaluate the Chebyshev tabulation
    (`priors.chebyshev_transition_fit`) of every (At(h), QLt(h)) entry at
    each lane's log-step ``lh`` — pure VPU fma chains, no gathers.
    Entries that are constant in h fold back to static floats (recovering
    the IWP-like sparsity at trace time). Returns ``(At, QLt, Qt)`` as
    nq x nq lists of lane arrays / floats.
    """
    llo, lhi = float(cheb["llo"]), float(cheb["lhi"])
    xi = jnp.clip((2.0 * lh - (llo + lhi)) / (lhi - llo), -1.0, 1.0)

    def entry(c):
        c = np.asarray(c, np.float64)
        if np.abs(c[1:]).max() <= 1e-13 * max(1.0, abs(float(c[0]))):
            return float(c[0])          # h-independent entry: static
        b1 = jnp.zeros_like(xi)
        b2 = jnp.zeros_like(xi)
        for ck in c[:0:-1]:
            b1, b2 = float(ck) + 2.0 * xi * b1 - b2, b1
        return float(c[0]) + xi * b1 - b2

    cA, cL = cheb["cA"], cheb["cL"]
    At = [[entry(cA[:, i, l]) for l in range(nq)] for i in range(nq)]
    QLt = [[entry(cL[:, i, l]) for l in range(nq)] for i in range(nq)]

    def _is0(x):
        return isinstance(x, float) and x == 0.0

    Qt = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [QLt[i][k] * QLt[l][k] for k in range(nq)
                 if not (_is0(QLt[i][k]) or _is0(QLt[l][k]))],
                0.0,
            )
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    return At, QLt, Qt


def _ek0_adaptive_kernel(
    m0_ref, p_ref, dt0_ref, us_ref, std_ref, ll_ref, nacc_ref, nrej_ref,
    fail_ref, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    S: int, dt_save: float, t0: float, d: int, nq: int,
    abstol: float, reltol: float, max_iters: int, dtmin: float,
    beta1: float, beta2: float, cheb=None, so: bool = False,
):
    q_half = nq - 1 + 0.5          # q + 1/2

    def _is0(x):
        return isinstance(x, float) and x == 0.0

    h0 = dt0_ref[0]                                  # (8, 128) per-lane dt0
    zero = jnp.zeros_like(h0)
    one = zero + 1.0

    # the carry is UNPRECONDITIONED: preconditioning is applied freshly
    # from the canonical state each attempt (as the XLA driver does,
    # `step.py`). Carrying the preconditioned state and rescaling it
    # incrementally on h changes compounds exp/log roundoff across steps
    # and floors the error estimate ~25x above the XLA driver's at
    # reltol=1e-6 in f32 (measured).
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    C = [[zero for _ in range(nq)] for _ in range(nq)]
    p_block = p_ref[:]

    for j in range(d):
        us_ref[0, j] = m0_ref[0, j]
    std_ref[0] = zero

    u_prev = [m0_ref[0, j] for j in range(d)]

    def cond(carry):
        seg, iters = carry[0], carry[1]
        return (seg < S) & (iters < max_iters)

    def body(carry):
        (seg, iters, t, dt, qold, ll, nacc, nrej, failed,
         m, C, u_prev) = carry
        dtype = zero.dtype
        t_save = jnp.asarray(t0, dtype) + jnp.asarray(dt_save, dtype) * (
            seg.astype(dtype) + 1.0
        )
        not_failed = failed < 0.5
        active = (t < t_save) & not_failed
        remaining = t_save - t
        hit_save = dt >= remaining
        dt_eff = jnp.where(active, jnp.where(hit_save, remaining, dt), one)

        # -- precondition at this attempt's h (fresh from canonical) --
        lh = jnp.log(dt_eff)
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        mh = [[m[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        Ch = [[C[i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
              for i in range(nq)]
        pinv0 = jnp.exp(q_half * lh)
        pinv1 = jnp.exp((q_half - 1.0) * lh)
        # per-lane transition: static IWP constants, or the Chebyshev
        # tabulation of the non-IWP prior at each lane's current h
        if cheb is None:
            Atl = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
            Qtl = [[float(Qt[i, l]) for l in range(nq)] for i in range(nq)]
        else:
            Atl, _, Qtl = _cheb_transition_lists(cheb, lh, nq)
        # measured derivative block: 1 (z = E1 x - f) or, second-order,
        # 2 (z = E2 x - f(du, u); step.py:175-181)
        bx = 2 if so else 1
        pb = jnp.exp((q_half - bx) * lh)
        hq = pb * pb * Qtl[bx][bx]

        # -- one EK0(dynamic) step in the lane-local preconditioned frame --
        mp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Atl[i][l] * mh[l][j] for l in range(nq)
                     if not _is0(Atl[i][l])],
                )
                for j in range(d)
            ]
            for i in range(nq)
        ]
        t_new = jnp.where(hit_save, t_save, t + dt_eff)
        u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
        if so:
            du_pred = jnp.stack([pinv1 * mp[1][j] for j in range(d)])
            du = f(du_pred, u_pred, p_block, t_new)
        else:
            du = f(u_pred, p_block, t_new)
        z = [pb * mp[bx][j] - du[j] for j in range(d)]
        zz = functools.reduce(lambda a, b: a + b, [zj * zj for zj in z])
        s2 = zz / (d * hq)
        tmp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Atl[i][a] * Ch[a][b] for a in range(nq)
                     if not _is0(Atl[i][a])],
                )
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        Cp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [tmp[i][b] * Atl[l][b] for b in range(nq)
                     if not _is0(Atl[l][b])],
                )
                + Qtl[i][l] * s2
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        s = pb * pb * Cp[bx][bx]
        inv_s = 1.0 / s
        kg = [pb * Cp[i][bx] * inv_s for i in range(nq)]
        m_new = [[mp[i][j] - kg[i] * z[j] for j in range(d)] for i in range(nq)]
        C_new = [
            [Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)] for i in range(nq)
        ]
        ll_inc = -0.5 * (
            zz * inv_s + d * (jnp.log(jnp.maximum(s, 1e-30)) + _LOG_2PI)
        )
        u_filt = [pinv0 * m_new[0][j] for j in range(d)]

        # -- error estimate (EK0 dynamic: sqrt(s2 hq) == sqrt(zz/d)) --
        err_unscaled = jnp.sqrt(zz / d)
        ee = zero
        for j in range(d):
            sc = abstol + reltol * jnp.maximum(
                jnp.abs(u_prev[j]), jnp.abs(u_filt[j])
            )
            r = dt_eff * err_unscaled / sc
            ee = ee + r * r
        EEst = jnp.sqrt(ee / d)
        EEst = jnp.where(jnp.isfinite(EEst), EEst, 1e10)
        accept = active & (EEst <= 1.0)

        # -- per-lane PI controller (OrdinaryDiffEq constants) --
        eg = jnp.maximum(EEst, 1e-35)
        leg = jnp.log(eg)
        q11 = jnp.exp(beta1 * leg)
        qq = q11 * jnp.exp(-beta2 * jnp.log(jnp.maximum(qold, 1e-35)))
        qq = jnp.maximum(1.0 / _QMAX, jnp.minimum(1.0 / _QMIN, qq / _GAMMA))
        dt_acc = dt_eff / qq
        # a step truncated to land on a save barrier must not collapse the
        # controller's step size (solve.py dtcache behavior)
        last_seg = seg >= S - 1
        dt_acc = jnp.where(hit_save & ~last_seg, jnp.maximum(dt_acc, dt), dt_acc)
        qold_acc = jnp.maximum(EEst, _QOLDINIT)
        dt_rej = dt_eff / jnp.minimum(1.0 / _QMIN, q11 / _GAMMA)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        # a lane fails when its next dt collapses below dtmin (accepted or
        # not: accepts can shrink dt too) or when an accepted step makes no
        # floating-point progress (t + dt == t would spin forever)
        newly_failed = active & ~hit_save & (
            (dt_new < dtmin) | (accept & (t_new <= t))
        )
        failed = jnp.maximum(failed, jnp.where(newly_failed, one, zero))
        not_failed = failed < 0.5

        # -- un-precondition, then masked commits --
        m_new = [[m_new[i][j] / ps_[i] for j in range(d)] for i in range(nq)]
        C_new = [
            [C_new[i][l] / (ps_[i] * ps_[l]) for l in range(nq)]
            for i in range(nq)
        ]
        m = [
            [jnp.where(accept, m_new[i][j], m[i][j]) for j in range(d)]
            for i in range(nq)
        ]
        C = [
            [jnp.where(accept, C_new[i][l], C[i][l]) for l in range(nq)]
            for i in range(nq)
        ]
        t = jnp.where(accept, t_new, t)
        dt = jnp.where(active & not_failed, dt_new, dt)
        qold = jnp.where(accept, qold_acc, qold)
        ll = jnp.where(accept, ll + ll_inc, ll)
        u_prev = [jnp.where(accept, u_filt[j], u_prev[j]) for j in range(d)]
        nacc = nacc + jnp.where(accept, one, zero)
        nrej = nrej + jnp.where(active & ~accept, one, zero)
        # failed lanes stop blocking barriers (their output is garbage and
        # flagged): park them past every future save point
        t = jnp.where(not_failed, t, zero + jnp.asarray(1e30, zero.dtype))

        # -- barrier: all lanes at the save point -> emit one row --
        seg_done = jnp.min(jnp.where(t >= t_save, one, zero)) > 0.5

        @pl.when(seg_done)
        def _():
            seg1 = seg + jnp.ones((), seg.dtype)
            for j in range(d):
                us_ref[seg1, j] = m[0][j]
            std_ref[seg1] = jnp.sqrt(jnp.maximum(C[0][0], 0.0))

        seg = jnp.where(seg_done, seg + 1, seg)
        return (seg, iters + 1, t, dt, qold, ll, nacc, nrej, failed,
                m, C, u_prev)

    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        zero + jnp.asarray(t0, zero.dtype), h0,
        zero + _QOLDINIT, zero, zero, zero,
        jnp.zeros_like(h0), m, C, u_prev,
    )
    out = jax.lax.while_loop(cond, body, init)
    ll_ref[...] = out[5]
    nacc_ref[...] = out[6]
    nrej_ref[...] = out[7]
    # lanes that never completed (iters exhausted) are failures too
    fail_ref[...] = jnp.where(
        (out[8] > 0.5) | (out[0] < S),
        jnp.ones_like(out[5]), jnp.zeros_like(out[5]),
    )


@_no_x64
def ek0_adaptive_filter(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,) per-member initial dt (Hairer heuristic)
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Adaptive-step fused EK0(dynamic) ensemble filter, per-lane dt.

    Each ensemble member runs its own PI-controlled adaptive step loop
    (OrdinaryDiffEq constants, `alg_utils.jl:13-24`; accept/reject as in
    `perform_step.jl:78-92`) entirely inside one Pallas kernel; the
    solution is emitted on the shared uniform grid of ``n_save`` intervals
    over ``[t0, t1]`` on which every lane lands exactly (tstops
    semantics). ``second_order``: measure derivative block 2 against
    ``f(du, u, p, t)`` (`step.py:175-181`); ``us`` then holds the
    position block. Returns ``(us, stds, lls, nacc, nrej, failed)`` with
    shapes ((S+1, d, B), (S+1, B), (B,), (B,), (B,), (B,)).
    """
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_: ek0_adaptive_filter(
                f, m0_, ps_, dt0_, t0, t1, n_save, q, abstol=abstol,
                reltol=reltol, max_iters=max_iters, dtmin=dtmin,
                prior=prior, second_order=second_order,
            ),
            (m0, ps, dt0s), in_axes=(2, 1, 0),
            out_axes=(2, 1, 0, 0, 0, 0),
        )
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        # below ~eps * span a step cannot advance t at all (t + dt == t),
        # so the lane would spin forever without tripping the dtmin guard
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    Qt_np = QLt_np @ QLt_np.T
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    # non-IWP priors: per-lane h-dependent transitions via the Chebyshev
    # tabulation over the controller's step range (VERDICT r2 item 7)
    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)

    kernel = functools.partial(
        _ek0_adaptive_kernel,
        f=f, At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order),
    )

    def entry(m0_blk, p_blk, dt0_blk, us_blk, std_blk, ll_blk, na_blk,
              nr_blk, fl_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    us, stds, lls, nacc, nrej, fail = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            lane(), lane(), lane(), lane(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, S + 1, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
        ],
    )(m0_b, ps_b, dt0_b)

    us = us.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    stds = stds.transpose(1, 0, 2, 3).reshape(S + 1, B)
    return (us, stds, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def solve_ensemble_ek0_adaptive_pallas(
    prob_f: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Taylor-init + per-lane-adaptive fused EK0 kernel over an ensemble.

    ``n_save``: number of uniform save intervals (every member lands on
    the save grid exactly, like tstops in the host driver). ``prior``:
    IWP (default) runs on h-free constants; IOUP/Matern evaluate their
    h-dependent preconditioned transition per lane from a Chebyshev
    tabulation (exact to ~1e-12 over the step range; ~2x the per-attempt
    flops). ``second_order``: ``u0s = [u0 | du0]`` (B, 2d) with
    ``prob_f(du, u, p, t)``; ``us`` holds the position block.
    """
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(
                prob_f, u0_full[:d], u0_full[d:], tspan, p=p
            )
        else:
            m = jnp.stack(taylor_coefficients(prob_f, u0_full, p, t0, q))
            pr = ode_problem(prob_f, u0_full, tspan, p=p)
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    return ek0_adaptive_filter(
        prob_f, m0, ps.T, dt0s, float(t0), float(t1), n_save, q,
        abstol=abstol, reltol=reltol, max_iters=max_iters, prior=prior,
        mesh=mesh, second_order=second_order,
    )


# ==========================================================================
# Large-d single-trajectory EK0-Kronecker kernel (PDE scale).
#
# For EK0 with scalar diffusion and isotropic init the covariance is
# exactly Ct (x) I_d (the Kronecker structure of `odefilters/ops/kron.py`),
# so one trajectory of a semi-discretized PDE with d ~ 1e4 states carries
# only nq grids (the state mean per derivative order) + an (nq, nq) scalar
# matrix. The whole time loop runs in VMEM; the vector field is a stencil
# traced into the kernel on (N, M) grid values (jnp.roll lowers to lane /
# sublane rotates). Replaces T x (dispatch + HBM round-trip) of the XLA
# scan path with straight-line VPU code (~28k steps/s XLA -> kernel, one
# chip, d = 9800). Reference analogue: none (the reference is dense-only
# and single-threaded; BASELINE config #4).
# ==========================================================================


def _ek0_kron_step_lists(
    m, C, t_new, *,
    f_grids: Callable, p, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, d: int, ns: int, nq: int,
):
    """One EK0 step on the Kronecker PDE-grid state: per-species (N, M)
    grid means, ONE shared scalar (q+1, q+1) covariance (the EK0 update
    preserves the Kronecker structure exactly — `ops/kron.py` recursion).
    Extracted from the kernel body so the roofline can count ITS jaxpr
    (`benchmarks/roofline.py`). Returns (m_new, C_new, ll_inc)."""
    hq = pinv1 * pinv1 * Qt[1, 1]
    mp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [At[i, l] * m[l][s] for l in range(nq)
                 if At[i, l] != 0.0],
            )
            for s in range(ns)
        ]
        for i in range(nq)
    ]
    u_pred = [pinv0 * mp[0][s] for s in range(ns)]
    du = f_grids(u_pred, p, t_new)
    z = [pinv1 * mp[1][s] - du[s] for s in range(ns)]
    zz = functools.reduce(
        lambda a, b: a + b, [jnp.sum(zs * zs) for zs in z]
    )
    s2 = zz / (d * hq)
    tmp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [At[i, a] * C[a][b] for a in range(nq)
                 if At[i, a] != 0.0],
            )
            for b in range(nq)
        ]
        for i in range(nq)
    ]
    Cp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [tmp[i][b] * At[l, b] for b in range(nq)
                 if At[l, b] != 0.0],
            )
            + Qt[i, l] * s2
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    sc = pinv1 * pinv1 * Cp[1][1]
    inv_s = 1.0 / sc
    kg = [pinv1 * Cp[i][1] * inv_s for i in range(nq)]
    m_new = [
        [mp[i][s] - kg[i] * z[s] for s in range(ns)] for i in range(nq)
    ]
    C_new = [
        [Cp[i][l] - kg[i] * kg[l] * sc for l in range(nq)]
        for i in range(nq)
    ]
    ll_inc = -0.5 * (
        zz * inv_s + d * (jnp.log(jnp.maximum(sc, 1e-30)) + _LOG_2PI)
    )
    return m_new, C_new, ll_inc


def _ek0_kron_grid_kernel(
    m0_ref, us_ref, var_ref, ll_ref, *,
    f_grids: Callable, p, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, T: int, dt: float, t0: float,
    d: int, ns: int, nq: int, save_every: int,
):
    m_init = [[m0_ref[i, s] for s in range(ns)] for i in range(nq)]
    zero_g = jnp.zeros_like(m_init[0][0])
    sdtype = m_init[0][0].dtype
    zero = jnp.zeros((), sdtype)
    C_init = [[zero for _ in range(nq)] for _ in range(nq)]

    for s in range(ns):
        us_ref[0, s] = pinv0 * m_init[0][s]
    var_ref[0] = jnp.zeros_like(var_ref[0])

    step = functools.partial(
        _ek0_kron_step_lists, f_grids=f_grids, p=p, At=At, Qt=Qt,
        pinv0=pinv0, pinv1=pinv1, d=d, ns=ns, nq=nq,
    )

    def body(k, carry):
        m, C, ll = carry
        k1 = k + jnp.ones((), k.dtype)
        t_new = jnp.asarray(t0, sdtype) + jnp.asarray(dt, sdtype) * (
            k.astype(sdtype) + jnp.asarray(1.0, sdtype)
        )
        m_new, C_new, ll_inc = step(m, C, t_new)
        ll = ll + ll_inc

        @pl.when(jax.lax.rem(k1, jnp.int32(save_every)) == 0)
        def _():
            row = k1 // jnp.int32(save_every)
            for s in range(ns):
                us_ref[row, s] = pinv0 * m_new[0][s]
            var_ref[row] = jnp.full_like(
                var_ref[0], pinv0 * pinv0 * jnp.maximum(C_new[0][0], 0.0)
            )

        return m_new, C_new, ll

    _, _, ll = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m_init, C_init, zero)
    )
    ll_ref[...] = jnp.full_like(ll_ref[...], ll)


@_no_x64
def ek0_kron_grid_solve(
    f_grids: Callable,
    m0: jax.Array,      # (q+1, ns, N, M) unpreconditioned Taylor init
    p,
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    save_every: int = 1,
    prior=None,
):
    """Fused single-trajectory EK0(dynamic) filter for grid-shaped states.

    ``f_grids(fields, p, t)`` maps a list of ``ns`` ``(N, M)`` grids to the
    list of their time derivatives (stencils via ``jnp.roll`` supported);
    ``p`` is a pytree of *scalars* baked into the kernel. Returns
    ``(us, var, ll)``: saved solution grids ``(S+1, ns, N, M)`` (every
    ``save_every`` steps), the isotropic marginal solution variance per
    save point ``(S+1,)``, and the data log-likelihood (scalar).
    """
    nq = q + 1
    _, ns, N, M = m0.shape
    d = ns * N * M
    T = int(n_steps)
    if T % save_every:
        raise ValueError("save_every must divide n_steps")
    S = T // save_every

    # fixed dt: the preconditioned transition of ANY Gauss-Markov prior is
    # a compile-time constant here, exactly like the ensemble kernels
    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    Qt_np = QLt_np @ QLt_np.T
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    m0_p = jnp.asarray(p_np, dtype)[:, None, None, None] * m0

    kernel = functools.partial(
        _ek0_kron_grid_kernel,
        f_grids=f_grids, p=p,
        At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        pinv0=float(1.0 / p_np[0]), pinv1=float(1.0 / p_np[1]),
        T=T, dt=float(dt), t0=float(t0), d=d, ns=ns, nq=nq,
        save_every=int(save_every),
    )

    us, var, ll = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S + 1, ns, N, M), dtype),
            jax.ShapeDtypeStruct((S + 1, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((_SUB, _LANE), dtype),
        ],
    )(m0_p)
    return us, var[:, 0, 0], ll[0, 0]


def solve_brusselator_ek0_pallas(
    N: int,
    tspan,
    n_steps: int,
    q: int = 3,
    alpha: float = 0.1,
    save_every: Optional[int] = None,
    dtype=None,
    prior=None,
):
    """Taylor-init + fused Kron-grid EK0 solve of the 2-D Brusselator
    (BASELINE config #4, d = 2 N^2 states on one chip). ``dtype`` pins the
    kernel precision (pass float32 on TPU when the global x64 flag is on —
    Mosaic has no 64-bit types)."""
    from odefilters.models import brusselator_2d
    from odefilters.taylor import taylor_coefficients

    prob = brusselator_2d(N=N, tspan=tspan, alpha=alpha)
    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    if save_every is None:
        save_every = max(1, n_steps // 20)

    m0_flat = jnp.stack(
        taylor_coefficients(prob.f, prob.u0, prob.p, t0, q)
    )                                    # (q+1, d)
    m0 = m0_flat.reshape(q + 1, 2, N, N)
    if dtype is not None:
        m0 = m0.astype(dtype)

    from odefilters.models.library import brusselator_2d_f_grids

    f_grids = brusselator_2d_f_grids(N, alpha)

    return ek0_kron_grid_solve(
        f_grids, m0, None, float(t0), float(dt), n_steps, q,
        save_every=save_every, prior=prior,
    )


def solve_brusselator_ek1d_pallas(
    N: int,
    tspan,
    n_steps: int,
    q: int = 3,
    alpha: float = 0.1,
    save_every: Optional[int] = None,
    dtype=None,
    prior=None,
):
    """Taylor-init + fused Kron-grid *DiagonalEK1* solve of the 2-D
    Brusselator: the stiff-regime counterpart of
    :func:`solve_brusselator_ek0_pallas` (the diagonal gain sees each
    point's own reaction+diffusion decay rate)."""
    from odefilters.models import brusselator_2d
    from odefilters.models.library import (
        brusselator_2d_f_grids,
        brusselator_2d_jd_grids,
    )
    from odefilters.taylor import taylor_coefficients

    prob = brusselator_2d(N=N, tspan=tspan, alpha=alpha)
    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    if save_every is None:
        save_every = max(1, n_steps // 20)

    m0_flat = jnp.stack(
        taylor_coefficients(prob.f, prob.u0, prob.p, t0, q)
    )
    m0 = m0_flat.reshape(q + 1, 2, N, N)
    if dtype is not None:
        m0 = m0.astype(dtype)

    return ek1d_kron_grid_solve(
        brusselator_2d_f_grids(N, alpha), brusselator_2d_jd_grids(N, alpha),
        m0, None, float(t0), float(dt), n_steps, q,
        save_every=save_every, prior=prior,
    )


# ==========================================================================
# Large-d single-trajectory DiagonalEK1 grid kernel (stiff PDE scale).
#
# DiagonalEK1 (Kraemer et al., ICML 2022; see odefilters/algorithms.py)
# linearizes with diag(J), so every grid point runs its own scalar-
# measurement Kalman filter: the covariance generalizes from the EK0
# kernel's (nq, nq) scalars to nq x nq PER-POINT fields (one (N, M) grid
# per derivative pair per state field — q=3, ns=2 carries 40 grids, well
# inside VMEM at Brusselator scale). The per-step cost stays O(d q^2) and
# fully element-wise (pure VPU), but the gain sees each point's own decay
# rate — the fused on-chip path for stiff diagonal-dominant PDEs where
# EK0 step counts blow up and dense EK1 is unaffordable. Plain-covariance
# recursion, like the EK0 grid kernel: the scalar-measurement update is
# Joseph-free and f32-viable (only the RTS *smoother* needs sqrt form).
# ==========================================================================


def _ek1d_kron_step_lists(
    m, C, t_new, *,
    f_grids: Callable, jd_grids: Callable, p, At: np.ndarray,
    Qt: np.ndarray, pinv0: float, pinv1: float, d: int, ns: int, nq: int,
):
    """One DiagonalEK1 step on per-point covariance fields: C[i][l][s]
    is an (N, M) grid; the per-point measurement row is
    ``h = pinv1 e1 - J_ss pinv0 e0`` with the in-kernel Jacobian diagonal.
    Extracted for roofline jaxpr counting.

    Round-5 lever: the per-point covariance is SYMMETRIC — Cp and C_new
    compute the upper triangle only with the lower mirror ALIASED (zero
    compute), and the carried C keeps the aliasing, cutting the
    dominant per-point covariance FLOPs ~2x (the same collapsed-row/
    symmetric algebra as the fast ensemble filter, minus the structural
    zero row: DiagonalEK1's collapsed direction is per-point
    J-dependent, so no row is STATICALLY zero). Returns
    (m_new, C_new, ll_inc)."""
    q00, q01, q11 = float(Qt[0, 0]), float(Qt[0, 1]), float(Qt[1, 1])
    mp = [
        [
            functools.reduce(
                lambda a, b: a + b,
                [At[i, l] * m[l][s] for l in range(nq)
                 if At[i, l] != 0.0],
            )
            for s in range(ns)
        ]
        for i in range(nq)
    ]
    u_pred = [pinv0 * mp[0][s] for s in range(ns)]
    du = f_grids(u_pred, p, t_new)
    jd = jd_grids(u_pred, p, t_new)          # ns per-point diagonals
    z = [pinv1 * mp[1][s] - du[s] for s in range(ns)]
    # per-point h = pinv1 e1 - jd pinv0 e0;  hq = h^T Qt h per point
    a = [jd[s] * pinv0 for s in range(ns)]
    hq = [
        pinv1 * pinv1 * q11 - 2.0 * pinv1 * q01 * a[s]
        + q00 * a[s] * a[s]
        for s in range(ns)
    ]
    # dynamic scalar diffusion: sigma^2 = mean_i z_i^2 / hq_i
    zz_hq = functools.reduce(
        lambda x, y: x + y, [jnp.sum(z[s] * z[s] / hq[s])
                             for s in range(ns)]
    )
    s2 = zz_hq / d
    # Cp = At C At^T + s2 Qt per point: upper triangle + aliased mirror
    tmp = [
        [
            [
                functools.reduce(
                    lambda x, y: x + y,
                    [At[i, a_] * C[a_][b][s] for a_ in range(nq)
                     if At[i, a_] != 0.0],
                )
                for s in range(ns)
            ]
            for b in range(nq)
        ]
        for i in range(nq)
    ]
    Cp = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for l in range(i, nq):
            Cp[i][l] = [
                functools.reduce(
                    lambda x, y: x + y,
                    [tmp[i][b][s] * At[l, b] for b in range(nq)
                     if At[l, b] != 0.0],
                )
                + Qt[i, l] * s2
                for s in range(ns)
            ]
            Cp[l][i] = Cp[i][l]              # aliased mirror (no compute)
    # hC[i] = h^T Cp e_i, sc = h^T Cp h, gain = hC / sc (per point)
    hC = [
        [pinv1 * Cp[1][i][s] - a[s] * Cp[0][i][s] for s in range(ns)]
        for i in range(nq)
    ]
    sc = [pinv1 * hC[1][s] - a[s] * hC[0][s] for s in range(ns)]
    inv_s = [1.0 / sc[s] for s in range(ns)]
    kg = [[hC[i][s] * inv_s[s] for s in range(ns)] for i in range(nq)]
    m_new = [
        [mp[i][s] - kg[i][s] * z[s] for s in range(ns)]
        for i in range(nq)
    ]
    C_new = [[None] * nq for _ in range(nq)]
    for i in range(nq):
        for l in range(i, nq):
            C_new[i][l] = [
                Cp[i][l][s] - kg[i][s] * kg[l][s] * sc[s]
                for s in range(ns)
            ]
            C_new[l][i] = C_new[i][l]        # aliased mirror
    ll_inc = -0.5 * (
        functools.reduce(
            lambda x, y: x + y,
            [
                jnp.sum(z[s] * z[s] * inv_s[s])
                + jnp.sum(jnp.log(jnp.maximum(sc[s], 1e-30)))
                for s in range(ns)
            ],
        )
        + d * _LOG_2PI
    )
    return m_new, C_new, ll_inc


def _ek1d_kron_grid_kernel(
    m0_ref, us_ref, var_ref, ll_ref, *,
    f_grids: Callable, jd_grids: Callable, p, At: np.ndarray,
    Qt: np.ndarray, pinv0: float, pinv1: float, T: int, dt: float,
    t0: float, d: int, ns: int, nq: int, save_every: int,
):
    m_init = [[m0_ref[i, s] for s in range(ns)] for i in range(nq)]
    zero_g = jnp.zeros_like(m_init[0][0])
    sdtype = m_init[0][0].dtype
    zero = jnp.zeros((), sdtype)
    # per-point covariance fields, C[i][l][s] an (N, M) grid
    C_init = [[[zero_g for _ in range(ns)] for _ in range(nq)]
              for _ in range(nq)]

    for s in range(ns):
        us_ref[0, s] = pinv0 * m_init[0][s]
    var_ref[0] = jnp.zeros_like(var_ref[0])

    step = functools.partial(
        _ek1d_kron_step_lists, f_grids=f_grids, jd_grids=jd_grids, p=p,
        At=At, Qt=Qt, pinv0=pinv0, pinv1=pinv1, d=d, ns=ns, nq=nq,
    )

    def body(k, carry):
        m, C, ll = carry
        k1 = k + jnp.ones((), k.dtype)
        t_new = jnp.asarray(t0, sdtype) + jnp.asarray(dt, sdtype) * (
            k.astype(sdtype) + jnp.asarray(1.0, sdtype)
        )
        m_new, C_new, ll_inc = step(m, C, t_new)
        ll = ll + ll_inc

        @pl.when(jax.lax.rem(k1, jnp.int32(save_every)) == 0)
        def _():
            row = k1 // jnp.int32(save_every)
            for s in range(ns):
                us_ref[row, s] = pinv0 * m_new[0][s]
                var_ref[row, s] = pinv0 * pinv0 * jnp.maximum(
                    C_new[0][0][s], 0.0
                )

        return m_new, C_new, ll

    _, _, ll = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m_init, C_init, zero)
    )
    ll_ref[...] = jnp.full_like(ll_ref[...], ll)


@_no_x64
def ek1d_kron_grid_solve(
    f_grids: Callable,
    jd_grids: Callable,
    m0: jax.Array,      # (q+1, ns, N, M) unpreconditioned Taylor init
    p,
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    save_every: int = 1,
    prior=None,
):
    """Fused single-trajectory DiagonalEK1(dynamic) filter on grid states.

    The DiagonalEK1 analogue of :func:`ek0_kron_grid_solve`:
    ``jd_grids(fields, p, t)`` returns the per-point Jacobian diagonal
    (same list-of-(N, M)-grids layout as ``f_grids``) — O(d) for the
    pointwise reaction terms of a typical semi-discretized PDE. Returns
    ``(us, var, ll)`` with per-point marginal solution variance
    ``(S+1, ns, N, M)`` (the EK0 kernel's variance is isotropic — one
    scalar per save row; the diagonal gain makes it a field).
    """
    nq = q + 1
    _, ns, N, M = m0.shape
    d = ns * N * M
    T = int(n_steps)
    if T % save_every:
        raise ValueError("save_every must divide n_steps")
    S = T // save_every

    At_np, QLt_np = _prior_consts_np(prior, q, float(dt))
    Qt_np = QLt_np @ QLt_np.T
    j = np.arange(nq, dtype=np.float64)
    p_np = float(dt) ** (j - q - 0.5)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    m0_p = jnp.asarray(p_np, dtype)[:, None, None, None] * m0

    kernel = functools.partial(
        _ek1d_kron_grid_kernel,
        f_grids=f_grids, jd_grids=jd_grids, p=p,
        At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        pinv0=float(1.0 / p_np[0]), pinv1=float(1.0 / p_np[1]),
        T=T, dt=float(dt), t0=float(t0), d=d, ns=ns, nq=nq,
        save_every=int(save_every),
    )

    us, var, ll = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S + 1, ns, N, M), dtype),
            jax.ShapeDtypeStruct((S + 1, ns, N, M), dtype),
            jax.ShapeDtypeStruct((_SUB, _LANE), dtype),
        ],
    )(m0_p)
    return us, var, ll[0, 0]


def _ek1_adaptive_kernel(
    m0_ref, p_ref, dt0_ref, us_ref, std_ref, ll_ref, nacc_ref, nrej_ref,
    fail_ref, *,
    f: Callable, jac: Callable, At: np.ndarray, QLt: np.ndarray,
    S: int, dt_save: float, t0: float, d: int, nq: int,
    abstol: float, reltol: float, max_iters: int, dtmin: float,
    beta1: float, beta2: float, cheb=None, so: bool = False,
):
    """Per-lane adaptive EK1(dynamic): the full D x D square-root EKF per
    member with its own PI controller, sharing the barrier/save-grid
    machinery of `_ek0_adaptive_kernel`.

    ``so``: second-order problems — measurement block 2 with both full
    partial Jacobians, ``H = (E2 - J_du E1 - J_u E0) P^-1``
    (`step.py:175-212`); ``jac(du, u, p, t) -> (J_u, J_du)``."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))
    q_half = nq - 1 + 0.5

    h0 = dt0_ref[0]
    zero = jnp.zeros_like(h0)
    one = zero + 1.0

    # carry is UNPRECONDITIONED (see _ek0_adaptive_kernel)
    m = [m0_ref[r // d, r % d] for r in range(D)]
    L = [[zero for _ in range(D)] for _ in range(D)]
    p_block = p_ref[:]

    for j in range(d):
        us_ref[0, j] = m0_ref[0, j]
        std_ref[0, j] = zero
    u_prev = [m0_ref[0, j] for j in range(d)]

    def _is0(x):
        return isinstance(x, float) and x == 0.0

    def cond(carry):
        seg, iters = carry[0], carry[1]
        return (seg < S) & (iters < max_iters)

    def body(carry):
        (seg, iters, t, dt, qold, ll, nacc, nrej, failed,
         m, L, u_prev) = carry
        dtype = zero.dtype
        t_save = jnp.asarray(t0, dtype) + jnp.asarray(dt_save, dtype) * (
            seg.astype(dtype) + 1.0
        )
        not_failed = failed < 0.5
        active = (t < t_save) & not_failed
        remaining = t_save - t
        hit_save = dt >= remaining
        dt_eff = jnp.where(active, jnp.where(hit_save, remaining, dt), one)

        # precondition at this attempt's h (fresh from the canonical state)
        lh = jnp.log(dt_eff)
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        mh = [m[r] * ps_[r // d] for r in range(D)]
        # the carry L is a FACTOR (Sigma = L L^T): preconditioning is the
        # left map P L — ROW scaling only. (A covariance takes the
        # symmetric P C P; scaling factor COLUMNS too is a right-multiply
        # by a diagonal that changes L L^T whenever h changes between
        # attempts — measured: stds collapse ~1e-5x over ~100 steps.)
        Lh = [[L[r][c] * ps_[r // d] for c in range(D)]
              for r in range(D)]
        pinv0 = jnp.exp(q_half * lh)
        pinv1 = jnp.exp((q_half - 1.0) * lh)
        # per-lane transition: static IWP constants, or the non-IWP
        # prior's Chebyshev tabulation at each lane's current h, expanded
        # to the kron-with-I_d full layout entrywise
        if cheb is None:
            Afl = [[float(Af[r, c]) for c in range(D)] for r in range(D)]
            QLfl = [[float(QLf[r, c]) for c in range(D)] for r in range(D)]
        else:
            Atl, QLtl, _ = _cheb_transition_lists(cheb, lh, nq)
            Afl = [[Atl[r // d][c // d] if (r % d) == (c % d) else 0.0
                    for c in range(D)] for r in range(D)]
            QLfl = [[QLtl[r // d][c // d] if (r % d) == (c % d) else 0.0
                     for c in range(D)] for r in range(D)]

        mp = [
            functools.reduce(
                lambda a, b: a + b,
                [Afl[r][c] * mh[c] for c in range(D) if not _is0(Afl[r][c])],
            )
            for r in range(D)
        ]
        t_new = jnp.where(hit_save, t_save, t + dt_eff)
        u_pred = jnp.stack([pinv0 * mp[j] for j in range(d)])
        if so:
            pinv2 = jnp.exp((q_half - 2.0) * lh)
            du_pred = jnp.stack([pinv1 * mp[d + a] for a in range(d)])
            ddu = f(du_pred, u_pred, p_block, t_new)
            Ju, Jdu = jac(du_pred, u_pred, p_block, t_new)
            z = [pinv2 * mp[2 * d + a] - ddu[a] for a in range(d)]

            def Hmul_cols(M, K):
                # H = (E2 - J_du E1 - J_u E0) P^-1 (step.py:207-212)
                out = []
                for a in range(d):
                    row_ = []
                    for kk in range(K):
                        v = pinv2 * M[2 * d + a][kk]
                        for b in range(d):
                            v = v - Jdu[a, b] * (pinv1 * M[d + b][kk])
                            v = v - Ju[a, b] * (pinv0 * M[b][kk])
                        row_.append(v)
                    out.append(row_)
                return out
        else:
            du = f(u_pred, p_block, t_new)
            J = jac(u_pred, p_block, t_new)
            z = [pinv1 * mp[d + a] - du[a] for a in range(d)]

            def Hmul_cols(M, K):
                out = []
                for a in range(d):
                    row_ = []
                    for kk in range(K):
                        v = pinv1 * M[d + a][kk]
                        for b in range(d):
                            v = v - J[a, b] * (pinv0 * M[b][kk])
                        row_.append(v)
                    out.append(row_)
                return out

        # dynamic diffusion + error statistic from H Q H^T
        QL_lists = [[zero if _is0(QLfl[r][c]) else QLfl[r][c] + zero
                     for c in range(D)] for r in range(D)]
        HQ = Hmul_cols(QL_lists, D)
        Sq = [
            [
                functools.reduce(
                    lambda x, y: x + y, [HQ[a][c] * HQ[b][c] for c in range(D)]
                )
                for b in range(d)
            ]
            for a in range(d)
        ]
        Lq = _list_chol(Sq, d)
        w = _list_cho_solve(Lq, z, d)
        s2 = functools.reduce(
            lambda x, y: x + y, [z[a] * w[a] for a in range(d)]
        ) / d
        sq_s2 = jnp.sqrt(jnp.maximum(s2, 0.0))

        AL = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Afl[r][c] * Lh[c][k] for c in range(D)
                     if not _is0(Afl[r][c])],
                )
                for k in range(D)
            ]
            for r in range(D)
        ]
        qT = [
            [0.0 if _is0(QLfl[r][c]) else sq_s2 * QLfl[r][c]
             for r in range(D)]
            for c in range(D)
        ]
        Lp = _list_mgs_tril(_t_rows(AL, D) + qT, 2 * D, D)

        Z = Hmul_cols(Lp, D)
        Sm = [
            [
                functools.reduce(
                    lambda x, y: x + y, [Z[a][c] * Z[b][c] for c in range(D)]
                )
                for b in range(d)
            ]
            for a in range(d)
        ]
        Ls = _list_chol(Sm, d)
        LpZt = [
            [
                functools.reduce(
                    lambda x, y: x + y, [Lp[r][c] * Z[a][c] for c in range(D)]
                )
                for a in range(d)
            ]
            for r in range(D)
        ]
        Kg = [_list_cho_solve(Ls, LpZt[r], d) for r in range(D)]
        m_new = [
            mp[r]
            - functools.reduce(
                lambda x, y: x + y, [Kg[r][a] * z[a] for a in range(d)]
            )
            for r in range(D)
        ]
        L_new = [
            [
                Lp[r][c]
                - functools.reduce(
                    lambda x, y: x + y, [Kg[r][a] * Z[a][c] for a in range(d)]
                )
                for c in range(D)
            ]
            for r in range(D)
        ]
        # log-likelihood increment: log N(z; 0, S) from the chol of S
        wz = _list_cho_solve(Ls, z, d)
        maha = functools.reduce(
            lambda x, y: x + y, [z[a] * wz[a] for a in range(d)]
        )
        logdet = 2.0 * functools.reduce(
            lambda x, y: x + y,
            [jnp.log(jnp.maximum(Ls[a][a], 1e-30)) for a in range(d)],
        )
        ll_inc = -0.5 * (maha + logdet + d * _LOG_2PI)

        u_filt = [pinv0 * m_new[j] for j in range(d)]

        # error estimate: err_j = dt sqrt(s2 (H Q H^T)_jj) / sc_j
        ee = zero
        for j in range(d):
            sc = abstol + reltol * jnp.maximum(
                jnp.abs(u_prev[j]), jnp.abs(u_filt[j])
            )
            r_ = dt_eff * jnp.sqrt(jnp.maximum(s2 * Sq[j][j], 0.0)) / sc
            ee = ee + r_ * r_
        EEst = jnp.sqrt(ee / d)
        EEst = jnp.where(jnp.isfinite(EEst), EEst, 1e10)
        accept = active & (EEst <= 1.0)

        eg = jnp.maximum(EEst, 1e-35)
        leg = jnp.log(eg)
        q11 = jnp.exp(beta1 * leg)
        qq = q11 * jnp.exp(-beta2 * jnp.log(jnp.maximum(qold, 1e-35)))
        qq = jnp.maximum(1.0 / _QMAX, jnp.minimum(1.0 / _QMIN, qq / _GAMMA))
        dt_acc = dt_eff / qq
        last_seg = seg >= S - 1
        dt_acc = jnp.where(hit_save & ~last_seg, jnp.maximum(dt_acc, dt), dt_acc)
        qold_acc = jnp.maximum(EEst, _QOLDINIT)
        dt_rej = dt_eff / jnp.minimum(1.0 / _QMIN, q11 / _GAMMA)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        # a lane fails when its next dt collapses below dtmin (accepted or
        # not: accepts can shrink dt too) or when an accepted step makes no
        # floating-point progress (t + dt == t would spin forever)
        newly_failed = active & ~hit_save & (
            (dt_new < dtmin) | (accept & (t_new <= t))
        )
        failed = jnp.maximum(failed, jnp.where(newly_failed, one, zero))
        not_failed = failed < 0.5

        # un-precondition (rows only — L is a factor), then masked commits
        m_new = [m_new[r] / ps_[r // d] for r in range(D)]
        L_new = [
            [L_new[r][c] / ps_[r // d] for c in range(D)]
            for r in range(D)
        ]
        m = [jnp.where(accept, m_new[r], m[r]) for r in range(D)]
        L = [
            [jnp.where(accept, L_new[r][c], L[r][c]) for c in range(D)]
            for r in range(D)
        ]
        t = jnp.where(accept, t_new, t)
        dt = jnp.where(active & not_failed, dt_new, dt)
        qold = jnp.where(accept, qold_acc, qold)
        ll = jnp.where(accept, ll + ll_inc, ll)
        u_prev = [jnp.where(accept, u_filt[j], u_prev[j]) for j in range(d)]
        nacc = nacc + jnp.where(accept, one, zero)
        nrej = nrej + jnp.where(active & ~accept, one, zero)
        t = jnp.where(not_failed, t, zero + jnp.asarray(1e30, zero.dtype))

        seg_done = jnp.min(jnp.where(t >= t_save, one, zero)) > 0.5

        @pl.when(seg_done)
        def _():
            seg1 = seg + jnp.ones((), seg.dtype)
            for j in range(d):
                us_ref[seg1, j] = m[j]
                std_ref[seg1, j] = jnp.sqrt(
                    functools.reduce(
                        lambda a, b: a + b,
                        [L[j][c] * L[j][c] for c in range(D)],
                    )
                )

        seg = jnp.where(seg_done, seg + 1, seg)
        return (seg, iters + 1, t, dt, qold, ll, nacc, nrej, failed,
                m, L, u_prev)

    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        zero + jnp.asarray(t0, zero.dtype), h0,
        zero + _QOLDINIT, zero, zero, zero,
        jnp.zeros_like(h0), m, L, u_prev,
    )
    out = jax.lax.while_loop(cond, body, init)
    ll_ref[...] = out[5]
    nacc_ref[...] = out[6]
    nrej_ref[...] = out[7]
    fail_ref[...] = jnp.where(
        (out[8] > 0.5) | (out[0] < S),
        jnp.ones_like(out[5]), jnp.zeros_like(out[5]),
    )


@_no_x64
def ek1_adaptive_filter(
    f: Callable,
    jac: Optional[Callable],
    m0: jax.Array,      # (q+1, d, B)
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,)
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Adaptive-step fused EK1(dynamic) ensemble filter, per-lane dt.

    Like :func:`ek0_adaptive_filter` but with the full D x D square-root
    extended Kalman filter per member (EK1 linearization; ``jac=None``
    derives the Jacobian in-kernel via JVP columns). ``second_order``:
    measurement block 2 with both full partial Jacobians
    (``jac(du, u, p, t) -> (J_u, J_du)``; auto from 2d JVP columns).
    Returns ``(us, stds, lls, nacc, nrej, failed)`` where ``stds`` is
    per-dimension (S+1, d, B). Non-IWP ``prior``: per-lane
    Chebyshev-tabulated transitions, as in :func:`ek0_adaptive_filter`.
    """
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if jac is None:
        jac = _auto_jac_2nd(f) if second_order else _auto_jac(f)
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_: ek1_adaptive_filter(
                f, jac, m0_, ps_, dt0_, t0, t1, n_save, q, abstol=abstol,
                reltol=reltol, max_iters=max_iters, dtmin=dtmin,
                prior=prior, second_order=second_order,
            ),
            (m0, ps, dt0s), in_axes=(2, 1, 0),
            out_axes=(2, 2, 0, 0, 0, 0),
        )

    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        # below ~eps * span a step cannot advance t at all (t + dt == t),
        # so the lane would spin forever without tripping the dtmin guard
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)

    kernel = functools.partial(
        _ek1_adaptive_kernel,
        f=f, jac=jac, At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order),
    )

    def entry(m0_blk, p_blk, dt0_blk, us_blk, std_blk, ll_blk, na_blk,
              nr_blk, fl_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    us, stds, lls, nacc, nrej, fail = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            lane(), lane(), lane(), lane(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
        ],
    )(m0_b, ps_b, dt0_b)

    us = us.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    stds = stds.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    return (us, stds, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def solve_ensemble_ek1_adaptive_pallas(
    prob_f: Callable,
    prob_jac: Optional[Callable],
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Taylor-init + per-lane-adaptive fused EK1 kernel over an ensemble.

    ``second_order``: ``u0s = [u0 | du0]`` (B, 2d) with
    ``prob_f(du, u, p, t)``; ``prob_jac(du, u, p, t)`` returns the pair
    of full partial Jacobians (or None for auto-JVP)."""
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(
                prob_f, u0_full[:d], u0_full[d:], tspan, p=p
            )
        else:
            m = jnp.stack(taylor_coefficients(prob_f, u0_full, p, t0, q))
            pr = ode_problem(prob_f, u0_full, tspan, p=p)
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    return ek1_adaptive_filter(
        prob_f, prob_jac, m0, ps.T, dt0s, float(t0), float(t1), n_save, q,
        abstol=abstol, reltol=reltol, max_iters=max_iters, prior=prior,
        mesh=mesh, second_order=second_order,
    )


def _auto_jac_diag(f: Callable) -> Callable:
    """In-kernel Jacobian *diagonal* from d forward-mode JVPs (the b-th
    one-hot tangent's b-th output component). O(d) JVPs like
    :func:`_auto_jac`; pass an exact ``jac_diag`` for O(d) total cost on
    pointwise reaction terms (`odefilters/jacobians.py:17-34`)."""

    def jd(u, p, t):
        dd = u.shape[0]
        diag = []
        for b in range(dd):
            tangent = jnp.stack(
                [jnp.ones_like(u[b]) if i == b else jnp.zeros_like(u[b])
                 for i in range(dd)]
            )
            _, col = jax.jvp(lambda uu: f(uu, p, t), (u,), (tangent,))
            diag.append(col[b])                 # J[b, b]
        return jnp.stack(diag)                  # (d[, batch...])

    return jd


def _auto_jac_diag_2nd(f: Callable) -> Callable:
    """Diagonals of BOTH partial Jacobians of a second-order RHS
    ``f(du, u, p, t)`` from 2d forward-mode JVPs: returns
    ``(Ju_diag, Jdu_diag)`` (each ``(d, ...)``) — the diagonal
    linearization of `step.py:186-205`."""

    def jd2(du, u, p, t):
        dd = u.shape[0]
        diag_u, diag_du = [], []
        for b in range(dd):
            tangent = jnp.stack(
                [jnp.ones_like(u[b]) if i == b else jnp.zeros_like(u[b])
                 for i in range(dd)]
            )
            _, col = jax.jvp(lambda uu: f(du, uu, p, t), (u,), (tangent,))
            diag_u.append(col[b])
            _, col = jax.jvp(lambda dv: f(dv, u, p, t), (du,), (tangent,))
            diag_du.append(col[b])
        return jnp.stack(diag_u), jnp.stack(diag_du)

    return jd2


def _ek1d_adaptive_kernel(
    m0_ref, p_ref, dt0_ref, us_ref, std_ref, ll_ref, nacc_ref, nrej_ref,
    fail_ref, *,
    f: Callable, jac_diag: Callable, At: np.ndarray, Qt: np.ndarray,
    S: int, dt_save: float, t0: float, d: int, nq: int,
    abstol: float, reltol: float, max_iters: int, dtmin: float,
    beta1: float, beta2: float, cheb=None, so: bool = False,
    mass_diag=None,
):
    """Per-lane adaptive DiagonalEK1(dynamic): d independent
    scalar-measurement Kalman filters per member, each with its own
    (q+1, q+1) covariance and measurement row
    ``h_j = pinv1 e_1 - J_jj pinv0 e_0`` (diagonal linearization, Kraemer
    et al. ICML 2022; per-dim semantics ``ops/kron.py
    _kron_attempt_step_diag``). O(d q^2) state and work per step — EK1
    stiffness robustness at near-EK0 cost — sharing the barrier/save-grid
    and PI-controller machinery of `_ek0_adaptive_kernel`.

    ``so``: second-order problems — measurement block 2 with the
    diagonal linearization of BOTH partial Jacobians,
    ``h_j = pinv2 e_2 - Jdu_jj pinv1 e_1 - Ju_jj pinv0 e_0``
    (`step.py:200-212`); ``jac_diag(du, u, p, t) -> (Ju_diag, Jdu_diag)``."""
    q_half = nq - 1 + 0.5

    def _is0(x):
        return isinstance(x, float) and x == 0.0

    h0 = dt0_ref[0]
    zero = jnp.zeros_like(h0)
    one = zero + 1.0

    # carry is UNPRECONDITIONED (see _ek0_adaptive_kernel): one mean list
    # plus d per-dimension covariance lists
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    C = [[[zero for _ in range(nq)] for _ in range(nq)] for _ in range(d)]
    p_block = p_ref[:]

    for j in range(d):
        us_ref[0, j] = m0_ref[0, j]
        std_ref[0, j] = zero
    u_prev = [m0_ref[0, j] for j in range(d)]

    def cond(carry):
        seg, iters = carry[0], carry[1]
        return (seg < S) & (iters < max_iters)

    def body(carry):
        (seg, iters, t, dt, qold, ll, nacc, nrej, failed,
         m, C, u_prev) = carry
        dtype = zero.dtype
        t_save = jnp.asarray(t0, dtype) + jnp.asarray(dt_save, dtype) * (
            seg.astype(dtype) + 1.0
        )
        not_failed = failed < 0.5
        active = (t < t_save) & not_failed
        remaining = t_save - t
        hit_save = dt >= remaining
        dt_eff = jnp.where(active, jnp.where(hit_save, remaining, dt), one)

        # -- precondition at this attempt's h (fresh from canonical) --
        lh = jnp.log(dt_eff)
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        mh = [[m[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        Chs = [
            [[C[j][i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
             for i in range(nq)]
            for j in range(d)
        ]
        pinv0 = jnp.exp(q_half * lh)
        pinv1 = jnp.exp((q_half - 1.0) * lh)
        if cheb is None:
            Atl = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
            Qtl = [[float(Qt[i, l]) for l in range(nq)] for i in range(nq)]
        else:
            Atl, _, Qtl = _cheb_transition_lists(cheb, lh, nq)

        # -- predict mean; linearize --
        mp = [
            [
                functools.reduce(
                    lambda a, b: a + b,
                    [Atl[i][l] * mh[l][j] for l in range(nq)
                     if not _is0(Atl[i][l])],
                )
                for j in range(d)
            ]
            for i in range(nq)
        ]
        t_new = jnp.where(hit_save, t_save, t + dt_eff)
        u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
        if so:
            pinv2 = jnp.exp((q_half - 2.0) * lh)
            du_pred = jnp.stack([pinv1 * mp[1][j] for j in range(d)])
            ddu = f(du_pred, u_pred, p_block, t_new)
            jd_u, jd_du = jac_diag(du_pred, u_pred, p_block, t_new)
            z = [pinv2 * mp[2][j] - ddu[j] for j in range(d)]
            # h_j = pinv2 e2 - Jdu_jj pinv1 e1 - Ju_jj pinv0 e0
            hc = [[-jd_u[j] * pinv0, -jd_du[j] * pinv1, pinv2]
                  for j in range(d)]
            nh = 3
        else:
            du = f(u_pred, p_block, t_new)
            jd = jac_diag(u_pred, p_block, t_new)   # (d, sub, lane)
            if mass_diag is None:
                z = [pinv1 * mp[1][j] - du[j] for j in range(d)]
                # h_j = pinv1 e1 - jd_j pinv0 e0
                hc = [[-jd[j] * pinv0, pinv1] for j in range(d)]
            else:
                # diagonal mass: z_j = M_jj (E1 x)_j - f_j,
                # h_j = M_jj pinv1 e1 - jd_j pinv0 e0 (step.py:282; zero
                # M_jj rows state index-1 algebraic constraints)
                z = [mass_diag[j] * (pinv1 * mp[1][j]) - du[j]
                     for j in range(d)]
                hc = [[-jd[j] * pinv0, mass_diag[j] * pinv1]
                      for j in range(d)]
            nh = 2

        def h_quad(M, j):
            c = hc[j]
            return functools.reduce(
                lambda a, b: a + b,
                [c[i] * c[l] * M[i][l]
                 for i in range(nh) for l in range(nh)],
            )

        # dynamic diffusion: sigma^2 = mean_j z_j^2 / (h_j Q h_j^T)
        hq = [h_quad(Qtl, j) for j in range(d)]
        s2 = functools.reduce(
            lambda a, b: a + b, [z[j] * z[j] / hq[j] for j in range(d)]
        ) / d

        # -- per-dim predict cov + scalar-measurement update --
        m_new = [[None] * d for _ in range(nq)]
        C_new = []
        s_list, err_acc = [], zero
        for j in range(d):
            Ch = Chs[j]
            tmp = [
                [
                    functools.reduce(
                        lambda a, b: a + b,
                        [Atl[i][a] * Ch[a][b] for a in range(nq)
                         if not _is0(Atl[i][a])],
                    )
                    for b in range(nq)
                ]
                for i in range(nq)
            ]
            Cp = [
                [
                    functools.reduce(
                        lambda a, b: a + b,
                        [tmp[i][b] * Atl[l][b] for b in range(nq)
                         if not _is0(Atl[l][b])],
                    )
                    + Qtl[i][l] * s2
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            s = h_quad(Cp, j)
            s_list.append(s)
            inv_s = 1.0 / s
            # kg_i = (Cp h_j)_i / s
            kg = [
                functools.reduce(
                    lambda a, b: a + b,
                    [hc[j][l] * Cp[i][l] for l in range(nh)],
                ) * inv_s
                for i in range(nq)
            ]
            for i in range(nq):
                m_new[i][j] = mp[i][j] - kg[i] * z[j]
            C_new.append(
                [[Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)]
                 for i in range(nq)]
            )

        maha = functools.reduce(
            lambda a, b: a + b, [z[j] * z[j] / s_list[j] for j in range(d)]
        )
        logdet = functools.reduce(
            lambda a, b: a + b,
            [jnp.log(jnp.maximum(s_list[j], 1e-30)) for j in range(d)],
        )
        ll_inc = -0.5 * (maha + logdet + d * _LOG_2PI)
        u_filt = [pinv0 * m_new[0][j] for j in range(d)]

        # -- error estimate: err_j = dt sqrt(s2 hq_j) / sc_j --
        for j in range(d):
            sc = abstol + reltol * jnp.maximum(
                jnp.abs(u_prev[j]), jnp.abs(u_filt[j])
            )
            r = dt_eff * jnp.sqrt(jnp.maximum(s2 * hq[j], 0.0)) / sc
            err_acc = err_acc + r * r
        EEst = jnp.sqrt(err_acc / d)
        EEst = jnp.where(jnp.isfinite(EEst), EEst, 1e10)
        accept = active & (EEst <= 1.0)

        # -- per-lane PI controller (OrdinaryDiffEq constants) --
        eg = jnp.maximum(EEst, 1e-35)
        leg = jnp.log(eg)
        q11 = jnp.exp(beta1 * leg)
        qq = q11 * jnp.exp(-beta2 * jnp.log(jnp.maximum(qold, 1e-35)))
        qq = jnp.maximum(1.0 / _QMAX, jnp.minimum(1.0 / _QMIN, qq / _GAMMA))
        dt_acc = dt_eff / qq
        last_seg = seg >= S - 1
        dt_acc = jnp.where(hit_save & ~last_seg, jnp.maximum(dt_acc, dt), dt_acc)
        qold_acc = jnp.maximum(EEst, _QOLDINIT)
        dt_rej = dt_eff / jnp.minimum(1.0 / _QMIN, q11 / _GAMMA)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        newly_failed = active & ~hit_save & (
            (dt_new < dtmin) | (accept & (t_new <= t))
        )
        failed = jnp.maximum(failed, jnp.where(newly_failed, one, zero))
        not_failed = failed < 0.5

        # -- un-precondition, then masked commits --
        m_new = [[m_new[i][j] / ps_[i] for j in range(d)] for i in range(nq)]
        C_new = [
            [[C_new[j][i][l] / (ps_[i] * ps_[l]) for l in range(nq)]
             for i in range(nq)]
            for j in range(d)
        ]
        m = [
            [jnp.where(accept, m_new[i][j], m[i][j]) for j in range(d)]
            for i in range(nq)
        ]
        C = [
            [[jnp.where(accept, C_new[j][i][l], C[j][i][l])
              for l in range(nq)] for i in range(nq)]
            for j in range(d)
        ]
        t = jnp.where(accept, t_new, t)
        dt = jnp.where(active & not_failed, dt_new, dt)
        qold = jnp.where(accept, qold_acc, qold)
        ll = jnp.where(accept, ll + ll_inc, ll)
        u_prev = [jnp.where(accept, u_filt[j], u_prev[j]) for j in range(d)]
        nacc = nacc + jnp.where(accept, one, zero)
        nrej = nrej + jnp.where(active & ~accept, one, zero)
        t = jnp.where(not_failed, t, zero + jnp.asarray(1e30, zero.dtype))

        seg_done = jnp.min(jnp.where(t >= t_save, one, zero)) > 0.5

        @pl.when(seg_done)
        def _():
            seg1 = seg + jnp.ones((), seg.dtype)
            for j in range(d):
                us_ref[seg1, j] = m[0][j]
                std_ref[seg1, j] = jnp.sqrt(jnp.maximum(C[j][0][0], 0.0))

        seg = jnp.where(seg_done, seg + 1, seg)
        return (seg, iters + 1, t, dt, qold, ll, nacc, nrej, failed,
                m, C, u_prev)

    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        zero + jnp.asarray(t0, zero.dtype), h0,
        zero + _QOLDINIT, zero, zero, zero,
        jnp.zeros_like(h0), m, C, u_prev,
    )
    out = jax.lax.while_loop(cond, body, init)
    ll_ref[...] = out[5]
    nacc_ref[...] = out[6]
    nrej_ref[...] = out[7]
    fail_ref[...] = jnp.where(
        (out[8] > 0.5) | (out[0] < S),
        jnp.ones_like(out[5]), jnp.zeros_like(out[5]),
    )


@_no_x64
def ek1d_adaptive_filter(
    f: Callable,
    jac_diag: Optional[Callable],
    m0: jax.Array,      # (q+1, d, B)
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,)
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
    mass_diag=None,
):
    """Adaptive-step fused DiagonalEK1(dynamic) ensemble filter.

    Like :func:`ek0_adaptive_filter` but with the diagonal-linearization
    EK1 per member (``J -> diag(J)``, `odefilters/algorithms.py`
    DiagonalEK1): d independent per-dimension (q+1, q+1) filters, exact
    per-dim semantics of the Kronecker path (`ops/kron.py
    _kron_attempt_step_diag`). ``jac_diag=None`` derives the diagonal
    in-kernel from d JVPs. ``second_order``: measurement block 2 with
    both partial-Jacobian diagonals (``jac_diag(du, u, p, t) ->
    (Ju_diag, Jdu_diag)``; auto from 2d JVPs). ``mass_diag``: static
    (d,) diagonal of ``M u' = f`` (zeros = index-1 algebraic rows) —
    the per-dim measurement becomes ``h_j = M_jj pinv1 e1 - J_jj pinv0
    e0`` exactly as the dense/Kron paths. Returns
    ``(us, stds, lls, nacc, nrej, failed)`` with per-dimension stds
    (S+1, d, B).
    """
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if mass_diag is not None:
        if second_order:
            raise NotImplementedError("mass matrices are first-order only")
        mass_diag = tuple(float(v) for v in np.asarray(mass_diag))
    if jac_diag is None:
        jac_diag = (
            _auto_jac_diag_2nd(f) if second_order else _auto_jac_diag(f)
        )
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_: ek1d_adaptive_filter(
                f, jac_diag, m0_, ps_, dt0_, t0, t1, n_save, q,
                abstol=abstol, reltol=reltol, max_iters=max_iters,
                dtmin=dtmin, prior=prior, second_order=second_order,
                mass_diag=mass_diag,
            ),
            (m0, ps, dt0s), in_axes=(2, 1, 0),
            out_axes=(2, 2, 0, 0, 0, 0),
        )

    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    Qt_np = QLt_np @ QLt_np.T
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)

    kernel = functools.partial(
        _ek1d_adaptive_kernel,
        f=f, jac_diag=jac_diag,
        At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order), mass_diag=mass_diag,
    )

    def entry(m0_blk, p_blk, dt0_blk, us_blk, std_blk, ll_blk, na_blk,
              nr_blk, fl_blk):
        kernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    us, stds, lls, nacc, nrej, fail = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            lane(), lane(), lane(), lane(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
        ],
    )(m0_b, ps_b, dt0_b)

    us = us.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    stds = stds.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    return (us, stds, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def _ek1d_kernel(
    m0_ref, p_ref, us_ref, std_ref, ll_ref, sig_ref=None, *,
    f: Callable, jac_diag: Callable, At: np.ndarray, Qt: np.ndarray,
    pinv0: float, pinv1: float, T: int, dt: float, t0: float,
    d: int, nq: int, static_diff=None,
):
    """Fixed-grid fused DiagonalEK1(dynamic) ensemble filter: the per-dim
    step of the datalik kernels (`_ek1d_pd_step_lists`) in a plain time
    loop, emitting per-dim means/stds each step. ``static_diff``: static
    diffusion model — filter with the unscaled prior, accumulate the
    per-member MLE/MAP sigma^2 into ``sig_ref`` (the per-dim innovation
    variances make fixedMV exact here)."""
    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    zero = jnp.zeros_like(m[0][0])
    C = [[[zero for _ in range(nq)] for _ in range(nq)] for _ in range(d)]
    p_block = p_ref[:]

    for j in range(d):
        us_ref[0, j] = pinv0 * m[0][j]
        std_ref[0, j] = zero

    step = functools.partial(
        _ek1d_pd_step_lists, f=f, jac_diag=jac_diag, At=At, Qt=Qt,
        pinv0=pinv0, pinv1=pinv1, d=d, nq=nq, static_diff=static_diff,
    )

    if static_diff == "fixedMV":
        calib0 = ([zero for _ in range(d)], zero)
    else:
        calib0 = (zero, zero)

    def body(k, carry):
        m, C, ll, calib = carry
        k1 = k + jnp.ones((), k.dtype)
        t_new = _step_time(k, t0, dt, zero.dtype)
        if static_diff is not None:
            m_new, C_new, ll_inc, calib = step(m, C, p_block, t_new,
                                               calib=calib)
        else:
            m_new, C_new, ll_inc = step(m, C, p_block, t_new)
        for j in range(d):
            us_ref[k1, j] = pinv0 * m_new[0][j]
            std_ref[k1, j] = pinv0 * jnp.sqrt(
                jnp.maximum(C_new[j][0][0], 0.0)
            )
        return m_new, C_new, ll + ll_inc, calib

    _, _, ll, calib = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(T), body, (m, C, zero, calib0)
    )
    ll_ref[...] = ll
    if static_diff is not None:
        sig = calib[0]
        for j in range(d):
            sig_ref[j] = sig[j] if static_diff == "fixedMV" else sig


@_no_x64
def ek1d_fused_filter(
    f: Callable,
    jac_diag: Optional[Callable],
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    t0: float,
    dt: float,
    n_steps: int,
    q: int,
    prior=None,
    mesh=None,
    diffusion: str = "dynamic",
):
    """Fixed-grid fused DiagonalEK1 ensemble filter.

    Returns ``(us, stds, lls)`` with per-dimension stds (T+1, d, B);
    ``jac_diag=None`` derives the Jacobian diagonal from d in-kernel
    JVPs. Per-dim semantics identical to the Kronecker XLA path
    (`ops/kron.py _kron_attempt_step_diag`).
    """
    static = None if diffusion == "dynamic" else str(diffusion)
    if static is not None and static not in ("fixed", "fixedMAP", "fixedMV"):
        raise NotImplementedError(
            f"diffusion={diffusion!r}: fused fixed-grid kernels support "
            "dynamic / fixed / fixedMAP / fixedMV"
        )
    if jac_diag is None:
        jac_diag = _auto_jac_diag(f)
    if mesh is not None:
        out_axes = (2, 2, 0) if static is None else (
            (2, 2, 0, 1) if static == "fixedMV" else (2, 2, 0, 0)
        )
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_: ek1d_fused_filter(
                f, jac_diag, m0_, ps_, t0, dt, n_steps, q, prior=prior,
                diffusion=diffusion,
            ),
            (m0, ps), in_axes=(2, 1), out_axes=out_axes,
        )
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    T = int(n_steps)

    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64
    At, Qt, pinv0, pinv1, p_np = _ek0_consts(q, float(dt), fdtype, prior)

    m0_p = (jnp.asarray(p_np, dtype)[:, None, None] * m0).reshape(
        nq, d, nb, _SUB, _LANE
    ).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)

    kernel = functools.partial(
        _ek1d_kernel, f=f, jac_diag=jac_diag, At=At, Qt=Qt,
        pinv0=pinv0, pinv1=pinv1, T=T, dt=float(dt), t0=float(t0),
        d=d, nq=nq, static_diff=static,
    )

    out_specs = [
        pl.BlockSpec((1, T + 1, d, _SUB, _LANE),
                     lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T + 1, d, _SUB, _LANE),
                     lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((nb, T + 1, d, _SUB, _LANE), dtype),
        jax.ShapeDtypeStruct((nb, T + 1, d, _SUB, _LANE), dtype),
        jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype),
    ]
    if static is not None:
        out_specs.append(
            pl.BlockSpec((1, d, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nb, d, _SUB, _LANE), dtype))

        def entry(m0_blk, p_blk, us_blk, std_blk, ll_blk, sig_blk):
            kernel(
                m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
                ll_blk.at[jnp.int32(0)], sig_blk.at[jnp.int32(0)],
            )
    else:
        def entry(m0_blk, p_blk, us_blk, std_blk, ll_blk):
            kernel(
                m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
                us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)],
                ll_blk.at[jnp.int32(0)],
            )

    outs = pl.pallas_call(
        entry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(m0_p, ps_b)
    us, stds, lls = outs[:3]

    us = us.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    stds = stds.transpose(1, 2, 0, 3, 4).reshape(T + 1, d, B)
    if static is not None:
        sig = outs[3]
        lls = jnp.full((B,), jnp.nan, dtype)
        if static == "fixedMV":
            sigv = sig.transpose(1, 0, 2, 3).reshape(d, B)
            stds = stds * jnp.sqrt(sigv)[None]
        else:
            sigv = sig[:, 0].reshape(B)
            stds = stds * jnp.sqrt(sigv)[None, None]
        return us, stds, lls, sigv
    return us, stds, lls.reshape(B)


def solve_ensemble_ek1d_pallas(
    prob_f: Callable,
    prob_jac_diag: Optional[Callable],
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_steps: int,
    q: int = 3,
    prior=None,
    mesh=None,
    diffusion: str = "dynamic",
):
    """Taylor-init + fixed-grid fused DiagonalEK1 ensemble filter.
    ``diffusion``: see :func:`ek0_fused_filter` — static models return
    ``(us, stds, lls=nan, sigma2)`` with exit-rescaled stds."""
    from odefilters.taylor import taylor_coefficients

    t0, t1 = tspan
    dt = (t1 - t0) / n_steps
    B, d = u0s.shape

    def init_one(u0, p):
        return jnp.stack(taylor_coefficients(prob_f, u0, p, t0, q))

    m0 = jax.vmap(init_one)(u0s, ps).transpose(1, 2, 0)
    return ek1d_fused_filter(
        prob_f, prob_jac_diag, m0, ps.T, float(t0), float(dt), n_steps, q,
        prior=prior, mesh=mesh, diffusion=diffusion,
    )


def solve_ensemble_ek1d_adaptive_pallas(
    prob_f: Callable,
    prob_jac_diag: Optional[Callable],
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    prior=None,
    mesh=None,
    second_order: bool = False,
    mass_diag=None,
):
    """Taylor-init + per-lane-adaptive fused DiagonalEK1 kernel.

    ``second_order``: ``u0s = [u0 | du0]`` (B, 2d) with
    ``prob_f(du, u, p, t)``; ``prob_jac_diag(du, u, p, t)`` returns the
    pair of partial-Jacobian diagonals (or None for auto-JVP).
    ``mass_diag``: concrete (d,) diagonal of ``M u' = f`` — zeros state
    index-1 algebraic constraints; Taylor init and the dt heuristic run
    on the state-space RHS (`problem.mass_state_space_f`)."""
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    init_f = prob_f
    if mass_diag is not None:
        from odefilters.problem import mass_state_space_f

        init_f = mass_state_space_f(prob_f, jnp.asarray(mass_diag))

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(
                prob_f, u0_full[:d], u0_full[d:], tspan, p=p
            )
        else:
            m = jnp.stack(taylor_coefficients(
                init_f, u0_full, p, t0, q,
                method="jvp" if mass_diag is not None else "auto",
            ))
            pr = ode_problem(prob_f, u0_full, tspan, p=p,
                             mass_matrix=(None if mass_diag is None
                                          else jnp.asarray(mass_diag)))
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    return ek1d_adaptive_filter(
        prob_f, prob_jac_diag, m0, ps.T, dt0s, float(t0), float(t1),
        n_save, q, abstol=abstol, reltol=reltol, max_iters=max_iters,
        prior=prior, mesh=mesh, second_order=second_order,
        mass_diag=mass_diag,
    )


def solve_adaptive_pallas_single(
    prob_f: Callable,
    u0: jax.Array,
    p: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 100_000,
    jac: Optional[Callable] = None,
    ek1: bool = False,
    diagonal_ek1: bool = False,
    jac_diag: Optional[Callable] = None,
    second_order: bool = False,
):
    """Single-trajectory adaptive solve at kernel latency.

    Broadcasts the problem across one 1024-lane block of the per-lane
    adaptive kernel and reads member 0 back — all lanes take identical
    steps, so this is exactly one adaptive solve with ~2x lower per-step
    latency than the XLA while-loop driver and ~1 s compiles (vs the
    driver's 20 s+ on the remote chip). ``ek1``/``diagonal_ek1`` select
    the linearization; ``second_order`` (EK0/DiagonalEK1 kernels) takes
    ``u0 = [u0 | du0]``. Returns ``(us, stds, ll, nacc, nrej, failed)``
    for the save grid.
    """
    if ek1 and diagonal_ek1:
        raise ValueError("pass ek1=True OR diagonal_ek1=True, not both")
    u0s = jnp.broadcast_to(u0, (BLOCK,) + u0.shape)
    ps = jnp.broadcast_to(p, (BLOCK,) + jnp.shape(p))
    if ek1:
        us, stds, lls, nacc, nrej, fail = solve_ensemble_ek1_adaptive_pallas(
            prob_f, jac, u0s, ps, tspan, n_save, q=q,
            abstol=abstol, reltol=reltol, max_iters=max_iters,
            second_order=second_order,
        )
        return (us[..., 0], stds[..., 0], lls[0], nacc[0], nrej[0], fail[0])
    if diagonal_ek1:
        us, stds, lls, nacc, nrej, fail = solve_ensemble_ek1d_adaptive_pallas(
            prob_f, jac_diag, u0s, ps, tspan, n_save, q=q,
            abstol=abstol, reltol=reltol, max_iters=max_iters,
            second_order=second_order,
        )
        return (us[..., 0], stds[..., 0], lls[0], nacc[0], nrej[0], fail[0])
    us, stds, lls, nacc, nrej, fail = solve_ensemble_ek0_adaptive_pallas(
        prob_f, u0s, ps, tspan, n_save, q=q,
        abstol=abstol, reltol=reltol, max_iters=max_iters,
        second_order=second_order,
    )
    return us[..., 0], stds[..., 0], lls[0], nacc[0], nrej[0], fail[0]


# ==========================================================================
# Adaptive-step fused EK0 filter + RTS smoother (per-lane dt).
#
# The reference's DEFAULT solve is adaptive + smoothing
# (`algorithms.jl:24` smooth=true; `integrator_utils.jl:20-26` runs
# smooth_all! in the postamble); until round 3 the fused ensemble kernels
# covered adaptive-filter and fixed-grid-smooth but not the flagship
# combination. The design:
#
#   forward  — the per-lane adaptive EK0 kernel, additionally streaming
#              ONE packed row per ATTEMPT to HBM (double-buffered DMA):
#              the committed unpreconditioned (m, C) plus per-lane
#              scalars [accept, log dt_eff, s2, log dt_cur, is_save,
#              seg+1]. Rejected-attempt rows are dead weight in HBM but
#              keep every write a static-shape append at the shared
#              attempt counter — per-lane compaction is impossible in
#              lane-vectorized rows (accept differs per lane).
#   backward — walks the attempt stream in reverse; at each row, lanes
#              with accept=1 apply one square-root RTS step (fresh
#              per-lane preconditioning at the *next* accepted step's
#              log-dt, carried per lane; the streamed plain coefficient
#              covariance is Cholesky-factored in the well-conditioned
#              preconditioned frame) and lanes with is_save=1 write the
#              (just-smoothed) state into the save-grid output row via a
#              masked read-modify-write at the streamed seg index. The
#              reverse sequence of accepted rows IS each lane's chain of
#              accepted states, so masking makes the per-lane ragged
#              grids exact with zero compaction.
#
# HBM cost: max_iters x (nq+1) x max(d+nq, 6) x 4 KiB per 1024-member
# block (e.g. ~120 KiB/attempt at d=2, q=3 -> ~123 MiB at the default
# max_iters=1024), so the smooth entry bounds max_iters far below the
# filter-only kernel's 100k default.
# ==========================================================================


def _list_cholesky(Cm, nq, zero_row=None):
    """Guarded lower Cholesky of a plain list-of-lanes coefficient
    covariance (used on the PRECONDITIONED factor-free stream of the
    adaptive kernels, where the coefficient matrix is well-conditioned;
    plain-covariance smoothing itself stays forbidden — the RTS recursion
    downstream is square-root form).

    ``zero_row``: index of a structurally-zero row/column, treated as
    EXACT zero (static 0.0 entries). The EK0/R=0 update collapses the
    measured coefficient block to zero variance, so the streamed
    posterior covariance is exactly rank-deficient there up to roundoff;
    a guarded pivot would turn that roundoff into a ~1e-15 pivot and
    divide the off-diagonal junk by it, destroying the factor (measured:
    the backward smoother explodes ~1e10x per step without this)."""
    L = [[0.0] * nq for _ in range(nq)]
    for i in range(nq):
        if i == zero_row:
            continue
        s = Cm[i][i]
        for k in range(i):
            s = s - _smul(L[i][k], L[i][k])
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
        inv = 1.0 / L[i][i]
        for l in range(i + 1, nq):
            if l == zero_row:
                continue
            v = Cm[l][i]
            for k in range(i):
                v = v - _smul(L[l][k], L[i][k])
            L[l][i] = _smul(v, inv)
    return L


def _ek0_adaptive_stream_kernel(
    m0_ref, p_ref, dt0_ref, ll_ref, nacc_ref, nrej_ref, fail_ref, it_ref,
    st_ref, row, sem, *,
    f: Callable, At: np.ndarray, Qt: np.ndarray,
    S: int, dt_save: float, t0: float, d: int, nq: int, Wp: int,
    abstol: float, reltol: float, max_iters: int, dtmin: float,
    beta1: float, beta2: float, cheb=None, so: bool = False,
):
    """`_ek0_adaptive_kernel` with a per-attempt HBM state stream (and no
    filtered us/std outputs — the solution falls out of the backward
    smoother pass). Row layout (nq+1, Wp): rows i < nq hold
    [m[i] (d) | C[i] (nq)]; row nq holds the per-lane scalars
    [accept, log dt_eff, s2, log dt_cur, is_save, seg+1]."""
    q_half = nq - 1 + 0.5

    def _is0f(x):
        return isinstance(x, float) and x == 0.0

    h0 = dt0_ref[0]
    zero = jnp.zeros_like(h0)
    one = zero + 1.0

    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    C = [[zero for _ in range(nq)] for _ in range(nq)]
    p_block = p_ref[:]
    u_prev = [m0_ref[0, j] for j in range(d)]

    def pack_and_send(k_idx, m, C, extras):
        slot = jax.lax.rem(k_idx, jnp.int32(2))

        @pl.when(k_idx >= 2)
        def _():
            pltpu.make_async_copy(
                row.at[slot], st_ref.at[k_idx], sem.at[slot]
            ).wait()

        for i in range(nq):
            for j in range(d):
                row[slot, i, j] = m[i][j]
            for l in range(nq):
                row[slot, i, d + l] = C[i][l]
        for c, v in enumerate(extras):
            row[slot, nq, c] = v
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).start()

    def cond(carry):
        seg, iters = carry[0], carry[1]
        return (seg < S) & (iters < max_iters)

    def body(carry):
        (seg, iters, t, dt, qold, ll, nacc, nrej, failed,
         m, C, u_prev) = carry
        dtype = zero.dtype
        t_save = jnp.asarray(t0, dtype) + jnp.asarray(dt_save, dtype) * (
            seg.astype(dtype) + 1.0
        )
        not_failed = failed < 0.5
        active = (t < t_save) & not_failed
        remaining = t_save - t
        hit_save = dt >= remaining
        dt_eff = jnp.where(active, jnp.where(hit_save, remaining, dt), one)

        lh = jnp.log(dt_eff)
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        mh = [[m[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        Ch = [[C[i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
              for i in range(nq)]
        pinv0 = jnp.exp(q_half * lh)
        pinv1 = jnp.exp((q_half - 1.0) * lh)
        if cheb is None:
            Atl = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
            Qtl = [[float(Qt[i, l]) for l in range(nq)] for i in range(nq)]
        else:
            Atl, _, Qtl = _cheb_transition_lists(cheb, lh, nq)
        bx = 2 if so else 1
        pb = jnp.exp((q_half - bx) * lh)
        hq = pb * pb * Qtl[bx][bx]

        mp = [
            [
                _sreduce([_smul(Atl[i][l], mh[l][j]) for l in range(nq)])
                for j in range(d)
            ]
            for i in range(nq)
        ]
        t_new = jnp.where(hit_save, t_save, t + dt_eff)
        u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
        if so:
            du_pred = jnp.stack([pinv1 * mp[1][j] for j in range(d)])
            du = f(du_pred, u_pred, p_block, t_new)
        else:
            du = f(u_pred, p_block, t_new)
        z = [pb * mp[bx][j] - du[j] for j in range(d)]
        zz = functools.reduce(lambda a, b: a + b, [zj * zj for zj in z])
        s2 = zz / (d * hq)
        tmp = [
            [
                _sreduce([_smul(Atl[i][a], Ch[a][b]) for a in range(nq)])
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        Cp = [
            [
                _sreduce([_smul(tmp[i][b], Atl[l][b]) for b in range(nq)])
                + Qtl[i][l] * s2
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        s = pb * pb * Cp[bx][bx]
        inv_s = 1.0 / s
        kg = [pb * Cp[i][bx] * inv_s for i in range(nq)]
        m_new = [[mp[i][j] - kg[i] * z[j] for j in range(d)] for i in range(nq)]
        C_new = [
            [Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)] for i in range(nq)
        ]
        ll_inc = -0.5 * (
            zz * inv_s + d * (jnp.log(jnp.maximum(s, 1e-30)) + _LOG_2PI)
        )
        u_filt = [pinv0 * m_new[0][j] for j in range(d)]

        err_unscaled = jnp.sqrt(zz / d)
        ee = zero
        for j in range(d):
            sc = abstol + reltol * jnp.maximum(
                jnp.abs(u_prev[j]), jnp.abs(u_filt[j])
            )
            r = dt_eff * err_unscaled / sc
            ee = ee + r * r
        EEst = jnp.sqrt(ee / d)
        EEst = jnp.where(jnp.isfinite(EEst), EEst, 1e10)
        accept = active & (EEst <= 1.0)

        eg = jnp.maximum(EEst, 1e-35)
        leg = jnp.log(eg)
        q11 = jnp.exp(beta1 * leg)
        qq = q11 * jnp.exp(-beta2 * jnp.log(jnp.maximum(qold, 1e-35)))
        qq = jnp.maximum(1.0 / _QMAX, jnp.minimum(1.0 / _QMIN, qq / _GAMMA))
        dt_acc = dt_eff / qq
        last_seg = seg >= S - 1
        dt_acc = jnp.where(hit_save & ~last_seg, jnp.maximum(dt_acc, dt), dt_acc)
        qold_acc = jnp.maximum(EEst, _QOLDINIT)
        dt_rej = dt_eff / jnp.minimum(1.0 / _QMIN, q11 / _GAMMA)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        newly_failed = active & ~hit_save & (
            (dt_new < dtmin) | (accept & (t_new <= t))
        )
        failed = jnp.maximum(failed, jnp.where(newly_failed, one, zero))
        not_failed = failed < 0.5

        m_new = [[m_new[i][j] / ps_[i] for j in range(d)] for i in range(nq)]
        C_new = [
            [C_new[i][l] / (ps_[i] * ps_[l]) for l in range(nq)]
            for i in range(nq)
        ]
        m = [
            [jnp.where(accept, m_new[i][j], m[i][j]) for j in range(d)]
            for i in range(nq)
        ]
        C = [
            [jnp.where(accept, C_new[i][l], C[i][l]) for l in range(nq)]
            for i in range(nq)
        ]
        t = jnp.where(accept, t_new, t)
        dt = jnp.where(active & not_failed, dt_new, dt)
        qold = jnp.where(accept, qold_acc, qold)
        ll = jnp.where(accept, ll + ll_inc, ll)
        u_prev = [jnp.where(accept, u_filt[j], u_prev[j]) for j in range(d)]
        nacc = nacc + jnp.where(accept, one, zero)
        nrej = nrej + jnp.where(active & ~accept, one, zero)
        t = jnp.where(not_failed, t, zero + jnp.asarray(1e30, zero.dtype))

        # -- stream the committed state + per-lane step scalars --
        extras = [
            jnp.where(accept, one, zero),
            lh,
            s2,
            jnp.log(dt),
            jnp.where(accept & hit_save, one, zero),
            zero + (seg.astype(dtype) + 1.0),
        ]
        pack_and_send(iters, m, C, extras)

        seg_done = jnp.min(jnp.where(t >= t_save, one, zero)) > 0.5
        seg = jnp.where(seg_done, seg + 1, seg)
        return (seg, iters + 1, t, dt, qold, ll, nacc, nrej, failed,
                m, C, u_prev)

    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        zero + jnp.asarray(t0, zero.dtype), h0,
        zero + _QOLDINIT, zero, zero, zero,
        jnp.zeros_like(h0), m, C, u_prev,
    )
    out = jax.lax.while_loop(cond, body, init)
    K = out[1]
    ll_ref[...] = out[5]
    nacc_ref[...] = out[6]
    nrej_ref[...] = out[7]
    fail_ref[...] = jnp.where(
        (out[8] > 0.5) | (out[0] < S),
        jnp.ones_like(out[5]), jnp.zeros_like(out[5]),
    )
    it_ref[...] = zero + K.astype(zero.dtype)
    # drain the last (up to two) in-flight stream copies

    @pl.when(K >= 1)
    def _():
        k1 = K - jnp.int32(1)
        pltpu.make_async_copy(
            row.at[jax.lax.rem(k1, jnp.int32(2))], st_ref.at[k1],
            sem.at[jax.lax.rem(k1, jnp.int32(2))],
        ).wait()

    @pl.when(K >= 2)
    def _():
        k2 = K - jnp.int32(2)
        pltpu.make_async_copy(
            row.at[jax.lax.rem(k2, jnp.int32(2))], st_ref.at[k2],
            sem.at[jax.lax.rem(k2, jnp.int32(2))],
        ).wait()


def _ek0_adaptive_smoother_kernel(
    m0_ref, it_ref, st_ref, us_ref, std_ref,
    row, sem, *,
    At: np.ndarray, QLt: np.ndarray, S: int, d: int, nq: int, Wp: int,
    cheb=None, so: bool = False,
):
    """Backward square-root RTS pass over the adaptive attempt stream.

    Walks rows K-1..0; per row, lanes with accept=1 smooth one chain step
    (per-lane preconditioning at the carried next-step log-dt; streamed
    plain coefficient cov Cholesky-factored in the preconditioned frame)
    and lanes with is_save=1 write the just-smoothed state into the
    save-grid output row ``seg+1`` (masked read-modify-write; every
    (save row, lane) pair is written exactly once — each lane lands on
    each save time exactly once, tstops semantics)."""
    q_half = nq - 1 + 0.5

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        C = [[row[slot, i, d + l] for l in range(nq)] for i in range(nq)]
        ex = [row[slot, nq, c] for c in range(6)]
        return m, C, ex

    K = jnp.max(it_ref[0]).astype(jnp.int32)

    # save row 0: the exact (zero-covariance) initial state — smoothing a
    # point mass returns it unchanged (G = 0), as in the host driver
    zero = jnp.zeros_like(m0_ref[0, 0])
    for j in range(d):
        us_ref[jnp.int32(0), j] = m0_ref[0, j]
    std_ref[jnp.int32(0)] = zero

    bx = 2 if so else 1  # R=0-collapsed coefficient block of the stream

    def precond_factor(C_f, lh):
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        Ch = [[C_f[i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
              for i in range(nq)]
        return ps_, _list_cholesky(Ch, nq, zero_row=bx)

    def as_lanes(M):
        return [[(zero + x) if _is0(x) else x for x in r] for r in M]

    def write_saves(ex, ms, Ls):
        is_save, seg1f = ex[4], ex[5]

        @pl.when(jnp.max(is_save) > 0.5)
        def _():
            seg1 = jnp.max(seg1f).astype(jnp.int32)
            wm = is_save > 0.5
            for j in range(d):
                us_ref[seg1, j] = jnp.where(wm, ms[0][j], us_ref[seg1, j])
            sv = jnp.sqrt(
                functools.reduce(lambda a, b: a + b,
                                 [x * x for x in Ls[0]])
            )
            std_ref[seg1] = jnp.where(wm, sv, std_ref[seg1])

    # --- init from the final attempt row: every lane is parked at t1, so
    # its committed state IS the final filter state; smoothed = filtered
    # there. Factor the plain cov at the lane's own current log-dt (a
    # per-lane scale that keeps the Cholesky in the well-conditioned
    # preconditioned frame). ---
    kK = K - jnp.int32(1)
    start_load(kK)
    m_T, C_T, ex_T = wait_and_read(kK)

    @pl.when(K >= 2)
    def _():
        start_load(kK - jnp.int32(1))

    lh0 = ex_T[3]
    ps0, Lh0 = precond_factor(C_T, lh0)
    Ls0 = as_lanes([
        [_smul(jnp.exp((q_half - i) * lh0), Lh0[i][l]) for l in range(nq)]
        for i in range(nq)
    ])
    ms0 = m_T
    pend_lh = ex_T[1]
    pend_s2 = ex_T[2]
    first = (zero + 1.0) - ex_T[0]
    write_saves(ex_T, ms0, Ls0)

    if cheb is None:
        At_st = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
        QL_st = [[float(QLt[i, l]) for l in range(nq)] for i in range(nq)]

    def body(step, carry):
        ms, Ls, pend_lh, pend_s2, first = carry
        k = K - jnp.int32(2) - step
        m_f, C_f, ex = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.int32(1))

        lh = pend_lh
        if cheb is None:
            Atl, QLl = At_st, QL_st
        else:
            Atl, QLl, _ = _cheb_transition_lists(cheb, lh, nq)
        ps_, Lh_f = precond_factor(C_f, lh)
        pinv_ = [jnp.exp((q_half - i) * lh) for i in range(nq)]
        mh_f = [[m_f[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        msh = [[ms[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        Lsh = [[_smul(ps_[i], Ls[i][l]) for l in range(nq)]
               for i in range(nq)]
        sq_s2 = jnp.sqrt(pend_s2)

        AtL = [
            [
                _sreduce([_smul(Atl[i][a], Lh_f[a][b]) for a in range(nq)])
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        qT = [
            [_smul(sq_s2, QLl[i][a]) for i in range(nq)]
            for a in range(nq)
        ]
        Lp = _list_mgs_tril(_t_rows(AtL, nq) + qT, 2 * nq, nq)
        M = [
            [
                _sreduce([_smul(Lh_f[i][b], AtL[l][b]) for b in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        G = [_list_cho_solve(Lp, [(zero + x) if _is0(x) else x
                                  for x in M[i]], nq)
             for i in range(nq)]
        mp = [
            [
                _sreduce([_smul(Atl[i][l], mh_f[l][j]) for l in range(nq)])
                for j in range(d)
            ]
            for i in range(nq)
        ]
        dm = [[msh[i][j] - mp[i][j] for j in range(d)] for i in range(nq)]
        ms_new = [
            [
                mh_f[i][j]
                + _sreduce([_smul(G[i][l], dm[l][j]) for l in range(nq)])
                for j in range(d)
            ]
            for i in range(nq)
        ]
        GA = [
            [
                _sreduce([_smul(G[i][a], Atl[a][l]) for a in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        IGA = [
            [(1.0 - GA[i][l]) if i == l else
             (0.0 - GA[i][l] if not _is0(GA[i][l]) else 0.0)
             for l in range(nq)]
            for i in range(nq)
        ]
        b1 = [
            [
                _sreduce([_smul(IGA[i][a], Lh_f[a][l]) for a in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        GQ = [
            [
                _smul(sq_s2,
                      _sreduce([_smul(G[i][a], QLl[a][l])
                                for a in range(nq)]))
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        b3 = [
            [
                _sreduce([_smul(G[i][a], Lsh[a][l]) for a in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        Ls_new = _list_mgs_tril(
            _t_rows(b1, nq) + _t_rows(GQ, nq) + _t_rows(b3, nq), 3 * nq, nq
        )
        # unprecondition (row scaling) and masked commits
        do = (ex[0] * ((zero + 1.0) - first)) > 0.5
        ms = [
            [jnp.where(do, pinv_[i] * ms_new[i][j], ms[i][j])
             for j in range(d)]
            for i in range(nq)
        ]
        Ls = [
            [jnp.where(do, pinv_[i] * Ls_new[i][l], Ls[i][l])
             for l in range(nq)]
            for i in range(nq)
        ]
        # first-encounter lanes: carry (= final state) is already the
        # smoothed state at this row; just arm the pending step scalars
        took = ex[0] > 0.5
        pend_lh = jnp.where(took, ex[1], pend_lh)
        pend_s2 = jnp.where(took, ex[2], pend_s2)
        first = jnp.where(took, zero, first)
        write_saves(ex, ms, Ls)
        return ms, Ls, pend_lh, pend_s2, first

    jax.lax.fori_loop(
        jnp.int32(0), K - jnp.int32(1), body,
        (ms0, Ls0, pend_lh, pend_s2, first),
    )


@_no_x64
def ek0_adaptive_fused_smooth(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,) per-member initial dt (Hairer heuristic)
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Adaptive per-lane EK0(dynamic) filter + square-root RTS smoother,
    fully fused (the reference's default solve configuration,
    `algorithms.jl:24` smooth=true + `integrator_utils.jl:20-26`, at
    ensemble-kernel throughput). Forward kernel streams one packed row
    per attempt to HBM; backward kernel walks it in reverse with per-lane
    masking — see the section comment above `_ek0_adaptive_stream_kernel`.

    ``max_iters`` bounds TOTAL attempts per member AND sizes the HBM
    attempt stream (~(nq+1) x max(d+nq,6) x 4 KiB per attempt per
    1024-member block), hence the much smaller default than the
    filter-only kernel. Returns ``(us, stds, lls, nacc, nrej, failed)``;
    ``us``/``stds`` are the SMOOTHED posterior means/stds on the save
    grid, ``lls`` the filter data log-likelihoods.
    """
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_: ek0_adaptive_fused_smooth(
                f, m0_, ps_, dt0_, t0, t1, n_save, q, abstol=abstol,
                reltol=reltol, max_iters=max_iters, dtmin=dtmin,
                prior=prior, second_order=second_order,
            ),
            (m0, ps, dt0s), in_axes=(2, 1, 0),
            out_axes=(2, 1, 0, 0, 0, 0),
        )
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    Qt_np = QLt_np @ QLt_np.T
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)

    Wp = max(d + nq, 6)
    fkernel = functools.partial(
        _ek0_adaptive_stream_kernel,
        f=f, At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq, Wp=Wp,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order),
    )
    scratch = [
        pltpu.VMEM((2, nq + 1, Wp, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def fentry(m0_blk, p_blk, dt0_blk, ll_blk, na_blk, nr_blk, fl_blk,
               it_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
            it_blk.at[jnp.int32(0)], st_hbm.at[b], row, sem,
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    lane_shape = jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype)
    lls, nacc, nrej, fail, iters, st = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[lane(), lane(), lane(), lane(), lane(),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            lane_shape, lane_shape, lane_shape, lane_shape, lane_shape,
            jax.ShapeDtypeStruct(
                (nb, int(max_iters), nq + 1, Wp, _SUB, _LANE), dtype
            ),
        ],
        scratch_shapes=scratch,
    )(m0_b, ps_b, dt0_b)

    skernel = functools.partial(
        _ek0_adaptive_smoother_kernel,
        At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        S=S, d=d, nq=nq, Wp=Wp, cheb=cheb, so=bool(second_order),
    )

    def sentry(m0_blk, it_blk, st_hbm, us_blk, std_blk, row, sem):
        b = pl.program_id(0)
        skernel(
            m0_blk.at[jnp.int32(0)], it_blk.at[jnp.int32(0)], st_hbm.at[b],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)], row, sem,
        )

    us_s, std_s = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, S + 1, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_b, iters, st)

    us = us_s.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    stds = std_s.transpose(1, 0, 2, 3).reshape(S + 1, B)
    return (us, stds, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def solve_ensemble_ek0_adaptive_smooth_pallas(
    prob_f: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Taylor-init + fused adaptive EK0 filter + RTS smoother ensemble —
    the fused-kernel form of the reference's DEFAULT solve (adaptive +
    smooth). Same argument conventions as
    :func:`solve_ensemble_ek0_adaptive_pallas`; returns SMOOTHED
    ``(us, stds, lls, nacc, nrej, failed)`` on the save grid."""
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(prob_f, u0_full[:d], u0_full[d:], tspan, p=p)
        else:
            m = jnp.stack(taylor_coefficients(prob_f, u0_full, p, t0, q))
            pr = ode_problem(prob_f, u0_full, tspan, p=p)
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    return ek0_adaptive_fused_smooth(
        prob_f, m0, ps.T, dt0s, float(t0), float(t1), n_save, q,
        abstol=abstol, reltol=reltol, max_iters=max_iters, prior=prior,
        mesh=mesh, second_order=second_order,
    )


# ==========================================================================
# Adaptive-step fused DiagonalEK1 filter + RTS smoother (per-lane dt).
#
# The EK0 pair's attempt-stream design (see `_ek0_adaptive_stream_kernel`)
# carried to DiagonalEK1: d independent per-dimension (q+1, q+1) filters
# per member (`_ek1d_adaptive_kernel` semantics), each streaming its plain
# posterior covariance. The structural-zero Cholesky needs one extra move
# here: the R=0 update collapses the MEASUREMENT direction, which for
# DiagonalEK1 is not a coordinate axis — `h_j = pinv1 e1 - J_jj pinv0 e0`.
# But its null vector is known in closed form: unpreconditioned it is
# exactly `(-J_jj, 1, 0, ..)` (the preconditioner powers cancel), so the
# forward streams the COMMITTED Jacobian diagonal alongside the state and
# the backward Householder-reflects that direction onto the measured
# coefficient axis, Choleskys with the structural zero there, and
# reflects the factor back — exact up to roundoff, no jitter.
# ==========================================================================


def _householder_block(vs, bx):
    """nh x nh reflection block R (R = R^T = R^-1) mapping the direction
    ``vs`` (nh lane-vector components, vs[bx] > 0 structurally) onto
    ``-e_bx``: u = v/|v| + e_bx is never degenerate because v̂[bx] > 0."""
    nh = len(vs)
    nrm = jnp.sqrt(
        functools.reduce(lambda a, b: a + b, [v * v for v in vs])
    )
    vh = [v / nrm for v in vs]
    u = [vh[i] + (1.0 if i == bx else 0.0) for i in range(nh)]
    coef = 2.0 / (2.0 * (1.0 + vh[bx]))
    return [
        [
            (1.0 if i == l else 0.0) - coef * u[i] * u[l]
            for l in range(nh)
        ]
        for i in range(nh)
    ]


def _rot_factor(Ch, vs, bx, nq):
    """Factor a plain preconditioned covariance whose exact null direction
    is ``vs`` (supported on indices 0..len(vs)-1): reflect that direction
    onto axis ``bx``, structural-zero Cholesky there, reflect the factor
    rows back. Returns a (non-triangular) square root L with L L^T = Ch —
    the downstream sqrt-RTS only needs *a* square root, not a triangle."""
    nh = len(vs)
    Rb = _householder_block(vs, bx)
    # rows 0..nh-1 of R @ Ch
    RC = [
        [
            _sreduce([_smul(Rb[i][k], Ch[k][l]) for k in range(nh)])
            for l in range(nq)
        ]
        for i in range(nh)
    ] + [Ch[i] for i in range(nh, nq)]
    # cols 0..nh-1 of (R @ Ch) @ R
    CRR = [
        [
            _sreduce([_smul(RC[i][k], Rb[l][k]) for k in range(nh)])
            if l < nh else RC[i][l]
            for l in range(nq)
        ]
        for i in range(nq)
    ]
    Lr = _list_cholesky(CRR, nq, zero_row=bx)
    # L = R @ Lr (rows 0..nh-1 mixed)
    return [
        [
            _sreduce([_smul(Rb[i][k], Lr[k][l]) for k in range(nh)])
            for l in range(nq)
        ]
        for i in range(nh)
    ] + [Lr[i] for i in range(nh, nq)]


def _ek1d_adaptive_stream_kernel(
    m0_ref, p_ref, dt0_ref, ll_ref, nacc_ref, nrej_ref, fail_ref, it_ref,
    st_ref, row, sem, *,
    f: Callable, jac_diag: Callable, At: np.ndarray, Qt: np.ndarray,
    S: int, dt_save: float, t0: float, d: int, nq: int, Wp: int,
    abstol: float, reltol: float, max_iters: int, dtmin: float,
    beta1: float, beta2: float, cheb=None, so: bool = False,
):
    """`_ek1d_adaptive_kernel` with a per-attempt HBM state stream. Row
    layout (nq+1, Wp): rows i < nq hold [m[i] (d) | C_0[i] (nq) | ... |
    C_{d-1}[i] (nq)]; row nq holds [accept, log dt_eff, s2, log dt_cur,
    is_save, seg+1 | committed jac diagonal (d, or 2d second-order)]."""
    q_half = nq - 1 + 0.5

    def _is0f(x):
        return isinstance(x, float) and x == 0.0

    h0 = dt0_ref[0]
    zero = jnp.zeros_like(h0)
    one = zero + 1.0

    m = [[m0_ref[i, j] for j in range(d)] for i in range(nq)]
    C = [[[zero for _ in range(nq)] for _ in range(nq)] for _ in range(d)]
    p_block = p_ref[:]
    u_prev = [m0_ref[0, j] for j in range(d)]
    njd = 2 * d if so else d
    jdc = [zero for _ in range(njd)]   # committed jac diagonal(s)

    def pack_and_send(k_idx, m, C, jdc, extras):
        slot = jax.lax.rem(k_idx, jnp.int32(2))

        @pl.when(k_idx >= 2)
        def _():
            pltpu.make_async_copy(
                row.at[slot], st_ref.at[k_idx], sem.at[slot]
            ).wait()

        for i in range(nq):
            for j in range(d):
                row[slot, i, j] = m[i][j]
            for j in range(d):
                for l in range(nq):
                    row[slot, i, d + j * nq + l] = C[j][i][l]
        for c, v in enumerate(extras):
            row[slot, nq, c] = v
        for c, v in enumerate(jdc):
            row[slot, nq, 6 + c] = v
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).start()

    def cond(carry):
        seg, iters = carry[0], carry[1]
        return (seg < S) & (iters < max_iters)

    def body(carry):
        (seg, iters, t, dt, qold, ll, nacc, nrej, failed,
         m, C, u_prev, jdc) = carry
        dtype = zero.dtype
        t_save = jnp.asarray(t0, dtype) + jnp.asarray(dt_save, dtype) * (
            seg.astype(dtype) + 1.0
        )
        not_failed = failed < 0.5
        active = (t < t_save) & not_failed
        remaining = t_save - t
        hit_save = dt >= remaining
        dt_eff = jnp.where(active, jnp.where(hit_save, remaining, dt), one)

        lh = jnp.log(dt_eff)
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        mh = [[m[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        Chs = [
            [[C[j][i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
             for i in range(nq)]
            for j in range(d)
        ]
        pinv0 = jnp.exp(q_half * lh)
        pinv1 = jnp.exp((q_half - 1.0) * lh)
        if cheb is None:
            Atl = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
            Qtl = [[float(Qt[i, l]) for l in range(nq)] for i in range(nq)]
        else:
            Atl, _, Qtl = _cheb_transition_lists(cheb, lh, nq)

        mp = [
            [
                _sreduce([_smul(Atl[i][l], mh[l][j]) for l in range(nq)])
                for j in range(d)
            ]
            for i in range(nq)
        ]
        t_new = jnp.where(hit_save, t_save, t + dt_eff)
        u_pred = jnp.stack([pinv0 * mp[0][j] for j in range(d)])
        if so:
            pinv2 = jnp.exp((q_half - 2.0) * lh)
            du_pred = jnp.stack([pinv1 * mp[1][j] for j in range(d)])
            ddu = f(du_pred, u_pred, p_block, t_new)
            jd_u, jd_du = jac_diag(du_pred, u_pred, p_block, t_new)
            z = [pinv2 * mp[2][j] - ddu[j] for j in range(d)]
            hc = [[-jd_u[j] * pinv0, -jd_du[j] * pinv1, pinv2]
                  for j in range(d)]
            jd_flat = [jd_u[j] for j in range(d)] + [jd_du[j] for j in range(d)]
            nh = 3
        else:
            du = f(u_pred, p_block, t_new)
            jd = jac_diag(u_pred, p_block, t_new)
            z = [pinv1 * mp[1][j] - du[j] for j in range(d)]
            hc = [[-jd[j] * pinv0, pinv1] for j in range(d)]
            jd_flat = [jd[j] for j in range(d)]
            nh = 2

        def h_quad(M, j):
            c = hc[j]
            return functools.reduce(
                lambda a, b: a + b,
                [c[i] * c[l] * M[i][l]
                 for i in range(nh) for l in range(nh)],
            )

        hq = [h_quad(Qtl, j) for j in range(d)]
        s2 = functools.reduce(
            lambda a, b: a + b, [z[j] * z[j] / hq[j] for j in range(d)]
        ) / d

        m_new = [[None] * d for _ in range(nq)]
        C_new = []
        s_list, err_acc = [], zero
        for j in range(d):
            Ch = Chs[j]
            tmp = [
                [
                    _sreduce([_smul(Atl[i][a], Ch[a][b]) for a in range(nq)])
                    for b in range(nq)
                ]
                for i in range(nq)
            ]
            Cp = [
                [
                    _sreduce([_smul(tmp[i][b], Atl[l][b]) for b in range(nq)])
                    + Qtl[i][l] * s2
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            s = h_quad(Cp, j)
            s_list.append(s)
            inv_s = 1.0 / s
            kg = [
                functools.reduce(
                    lambda a, b: a + b,
                    [hc[j][l] * Cp[i][l] for l in range(nh)],
                ) * inv_s
                for i in range(nq)
            ]
            for i in range(nq):
                m_new[i][j] = mp[i][j] - kg[i] * z[j]
            C_new.append(
                [[Cp[i][l] - kg[i] * kg[l] * s for l in range(nq)]
                 for i in range(nq)]
            )

        maha = functools.reduce(
            lambda a, b: a + b, [z[j] * z[j] / s_list[j] for j in range(d)]
        )
        logdet = functools.reduce(
            lambda a, b: a + b,
            [jnp.log(jnp.maximum(s_list[j], 1e-30)) for j in range(d)],
        )
        ll_inc = -0.5 * (maha + logdet + d * _LOG_2PI)
        u_filt = [pinv0 * m_new[0][j] for j in range(d)]

        for j in range(d):
            sc = abstol + reltol * jnp.maximum(
                jnp.abs(u_prev[j]), jnp.abs(u_filt[j])
            )
            r = dt_eff * jnp.sqrt(jnp.maximum(s2 * hq[j], 0.0)) / sc
            err_acc = err_acc + r * r
        EEst = jnp.sqrt(err_acc / d)
        EEst = jnp.where(jnp.isfinite(EEst), EEst, 1e10)
        accept = active & (EEst <= 1.0)

        eg = jnp.maximum(EEst, 1e-35)
        leg = jnp.log(eg)
        q11 = jnp.exp(beta1 * leg)
        qq = q11 * jnp.exp(-beta2 * jnp.log(jnp.maximum(qold, 1e-35)))
        qq = jnp.maximum(1.0 / _QMAX, jnp.minimum(1.0 / _QMIN, qq / _GAMMA))
        dt_acc = dt_eff / qq
        last_seg = seg >= S - 1
        dt_acc = jnp.where(hit_save & ~last_seg, jnp.maximum(dt_acc, dt), dt_acc)
        qold_acc = jnp.maximum(EEst, _QOLDINIT)
        dt_rej = dt_eff / jnp.minimum(1.0 / _QMIN, q11 / _GAMMA)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        newly_failed = active & ~hit_save & (
            (dt_new < dtmin) | (accept & (t_new <= t))
        )
        failed = jnp.maximum(failed, jnp.where(newly_failed, one, zero))
        not_failed = failed < 0.5

        m_new = [[m_new[i][j] / ps_[i] for j in range(d)] for i in range(nq)]
        C_new = [
            [[C_new[j][i][l] / (ps_[i] * ps_[l]) for l in range(nq)]
             for i in range(nq)]
            for j in range(d)
        ]
        m = [
            [jnp.where(accept, m_new[i][j], m[i][j]) for j in range(d)]
            for i in range(nq)
        ]
        C = [
            [[jnp.where(accept, C_new[j][i][l], C[j][i][l])
              for l in range(nq)] for i in range(nq)]
            for j in range(d)
        ]
        jdc = [jnp.where(accept, jd_flat[c], jdc[c]) for c in range(njd)]
        t = jnp.where(accept, t_new, t)
        dt = jnp.where(active & not_failed, dt_new, dt)
        qold = jnp.where(accept, qold_acc, qold)
        ll = jnp.where(accept, ll + ll_inc, ll)
        u_prev = [jnp.where(accept, u_filt[j], u_prev[j]) for j in range(d)]
        nacc = nacc + jnp.where(accept, one, zero)
        nrej = nrej + jnp.where(active & ~accept, one, zero)
        t = jnp.where(not_failed, t, zero + jnp.asarray(1e30, zero.dtype))

        extras = [
            jnp.where(accept, one, zero),
            lh,
            s2,
            jnp.log(dt),
            jnp.where(accept & hit_save, one, zero),
            zero + (seg.astype(dtype) + 1.0),
        ]
        pack_and_send(iters, m, C, jdc, extras)

        seg_done = jnp.min(jnp.where(t >= t_save, one, zero)) > 0.5
        seg = jnp.where(seg_done, seg + 1, seg)
        return (seg, iters + 1, t, dt, qold, ll, nacc, nrej, failed,
                m, C, u_prev, jdc)

    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        zero + jnp.asarray(t0, zero.dtype), h0,
        zero + _QOLDINIT, zero, zero, zero,
        jnp.zeros_like(h0), m, C, u_prev, jdc,
    )
    out = jax.lax.while_loop(cond, body, init)
    K = out[1]
    ll_ref[...] = out[5]
    nacc_ref[...] = out[6]
    nrej_ref[...] = out[7]
    fail_ref[...] = jnp.where(
        (out[8] > 0.5) | (out[0] < S),
        jnp.ones_like(out[5]), jnp.zeros_like(out[5]),
    )
    it_ref[...] = zero + K.astype(zero.dtype)

    @pl.when(K >= 1)
    def _():
        k1 = K - jnp.int32(1)
        pltpu.make_async_copy(
            row.at[jax.lax.rem(k1, jnp.int32(2))], st_ref.at[k1],
            sem.at[jax.lax.rem(k1, jnp.int32(2))],
        ).wait()

    @pl.when(K >= 2)
    def _():
        k2 = K - jnp.int32(2)
        pltpu.make_async_copy(
            row.at[jax.lax.rem(k2, jnp.int32(2))], st_ref.at[k2],
            sem.at[jax.lax.rem(k2, jnp.int32(2))],
        ).wait()


def _ek1d_adaptive_smoother_kernel(
    m0_ref, it_ref, st_ref, us_ref, std_ref,
    row, sem, *,
    At: np.ndarray, QLt: np.ndarray, S: int, d: int, nq: int, Wp: int,
    cheb=None, so: bool = False,
):
    """Backward square-root RTS pass over the DiagonalEK1 attempt stream:
    d independent per-dimension recursions sharing the walk, the per-lane
    pend (next-step log-dt / s2) bookkeeping and the masked save-grid
    writes of `_ek0_adaptive_smoother_kernel`; per-dim filter factors via
    the Householder + structural-zero Cholesky (`_rot_factor`)."""
    q_half = nq - 1 + 0.5
    nh = 3 if so else 2
    bx = nh - 1

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        Cs = [
            [[row[slot, i, d + j * nq + l] for l in range(nq)]
             for i in range(nq)]
            for j in range(d)
        ]
        ex = [row[slot, nq, c] for c in range(6)]
        njd = 2 * d if so else d
        jd = [row[slot, nq, 6 + c] for c in range(njd)]
        return m, Cs, ex, jd

    K = jnp.max(it_ref[0]).astype(jnp.int32)

    zero = jnp.zeros_like(m0_ref[0, 0])
    for j in range(d):
        us_ref[jnp.int32(0), j] = m0_ref[0, j]
        std_ref[jnp.int32(0), j] = zero

    def null_dir(jd, j, pinv_):
        """Backward-frame null direction of dim j's posterior: the
        unpreconditioned null vector is exactly (-J_jj, 1) — first-order —
        or (-Ju_jj, -Jdu_jj, 1) (the update-frame preconditioner powers
        cancel), re-preconditioned here with the smoothing frame's pinv."""
        if so:
            return [-jd[j] * pinv_[0], -jd[d + j] * pinv_[1], pinv_[2]]
        return [-jd[j] * pinv_[0], pinv_[1]]

    def factor_dim(C_j, jd, j, lh):
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        pinv_ = [jnp.exp((q_half - i) * lh) for i in range(nq)]
        Ch = [[C_j[i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
              for i in range(nq)]
        return ps_, pinv_, _rot_factor(Ch, null_dir(jd, j, pinv_), bx, nq)

    def as_lanes(M):
        return [[(zero + x) if _is0(x) else x for x in r] for r in M]

    def write_saves(ex, ms, Lss):
        is_save, seg1f = ex[4], ex[5]

        @pl.when(jnp.max(is_save) > 0.5)
        def _():
            seg1 = jnp.max(seg1f).astype(jnp.int32)
            wm = is_save > 0.5
            for j in range(d):
                us_ref[seg1, j] = jnp.where(wm, ms[0][j], us_ref[seg1, j])
                sv = jnp.sqrt(
                    functools.reduce(lambda a, b: a + b,
                                     [x * x for x in Lss[j][0]])
                )
                std_ref[seg1, j] = jnp.where(wm, sv, std_ref[seg1, j])

    kK = K - jnp.int32(1)
    start_load(kK)
    m_T, Cs_T, ex_T, jd_T = wait_and_read(kK)

    @pl.when(K >= 2)
    def _():
        start_load(kK - jnp.int32(1))

    lh0 = ex_T[3]
    Lss0 = []
    for j in range(d):
        _, pinv0_, Lh0 = factor_dim(Cs_T[j], jd_T, j, lh0)
        Lss0.append(as_lanes([
            [_smul(pinv0_[i], Lh0[i][l]) for l in range(nq)]
            for i in range(nq)
        ]))
    ms0 = m_T
    pend_lh = ex_T[1]
    pend_s2 = ex_T[2]
    first = (zero + 1.0) - ex_T[0]
    write_saves(ex_T, ms0, Lss0)

    if cheb is None:
        At_st = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
        QL_st = [[float(QLt[i, l]) for l in range(nq)] for i in range(nq)]

    def body(step, carry):
        ms, Lss, pend_lh, pend_s2, first = carry
        k = K - jnp.int32(2) - step
        m_f, Cs_f, ex, jd = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.int32(1))

        lh = pend_lh
        if cheb is None:
            Atl, QLl = At_st, QL_st
        else:
            Atl, QLl, _ = _cheb_transition_lists(cheb, lh, nq)
        sq_s2 = jnp.sqrt(pend_s2)
        do = (ex[0] * ((zero + 1.0) - first)) > 0.5

        ms_cols = [[None] * d for _ in range(nq)]
        Lss_new = []
        ps_ = pinv_ = None
        for j in range(d):
            ps_, pinv_, Lh_f = factor_dim(Cs_f[j], jd, j, lh)
            mh_f = [m_f[i][j] * ps_[i] for i in range(nq)]
            msh = [ms[i][j] * ps_[i] for i in range(nq)]
            Lsh = [[_smul(ps_[i], Lss[j][i][l]) for l in range(nq)]
                   for i in range(nq)]

            AtL = [
                [
                    _sreduce([_smul(Atl[i][a], Lh_f[a][b])
                              for a in range(nq)])
                    for b in range(nq)
                ]
                for i in range(nq)
            ]
            qT = [
                [_smul(sq_s2, QLl[i][a]) for i in range(nq)]
                for a in range(nq)
            ]
            Lp = _list_mgs_tril(_t_rows(AtL, nq) + qT, 2 * nq, nq)
            M = [
                [
                    _sreduce([_smul(Lh_f[i][b], AtL[l][b])
                              for b in range(nq)])
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            G = [_list_cho_solve(Lp, [(zero + x) if _is0(x) else x
                                      for x in M[i]], nq)
                 for i in range(nq)]
            mp = [
                _sreduce([_smul(Atl[i][l], mh_f[l]) for l in range(nq)])
                for i in range(nq)
            ]
            dm = [msh[i] - mp[i] for i in range(nq)]
            ms_new = [
                mh_f[i]
                + _sreduce([_smul(G[i][l], dm[l]) for l in range(nq)])
                for i in range(nq)
            ]
            GA = [
                [
                    _sreduce([_smul(G[i][a], Atl[a][l]) for a in range(nq)])
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            IGA = [
                [(1.0 - GA[i][l]) if i == l else
                 (0.0 - GA[i][l] if not _is0(GA[i][l]) else 0.0)
                 for l in range(nq)]
                for i in range(nq)
            ]
            b1 = [
                [
                    _sreduce([_smul(IGA[i][a], Lh_f[a][l])
                              for a in range(nq)])
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            GQ = [
                [
                    _smul(sq_s2,
                          _sreduce([_smul(G[i][a], QLl[a][l])
                                    for a in range(nq)]))
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            b3 = [
                [
                    _sreduce([_smul(G[i][a], Lsh[a][l]) for a in range(nq)])
                    for l in range(nq)
                ]
                for i in range(nq)
            ]
            Ls_new = _list_mgs_tril(
                _t_rows(b1, nq) + _t_rows(GQ, nq) + _t_rows(b3, nq),
                3 * nq, nq
            )
            for i in range(nq):
                ms_cols[i][j] = jnp.where(
                    do, pinv_[i] * ms_new[i], ms[i][j]
                )
            Lss_new.append([
                [jnp.where(do, pinv_[i] * Ls_new[i][l], Lss[j][i][l])
                 for l in range(nq)]
                for i in range(nq)
            ])

        took = ex[0] > 0.5
        pend_lh = jnp.where(took, ex[1], pend_lh)
        pend_s2 = jnp.where(took, ex[2], pend_s2)
        first = jnp.where(took, zero, first)
        write_saves(ex, ms_cols, Lss_new)
        return ms_cols, Lss_new, pend_lh, pend_s2, first

    jax.lax.fori_loop(
        jnp.int32(0), K - jnp.int32(1), body,
        (ms0, Lss0, pend_lh, pend_s2, first),
    )


@_no_x64
def ek1d_adaptive_fused_smooth(
    f: Callable,
    jac_diag: Optional[Callable],
    m0: jax.Array,      # (q+1, d, B)
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,)
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Adaptive per-lane DiagonalEK1(dynamic) filter + square-root RTS
    smoother, fully fused: the stiff-capable counterpart of
    :func:`ek0_adaptive_fused_smooth` (per-dim linearized filters, exact
    `ops/kron.py _kron_attempt_step_diag` semantics). Returns
    ``(us, stds, lls, nacc, nrej, failed)`` with PER-DIMENSION smoothed
    stds (S+1, d, B). ``max_iters`` sizes the HBM attempt stream
    (d+1 times the EK0 pair's row width at equal d)."""
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if jac_diag is None:
        jac_diag = (
            _auto_jac_diag_2nd(f) if second_order else _auto_jac_diag(f)
        )
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_: ek1d_adaptive_fused_smooth(
                f, jac_diag, m0_, ps_, dt0_, t0, t1, n_save, q,
                abstol=abstol, reltol=reltol, max_iters=max_iters,
                dtmin=dtmin, prior=prior, second_order=second_order,
            ),
            (m0, ps, dt0s), in_axes=(2, 1, 0),
            out_axes=(2, 2, 0, 0, 0, 0),
        )
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    Qt_np = QLt_np @ QLt_np.T
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)

    njd = 2 * d if second_order else d
    Wp = max(d + d * nq, 6 + njd)
    fkernel = functools.partial(
        _ek1d_adaptive_stream_kernel,
        f=f, jac_diag=jac_diag,
        At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq, Wp=Wp,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order),
    )
    scratch = [
        pltpu.VMEM((2, nq + 1, Wp, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def fentry(m0_blk, p_blk, dt0_blk, ll_blk, na_blk, nr_blk, fl_blk,
               it_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
            it_blk.at[jnp.int32(0)], st_hbm.at[b], row, sem,
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    lane_shape = jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype)
    lls, nacc, nrej, fail, iters, st = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[lane(), lane(), lane(), lane(), lane(),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            lane_shape, lane_shape, lane_shape, lane_shape, lane_shape,
            jax.ShapeDtypeStruct(
                (nb, int(max_iters), nq + 1, Wp, _SUB, _LANE), dtype
            ),
        ],
        scratch_shapes=scratch,
    )(m0_b, ps_b, dt0_b)

    skernel = functools.partial(
        _ek1d_adaptive_smoother_kernel,
        At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        S=S, d=d, nq=nq, Wp=Wp, cheb=cheb, so=bool(second_order),
    )

    def sentry(m0_blk, it_blk, st_hbm, us_blk, std_blk, row, sem):
        b = pl.program_id(0)
        skernel(
            m0_blk.at[jnp.int32(0)], it_blk.at[jnp.int32(0)], st_hbm.at[b],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)], row, sem,
        )

    us_s, std_s = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_b, iters, st)

    us = us_s.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    stds = std_s.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    return (us, stds, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def solve_ensemble_ek1d_adaptive_smooth_pallas(
    prob_f: Callable,
    jac_diag: Optional[Callable],
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Taylor-init + fused adaptive DiagonalEK1 filter + RTS smoother
    ensemble (the stiff-capable adaptive+smooth fused path). Same
    argument conventions as :func:`solve_ensemble_ek1d_adaptive_pallas`;
    returns SMOOTHED ``(us, stds, lls, nacc, nrej, failed)`` with
    per-dimension stds."""
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(prob_f, u0_full[:d], u0_full[d:], tspan, p=p)
        else:
            m = jnp.stack(taylor_coefficients(prob_f, u0_full, p, t0, q))
            pr = ode_problem(prob_f, u0_full, tspan, p=p)
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    return ek1d_adaptive_fused_smooth(
        prob_f, jac_diag, m0, ps.T, dt0s, float(t0), float(t1), n_save, q,
        abstol=abstol, reltol=reltol, max_iters=max_iters, prior=prior,
        mesh=mesh, second_order=second_order,
    )


# ==========================================================================
# Adaptive-step fused dense-EK1 filter + RTS smoother (per-lane dt).
#
# The EK0 pair's attempt-stream design (`_ek0_adaptive_stream_kernel`)
# carried to the full D x D EK1 — the reference's literal DEFAULT
# configuration (`algorithms.jl:46-51` EK1 smooth=true,
# `integrator_utils.jl:20-26` smooth_all! in the postamble) at
# ensemble-kernel speed. One structural difference from the EK0/Diagonal
# pairs: those stream the committed PLAIN covariance (small per-dim
# blocks) and re-factor it in the backward pass with a structural-zero /
# Householder-rotated Cholesky, because the R=0 update's collapsed
# direction is known there. Dense EK1 collapses a rank-d measurement
# subspace with no closed form — so the forward streams the committed
# SQUARE-ROOT FACTOR itself (rank-deficiency is harmless in a factor; the
# backward RTS only multiplies by it, exactly like the fixed-grid
# `_ekd_smoother_kernel`). The interval's predicted factor is recomputed
# in the backward pass from the streamed filter factor at the carried
# next-step (log dt, sigma^2) — the identical preconditioned MGS the
# forward ran, so no Lp needs streaming (rejected attempts would make a
# streamed Lp mostly dead weight anyway).
#
# HBM cost: max_iters x (D+1) x max(D+1, 6) x 4 KiB per 1024-member
# block (d=2, q=3: ~330 KiB/attempt -> ~168 MiB at max_iters=512), so the
# smooth entry defaults max_iters well below the filter-only kernel.
# ==========================================================================


def _ek1_adaptive_stream_kernel(
    m0_ref, p_ref, dt0_ref, ll_ref, nacc_ref, nrej_ref, fail_ref, it_ref,
    st_ref, row, sem, *,
    f: Callable, jac: Callable, At: np.ndarray, QLt: np.ndarray,
    S: int, dt_save: float, t0: float, d: int, nq: int, Wp: int,
    abstol: float, reltol: float, max_iters: int, dtmin: float,
    beta1: float, beta2: float, cheb=None, so: bool = False,
):
    """`_ek1_adaptive_kernel` with a per-attempt HBM state stream (no
    filtered us/std outputs — the solution falls out of the backward
    smoother). Row layout (D+1, Wp): rows r < D hold
    [L[r] (D) | m[r] (1)]; row D holds the per-lane scalars
    [accept, log dt_eff, s2, log dt_cur, is_save, seg+1]."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))
    q_half = nq - 1 + 0.5

    h0 = dt0_ref[0]
    zero = jnp.zeros_like(h0)
    one = zero + 1.0

    # carry is the UNPRECONDITIONED canonical state; L is a FACTOR
    # (row-only preconditioning — see `_ek1_adaptive_kernel`)
    m = [m0_ref[r // d, r % d] for r in range(D)]
    L = [[zero for _ in range(D)] for _ in range(D)]
    p_block = p_ref[:]
    u_prev = [m0_ref[0, j] for j in range(d)]

    def _is0f(x):
        return isinstance(x, float) and x == 0.0

    def pack_and_send(k_idx, m, L, extras):
        slot = jax.lax.rem(k_idx, jnp.int32(2))

        @pl.when(k_idx >= 2)
        def _():
            pltpu.make_async_copy(
                row.at[slot], st_ref.at[k_idx], sem.at[slot]
            ).wait()

        for r in range(D):
            for c in range(D):
                row[slot, r, c] = L[r][c]
            row[slot, r, D] = m[r]
        for c, v in enumerate(extras):
            row[slot, D, c] = v
        pltpu.make_async_copy(
            row.at[slot], st_ref.at[k_idx], sem.at[slot]
        ).start()

    def cond(carry):
        seg, iters = carry[0], carry[1]
        return (seg < S) & (iters < max_iters)

    def body(carry):
        (seg, iters, t, dt, qold, ll, nacc, nrej, failed,
         m, L, u_prev) = carry
        dtype = zero.dtype
        t_save = jnp.asarray(t0, dtype) + jnp.asarray(dt_save, dtype) * (
            seg.astype(dtype) + 1.0
        )
        not_failed = failed < 0.5
        active = (t < t_save) & not_failed
        remaining = t_save - t
        hit_save = dt >= remaining
        dt_eff = jnp.where(active, jnp.where(hit_save, remaining, dt), one)

        lh = jnp.log(dt_eff)
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        mh = [m[r] * ps_[r // d] for r in range(D)]
        Lh = [[L[r][c] * ps_[r // d] for c in range(D)] for r in range(D)]
        pinv0 = jnp.exp(q_half * lh)
        pinv1 = jnp.exp((q_half - 1.0) * lh)
        if cheb is None:
            Afl = [[float(Af[r, c]) for c in range(D)] for r in range(D)]
            QLfl = [[float(QLf[r, c]) for c in range(D)] for r in range(D)]
        else:
            Atl, QLtl, _ = _cheb_transition_lists(cheb, lh, nq)
            Afl = [[Atl[r // d][c // d] if (r % d) == (c % d) else 0.0
                    for c in range(D)] for r in range(D)]
            QLfl = [[QLtl[r // d][c // d] if (r % d) == (c % d) else 0.0
                     for c in range(D)] for r in range(D)]

        mp = [
            _sreduce([_smul(Afl[r][c], mh[c]) for c in range(D)])
            for r in range(D)
        ]
        t_new = jnp.where(hit_save, t_save, t + dt_eff)
        u_pred = jnp.stack([pinv0 * mp[j] for j in range(d)])
        if so:
            pinv2 = jnp.exp((q_half - 2.0) * lh)
            du_pred = jnp.stack([pinv1 * mp[d + a] for a in range(d)])
            ddu = f(du_pred, u_pred, p_block, t_new)
            Ju, Jdu = jac(du_pred, u_pred, p_block, t_new)
            z = [pinv2 * mp[2 * d + a] - ddu[a] for a in range(d)]

            def Hmul_cols(M, K):
                out = []
                for a in range(d):
                    row_ = []
                    for kk in range(K):
                        v = pinv2 * M[2 * d + a][kk]
                        for b in range(d):
                            v = v - Jdu[a, b] * (pinv1 * M[d + b][kk])
                            v = v - Ju[a, b] * (pinv0 * M[b][kk])
                        row_.append(v)
                    out.append(row_)
                return out
        else:
            du = f(u_pred, p_block, t_new)
            J = jac(u_pred, p_block, t_new)
            z = [pinv1 * mp[d + a] - du[a] for a in range(d)]

            def Hmul_cols(M, K):
                out = []
                for a in range(d):
                    row_ = []
                    for kk in range(K):
                        v = pinv1 * M[d + a][kk]
                        for b in range(d):
                            v = v - J[a, b] * (pinv0 * M[b][kk])
                        row_.append(v)
                    out.append(row_)
                return out

        QL_lists = [[zero if _is0f(QLfl[r][c]) else QLfl[r][c] + zero
                     for c in range(D)] for r in range(D)]
        HQ = Hmul_cols(QL_lists, D)
        Sq = [
            [
                _sreduce([HQ[a][c] * HQ[b][c] for c in range(D)])
                for b in range(d)
            ]
            for a in range(d)
        ]
        Lq = _list_chol(Sq, d)
        w = _list_cho_solve(Lq, z, d)
        s2 = _sreduce([z[a] * w[a] for a in range(d)]) / d
        sq_s2 = jnp.sqrt(jnp.maximum(s2, 0.0))

        AL = [
            [
                _sreduce([_smul(Afl[r][c], Lh[c][k]) for c in range(D)])
                for k in range(D)
            ]
            for r in range(D)
        ]
        qT = [
            [0.0 if _is0f(QLfl[r][c]) else sq_s2 * QLfl[r][c]
             for r in range(D)]
            for c in range(D)
        ]
        Lp = _list_mgs_tril(_t_rows(AL, D) + qT, 2 * D, D)

        Z = Hmul_cols(Lp, D)
        Sm = [
            [
                _sreduce([Z[a][c] * Z[b][c] for c in range(D)])
                for b in range(d)
            ]
            for a in range(d)
        ]
        Ls = _list_chol(Sm, d)
        LpZt = [
            [
                _sreduce([Lp[r][c] * Z[a][c] for c in range(D)])
                for a in range(d)
            ]
            for r in range(D)
        ]
        Kg = [_list_cho_solve(Ls, LpZt[r], d) for r in range(D)]
        m_new = [
            mp[r] - _sreduce([Kg[r][a] * z[a] for a in range(d)])
            for r in range(D)
        ]
        L_new = [
            [
                Lp[r][c] - _sreduce([Kg[r][a] * Z[a][c] for a in range(d)])
                for c in range(D)
            ]
            for r in range(D)
        ]
        wz = _list_cho_solve(Ls, z, d)
        maha = _sreduce([z[a] * wz[a] for a in range(d)])
        logdet = 2.0 * _sreduce(
            [jnp.log(jnp.maximum(Ls[a][a], 1e-30)) for a in range(d)]
        )
        ll_inc = -0.5 * (maha + logdet + d * _LOG_2PI)

        u_filt = [pinv0 * m_new[j] for j in range(d)]

        ee = zero
        for j in range(d):
            sc = abstol + reltol * jnp.maximum(
                jnp.abs(u_prev[j]), jnp.abs(u_filt[j])
            )
            r_ = dt_eff * jnp.sqrt(jnp.maximum(s2 * Sq[j][j], 0.0)) / sc
            ee = ee + r_ * r_
        EEst = jnp.sqrt(ee / d)
        EEst = jnp.where(jnp.isfinite(EEst), EEst, 1e10)
        accept = active & (EEst <= 1.0)

        eg = jnp.maximum(EEst, 1e-35)
        leg = jnp.log(eg)
        q11 = jnp.exp(beta1 * leg)
        qq = q11 * jnp.exp(-beta2 * jnp.log(jnp.maximum(qold, 1e-35)))
        qq = jnp.maximum(1.0 / _QMAX, jnp.minimum(1.0 / _QMIN, qq / _GAMMA))
        dt_acc = dt_eff / qq
        last_seg = seg >= S - 1
        dt_acc = jnp.where(hit_save & ~last_seg, jnp.maximum(dt_acc, dt), dt_acc)
        qold_acc = jnp.maximum(EEst, _QOLDINIT)
        dt_rej = dt_eff / jnp.minimum(1.0 / _QMIN, q11 / _GAMMA)
        dt_new = jnp.where(accept, dt_acc, dt_rej)
        newly_failed = active & ~hit_save & (
            (dt_new < dtmin) | (accept & (t_new <= t))
        )
        failed = jnp.maximum(failed, jnp.where(newly_failed, one, zero))
        not_failed = failed < 0.5

        # un-precondition (rows only — L is a factor), masked commits
        m_new = [m_new[r] / ps_[r // d] for r in range(D)]
        L_new = [
            [L_new[r][c] / ps_[r // d] for c in range(D)]
            for r in range(D)
        ]
        m = [jnp.where(accept, m_new[r], m[r]) for r in range(D)]
        L = [
            [jnp.where(accept, L_new[r][c], L[r][c]) for c in range(D)]
            for r in range(D)
        ]
        t = jnp.where(accept, t_new, t)
        dt = jnp.where(active & not_failed, dt_new, dt)
        qold = jnp.where(accept, qold_acc, qold)
        ll = jnp.where(accept, ll + ll_inc, ll)
        u_prev = [jnp.where(accept, u_filt[j], u_prev[j]) for j in range(d)]
        nacc = nacc + jnp.where(accept, one, zero)
        nrej = nrej + jnp.where(active & ~accept, one, zero)
        t = jnp.where(not_failed, t, zero + jnp.asarray(1e30, zero.dtype))

        extras = [
            jnp.where(accept, one, zero),
            lh,
            s2,
            jnp.log(dt),
            jnp.where(accept & hit_save, one, zero),
            zero + (seg.astype(dtype) + 1.0),
        ]
        pack_and_send(iters, m, L, extras)

        seg_done = jnp.min(jnp.where(t >= t_save, one, zero)) > 0.5
        seg = jnp.where(seg_done, seg + 1, seg)
        return (seg, iters + 1, t, dt, qold, ll, nacc, nrej, failed,
                m, L, u_prev)

    init = (
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
        zero + jnp.asarray(t0, zero.dtype), h0,
        zero + _QOLDINIT, zero, zero, zero,
        jnp.zeros_like(h0), m, L, u_prev,
    )
    out = jax.lax.while_loop(cond, body, init)
    K = out[1]
    ll_ref[...] = out[5]
    nacc_ref[...] = out[6]
    nrej_ref[...] = out[7]
    fail_ref[...] = jnp.where(
        (out[8] > 0.5) | (out[0] < S),
        jnp.ones_like(out[5]), jnp.zeros_like(out[5]),
    )
    it_ref[...] = zero + K.astype(zero.dtype)

    @pl.when(K >= 1)
    def _():
        k1 = K - jnp.int32(1)
        pltpu.make_async_copy(
            row.at[jax.lax.rem(k1, jnp.int32(2))], st_ref.at[k1],
            sem.at[jax.lax.rem(k1, jnp.int32(2))],
        ).wait()

    @pl.when(K >= 2)
    def _():
        k2 = K - jnp.int32(2)
        pltpu.make_async_copy(
            row.at[jax.lax.rem(k2, jnp.int32(2))], st_ref.at[k2],
            sem.at[jax.lax.rem(k2, jnp.int32(2))],
        ).wait()


def _ek1_adaptive_smoother_kernel(
    m0_ref, it_ref, st_ref, us_ref, std_ref,
    row, sem, *,
    At: np.ndarray, QLt: np.ndarray, S: int, d: int, nq: int, Wp: int,
    cheb=None,
):
    """Backward square-root RTS pass over the dense-EK1 attempt stream.

    Walks rows K-1..0; per row, lanes with accept=1 smooth one chain step
    (per-lane preconditioning at the carried next-step log-dt; the
    streamed committed FACTOR is used directly — no re-factorization of a
    plain covariance anywhere, so the rank-d R=0 collapse of the dense
    update needs no special handling) and lanes with is_save=1 write the
    just-smoothed state into save-grid row ``seg+1``. Measurement-
    agnostic: second-order forward streams feed the identical pass."""
    D = d * nq
    Af = np.kron(At, np.eye(d))
    QLf = np.kron(QLt, np.eye(d))
    q_half = nq - 1 + 0.5

    def _is0f(x):
        return isinstance(x, float) and x == 0.0

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        m = [row[slot, r, D] for r in range(D)]
        L = [[row[slot, r, c] for c in range(D)] for r in range(D)]
        ex = [row[slot, D, c] for c in range(6)]
        return m, L, ex

    K = jnp.max(it_ref[0]).astype(jnp.int32)

    zero = jnp.zeros_like(m0_ref[0, 0])
    for j in range(d):
        us_ref[jnp.int32(0), j] = m0_ref[0, j]
        std_ref[jnp.int32(0), j] = zero

    def write_saves(ex, ms, Ls):
        is_save, seg1f = ex[4], ex[5]

        @pl.when(jnp.max(is_save) > 0.5)
        def _():
            seg1 = jnp.max(seg1f).astype(jnp.int32)
            wm = is_save > 0.5
            for j in range(d):
                us_ref[seg1, j] = jnp.where(wm, ms[j], us_ref[seg1, j])
                sv = jnp.sqrt(
                    _sreduce([Ls[j][c] * Ls[j][c] for c in range(D)])
                )
                std_ref[seg1, j] = jnp.where(wm, sv, std_ref[seg1, j])

    # --- init from the final attempt row: every lane is parked at t1, so
    # its committed (m, L) IS the final filter state — smoothed = filtered
    # there, and the streamed factor is already valid as-is. ---
    kK = K - jnp.int32(1)
    start_load(kK)
    m_T, L_T, ex_T = wait_and_read(kK)

    @pl.when(K >= 2)
    def _():
        start_load(kK - jnp.int32(1))

    ms0 = m_T
    Ls0 = L_T
    pend_lh = ex_T[1]
    pend_s2 = ex_T[2]
    first = (zero + 1.0) - ex_T[0]
    write_saves(ex_T, ms0, Ls0)

    if cheb is None:
        Af_st = [[float(Af[r, c]) for c in range(D)] for r in range(D)]
        QLf_st = [[float(QLf[r, c]) for c in range(D)] for r in range(D)]

    def body(step, carry):
        ms, Ls, pend_lh, pend_s2, first = carry
        k = K - jnp.int32(2) - step
        m_f, L_f, ex = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.int32(1))

        lh = pend_lh
        if cheb is None:
            Afl, QLfl = Af_st, QLf_st
        else:
            Atl, QLtl, _ = _cheb_transition_lists(cheb, lh, nq)
            Afl = [[Atl[r // d][c // d] if (r % d) == (c % d) else 0.0
                    for c in range(D)] for r in range(D)]
            QLfl = [[QLtl[r // d][c // d] if (r % d) == (c % d) else 0.0
                     for c in range(D)] for r in range(D)]
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        pinv_ = [jnp.exp((q_half - i) * lh) for i in range(nq)]
        # row-only factor preconditioning (P L), as in the forward
        mh_f = [m_f[r] * ps_[r // d] for r in range(D)]
        Lh_f = [[_smul(ps_[r // d], L_f[r][c]) for c in range(D)]
                for r in range(D)]
        msh = [ms[r] * ps_[r // d] for r in range(D)]
        Lsh = [[_smul(ps_[r // d], Ls[r][c]) for c in range(D)]
               for r in range(D)]
        sq_s2 = jnp.sqrt(jnp.maximum(pend_s2, 0.0))

        AL = [
            [
                _sreduce([_smul(Afl[r][c], Lh_f[c][b]) for c in range(D)])
                for b in range(D)
            ]
            for r in range(D)
        ]
        qT = [
            [0.0 if _is0f(QLfl[r][c]) else _smul(sq_s2, QLfl[r][c])
             for r in range(D)]
            for c in range(D)
        ]
        # predicted factor of this lane's interval k -> next accepted:
        # the identical preconditioned 2D x D MGS the forward ran
        Lp = _list_mgs_tril(_t_rows(AL, D) + qT, 2 * D, D)

        # G = C_f A^T Cp^-1 with C_f A^T = Lh_f (A Lh_f)^T
        M = [
            [
                _sreduce([_smul(Lh_f[r][b], AL[l][b]) for b in range(D)])
                for l in range(D)
            ]
            for r in range(D)
        ]
        G = [_list_cho_solve(Lp, [(zero + x) if _is0(x) else x
                                  for x in M[r]], D)
             for r in range(D)]
        mp = [
            _sreduce([_smul(Afl[r][c], mh_f[c]) for c in range(D)])
            for r in range(D)
        ]
        dm = [msh[r] - mp[r] for r in range(D)]
        ms_new = [
            mh_f[r] + _sreduce([_smul(G[r][l], dm[l]) for l in range(D)])
            for r in range(D)
        ]
        GA = [
            [
                _sreduce([_smul(G[r][a], Afl[a][l]) for a in range(D)])
                for l in range(D)
            ]
            for r in range(D)
        ]
        IGA = [
            [(1.0 - GA[r][l]) if r == l else
             (0.0 - GA[r][l] if not _is0(GA[r][l]) else 0.0)
             for l in range(D)]
            for r in range(D)
        ]
        b1 = [
            [
                _sreduce([_smul(IGA[r][a], Lh_f[a][l]) for a in range(D)])
                for l in range(D)
            ]
            for r in range(D)
        ]
        GQ = [
            [
                _smul(sq_s2,
                      _sreduce([_smul(G[r][a], QLfl[a][l])
                                for a in range(D)]))
                for l in range(D)
            ]
            for r in range(D)
        ]
        b3 = [
            [
                _sreduce([_smul(G[r][a], Lsh[a][l]) for a in range(D)])
                for l in range(D)
            ]
            for r in range(D)
        ]
        Ls_new = _list_mgs_tril(
            _t_rows(b1, D) + _t_rows(GQ, D) + _t_rows(b3, D), 3 * D, D
        )
        # unprecondition (row scaling) and masked commits
        do = (ex[0] * ((zero + 1.0) - first)) > 0.5
        ms = [
            jnp.where(do, pinv_[r // d] * ms_new[r], ms[r])
            for r in range(D)
        ]
        Ls = [
            [jnp.where(do, pinv_[r // d] * Ls_new[r][c], Ls[r][c])
             for c in range(D)]
            for r in range(D)
        ]
        took = ex[0] > 0.5
        pend_lh = jnp.where(took, ex[1], pend_lh)
        pend_s2 = jnp.where(took, ex[2], pend_s2)
        first = jnp.where(took, zero, first)
        write_saves(ex, ms, Ls)
        return ms, Ls, pend_lh, pend_s2, first

    jax.lax.fori_loop(
        jnp.int32(0), K - jnp.int32(1), body,
        (ms0, Ls0, pend_lh, pend_s2, first),
    )


@_no_x64
def ek1_adaptive_fused_smooth(
    f: Callable,
    jac: Optional[Callable],
    m0: jax.Array,      # (q+1, d, B)
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,)
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 512,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Adaptive per-lane dense EK1(dynamic) filter + square-root RTS
    smoother, fully fused — the reference's DEFAULT configuration
    (`algorithms.jl:46-51` EK1 smooth=true + `integrator_utils.jl:20-26`)
    at ensemble-kernel throughput, completing the adaptive+smooth kernel
    matrix (EK0 / DiagonalEK1 / dense EK1). Returns
    ``(us, stds, lls, nacc, nrej, failed)`` with PER-DIMENSION smoothed
    stds (S+1, d, B). ``max_iters`` bounds total attempts per member AND
    sizes the HBM attempt stream ((D+1) x max(D+1, 6) x 4 KiB per attempt
    per 1024-member block — wider than the EK0 pair's by ~D, hence the
    smaller default)."""
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if jac is None:
        jac = _auto_jac_2nd(f) if second_order else _auto_jac(f)
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_: ek1_adaptive_fused_smooth(
                f, jac, m0_, ps_, dt0_, t0, t1, n_save, q, abstol=abstol,
                reltol=reltol, max_iters=max_iters, dtmin=dtmin,
                prior=prior, second_order=second_order,
            ),
            (m0, ps, dt0s), in_axes=(2, 1, 0),
            out_axes=(2, 2, 0, 0, 0, 0),
        )
    nq = q + 1
    _, d, B = m0.shape
    D = d * nq
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)

    Wp = max(D + 1, 6)
    fkernel = functools.partial(
        _ek1_adaptive_stream_kernel,
        f=f, jac=jac, At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq, Wp=Wp,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order),
    )
    scratch = [
        pltpu.VMEM((2, D + 1, Wp, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def fentry(m0_blk, p_blk, dt0_blk, ll_blk, na_blk, nr_blk, fl_blk,
               it_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
            it_blk.at[jnp.int32(0)], st_hbm.at[b], row, sem,
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    lane_shape = jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype)
    lls, nacc, nrej, fail, iters, st = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[lane(), lane(), lane(), lane(), lane(),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            lane_shape, lane_shape, lane_shape, lane_shape, lane_shape,
            jax.ShapeDtypeStruct(
                (nb, int(max_iters), D + 1, Wp, _SUB, _LANE), dtype
            ),
        ],
        scratch_shapes=scratch,
    )(m0_b, ps_b, dt0_b)

    skernel = functools.partial(
        _ek1_adaptive_smoother_kernel,
        At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        S=S, d=d, nq=nq, Wp=Wp, cheb=cheb,
    )

    def sentry(m0_blk, it_blk, st_hbm, us_blk, std_blk, row, sem):
        b = pl.program_id(0)
        skernel(
            m0_blk.at[jnp.int32(0)], it_blk.at[jnp.int32(0)], st_hbm.at[b],
            us_blk.at[jnp.int32(0)], std_blk.at[jnp.int32(0)], row, sem,
        )

    us_s, std_s = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S + 1, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
            jax.ShapeDtypeStruct((nb, S + 1, d, _SUB, _LANE), dtype),
        ],
        scratch_shapes=scratch,
    )(m0_b, iters, st)

    us = us_s.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    stds = std_s.transpose(1, 2, 0, 3, 4).reshape(S + 1, d, B)
    return (us, stds, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def solve_ensemble_ek1_adaptive_smooth_pallas(
    prob_f: Callable,
    prob_jac: Optional[Callable],
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    q: int = 3,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 512,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Taylor-init + fused adaptive dense-EK1 filter + RTS smoother
    ensemble — the reference's DEFAULT solve (EK1, adaptive, smooth) at
    fused-kernel speed. Same argument conventions as
    :func:`solve_ensemble_ek1_adaptive_pallas`; returns SMOOTHED
    ``(us, stds, lls, nacc, nrej, failed)`` with per-dimension stds."""
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(prob_f, u0_full[:d], u0_full[d:], tspan, p=p)
        else:
            m = jnp.stack(taylor_coefficients(prob_f, u0_full, p, t0, q))
            pr = ode_problem(prob_f, u0_full, tspan, p=p)
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    return ek1_adaptive_fused_smooth(
        prob_f, prob_jac, m0, ps.T, dt0s, float(t0), float(t1), n_save, q,
        abstol=abstol, reltol=reltol, max_iters=max_iters, prior=prior,
        mesh=mesh, second_order=second_order,
    )


# ==========================================================================
# Adaptive-solution joint-posterior sampling (per-lane dt).
#
# Round-3 VERDICT Missing #4: the fused samplers covered fixed grids only,
# while the XLA `sample` operates on any solution including the adaptive
# solver grid (`solution_sampling.jl:24-62`). This pairs the adaptive
# EK0 attempt-stream forward (`_ek0_adaptive_stream_kernel`) with a
# backward conditioning SAMPLER: the `_ek0_adaptive_smoother_kernel` walk
# (per-lane masking over the ragged accepted-step chains, per-lane
# per-interval preconditioning, structural-zero Cholesky of the streamed
# plain covariance) with the carried smoothed state replaced by S carried
# samples — condition on the drawn next value (zero-covariance target, so
# the smoothing stack loses its G L_s block) and re-draw from the
# conditional factor using normals streamed per attempt row. Zero normals
# reduce the recursion to exactly the smoothed-mean recursion (tested
# bit-for-bit against the fused smoother pair).
# ==========================================================================


def _ek0_adaptive_sampler_kernel(
    m0_ref, it_ref, st_ref, z_ref, us_ref,
    row, sem, zrow, zsem, *,
    At: np.ndarray, QLt: np.ndarray, S: int, d: int, nq: int, Wp: int,
    Ssmp: int, cheb=None, so: bool = False,
):
    """Backward conditioning sampler over the adaptive attempt stream.

    Walks rows K-1..0; per row, lanes with accept=1 condition their S
    carried samples one chain step back and re-draw; lanes with is_save=1
    write the (just-updated) solution-block samples into save-grid row
    ``seg+1``. ``z_ref``: (max_iters, Ssmp, nq, d) standard-normal rows
    (only accepted rows' normals are consumed)."""
    q_half = nq - 1 + 0.5

    def start_load(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).start()
        pltpu.make_async_copy(z_ref.at[k], zrow.at[slot], zsem.at[slot]).start()

    def wait_and_read(k):
        slot = jax.lax.rem(k, jnp.int32(2))
        pltpu.make_async_copy(st_ref.at[k], row.at[slot], sem.at[slot]).wait()
        pltpu.make_async_copy(z_ref.at[k], zrow.at[slot], zsem.at[slot]).wait()
        m = [[row[slot, i, j] for j in range(d)] for i in range(nq)]
        C = [[row[slot, i, d + l] for l in range(nq)] for i in range(nq)]
        ex = [row[slot, nq, c] for c in range(6)]
        z = [
            [[zrow[slot, s, i, j] for j in range(d)] for i in range(nq)]
            for s in range(Ssmp)
        ]
        return m, C, ex, z

    K = jnp.max(it_ref[0]).astype(jnp.int32)

    zero = jnp.zeros_like(m0_ref[0, 0])
    for s in range(Ssmp):
        for j in range(d):
            # exact zero-covariance init: every sample equals the mean
            us_ref[jnp.int32(0), s, j] = m0_ref[0, j]

    bx = 2 if so else 1

    def precond_factor(C_f, lh):
        ps_ = [jnp.exp((i - q_half) * lh) for i in range(nq)]
        Ch = [[C_f[i][l] * (ps_[i] * ps_[l]) for l in range(nq)]
              for i in range(nq)]
        return ps_, _list_cholesky(Ch, nq, zero_row=bx)

    def write_saves(ex, xs):
        is_save, seg1f = ex[4], ex[5]

        @pl.when(jnp.max(is_save) > 0.5)
        def _():
            seg1 = jnp.max(seg1f).astype(jnp.int32)
            wm = is_save > 0.5
            for s in range(Ssmp):
                for j in range(d):
                    us_ref[seg1, s, j] = jnp.where(
                        wm, xs[s][0][j], us_ref[seg1, s, j]
                    )

    # --- init from the final attempt row: every lane's committed state
    # IS its final filter state; draw the terminal sample there with the
    # plain covariance factored at the lane's own current log-dt ---
    kK = K - jnp.int32(1)
    start_load(kK)
    m_T, C_T, ex_T, z_T = wait_and_read(kK)

    @pl.when(K >= 2)
    def _():
        start_load(kK - jnp.int32(1))

    lh0 = ex_T[3]
    ps0, Lh0 = precond_factor(C_T, lh0)
    pinv0_ = [jnp.exp((q_half - i) * lh0) for i in range(nq)]
    xs0 = [
        [
            [
                m_T[i][j] + pinv0_[i] * _sreduce(
                    [_smul(Lh0[i][l], z_T[s][l][j]) for l in range(nq)]
                )
                for j in range(d)
            ]
            for i in range(nq)
        ]
        for s in range(Ssmp)
    ]
    pend_lh = ex_T[1]
    pend_s2 = ex_T[2]
    first = (zero + 1.0) - ex_T[0]
    write_saves(ex_T, xs0)

    if cheb is None:
        At_st = [[float(At[i, l]) for l in range(nq)] for i in range(nq)]
        QL_st = [[float(QLt[i, l]) for l in range(nq)] for i in range(nq)]

    def body(step, carry):
        xs, pend_lh, pend_s2, first = carry
        k = K - jnp.int32(2) - step
        m_f, C_f, ex, z = wait_and_read(k)

        @pl.when(k >= 1)
        def _():
            start_load(k - jnp.int32(1))

        lh = pend_lh
        if cheb is None:
            Atl, QLl = At_st, QL_st
        else:
            Atl, QLl, _ = _cheb_transition_lists(cheb, lh, nq)
        ps_, Lh_f = precond_factor(C_f, lh)
        pinv_ = [jnp.exp((q_half - i) * lh) for i in range(nq)]
        mh_f = [[m_f[i][j] * ps_[i] for j in range(d)] for i in range(nq)]
        sq_s2 = jnp.sqrt(pend_s2)

        AtL = [
            [
                _sreduce([_smul(Atl[i][a], Lh_f[a][b]) for a in range(nq)])
                for b in range(nq)
            ]
            for i in range(nq)
        ]
        qT = [
            [_smul(sq_s2, QLl[i][a]) for i in range(nq)]
            for a in range(nq)
        ]
        Lp = _list_mgs_tril(_t_rows(AtL, nq) + qT, 2 * nq, nq)
        M = [
            [
                _sreduce([_smul(Lh_f[i][b], AtL[l][b]) for b in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        G = [_list_cho_solve(Lp, [(zero + x) if _is0(x) else x
                                  for x in M[i]], nq)
             for i in range(nq)]
        mp = [
            [
                _sreduce([_smul(Atl[i][l], mh_f[l][j]) for l in range(nq)])
                for j in range(d)
            ]
            for i in range(nq)
        ]
        # conditional factor: the smoothing stack minus its G L_s block
        # (the conditioning target has zero covariance); shared by all S
        GA = [
            [
                _sreduce([_smul(G[i][a], Atl[a][l]) for a in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        IGA = [
            [(1.0 - GA[i][l]) if i == l else
             (0.0 - GA[i][l] if not _is0(GA[i][l]) else 0.0)
             for l in range(nq)]
            for i in range(nq)
        ]
        b1 = [
            [
                _sreduce([_smul(IGA[i][a], Lh_f[a][l]) for a in range(nq)])
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        GQ = [
            [
                _smul(sq_s2,
                      _sreduce([_smul(G[i][a], QLl[a][l])
                                for a in range(nq)]))
                for l in range(nq)
            ]
            for i in range(nq)
        ]
        L_c = _list_mgs_tril(_t_rows(b1, nq) + _t_rows(GQ, nq), 2 * nq, nq)

        do = (ex[0] * ((zero + 1.0) - first)) > 0.5
        xs_out = []
        for s in range(Ssmp):
            xsh = [[xs[s][i][j] * ps_[i] for j in range(d)]
                   for i in range(nq)]
            dm = [[xsh[i][j] - mp[i][j] for j in range(d)]
                  for i in range(nq)]
            xs_out.append([
                [
                    jnp.where(
                        do,
                        pinv_[i] * (
                            mh_f[i][j]
                            + _sreduce([_smul(G[i][l], dm[l][j])
                                        for l in range(nq)])
                            + _sreduce([_smul(L_c[i][l], z[s][l][j])
                                        for l in range(i + 1)])
                        ),
                        xs[s][i][j],
                    )
                    for j in range(d)
                ]
                for i in range(nq)
            ])
        took = ex[0] > 0.5
        pend_lh = jnp.where(took, ex[1], pend_lh)
        pend_s2 = jnp.where(took, ex[2], pend_s2)
        first = jnp.where(took, zero, first)
        write_saves(ex, xs_out)
        return xs_out, pend_lh, pend_s2, first

    jax.lax.fori_loop(
        jnp.int32(0), K - jnp.int32(1), body,
        (xs0, pend_lh, pend_s2, first),
    )


@_no_x64
def ek0_adaptive_fused_sample(
    f: Callable,
    m0: jax.Array,      # (q+1, d, B) unpreconditioned Taylor init means
    ps: jax.Array,      # (n_params, B)
    dt0s: jax.Array,    # (B,)
    normals: jax.Array,  # (max_iters, Ssmp, q+1, d, B) standard normals
    t0: float,
    t1: float,
    n_save: int,
    q: int,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    dtmin: Optional[float] = None,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Joint smoothing-posterior sample paths of ADAPTIVE solves.

    The adaptive EK0 attempt-stream forward + a backward conditioning
    sampler over each lane's ragged accepted-step chain. Returns
    ``(us, lls, nacc, nrej, failed)`` with ``us`` of shape
    (n_save+1, Ssmp, d, B) — Ssmp joint draws per member on the save
    grid, conditioned through EVERY accepted step (the fused analogue of
    `odefilters.sample` on an adaptive solution,
    `solution_sampling.jl:24-62`). ``normals`` must be i.i.d. standard
    normals indexed by ATTEMPT row (only accepted rows consume theirs);
    zero normals reproduce the fused smoother pair's means bit-for-bit
    (tested)."""
    if second_order and q < 2:
        raise ValueError("second_order needs q >= 2 (measures block 2)")
    if mesh is not None:
        return _shard_over_ens(
            mesh,
            lambda m0_, ps_, dt0_, z_: ek0_adaptive_fused_sample(
                f, m0_, ps_, dt0_, z_, t0, t1, n_save, q, abstol=abstol,
                reltol=reltol, max_iters=max_iters, dtmin=dtmin,
                prior=prior, second_order=second_order,
            ),
            (m0, ps, dt0s, normals), in_axes=(2, 1, 0, 4),
            out_axes=(3, 0, 0, 0, 0),
        )
    nq = q + 1
    _, d, B = m0.shape
    if B % BLOCK:
        raise ValueError(f"ensemble size must be a multiple of {BLOCK}, got {B}")
    nb = B // BLOCK
    S = int(n_save)
    Ssmp = int(normals.shape[1])
    if normals.shape != (int(max_iters), Ssmp, nq, d, B):
        raise ValueError(
            f"normals must have shape {(int(max_iters), 'S', nq, d, B)}, "
            f"got {normals.shape}"
        )
    dt_save = (float(t1) - float(t0)) / S
    if dtmin is None:
        span = float(t1) - float(t0)
        eps = float(jnp.finfo(m0.dtype).eps)
        dtmin = max(1e-14 * span, 4.0 * eps * span)

    At_np, _, QLt_np = _ibm_small_np(q)
    Qt_np = QLt_np @ QLt_np.T
    dtype = m0.dtype
    fdtype = np.float32 if dtype == jnp.float32 else np.float64

    cheb = None
    if prior is not None:
        from odefilters.priors import (
            IWP, chebyshev_transition_fit, normalize_prior,
        )

        if not isinstance(normalize_prior(prior), IWP):
            cheb = chebyshev_transition_fit(
                prior, q, float(dtmin), float(t1) - float(t0)
            )

    m0_b = m0.reshape(nq, d, nb, _SUB, _LANE).transpose(2, 0, 1, 3, 4)
    ps_b = ps.reshape(ps.shape[0], nb, _SUB, _LANE).transpose(1, 0, 2, 3)
    dt0_b = dt0s.reshape(nb, 1, _SUB, _LANE)
    z_b = normals.astype(dtype).reshape(
        int(max_iters), Ssmp, nq, d, nb, _SUB, _LANE
    ).transpose(4, 0, 1, 2, 3, 5, 6)

    Wp = max(d + nq, 6)
    fkernel = functools.partial(
        _ek0_adaptive_stream_kernel,
        f=f, At=At_np.astype(fdtype), Qt=Qt_np.astype(fdtype),
        S=S, dt_save=dt_save, t0=float(t0), d=d, nq=nq, Wp=Wp,
        abstol=float(abstol), reltol=float(reltol),
        max_iters=int(max_iters), dtmin=float(dtmin),
        beta1=7.0 / (10.0 * nq), beta2=2.0 / (5.0 * nq), cheb=cheb,
        so=bool(second_order),
    )
    scratch = [
        pltpu.VMEM((2, nq + 1, Wp, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def fentry(m0_blk, p_blk, dt0_blk, ll_blk, na_blk, nr_blk, fl_blk,
               it_blk, st_hbm, row, sem):
        b = pl.program_id(0)
        fkernel(
            m0_blk.at[jnp.int32(0)], p_blk.at[jnp.int32(0)],
            dt0_blk.at[jnp.int32(0)],
            ll_blk.at[jnp.int32(0)], na_blk.at[jnp.int32(0)],
            nr_blk.at[jnp.int32(0)], fl_blk.at[jnp.int32(0)],
            it_blk.at[jnp.int32(0)], st_hbm.at[b], row, sem,
        )

    lane = lambda: pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    lane_shape = jax.ShapeDtypeStruct((nb, _SUB, _LANE), dtype)
    lls, nacc, nrej, fail, iters, st = pl.pallas_call(
        fentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps_b.shape[1], _SUB, _LANE),
                         lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _SUB, _LANE), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[lane(), lane(), lane(), lane(), lane(),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[
            lane_shape, lane_shape, lane_shape, lane_shape, lane_shape,
            jax.ShapeDtypeStruct(
                (nb, int(max_iters), nq + 1, Wp, _SUB, _LANE), dtype
            ),
        ],
        scratch_shapes=scratch,
    )(m0_b, ps_b, dt0_b)

    skernel = functools.partial(
        _ek0_adaptive_sampler_kernel,
        At=At_np.astype(fdtype), QLt=QLt_np.astype(fdtype),
        S=S, d=d, nq=nq, Wp=Wp, Ssmp=Ssmp, cheb=cheb, so=bool(second_order),
    )
    sscratch = scratch + [
        pltpu.VMEM((2, Ssmp, nq, d, _SUB, _LANE), dtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]

    def sentry(m0_blk, it_blk, st_hbm, z_hbm, us_blk, row, sem, zrow, zsem):
        b = pl.program_id(0)
        skernel(
            m0_blk.at[jnp.int32(0)], it_blk.at[jnp.int32(0)], st_hbm.at[b],
            z_hbm.at[b], us_blk.at[jnp.int32(0)], row, sem, zrow, zsem,
        )

    us_s, = pl.pallas_call(
        sentry,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, nq, d, _SUB, _LANE), lambda b: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, _LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, S + 1, Ssmp, d, _SUB, _LANE),
                         lambda b: (b, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, S + 1, Ssmp, d, _SUB, _LANE), dtype),
        ],
        scratch_shapes=sscratch,
    )(m0_b, iters, st, z_b)

    us = us_s.transpose(1, 2, 3, 0, 4, 5).reshape(S + 1, Ssmp, d, B)
    return (us, lls.reshape(B), nacc.reshape(B), nrej.reshape(B),
            fail.reshape(B))


def sample_ensemble_adaptive_pallas(
    prob_f: Callable,
    u0s: jax.Array,
    ps: jax.Array,
    tspan,
    n_save: int,
    key,
    q: int = 3,
    n_samples: int = 1,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_iters: int = 1024,
    prior=None,
    mesh=None,
    second_order: bool = False,
):
    """Taylor-init + adaptive attempt-stream forward + backward
    conditioning sampler: joint posterior sample paths of ADAPTIVE
    solves at ensemble-kernel speed (the fused analogue of
    `odefilters.sample` on an adaptive solution). Returns
    ``(us, lls, nacc, nrej, failed)`` with ``us`` of shape
    (n_save+1, d, B) for ``n_samples=1``, else (n_save+1, n_samples,
    d, B)."""
    from odefilters.problem import ode_problem, ode_problem_2nd
    from odefilters.solve import initial_dt
    from odefilters.taylor import taylor_coefficients, taylor_coefficients_2nd

    t0, t1 = tspan
    B, d_in = u0s.shape
    if second_order and d_in % 2:
        raise ValueError(
            f"second_order expects u0s = [u0 | du0] with even width, got {d_in}"
        )
    d = d_in // 2 if second_order else d_in

    def init_one(u0_full, p):
        if second_order:
            m = jnp.stack(taylor_coefficients_2nd(
                prob_f, u0_full[:d], u0_full[d:], p, t0, q
            ))
            pr = ode_problem_2nd(prob_f, u0_full[:d], u0_full[d:], tspan, p=p)
        else:
            m = jnp.stack(taylor_coefficients(prob_f, u0_full, p, t0, q))
            pr = ode_problem(prob_f, u0_full, tspan, p=p)
        return m, initial_dt(pr, q, abstol, reltol)

    m0, dt0s = jax.vmap(init_one)(u0s, ps)
    m0 = m0.transpose(1, 2, 0)
    normals = jax.random.normal(
        key, (int(max_iters), int(n_samples), q + 1, d, B), m0.dtype
    )
    out = ek0_adaptive_fused_sample(
        prob_f, m0, ps.T, dt0s, normals, float(t0), float(t1), n_save, q,
        abstol=abstol, reltol=reltol, max_iters=max_iters, prior=prior,
        mesh=mesh, second_order=second_order,
    )
    us = out[0]
    if int(n_samples) == 1:
        us = us[:, 0]
    return (us,) + out[1:]
