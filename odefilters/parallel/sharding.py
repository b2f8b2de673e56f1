"""Ensemble parallelism: vmap over problems, shard over a TPU device mesh.

This is the framework's "distributed communication backend" (the reference
has none — SURVEY.md §2): per-trajectory solves are embarrassingly
parallel, so the ensemble axis is sharded across chips with
``jax.sharding`` and the hot loop needs **zero** collectives; XLA inserts
the only communication (result gathering) at the output.

The small per-solve matrices (D x D with D = d(q+1)) batch across the
ensemble axis into large batched GEMM/QR that saturate the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from odefilters.algorithms import AbstractEK
from odefilters.problem import ODEProblem, remake
from odefilters.solution import ProbODESolution

ENS_AXIS = "ens"


def ensemble_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D device mesh over the ensemble axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    # AxisType.Auto keeps classic GSPMD propagation; jax.make_mesh defaults
    # to Explicit axes (sharding-in-types), which forces every
    # scalar-broadcast op in the solver to name its sharding.
    import numpy as _np

    return Mesh(_np.asarray(devices), (ENS_AXIS,), axis_types=(AxisType.Auto,))


from functools import partial


@partial(jax.jit, static_argnames=("alg", "n_steps"))
def _solve_ensemble_jit(prob, alg, u0s, ps, ts, abstol, reltol, n_steps):
    # Uses the un-jitted impl: nesting jit under a sharded outer jit
    # confuses axis-name resolution. Module-level jit so repeated calls
    # with the same (alg, shapes) hit the compilation cache.
    from odefilters.fixedgrid import _solve_fixed_impl

    def one(u0, p):
        return _solve_fixed_impl(
            remake(prob, u0=u0, p=p), alg, ts, abstol, reltol,
            n_steps, "auto", True,
        )

    return jax.vmap(one)(u0s, ps)


@partial(jax.jit, static_argnames=("alg", "max_steps"))
def _solve_ensemble_adaptive_jit(prob, alg, u0s, ps, abstol, reltol, max_steps):
    from odefilters.solve import _solve_adaptive_impl, initial_dt

    def one(u0, p):
        pr = remake(prob, u0=u0, p=p)
        dt0 = initial_dt(pr, alg.order, abstol, reltol)
        t0, t1 = pr.tspan
        return _solve_adaptive_impl(
            pr, alg, abstol, reltol, dt0, max_steps, 100_000,
            1e-14 * (t1 - t0), True, "auto", None,
        )

    return jax.vmap(one)(u0s, ps)


def solve_ensemble(
    prob: ODEProblem,
    alg: AbstractEK,
    u0s: jax.Array,
    ps: jax.Array,
    *,
    ts: jax.Array,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    mesh: Optional[Mesh] = None,
) -> ProbODESolution:
    """Solve a batch of IVPs ``(u0s[i], ps[i])`` on a fixed grid ``ts``.

    Returns a *batched* :class:`ProbODESolution` (leading ensemble axis on
    every array field). With ``mesh``, inputs/outputs are sharded over the
    ``"ens"`` axis and each chip solves its shard independently.
    """
    n_steps = ts.shape[0] - 1
    if mesh is not None:
        # Committed sharded inputs drive GSPMD partitioning; explicit
        # in_shardings would also constrain trace-time sharding
        # propagation, which chokes on scalar-broadcast ops in the solver.
        sh = NamedSharding(mesh, P(ENS_AXIS))
        u0s = jax.device_put(u0s, sh)
        ps = jax.device_put(ps, sh)
    return _solve_ensemble_jit(prob, alg, u0s, ps, ts, abstol, reltol, n_steps)


def solve_ensemble_adaptive(
    prob: ODEProblem,
    alg: AbstractEK,
    u0s: jax.Array,
    ps: jax.Array,
    *,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    max_steps: int = 1024,
    mesh: Optional[Mesh] = None,
) -> ProbODESolution:
    """Adaptive-step ensemble: vmapped while_loop (members that finish
    early mask out; the batch runs until the slowest member lands)."""
    if mesh is not None:
        sh = NamedSharding(mesh, P(ENS_AXIS))
        u0s = jax.device_put(u0s, sh)
        ps = jax.device_put(ps, sh)
    return _solve_ensemble_adaptive_jit(
        prob, alg, u0s, ps, abstol, reltol, int(max_steps)
    )
