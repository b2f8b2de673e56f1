"""Incremental integrator API: ``init`` / ``step`` / ``solve_fin``.

Equivalent of OrdinaryDiffEq's ``init(prob, alg)`` + ``step!(integ)`` as
used by the reference's animation example
(`/root/reference/examples/fitzhughnagumo_animation.jl:23-46`) and tests
(`/root/reference/test/priors.jl:64-74`). The handle is a thin host-side
object over the same jitted loop body as :func:`odefilters.solve.solve`;
``integ.sol`` is usable mid-integration (partial solves can be plotted).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from odefilters.algorithms import AbstractEK
from odefilters.linalg import Gaussian
from odefilters.problem import ODEProblem
from odefilters.solution import (
    RETCODE_MAXITERS,
    RETCODE_SUCCESS,
    RETCODE_UNSTABLE,
    ProbODESolution,
)
from odefilters.solve import (
    _init_carry,
    _make_loop_fns,
    _postprocess,
    initial_dt,
)
from odefilters.step import make_model
from odefilters.taylor import initial_state


@partial(jax.jit, static_argnames=("alg", "max_steps", "maxiters", "abstol", "reltol", "dtmin"))
def _advance_one_accept(prob, alg, carry, abstol, reltol, max_steps, maxiters, dtmin):
    """Run loop-body attempts until exactly one step is accepted."""
    dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
    model = make_model(alg, prob.f, prob.jac, prob.d, dtype,
                       second_order=prob.second_order,
                       jac_diag=prob.jac_diag, mass=prob.mass_matrix)
    cond, body = _make_loop_fns(
        model, prob, abstol, reltol, max_steps, maxiters, dtmin
    )
    n_entry = carry.n

    def cond_step(c):
        return cond(c) & (c.n == n_entry)

    return jax.lax.while_loop(cond_step, body, carry)


class Integrator:
    """A steppable solver handle. Create with :func:`init`."""

    def __init__(self, prob: ODEProblem, alg: AbstractEK, abstol, reltol,
                 max_steps: int, maxiters: int, dtmin, dt0):
        self.prob = prob
        self.alg = alg
        self._opts = (float(abstol), float(reltol), int(max_steps),
                      int(maxiters), float(dtmin))
        dtype = jnp.result_type(prob.u0.dtype, jnp.float32)
        self._model = make_model(
            alg, prob.f, prob.jac, prob.d, dtype,
            second_order=prob.second_order,
            jac_diag=prob.jac_diag, mass=prob.mass_matrix,
        )
        if prob.second_order:
            from odefilters.taylor import initial_state_2nd

            u0f = prob.u0.astype(dtype)
            x0 = initial_state_2nd(
                prob.f, u0f[: prob.d], u0f[prob.d :], prob.p,
                prob.tspan[0], alg.order,
            )
        else:
            from odefilters.problem import init_rhs

            x0 = initial_state(
                init_rhs(prob), prob.u0.astype(dtype), prob.p,
                prob.tspan[0], alg.order,
                method="jvp" if prob.mass_matrix is not None else "auto",
            )
        self._carry = _init_carry(self._model, prob, x0, dt0, int(max_steps))

    # -- inspection --
    @property
    def t(self) -> float:
        return float(self._carry.t)

    @property
    def dt(self) -> float:
        return float(self._carry.dt)

    @property
    def u(self):
        return self._carry.u

    @property
    def x(self) -> Gaussian:
        return self._carry.x

    @property
    def n_steps(self) -> int:
        return int(self._carry.n)

    @property
    def done(self) -> bool:
        c = self._carry
        return bool(
            (c.t >= self.prob.tspan[1]) | c.failed
        ) or int(c.n) >= self._opts[2]

    # -- advancing --
    def step(self) -> "Integrator":
        """Advance by exactly one *accepted* step (like ``step!(integ)``,
        possibly several attempts)."""
        abstol, reltol, max_steps, maxiters, dtmin = self._opts
        self._carry = _advance_one_accept(
            self.prob, self.alg, self._carry, abstol, reltol,
            max_steps, maxiters, dtmin,
        )
        return self

    def solve_fin(self) -> ProbODESolution:
        """Run to completion from the current state and post-process
        (smoothing etc.), like ``solve!(integ)``."""
        while not self.done:
            self.step()
        return self.sol

    # -- partial solution --
    @property
    def sol(self) -> ProbODESolution:
        """Solution over the steps taken so far (no smoothing applied until
        the solve is finished, mirroring the postamble semantics)."""
        c = self._carry
        t1 = self.prob.tspan[1]
        retcode = jnp.where(
            c.t >= t1, RETCODE_SUCCESS,
            jnp.where(c.failed, RETCODE_UNSTABLE, RETCODE_MAXITERS),
        ).astype(jnp.int32)
        if self.done:
            return _postprocess(
                self._model, self.prob, c.ts_buf,
                Gaussian(c.m_buf, c.L_buf), c.diff_buf, c.n, c.ll, c.sigma2,
                c.stats, retcode,
            )
        # Mid-integration view: raw filter states, no recalibration.
        x_filt = Gaussian(c.m_buf, c.L_buf)
        d = self._model.sol_d
        import dataclasses as _dc

        return ProbODESolution(
            ts=c.ts_buf, n_steps=c.n,
            u=c.u_buf,
            pu=Gaussian(c.m_buf[:, :d], c.L_buf[:, :d, :]),
            x_filt=x_filt, x_smooth=x_filt,
            diffusions=c.diff_buf, log_likelihood=c.ll, stats=c.stats,
            retcode=retcode, prob=self.prob,
            alg=_dc.replace(self.alg, smooth=False),
        )


def init(
    prob: ODEProblem,
    alg: AbstractEK,
    *,
    abstol: float = 1e-6,
    reltol: float = 1e-3,
    dt: Optional[float] = None,
    max_steps: int = 4096,
    maxiters: int = 100_000,
    dtmin: Optional[float] = None,
) -> Integrator:
    """Create a steppable integrator (OrdinaryDiffEq's ``init``)."""
    t0, t1 = prob.tspan
    dt0 = initial_dt(prob, alg.order, abstol, reltol) if dt is None else dt
    if dtmin is None:
        dtmin = 1e-14 * float(t1 - t0)
    return Integrator(prob, alg, abstol, reltol, max_steps, maxiters, dtmin, dt0)
