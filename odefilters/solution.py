"""Probabilistic solution object, dense output, and stats (L4).

TPU-native replacement for `/root/reference/src/solution.jl`. Differences:

- :class:`ProbODESolution` is an immutable pytree with *fixed-capacity*
  buffers (JAX needs static shapes): valid entries are ``0..n_steps``, the
  tail is padding (times padded with ``t_end``). It flows through ``jit`` /
  ``vmap`` (an ensemble of solutions is just a batched solution).
- Dense output (`solution.jl:139-215`) is a pure function, vectorized over
  query times with ``vmap`` instead of a Python loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from odefilters import diffusions as diff
from odefilters.algorithms import AbstractEK
from odefilters.linalg import Gaussian, scale_rows
from odefilters.ops.filtering import predict, smooth_step
from odefilters.priors import precond_full, transition_precond_full
from odefilters.problem import ODEProblem

RETCODE_SUCCESS = 0
RETCODE_MAXITERS = 1
RETCODE_UNSTABLE = 2
RETCODE_NAMES = {0: "Success", 1: "MaxIters", 2: "Unstable"}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DEStats:
    """Solver statistics (host-provided `destats` in the reference;
    incremented at `/root/reference/src/perform_step.jl:107,124`)."""

    nf: jax.Array
    njacs: jax.Array
    naccept: jax.Array
    nreject: jax.Array

    @staticmethod
    def zeros():
        z = jnp.zeros((), jnp.int32)
        return DEStats(z, z, z, z)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProbODESolution:
    """Gaussian posterior over the ODE solution.

    Mirrors ``ProbODESolution`` (`/root/reference/src/solution.jl:5-25`):
    ``u``/``pu`` are the projected solution (means / Gaussians), ``x_filt``
    and ``x_smooth`` the full filter/smoother states, ``diffusions`` the
    per-step calibrated diffusions, plus log-likelihood, stats and retcode.
    """

    ts: jax.Array             # (N+1,) times, padded with t_end
    n_steps: jax.Array        # () int32, number of accepted steps
    u: jax.Array              # (N+1, d) posterior means (smoothed if smooth)
    pu: Gaussian              # projected solution Gaussians
    x_filt: Gaussian          # full filter states
    x_smooth: Gaussian        # full smoother states (== x_filt if not smooth)
    diffusions: jax.Array     # (N+1,) or (N+1, d); entry k = step k (k >= 1)
    log_likelihood: jax.Array
    stats: DEStats
    retcode: jax.Array        # () int32
    prob: ODEProblem
    alg: AbstractEK = dataclasses.field(metadata=dict(static=True))

    # ---- basic views ----
    @property
    def d(self) -> int:
        return self.u.shape[-1]

    @property
    def q(self) -> int:
        return self.alg.order

    @property
    def t(self) -> jax.Array:
        """Alias matching the reference's ``sol.t``."""
        return self.ts

    @property
    def retcode_name(self) -> str:
        try:
            return RETCODE_NAMES[int(self.retcode)]
        except Exception:  # traced / batched
            return "<traced>"

    def __call__(self, t, smoothed: Optional[bool] = None):
        """Dense output ``sol(t)`` -> projected Gaussian(s)
        (`/root/reference/src/solution.jl:211-215`). Works on batched
        (ensemble) solutions too: the evaluation maps over the leading
        ensemble axis."""
        if self.ts.ndim > 1:  # batched (ensemble) solution
            return jax.vmap(lambda s: evaluate(s, t, smoothed=smoothed))(self)
        return evaluate(self, t, smoothed=smoothed)

    def plot(self, **kwargs):
        """Ribbon plot of the posterior (`odefilters.plotting`)."""
        from odefilters.plotting import plot_solution

        return plot_solution(self, **kwargs)

    def states(self, t, smoothed: Optional[bool] = None) -> Gaussian:
        """Dense output over the full D-dimensional state."""
        return evaluate_states(self, t, smoothed=smoothed)

    def mean(self):
        return MeanProbODESolution(self)


class MeanProbODESolution:
    """Point-estimate adapter over the posterior mean, for classic-solver
    style analysis (`/root/reference/src/solution.jl:95-130`)."""

    def __init__(self, sol: ProbODESolution):
        self.probsol = sol
        self.ts = sol.ts
        self.u = sol.u

    def __call__(self, t):
        return evaluate(self.probsol, t).mean


# --------------------------------------------------------------------------
# Dense output: the Gaussian ODE filter posterior interpolant
# --------------------------------------------------------------------------


def _state_dim(sol: ProbODESolution) -> int:
    """ODE dimension d from the full state (sol.d is the *projected*
    dimension, which is 2d for second-order problems)."""
    return sol.x_filt.mean.shape[-1] // (sol.q + 1)


def _interp_model(sol: ProbODESolution, h, rate_matrix=None):
    """Preconditioned transition pair for an interpolation step ``h``
    (h-independent constants for the IWP prior; ``rate_matrix`` feeds the
    jacobian-rate IOUP's per-interval linearization)."""
    return transition_precond_full(
        sol.alg.prior, _state_dim(sol), sol.q, h, sol.u.dtype,
        rate_matrix=rate_matrix,
    )


def _prior_rate_fn(sol: ProbODESolution):
    """``(u_left, t_left) -> (d, d)`` per-interval prior linearization for
    a jacobian-rate IOUP solution (RosenbrockExpEK), else ``None``. Matches
    the forward pass: the rate is ``J_f`` at the interval's left filter
    mean (see ``attempt_step`` in `odefilters/step.py`)."""
    from odefilters.priors import IOUP

    prior = sol.alg.prior
    if not (isinstance(prior, IOUP) and prior.rate_is_jacobian):
        return None
    prob = sol.prob
    if prob.jac is not None:
        return lambda u, t: prob.jac(u, prob.p, t)
    return lambda u, t: jax.jacfwd(lambda v: prob.f(v, prob.p, t))(u)


def _gaussian_at(g: Gaussian, i) -> Gaussian:
    return Gaussian(g.mean[i], g.chol[i])


def evaluate_states(
    sol: ProbODESolution, t, smoothed: Optional[bool] = None
) -> Gaussian:
    """Posterior over the full state X(t); `solution.jl:165-210`.

    For t strictly inside interval i: precondition with ``h1 = t - t_i``,
    predict from ``x_filt[i]``; if smoothing, also smooth against
    ``x_smooth[i+1]`` with ``h2 = t_{i+1} - t``. Exact grid hits return the
    stored states (`solution.jl:172-176`).
    """
    from odefilters.linalg import highest_precision

    if smoothed is None:
        smoothed = sol.alg.smooth
    t_arr = jnp.asarray(t, dtype=sol.ts.dtype)
    # highest_precision: dense output does D x D matmuls (predict/smooth)
    # which would otherwise lower to bf16 MXU passes on TPU (CLAUDE.md)
    with highest_precision():
        if t_arr.ndim == 0:
            return _evaluate_one(sol, t_arr, smoothed)
        return jax.vmap(lambda tv: _evaluate_one(sol, tv, smoothed))(t_arr)


def _evaluate_one(sol: ProbODESolution, tval, smoothed: bool) -> Gaussian:
    d, q = _state_dim(sol), sol.q
    ts, n = sol.ts, sol.n_steps

    # clamp below t0 to the stored initial state (the reference raises,
    # `solution.jl:169-171`; under jit we clamp); above t_end the posterior
    # extrapolates by prediction from the *last* state, like the reference.
    tval = jnp.maximum(tval, ts[0])
    i = jnp.clip(jnp.searchsorted(ts, tval, side="right") - 1, 0, n)
    exact = ts[i] == tval

    diffusion = jnp.take(sol.diffusions, jnp.minimum(i + 1, n), axis=0)

    # Extrapolate from x_filt[i] over h1 = t - t_i. On exact hits (and a
    # non-positive h2 when extrapolating past t_end) the non-selected
    # branch must still be FINITE: h**(negative) of a tiny h is inf, and
    # under reverse-mode AD the zero cotangent into the unselected branch
    # multiplies it (0 * inf = NaN), poisoning the shared x_filt cotangent.
    one_h = jnp.ones((), ts.dtype)
    h1 = jnp.where(exact, one_h, jnp.maximum(tval - ts[i], jnp.finfo(ts.dtype).tiny))
    rate_fn = _prior_rate_fn(sol)
    rate_i = (
        None if rate_fn is None else rate_fn(sol.x_filt.mean[i, :d], ts[i])
    )
    A1, QL1 = _interp_model(sol, h1, rate_i)
    QLh1 = diff.apply_diffusion_chol(QL1, diffusion, q)
    p1, p1i = precond_full(h1, d, q)
    x_prev = _gaussian_at(sol.x_filt, i)
    pred = predict(scale_rows(p1, x_prev), A1, QLh1)
    pred = scale_rows(p1i, pred)

    if smoothed:
        # Smooth against x_smooth[i+1] over h2 = t_{i+1} - t
        h2_raw = ts[i + 1] - tval
        h2 = jnp.where(exact | (h2_raw <= 0), one_h, h2_raw)
        # same per-interval linearization as h1: the interval's prior is
        # the Gauss-Markov process with the rate frozen at the left state
        # (A(h1+h2) = A(h2) A(h1) only holds with a shared rate)
        A2, QL2 = _interp_model(sol, h2, rate_i)
        QLh2 = diff.apply_diffusion_chol(QL2, diffusion, q)
        p2, p2i = precond_full(h2, d, q)
        x_next = _gaussian_at(sol.x_smooth, jnp.minimum(i + 1, n))
        sm, _ = smooth_step(
            scale_rows(p2, pred), scale_rows(p2, x_next), A2, QLh2
        )
        sm = scale_rows(p2i, sm)
        inside = tval < ts[n]
        pred = jax.tree.map(
            lambda a, b: jnp.where(inside, a, b), sm, pred
        )

    stored = _gaussian_at(sol.x_smooth if smoothed else sol.x_filt, i)
    return jax.tree.map(lambda a, b: jnp.where(exact, a, b), stored, pred)


def evaluate(sol: ProbODESolution, t, smoothed: Optional[bool] = None) -> Gaussian:
    """Projected dense output: ``SolProj * X(t)`` (`solution.jl:211-215`)."""
    xs = evaluate_states(sol, t, smoothed=smoothed)
    d = sol.d
    return Gaussian(xs.mean[..., :d], xs.chol[..., :d, :])


def errors_vs_analytic(sol: ProbODESolution) -> dict:
    """l2/l-inf/final errors against ``prob.analytic`` when available
    (DiffEqDevTools-style `appxtrue`, cf. `solution.jl:95-130`)."""
    if sol.prob.analytic is None:
        raise ValueError("problem has no analytic solution attached")
    ref = jax.vmap(lambda t: sol.prob.analytic(sol.prob.u0, sol.prob.p, t))(sol.ts)
    N1 = sol.ts.shape[0]
    mask = (jnp.arange(N1) <= sol.n_steps)[:, None]
    e = jnp.where(mask, sol.u - ref, 0.0)
    n_valid = (sol.n_steps + 1) * sol.d
    l2 = jnp.sqrt(jnp.sum(e**2) / n_valid)
    linf = jnp.max(jnp.abs(e))
    final = jnp.linalg.norm(
        jnp.take(sol.u, sol.n_steps, axis=0)
        - sol.prob.analytic(sol.prob.u0, sol.prob.p, jnp.take(sol.ts, sol.n_steps))
    )
    return {"l2": l2, "l∞": linf, "final": final}


def compact_saveat(sol: ProbODESolution, ts_save: jax.Array) -> ProbODESolution:
    """Re-sample a solution onto the ``saveat`` grid (host-framework
    `saveat` semantics): the returned solution's grid *is* ``ts_save``,
    with states from the dense posterior. ``ts_save`` must lie within the
    solved span and be sorted."""
    ts_save = jnp.asarray(ts_save, dtype=sol.ts.dtype)
    xs = evaluate_states(sol, ts_save)
    n = ts_save.shape[0] - 1
    sol_d = sol.d
    u = xs.mean[:, :sol_d]
    pu = Gaussian(xs.mean[:, :sol_d], xs.chol[:, :sol_d, :])
    # side="left": an exact grid hit ts_save[j] == sol.ts[i] must map to
    # the diffusion of the interval ENDING at i (side="right" would shift
    # it one interval forward)
    idx = jnp.clip(
        jnp.searchsorted(sol.ts, ts_save, side="left"), 1, sol.n_steps
    )
    diffs = jnp.take(sol.diffusions, idx, axis=0)
    return dataclasses.replace(
        sol,
        ts=ts_save,
        n_steps=jnp.asarray(n, jnp.int32),
        u=u,
        pu=pu,
        x_filt=xs,
        x_smooth=xs,
        diffusions=diffs,
    )


def smooth_solution(
    sol: ProbODESolution, jitter: float = 0.0
) -> ProbODESolution:
    """Run (or re-run) the RTS smoothing pass on a solution, on the
    CURRENT default device, from its retained filter states.

    The production pattern for extremely stiff on-chip solves: the
    adaptive forward filter runs on TPU (`smooth=False`), but its
    covariance scales span more dynamic range than the TPU's
    f32-range-limited transcendentals/QR support (docs/kernels.md "f64 on
    TPU"), so the O(N D^2) backward pass — tiny next to the solve — runs
    on host:

        with jax.default_device(jax.devices("cpu")[0]):
            sol = smooth_solution(jax.device_get(sol))

    Works on any solution (also re-smooths an already-smoothed one from
    `x_filt`, which is always retained).

    ``jitter``: relative floor on the predicted factor in the RTS gain
    (see :func:`~odefilters.ops.filtering.smoother_gain`). Chip-computed
    filter states carry ~1e-8 arithmetic error (TPU QR); the exact gain
    amplifies that without bound through covariance directions the filter
    has fully converged (measured: inf on the mu=1e5 VdP solve). Use
    ``jitter~1e-7`` when smoothing states that were filtered on TPU.
    """
    import dataclasses as _dc

    from odefilters.smoothing import smooth_all

    from odefilters.linalg import highest_precision

    d, q = sol.prob.d, sol.alg.order
    if sol.prob.second_order:
        d = sol.x_filt.mean.shape[-1] // (q + 1)
    # jax.device_get'd solutions carry numpy leaves; the smoothing scan
    # indexes them with traced indices, so lift back to jnp first
    import jax.numpy as _jnp

    x_filt = Gaussian(
        _jnp.asarray(sol.x_filt.mean), _jnp.asarray(sol.x_filt.chol)
    )
    with highest_precision():
        x_out = smooth_all(
            x_filt, _jnp.asarray(sol.ts), _jnp.asarray(sol.diffusions),
            _jnp.asarray(sol.n_steps), d, q, prior=sol.alg.prior,
            jitter=jitter, rate_fn=_prior_rate_fn(sol),
        )
    sol_d = sol.u.shape[-1]
    alg = sol.alg
    if not alg.smooth:
        # the result IS smoothed now: mark it so sampling/dense output
        # treat x_smooth as a valid joint posterior
        alg = dataclasses.replace(alg, smooth=True)
    return _dc.replace(
        sol,
        alg=alg,
        u=x_out.mean[:, :sol_d],
        pu=Gaussian(x_out.mean[:, :sol_d], x_out.chol[:, :sol_d, :]),
        x_smooth=x_out,
    )
