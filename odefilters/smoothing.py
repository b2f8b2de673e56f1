"""Backward Rauch-Tung-Striebel smoothing over the saved trajectory.

TPU-native replacement for `/root/reference/src/smoothing.jl`: the
sequential backward loop becomes a (reverse) ``lax.scan`` over the
fixed-capacity solution buffers, with masking for the invalid tail and for
zero-length intervals (callback duplicates, `smoothing.jl:14-17`).

A time-parallel alternative lives in ``odefilters/parallel/associative.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from odefilters import diffusions as diff
from odefilters.linalg import Gaussian, scale_rows
from odefilters.ops.filtering import smooth_step
from odefilters.priors import precond_full, transition_precond_full


def _select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def smooth_all(
    x_filt: Gaussian,
    ts: jax.Array,
    diffusions: jax.Array,
    n_steps: jax.Array,
    d: int,
    q: int,
    prior=None,
    jitter: float = 0.0,
    rate_fn=None,
) -> Gaussian:
    """Backward pass producing the smoothed trajectory.

    Mirrors ``smooth_all!`` (`/root/reference/src/smoothing.jl:4-28`):
    iterate i = n-1 .. 1 (the initial state, exactly known, is not
    smoothed — the reference loop stops at 1-based index 2), per interval
    precondition with dt_i, apply the step's committed diffusion
    (``diffusions[i+1]`` here = the reference's ``diffusions[i]``), and run
    the square-root RTS step. dt == 0 intervals copy the next state.

    Args are the *stacked* buffers; entries beyond ``n_steps`` are padding
    and pass through untouched. ``jitter`` floors the predicted factor in
    the RTS gain (see :func:`~odefilters.ops.filtering.smoother_gain`) —
    required when the filter states were computed at reduced precision
    (TPU stiff solves smoothed on host via
    :func:`~odefilters.solution.smooth_solution`).

    ``rate_fn``: ``(u_left, t_left) -> (d, d)`` per-interval prior
    linearization for the jacobian-rate IOUP (RosenbrockExpEK) — evaluated
    at the interval's LEFT filter mean, matching the forward pass (see
    :func:`odefilters.step.prior_rate_fn`).
    """
    N1 = ts.shape[0]

    x_last = Gaussian(
        jnp.take(x_filt.mean, n_steps, axis=0),
        jnp.take(x_filt.chol, n_steps, axis=0),
    )

    def body(x_next, i):
        x_i = Gaussian(x_filt.mean[i], x_filt.chol[i])
        dt = ts[i + 1] - ts[i]
        in_range = (i >= 1) & (i <= n_steps - 1)
        active = in_range & (dt > 0)

        dt_safe = jnp.where(dt > 0, dt, 1.0)
        p, p_inv = precond_full(dt_safe, d, q)
        # per-interval preconditioned transition (IWP: h-free constants,
        # hoisted out of the scan by XLA)
        rate_i = (
            None if rate_fn is None else rate_fn(x_filt.mean[i, :d], ts[i])
        )
        A_i, QL_i = transition_precond_full(
            prior, d, q, dt_safe, x_filt.mean.dtype, rate_matrix=rate_i
        )
        sigma2 = jnp.take(diffusions, i + 1, axis=0)
        QLh = diff.apply_diffusion_chol(QL_i, sigma2, q)
        xs_p, _ = smooth_step(
            scale_rows(p, x_i), scale_rows(p, x_next), A_i, QLh,
            jitter=jitter,
        )
        xs = scale_rows(p_inv, xs_p)

        out = _select(active, xs, x_i)
        out = _select(in_range & (dt == 0), x_next, out)
        carry = _select(in_range, out, x_next)
        return carry, out

    idxs = jnp.arange(N1 - 2, -1, -1)
    _, outs_rev = jax.lax.scan(body, x_last, idxs)
    outs = jax.tree.map(lambda a: jnp.flip(a, axis=0), outs_rev)
    # Append the (unsmoothed) last buffer row back at every position i >= 1?
    # outs covers indices 0..N1-2; the final index N1-1 keeps its filter
    # state (it is either the last state or padding).
    x_smooth = Gaussian(
        jnp.concatenate([outs.mean, x_filt.mean[-1:]], axis=0),
        jnp.concatenate([outs.chol, x_filt.chol[-1:]], axis=0),
    )
    # Positions > n_steps (padding) and position n_steps keep x_filt rows:
    # body already passes those through (out = x_i when not in_range).
    return x_smooth
