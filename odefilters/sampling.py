"""Joint posterior sampling by backward conditioning.

TPU-native replacement for `/root/reference/src/solution_sampling.jl`: the
reference's double loop (n samples x T sequential smooth steps,
`solution_sampling.jl:44-59`) becomes one backward ``lax.scan`` over time,
``vmap``-ped over the sample axis — on TPU all samples advance in lockstep
as batched matmuls/QRs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from odefilters import diffusions as diff
from odefilters.linalg import Gaussian, sample_gaussian, scale_rows
from odefilters.ops.filtering import smooth_step
from odefilters.priors import precond_full, transition_precond_full
from odefilters.solution import ProbODESolution, evaluate_states


def _sample_states_impl(
    key, ts, x_filt: Gaussian, diffusions, difftimes, n_steps, d: int, q: int,
    n: int, prior=None, jitter: float = 0.0, prob=None,
):
    """Backward pass over the buffers; returns (N+1, D, n) samples.

    Mirrors ``sample_states`` (`solution_sampling.jl:24-62`): draw x_N from
    the last state, then for i = N-1..0 smooth each sample against a
    zero-covariance Gaussian at the drawn value and re-draw from the
    conditional.

    ``prob`` supplies the vector field for the jacobian-rate IOUP
    (RosenbrockExpEK): each interval's transition is re-linearized at the
    left row of ``x_filt`` (the forward pass's linearization point; on the
    dense-grid variant, the interpolated mean).
    """
    from odefilters.priors import IOUP

    rate_fn = None
    if isinstance(prior, IOUP) and prior.rate_is_jacobian:
        if prob is None:
            raise ValueError(
                "sampling with IOUP(rate='jacobian') needs the problem "
                "(vector field) to re-linearize the prior"
            )
        if prob.jac is not None:
            rate_fn = lambda u, t: prob.jac(u, prob.p, t)  # noqa: E731
        else:
            rate_fn = lambda u, t: jax.jacfwd(  # noqa: E731
                lambda v: prob.f(v, prob.p, t)
            )(u)
    dtype = x_filt.mean.dtype
    D = x_filt.mean.shape[-1]
    N1 = ts.shape[0]

    key_last, key_scan = jax.random.split(key)
    x_last = Gaussian(
        jnp.take(x_filt.mean, n_steps, axis=0),
        jnp.take(x_filt.chol, n_steps, axis=0),
    )
    last_sample = sample_gaussian(key_last, x_last, n)  # (D, n)

    step_keys = jax.random.split(key_scan, N1 - 1)

    def body(carry, inp):
        sample_next = carry  # (D, n)
        i, k = inp
        dt = ts[i + 1] - ts[i]
        in_range = i <= n_steps - 1
        dt_safe = jnp.where(dt > 0, dt, 1.0)
        p, p_inv = precond_full(dt_safe, d, q)
        # per-interval preconditioned transition (IWP: h-free constants)
        rate_i = (
            None if rate_fn is None else rate_fn(x_filt.mean[i, :d], ts[i])
        )
        A_i, QL_i = transition_precond_full(
            prior, d, q, dt_safe, dtype, rate_matrix=rate_i
        )

        # diffusion of the interval containing ts[i]
        # (reference: i_diffusion = sum(difftimes .<= ts[i]),
        #  solution_sampling.jl:46-47)
        i_diff = jnp.clip(
            jnp.searchsorted(difftimes, ts[i], side="right"), 1, n_steps
        )
        sigma2 = jnp.take(diffusions, i_diff, axis=0)
        QLh = diff.apply_diffusion_chol(QL_i, sigma2, q)

        x_prev_p = scale_rows(p, Gaussian(x_filt.mean[i], x_filt.chol[i]))

        def one(sample_col, kk):
            target = Gaussian(p * sample_col, jnp.zeros((D, D), dtype))
            cond, _ = smooth_step(x_prev_p, target, A_i, QLh, jitter=jitter)
            draw = sample_gaussian(kk, cond, 1)[..., 0]
            return p_inv * draw

        keys_n = jax.random.split(k, n)
        drawn = jax.vmap(one, in_axes=(1, 0), out_axes=1)(sample_next, keys_n)
        out = jnp.where(in_range, drawn, sample_next)
        dup = in_range & (dt == 0)
        out = jnp.where(dup, sample_next, out)
        return out, out

    idxs = jnp.arange(N1 - 2, -1, -1)
    _, outs_rev = jax.lax.scan(body, last_sample, (idxs, step_keys))
    outs = jnp.flip(outs_rev, axis=0)  # rows 0..N1-2
    path = jnp.concatenate([outs, last_sample[None]], axis=0)
    # rows beyond n_steps are copies of padding; harmless. Fix row n_steps:
    path = path.at[jnp.minimum(n_steps, N1 - 1)].set(last_sample)
    return path


@partial(jax.jit, static_argnames=("n", "d", "q", "prior", "jitter"))
def _sample_states_jit(key, ts, x_filt, diffusions, difftimes, n_steps, d, q,
                       n, prior=None, jitter=0.0, prob=None):
    return _sample_states_impl(
        key, ts, x_filt, diffusions, difftimes, n_steps, d, q, n, prior,
        jitter, prob,
    )


def sample_states(
    key, sol: ProbODESolution, n: int = 1, jitter: float = 0.0
) -> jax.Array:
    """Joint samples of the full state path, shape (N+1, D, n).

    Reference: `solution_sampling.jl:15-23` (requires a smoothed posterior).
    ``jitter``: relative floor on the predicted factor inside the
    backward conditioning gain — required when the forward filter ran on
    TPU (chip-collapsed factors; see
    :func:`~odefilters.ops.filtering.smoother_gain`).
    """
    if not sol.alg.smooth:
        raise ValueError("sampling not implemented for non-smoothed posteriors")
    from odefilters.solution import _state_dim

    # NOT sol.d: that is the projected dim (2d for second-order problems);
    # the transitions/preconditioners need the per-block state dim
    return _sample_states_jit(
        key, sol.ts, sol.x_filt, sol.diffusions, sol.ts, sol.n_steps,
        _state_dim(sol), sol.q, n, sol.alg.prior, float(jitter), sol.prob,
    )


def sample(
    key, sol: ProbODESolution, n: int = 1, jitter: float = 0.0
) -> jax.Array:
    """Joint samples of the solution path (first d dims), (N+1, d, n)."""
    return sample_states(key, sol, n, jitter=jitter)[:, : sol.d, :]


def dense_sample_states(key, sol: ProbODESolution, n: int = 1, n_grid: int = 1000):
    """Samples on a dense uniform grid (`solution_sampling.jl:63-69`):
    interpolate *non-smoothed* predictive states onto the grid, then run the
    same backward conditioning. Returns ``(samples, times)``."""
    if not sol.alg.smooth:
        raise ValueError("sampling not implemented for non-smoothed posteriors")
    from odefilters.solution import _state_dim

    t_end = jnp.take(sol.ts, sol.n_steps)
    times = jnp.linspace(sol.ts[0], t_end, n_grid)
    states = evaluate_states(sol, times, smoothed=False)
    samples = _sample_states_jit(
        key, times, states, sol.diffusions, sol.ts,
        jnp.asarray(n_grid - 1, jnp.int32), _state_dim(sol), sol.q, n,
        sol.alg.prior, 0.0, sol.prob,
    )
    return samples, times


def dense_sample(key, sol: ProbODESolution, n: int = 1, n_grid: int = 1000):
    samples, times = dense_sample_states(key, sol, n, n_grid)
    return samples[:, : sol.d, :], times
