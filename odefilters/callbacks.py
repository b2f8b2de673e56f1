"""Discrete callbacks/events against the filter state.

The reference inherits DiffEqBase's callback system and its tests mutate
the filtering state mid-solve (`/root/reference/test/specific_problems.jl:69-111`:
a `DiscreteCallback` that modifies `integ.cache.x` and friends). Here a
callback is a pair of pure functions applied inside the jitted loop:

    condition(u, t, p) -> bool        fire after an accepted step?
    affect(x: Gaussian, t, p) -> Gaussian   new filter state

When a callback fires, the solver (like the host framework) saves *both*
the pre- and post-affect states at the same time point — the dt == 0
duplicate rows that the smoother and interpolator already handle
(`/root/reference/src/smoothing.jl:14-17`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiscreteCallback:
    """Fire ``affect`` whenever ``condition`` holds after an accepted step.

    Both functions must be pure and JAX-traceable; they are baked into the
    compiled loop (static). ``affect`` receives and returns the full
    D-dimensional filter state as a :class:`~odefilters.linalg.Gaussian` —
    use :func:`odefilters.ops.filtering.condition_on` inside it for
    Bayes-consistent state modifications.
    """

    condition: Callable  # (u, t, p) -> bool
    affect: Callable     # (x: Gaussian, t, p) -> Gaussian

    def __hash__(self):
        return hash((self.condition, self.affect))


def ManifoldUpdate(
    residual: Callable,
    d: int,
    maxiters: int = 10,
    jac: Optional[Callable] = None,
) -> DiscreteCallback:
    """Project every accepted filter state onto the zero set of a
    conservation law ``g(u) = 0`` by iterated extended-Kalman conditioning.

    The "pick-and-mix information operator" of Bosch, Tronarp, Hennig
    (AISTATS 2022), shipped by later upstream versions as
    ``ManifoldUpdate``; the reference v0.1.5 has only plain state-mutating
    callbacks (`/root/reference/test/specific_problems.jl:69-111`). After
    each accepted step the full filter state is conditioned on the exact
    observation ``g(u) = 0`` with an iterated (Gauss-Newton) linearization:
    each sweep re-linearizes ``g`` at the current iterate's mean and
    re-conditions the ORIGINAL post-step state, converging to the MAP
    projection onto the manifold. Conserved quantities (energy, mass,
    angular momentum) then hold exactly at every saved point instead of
    drifting with the solver error.

    Args:
        residual: ``g(u, t, p) -> (m,)`` constraint residual over the
            solution value ``u`` (the first ``d`` state entries).
        d: the ODE dimension (how much of the state ``g`` sees).
        maxiters: Gauss-Newton sweeps (static; near-quadratic convergence —
            the default is plenty for smooth constraints).
        jac: optional analytic constraint Jacobian ``(u, t, p) -> (m, d)``;
            defaults to ``jax.jacfwd`` of ``residual``.

    Each firing saves a pre/post duplicate row (dt == 0), so size
    ``max_steps`` at ~2x the expected accepted-step count.
    """
    from odefilters.linalg import Gaussian
    from odefilters.ops.filtering import condition_on

    def condition(u, t, p):
        return jnp.ones((), bool)

    def affect(x: "Gaussian", t, p):
        D = x.mean.shape[-1]

        def g(u):
            return jnp.atleast_1d(residual(u, t, p))

        def body(_, x_i):
            u_i = x_i.mean[:d]
            J = jac(u_i, t, p) if jac is not None else jax.jacfwd(g)(u_i)
            J = jnp.atleast_2d(J)
            H = jnp.concatenate(
                [J, jnp.zeros((J.shape[0], D - d), J.dtype)], axis=-1
            )
            # condition the ORIGINAL state on the linearization at the
            # iterate: H x = H m_i - g(u_i) (the iterated EKF / Gauss-
            # Newton MAP recursion)
            data = H @ x_i.mean - g(u_i)
            return condition_on(x, H, data)

        return jax.lax.fori_loop(0, maxiters, body, x)

    return DiscreteCallback(condition=condition, affect=affect)


def terminal_condition(u_index: int, threshold: float, direction: int = 1):
    """Convenience condition: component crosses a threshold."""

    def condition(u, t, p):
        if direction >= 0:
            return u[u_index] >= threshold
        return u[u_index] <= threshold

    return condition


@dataclasses.dataclass(frozen=True)
class ContinuousCallback:
    """Event location: fire when a scalar event function crosses zero.

    The reference only supports discrete callbacks
    (`/root/reference/test/specific_problems.jl:69-111`); continuous event
    location is the standard ODE-suite extension. After each accepted step
    [t, t+dt], a sign change of ``condition(u, t, p)`` triggers a root
    search (bisection on the probabilistic dense-output mean between the
    bracketing filter states) and the step is *re-taken* to land exactly
    on the located event time — so the event lands like a tstop and the
    saved grid contains it.

    Args:
        condition: scalar event function ``g(u, t, p)``; event at g = 0.
        affect: optional state modification ``(x, t, p) -> Gaussian``
            applied at the event (saved as a dt == 0 duplicate row, like
            DiscreteCallback).
        direction: 0 = any crossing, +1 = only upcrossings (g_old < 0),
            -1 = only downcrossings.
        terminal: stop the integration at the event.
        root_iters: bisection iterations (40 ~ machine precision).
    """

    condition: Callable  # (u, t, p) -> scalar
    affect: Optional[Callable] = None
    direction: int = 0
    terminal: bool = False
    root_iters: int = 40

    def __hash__(self):
        return hash((self.condition, self.affect, self.direction,
                     self.terminal, self.root_iters))
