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
