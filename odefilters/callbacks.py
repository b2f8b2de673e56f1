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
