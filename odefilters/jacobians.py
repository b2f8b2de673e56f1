"""Jacobian utilities.

Replacement for `/root/reference/src/jacobian.jl` (`remake_prob_with_jac`,
which uses ModelingToolkit symbolic codegen). In JAX the analogue is
forward-mode autodiff — already XLA-compiled, so a "symbolic" Jacobian has
no performance edge; this module exists for API parity and for forcing a
particular differentiation mode.
"""

from __future__ import annotations

import jax

from odefilters.problem import ODEProblem, remake


def resolve_jac_diag(f, jac=None, jac_diag=None):
    """``(u, p, t) -> (d,)`` Jacobian-*diagonal* callable for
    :class:`odefilters.algorithms.DiagonalEK1`.

    Preference order: an exact user ``jac_diag`` (O(d) for pointwise
    reaction terms), the diagonal of a user ``jac``, else the diagonal of
    the ``jax.jacfwd`` Jacobian (O(d^2) — fine for moderate d; supply
    ``jac_diag`` for PDE-scale states).
    """
    import jax.numpy as jnp

    if jac_diag is not None:
        return jac_diag
    if jac is not None:
        return lambda u, p, t: jnp.diagonal(jac(u, p, t))
    return lambda u, p, t: jnp.diagonal(
        jax.jacfwd(lambda uu: f(uu, p, t))(u)
    )


def remake_with_jac(prob: ODEProblem, mode: str = "fwd") -> ODEProblem:
    """Attach an autodiff Jacobian to the problem.

    `remake_prob_with_jac(prob)` equivalent
    (`/root/reference/src/jacobian.jl:6-22`). EK1 would use jacfwd anyway
    when ``prob.jac is None``; attaching makes the choice explicit and lets
    users override with ``mode="rev"`` for very wide systems.
    """
    f = prob.f
    if mode == "fwd":
        jac = lambda u, p, t: jax.jacfwd(lambda uu: f(uu, p, t))(u)
    elif mode == "rev":
        jac = lambda u, p, t: jax.jacrev(lambda uu: f(uu, p, t))(u)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return remake(prob, jac=jac)
