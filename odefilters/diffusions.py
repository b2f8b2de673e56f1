"""Diffusion (process-noise scale sigma^2) calibration.

TPU-native replacement for `/root/reference/src/diffusions.jl` — the five
strategies behind ``estimate_diffusion``:

- ``dynamic``    per-step MLE   sigma^2 = z^T (H Q H^T)^-1 z / d   (:72-80)
- ``dynamicMV``  per-dimension diagonal dynamic MLE (EK0 only)     (:83-112)
- ``fixed``      running-mean global MLE                           (:11-36)
- ``fixedMV``    per-dimension running-mean (EK0 only)             (:115-153)
- ``fixedMAP``   InverseGamma(1/2, 1/2) MAP                        (:46-68)

All estimators are pure functions of the current measurement; the
running-mean state for the static models is threaded through the solver
loop carry (prev global + accepted-step count), committed only on accepted
steps — which reproduces the reference's read-from-`sol.diffusions[end]`
behavior exactly (rejected attempts never contaminate the state).

A diffusion value is a scalar array for the scalar models and a ``(d,)``
vector for the MV models (the reference's ``kron(I_{q+1}, Diagonal(s))`` is
never materialized: applying it to the square-root factor is a row scaling).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from odefilters.linalg import cholesky_psd


def is_static(name: str) -> bool:
    """Trait `isstatic` (`diffusions.jl:4-7`)."""
    return name in ("fixed", "fixedMV", "fixedMAP")


def is_dynamic(name: str) -> bool:
    return name in ("dynamic", "dynamicMV")


def initial_diffusion(name: str, d: int, dtype) -> jnp.ndarray:
    """`initial_diffusion` (`diffusions.jl:8,84-85,116-117`): scalar one, or
    a ones-vector for the MV models."""
    if name in ("dynamicMV", "fixedMV"):
        return jnp.ones((d,), dtype=dtype)
    return jnp.ones((), dtype=dtype)


def apply_diffusion_chol(QL: jnp.ndarray, sigma2, q: int) -> jnp.ndarray:
    """Square-root of ``apply_diffusion(Q, sigma2)``.

    Reference: `/root/reference/src/ProbNumDiffEq.jl:38-39` —
    scalar: ``sqrt(s2) * QL``; diagonal ``kron(I_{q+1}, diag(s2))``:
    row-scale by ``sqrt(tile(s2, q+1))``.
    """
    if sigma2.ndim == 0:
        return jnp.sqrt(sigma2) * QL
    scale = jnp.sqrt(jnp.tile(sigma2, q + 1))
    return scale[..., :, None] * QL


def apply_diffusion_chol_std(QL: jnp.ndarray, sigma_std, q: int) -> jnp.ndarray:
    """:func:`apply_diffusion_chol` taking the diffusion STD directly.

    The range-factored calibration (`step.py`) carries sigma, not
    sigma^2: on TPU the emulated f64 has f32 dynamic range, and the
    variance of a tiny dynamic diffusion (sigma^2 ~ 1e-44 on stiff
    slow manifolds) flushes to zero where the std (~1e-22) is still
    representable.
    """
    sigma_std = jnp.asarray(sigma_std)
    if sigma_std.ndim == 0:
        return sigma_std * QL
    scale = jnp.tile(sigma_std, q + 1)
    return scale[..., :, None] * QL


def quad_form_solve(z: jnp.ndarray, M_factor: jnp.ndarray) -> jnp.ndarray:
    """``z^T (F F^T)^{-1} z`` via a guarded Cholesky of ``F F^T``.

    One triangular solve suffices: z^T S^{-1} z = |L^{-1} z|^2 (and it
    broadcasts over leading batch dims, unlike jax.scipy cho_solve)."""
    S = M_factor @ jnp.swapaxes(M_factor, -1, -2)
    S_chol = cholesky_psd(S)
    w = solve_triangular(S_chol, z[..., None], lower=True)[..., 0]
    return jnp.sum(w * w, axis=-1)


# --------------------------------------------------------------------------
# Per-attempt estimates (local diffusion)
# --------------------------------------------------------------------------


def estimate_dynamic(z: jnp.ndarray, HQL: jnp.ndarray) -> jnp.ndarray:
    """`DynamicDiffusion` (`diffusions.jl:72-80`): scalar MLE
    ``sigma^2 = z^T (H Q H^T)^-1 z / d`` with ``HQL = H @ QL``."""
    d = z.shape[-1]
    return quad_form_solve(z, HQL) / d


def estimate_dynamic_mv(z: jnp.ndarray, HQL: jnp.ndarray) -> jnp.ndarray:
    """`MVDynamicDiffusion` (`diffusions.jl:83-112`):
    ``sigma_i^2 = max(z_i^2 / (H Q H^T)_ii, eps)``.

    For EK0 ``H Q H^T = q0 I_d`` (every per-row norm identical —
    the reference's closed form); DiagonalEK1 keeps H per-dimension
    diagonal, so the same per-row statistic stays exact with a
    dimension-dependent diagonal."""
    q0 = jnp.sum(HQL**2, axis=-1)  # (..., d) diag of H Q H^T
    s = z**2 / q0
    return jnp.maximum(s, jnp.finfo(z.dtype).eps)


def estimate_fixed_local(z: jnp.ndarray, S_chol: jnp.ndarray) -> jnp.ndarray:
    """Per-step statistic of `FixedDiffusion` (`diffusions.jl:12-36`):
    ``sigma_t^2 = z^T S^-1 z / d`` with the zero-measurement guard
    (z == 0 -> 0; the S == 0 -> Inf branch surfaces as Inf/NaN and is
    handled by the step-rejection path, cf. `perform_step.jl:151-153`)."""
    from jax.scipy.linalg import solve_triangular

    d = z.shape[-1]
    w = solve_triangular(S_chol, z[..., None], lower=True)[..., 0]
    s = jnp.sum(w * w, axis=-1) / d
    return jnp.where(jnp.all(z == 0, axis=-1), 0.0, s)


def estimate_fixed_mv_local(z: jnp.ndarray, S_chol: jnp.ndarray) -> jnp.ndarray:
    """Per-step statistic of `MVFixedDiffusion` (`diffusions.jl:115-153`):
    ``Sigma_ii = z_i^2 / S_ii`` — EK0 has ``S = S_11 I_d`` (the
    reference's closed form); DiagonalEK1's S is diagonal with
    dimension-dependent entries, read off the factor's row norms."""
    S_ii = jnp.sum(S_chol**2, axis=-1)  # diag(S) from the tril factor
    return z**2 / S_ii


# --------------------------------------------------------------------------
# Running (global) updates for the static models, committed on accept
# --------------------------------------------------------------------------


def fixed_running_update(prev, local, success_count):
    """`FixedDiffusion` running mean (`diffusions.jl:25-35`).

    ``success_count`` is the number of previously accepted steps (the
    reference's ``integ.success_iter``); at 0 the estimate is just the
    local statistic.
    """
    k = jnp.maximum(success_count, 1).astype(local.dtype)
    cand = prev + (local - prev) / k
    return jnp.where(success_count == 0, local, cand)


def map_fixed_running_update(prev, local, success_count, d: int):
    """`MAPFixedDiffusion` (`diffusions.jl:46-68`): InverseGamma(1/2,1/2)
    MAP, updated online by inverting the previous estimate back to a
    residual sum. ``local`` is the per-step residual ``res_t``."""
    alpha, beta = 0.5, 0.5
    N = (success_count + 1).astype(local.dtype)
    first = (beta + 0.5 * local) / (alpha + N * d / 2 + 1)
    res_prev = (prev * (alpha + (N - 1) * d / 2 + 1) - beta) * 2
    res_sum = res_prev + local
    later = (beta + 0.5 * res_sum) / (alpha + N * d / 2 + 1)
    return jnp.where(success_count == 0, first, later)


def running_update(name: str, prev, local, success_count, d: int):
    """Dispatch the global-diffusion candidate for any model."""
    if name in ("dynamic", "dynamicMV"):
        return local  # dynamic: global == local (`diffusions.jl:79,111`)
    if name in ("fixed", "fixedMV"):
        return fixed_running_update(prev, local, success_count)
    if name == "fixedMAP":
        return map_fixed_running_update(prev, local, success_count, d)
    raise ValueError(f"unknown diffusion model {name!r}")
