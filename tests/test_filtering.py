"""Kernel-vs-math unit tests, mirroring `/root/reference/test/filtering.jl`:
square-root kernels compared elementwise against dense textbook formulas on
random systems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odefilters.linalg import Gaussian, tril_factor
from odefilters.ops import filtering


def _random_spd_chol(rng, n):
    M = rng.standard_normal((n, n))
    S = M @ M.T + n * np.eye(n)
    return np.linalg.cholesky(S)


@pytest.fixture
def setup(rng):
    D, d = 10, 5
    m = rng.standard_normal(D)
    L = _random_spd_chol(rng, D)
    A = rng.standard_normal((D, D))
    QL = _random_spd_chol(rng, D)
    H = rng.standard_normal((d, D))
    return m, L, A, QL, H


def test_predict_against_textbook(setup):
    m, L, A, QL, _ = setup
    out = filtering.predict(Gaussian(jnp.asarray(m), jnp.asarray(L)), A, QL)
    np.testing.assert_allclose(out.mean, A @ m, rtol=1e-12)
    P_ref = A @ (L @ L.T) @ A.T + QL @ QL.T
    np.testing.assert_allclose(out.cov, P_ref, rtol=1e-9, atol=1e-9)


def test_update_against_textbook(setup, rng):
    m, L, A, QL, H = setup
    x_pred = Gaussian(jnp.asarray(m), jnp.asarray(L))
    z = H @ m - rng.standard_normal(H.shape[0])
    x_filt, S_chol = filtering.update(x_pred, jnp.asarray(z), jnp.asarray(H))

    P = L @ L.T
    S_ref = H @ P @ H.T
    K_ref = P @ H.T @ np.linalg.inv(S_ref)
    m_ref = m + K_ref @ (0 - z)
    P_ref = (np.eye(len(m)) - K_ref @ H) @ P @ (np.eye(len(m)) - K_ref @ H).T
    np.testing.assert_allclose(S_chol @ S_chol.T, S_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(x_filt.mean, m_ref, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(x_filt.cov, P_ref, rtol=1e-8, atol=1e-9)


def test_smooth_against_textbook(setup, rng):
    m, L, A, QL, _ = setup
    D = len(m)
    m_next = rng.standard_normal(D)
    L_next = _random_spd_chol(rng, D)
    x_curr = Gaussian(jnp.asarray(m), jnp.asarray(L))
    x_next = Gaussian(jnp.asarray(m_next), jnp.asarray(L_next))
    x_s, G = filtering.smooth_step(x_curr, x_next, jnp.asarray(A), jnp.asarray(QL))

    P = L @ L.T
    Q = QL @ QL.T
    P_pred = A @ P @ A.T + Q
    G_ref = P @ A.T @ np.linalg.inv(P_pred)
    m_ref = m + G_ref @ (m_next - A @ m)
    P_next = L_next @ L_next.T
    P_ref = P + G_ref @ (P_next - P_pred) @ G_ref.T
    np.testing.assert_allclose(G, G_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(x_s.mean, m_ref, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(x_s.cov, P_ref, rtol=1e-7, atol=1e-8)


def test_condition_on_exact(rng):
    """After conditioning, H x == data exactly and H-directions have 0 var
    (cf. state-init usage, /root/reference/src/state_initialization.jl:45-53)."""
    D, k = 6, 2
    x = Gaussian(jnp.zeros(D), jnp.eye(D))
    H = jnp.asarray(rng.standard_normal((k, D)))
    data = jnp.asarray(rng.standard_normal(k))
    out = filtering.condition_on(x, H, data)
    np.testing.assert_allclose(H @ out.mean, data, rtol=1e-10, atol=1e-12)
    S = H @ out.cov @ H.T
    np.testing.assert_allclose(S, 0.0, atol=1e-10)


def test_tril_factor_sign_deterministic(rng):
    M = rng.standard_normal((12, 6))
    L = tril_factor(jnp.asarray(M))
    assert np.all(np.diagonal(L) >= 0)
    np.testing.assert_allclose(L @ L.T, M.T @ M, rtol=1e-10, atol=1e-10)


def test_kernels_vmap_and_jit(setup):
    m, L, A, QL, H = setup
    B = 4
    xs = Gaussian(jnp.broadcast_to(m, (B, len(m))), jnp.broadcast_to(L, (B,) + L.shape))
    out = jax.jit(jax.vmap(lambda x: filtering.predict(x, A, QL)))(xs)
    assert out.mean.shape == (B, len(m))
    np.testing.assert_allclose(out.mean[0], A @ m, rtol=1e-12)


def test_update_grad_flows(setup):
    m, L, A, QL, H = setup

    def loss(mm):
        x, _ = filtering.update(
            Gaussian(mm, jnp.asarray(L)), jnp.asarray(H) @ mm, jnp.asarray(H)
        )
        return jnp.sum(x.mean**2)

    g = jax.grad(loss)(jnp.asarray(m))
    assert np.all(np.isfinite(g))


def test_update_broadcasts_leading_batch(setup, rng):
    """update/condition_on must work on explicit leading batch dims (no
    vmap): the PSD solves go through two solve_triangular calls, which
    broadcast — jax.scipy cho_solve does not (CLAUDE.md numerics rules)."""
    m, L, A, QL, H = setup
    B = 3
    ms = np.stack([m + i for i in range(B)])
    Ls = np.broadcast_to(L, (B,) + L.shape)
    zs = np.stack([H @ (m + i) - rng.standard_normal(H.shape[0]) for i in range(B)])
    x_pred = Gaussian(jnp.asarray(ms), jnp.asarray(Ls))
    out, S_chol = filtering.update(x_pred, jnp.asarray(zs), jnp.asarray(H))
    assert out.mean.shape == (B, len(m))
    assert S_chol.shape == (B, H.shape[0], H.shape[0])
    for i in range(B):
        ref, S_ref = filtering.update(
            Gaussian(jnp.asarray(ms[i]), jnp.asarray(L)),
            jnp.asarray(zs[i]), jnp.asarray(H),
        )
        np.testing.assert_allclose(out.mean[i], ref.mean, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(out.chol[i], ref.chol, rtol=1e-12, atol=1e-12)

    data = jnp.asarray(zs)
    out2 = filtering.condition_on(x_pred, jnp.asarray(H), data)
    for i in range(B):
        ref2 = filtering.condition_on(
            Gaussian(jnp.asarray(ms[i]), jnp.asarray(L)), jnp.asarray(H), data[i]
        )
        np.testing.assert_allclose(out2.mean[i], ref2.mean, rtol=1e-12, atol=1e-12)
