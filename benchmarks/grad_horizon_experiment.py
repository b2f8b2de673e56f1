"""f32 likelihood-gradient horizon experiment (VERDICT r2 item 8).

Round-2 finding: f32 gradients of the fused filter's accumulated
log-likelihood are only accurate over tens of steps — adjoint
intermediates reach 1e9-1e18 with massive cancellation; the XLA f32 path
is equally wrong, so it is a property of the f32 filter adjoint.

Round-3 hypothesis (tested here): the amplification enters through the
DYNAMIC-DIFFUSION calibration ``s2 = |z|^2 / (d hq)``. The innovations z
sit at the solver-accuracy floor, so reverse-mode tangents through
``1/s2``-scaled quantities amplify f32 forward noise unboundedly with
horizon — exactly the same mechanism as the adaptive controller's
EEst-tangent poison fixed in round 2 (solve.py:228-235). Treating the
per-step calibration as part of the (frozen) model —
``stop_gradient(s2)`` — is the estimator the static/Fenrir path already
uses for its global sigma^2, and should keep the adjoint bounded.

This script measures, on a pure-jnp scan replica of the fused EK0 filter
(CPU, so f32 vs f64 is the only variable):

  grad error(T) = rel. error of d(sum ll)/d(params) in f32 vs f64,
  for the full gradient AND the stop_gradient(s2) estimator,
  T in {20, 60, 150, 500}.

plus the same comparison for d/d(u0). Writes
benchmarks/grad_horizon.json. If the hypothesis holds (stop-grad
gradient stays ~1e-4..1e-3 at T=500 where the full gradient is O(1)
wrong), the kernels expose it as ``calib_grad=False``.
"""

import os as _os
import sys as _sys

# runnable as `python benchmarks/<script>.py` from anywhere: the repo
# root (odefilters package) goes on sys.path ahead of the script dir
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import odefilters as odf  # noqa: E402
from odefilters.ops.pallas_kernels import _ek0_consts  # noqa: E402


def filter_ll(f, m0, C0, p, t0, dt, T, q, d, dtype, stop_calib):
    """Pure-jnp replica of the fused EK0(dynamic) filter recursion."""
    At, Qt, pinv0, pinv1, _ = _ek0_consts(q, dt, np.dtype(dtype))
    At = jnp.asarray(At, dtype)
    Qt = jnp.asarray(Qt, dtype)
    hq = pinv1 * pinv1 * Qt[1, 1]

    def step(carry, k):
        m, C, ll = carry
        t_new = jnp.asarray(t0, dtype) + dt * (k.astype(dtype) + 1.0)
        mp = At @ m                              # (q+1, d)
        u_pred = pinv0 * mp[0]
        du = f(u_pred, p, t_new)
        z = pinv1 * mp[1] - du
        zz = jnp.sum(z * z)
        s2 = zz / (d * hq)
        if stop_calib:
            s2 = jax.lax.stop_gradient(s2)
        Cp = At @ C @ At.T + s2 * Qt
        s = pinv1 * pinv1 * Cp[1, 1]
        kg = pinv1 * Cp[:, 1] / s
        m_new = mp - kg[:, None] * z[None, :]
        C_new = Cp - jnp.outer(kg, kg) * s
        ll_inc = -0.5 * (
            zz / s
            + d * (jnp.log(jnp.maximum(s, 1e-30)) + float(np.log(2 * np.pi)))
        )
        return (m_new, C_new, ll + ll_inc), None

    (m, C, ll), _ = jax.lax.scan(
        step, (m0, C0, jnp.zeros((), dtype)), jnp.arange(T)
    )
    return ll


def filter_ll_steps(f, m0, C0, p, t0, dt, T, q, d, dtype, stop_calib):
    """Per-step ll increments (T,) — same recursion as `filter_ll` but
    emitting each step's contribution, for the accumulation-attribution
    test (round 5)."""
    At, Qt, pinv0, pinv1, _ = _ek0_consts(q, dt, np.dtype(dtype))
    At = jnp.asarray(At, dtype)
    Qt = jnp.asarray(Qt, dtype)
    hq = pinv1 * pinv1 * Qt[1, 1]

    def step(carry, k):
        m, C = carry
        t_new = jnp.asarray(t0, dtype) + dt * (k.astype(dtype) + 1.0)
        mp = At @ m
        u_pred = pinv0 * mp[0]
        du = f(u_pred, p, t_new)
        z = pinv1 * mp[1] - du
        zz = jnp.sum(z * z)
        s2 = zz / (d * hq)
        if stop_calib:
            s2 = jax.lax.stop_gradient(s2)
        Cp = At @ C @ At.T + s2 * Qt
        s = pinv1 * pinv1 * Cp[1, 1]
        kg = pinv1 * Cp[:, 1] / s
        m_new = mp - kg[:, None] * z[None, :]
        C_new = Cp - jnp.outer(kg, kg) * s
        ll_inc = -0.5 * (
            zz / s
            + d * (jnp.log(jnp.maximum(s, 1e-30)) + float(np.log(2 * np.pi)))
        )
        return (m_new, C_new), ll_inc

    _, lls = jax.lax.scan(step, (m0, C0), jnp.arange(T))
    return lls


def filter_data_ll(f, m0, C0, p, t0, dt, T, q, d, dtype, stop_calib,
                   obs_every, ys, r2):
    """Replica with noisy data updates every ``obs_every`` steps: the
    data-likelihood objective (datalik kernel semantics)."""
    At, Qt, pinv0, pinv1, _ = _ek0_consts(q, dt, np.dtype(dtype))
    At = jnp.asarray(At, dtype)
    Qt = jnp.asarray(Qt, dtype)
    hq = pinv1 * pinv1 * Qt[1, 1]
    ys = jnp.asarray(ys, dtype)

    def step(carry, k):
        m, C, dll = carry
        t_new = jnp.asarray(t0, dtype) + dt * (k.astype(dtype) + 1.0)
        mp = At @ m
        u_pred = pinv0 * mp[0]
        du = f(u_pred, p, t_new)
        z = pinv1 * mp[1] - du
        zz = jnp.sum(z * z)
        s2 = zz / (d * hq)
        if stop_calib:
            s2 = jax.lax.stop_gradient(s2)
        Cp = At @ C @ At.T + s2 * Qt
        s = pinv1 * pinv1 * Cp[1, 1]
        kg = pinv1 * Cp[:, 1] / s
        m_new = mp - kg[:, None] * z[None, :]
        C_new = Cp - jnp.outer(kg, kg) * s
        # masked data update on observation rows
        has = (k + 1) % obs_every == 0
        yk = ys[(k + 1) // obs_every - 1]
        zd = yk - pinv0 * m_new[0]
        sd = pinv0 * pinv0 * C_new[0, 0] + jnp.asarray(r2, dtype)
        kd = pinv0 * C_new[:, 0] / sd
        m_upd = m_new + kd[:, None] * zd[None, :]
        C_upd = C_new - jnp.outer(kd, kd) * sd
        dll_inc = -0.5 * (
            jnp.sum(zd * zd) / sd
            + d * (jnp.log(sd) + float(np.log(2 * np.pi)))
        )
        m_out = jnp.where(has, m_upd, m_new)
        C_out = jnp.where(has, C_upd, C_new)
        return (m_out, C_out, dll + jnp.where(has, dll_inc, 0.0)), None

    (m, C, dll), _ = jax.lax.scan(
        step, (m0, C0, jnp.zeros((), dtype)), jnp.arange(T)
    )
    return dll


def main():
    from odefilters.taylor import taylor_coefficients

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 20.0))
    q, d = 3, 2
    out = {"config": "FHN EK0(3), dt = 20/500, d(sum ll)/d(p) f32 vs f64"}
    rows = []
    for T in (20, 60, 150, 500):
        dt = 20.0 / 500
        res = {"T": T}
        for stop_calib in (False, True):
            grads = {}
            for dtype in (jnp.float64, jnp.float32):
                p = jnp.asarray(prob.p, dtype)
                u0 = prob.u0.astype(dtype)
                m0 = jnp.stack(
                    taylor_coefficients(prob.f, u0, p, 0.0, q)
                ).astype(dtype)
                # preconditioned init
                j = np.arange(q + 1, dtype=np.float64)
                pvec = jnp.asarray(dt ** (j - q - 0.5), dtype)
                m0p = pvec[:, None] * m0
                C0 = jnp.zeros((q + 1, q + 1), dtype)

                def loss(p_):
                    return filter_ll(
                        prob.f, m0p, C0, p_, 0.0, jnp.asarray(dt, dtype),
                        T, q, d, dtype, stop_calib,
                    )

                grads[str(np.dtype(dtype))] = np.asarray(
                    jax.grad(loss)(p), np.float64
                )
            g64, g32 = grads["float64"], grads["float32"]
            rel = float(
                np.abs(g32 - g64).max() / max(np.abs(g64).max(), 1e-30)
            )
            key = "stopgrad_calib" if stop_calib else "full"
            res[f"rel_err_{key}"] = rel
            res[f"grad64_norm_{key}"] = float(np.abs(g64).max())
        # --- the realistic objective: DATA likelihood over the horizon ---
        # observations every 25 steps from a perturbed trajectory; its
        # innovations are O(noise std), not at the f32 floor
        obs_every = 25
        n_obs = T // obs_every
        if n_obs >= 1:
            from scipy.integrate import solve_ivp

            p64 = np.asarray(prob.p, np.float64)

            def rhs(t, y):
                v, w = y
                a, b, tinv, iz = p64
                return [v - v**3 / 3 - w + iz, tinv * (v + a - b * w)]

            ts_o = (np.arange(1, n_obs + 1) * obs_every) * dt
            tr = solve_ivp(
                rhs, (0.0, float(ts_o[-1])),
                np.asarray(prob.u0, np.float64), t_eval=ts_o,
                rtol=1e-12, atol=1e-12, method="LSODA",
            ).y.T
            rng = np.random.default_rng(0)
            ys = tr + 0.05 * rng.standard_normal(tr.shape)
            for stop_calib in (False, True):
                grads = {}
                for dtype in (jnp.float64, jnp.float32):
                    p = jnp.asarray(prob.p, dtype)
                    u0 = prob.u0.astype(dtype)
                    m0 = jnp.stack(
                        taylor_coefficients(prob.f, u0, p, 0.0, q)
                    ).astype(dtype)
                    j = np.arange(q + 1, dtype=np.float64)
                    pvec = jnp.asarray(dt ** (j - q - 0.5), dtype)
                    m0p = pvec[:, None] * m0
                    C0 = jnp.zeros((q + 1, q + 1), dtype)

                    def dloss(p_):
                        return filter_data_ll(
                            prob.f, m0p, C0, p_, 0.0,
                            jnp.asarray(dt, dtype), T, q, d, dtype,
                            stop_calib, obs_every, ys, 0.05**2,
                        )

                    grads[str(np.dtype(dtype))] = np.asarray(
                        jax.grad(dloss)(p), np.float64
                    )
                g64, g32 = grads["float64"], grads["float32"]
                rel = float(
                    np.abs(g32 - g64).max() / max(np.abs(g64).max(), 1e-30)
                )
                key = "stopgrad_calib" if stop_calib else "full"
                res[f"data_rel_err_{key}"] = rel
                res[f"data_grad64_norm_{key}"] = float(np.abs(g64).max())
        rows.append(res)
        print(res, flush=True)
    out["sweep"] = rows

    # ------------------------------------------------------------------
    # Round-5 attribution (VERDICT task 5): is the residual-ll stop-calib
    # gradient's ~0.3 relative error at depth ACCUMULATION error (fixable
    # by Kahan/two-float sums in the backward kernels) or FORWARD-NOISE
    # error (the f32 innovations sit at the solver-accuracy floor, so the
    # f32 objective itself differs)? Decisive bound: compute each step's
    # gradient piece separately in f32 and sum the pieces in f64 — the
    # best result ANY compensated accumulation of the backward could
    # achieve. If that sum still carries the ~0.3 error, accumulation is
    # exonerated and the error is in the per-step f32 pieces themselves.
    # ------------------------------------------------------------------
    T = 500
    dt = 20.0 / 500
    attrib = {"T": T}
    piece = {}
    for dtype in (jnp.float64, jnp.float32):
        p = jnp.asarray(prob.p, dtype)
        u0 = prob.u0.astype(dtype)
        m0 = jnp.stack(taylor_coefficients(prob.f, u0, p, 0.0, q)).astype(dtype)
        j = np.arange(q + 1, dtype=np.float64)
        pvec = jnp.asarray(dt ** (j - q - 0.5), dtype)
        m0p = pvec[:, None] * m0
        C0 = jnp.zeros((q + 1, q + 1), dtype)

        def lls_of_p(p_):
            return filter_ll_steps(
                prob.f, m0p, C0, p_, 0.0, jnp.asarray(dt, dtype),
                T, q, d, dtype, True,
            )

        # (T, n_params) per-step gradient pieces: T one-hot VJPs
        Jp = np.asarray(jax.jacrev(lls_of_p)(p), np.float64)
        piece[str(np.dtype(dtype))] = Jp
    g64 = piece["float64"].sum(axis=0)
    g32_f64sum = piece["float32"].sum(axis=0)          # exact f64 summation
    # per-step piece error (forward-noise content, no accumulation at all)
    piece_rel = float(
        np.abs(piece["float32"] - piece["float64"]).max()
        / max(np.abs(piece["float64"]).max(), 1e-30)
    )
    attrib["rel_err_f32_pieces_f64_sum"] = float(
        np.abs(g32_f64sum - g64).max() / max(np.abs(g64).max(), 1e-30)
    )
    attrib["rel_err_worst_single_piece"] = piece_rel
    attrib["conclusion"] = (
        "accumulation-exonerated: with the summation done in EXACT f64 "
        "arithmetic (the ceiling for any Kahan/two-float backward) the "
        "error is unchanged. The per-step f32 pieces are individually "
        "percent-level wrong (innovations at the solver-accuracy floor) "
        "and the true pieces cancel heavily in the sum, so uncancelled "
        "piece error dominates — forward noise + cancellation, not "
        "summation roundoff; no compensated accumulation can recover "
        "it. Long-horizon inference uses the data likelihood "
        "(calib_grad=False)"
        if attrib["rel_err_f32_pieces_f64_sum"] > 1e-2 else
        "accumulation-dominated: f64 summation of f32 pieces fixes the "
        "gradient — compensated accumulation in the backward kernels "
        "would recover it"
    )
    out["attribution"] = attrib
    print(attrib, flush=True)
    with open("benchmarks/grad_horizon.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote benchmarks/grad_horizon.json")


if __name__ == "__main__":
    main()
