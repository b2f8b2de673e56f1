"""Time-parallel associative-scan filtering/smoothing and ensemble
sharding tests (the reference has no parallel subsystem to mirror;
SURVEY.md §2 'Parallelism & communication' defines the requirements)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import odefilters as odf
from odefilters.parallel.associative import (
    parallel_filter,
    parallel_smoother,
    solve_fixed_parallel,
)


def _sequential_kf(m0, P0, F, Q, H, y):
    ms, Ps = [], []
    m, P = np.asarray(m0), np.asarray(P0)
    for k in range(y.shape[0]):
        m = F @ m
        P = F @ P @ F.T + Q
        S = H[k] @ P @ H[k].T
        K = P @ H[k].T @ np.linalg.inv(S)
        m = m + K @ (y[k] - H[k] @ m)
        P = P - K @ S @ K.T
        ms.append(m.copy())
        Ps.append(P.copy())
    return np.array(ms), np.array(Ps)


def test_parallel_filter_matches_sequential_kf(rng):
    D, d, N = 4, 2, 16
    F = rng.standard_normal((D, D)) * 0.4 + np.eye(D) * 0.5
    Q = (lambda M: M @ M.T + 0.1 * np.eye(D))(rng.standard_normal((D, D)) * 0.3)
    H = rng.standard_normal((N, d, D))
    y = rng.standard_normal((N, d))
    m0 = rng.standard_normal(D)
    P0 = (lambda M: M @ M.T)(rng.standard_normal((D, D)) * 0.2)

    ms_ref, Ps_ref = _sequential_kf(m0, P0, F, Q, H, y)
    ms, Ps = parallel_filter(
        jnp.asarray(m0), jnp.asarray(P0), jnp.asarray(F), jnp.asarray(Q),
        jnp.asarray(H), jnp.asarray(y),
    )
    np.testing.assert_allclose(ms, ms_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Ps, Ps_ref, rtol=1e-9, atol=1e-11)

    # sequential RTS reference
    ms_all = np.concatenate([m0[None], ms_ref])
    Ps_all = np.concatenate([P0[None], Ps_ref])
    ms_s, Ps_s = ms_all.copy(), Ps_all.copy()
    for k in range(N - 1, -1, -1):
        Pp = F @ Ps_all[k] @ F.T + Q
        G = Ps_all[k] @ F.T @ np.linalg.inv(Pp)
        ms_s[k] = ms_all[k] + G @ (ms_s[k + 1] - F @ ms_all[k])
        Ps_s[k] = Ps_all[k] + G @ (Ps_s[k + 1] - Pp) @ G.T

    msp, Psp = parallel_smoother(
        jnp.concatenate([jnp.asarray(m0)[None], ms]),
        jnp.concatenate([jnp.asarray(P0)[None], Ps]),
        jnp.asarray(F), jnp.asarray(Q),
    )
    np.testing.assert_allclose(msp, ms_s, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(Psp, Ps_s, rtol=1e-9, atol=1e-11)


def test_parallel_ek1_matches_sequential(rng):
    """Converged parallel IEKS == sequential EK1(fixed) on a fixed grid."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    sd = odf.solve_fixed(prob, odf.EK1(order=3, diffusionmodel="fixed"), dt=0.04)
    u, u_std, _, _, s2 = solve_fixed_parallel(
        prob, odf.EK1(order=3), dt=0.04, iterations=8
    )
    n = int(sd.n_steps)
    np.testing.assert_allclose(u, sd.u[: n + 1], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(u_std, sd.pu.std[: n + 1], rtol=1e-3, atol=1e-8)
    np.testing.assert_allclose(float(s2), float(sd.diffusions[n]), rtol=0.05)


def test_parallel_ek0_converges(rng):
    """EK0 defaults to a coarse-grid warm start, so a handful of sweeps
    converges (cold-start Picard iteration needs ~25)."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    sd = odf.solve_fixed(prob, odf.EK0(order=2, diffusionmodel="fixed"), dt=0.02)
    u, *_ = solve_fixed_parallel(prob, odf.EK0(order=2), dt=0.02, iterations=6)
    n = int(sd.n_steps)
    np.testing.assert_allclose(u, sd.u[: n + 1], rtol=1e-4, atol=1e-5)


def test_ensemble_sharded_over_mesh(rng):
    """8-virtual-device mesh: ensemble sharded over 'ens', results match the
    unsharded vmap bit-for-bit."""
    from odefilters.parallel.sharding import ensemble_mesh, solve_ensemble

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 0.5))
    assert len(jax.devices()) == 8
    mesh = ensemble_mesh(8)
    B = 16
    u0s = jnp.asarray(
        prob.u0 + 0.05 * rng.standard_normal((B, 2)), dtype=jnp.float64
    )
    ps = jnp.broadcast_to(prob.p, (B, 4))
    ts = jnp.linspace(0.0, 0.5, 17)
    alg = odf.EK1(order=2)
    sol_sharded = solve_ensemble(prob, alg, u0s, ps, ts=ts, mesh=mesh)
    sol_local = solve_ensemble(prob, alg, u0s, ps, ts=ts)
    np.testing.assert_allclose(sol_sharded.u, sol_local.u, rtol=1e-12)
    assert sol_sharded.u.shape == (B, 17, 2)
    # each member actually solved (finite + distinct)
    assert np.all(np.isfinite(np.asarray(sol_sharded.u)))
    assert np.std(np.asarray(sol_sharded.u[:, -1, 0])) > 0


def test_kron_matches_dense():
    """EK0 Kronecker fast path == dense path to roundoff."""
    from odefilters.kronsolve import solve_fixed_kron

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    sk = solve_fixed_kron(prob, odf.EK0(order=3), dt=0.05)
    sd = odf.solve_fixed(prob, odf.EK0(order=3), dt=0.05)
    np.testing.assert_allclose(sk.u, sd.u, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(sk.u_std, sd.pu.std, rtol=1e-8, atol=1e-12)


@pytest.mark.parametrize("diffusion", ["fixed", "fixedMV", "dynamicMV"])
def test_kron_diffusion_variants_match_dense(diffusion):
    """Kron fast path matches the dense path for MV/static diffusions too
    (per-dim factor promotion + per-dim smoothing)."""
    from odefilters.kronsolve import solve_fixed_kron

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    alg = odf.EK0(order=2, diffusionmodel=diffusion)
    sk = solve_fixed_kron(prob, alg, dt=0.05)
    sd = odf.solve_fixed(prob, alg, dt=0.05)
    np.testing.assert_allclose(sk.u, sd.u, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(sk.u_std, sd.pu.std, rtol=1e-7, atol=1e-11)


def test_time_sharded_associative_filter(rng):
    """The associative-scan filter runs with its *time axis* sharded over
    the device mesh (the sequence-parallelism analogue, SURVEY.md §5):
    XLA inserts the log-depth collectives, results match exactly."""
    from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

    D, d, N = 4, 2, 64
    F = jnp.asarray(rng.standard_normal((D, D)) * 0.4 + np.eye(D) * 0.5)
    Q = jnp.asarray(
        (lambda M: M @ M.T + 0.1 * np.eye(D))(rng.standard_normal((D, D)) * 0.3)
    )
    H = jnp.asarray(rng.standard_normal((N, d, D)))
    y = jnp.asarray(rng.standard_normal((N, d)))
    m0 = jnp.asarray(rng.standard_normal(D))
    P0 = jnp.zeros((D, D))

    mesh = Mesh(np.asarray(jax.devices()), ("time",), axis_types=(AxisType.Auto,))
    sh = NamedSharding(mesh, P("time"))
    ref_m, ref_P = jax.jit(parallel_filter)(m0, P0, F, Q, H, y)
    out_m, out_P = jax.jit(parallel_filter)(
        m0, P0, F, Q, jax.device_put(H, sh), jax.device_put(y, sh)
    )
    np.testing.assert_allclose(out_m, ref_m, rtol=1e-12)
    np.testing.assert_allclose(out_P, ref_P, rtol=1e-12)
    assert "time" in str(out_m.sharding)


def test_sqrt_parallel_matches_covariance_form(rng):
    """Square-root associative elements (Woodbury + stacked-QR combine)
    reproduce the covariance-form parallel filter/smoother exactly."""
    from odefilters.parallel.associative_sqrt import (
        parallel_filter_sqrt,
        parallel_smoother_sqrt,
    )

    D, d, N = 4, 2, 24
    F = jnp.asarray(rng.standard_normal((D, D)) * 0.4 + np.eye(D) * 0.5)
    QLn = np.linalg.cholesky(
        (lambda M: M @ M.T + 0.1 * np.eye(D))(rng.standard_normal((D, D)) * 0.3)
    )
    H = jnp.asarray(rng.standard_normal((N, d, D)))
    y = jnp.asarray(rng.standard_normal((N, d)))
    m0 = jnp.asarray(rng.standard_normal(D))
    U0n = np.linalg.cholesky(
        (lambda M: M @ M.T + 0.05 * np.eye(D))(rng.standard_normal((D, D)) * 0.2)
    )
    Q = jnp.asarray(QLn @ QLn.T)
    P0 = jnp.asarray(U0n @ U0n.T)

    ms_ref, Ps_ref = parallel_filter(m0, P0, F, Q, H, y)
    ms, Us = parallel_filter_sqrt(m0, jnp.asarray(U0n), F, jnp.asarray(QLn), H, y)
    np.testing.assert_allclose(ms, ms_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        Us @ jnp.swapaxes(Us, -1, -2), Ps_ref, rtol=1e-9, atol=1e-12
    )

    gs_ref, Ls_ref = parallel_smoother(
        jnp.concatenate([m0[None], ms_ref]),
        jnp.concatenate([P0[None], Ps_ref]), F, Q,
    )
    gs, Ps = parallel_smoother_sqrt(
        jnp.concatenate([m0[None], ms]),
        jnp.concatenate([jnp.asarray(U0n)[None], Us]), F, jnp.asarray(QLn),
    )
    np.testing.assert_allclose(gs, gs_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(
        Ps @ jnp.swapaxes(Ps, -1, -2), Ls_ref, rtol=1e-9, atol=1e-12
    )


def test_sqrt_parallel_solver_end_to_end():
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    u_c, s_c, *_ = solve_fixed_parallel(prob, odf.EK1(order=3), dt=0.04, iterations=8)
    u_s, s_s, *_ = solve_fixed_parallel(
        prob, odf.EK1(order=3), dt=0.04, iterations=8, sqrt_form=True
    )
    np.testing.assert_allclose(u_s, u_c, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(s_s, s_c, rtol=1e-6, atol=1e-12)


def test_adaptive_kron_matches_dense():
    """Adaptive driver on the Kronecker fast path: same accepted-step
    sequence and posterior as the dense adaptive solver."""
    from odefilters.kronsolve import solve_adaptive_kron

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    sk = solve_adaptive_kron(prob, odf.EK0(order=3), abstol=1e-8, reltol=1e-6)
    sd = odf.solve(prob, odf.EK0(order=3), abstol=1e-8, reltol=1e-6)
    assert int(sk.n_steps) == int(sd.n_steps)
    n = int(sk.n_steps)
    np.testing.assert_allclose(sk.ts[: n + 1], sd.ts[: n + 1], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(sk.u[: n + 1], sd.u[: n + 1], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        sk.u_std[: n + 1], sd.pu.std[: n + 1], rtol=1e-7, atol=1e-12
    )
    # dense output agrees too
    tq = jnp.asarray([0.33, 1.71])
    um, us = sk(tq)
    g = sd(tq)
    np.testing.assert_allclose(um, g.mean, rtol=1e-7, atol=1e-9)


def test_kron_sampling_calibrated():
    from odefilters import kronsolve

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    sol = kronsolve.solve_fixed_kron(prob, odf.EK0(order=3), dt=0.05)
    samp = kronsolve.sample(jax.random.PRNGKey(0), sol, 40)
    n = int(sol.n_steps)
    s = np.asarray(samp[: n + 1])
    mean = np.asarray(sol.u[: n + 1])[..., None]
    std = np.asarray(sol.u_std[: n + 1])[..., None]
    viol = (np.abs(s - mean) > 3 * std + 1e-12)[1:].mean()
    assert viol < 0.05
    assert np.isfinite(s).all()


def test_adaptive_ensemble_vmapped_while_loop(rng):
    """Batched adaptive solves: vmapped while_loop, per-member step counts,
    each member identical to its single solve."""
    from odefilters.parallel.sharding import solve_ensemble_adaptive

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    B = 4
    u0s = jnp.asarray(prob.u0 + 0.05 * rng.standard_normal((B, 2)))
    ps = jnp.broadcast_to(prob.p, (B, 4))
    sols = solve_ensemble_adaptive(
        prob, odf.EK1(order=3), u0s, ps, abstol=1e-8, reltol=1e-6,
        max_steps=256,
    )
    assert np.all(np.asarray(sols.retcode) == 0)
    s0 = odf.solve(
        odf.remake(prob, u0=u0s[0]), odf.EK1(order=3),
        abstol=1e-8, reltol=1e-6, max_steps=256,
    )
    n = int(s0.n_steps)
    assert int(sols.n_steps[0]) == n
    np.testing.assert_allclose(
        sols.u[0, : n + 1], s0.u[: n + 1], rtol=1e-7, atol=1e-9
    )


def test_2d_ensemble_time_mesh_sqrt_filter(rng):
    """2-D (ensemble x time) mesh: the vmapped square-root parallel filter
    runs with both axes sharded, results exact, sharding preserved."""
    from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

    from odefilters.parallel.associative_sqrt import parallel_filter_sqrt

    D, d, N, B = 4, 2, 32, 4
    F = jnp.asarray(rng.standard_normal((D, D)) * 0.4 + np.eye(D) * 0.5)
    QL = jnp.asarray(
        np.linalg.cholesky(
            (lambda M: M @ M.T + 0.1 * np.eye(D))(rng.standard_normal((D, D)) * 0.3)
        )
    )
    H = jnp.asarray(rng.standard_normal((B, N, d, D)))
    y = jnp.asarray(rng.standard_normal((B, N, d)))
    m0 = jnp.asarray(rng.standard_normal((B, D)))
    U0 = jnp.zeros((B, D, D))

    fn = jax.jit(jax.vmap(lambda m, U, Hb, yb: parallel_filter_sqrt(m, U, F, QL, Hb, yb)))
    ref_m, ref_U = fn(m0, U0, H, y)

    mesh = Mesh(
        np.asarray(jax.devices()).reshape(4, 2), ("ens", "time"),
        axis_types=(AxisType.Auto, AxisType.Auto),
    )
    shHy = NamedSharding(mesh, P("ens", "time"))
    sh0 = NamedSharding(mesh, P("ens"))
    out_m, out_U = fn(
        jax.device_put(m0, sh0), jax.device_put(U0, sh0),
        jax.device_put(H, shHy), jax.device_put(y, shHy),
    )
    np.testing.assert_allclose(out_m, ref_m, rtol=1e-12, atol=1e-14)
    # atol one notch above eps-scale: the unrolled-MGS combines fuse
    # differently per shard, so sharded vs unsharded reassociates
    # near-zero factor entries at the 1e-14 level (means stay bit-level)
    np.testing.assert_allclose(out_U, ref_U, rtol=1e-12, atol=1e-13)
    assert "ens" in str(out_m.sharding) and "time" in str(out_m.sharding)


def test_time_sharded_parallel_solve_matches_unsharded():
    """solve_fixed_parallel with the element time axis pinned to a mesh
    axis (time_shard_axis) matches the unsharded solve bit-for-bit."""
    import numpy as np_
    from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    ts = jnp.linspace(0.0, 1.0, 33)
    mesh = Mesh(
        np_.asarray(jax.devices()[:4]).reshape(4), ("time",),
        axis_types=(AxisType.Auto,),
    )
    u_ref, ustd_ref, *_ = solve_fixed_parallel(
        prob, odf.EK1(order=2), ts=ts, iterations=3
    )
    with jax.sharding.set_mesh(mesh):
        u_sh, ustd_sh, *_ = jax.jit(
            lambda: solve_fixed_parallel(
                prob, odf.EK1(order=2), ts=ts, iterations=3,
                time_shard_axis="time",
            )[:2]
        )()
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(ustd_sh), np.asarray(ustd_ref), rtol=1e-9, atol=1e-12)


# --------------------------------------------------------------------------
# Multi-chip execution of the fused Pallas kernels: the flagship ensemble
# path sharded over the device mesh via shard_map (zero collectives in the
# hot loop; each shard runs the unmodified kernel on its ensemble slice).
# --------------------------------------------------------------------------


def _pallas_ens_mesh():
    from jax.sharding import AxisType, Mesh

    return Mesh(
        np.asarray(jax.devices()), ("ens",), axis_types=(AxisType.Auto,)
    )


def test_pallas_fused_filter_sharded_bitexact():
    """ek0_fused_filter (the flagship fused path) over an 8-device mesh
    (interpret mode) is bit-identical to the single-device kernel."""
    from jax.experimental.pallas import tpu as pltpu

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    B, T = 8 * pk.BLOCK, 8
    key = jax.random.PRNGKey(3)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    mesh = _pallas_ens_mesh()
    with pltpu.force_tpu_interpret_mode():
        us_sh, std_sh, ll_sh = pk.solve_ensemble_ek0_pallas(
            prob.f, u0s, ps, prob.tspan, T, q=2, mesh=mesh
        )
        us, std, ll = pk.solve_ensemble_ek0_pallas(
            prob.f, u0s, ps, prob.tspan, T, q=2
        )
    assert "ens" in str(us_sh.sharding)
    np.testing.assert_array_equal(np.asarray(us_sh), np.asarray(us))
    np.testing.assert_array_equal(np.asarray(std_sh), np.asarray(std))
    np.testing.assert_array_equal(np.asarray(ll_sh), np.asarray(ll))


def test_pallas_fused_smooth_sharded_bitexact():
    """The filter+smoother pair through the shard_map entry point (1-device
    mesh: the interpret-mode DMA emulation deadlocks when the
    state-STREAMING kernels run concurrently on several virtual devices —
    on hardware each chip has its own DMA engines; the multi-device
    validation of the sharded fused path is the filter/adaptive/datalik
    tests above, which stream nothing)."""
    from jax.experimental.pallas import tpu as pltpu

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    B, T = pk.BLOCK, 8
    key = jax.random.PRNGKey(3)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    from jax.sharding import AxisType, Mesh

    mesh1 = Mesh(
        np.asarray(jax.devices()[:1]), ("ens",), axis_types=(AxisType.Auto,)
    )
    with pltpu.force_tpu_interpret_mode():
        us_sh, std_sh = pk.solve_ensemble_ek0_pallas_smooth(
            prob.f, u0s, ps, prob.tspan, T, q=2, mesh=mesh1
        )
        us, std = pk.solve_ensemble_ek0_pallas_smooth(
            prob.f, u0s, ps, prob.tspan, T, q=2
        )
    np.testing.assert_array_equal(np.asarray(us_sh), np.asarray(us))
    np.testing.assert_array_equal(np.asarray(std_sh), np.asarray(std))


def test_pallas_adaptive_sharded_bitexact():
    """Per-lane-dt adaptive EK0 ensemble kernel sharded over the mesh."""
    from jax.experimental.pallas import tpu as pltpu

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 0.5))
    B = 8 * pk.BLOCK
    key = jax.random.PRNGKey(4)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    mesh = _pallas_ens_mesh()
    kw = dict(n_save=4, q=2, abstol=1e-4, reltol=1e-2, max_iters=4000)
    with pltpu.force_tpu_interpret_mode():
        out_sh = pk.solve_ensemble_ek0_adaptive_pallas(
            prob.f, u0s, ps, prob.tspan, mesh=mesh, **kw
        )
        out = pk.solve_ensemble_ek0_adaptive_pallas(
            prob.f, u0s, ps, prob.tspan, **kw
        )
    assert not np.any(np.asarray(out_sh[5]))  # no failed lanes
    for a_sh, a in zip(out_sh, out):
        np.testing.assert_array_equal(np.asarray(a_sh), np.asarray(a))
    # DiagonalEK1 adaptive kernel: same mesh, same bit-exactness contract
    with pltpu.force_tpu_interpret_mode():
        outd_sh = pk.solve_ensemble_ek1d_adaptive_pallas(
            prob.f, None, u0s, ps, prob.tspan, mesh=mesh, **kw
        )
        outd = pk.solve_ensemble_ek1d_adaptive_pallas(
            prob.f, None, u0s, ps, prob.tspan, **kw
        )
    assert not np.any(np.asarray(outd_sh[5]))
    for a_sh, a in zip(outd_sh, outd):
        np.testing.assert_array_equal(np.asarray(a_sh), np.asarray(a))


def test_pallas_datalik_sharded_bitexact_and_grad():
    """Fused data-likelihood kernel sharded over the mesh: forward values
    bit-identical on the full 8-device mesh; gradients (through the
    custom VJP, whose forward pass STREAMS states — 1-device mesh, see
    the DMA-emulation caveat in `_shard_over_ens`) match unsharded, with
    the replicated observations' cotangent psummed across shards."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import AxisType, Mesh

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    B, T = 8 * pk.BLOCK, 8
    key = jax.random.PRNGKey(5)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    ts_data = np.array([0.25, 0.625, 1.0])
    ys = jnp.asarray(
        0.5 + 0.1 * jax.random.normal(key, (3, 2)), dtype=jnp.float32
    )
    mesh = _pallas_ens_mesh()

    def loss(u0s_, ps_, ys_, mesh_):
        dll, oll = pk.ensemble_data_loglik_pallas(
            prob.f, u0s_, ps_, prob.tspan, T, ts_data, ys_, 0.1, q=2,
            mesh=mesh_,
        )
        return jnp.sum(dll), (dll, oll)

    with pltpu.force_tpu_interpret_mode():
        # forward: full 8-device mesh
        _, (dll_sh, oll_sh) = loss(u0s, ps, ys, mesh)
        _, (dll, oll) = loss(u0s, ps, ys, None)
    np.testing.assert_array_equal(np.asarray(dll_sh), np.asarray(dll))
    np.testing.assert_array_equal(np.asarray(oll_sh), np.asarray(oll))

    # gradient: the custom-VJP forward streams state rows -> 1-device mesh
    B1 = pk.BLOCK
    mesh1 = Mesh(
        np.asarray(jax.devices()[:1]), ("ens",), axis_types=(AxisType.Auto,)
    )
    with pltpu.force_tpu_interpret_mode():
        _, g_sh = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(
            u0s[:B1], ps[:B1], ys, mesh1
        )
        _, g = jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True)(
            u0s[:B1], ps[:B1], ys, None
        )
    for gs, gl in zip(g_sh, g):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gl), rtol=1e-6, atol=1e-8
        )


def test_pallas_streaming_kernels_8shard_sequential_bitexact():
    """8-shard validation of the STREAMING kernels (smoother pair and
    sampler), which cannot run concurrently on >1 interpret-mode virtual
    device (DMA-emulation deadlock — `_shard_over_ens` docstring). What
    shard_map does on hardware is exactly: slice the batch axis into
    per-device blocks, run the unmodified kernel per shard with zero
    hot-loop collectives, concatenate. So we validate that decomposition
    with the concurrency serialized: run each of the 8 shards through the
    REAL shard_map entry point (1-device mesh — the full sharded code
    path including in/out specs) one at a time, concatenate, and require
    bit-exact agreement with the unsharded 8-block run. Covers the ragged
    per-lane attempt streams (every shard has a different stream length
    K) and the sampler's streamed normals."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import AxisType, Mesh

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 0.5))
    n_sh = 8
    B = n_sh * pk.BLOCK
    key = jax.random.PRNGKey(7)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    mesh1 = Mesh(
        np.asarray(jax.devices()[:1]), ("ens",), axis_types=(AxisType.Auto,)
    )

    # --- adaptive filter + attempt-stream RTS smoother pair ---
    kw = dict(n_save=4, q=2, abstol=1e-4, reltol=1e-2, max_iters=256)
    with pltpu.force_tpu_interpret_mode():
        out = pk.solve_ensemble_ek0_adaptive_smooth_pallas(
            prob.f, u0s, ps, prob.tspan, **kw
        )
        shards = [
            pk.solve_ensemble_ek0_adaptive_smooth_pallas(
                prob.f, u0s[i * pk.BLOCK:(i + 1) * pk.BLOCK],
                ps[i * pk.BLOCK:(i + 1) * pk.BLOCK], prob.tspan,
                mesh=mesh1, **kw
            )
            for i in range(n_sh)
        ]
    assert not np.any(np.asarray(out[5]))
    # outputs (us, stds, lls, nacc, nrej, failed): batch axes (2, 1, 0...)
    cat_axes = (2, 1, 0, 0, 0, 0)
    for j, ax in enumerate(cat_axes):
        got = np.concatenate([np.asarray(s[j]) for s in shards], axis=ax)
        np.testing.assert_array_equal(got, np.asarray(out[j]))

    # --- fused posterior sampler (forward stream + backward sampler) ---
    # ek0_fused_sample takes the normals explicitly (batch axis 4):
    # slicing the SAME normals per shard makes the decomposition exact
    from odefilters.taylor import taylor_coefficients

    T, q, Ssmp = 6, 2, 2
    t0f, t1f = prob.tspan
    dt = (t1f - t0f) / T
    m0 = jax.vmap(
        lambda u0, p: jnp.stack(taylor_coefficients(prob.f, u0, p, t0f, q))
    )(u0s, ps).transpose(1, 2, 0)
    normals = jax.random.normal(key, (T + 1, Ssmp, q + 1, 2, B), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        smp = pk.ek0_fused_sample(
            prob.f, m0, ps.T, normals, float(t0f), float(dt), T, q
        )
        smp_sh = [
            pk.ek0_fused_sample(
                prob.f, m0[..., i * pk.BLOCK:(i + 1) * pk.BLOCK],
                ps.T[:, i * pk.BLOCK:(i + 1) * pk.BLOCK],
                normals[..., i * pk.BLOCK:(i + 1) * pk.BLOCK],
                float(t0f), float(dt), T, q, mesh=mesh1,
            )
            for i in range(n_sh)
        ]
    got = np.concatenate([np.asarray(s) for s in smp_sh], axis=-1)
    np.testing.assert_array_equal(got, np.asarray(smp))


# --------------------------------------------------------------------------
# Blocked hybrid associative scan (VERDICT r2 item 4): O(2N) combine work
# instead of O(N log N), same results.
# --------------------------------------------------------------------------


def test_blocked_scan_matches_plain_filter_and_smoother():
    """blocked_associative_scan == lax.associative_scan through the full
    sqrt filter + (reverse) smoother, including a non-divisible N
    (remainder tail path)."""
    from odefilters.parallel.associative_sqrt import (
        parallel_filter_sqrt, parallel_smoother_sqrt,
    )
    from odefilters.priors import ibm

    D, d = 6, 2
    for N in (37, 64):
        A, QL = ibm(d, 2, dtype=jnp.float64)
        key = jax.random.PRNGKey(N)
        kh, ky = jax.random.split(key)
        H = jax.random.normal(kh, (N, d, D), jnp.float64)
        y = jax.random.normal(ky, (N, d), jnp.float64)
        m0 = jnp.zeros((D,), jnp.float64)
        U0 = 0.1 * jnp.eye(D, dtype=jnp.float64)
        ms_p, Us_p = parallel_filter_sqrt(m0, U0, A, QL, H, y)
        ms_b, Us_b = parallel_filter_sqrt(m0, U0, A, QL, H, y, block=8)
        np.testing.assert_allclose(np.asarray(ms_b), np.asarray(ms_p),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.abs(np.asarray(Us_b @ jnp.swapaxes(Us_b, -1, -2))),
            np.abs(np.asarray(Us_p @ jnp.swapaxes(Us_p, -1, -2))),
            rtol=1e-8, atol=1e-11,
        )
        sm_p, Ps_p = parallel_smoother_sqrt(ms_p, Us_p, A, QL)
        sm_b, Ps_b = parallel_smoother_sqrt(ms_p, Us_p, A, QL, block=8)
        np.testing.assert_allclose(np.asarray(sm_b), np.asarray(sm_p),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(Ps_b @ jnp.swapaxes(Ps_b, -1, -2)),
            np.asarray(Ps_p @ jnp.swapaxes(Ps_p, -1, -2)),
            rtol=1e-8, atol=1e-11,
        )


def test_blocked_scan_solve_matches_plain_solve():
    """solve_fixed_parallel with the blocked scan equals the plain-scan
    solve AND the sequential solver."""
    from odefilters.parallel.associative import solve_fixed_parallel

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 4.0))
    ts = jnp.linspace(0.0, 4.0, 65, dtype=jnp.float64)
    u_p, ustd_p, *_ = solve_fixed_parallel(
        prob, odf.EK1(order=3), ts=ts, iterations=4, block=0
    )
    u_b, ustd_b, *_ = solve_fixed_parallel(
        prob, odf.EK1(order=3), ts=ts, iterations=4, block=16
    )
    np.testing.assert_allclose(np.asarray(u_b), np.asarray(u_p),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ustd_b), np.asarray(ustd_p),
                               rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("diffusion", ["dynamicMV", "fixedMV"])
def test_adaptive_kron_mv_matches_dense(diffusion):
    """Adaptive Kron driver with MV diffusions (VERDICT r2 item 10):
    identical step sequence and posterior vs the dense adaptive solver."""
    from odefilters.kronsolve import solve_adaptive_kron

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    alg = odf.EK0(order=2, diffusionmodel=diffusion)
    sk = solve_adaptive_kron(prob, alg, abstol=1e-7, reltol=1e-5)
    sd = odf.solve(prob, alg, abstol=1e-7, reltol=1e-5)
    assert sk.retcode_name == "Success"
    assert int(sk.n_steps) == int(sd.n_steps)
    n = int(sk.n_steps)
    np.testing.assert_allclose(
        np.asarray(sk.ts[: n + 1]), np.asarray(sd.ts[: n + 1]),
        rtol=1e-8, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(sk.u[: n + 1]), np.asarray(sd.u[: n + 1]),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sk.u_std[: n + 1]), np.asarray(sd.pu.std[: n + 1]),
        rtol=1e-6, atol=1e-11,
    )


def test_kron_sampling_mv_calibrated():
    """Non-isotropic (per-dim factor) Kron sampling: dynamicMV posterior
    samples stay near the posterior mean with the marginal spread."""
    from odefilters import kronsolve

    prob = odf.models.lotka_volterra(tspan=(0.0, 3.0))
    alg = odf.EK0(order=3, diffusionmodel="dynamicMV")
    sol = kronsolve.solve_fixed_kron(prob, alg, dt=0.05)
    samp = kronsolve.sample(jax.random.PRNGKey(0), sol, 40)  # (N+1, d, n)
    assert np.isfinite(np.asarray(samp)).all()
    u = np.asarray(sol.u)[:, :, None]
    std = np.asarray(sol.u_std)[:, :, None]
    # fraction outside 3 sigma must be small (exclude the exact first row)
    dev = np.abs(np.asarray(samp) - u)[1:]
    frac = float(np.mean(dev > 3.0 * std[1:] + 1e-12))
    assert frac < 0.05, frac
    # and samples genuinely spread at the marginal scale
    z = dev / (std[1:] + 1e-30)
    assert 0.3 < float(np.median(z)) < 3.0


def test_pallas_scan_interpret_matches_associative_scan():
    """Fused blocked-scan kernels == lax.associative_scan (interpret, f64).

    Exercises chunk packing with padding (N=40 << 1024 chunks), both
    element kinds, and the reverse (suffix) identity. Factors compare as
    covariances (identity-padded combines re-orthogonalize them).
    """
    from odefilters.parallel.associative_sqrt import (
        _sqrt_filter_combine,
        _sqrt_smooth_combine,
    )
    from odefilters.parallel.pallas_scan import pallas_associative_scan

    rng = np.random.default_rng(0)
    D, N = 3, 40

    def mk(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.3)

    elems = (mk(N, D, D), mk(N, D), mk(N, D, D), mk(N, D), mk(N, D, D))
    ref = jax.lax.associative_scan(_sqrt_filter_combine, elems)
    out = pallas_associative_scan("filter", elems, interpret=True)
    for i, (r, o) in enumerate(zip(ref, out)):
        if i in (2, 4):  # U, Z: factors -> covariances
            r, o = r @ np.swapaxes(r, -1, -2), o @ np.swapaxes(o, -1, -2)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-9, atol=1e-12)

    se = (mk(N, D, D), mk(N, D), mk(N, D, D))
    ref = jax.lax.associative_scan(_sqrt_smooth_combine, se, reverse=True)
    out = pallas_associative_scan("smooth", se, reverse=True, interpret=True)
    for i, (r, o) in enumerate(zip(ref, out)):
        if i == 2:  # P
            r, o = r @ np.swapaxes(r, -1, -2), o @ np.swapaxes(o, -1, -2)
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=1e-9, atol=1e-12)


def test_windowed_ek1_matches_sequential():
    """Windowed iterated solver (parallel in-window, sequential across
    windows) converges to the sequential EK1 fixed point — same check as
    the global solver's, via `windows=`."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 2.0))
    sd = odf.solve_fixed(prob, odf.EK1(order=3, diffusionmodel="fixed"), dt=0.04)
    n = int(sd.n_steps)
    u, u_std, _, _, s2 = solve_fixed_parallel(
        prob, odf.EK1(order=3), dt=0.04, iterations=8, windows=5
    )
    np.testing.assert_allclose(u, sd.u[: n + 1], rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(u_std, sd.pu.std[: n + 1], rtol=2e-2, atol=1e-8)
    np.testing.assert_allclose(float(s2), float(sd.diffusions[n]), rtol=0.05)


def test_windowed_ek0_converges_where_global_diverges():
    """The global EK0 Picard relinearization is non-contractive over long
    spans (measured divergence on FHN t=[0,20] at every N); windowed
    iteration with ~0.2-unit windows contracts — solution AND the MLE
    diffusion converge (u_diff 2e-6 / sigma2 0.1% at t=[0,10], W=50,
    iterations=6 in the round-3 calibration run)."""
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 5.0))
    sd = odf.solve_fixed(prob, odf.EK0(order=3, diffusionmodel="fixed"), dt=0.04)
    n = int(sd.n_steps)
    u, _, _, _, s2 = solve_fixed_parallel(
        prob, odf.EK0(order=3), dt=0.04, iterations=6, windows=25
    )
    np.testing.assert_allclose(u, sd.u[: n + 1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(s2), float(sd.diffusions[n]), rtol=0.05)


def test_windowed_validation_errors():
    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    with pytest.raises(ValueError, match="must divide"):
        solve_fixed_parallel(prob, odf.EK0(order=2), dt=0.02, windows=7)
    with pytest.raises(ValueError, match="square-root"):
        solve_fixed_parallel(
            prob, odf.EK0(order=2), dt=0.02, windows=5, sqrt_form=False
        )
    with pytest.raises(ValueError, match="sequentially"):
        solve_fixed_parallel(
            prob, odf.EK0(order=2), dt=0.02, windows=5, time_shard_axis="time"
        )


def test_pallas_sampler_sharded_bitexact():
    """The filter+sampler pair through the shard_map entry point (1-device
    mesh — both kernels stream via DMA; see the smoother-pair test above
    for the interpret-mode multi-device caveat). Also covers the
    sample_ensemble_pallas front door's algorithm checks."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import AxisType, Mesh

    from odefilters.ops import pallas_kernels as pk

    prob = odf.models.fitzhugh_nagumo(tspan=(0.0, 1.0))
    B, T = pk.BLOCK, 8
    key = jax.random.PRNGKey(11)
    u0s = (prob.u0 + 0.05 * jax.random.normal(key, (B, 2))).astype(jnp.float32)
    ps = jnp.broadcast_to(prob.p, (B, 4)).astype(jnp.float32)
    mesh1 = Mesh(
        np.asarray(jax.devices()[:1]), ("ens",), axis_types=(AxisType.Auto,)
    )
    alg = odf.EK0(order=2, smooth=True)
    with pltpu.force_tpu_interpret_mode():
        us_sh = odf.sample_ensemble_pallas(
            prob, alg, u0s, ps, key, n_steps=T, mesh=mesh1
        )
        us = odf.sample_ensemble_pallas(prob, alg, u0s, ps, key, n_steps=T)
    np.testing.assert_array_equal(np.asarray(us_sh), np.asarray(us))
    assert us.shape == (T + 1, 2, B)

    with pytest.raises(ValueError, match="non-smoothed"):
        odf.sample_ensemble_pallas(
            prob, odf.EK0(order=2, smooth=False), u0s, ps, key, n_steps=T
        )
    with pytest.raises(NotImplementedError, match="DiagonalEK1"):
        odf.sample_ensemble_pallas(
            prob, odf.DiagonalEK1(order=2, smooth=True), u0s, ps, key,
            n_steps=T
        )
