"""Canonical test/benchmark problems.

The reference pulls these from DiffEqProblemLibrary.jl (see
`/root/reference/test/correctness.jl:10-13`, `test/diffusions.jl`); here they
are first-class, with analytic solutions/Jacobians where available. All
vector fields are pure JAX functions with the ``f(u, p, t)`` convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from odefilters.problem import ODEProblem, ode_problem


def fitzhugh_nagumo(
    u0=(-1.0, 1.0), p=(0.7, 0.8, 1 / 12.5, 0.5), tspan=(0.0, 20.0)
) -> ODEProblem:
    """FitzHugh-Nagumo neuron model (README example of the reference,
    `/root/reference/README.md:32-58`; `examples/fitzhughnagumo_animation.jl`)."""

    def f(u, p, t):
        a, b, tinv, izero = p
        v, w = u[0], u[1]
        dv = v - v**3 / 3 - w + izero
        dw = tinv * (v + a - b * w)
        return jnp.stack([dv, dw])

    def jac(u, p, t):
        a, b, tinv, izero = p
        v = u[0]
        o = jnp.ones_like(v)
        # built with stack/broadcast so it vectorizes over trailing batch
        # dims (required by the fused Pallas EK1 kernel)
        return jnp.stack([
            jnp.stack([1 - v**2, -o]),
            jnp.stack([tinv * o, -tinv * b * o]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac)


def lotka_volterra(
    u0=(1.0, 1.0), p=(1.5, 1.0, 3.0, 1.0), tspan=(0.0, 7.0)
) -> ODEProblem:
    """Lotka-Volterra predator-prey (`prob_ode_lotkavoltera` in the
    reference's test deps)."""

    def f(u, p, t):
        a, b, c, d = p
        x, y = u[0], u[1]
        return jnp.stack([a * x - b * x * y, -c * y + d * x * y])

    def jac(u, p, t):
        a, b, c, d = p
        x, y = u[0], u[1]
        return jnp.stack([
            jnp.stack([a - b * y, -b * x]),
            jnp.stack([d * y, -c + d * x]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac)


def logistic(u0=(0.01,), p=(3.0,), tspan=(0.0, 3.0)) -> ODEProblem:
    """Scalar logistic equation with analytic solution — the convergence
    test problem (`/root/reference/test/convergence.jl:7-14`)."""

    def f(u, p, t):
        return p[0] * u * (1 - u)

    def analytic(u0, p, t):
        return u0 * jnp.exp(p[0] * t) / (1 - u0 + u0 * jnp.exp(p[0] * t))

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), analytic=analytic)


def linear_ode(u0=(0.5,), p=(1.01,), tspan=(0.0, 1.0)) -> ODEProblem:
    """`prob_ode_linear`: u' = p u with analytic solution."""

    def f(u, p, t):
        return p * u

    def analytic(u0, p, t):
        return u0 * jnp.exp(p * t)

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), analytic=analytic)


def exponential_decay(u0=(1.0, 2.0), p=(-0.9,), tspan=(0.0, 2.0)) -> ODEProblem:
    """Linear vector ODE u' = a u (state-init exactness tests,
    `/root/reference/test/state_init.jl:9-28`)."""

    def f(u, p, t):
        return p[0] * u

    def analytic(u0, p, t):
        return u0 * jnp.exp(p[0] * t)

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), analytic=analytic)


def van_der_pol(u0=(2.0, 0.0), mu=1e5, tspan=(0.0, 2.0)) -> ODEProblem:
    """Stiff Van der Pol oscillator (`/root/reference/test/specific_problems.jl:44-47`;
    BASELINE config 3 uses mu=1e5 with EK1(5)+smoothing)."""

    def f(u, p, t):
        x, v = u[0], u[1]
        return jnp.stack([v, p * ((1 - x**2) * v - x)])

    def jac(u, p, t):
        x, v = u[0], u[1]
        o = jnp.ones_like(x)
        return jnp.stack([
            jnp.stack([0.0 * o, o]),
            jnp.stack([p * (-2 * x * v - 1.0), p * (1 - x**2)]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(mu), jac=jac)


BRUSSELATOR_A, BRUSSELATOR_B = 3.4, 1.0


def brusselator_2d_f_grids(N: int, alpha=None):
    """Grid-form Brusselator vector field: ``[a, b] -> [da, db]`` on
    (N, N) arrays — the single source of the stencil, shared by the flat
    :func:`brusselator_2d` and the fused Pallas kernel path.

    ``alpha``: static diffusivity baked into the stencil (the Pallas
    kernel path, where parameters are compile-time constants); ``None``
    reads the traced diffusivity from ``p`` at call time.
    """
    A_, B_ = BRUSSELATOR_A, BRUSSELATOR_B
    scale = float((N - 1) ** 2)

    def f_grids(fields, p, t):
        a, b = fields
        al = float(alpha) if alpha is not None else p

        def lap(x):
            return (
                jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
                + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
                - 4.0 * x
            ) * scale

        da = B_ + a * a * b - (A_ + 1.0) * a + al * lap(a)
        db = A_ * a - a * a * b + al * lap(b)
        return [da, db]

    return f_grids


def brusselator_2d_jd_grids(N: int, alpha=None):
    """Per-point Jacobian *diagonal* of the Brusselator stencil (for
    DiagonalEK1): d(da)/da = 2ab - (A+1) - 4*alpha*scale,
    d(db)/db = -a^2 - 4*alpha*scale — O(d), no Jacobian materialized."""
    A_ = BRUSSELATOR_A
    scale = float((N - 1) ** 2)

    def jd_grids(fields, p, t):
        a, b = fields
        al = float(alpha) if alpha is not None else p
        lap_diag = -4.0 * al * scale
        return [2.0 * a * b - (A_ + 1.0) + lap_diag, -a * a + lap_diag]

    return jd_grids


def brusselator_2d(N: int = 16, tspan=(0.0, 1.0), alpha: float = 0.1) -> ODEProblem:
    """2D Brusselator reaction-diffusion, semi-discretized on an N x N
    periodic grid -> d = 2 N^2 states (BASELINE config 4: ~1e4 states with
    EK0 + Kronecker covariance)."""
    f_grids = brusselator_2d_f_grids(N)
    jd_grids = brusselator_2d_jd_grids(N)

    def f(u, p, t):
        a = u[: N * N].reshape(N, N)
        b = u[N * N :].reshape(N, N)
        da, db = f_grids([a, b], p, t)
        return jnp.concatenate([da.ravel(), db.ravel()])

    def jac_diag(u, p, t):
        a = u[: N * N].reshape(N, N)
        b = u[N * N :].reshape(N, N)
        ja, jb = jd_grids([a, b], p, t)
        return jnp.concatenate([ja.ravel(), jb.ravel()])

    key_x = jnp.linspace(0, 1, N)
    X, Y = jnp.meshgrid(key_x, key_x, indexing="ij")
    a0 = 22.0 * (Y * (1 - Y)) ** 1.5
    b0 = 27.0 * (X * (1 - X)) ** 1.5
    u0 = jnp.concatenate([a0.ravel(), b0.ravel()])
    return ode_problem(f, u0, tspan, p=jnp.asarray(alpha), jac_diag=jac_diag)


def seir(
    u0=(0.99, 0.01, 0.0, 0.0), p=(0.35, 0.2, 0.1), tspan=(0.0, 100.0)
) -> ODEProblem:
    """SEIR epidemic model (reference docs example, `docs/src/index.md`)."""

    def f(u, p, t):
        beta, sigma, gamma = p
        S, E, I, R = u[0], u[1], u[2], u[3]
        return jnp.stack(
            [-beta * S * I, beta * S * I - sigma * E, sigma * E - gamma * I, gamma * I]
        )

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p))


def lorenz63(
    u0=(1.0, 0.0, 0.0), p=(10.0, 28.0, 8.0 / 3.0), tspan=(0.0, 5.0)
) -> ODEProblem:
    """Lorenz '63 chaotic attractor (upstream's benchmark gallery;
    v0.1.5 itself ships no problem library — `test/correctness.jl:10-13`
    pulls from DiffEqProblemLibrary)."""

    def f(u, p, t):
        s, r, b = p
        x, y, z = u[0], u[1], u[2]
        return jnp.stack([s * (y - x), x * (r - z) - y, x * y - b * z])

    def jac(u, p, t):
        s, r, b = p
        x, y, z = u[0], u[1], u[2]
        o = jnp.ones_like(x)
        zr = jnp.zeros_like(x)
        return jnp.stack([
            jnp.stack([-s * o, s * o, zr]),
            jnp.stack([r - z, -o, -x]),
            jnp.stack([y, x, -b * o]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac)


def lorenz96(N: int = 40, forcing: float = 8.0, tspan=(0.0, 2.0)) -> ODEProblem:
    """Lorenz '96 cyclic advection chain, ``x_i' = (x_{i+1} - x_{i-2})
    x_{i-1} - x_i + F`` — the standard scalable chaotic benchmark (the
    rolls vectorize; no Python loop over dimensions)."""

    def f(u, p, t):
        up1 = jnp.roll(u, -1, axis=0)
        um1 = jnp.roll(u, 1, axis=0)
        um2 = jnp.roll(u, 2, axis=0)
        return (up1 - um2) * um1 - u + p

    u0 = jnp.full((N,), forcing).at[0].add(0.01)
    return ode_problem(f, u0, tspan, p=jnp.asarray(forcing))


def rober(
    u0=(1.0, 0.0, 0.0), p=(0.04, 3e7, 1e4), tspan=(0.0, 100.0)
) -> ODEProblem:
    """Robertson chemical kinetics — the classic stiff 3-species problem
    (rate constants span 9 orders of magnitude)."""

    def f(u, p, t):
        k1, k2, k3 = p
        y1, y2, y3 = u[0], u[1], u[2]
        r1 = k1 * y1
        r2 = k2 * y2 * y2
        r3 = k3 * y2 * y3
        return jnp.stack([-r1 + r3, r1 - r2 - r3, r2])

    def jac(u, p, t):
        k1, k2, k3 = p
        y1, y2, y3 = u[0], u[1], u[2]
        o = jnp.ones_like(y1)
        zr = jnp.zeros_like(y1)
        return jnp.stack([
            jnp.stack([-k1 * o, k3 * y3, k3 * y2]),
            jnp.stack([k1 * o, -2 * k2 * y2 - k3 * y3, -k3 * y2]),
            jnp.stack([zr, 2 * k2 * y2, zr]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac)


def rober_dae(
    u0=(1.0, 0.0, 0.0), p=(0.04, 3e7, 1e4), tspan=(0.0, 100.0)
) -> ODEProblem:
    """Robertson kinetics as the classic index-1 DAE: the third species
    is eliminated by the conservation law ``y1 + y2 + y3 = 1`` posed as an
    algebraic row with mass matrix ``diag(1, 1, 0)``. Solve with EK1
    (docs/solvers.md "Mass matrices and index-1 DAEs")."""

    def f(u, p, t):
        k1, k2, k3 = p
        y1, y2, y3 = u[0], u[1], u[2]
        return jnp.stack([
            -k1 * y1 + k3 * y2 * y3,
            k1 * y1 - k2 * y2 * y2 - k3 * y2 * y3,
            y1 + y2 + y3 - 1.0,
        ])

    def jac(u, p, t):
        k1, k2, k3 = p
        y1, y2, y3 = u[0], u[1], u[2]
        o = jnp.ones_like(y1)
        return jnp.stack([
            jnp.stack([-k1 * o, k3 * y3, k3 * y2]),
            jnp.stack([k1 * o, -2 * k2 * y2 - k3 * y3, -k3 * y2]),
            jnp.stack([o, o, o]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac,
                       mass_matrix=jnp.array([1.0, 1.0, 0.0]))


def rigid_body(
    u0=(1.0, 0.0, 0.9), p=(-2.0, 1.25, -0.5), tspan=(0.0, 10.0)
) -> ODEProblem:
    """Euler rigid-body rotation equations (`prob_ode_rigidbody` in the
    reference's test deps; conserves ``|u|^2`` — the ManifoldUpdate demo
    invariant)."""

    def f(u, p, t):
        i1, i2, i3 = p
        return jnp.stack([i1 * u[1] * u[2], i2 * u[0] * u[2], i3 * u[0] * u[1]])

    def jac(u, p, t):
        i1, i2, i3 = p
        zr = jnp.zeros_like(u[0])
        return jnp.stack([
            jnp.stack([zr, i1 * u[2], i1 * u[1]]),
            jnp.stack([i2 * u[2], zr, i2 * u[0]]),
            jnp.stack([i3 * u[1], i3 * u[0], zr]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac)


def orego(
    u0=(1.0, 2.0, 3.0), p=(77.27, 8.375e-6, 0.161), tspan=(0.0, 30.0)
) -> ODEProblem:
    """Oregonator (Belousov-Zhabotinsky) stiff limit-cycle oscillator."""

    def f(u, p, t):
        s, w, qp = p
        y1, y2, y3 = u[0], u[1], u[2]
        return jnp.stack([
            s * (y2 + y1 * (1 - w * y1 - y2)),
            (y3 - (1 + y1) * y2) / s,
            qp * (y1 - y3),
        ])

    def jac(u, p, t):
        s, w, qp = p
        y1, y2, y3 = u[0], u[1], u[2]
        o = jnp.ones_like(y1)
        zr = jnp.zeros_like(y1)
        return jnp.stack([
            jnp.stack([s * (1 - 2 * w * y1 - y2), s * (1 - y1), zr]),
            jnp.stack([-y2 / s, -(1 + y1) / s, o / s]),
            jnp.stack([qp * o, zr, -qp * o]),
        ])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray(p), jac=jac)


def hodgkin_huxley(
    u0=(-70.0, 0.05, 0.6, 0.32), i_app: float = 10.0, tspan=(0.0, 50.0)
) -> ODEProblem:
    """Hodgkin-Huxley squid-axon neuron (4-dim: V, m, h, n) — upstream's
    flagship non-stiff benchmark model. Standard parameters; ``i_app`` is
    the applied current in uA/cm^2."""

    def f(u, p, t):
        V, m, h, n = u[0], u[1], u[2], u[3]
        iapp = p[0]
        g_na, g_k, g_l_ = 120.0, 36.0, 0.3
        e_na, e_k, e_l = 50.0, -77.0, -54.4
        # rate functions (with the standard removable-singularity forms
        # written exp-safe for vectorized evaluation)
        a_m = 0.1 * (V + 40.0) / (1.0 - jnp.exp(-(V + 40.0) / 10.0))
        b_m = 4.0 * jnp.exp(-(V + 65.0) / 18.0)
        a_h = 0.07 * jnp.exp(-(V + 65.0) / 20.0)
        b_h = 1.0 / (1.0 + jnp.exp(-(V + 35.0) / 10.0))
        a_n = 0.01 * (V + 55.0) / (1.0 - jnp.exp(-(V + 55.0) / 10.0))
        b_n = 0.125 * jnp.exp(-(V + 65.0) / 80.0)
        i_na = g_na * m**3 * h * (V - e_na)
        i_k = g_k * n**4 * (V - e_k)
        i_l = g_l_ * (V - e_l)
        dV = iapp - i_na - i_k - i_l
        dm = a_m * (1.0 - m) - b_m * m
        dh = a_h * (1.0 - h) - b_h * h
        dn = a_n * (1.0 - n) - b_n * n
        return jnp.stack([dV, dm, dh, dn])

    return ode_problem(f, jnp.asarray(u0), tspan, p=jnp.asarray([i_app]))


_PLEIADES_X = (3.0, 3.0, -1.0, -3.0, 2.0, -2.0, 2.0)
_PLEIADES_Y = (3.0, -3.0, 2.0, 0.0, 0.0, -4.0, 4.0)
_PLEIADES_VX = (0.0, 0.0, 0.0, 0.0, 0.0, 1.75, -1.5)
_PLEIADES_VY = (0.0, 0.0, 0.0, -1.25, 1.0, 0.0, 0.0)


def pleiades(tspan=(0.0, 3.0)):
    """Pleiades 7-body celestial mechanics (Hairer's DETEST problem,
    upstream's second-order benchmark) as a *second-order* problem
    ``u'' = f(u)`` with ``u = [x_1..x_7, y_1..y_7]``, masses ``m_j = j``."""
    from odefilters.problem import ode_problem_2nd

    m = jnp.arange(1.0, 8.0)

    def f(du, u, p, t):
        x, y = u[:7], u[7:]
        dx = x[None, :] - x[:, None]          # dx[i, j] = x_j - x_i
        dy = y[None, :] - y[:, None]
        r2 = dx * dx + dy * dy + jnp.eye(7)   # eye guards the i == j 0/0
        w = p / (r2 * jnp.sqrt(r2))           # m_j / r_ij^3
        w = w * (1.0 - jnp.eye(7))
        ax = jnp.sum(w * dx, axis=1)
        ay = jnp.sum(w * dy, axis=1)
        return jnp.concatenate([ax, ay])

    u0 = jnp.asarray(_PLEIADES_X + _PLEIADES_Y)
    du0 = jnp.asarray(_PLEIADES_VX + _PLEIADES_VY)
    return ode_problem_2nd(f, u0, du0, tspan, p=m)


def pendulum_2nd(u0=(1.5,), du0=(0.0,), g_l: float = 9.81, tspan=(0.0, 3.0)):
    """Nonlinear pendulum as a *second-order* problem u'' = -(g/l) sin(u)
    (the reference marks SecondOrderODEProblem broken,
    `test/specific_problems.jl:114-125`; supported here)."""
    from odefilters.problem import ode_problem_2nd

    def f(du, u, p, t):
        return -p * jnp.sin(u)

    return ode_problem_2nd(f, u0, du0, tspan, p=jnp.asarray(g_l))
