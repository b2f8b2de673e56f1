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


def pendulum_2nd(u0=(1.5,), du0=(0.0,), g_l: float = 9.81, tspan=(0.0, 3.0)):
    """Nonlinear pendulum as a *second-order* problem u'' = -(g/l) sin(u)
    (the reference marks SecondOrderODEProblem broken,
    `test/specific_problems.jl:114-125`; supported here)."""
    from odefilters.problem import ode_problem_2nd

    def f(du, u, p, t):
        return -p * jnp.sin(u)

    return ode_problem_2nd(f, u0, du0, tspan, p=jnp.asarray(g_l))
