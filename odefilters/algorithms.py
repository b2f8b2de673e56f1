"""Solver algorithm configurations: EK0, EK1, IEKS.

Equivalent of `/root/reference/src/algorithms.jl` and the step-controller
trait constants of `/root/reference/src/alg_utils.jl`. These are frozen,
hashable dataclasses used as *static* jit arguments — each configuration
compiles to its own specialized XLA program.

References (as cited by the reference's docstrings, `algorithms.jl:16-22`):
- N. Bosch, P. Hennig, F. Tronarp: "Calibrated Adaptive Probabilistic ODE
  Solvers" (2021)
- F. Tronarp, H. Kersting, S. Sarkka, P. Hennig: "Probabilistic Solutions to
  ODEs as Non-Linear Bayesian Filtering" (2019)
- M. Schober, S. Sarkka, P. Hennig: "A Probabilistic Model for the Numerical
  Solution of Initial Value Problems" (2018)
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction

DIFFUSION_MODELS = ("dynamic", "dynamicMV", "fixed", "fixedMV", "fixedMAP")
STATIC_DIFFUSIONS = ("fixed", "fixedMV", "fixedMAP")
DYNAMIC_DIFFUSIONS = ("dynamic", "dynamicMV")
MV_DIFFUSIONS = ("dynamicMV", "fixedMV")


@dataclasses.dataclass(frozen=True)
class AbstractEK:
    """Shared config of the Gaussian ODE filters (`algorithms.jl:4-5`).

    ``prior`` accepts the reference-compatible string ``"ibm"`` (the
    default; `algorithms.jl:24` accepts nothing else) or a
    :class:`odefilters.priors.IWP` / ``IOUP(rate)`` / ``Matern(lengthscale)``
    instance — generalized Gauss-Markov priors beyond the reference,
    supported on EVERY path: dense adaptive + fixed-grid solvers,
    smoothing, dense output, sampling, the EK0 Kronecker fast path, the
    time-parallel backend, and the Pallas kernels (via their ``prior=``
    argument) — fixed-grid kernels and the Kron-grid PDE kernel bake the
    per-dt constants in at compile time; the per-lane-dt ADAPTIVE kernels
    evaluate the h-dependent preconditioned transition from a Chebyshev
    tabulation (`priors.chebyshev_transition_fit`) per attempt.
    """

    prior: object = "ibm"
    order: int = 3
    diffusionmodel: str = "dynamic"
    smooth: bool = True

    def __post_init__(self):
        from odefilters.priors import normalize_prior

        # normalize so EK1(prior="ibm") and EK1(prior=IWP()) hash/compare
        # equal (they are the same static jit key — no spurious recompiles)
        object.__setattr__(self, "prior", normalize_prior(self.prior))
        if self.diffusionmodel not in DIFFUSION_MODELS:
            raise ValueError(
                f"diffusionmodel must be one of {DIFFUSION_MODELS}, "
                f"got {self.diffusionmodel!r}"
            )
        if self.order < 1:
            raise ValueError("order must be >= 1")

    # --- traits (reference: src/alg_utils.jl, src/diffusions.jl:4-7) ---
    @property
    def alg_order(self) -> int:
        """Convergence order q+1 (`alg_utils.jl:15`)."""
        return self.order + 1

    @property
    def beta1(self) -> float:
        """PI controller exponent, 7/(10(q+1)) (`alg_utils.jl:24`)."""
        return float(Fraction(7, 10 * (self.order + 1)))

    @property
    def beta2(self) -> float:
        """PI controller exponent, 2/(5(q+1)) (`alg_utils.jl:23`)."""
        return float(Fraction(2, 5 * (self.order + 1)))

    @property
    def is_dynamic_diffusion(self) -> bool:
        return self.diffusionmodel in DYNAMIC_DIFFUSIONS

    @property
    def is_static_diffusion(self) -> bool:
        return self.diffusionmodel in STATIC_DIFFUSIONS

    @property
    def is_mv_diffusion(self) -> bool:
        return self.diffusionmodel in MV_DIFFUSIONS

    @property
    def is_ek1(self) -> bool:
        return False

    @property
    def is_diagonal_ek1(self) -> bool:
        return False


@dataclasses.dataclass(frozen=True)
class EK0(AbstractEK):
    """Gaussian ODE filtering with zeroth-order linearization (H = E1 P^-1).

    Reference: `/root/reference/src/algorithms.jl:23-28`. The measurement
    model ignores the Jacobian of the vector field; covariances stay
    Kronecker-structured, enabling the O(q^3)-per-step fast path.
    """


@dataclasses.dataclass(frozen=True)
class EK1(AbstractEK):
    """Gaussian ODE filtering with first-order (extended Kalman) linearization.

    Reference: `/root/reference/src/algorithms.jl:46-51`. The measurement
    Jacobian is ``H = (E1 - J_f E0) P^-1`` with ``J_f`` from the analytic
    ``prob.jac`` or ``jax.jacfwd`` (`perform_step.jl:111-127`).
    """

    def __post_init__(self):
        super().__post_init__()
        if self.is_mv_diffusion:
            # The MV diffusions assert EK0 structure
            # (src/diffusions.jl:96-101,126-136).
            raise ValueError("MV diffusion models require the EK0 algorithm")

    @property
    def is_ek1(self) -> bool:
        return True


@dataclasses.dataclass(frozen=True)
class DiagonalEK1(EK1):
    """EK1 with a *diagonal* first-order linearization, ``J -> diag(J)``.

    The measurement operator ``H = (E1 - diag(J) E0) P^-1`` couples each ODE
    dimension only to itself, so — like EK0 — the whole solve factorizes over
    dimensions: covariances are per-dimension ``(q+1, q+1)`` factors and the
    per-step cost is ``O(d q^3)`` instead of the full EK1's ``O((d(q+1))^3)``.
    Unlike EK0, the linearization sees the local Jacobian diagonal, which
    keeps the filter stable on stiff-but-weakly-coupled systems (each
    dimension's own decay rate enters the gain), making it the practical
    solver for large stiff systems where dense EK1 is unaffordable.

    Not in the reference (v0.1.5 has only EK0/EK1); the algorithm is from
    Kraemer, Bosch, Schmidt, Hennig: "Probabilistic ODE Solutions in
    Millions of Dimensions" (ICML 2022), which later versions of the same
    package ship as ``DiagonalEK1``. Runs on the dense path and on the
    Kronecker per-dimension fast path (`odefilters/ops/kron.py`).

    The Jacobian diagonal comes from ``prob.jac_diag`` (exact, O(d) for the
    typical pointwise-reaction PDE), else ``diagonal(prob.jac(...))``, else
    the ``jax.jacfwd`` diagonal (O(d^2) — fine for moderate d).

    The MV (per-dimension) diffusion models ARE allowed — the paper pairs
    diagonal linearization with per-dimension calibration; the structural
    assert that rejects EK1 x MV (`src/diffusions.jl:96-101`) does not
    apply because the per-dimension block structure is preserved.
    """

    def __post_init__(self):
        # skip EK1's MV rejection; run AbstractEK validation only
        AbstractEK.__post_init__(self)

    @property
    def is_diagonal_ek1(self) -> bool:
        return True


def ExpEK(rate, order: int = 3, diffusionmodel: str = "dynamic",
          smooth: bool = True) -> EK0:
    """Probabilistic exponential integrator: EK0 with the dimension-coupled
    ``IOUP(rate=L)`` prior.

    For a semi-linear problem ``u' = L u + g(u)`` pass the linear part
    ``L`` (a (d, d) matrix): the prior extrapolates with ``expm(L h)``, so
    the fast linear scales are followed exactly and the step size is set by
    the slow nonlinearity ``g`` alone — the probabilistic analogue of a
    classical exponential integrator. From Bosch, Hennig, Tronarp,
    "Probabilistic Exponential Integrators" (NeurIPS 2023); later upstream
    versions ship it as ``ExpEK(L=...)``. The reference v0.1.5 has neither
    (only the IWP prior, `/root/reference/src/priors.jl`,
    `algorithms.jl:24`).

    A scalar ``rate`` is also accepted (the dimension-factorized IOUP; runs
    on every path). Matrix rates run on the dense solver path
    (:func:`odefilters.solve.solve` / ``solve_fixed``), smoothing, dense
    output and sampling included.
    """
    from odefilters.priors import IOUP

    return EK0(prior=IOUP(rate=rate), order=order,
               diffusionmodel=diffusionmodel, smooth=smooth)


def RosenbrockExpEK(order: int = 3, diffusionmodel: str = "dynamic",
                    smooth: bool = True) -> EK1:
    """Probabilistic Rosenbrock-type exponential integrator: EK1 with the
    IOUP prior re-linearized at every step, ``rate = J_f(u)`` at the step's
    left (last accepted) filter mean.

    Where :func:`ExpEK` needs the user to name the linear part ``L`` of a
    semi-linear problem, the Rosenbrock variant tracks ``expm(J_f(u) h)``
    locally — the probabilistic analogue of a classical Rosenbrock /
    exponential-Rosenbrock method. From Bosch, Hennig, Tronarp,
    "Probabilistic Exponential Integrators" (NeurIPS 2023); later upstream
    versions ship it as ``RosenbrockExpEK``; the reference v0.1.5 has
    neither (`/root/reference/src/algorithms.jl:23-51` has only EK0/EK1 on
    the IWP prior).

    Smoothing, dense output and sampling re-linearize each saved interval
    at the same left filter state the forward pass used, so the posterior
    is consistent end-to-end. Dense solver path and the time-parallel
    backend (per-interval transitions rebuilt each sweep,
    `parallel.associative`); no Kronecker/kernel structure (the coupled
    per-step transition is dense); first-order problems only.
    """
    from odefilters.priors import IOUP

    return EK1(prior=IOUP(rate="jacobian"), order=order,
               diffusionmodel=diffusionmodel, smooth=smooth)


@dataclasses.dataclass(frozen=True)
class IEKS(EK1):
    """Iterated extended Kalman smoothing config.

    Reference: `/root/reference/src/ieks.jl:2-40`. Use with
    :func:`odefilters.ieks.solve_ieks`; each outer iteration re-solves with
    the EK1 linearized at the previous smoothed posterior mean
    (`perform_step.jl:111-113`). ``smooth`` is forced True.
    """

    order: int = 1
    smooth: bool = True

    def __post_init__(self):
        super().__post_init__()
        if not self.smooth:
            raise ValueError("IEKS requires smooth=True")
