from odefilters.models.library import (
    pendulum_2nd,
    brusselator_2d,
    exponential_decay,
    fitzhugh_nagumo,
    linear_ode,
    logistic,
    lotka_volterra,
    seir,
    van_der_pol,
)

__all__ = [
    "pendulum_2nd",
    "brusselator_2d",
    "exponential_decay",
    "fitzhugh_nagumo",
    "linear_ode",
    "logistic",
    "lotka_volterra",
    "seir",
    "van_der_pol",
]
