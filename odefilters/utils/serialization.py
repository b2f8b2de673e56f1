"""Checkpoint / resume: save and load solutions and integrator state.

The reference has nothing here (SURVEY.md §5: "Checkpoint/resume: none");
for a production serving framework, solutions and mid-solve integrator
states are plain pytrees, so persistence is flat-file npz (no external
dependency) with the static config re-attached on load.

Two pairs of entry points:

- :func:`save_solution` / :func:`load_solution` — finished solutions;
- :func:`save_integrator` / :func:`load_integrator` — a *mid-solve*
  integrator (the full adaptive-loop carry: state, buffers, controller
  memory, stats). A solve interrupted at step k and resumed from disk is
  bit-for-bit identical to the uninterrupted solve (tested).

Vector fields are code and are not persisted — the caller re-supplies the
``ODEProblem`` on load.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from odefilters.algorithms import EK0, EK1, IEKS
from odefilters.problem import ODEProblem
from odefilters.solution import ProbODESolution

_ALG_CLASSES = {"EK0": EK0, "EK1": EK1, "IEKS": IEKS}


def _prior_meta(prior) -> dict:
    """JSON-encode a Prior instance (IWP/IOUP/Matern are frozen dataclasses
    with float fields only)."""
    return {
        "prior_class": type(prior).__name__,
        "params": dataclasses.asdict(prior),
    }


def _prior_from_meta(meta) -> object:
    from odefilters import priors

    if isinstance(meta, str):  # pre-generalized-priors checkpoints
        return meta
    classes = {"IWP": priors.IWP, "IOUP": priors.IOUP, "Matern": priors.Matern}
    try:
        cls = classes[meta["prior_class"]]
    except KeyError:
        raise ValueError(
            f"unknown prior class in checkpoint: {meta.get('prior_class')!r}"
        ) from None
    return cls(**meta["params"])


def _alg_meta(alg) -> dict:
    return {
        "alg_class": type(alg).__name__,
        "alg": {
            "prior": _prior_meta(alg.prior),
            "order": alg.order,
            "diffusionmodel": alg.diffusionmodel,
            "smooth": alg.smooth,
        },
    }


def _alg_from_meta(meta) -> object:
    kw = dict(meta["alg"])
    kw["prior"] = _prior_from_meta(kw["prior"])
    return _ALG_CLASSES[meta["alg_class"]](**kw)


def save_integrator(path: str, integ) -> None:
    """Persist a mid-solve :class:`~odefilters.integrator.Integrator`.

    Saves the complete adaptive-loop carry (a pytree: filter state, save
    buffers, PI-controller memory, stats) plus the algorithm and solver
    options. The problem (user code) is re-supplied on load.
    """
    import jax.numpy as jnp

    leaves, _ = jax.tree.flatten(integ._carry)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = _alg_meta(integ.alg)
    meta["kind"] = "integrator"
    meta["opts"] = list(integ._opts)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrs)


def load_integrator(path: str, prob: ODEProblem):
    """Reload a mid-solve integrator; continue with ``.step()`` /
    ``.solve_fin()``. Resumed solves are bit-for-bit identical to
    uninterrupted ones (the carry fully determines the loop)."""
    import jax.numpy as jnp

    from odefilters.integrator import Integrator

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    if meta.get("kind") != "integrator":
        raise ValueError(f"{path} is not an integrator checkpoint")
    alg = _alg_from_meta(meta)
    abstol, reltol, max_steps, maxiters, dtmin = meta["opts"]
    integ = Integrator(
        prob, alg, abstol, reltol, int(max_steps), int(maxiters), dtmin,
        dt0=jnp.ones(()),
    )
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    integ._carry = jax.tree.unflatten(
        jax.tree.structure(integ._carry), leaves
    )
    return integ


def save_solution(path: str, sol: ProbODESolution) -> None:
    """Persist the dynamic fields + algorithm config (not the problem —
    vector fields are code, which the caller re-supplies on load)."""
    leaves, _ = jax.tree.flatten(
        dataclasses.replace(sol, prob=None)  # type: ignore[arg-type]
    )
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    meta = _alg_meta(sol.alg)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrs)


def load_solution(path: str, prob: ODEProblem) -> ProbODESolution:
    """Reload a solution; ``prob`` must be the problem it was solved from."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    alg = _alg_from_meta(meta)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    # Rebuild the treedef from a structural template with the same alg and
    # an empty prob slot, then fill the real prob back in.
    template = _solution_template(alg)
    sol = jax.tree.unflatten(jax.tree.structure(template), leaves)
    return dataclasses.replace(sol, prob=prob)


def _solution_template(alg) -> ProbODESolution:
    import jax.numpy as jnp

    from odefilters.linalg import Gaussian
    from odefilters.solution import DEStats

    z = jnp.zeros(())
    g = Gaussian(z, z)
    return ProbODESolution(
        ts=z, n_steps=z, u=z, pu=g, x_filt=g, x_smooth=g, diffusions=z,
        log_likelihood=z, stats=DEStats(z, z, z, z), retcode=z,
        prob=None, alg=alg,
    )
