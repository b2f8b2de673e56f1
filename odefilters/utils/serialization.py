"""Checkpoint / resume: save and load solutions and integrator state.

The reference has nothing here (SURVEY.md §5: "Checkpoint/resume: none");
for a production serving framework, solutions and mid-solve integrator
states are plain pytrees, so persistence is flat-file npz (no external
dependency) with the static config re-attached on load.
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


def save_solution(path: str, sol: ProbODESolution) -> None:
    """Persist the dynamic fields + algorithm config (not the problem —
    vector fields are code, which the caller re-supplies on load)."""
    leaves, _ = jax.tree.flatten(
        dataclasses.replace(sol, prob=None)  # type: ignore[arg-type]
    )
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    alg = sol.alg
    meta = {
        "alg_class": type(alg).__name__,
        "alg": {
            "prior": alg.prior,
            "order": alg.order,
            "diffusionmodel": alg.diffusionmodel,
            "smooth": alg.smooth,
        },
    }
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrs)


def load_solution(path: str, prob: ODEProblem) -> ProbODESolution:
    """Reload a solution; ``prob`` must be the problem it was solved from."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    alg = _ALG_CLASSES[meta["alg_class"]](**meta["alg"])
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
