"""Work-precision curves for the BASELINE.md headline metric
("WP error at rtol=1e-8"): EK0/EK1 at a tolerance ladder down to
rtol=1e-8 and beyond, on Lotka-Volterra and FitzHugh-Nagumo (f64, CPU).

Writes benchmarks/wp_results.json and benchmarks/wp.png.
Usage: python benchmarks/work_precision.py
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

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

import odefilters as odf
from odefilters.workprecision import work_precision

TOLS = (
    (1e-4, 1e-2),
    (1e-6, 1e-4),
    (1e-8, 1e-6),
    (1e-10, 1e-8),
    (1e-12, 1e-10),
)


def main():
    results = {}
    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2))
    for ax, (pname, prob) in zip(
        axes,
        [
            ("lotka_volterra", odf.models.lotka_volterra()),
            ("fitzhugh_nagumo", odf.models.fitzhugh_nagumo(tspan=(0.0, 10.0))),
        ],
    ):
        for alg, style in [
            (odf.EK0(order=3), "o-"),
            (odf.EK1(order=3), "s-"),
            (odf.EK1(order=5), "d-"),
        ]:
            wp = work_precision(prob, alg, tols=TOLS, max_steps=32768)
            key = f"{pname}/{wp.name}"
            results[key] = wp.as_dict()
            errs = [p.error_l2 for p in wp.points]
            times = [p.runtime_s for p in wp.points]
            ax.loglog(errs, times, style, label=wp.name)
        ax.set_xlabel("L2 error vs rtol=1e-12 oracle")
        ax.set_ylabel("runtime [s]")
        ax.set_title(pname)
        ax.grid(True, which="both", alpha=0.3)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig("benchmarks/wp.png", dpi=110)

    with open("benchmarks/wp_results.json", "w") as fh:
        json.dump(results, fh, indent=2)

    # the headline: error achieved at the rtol=1e-8 rung
    for key, r in results.items():
        for p in r["points"]:
            if p["reltol"] == 1e-8:
                print(
                    f"{key}: rtol=1e-8 -> l2 error {p['error_l2']:.3e}, "
                    f"{p['n_steps']} steps, {p['runtime_s']*1e3:.1f} ms"
                )


if __name__ == "__main__":
    main()
