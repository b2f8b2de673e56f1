"""Generate the API reference from docstrings into ``build/api/``.

The analogue of the reference's Documenter.jl site (`/root/reference/docs/`)
without external tooling: pure-stdlib introspection over the public
``odefilters`` modules, one Markdown page per module listing every public
class/function with its signature and full docstring (which in this
codebase carry the reference citations ``file:line`` and the measured
design rationale — the docs ARE the docstrings).

Usage: python scripts/build_api_docs.py [outdir]
"""

import inspect
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

MODULES = [
    "odefilters",
    "odefilters.algorithms",
    "odefilters.problem",
    "odefilters.solve",
    "odefilters.solution",
    "odefilters.integrator",
    "odefilters.priors",
    "odefilters.diffusions",
    "odefilters.linalg",
    "odefilters.taylor",
    "odefilters.step",
    "odefilters.smoothing",
    "odefilters.sampling",
    "odefilters.callbacks",
    "odefilters.ieks",
    "odefilters.datalik",
    "odefilters.jacobians",
    "odefilters.kronsolve",
    "odefilters.fixedgrid",
    "odefilters.ensemble",
    "odefilters.plotting",
    "odefilters.workprecision",
    "odefilters.models",
    "odefilters.ops.filtering",
    "odefilters.ops.kron",
    "odefilters.ops.pallas_kernels",
    "odefilters.parallel.associative",
    "odefilters.parallel.associative_sqrt",
    "odefilters.parallel.blocked",
    "odefilters.parallel.pallas_scan",
    "odefilters.parallel.windowed",
    "odefilters.parallel.sharding",
    "odefilters.utils.serialization",
    "odefilters.utils.observability",
]


def _members(mod):
    """Public functions/classes defined in (not imported into) ``mod``."""
    out = []
    for name, obj in sorted(vars(mod).items()):
        if name.startswith("_"):
            continue
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        out.append((name, obj))
    return out


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def render_module(modname: str) -> str:
    mod = __import__(modname, fromlist=["_"])
    lines = [f"# `{modname}`", ""]
    if mod.__doc__:
        lines += [mod.__doc__.strip(), ""]
    for name, obj in _members(mod):
        kind = "class" if inspect.isclass(obj) else "def"
        lines += [f"## `{kind} {name}{_signature(obj)}`", ""]
        doc = inspect.getdoc(obj)
        if doc:
            lines += [doc, ""]
        if inspect.isclass(obj):
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                mdoc = inspect.getdoc(meth)
                lines += [f"### `{name}.{mname}{_signature(meth)}`", ""]
                if mdoc:
                    lines += [mdoc, ""]
    return "\n".join(lines)


def main(argv):
    outdir = Path(argv[1]) if len(argv) > 1 else ROOT / "build" / "api"
    outdir.mkdir(parents=True, exist_ok=True)
    index = ["# odefilters API reference", "",
             "Generated from docstrings by `scripts/build_api_docs.py`.", ""]
    n = 0
    for modname in MODULES:
        page = modname.replace(".", "_") + ".md"
        try:
            text = render_module(modname)
        except Exception as e:  # a missing optional dep must not kill docs
            text = f"# `{modname}`\n\n(import failed: {e})\n"
        (outdir / page).write_text(text)
        index.append(f"- [`{modname}`]({page})")
        n += 1
    (outdir / "index.md").write_text("\n".join(index) + "\n")
    print(f"[api-docs] wrote {n} module pages to {outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
