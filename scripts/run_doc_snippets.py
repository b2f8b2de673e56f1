"""Execute the fenced ``python`` code blocks in ``docs/*.md``.

The analogue of the reference's doctest CI job
(`/root/reference/.github/workflows/ci.yml:51-66`): documentation code must
actually run against the current API. Blocks within one file share a
namespace and run top to bottom, so later snippets may use earlier
definitions. A block is skipped when the line directly above its fence is
the HTML comment ``<!-- snippet: skip -->`` (used for illustrative
fragments, TPU-only code, or long-running configs; each carries a reason
in the comment).

Runs on the CPU backend in-process (the container force-registers a
remote-TPU platform; see CLAUDE.md) and with small default figures.

Usage: python scripts/run_doc_snippets.py [docs/file.md ...]
"""

import os
import re
import sys
import time
import traceback
from pathlib import Path

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")
# f64, like the unit suite: the docs demonstrate tight-tolerance configs
# (e.g. the ROBER DAE at 1e-8) that are f64 territory on any hardware
jax.config.update("jax_enable_x64", True)

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

FENCE = re.compile(r"^```python\s*$")
SKIP = re.compile(r"<!--\s*snippet:\s*skip\b")


def extract_blocks(path: Path):
    """Yield (start_line, code, skipped) for each ```python block."""
    lines = path.read_text().splitlines()
    i = 0
    while i < len(lines):
        if FENCE.match(lines[i]):
            # a skip marker directly above the fence (blank lines allowed)
            j = i - 1
            while j >= 0 and not lines[j].strip():
                j -= 1
            skipped = j >= 0 and bool(SKIP.search(lines[j]))
            start = i + 1
            code = []
            i += 1
            while i < len(lines) and lines[i].rstrip() != "```":
                code.append(lines[i])
                i += 1
            yield start + 1, "\n".join(code), skipped
        i += 1


def run_file(path: Path) -> int:
    ns = {"__name__": f"doc_snippets::{path.name}"}
    failures = 0
    n_run = n_skip = 0
    for lineno, code, skipped in extract_blocks(path):
        if skipped:
            n_skip += 1
            continue
        t0 = time.perf_counter()
        try:
            exec(compile(code, f"{path}:{lineno}", "exec"), ns)
            n_run += 1
            dt = time.perf_counter() - t0
            print(f"  ok   {path.name}:{lineno}  ({dt:.1f}s)")
        except Exception:
            failures += 1
            print(f"  FAIL {path.name}:{lineno}")
            traceback.print_exc()
    print(f"[doc-snippets] {path.name}: {n_run} run, {n_skip} skipped, "
          f"{failures} failed")
    return failures


def main(argv):
    targets = ([Path(a) for a in argv[1:]]
               or sorted((ROOT / "docs").glob("*.md")))
    failures = 0
    for path in targets:
        failures += run_file(path)
    if failures:
        print(f"[doc-snippets] {failures} snippet(s) FAILED")
        return 1
    print("[doc-snippets] all executable snippets pass")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
