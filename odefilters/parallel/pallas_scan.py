"""Fused Pallas kernels for the blocked time-parallel prefix scans.

The XLA blocked scan (`parallel.blocked`) is mathematically right but
hits two TPU walls at large N (measured, benchmarks/compile_diag.json):

- **compile**: each square-root combine instance lowers to ~2800 HLO ops
  (unrolled MGS + substitutions on (..., 8, 8) operands), the program
  holds ~15 instances, and the remote XLA:TPU compiler spends 200-750 s
  on it (XLA:CPU: 25-40 s for the identical module);
- **runtime**: those tiny ops pay ~0.6 us issue overhead each — the
  N=16384 blocked filter runs 220 ms for ~0.1 ms of VPU arithmetic.

This module runs the SAME three-phase blocked scan as fused kernels,
with the 1024 chunks living in the (8, 128) lane grid — the layout the
ensemble kernels use for members (`docs/kernels.md`):

1. ``_chunk_scan_kernel``: grid over the ``block_len`` in-chunk steps,
   one combine per step on all 1024 chunks at once (the running prefix
   lives in VMEM scratch; Pallas double-buffers the HBM element rows);
2. ``_totals_scan_kernel``: inclusive Hillis-Steele prefix scan across
   the 1024 chunk totals *in the lane grid* — 10 rounds of
   lane/sublane rotates + masked combines — then one exclusive shift;
3. ``_fixup_kernel``: grid over rows again, combining each chunk's
   exclusive predecessor total into every in-chunk prefix (chunk 0
   passes through).

Elements are carried as lists-of-lane-vectors: a (D, D) matrix per
chunk is a D x D list of (8, 128) blocks, so every combine is straight-
line VPU code reusing the fused kernels' `_list_mgs_tril` /
`_list_cho_solve` helpers. One combine is ~4k lane ops; the whole
N=16384 scan is ~2N/1024 combines of work per lane slot.

Semantics: exactly ``jax.lax.associative_scan(combine, elems)`` (up to
floating-point reassociation), with ``reverse=True`` handled by the
flip identity as in `parallel.blocked`. Not differentiable (no custom
VJP) — the time-parallel solver is a primal-speed backend.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odefilters.ops.pallas_kernels import (
    _list_cho_solve,
    _list_mgs_tril,
    _no_x64,
)

_SUB, _LANE = 8, 128
_NC = _SUB * _LANE  # chunks per kernel invocation


# --------------------------------------------------------------------------
# small-matrix helpers on D x D lists of lane vectors
# --------------------------------------------------------------------------


def _mT(M):
    D = len(M)
    return [[M[j][i] for j in range(D)] for i in range(D)]


def _mm(A, B):
    D = len(A)
    return [
        [
            functools.reduce(
                lambda x, y: x + y, [A[i][k] * B[k][j] for k in range(D)]
            )
            for j in range(D)
        ]
        for i in range(D)
    ]


def _mv(A, x):
    D = len(A)
    return [
        functools.reduce(lambda a, b: a + b, [A[i][k] * x[k] for k in range(D)])
        for i in range(D)
    ]


def _tri_fwd(L, b):
    """Forward substitution: solve L y = b, L lower-triangular lists."""
    D = len(L)
    y = [None] * D
    for i in range(D):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    return y


def _cho_solve_mat(L, M):
    """(L L^T)^{-1} M column-by-column."""
    D = len(L)
    cols = [
        _list_cho_solve(L, [M[r][c] for r in range(D)], D) for c in range(D)
    ]
    return [[cols[c][r] for c in range(D)] for r in range(D)]


def _chol_I_plus_MMt(M):
    """chol(I + M M^T) via the MGS of the stacked [M^T ; I] factor.

    The identity block is passed as STATIC Python floats so
    `_list_mgs_tril` skips the structurally-zero multiplies.
    """
    D = len(M)
    rows = [[M[j][k] for j in range(D)] for k in range(D)]  # M^T rows
    rows += [[1.0 if j == k else 0.0 for j in range(D)] for k in range(D)]
    return _list_mgs_tril(rows, 2 * D, D)


# --------------------------------------------------------------------------
# the two square-root combines, list form
# (cf. parallel/associative_sqrt.py `_sqrt_filter_combine` /
#  `_sqrt_smooth_combine` — same algebra, traced for the VPU)
# --------------------------------------------------------------------------


def _filter_combine_lists(ea, eb):
    Ai, bi, Ui, etai, Zi = ea
    Aj, bj, Uj, etaj, Zj = eb
    D = len(Ai)

    W = _mm(_mT(Ui), Zj)
    Lw = _chol_I_plus_MMt(W)
    Lv = _chol_I_plus_MMt(_mT(W))

    # AjT = Aj (I - Ui (Lw Lw^T)^-1 W Zj^T)
    G = _cho_solve_mat(Lw, _mm(W, _mT(Zj)))
    UG = _mm(Ui, G)
    TmulI = [
        [(1.0 if i == j else 0.0) - UG[i][j] for j in range(D)]
        for i in range(D)
    ]
    AjT = _mm(Aj, TmulI)
    A = _mm(AjT, Ai)

    t2 = _mv(Ui, _mv(_mT(Ui), etaj))
    b_in = [bi[i] + t2[i] for i in range(D)]
    Ab = _mv(AjT, b_in)
    b = [Ab[i] + bj[i] for i in range(D)]

    # U = tril of [ (Aj V1)^T ; Uj^T ],  V1 = Ui Lw^{-T}
    V1 = [_tri_fwd(Lw, [Ui[r][k] for k in range(D)]) for r in range(D)]
    AjV1 = _mm(Aj, V1)
    rows = [[AjV1[j][k] for j in range(D)] for k in range(D)]
    rows += [[Uj[j][k] for j in range(D)] for k in range(D)]
    U = _list_mgs_tril(rows, 2 * D, D)

    # eta = Ai^T [ r - Zj (Lv Lv^T)^-1 W^T Ui^T r ] + etai,
    #   r = etaj - Zj Zj^T bi
    zb = _mv(_mT(Zj), bi)
    Zzb = _mv(Zj, zb)
    r = [etaj[i] - Zzb[i] for i in range(D)]
    wtr = _mv(_mT(W), _mv(_mT(Ui), r))
    inner = _list_cho_solve(Lv, wtr, D)
    Zin = _mv(Zj, inner)
    eta_in = [r[i] - Zin[i] for i in range(D)]
    Aeta = _mv(_mT(Ai), eta_in)
    eta = [Aeta[i] + etai[i] for i in range(D)]

    # Z = tril of [ (Ai^T V2)^T ; Zi^T ],  V2 = Zj Lv^{-T}
    V2 = [_tri_fwd(Lv, [Zj[r][k] for k in range(D)]) for r in range(D)]
    M2 = _mm(_mT(Ai), V2)
    rows = [[M2[j][k] for j in range(D)] for k in range(D)]
    rows += [[Zi[j][k] for j in range(D)] for k in range(D)]
    Z = _list_mgs_tril(rows, 2 * D, D)
    return A, b, U, eta, Z


def _smooth_combine_lists(ea, eb):
    Ea, ga, Pa = ea
    Eb, gb, Pb = eb
    D = len(Ea)
    E = _mm(Eb, Ea)
    Eg = _mv(Eb, ga)
    g = [gb[i] + Eg[i] for i in range(D)]
    EPa = _mm(Eb, Pa)
    rows = [[Pb[j][k] for j in range(D)] for k in range(D)]
    rows += [[EPa[j][k] for j in range(D)] for k in range(D)]
    P = _list_mgs_tril(rows, 2 * D, D)
    return E, g, P


_COMBINES = {
    "filter": (_filter_combine_lists, ("mat", "vec", "mat", "vec", "mat")),
    "smooth": (_smooth_combine_lists, ("mat", "vec", "mat")),
}


# --------------------------------------------------------------------------
# kernel plumbing
# --------------------------------------------------------------------------


def _read_elem(refs, kinds, D, row=True):
    out = []
    for ref, kind in zip(refs, kinds):
        if kind == "mat":
            if row:
                out.append([[ref[0, i, j] for j in range(D)] for i in range(D)])
            else:
                out.append([[ref[i, j] for j in range(D)] for i in range(D)])
        else:
            if row:
                out.append([ref[0, i] for i in range(D)])
            else:
                out.append([ref[i] for i in range(D)])
    return tuple(out)


def _write_elem(refs, kinds, D, val, row=True):
    for ref, kind, v in zip(refs, kinds, val):
        if kind == "mat":
            for i in range(D):
                for j in range(D):
                    if row:
                        ref[0, i, j] = v[i][j]
                    else:
                        ref[i, j] = v[i][j]
        else:
            for i in range(D):
                if row:
                    ref[0, i] = v[i]
                else:
                    ref[i] = v[i]


def _map_elem(kinds, D, fn, *elems):
    out = []
    for kind, *vs in zip(kinds, *elems):
        if kind == "mat":
            out.append(
                [[fn(*(v[i][j] for v in vs)) for j in range(D)]
                 for i in range(D)]
            )
        else:
            out.append([fn(*(v[i] for v in vs)) for i in range(D)])
    return tuple(out)


def _shift_flat(x, shift):
    """Value at flattened (sublane*128 + lane) index ``i - shift``.

    Wrap-around rows are garbage (masked by the caller). A shift that is
    a multiple of 128 is a pure sublane rotate; otherwise the lane
    rotate is stitched across the sublane boundary with a lane-index
    select.
    """
    if shift % _LANE == 0:
        return jnp.roll(x, shift // _LANE, axis=0)
    y = jnp.roll(x, shift, axis=1)
    z = jnp.roll(jnp.roll(x, 1, axis=0), shift, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    return jnp.where(lane >= shift, y, z)


def _flat_idx():
    s = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 0)
    l = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _LANE), 1)
    return s * _LANE + l


def _chunk_scan_kernel(kinds, D, combine, *refs):
    n = len(kinds)
    in_refs, out_refs, scratch = refs[:n], refs[n : 2 * n], refs[2 * n :]
    k = pl.program_id(0)
    e = _read_elem(in_refs, kinds, D, row=True)

    @pl.when(k == 0)
    def _():
        _write_elem(scratch, kinds, D, e, row=False)

    @pl.when(k > 0)
    def _():
        carry = _read_elem(scratch, kinds, D, row=False)
        _write_elem(scratch, kinds, D, combine(carry, e), row=False)

    carry = _read_elem(scratch, kinds, D, row=False)
    _write_elem(out_refs, kinds, D, carry, row=True)


def _totals_scan_kernel(kinds, D, combine, *refs):
    n = len(kinds)
    in_refs, out_refs = refs[:n], refs[n:]
    x = _read_elem(in_refs, kinds, D, row=False)
    idx = _flat_idx()
    shift = 1
    while shift < _NC:
        nb = _map_elem(kinds, D, lambda v: _shift_flat(v, shift), x)
        comb = combine(nb, x)
        mask = idx >= shift
        x = _map_elem(
            kinds, D, lambda c, v: jnp.where(mask, c, v), comb, x
        )
        shift *= 2
    excl = _map_elem(kinds, D, lambda v: _shift_flat(v, 1), x)
    _write_elem(out_refs, kinds, D, excl, row=False)


def _fixup_kernel(kinds, D, combine, *refs):
    n = len(kinds)
    pref_refs, t_refs, out_refs = refs[:n], refs[n : 2 * n], refs[2 * n :]
    pref = _read_elem(pref_refs, kinds, D, row=True)
    T = _read_elem(t_refs, kinds, D, row=False)
    comb = combine(T, pref)
    first = _flat_idx() == 0  # chunk 0 has no predecessor: pass through
    out = _map_elem(
        kinds, D, lambda c, p: jnp.where(first, p, c), comb, pref
    )
    _write_elem(out_refs, kinds, D, out, row=True)


@functools.partial(
    jax.jit, static_argnames=("kind", "D", "block_len", "interpret")
)
@_no_x64
def _scan_packed(kind, D, block_len, interpret, *packed):
    combine, kinds = _COMBINES[kind]
    dtype = packed[0].dtype
    L = block_len

    def out_shape(row):
        shapes = []
        for k in kinds:
            if k == "mat":
                s = (L, D, D, _SUB, _LANE) if row else (D, D, _SUB, _LANE)
            else:
                s = (L, D, _SUB, _LANE) if row else (D, _SUB, _LANE)
            shapes.append(jax.ShapeDtypeStruct(s, dtype))
        return shapes

    def row_specs():
        specs = []
        for k in kinds:
            if k == "mat":
                specs.append(pl.BlockSpec(
                    (1, D, D, _SUB, _LANE), lambda g: (g, 0, 0, 0, 0)))
            else:
                specs.append(pl.BlockSpec(
                    (1, D, _SUB, _LANE), lambda g: (g, 0, 0, 0)))
        return specs

    def full_specs():
        specs = []
        for k in kinds:
            if k == "mat":
                specs.append(pl.BlockSpec(
                    (D, D, _SUB, _LANE), lambda g: (0, 0, 0, 0)))
            else:
                specs.append(pl.BlockSpec(
                    (D, _SUB, _LANE), lambda g: (0, 0, 0)))
        return specs

    scratch = []
    for k in kinds:
        if k == "mat":
            scratch.append(pltpu.VMEM((D, D, _SUB, _LANE), dtype))
        else:
            scratch.append(pltpu.VMEM((D, _SUB, _LANE), dtype))

    prefixes = pl.pallas_call(
        functools.partial(_chunk_scan_kernel, kinds, D, combine),
        grid=(L,),
        in_specs=row_specs(),
        out_specs=row_specs(),
        out_shape=out_shape(row=True),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*packed)

    totals = tuple(p[L - 1] for p in prefixes)
    t_excl = pl.pallas_call(
        functools.partial(_totals_scan_kernel, kinds, D, combine),
        out_shape=out_shape(row=False),
        interpret=interpret,
    )(*totals)

    finals = pl.pallas_call(
        functools.partial(_fixup_kernel, kinds, D, combine),
        grid=(L,),
        in_specs=row_specs() + full_specs(),
        out_specs=row_specs(),
        out_shape=out_shape(row=True),
        interpret=interpret,
    )(*prefixes, *t_excl)
    return finals


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


def _identity_elems(kind, n, D, dtype):
    eye = jnp.broadcast_to(jnp.eye(D, dtype=dtype), (n, D, D))
    zm = jnp.zeros((n, D, D), dtype)
    zv = jnp.zeros((n, D), dtype)
    if kind == "filter":
        return (eye, zv, zm, zv, zm)
    return (eye, zv, zm)  # smooth: E=I, g=0, P=0


def pallas_associative_scan(kind, elems, *, reverse=False, interpret=False):
    """Inclusive prefix scan of square-root elements, fused on TPU.

    ``kind``: "filter" (elements ``(A, b, U, eta, Z)``) or "smooth"
    (``(E, g, P)``). Matches ``jax.lax.associative_scan(combine, elems,
    reverse=reverse)`` up to floating-point reassociation and factor
    re-orthogonalization (covariances ``U U^T`` are exact; the factors
    themselves may differ by an orthogonal right factor for padded/
    identity combines, as with any re-factorization).
    """
    combine, kinds = _COMBINES[kind]
    leaves = tuple(jnp.asarray(e) for e in elems)
    N = leaves[0].shape[0]
    D = leaves[0].shape[-1]
    if reverse:
        leaves = tuple(jnp.flip(e, 0) for e in leaves)

    block_len = max(math.ceil(N / _NC), 1)
    pad = block_len * _NC - N
    if pad:
        ident = _identity_elems(kind, pad, D, leaves[0].dtype)
        leaves = tuple(
            jnp.concatenate([e, i], axis=0) for e, i in zip(leaves, ident)
        )

    packed = []
    for e, k in zip(leaves, kinds):
        if k == "mat":
            p = e.reshape(_NC, block_len, D, D).transpose(1, 2, 3, 0)
            p = p.reshape(block_len, D, D, _SUB, _LANE)
        else:
            p = e.reshape(_NC, block_len, D).transpose(1, 2, 0)
            p = p.reshape(block_len, D, _SUB, _LANE)
        packed.append(p)

    finals = _scan_packed(kind, D, block_len, interpret, *packed)

    out = []
    for f, k in zip(finals, kinds):
        if k == "mat":
            u = f.reshape(block_len, D, D, _NC).transpose(3, 0, 1, 2)
            u = u.reshape(_NC * block_len, D, D)[:N]
        else:
            u = f.reshape(block_len, D, _NC).transpose(2, 0, 1)
            u = u.reshape(_NC * block_len, D)[:N]
        out.append(u)
    if reverse:
        out = [jnp.flip(u, 0) for u in out]
    return tuple(out)
