"""Pallas TPU kernels for hot pixel ops.

These implement the 3x3 grey morphology (cv2.erode/dilate equivalents the
mask-refinement stack leans on, reference utils/textmask.py:33-35,83-89)
and a fused mask-finalize (sigmoid map -> *255 -> uint8) as single-pass
VMEM stencils: one HBM read + one write per pixel, all work on the VPU,
instead of separate XLA reduce_window + cast round trips.

Kernels run tiled over row bands with a 1-px halo (overlapping BlockSpec
reads).  On non-TPU backends they fall back to Pallas interpret mode so the
same code paths are unit-testable on CPU.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM limit is 16 MB; v5e has 128 MB of physical
# VMEM per core.  The fused CC+rank kernel keeps ~25 window-sized i32
# temporaries live (measured 16.61 MB at 640x256, 21.02 MB at 512x512), so
# window kernels raise the limit instead of rerouting big windows to the
# grid path (which costs ~70 full-canvas HBM round-trips and measured
# 1.5 s/page — 75x slower than in-VMEM fixpoint iteration).
_WINDOW_VMEM_LIMIT = 64 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _morph_kernel(op: Callable, x_ref, o_ref):
    x = x_ref[:]
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    acc = x
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            acc = op(acc, jax.lax.dynamic_slice(p, (dy, dx), (h, w)))
    o_ref[:] = acc


def _run_morph(x: jax.Array, op: Callable) -> jax.Array:
    kernel = functools.partial(_morph_kernel, op)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x)


@jax.jit
def erode3x3(x: jax.Array) -> jax.Array:
    """Grey erosion, 3x3 rect kernel, replicate border (cv2.erode)."""
    return _run_morph(x, jnp.minimum)


@jax.jit
def dilate3x3(x: jax.Array) -> jax.Array:
    """Grey dilation, 3x3 rect kernel, replicate border (cv2.dilate)."""
    return _run_morph(x, jnp.maximum)


def _ellipse_kernel(op: Callable, x_ref, o_ref):
    # cv2 MORPH_ELLIPSE (3,3) = 4-neighborhood cross + center
    x = x_ref[:]
    h, w = x.shape
    p = jnp.pad(x, ((1, 1), (1, 1)), mode="edge")
    acc = x
    for dy, dx in ((0, 1), (2, 1), (1, 0), (1, 2)):
        acc = op(acc, jax.lax.dynamic_slice(p, (dy, dx), (h, w)))
    o_ref[:] = acc


@jax.jit
def erode3x3_ellipse(x: jax.Array) -> jax.Array:
    """Grey erosion with the cross-shaped MORPH_ELLIPSE (3,3) footprint."""
    return pl.pallas_call(
        functools.partial(_ellipse_kernel, jnp.minimum),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(x)


def _finalize_kernel(mask_ref, o_ref):
    o_ref[:] = (mask_ref[:].astype(jnp.float32) * 255.0).astype(jnp.uint8)


@jax.jit
def mask_to_u8(mask: jax.Array) -> jax.Array:
    """Fused sigmoid-map -> uint8 (*255, truncating like the reference's
    postprocess_mask, inference.py:85-99)."""
    return pl.pallas_call(
        _finalize_kernel,
        out_shape=jax.ShapeDtypeStruct(mask.shape, jnp.uint8),
        interpret=_interpret(),
    )(mask)


def _binarize_kernel(thresh_ref, x_ref, o_ref):
    o_ref[:] = (x_ref[:] > thresh_ref[0]).astype(jnp.uint8)


@jax.jit
def binarize(x: jax.Array, thresh) -> jax.Array:
    """Fused probability-map binarization (DB shrink-map > thresh)."""
    t = jnp.asarray([thresh], jnp.float32)
    return pl.pallas_call(
        _binarize_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint8),
        interpret=_interpret(),
    )(t, x)


# ---------------------------------------------------------------------------
# Connected-components propagation sweeps (the CC hot loop, ops/cc.py).
#
# Two grid-tiled pallas kernels per round: forward+backward segmented
# min-scans along rows (row-band blocks) and along columns (column-strip
# blocks), each as in-VMEM Hillis-Steele doubling — one HBM read + write of
# the label map per sweep, versus ~40 materialized passes per round for the
# XLA associative_scan formulation (log-depth scans materialize every step).
# The cheap diagonal hop + convergence test stay in XLA (they fuse to a
# single stencil pass).
# ---------------------------------------------------------------------------

_CC_BIG = 2**30  # python int: jnp constants would be captured tracers in kernels


def _shift_with_fill(x: jax.Array, s: int, axis: int, fill) -> jax.Array:
    """Non-circular shift by +s (toward higher indices; -s for lower),
    vacated slots filled — static slices only, so it lowers everywhere."""
    h, w = x.shape
    if axis == 1:
        pad = jnp.full((h, abs(s)), fill, x.dtype)
        return (
            jnp.concatenate([pad, x[:, :-s]], axis=1)
            if s > 0
            else jnp.concatenate([x[:, -s:], pad], axis=1)
        )
    pad = jnp.full((abs(s), w), fill, x.dtype)
    return (
        jnp.concatenate([pad, x[:-s, :]], axis=0)
        if s > 0
        else jnp.concatenate([x[-s:, :], pad], axis=0)
    )


def _segmented_min_sweep(v: jax.Array, m: jax.Array, axis: int, reverse: bool) -> jax.Array:
    """In-VMEM segmented min-scan along ``axis``: each foreground pixel ends
    with the min over its full connected run.  (gate=0, v=BIG) is the
    shift-in boundary element, which the scan operator absorbs exactly.

    Gates are int32 0/1 (Mosaic rejects concatenating i1 vector registers),
    combined with multiply instead of logical and.
    """
    n = v.shape[axis]
    sgn = -1 if reverse else 1
    g = m * _shift_with_fill(m, sgn, axis, 0)
    s = 1
    while s < n:
        vp = _shift_with_fill(v, sgn * s, axis, _CC_BIG)
        gp = _shift_with_fill(g, sgn * s, axis, 0)
        v = jnp.where(g > 0, jnp.minimum(v, vp), v)
        g = g * gp
        s *= 2
    return v


def _scan_kernel(axis: int, l_ref, m_ref, o_ref):
    m = (m_ref[:] != 0).astype(jnp.int32)
    l = _segmented_min_sweep(l_ref[:], m, axis=axis, reverse=False)
    o_ref[:] = _segmented_min_sweep(l, m, axis=axis, reverse=True)


def _band(n: int, target: int = 256) -> int:
    """Largest power-of-two block size <= target dividing n (>= 8)."""
    b = target
    while b > 8 and n % b:
        b //= 2
    return b if n % b == 0 else n


def _fit_band(n: int, n_other: int, cap_elems: int = 1 << 18, floor: int = 8) -> int:
    """Block size along ``n`` keeping n_other*block <= cap_elems.

    The doubling sweep keeps ~9 int32 temporaries live per block element;
    capping the block near 2^18 elements (1 MB i32) bounds Mosaic's scoped
    VMEM stack under the 16 MB limit.  ``floor`` enforces the Mosaic
    last-dim tiling minimum (128) for column strips; the caller must keep
    the orthogonal dimension short enough that floor-sized strips fit
    (ops/refine.py SLOTS is sized for exactly this)."""
    t = cap_elems // max(n_other, 1)
    target = floor
    while target * 2 <= min(t, 256):
        target *= 2
    return _band(n, max(target, floor))


def _shift2(x: jax.Array, sy: int, sx: int, fill) -> jax.Array:
    """Composed 2-D non-circular shift (static slices only)."""
    if sy:
        x = _shift_with_fill(x, sy, 0, fill)
    if sx:
        x = _shift_with_fill(x, sx, 1, fill)
    return x


def _segmented_min_sweep_diag(
    v: jax.Array, m: jax.Array, dx_sign: int, reverse: bool
) -> jax.Array:
    """Segmented min-scan along a DIAGONAL direction (dy=1, dx=dx_sign),
    via composed 2-D shifts — no shear/reshape.  Collapses thin diagonal
    runs (anti-aliased glyph strokes) in log steps instead of one pixel per
    round through the single diagonal hop."""
    n = min(v.shape)
    sgn = -1 if reverse else 1
    g = m * _shift2(m, sgn, sgn * dx_sign, 0)
    s = 1
    while s < n:
        vp = _shift2(v, sgn * s, sgn * s * dx_sign, _CC_BIG)
        gp = _shift2(g, sgn * s, sgn * s * dx_sign, 0)
        v = jnp.where(g > 0, jnp.minimum(v, vp), v)
        g = g * gp
        s *= 2
    return v


def _cc_round(l: jax.Array, m: jax.Array, diag_sweep: bool = False) -> jax.Array:
    """One propagation round: segmented min-sweeps along rows and columns
    plus diagonal coupling (8-connectivity), background forced to _CC_BIG.

    ``diag_sweep`` replaces the single-step diagonal hop with full doubling
    sweeps along both diagonals (~2x work per round, but diagonal strokes
    converge in one round instead of one pixel per round)."""
    l = _segmented_min_sweep(l, m, axis=1, reverse=False)
    l = _segmented_min_sweep(l, m, axis=1, reverse=True)
    l = _segmented_min_sweep(l, m, axis=0, reverse=False)
    l = _segmented_min_sweep(l, m, axis=0, reverse=True)
    if diag_sweep:
        for dx_sign in (1, -1):
            l = _segmented_min_sweep_diag(l, m, dx_sign, reverse=False)
            l = _segmented_min_sweep_diag(l, m, dx_sign, reverse=True)
        return jnp.where(m > 0, l, _CC_BIG)
    diag = jnp.minimum(
        jnp.minimum(
            _shift_with_fill(_shift_with_fill(l, 1, 0, _CC_BIG), 1, 1, _CC_BIG),
            _shift_with_fill(_shift_with_fill(l, 1, 0, _CC_BIG), -1, 1, _CC_BIG),
        ),
        jnp.minimum(
            _shift_with_fill(_shift_with_fill(l, -1, 0, _CC_BIG), 1, 1, _CC_BIG),
            _shift_with_fill(_shift_with_fill(l, -1, 0, _CC_BIG), -1, 1, _CC_BIG),
        ),
    )
    return jnp.where(m > 0, jnp.minimum(l, diag), _CC_BIG)


_CC_VARIANTS = ("base", "chunk2", "diag", "diagchunk2")


def _parse_variant(variant: str) -> tuple[int, bool]:
    """'base' | 'chunk2' | 'diag' | 'diagchunk2' -> (rounds per convergence
    check, diagonal-sweep rounds).  All variants reach the identical
    fixpoint (min-propagation is monotone and idempotent at convergence);
    they trade per-round work against round count and check overhead."""
    if variant not in _CC_VARIANTS:
        raise ValueError(
            f"unknown CC fixpoint variant {variant!r}; expected one of {_CC_VARIANTS}"
        )
    diag = variant.startswith("diag")
    chunk = 2 if variant.endswith("chunk2") else 1
    return chunk, diag


def _cc_fixpoint(l0: jax.Array, m: jax.Array, variant: str = "base") -> jax.Array:
    """Iterate _cc_round to convergence inside the kernel (in VMEM)."""
    chunk, diag = _parse_variant(variant)

    def cond(state):
        return state[1]

    def body(state):
        l, _ = state
        nl = l
        for _ in range(chunk):
            nl = _cc_round(nl, m, diag_sweep=diag)
        return nl, jnp.any(nl != l)

    l, _ = jax.lax.while_loop(cond, body, (l0, jnp.bool_(True)))
    return l


def _cc_window_kernel(variant, m_ref, o_ref):
    """Complete 8-connected CC labeling of ONE window, in VMEM.

    Iterates (row sweeps, col sweeps, diagonal hop) to the fixpoint inside
    the kernel — zero HBM round-trips between propagation rounds.  The
    global formulation pays one HBM read+write of the whole canvas per
    round, and serpentine refine candidates need ~70 rounds; per-window
    in-VMEM iteration makes rounds nearly free and each window stops at its
    own fixpoint.  Output: component-min linear index per pixel (row*S+col),
    _CC_BIG on background.
    """
    m = (m_ref[0] != 0).astype(jnp.int32)  # (S, S)
    h, w = m.shape
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    o_ref[0] = _cc_fixpoint(jnp.where(m > 0, lin, _CC_BIG), m, variant)


def _min_prop_kernel(variant, m_ref, a_ref, o_ref):
    """Min-propagate a seeded value map across each mask component, in VMEM.

    Seeds carry _CC_BIG everywhere except the values to spread (e.g. a root's
    raster rank); the fixpoint leaves every foreground pixel holding its
    component's minimum seed.  Output: that minimum (0 on background).  Used
    as the second half of the SPLIT rank-ids path for whole-canvas shapes
    whose fused-kernel footprint exceeds physical VMEM (see
    cc_ids_windows_local).
    """
    m = (m_ref[0] != 0).astype(jnp.int32)
    aux = _cc_fixpoint(a_ref[0], m, variant)
    o_ref[0] = jnp.where(m > 0, aux, 0)


def _cc_ids_kernel(variant, m_ref, o_ref):
    """CC labeling + in-VMEM rank compaction of ONE window.

    Output: 1-based component ids in raster order of component roots
    (identical to ops/refine.py::_compact_ids over the converged root
    labels), 0 on background.  Computing the ranks inside the kernel
    replaces a ~2M-element HBM gather per refine dispatch (XLA take_along_
    axis measured ~12 ms/M elements on v5e) with two cheap in-register
    prefix sums and a second min-propagation over the already-converged
    component structure.
    """
    m = (m_ref[0] != 0).astype(jnp.int32)  # (S, S)
    h, w = m.shape
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    )
    l = _cc_fixpoint(jnp.where(m > 0, lin, _CC_BIG), m, variant)

    # raster-order 1-based root ranks: within-row inclusive prefix count of
    # roots + exclusive prefix of the per-row totals (Hillis-Steele shifts)
    is_root = ((l == lin) & (m > 0)).astype(jnp.int32)
    x = is_root
    s = 1
    while s < w:
        x = x + _shift_with_fill(x, s, 1, 0)
        s *= 2
    # row totals broadcast to full width (Mosaic rejects (h, 1)-shaped
    # shifts: sub-lane-width concatenates hit layout-offset limits)
    row_tot = jnp.broadcast_to(jax.lax.slice(x, (0, w - 1), (h, w)), (h, w))
    y = row_tot
    s = 1
    while s < h:
        y = y + _shift_with_fill(y, s, 0, 0)
        s *= 2
    rank = x + (y - row_tot)  # inclusive in-row + rows-above totals

    # min-propagate each root's rank across its (already converged)
    # component: ranks are monotone in the root linear index, so the
    # component min IS the root's rank
    aux = _cc_fixpoint(jnp.where(is_root > 0, rank, _CC_BIG), m, variant)
    o_ref[0] = jnp.where(m > 0, aux, 0)


# Above this element count the FUSED labels+ranks kernel's scoped-VMEM
# stack exceeds what v5e can grant: Mosaic measured 21.02 MB at 512x512 /
# 16.61 MB at 640x256 (fine), but 92.34-112 MB at 1024x1024 — over the
# 128 MB physical VMEM once the pipelined in/out blocks are added, and the
# request GROWS with vmem_limit_bytes (the scheduler spends the headroom;
# raising the limit 64->104 MB moved the request 92.34->112 MB,
# data/check_rank_decode_r4c.log).  Whole-canvas shapes therefore take a
# SPLIT path: the hardware-validated labels kernel, root ranks via one XLA
# cumsum (elementwise — no gather), and a second small min-propagate kernel.
# Cost: one extra HBM round-trip of the canvas (~8 MB, tens of µs).
_FUSED_IDS_MAX_ELEMS = 512 * 512

# Default CC fixpoint variants for production paths.  Candidates ('chunk2',
# 'diag', 'diagchunk2' — see _parse_variant) are exactness-preserving but
# must be hardware-A/B'd (scripts/cc_variant_ab.py) before these flip:
# Mosaic compile behavior and real round counts are invisible to
# interpret-mode tests.
#
# r4e A/B (data/cc_variant_ab_r4e.log): 'chunk2' (two propagation rounds
# per convergence check — halves the any()-reduce + while-loop round-trip
# count) is faster AND bit-equal at every production bucket shape on the
# fused window kernel with REAL example-page candidate sets (6.48->5.70 ms
# at 256x256/32, 21.00->17.80 at 512x256/24, 14.45->12.90 at 512x512/12).
# The r5 gate (data/cc_text_ab_r5gate.log) closed the last bucket: 640x256
# compiles and is bit-equal at realistic glyph density (on glyph-only
# windows the timings are a wash — text converges in few rounds — the win
# comes from the noisier color-model candidate masks real pages produce).
# 'diag' variants lose everywhere (the doubling diagonal sweeps cost more
# than the rounds they save on real candidate sets).
#
# chunk2 CANNOT serve the whole-canvas shapes: chaining two rounds before
# the convergence check doubles the fixpoint's live set on the scoped-VMEM
# stack — measured 90.6 MB at 512x1024 (limit 64) and 189.2 MB at 1024x1024
# (physical 128), data/repro_chunk2_r5gate.log.  The r4 "Mosaic internal
# error" was this VMEM blowout surfacing through the remote compiler, not
# a compiler bug.  Canvas/split paths stay on 'base'.
_DEFAULT_VARIANT = "base"  # canvas labels / min-propagate (split path)
_DEFAULT_FUSED_VARIANT = "chunk2"  # fused window labels+ranks kernel (<=512x512)


@functools.partial(jax.jit, static_argnums=(2, 3))
def min_prop_windows_local(
    masks_u8: jax.Array,
    aux_i32: jax.Array,
    interpret: bool | None = None,
    variant: str = "base",
) -> jax.Array:
    """Per-window component-min propagation of seeded values: (N, sh, sw)
    uint8 masks + (N, sh, sw) int32 seeds (_CC_BIG where no seed) -> the
    component-min seed per foreground pixel, 0 on background."""
    n, s1, s2 = masks_u8.shape
    return pl.pallas_call(
        functools.partial(_min_prop_kernel, variant),
        out_shape=jax.ShapeDtypeStruct((n, s1, s2), jnp.int32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_WINDOW_VMEM_LIMIT),
        interpret=_interpret() if interpret is None else interpret,
    )(masks_u8, aux_i32)


@functools.partial(jax.jit, static_argnums=(1, 2))
def cc_ids_windows_local(
    masks_u8: jax.Array, interpret: bool | None = None, variant: str | None = None
) -> jax.Array:
    """Per-window CC + compact ids for (N, sh, sw) uint8 masks -> (N, sh, sw)
    int32 1-based component ids (0 = background), one grid step per window.

    Window-bucket shapes (<= _FUSED_IDS_MAX_ELEMS) run the fused
    labels+ranks kernel (hardware-validated: 21.02 MB scoped VMEM at
    512x512, 16.61 MB at 640x256 on v5e).  Larger canvases (the 1024²
    whole-page DB decode) split into labels kernel -> XLA raster cumsum of
    roots -> min-propagate kernel, because the fused kernel's scoped stack
    blows physical VMEM there (see _FUSED_IDS_MAX_ELEMS).  Both paths emit
    identical ids; hardware gate: scripts/check_rank_decode.py
    (interpret-mode tests cannot see Mosaic's scoped-VMEM accounting)."""
    n, s1, s2 = masks_u8.shape
    if variant is None:
        variant = (
            _DEFAULT_VARIANT if s1 * s2 > _FUSED_IDS_MAX_ELEMS
            else _DEFAULT_FUSED_VARIANT
        )
    if s1 * s2 > 1024 * 1024:
        raise ValueError(
            f"cc_ids_windows_local: window {s1}x{s2} exceeds the in-VMEM "
            "fixpoint budget (max 1024*1024 elements, the validated "
            "whole-canvas labels-kernel shape)"
        )
    if s1 * s2 > _FUSED_IDS_MAX_ELEMS:
        labels = cc_windows_local(masks_u8, interpret, variant)  # root lin idx / _CC_BIG
        lin = (
            jax.lax.broadcasted_iota(jnp.int32, (s1, s2), 0) * s2
            + jax.lax.broadcasted_iota(jnp.int32, (s1, s2), 1)
        )[None]
        is_root = (labels == lin) & (masks_u8 != 0)
        rank = (
            jnp.cumsum(is_root.reshape(n, s1 * s2).astype(jnp.int32), axis=1)
            .reshape(n, s1, s2)
        )
        aux0 = jnp.where(is_root, rank, _CC_BIG)
        return min_prop_windows_local(masks_u8, aux0, interpret, variant)
    return pl.pallas_call(
        functools.partial(_cc_ids_kernel, variant),
        out_shape=jax.ShapeDtypeStruct((n, s1, s2), jnp.int32),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_WINDOW_VMEM_LIMIT),
        interpret=_interpret() if interpret is None else interpret,
    )(masks_u8)


@functools.partial(jax.jit, static_argnums=(1, 2))
def cc_windows_local(
    masks_u8: jax.Array, interpret: bool | None = None, variant: str | None = None
) -> jax.Array:
    """Per-window CC for (N, S, S) uint8 masks -> (N, S, S) int32 local root
    indices (_CC_BIG on background), one grid step per window."""
    if variant is None:
        variant = _DEFAULT_VARIANT
    n, s1, s2 = masks_u8.shape
    return pl.pallas_call(
        functools.partial(_cc_window_kernel, variant),
        out_shape=jax.ShapeDtypeStruct((n, s1, s2), jnp.int32),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_WINDOW_VMEM_LIMIT),
        interpret=_interpret() if interpret is None else interpret,
    )(masks_u8)


@jax.jit
def cc_row_sweep(labels: jax.Array, mask_u8: jax.Array) -> jax.Array:
    """Forward+backward segmented min-scan along rows, tiled in row bands."""
    h, w = labels.shape
    r = _fit_band(h, w)
    return pl.pallas_call(
        functools.partial(_scan_kernel, 1),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(h // r,),
        in_specs=[
            pl.BlockSpec((r, w), lambda i: (i, 0)),
            pl.BlockSpec((r, w), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((r, w), lambda i: (i, 0)),
        interpret=_interpret(),
    )(labels, mask_u8)


@jax.jit
def cc_col_sweep(labels: jax.Array, mask_u8: jax.Array) -> jax.Array:
    """Forward+backward segmented min-scan along columns, tiled in strips."""
    h, w = labels.shape
    c = _fit_band(w, h, floor=128)
    if h * c > (1 << 19):
        # the 128-lane tiling floor would blow the scoped-VMEM budget the
        # cap exists to enforce (~9 live i32 copies per block element;
        # 2112x128 strips measured fine on v5e, 4224x128 OOMed in Mosaic);
        # fail loudly instead of OOMing at compile time — canvases this
        # tall should use the XLA CC path (connected_components
        # backend='xla'; the 'auto' route never sends them here).
        raise ValueError(
            f"cc_col_sweep: column strip {h}x{c} exceeds the scoped-VMEM "
            f"budget; use connected_components(backend='xla') for canvases "
            f"taller than {(1 << 19) // 128} rows"
        )
    return pl.pallas_call(
        functools.partial(_scan_kernel, 0),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(w // c,),
        in_specs=[
            pl.BlockSpec((h, c), lambda i: (0, i)),
            pl.BlockSpec((h, c), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((h, c), lambda i: (0, i)),
        interpret=_interpret(),
    )(labels, mask_u8)
