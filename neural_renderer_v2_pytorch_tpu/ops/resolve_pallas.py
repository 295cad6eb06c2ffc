"""Pallas TPU kernels for the face-index (z-buffer) resolve and its
gradient scatter.

TPU-native replacement for the reference's hot CUDA kernel
``face_index_map_forward_safe`` (rasterize_cuda_kernel.cu:52-153).

Design
------
The CUDA kernel is thread-per-pixel, each thread brute-force looping over
ALL faces.  Here the work is organized around what the TPU is good at --
wide vector ops over pixel rows, scalar-core bookkeeping, predictable
DMA -- and around not doing O(pixels x faces) work at all.  Two kernel
modes share all of the per-face math and differ only in how a face finds
the pixels it may cover:

  * ``_windowed_kernel`` (default whenever the image planes fit VMEM and
    the width is lane-aligned): the WHOLE pixel band stays VMEM-resident;
    each face touches only the 8-aligned ``row_window``-row x 128-aligned
    ``col_window``-column slabs covering its bbox, via dynamic sublane /
    lane slices.  No prepass at all -- faces stream in id order straight
    from a reshape, and the degenerate / backface culls are two scalar
    predicates per face.
  * ``_binned_kernel`` (fallback for images too large to keep resident):
    a pure-XLA prepass (``_bin_faces``) bins faces per image tile by
    their bboxes (order-stable argsort compaction, so the sequential
    z-accept order within a tile is preserved) and drops degenerate /
    culled-backface faces once; the kernel then runs on a
    (batch, tile, face-chunk) grid with per-tile accumulators resident
    and the tile's face list streaming through SMEM, each face touching
    only its row windows.

Shared structure:

  1. Per-face math is precomputed once in XLA (``resolve.face_constants``,
     the single source of the rasterization math for every backend):
     all per-pixel quantities are affine in the pixel coords, the
     reference's c1/c2/c3 inside tests are identically the scaled
     barycentrics w2/w0/w1, and w0+w1+w2 is the per-face determinant,
     leaving ~30 VPU ops + 1 divide per face-window (``_face_accept``).
  2. Faces process ``group_size`` per loop iteration: the sequential
     z-accept stays exact (each face tests against the depth after its
     predecessors' updates) while scalar bookkeeping and masked stores
     amortize over the group's union window.
  3. The fused gather variant latches the winning face's vertex coords
     and auxiliary attributes (UVs, normals, texel patches) via masked
     stores -- replacing the reference's per-pixel ``to_map`` gathers
     (utils.py:104-114).
  4. The backward scatter (``scatter_to_faces_pallas``) turns the
     pixel->face gradient segment-sum into predicated one-hot MXU matmuls
     with the whole per-face accumulator VMEM-resident.

Neither windowing nor binning changes results: a face outside a window /
bin cannot win any of its pixels, and both stream faces in ascending id
order, so the output is bit-identical to the XLA reference resolve
(``resolve.py``), which mirrors the same formulas (tested, incl. fuzz).

Measured on v5e (512^2, latch, fwd): 158K faces -- windowed 21.1 ms vs
binned 23.3 ms (and no prepass); 2.5K faces -- both ~1.9 ms.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resolve import (
    DEGENERATE_EPS,
    DEPTH_MIN_DELTA,
    face_backside,
    face_candidate,
    face_constants,
    face_constants_planar,
)


def _vmem_compiler_params(interpret, limit=None):
    """Raise Mosaic's scoped-VMEM limit for kernels whose resident
    output planes exceed the 16 MB default.  The current libtpu snapshot
    enforces the default at COMPILE time ("Scoped allocation with size
    17.00M and limit 16.00M exceeded" -- observed 2026-08 for any
    windowed resolve latching >= 15 planes at 512^2, i.e. every textured
    render), so the windowed/binned resolves pin the limit to the
    ``_windowed_vmem_budget`` ceiling plus stream headroom.  None in
    interpret mode (no Mosaic)."""
    if interpret:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=(limit or _windowed_vmem_budget()) + 32 * 1024 * 1024
    )


def _face_accept(xp, yp, coef, iz, det, bbox, depth, near, far):
    """Accept mask + candidate depth for one face over a pixel window:
    the shared per-pixel math (:func:`resolve.face_candidate` -- the
    single source of the reference semantics for every backend) plus the
    sequential z-buffer tolerance.  Degenerate and backface rejects are
    per-face constants handled once by the binning prepass."""
    out, zp = face_candidate(xp, yp, coef, iz, det, bbox, near, far)
    accept = ~out & (zp <= depth - DEPTH_MIN_DELTA)
    return accept, zp


def _row_windows(bbox, row_base, tile_h, rw, image_size):
    """Tile-local row range covering a face's pixel rows, as (first
    8-aligned start row, number of rw-row windows).  ``row_base`` is the
    GLOBAL image row of the tile's first row (row_start + ty * tile_h for
    row-windowed / tile-sharded rendering).

    Row r has pixel-centre yp = (2r + 1 - S)/S, so the face's NDC y-range
    [ymin, ymax] covers rows in [(ymin*S + S - 1)/2, (ymax*S + S - 1)/2];
    the float clip before the int cast guards against extreme coords.
    Conservative (may include a boundary row that the exact per-pixel bbox
    test then rejects); window starts are clamped to tile_h - rw, and
    re-processing an overlap row is harmless because an accepted face
    cannot re-accept against its own depth (zp <= zp - 1e-4 is false).
    """
    half = (image_size - 1.0) * 0.5
    y_lo = jnp.floor(bbox[2] * (image_size * 0.5) + half)
    y_hi = jnp.ceil(bbox[3] * (image_size * 0.5) + half)
    r_lo = jnp.clip(y_lo - row_base, 0.0, tile_h)
    r_hi = jnp.clip(y_hi - row_base + 1.0, 0.0, tile_h)
    # all-f32 (EXACT: operands are floor/ceil integers well under 2^24,
    # and the correctly-rounded small-int quotients floor identically to
    # integer division) so the caller stacks every window component and
    # converts ONCE -- the per-component int casts used to materialize 4
    # tiny convert+copy kernel pairs per preschedule (kernel census)
    r0 = jnp.floor(r_lo / 8.0) * 8.0
    n_win = jnp.floor((r_hi - r0 + (rw - 1.0)) / rw)
    return r0, n_win



def _col_windows(bbox, cw, image_size):
    """Column range covering a face's pixels, as (first 128-aligned start
    column, number of cw-column windows).  Mirror of :func:`_row_windows`
    for the lane axis: column c has pixel-centre xp = (2c + 1 - S)/S, and
    dynamic lane slices must start at 128-aligned offsets."""
    half = (image_size - 1.0) * 0.5
    x_lo = jnp.floor(bbox[0] * (image_size * 0.5) + half)
    x_hi = jnp.ceil(bbox[1] * (image_size * 0.5) + half)
    c_lo = jnp.clip(x_lo, 0.0, image_size)
    c_hi = jnp.clip(x_hi + 1.0, 0.0, image_size)
    c0 = jnp.floor(c_lo / 128.0) * 128.0
    n_win = jnp.floor((c_hi - c0 + (cw - 1.0)) / cw)
    return c0, n_win


def _set_bit_loop(word, emit):
    """Run ``emit(b)`` for each set bit ``b`` of the scalar ``word`` in
    ascending order, in exactly popcount(word) iterations.  The old
    formulation ran a masked 32-iteration loop per active word (~8
    scalar cycles per CLEAR bit); occupancy words here are sparse, so
    scanning only set bits cuts the scalar path ~10x.  The lowest set
    bit's index comes from a ROUNDED f32 log2: ``word & -word`` isolates
    a power of two, every int32 power of two (including the sign bit,
    whose isolation is INT_MIN -> |.| = 2^31) casts to f32 exactly, and
    log2 of it is an integer up to the backend's log2 approximation
    error -- XLA-CPU computes log2(2^13) = 12.999999, so a bare int cast
    TRUNCATES to the wrong bit (the round-4 parted-scatter corruption);
    adding 0.5 before the cast absorbs any |error| < 0.5.  (A bitcast
    exponent read would be exact by construction but Mosaic only
    supports tpu.bitcast on vectors, not the scalar core.)"""
    def cond(wd):
        return wd != 0
    def body(wd):
        low = wd & (-wd)
        b = (
            jnp.log2(jnp.abs(low.astype(jnp.float32))) + 0.5
        ).astype(jnp.int32)
        emit(b)
        return wd & (wd - 1)
    jax.lax.while_loop(cond, body, word)


def _face_chunks_kernel(fvp_ref, rs_ref, consts_ref, coords_ref, tbl_ref, *,
                        coords_dim, presched=None):
    """Per-chunk face constants (and latch coordinate rows) from planar
    face vertices -- the in-kernel twin of
    :func:`resolve.face_constants_planar` fused with the chunk-major
    relayout.

    One dispatch replaces the XLA stack (17 dynamic-update-slice fusions
    at small face counts) plus the two chunking transposes of
    :func:`_run_windowed` -- ~15 kernels of pure glue on the driver-bench
    config.  Expressions are identical f32 ops in identical order, so the
    output is bit-identical (asserted by tests against the XLA builder on
    both CPU-interpret and compiled TPU).  Zero-padded faces produce
    iz=inf / det=0 rows; every consumer masks faces past ``nf`` before
    any store, so pad values never surface.

    ``presched``: when set (a dict of the windowed resolve's static
    schedule parameters), the kernel ALSO absorbs _run_windowed's XLA
    preschedule (~16 more glue kernels at the bench config):
      * invalid faces (degenerate / culled backface / pad zeros) get the
        off-screen sentinel bbox written straight into ``consts_ref``;
      * each group's union-bbox window tuple (r0, n_rwin, c0, n_cwin)
        lands in ``tbl_ref`` [1, 1, 4, K] at the group's BASE lane
        (k % G == 0), computed lane-wide: log-step ``pltpu.roll`` folds
        give every base lane the min/max over its G-lane group (G is a
        power of two; the cyclic wrap only contaminates non-base lanes),
        then the identical all-f32 window math of
        :func:`_row_windows`/:func:`_col_windows` (exact on these
        integer-valued floats, so bit-identical to the XLA prepass).
    """
    f = fvp_ref[0]  # [3 (coord), 3 (vertex), K]
    x0, y0, z0 = f[0, 0], f[1, 0], f[2, 0]
    x1, y1, z1 = f[0, 1], f[1, 1], f[2, 1]
    x2, y2, z2 = f[0, 2], f[1, 2], f[2, 2]
    C0 = x1 * y2 - x2 * y1
    C1 = x2 * y0 - x0 * y2
    C2 = x0 * y1 - x1 * y0
    A0, B0 = x2 - x1, y1 - y2
    A1, B1 = x0 - x2, y2 - y0
    A2, B2 = x1 - x0, y0 - y1
    det = C0 + C1 + C2
    xmin = jnp.minimum(jnp.minimum(x0, x1), x2)
    xmax = jnp.maximum(jnp.maximum(x0, x1), x2)
    ymin = jnp.minimum(jnp.minimum(y0, y1), y2)
    ymax = jnp.maximum(jnp.maximum(y0, y1), y2)
    if presched is not None:
        valid = jnp.abs(det) >= DEGENERATE_EPS
        if not presched["draw_backside"]:
            coef = (A0, B0, C0, A1, B1, C1, A2, B2, C2)
            valid &= ~face_backside(coef)
        xmin = jnp.where(valid, xmin, 4.0)
        xmax = jnp.where(valid, xmax, -4.0)
        ymin = jnp.where(valid, ymin, 4.0)
        ymax = jnp.where(valid, ymax, -4.0)
    consts_ref[0, 0] = jnp.stack(
        (
            A0, B0, C0,
            A1, B1, C1,
            A2, B2, C2,
            1.0 / z0, 1.0 / z1, 1.0 / z2,
            det,
            xmin, xmax, ymin, ymax,
        ),
        axis=0,
    )
    if coords_dim:
        nc = coords_dim // 3  # vertex-major plane order (x0,y0[,z0],x1,..)
        coords_ref[0, 0] = jnp.stack(
            [f[ci, v] for v in range(3) for ci in range(nc)], axis=0
        )
    if presched is not None:
        G = presched["group_size"]
        # group-union folds: after log2(G) doubling roll-mins, lane k
        # holds the fold over lanes [k, k+G) -- correct at base lanes
        K = xmin.shape[0]
        # 2-D (1, K) operands: Mosaic's roll rejects 1-D shapes
        ux0, ux1, uy0, uy1 = (
            v.reshape(1, K) for v in (xmin, xmax, ymin, ymax)
        )
        s = 1
        while s < G:
            # roll by K - s == -s cyclically (negative shifts rejected):
            # lane k folds lane k + s
            ux0 = jnp.minimum(ux0, pltpu.roll(ux0, K - s, 1))
            ux1 = jnp.maximum(ux1, pltpu.roll(ux1, K - s, 1))
            uy0 = jnp.minimum(uy0, pltpu.roll(uy0, K - s, 1))
            uy1 = jnp.maximum(uy1, pltpu.roll(uy1, K - s, 1))
            s *= 2
        rbf = rs_ref[0].astype(jnp.float32)
        g_r0, g_nr = _row_windows(
            (0.0, 0.0, uy0, uy1), rbf, presched["num_rows"],
            presched["row_window"], presched["image_size"],
        )
        g_c0, g_nc = _col_windows(
            (ux0, ux1, 0.0, 0.0), presched["col_window"],
            presched["image_size"],
        )
        tbl_ref[0, 0] = jnp.concatenate(
            [g_r0, g_nr, g_c0, g_nc], axis=0
        ).astype(jnp.int32)


def _face_chunks_pallas(fvp, face_chunk, coords_dim, interpret,
                        presched=None, row_start=0):
    """[bs, 3, 3, nf] planar face vertices -> chunk-major kernel operands:
    (consts [bs, n_chunks, 17, K], coords [bs, n_chunks, coords_dim, K]
    or None, wtbl [bs, n_chunks, 4, K] int32 or None).  Requires
    128-divisible ``face_chunk`` (lane-aligned blocks); callers fall back
    to the XLA builder otherwise.  ``presched`` (see
    :func:`_face_chunks_kernel`) additionally folds the windowed
    resolve's kill + group-window preschedule into the same dispatch and
    returns the lane-wide window table."""
    bs, _, _, nf = fvp.shape
    pad = (-nf) % face_chunk
    n_chunks = (nf + pad) // face_chunk
    g = jnp.pad(fvp, ((0, 0), (0, 0), (0, 0), (0, pad)))
    out_shape = [
        jax.ShapeDtypeStruct((bs, n_chunks, 17, face_chunk), jnp.float32)
    ]
    out_specs = [
        pl.BlockSpec((1, 1, 17, face_chunk), lambda b, c: (b, c, 0, 0))
    ]
    if coords_dim:
        out_shape.append(
            jax.ShapeDtypeStruct(
                (bs, n_chunks, coords_dim, face_chunk), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, coords_dim, face_chunk), lambda b, c: (b, c, 0, 0)
            )
        )
    if presched is not None:
        out_shape.append(
            jax.ShapeDtypeStruct((bs, n_chunks, 4, face_chunk), jnp.int32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, 4, face_chunk), lambda b, c: (b, c, 0, 0))
        )

    def wrapped(fv_ref, rs_ref, *rest):
        rest = list(rest)
        consts_ref = rest.pop(0)
        coords_ref = rest.pop(0) if coords_dim else None
        tbl_ref = rest.pop(0) if presched is not None else None
        _face_chunks_kernel(
            fv_ref, rs_ref, consts_ref, coords_ref, tbl_ref,
            coords_dim=coords_dim, presched=presched,
        )

    outs = pl.pallas_call(
        wrapped,
        grid=(bs, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, 3, face_chunk), lambda b, c: (b, 0, 0, c)),
            pl.BlockSpec((1,), lambda b, c: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(g, jnp.asarray(row_start, jnp.int32).reshape(1))
    consts = outs[0]
    coords = outs[1] if coords_dim else None
    wtbl = outs[-1] if presched is not None else None
    return consts, coords, wtbl


def _windowed_kernel(
    # SMEM operands
    rs_ref,          # [1] int32: global image row of output row 0
    nf_ref,          # [1] int32: real (unpadded) face count
    consts_ref,      # [1, 1, 17, K] f32: per-face constants, chunk order
                     # (invalid faces carry the KILLED sentinel bbox --
                     # see the prescheduling prepass in _run_windowed)
    tbl_ref,         # [1, 1, gpc, 4] int32: per-group window table
                     # (r0, n_rwin, c0, n_cwin), prescheduled in XLA
    coords_in_ref,   # [1, 1, 9, K] f32 (latch only)
    attrs_ref,       # [1, 1, A, K] f32 (only when num_attrs > 0)
    # outputs (VMEM, resident across the chunk axis)
    index_ref,       # [1, H, W] int32
    depth_ref,       # [1, H, W] f32
    coords_ref,      # [1, 9, H, W] f32 (latch only)
    attr_out_ref,    # [1, A, H, W] f32 (only when num_attrs > 0)
    *,
    image_size,
    plane_width,
    near,
    far,
    face_chunk,
    num_rows,
    row_window,
    col_window,
    num_attrs,
    latch,
    coords_dim,
    group_size,
    group_unroll=1,
    flat_windows=False,
    tbl_wide=False,
):
    """Bin-free z-resolve: the whole pixel band stays VMEM-resident and
    every face touches only the (row_window x col_window) slabs covering
    its bbox.

    ``plane_width`` is the lane-aligned CANVAS width (>= image_size,
    128-divisible); ``image_size`` keeps defining the NDC pixel-centre
    mapping, so padded columns/rows simply hold background that the
    driver crops off -- every size takes this kernel.

    Where ``_binned_kernel`` gets its x-selectivity from a host binning
    prepass (argsort compaction + per-tile constant gathers -- ~17% of
    the step at 158K faces), this kernel gets it from 128-aligned dynamic
    LANE slices, so the prepass disappears entirely: faces stream in id
    order straight from a reshape.  Degenerate/backface culls and the
    per-group union-window coordinates are PRESCHEDULED by a ~20-vector-
    op XLA prepass in ``_run_windowed`` (killed sentinel bboxes + the
    SMEM window table), so the scalar core does no per-face predicate or
    window math at all -- it reads 4 ints per group.  The sequential
    z-accept semantics are identical (id order IS stream order here).
    Preferred whenever the resident planes fit VMEM (see
    ``_run_windowed``); the binned kernel remains for images too large
    to keep resident.
    """
    c = pl.program_id(1)
    rw, cw = row_window, col_window
    S = float(image_size)  # NDC scale; plane_width is the canvas width
    W = plane_width
    row_base = rs_ref[0]

    @pl.when(c == 0)
    def _init():
        depth_ref[...] = jnp.full((1, num_rows, W), far, jnp.float32)
        index_ref[...] = jnp.full((1, num_rows, W), -1, jnp.int32)
        if latch:
            coords_ref[...] = jnp.zeros((1, coords_dim, num_rows, W), jnp.float32)
            if num_attrs:
                attr_out_ref[...] = jnp.zeros(
                    (1, num_attrs, num_rows, W), jnp.float32
                )

    n_in_chunk = jnp.clip(nf_ref[0] - c * face_chunk, 0, face_chunk)

    @pl.when(n_in_chunk > 0)
    def _process_chunk():
        inv = 1.0 / S
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rw, cw), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (rw, cw), 1)
        G = group_size

        def one_group(i):
            base = G * i
            ks = [jnp.minimum(base + j, face_chunk - 1) for j in range(G)]

            def face(kk):
                cs = tuple(consts_ref[0, 0, j, kk] for j in range(17))
                fid = c * face_chunk + kk
                return cs[:9], cs[9:12], cs[12], cs[13:17], fid

            members = [face(k) for k in ks]
            # the prepass killed invalid faces' bboxes (degenerate,
            # culled backface, chunk padding) to an off-screen sentinel,
            # so the per-pixel bbox reject masks them with NO per-face
            # scalar predicates here; the union window coordinates come
            # prescheduled from the SMEM table ([4, K] lane-wide with the
            # group's tuple at its base lane when the fused constants
            # kernel built it, [gpc, 4] from the XLA prepass otherwise)
            if tbl_wide:
                r0 = tbl_ref[0, 0, 0, base]
                n_rwin = tbl_ref[0, 0, 1, base]
                c0 = tbl_ref[0, 0, 2, base]
                n_cwin = tbl_ref[0, 0, 3, base]
            else:
                r0 = tbl_ref[0, 0, i, 0]
                n_rwin = tbl_ref[0, 0, i, 1]
                c0 = tbl_ref[0, 0, i, 2]
                n_cwin = tbl_ref[0, 0, i, 3]

            def do_window(rows, cols, xp, yp):
                d = depth_ref[0, rows, cols]

                accepts = []
                for j in range(G):
                    coef, iz, det, bbox, _fid = members[j]
                    aj, zj = _face_accept(
                        xp, yp, coef, iz, det, bbox, d, near, far
                    )
                    d = jnp.where(aj, zj, d)
                    accepts.append(aj)

                hit = accepts[0]
                for aj in accepts[1:]:
                    hit |= aj
                # NOTE: gating these stores behind a scalar
                # pl.when(jnp.any(hit)) was measured 70% SLOWER
                # (0.36 -> 0.66 ms resolve fwd at 512^2/2.4K,
                # 3 interleaved reps): the branch breaks
                # Mosaic's window-loop pipelining, costing far
                # more than the ~130-cycle fixed per-window
                # store overhead it was meant to skip.
                pltpu.store(depth_ref.at[0, rows, cols], d, mask=hit)

                def cascade(vals):
                    v = vals[0]
                    for j in range(1, G):
                        v = jnp.where(accepts[j], vals[j], v)
                    return v

                win_shape = (rw, cw)
                pltpu.store(
                    index_ref.at[0, rows, cols],
                    cascade([m[4] for m in members])
                    * jnp.ones(win_shape, jnp.int32),
                    mask=hit,
                )
                if latch:
                    for p in range(coords_dim):
                        val = cascade(
                            [coords_in_ref[0, 0, p, k] for k in ks]
                        )
                        pltpu.store(
                            coords_ref.at[0, p, rows, cols],
                            jnp.broadcast_to(val, win_shape),
                            mask=hit,
                        )
                    for a in range(num_attrs):
                        val = cascade([attrs_ref[0, 0, a, k] for k in ks])
                        pltpu.store(
                            attr_out_ref.at[0, a, rows, cols],
                            jnp.broadcast_to(val, win_shape),
                            mask=hit,
                        )

            @pl.when((n_rwin > 0) & (n_cwin > 0))
            def _group():
                if flat_windows:
                    # ONE flat loop over the group's n_rwin * n_cwin
                    # windows (w -> (wr, wc) by scalar div/mod): at large
                    # face counts ~90% of groups cover exactly one window
                    # (the exact-schedule roofline reads 1.09 windows per
                    # group at 512^2 / 158K), so the nested row/col
                    # window loops paid two fori_loop setups per group
                    # for nothing.  COMPILED-ONLY: restructuring the loop
                    # body shifts XLA:CPU's FMA-contraction choices in
                    # face_candidate by ~1 ulp on zp, so interpret mode
                    # keeps the nested structure that is bit-identical to
                    # the XLA resolve; on hardware, Mosaic's contraction
                    # is asserted bit-exact by the battery tier
                    # (tests/test_tpu_hardware.py).
                    def win_body(w, _):
                        wr = w // n_cwin
                        wc = w - wr * n_cwin
                        start_r = pl.multiple_of(
                            jnp.minimum(r0 + wr * rw, num_rows - rw), 8
                        )
                        rows = pl.ds(start_r, rw)
                        gr = row_base + start_r + row_iota
                        yp = (2.0 * gr.astype(jnp.float32) + (1.0 - S)) * inv
                        start_c = pl.multiple_of(
                            jnp.minimum(c0 + wc * cw, W - cw), 128
                        )
                        cols = pl.ds(start_c, cw)
                        gc = start_c + col_iota
                        xp = (2.0 * gc.astype(jnp.float32) + (1.0 - S)) * inv
                        do_window(rows, cols, xp, yp)
                        return 0

                    jax.lax.fori_loop(0, n_rwin * n_cwin, win_body, 0)
                else:
                    def rwin_body(wr, _):
                        start_r = pl.multiple_of(
                            jnp.minimum(r0 + wr * rw, num_rows - rw), 8
                        )
                        rows = pl.ds(start_r, rw)
                        gr = row_base + start_r + row_iota
                        yp = (2.0 * gr.astype(jnp.float32) + (1.0 - S)) * inv

                        def cwin_body(wc, _):
                            start_c = pl.multiple_of(
                                jnp.minimum(c0 + wc * cw, W - cw), 128
                            )
                            cols = pl.ds(start_c, cw)
                            gc = start_c + col_iota
                            xp = (2.0 * gc.astype(jnp.float32) + (1.0 - S)) * inv
                            do_window(rows, cols, xp, yp)
                            return 0

                        jax.lax.fori_loop(0, n_cwin, cwin_body, 0)
                        return 0

                    jax.lax.fori_loop(0, n_rwin, rwin_body, 0)

        U = group_unroll

        def group_body(i, _):
            for u in range(U):
                one_group(i * U + u)
            return 0

        jax.lax.fori_loop(
            0, (n_in_chunk + G * U - 1) // (G * U), group_body, 0
        )


def _run_windowed(
    face_vertices,
    face_attrs,
    image_size,
    near,
    far,
    draw_backside,
    face_chunk,
    row_window,
    col_window,
    latch,
    interpret,
    group_size=2,
    row_start=0,
    num_rows=None,
    coords_dim=9,
    planar_faces=False,
    group_unroll=1,
):
    """Driver for the bin-free windowed kernel: reshape faces into chunks
    (no binning, no gathers) -> pallas_call.  Same return contract as
    :func:`_run_binned`.

    Arbitrary sizes run on a padded canvas (rows to 8, width to 128 --
    the kernel's NDC mapping still uses ``image_size``) and the outputs
    are cropped, so no size falls back off this kernel.

    ``planar_faces``: ``face_vertices`` is coordinate-planar
    [bs, 3 (coord), 3 (vertex), nf] (the row gather's native layout) --
    the per-face constants and coordinate chunks are then built without
    ever materializing [bs, nf, 3, 3] (whose minor dims lane-pad 42x
    under TPU tiling; measured ~2.6 ms of pure layout copies at 158K
    faces).  Kernel inputs are bit-identical either way.
    """
    if planar_faces:
        bs, nf = face_vertices.shape[0], face_vertices.shape[-1]
    else:
        bs, nf = face_vertices.shape[:2]
    if num_rows is None:
        num_rows = image_size
    out_rows, out_cols = num_rows, image_size
    num_rows = -(-num_rows // 8) * 8
    plane_w = -(-image_size // 128) * 128
    num_attrs = 0 if face_attrs is None else face_attrs.shape[-1]
    assert row_window % 8 == 0 and col_window % 128 == 0
    row_window = min(row_window, num_rows)
    col_window = min(col_window, plane_w)

    pad = (-nf) % face_chunk
    nf_p = nf + pad
    n_chunks = nf_p // face_chunk

    def chunked(per_face):
        d = per_face.shape[-1]
        g = jnp.pad(per_face, ((0, 0), (0, pad), (0, 0)))
        return g.reshape(bs, n_chunks, face_chunk, d).transpose(0, 1, 3, 2)

    def chunked_planar(per_face):  # [bs, d, nf] -> [bs, n_chunks, d, K]
        d = per_face.shape[1]
        g = jnp.pad(per_face, ((0, 0), (0, 0), (0, pad)))
        return g.reshape(bs, d, n_chunks, face_chunk).transpose(0, 2, 1, 3)

    assert face_chunk % group_size == 0, (face_chunk, group_size)
    gpc = face_chunk // group_size
    if gpc % group_unroll:
        group_unroll = 1  # unroll must tile the group count exactly

    coords_ch = None
    wtbl = None
    if (
        planar_faces and face_chunk % 128 == 0 and not interpret
        and _FUSED_PRESCHED
    ):
        # single fused dispatch for constants + latch coords + the FULL
        # group preschedule (kill + union windows -- see
        # _face_chunks_kernel).  Compiled-only: Mosaic and XLA:TPU
        # contract the cross products to the same FMAs (verified
        # bitwise vs the XLA builder on v5e; asserted by the hardware
        # tier), while interpret mode evaluates op-by-op and loses the
        # contraction (1-ulp diffs on C0/C1/C2/det), so CPU tests keep
        # the XLA builder below.
        consts_ch, coords_ch, wtbl = _face_chunks_pallas(
            face_vertices, face_chunk,
            coords_dim if latch else 0, interpret,
            presched=dict(
                draw_backside=draw_backside, group_size=group_size,
                num_rows=num_rows, row_window=row_window,
                col_window=col_window, image_size=image_size,
            ),
            row_start=row_start,
        )
    elif planar_faces:
        consts_ch = chunked_planar(face_constants_planar(face_vertices))
    else:
        consts_ch = chunked(face_constants(face_vertices))  # [bs, nf, 17]

    if wtbl is None:
        # --- prescheduled groups (vectorized XLA prepass; the fused
        # constants kernel above absorbs all of this when it runs) ------
        # The kernel used to spend ~150+ scalar cycles per face group on
        # per-face valid predicates, the union-bbox fold, and the window
        # integer math.  All of that is data the constants already
        # determine, so it moves here as ~20 fused vector ops over
        # [bs, nc, K]:
        #   1. KILL invalid faces' bboxes (degenerate / culled backface /
        #      chunk padding) to an impossible sentinel -- the kernel's
        #      existing per-pixel bbox reject then makes them accept
        #      nothing, bit-exactly replacing the scalar `valids` masks.
        #   2. Precompute each G-face group's union-bbox window
        #      coordinates (r0, n_rwin, c0, n_cwin) into an SMEM table;
        #      an all-invalid group yields n_rwin <= 0 and its window
        #      loops never run.
        det = consts_ch[:, :, 12]                     # [bs, nc, K]
        valid = jnp.abs(det) >= DEGENERATE_EPS
        if not draw_backside:
            valid &= ~face_backside(
                tuple(consts_ch[:, :, j] for j in range(9))
            )
        sent = jnp.asarray([4.0, -4.0, 4.0, -4.0], jnp.float32)
        bbox_k = jnp.where(
            valid[:, :, None], consts_ch[:, :, 13:17],
            sent[None, None, :, None],
        )
        consts_ch = jnp.concatenate([consts_ch[:, :, :13], bbox_k], axis=2)

        gb = bbox_k.reshape(bs, n_chunks, 4, gpc, group_size)
        xmin_u, xmax_u = gb[:, :, 0].min(-1), gb[:, :, 1].max(-1)
        ymin_u, ymax_u = gb[:, :, 2].min(-1), gb[:, :, 3].max(-1)
        # the SAME _row_windows/_col_windows the kernel used to evaluate
        # per group, applied vectorized over every group at once
        # (identical schedule; and any conservative cover stays bit-exact
        # anyway -- re-processing a row cannot re-accept)
        rbf = jnp.asarray(row_start, jnp.float32)
        g_r0, g_nr = _row_windows(
            (0.0, 0.0, ymin_u, ymax_u), rbf, num_rows, row_window,
            image_size,
        )
        g_c0, g_nc = _col_windows(
            (xmin_u, xmax_u, 0.0, 0.0), col_window, image_size
        )
        tbl = jnp.stack([g_r0, g_nr, g_c0, g_nc], -1).astype(jnp.int32)
    else:
        tbl = wtbl  # [bs, nc, 4, K] lane-wide (base lanes valid)

    rs_arr = jnp.asarray(row_start, jnp.int32).reshape(1)
    nf_arr = jnp.full((1,), nf, jnp.int32)
    inputs = [rs_arr, nf_arr, consts_ch, tbl]

    def smem1(shape):
        return pl.BlockSpec(shape, lambda b, c: (0,) * len(shape),
                            memory_space=pltpu.SMEM)

    def chunk_spec(d):
        return pl.BlockSpec(
            (1, 1, d, face_chunk), lambda b, c: (b, c, 0, 0),
            memory_space=pltpu.SMEM,
        )

    in_specs = [
        smem1((1,)), smem1((1,)), chunk_spec(17),
        pl.BlockSpec(
            (1, 1, 4, face_chunk) if wtbl is not None else (1, 1, gpc, 4),
            lambda b, c: (b, c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    if latch:
        if coords_ch is not None:
            inputs.append(coords_ch)
        elif planar_faces:
            # plane order (x0,y0[,z0],x1,...): vertex-major of coordinate
            fvp = face_vertices if coords_dim == 9 else face_vertices[:, :2]
            coords_src = fvp.transpose(0, 2, 1, 3).reshape(bs, coords_dim, nf)
            inputs.append(chunked_planar(coords_src))
        else:
            coords_src = (
                face_vertices.reshape(bs, nf, 9) if coords_dim == 9
                else face_vertices[..., :2].reshape(bs, nf, 6)
            )
            inputs.append(chunked(coords_src))
        in_specs.append(chunk_spec(coords_dim))
    if num_attrs:
        inputs.append(chunked(face_attrs))
        in_specs.append(chunk_spec(num_attrs))

    whole = lambda b, c: (b, 0, 0)
    out_specs = [
        pl.BlockSpec((1, num_rows, plane_w), whole),
        pl.BlockSpec((1, num_rows, plane_w), whole),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bs, num_rows, plane_w), jnp.int32),
        jax.ShapeDtypeStruct((bs, num_rows, plane_w), jnp.float32),
    ]
    if latch:
        out_specs.append(
            pl.BlockSpec(
                (1, coords_dim, num_rows, plane_w),
                lambda b, c: (b, 0, 0, 0),
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (bs, coords_dim, num_rows, plane_w), jnp.float32
            )
        )
        if num_attrs:
            out_specs.append(
                pl.BlockSpec(
                    (1, num_attrs, num_rows, plane_w),
                    lambda b, c: (b, 0, 0, 0),
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (bs, num_attrs, num_rows, plane_w), jnp.float32
                )
            )

    kernel = functools.partial(
        _windowed_kernel,
        image_size=image_size,
        plane_width=plane_w,
        near=float(near),
        far=float(far),
        face_chunk=face_chunk,
        num_rows=num_rows,
        row_window=row_window,
        col_window=col_window,
        num_attrs=num_attrs,
        latch=latch,
        coords_dim=coords_dim,
        group_size=group_size,
        group_unroll=group_unroll,
        flat_windows=(
            not interpret if _WINDOW_LOOP == "auto" else _WINDOW_LOOP == "flat"
        ),
        tbl_wide=wtbl is not None,
    )

    def wrapped(*refs):
        refs = list(refs)
        rs_r = refs.pop(0)
        nf_r = refs.pop(0)
        consts_r = refs.pop(0)
        tbl_r = refs.pop(0)
        coords_in_r = refs.pop(0) if latch else None
        attrs_r = refs.pop(0) if num_attrs else None
        index_r = refs.pop(0)
        depth_r = refs.pop(0)
        coords_r = refs.pop(0) if latch else None
        attr_out_r = refs.pop(0) if (latch and num_attrs) else None
        kernel(rs_r, nf_r, consts_r, tbl_r, coords_in_r, attrs_r, index_r,
               depth_r, coords_r, attr_out_r)

    outs = pl.pallas_call(
        wrapped,
        grid=(bs, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_vmem_compiler_params(interpret),
    )(*inputs)

    def crop(x):  # padded canvas -> requested window
        return x[..., :out_rows, :out_cols]

    index, depth = crop(outs[0]), crop(outs[1])
    coords = crop(outs[2]) if latch else None
    attr_map = crop(outs[3]) if (latch and num_attrs) else None
    return index, depth, coords, attr_map


def _binned_kernel(
    # SMEM operands
    rs_ref,          # [1] int32: global image row of output row 0
    cnt_ref,         # [1, 1, n_tiles] int32: faces binned to each tile
    ids_ref,         # [1, 1, 1, K] int32: original face ids, bin order
    consts_ref,      # [1, 1, 17, K] f32: binned per-face constants
                     # (tail slots past cnt carry KILLED sentinel bboxes)
    tbl_ref,         # [1, 1, gpc, 2] int32: per-group (r0, n_rwin)
    coords_in_ref,   # [1, 1, 9, K] f32: binned vertex coords (latch only)
    attrs_ref,       # [1, 1, A, K] f32 (only when num_attrs > 0)
    # outputs (VMEM, resident across the chunk axis)
    index_ref,       # [1, TH, TW] int32
    depth_ref,       # [1, TH, TW] f32
    # latch outputs (only when latch)
    coords_ref,      # [1, 9, TH, TW] f32
    attr_out_ref,    # [1, A, TH, TW] f32 (only when num_attrs > 0)
    *,
    image_size,
    near,
    far,
    face_chunk,
    tile_h,
    tile_w,
    n_tile_x,
    row_window,
    num_attrs,
    latch,
    coords_dim,
    group_size,
):
    """Z-resolve over host-binned per-tile face lists.

    Every face in this tile's bin overlaps the tile (the host prepass
    culled misses, degenerates, and backfaces and compacted survivors in
    face-id order -- see ``_bin_faces``), so there is no per-face branch
    at all: the loop covers exactly ``cnt - c*K`` faces, ``group_size``
    per iteration (see ``group_body``; 2 measures best -- wider groups
    lose to union-window growth), and each group touches only the
    ``row_window``-row slabs covering its pixel rows.  The sequential
    z-buffer accept (kernel.cu:145-148) is preserved because compaction
    is order-stable, the group combine tests each face against the depth
    after its predecessors' updates, and a pixel's winner depends only on
    faces that cover it.
    """
    t = pl.program_id(1)
    c = pl.program_id(2)
    ty = t // n_tile_x
    tx = t % n_tile_x
    rw = row_window
    row_base = rs_ref[0] + ty * tile_h  # global image row of this tile's row 0

    @pl.when(c == 0)
    def _init():
        depth_ref[...] = jnp.full((1, tile_h, tile_w), far, jnp.float32)
        index_ref[...] = jnp.full((1, tile_h, tile_w), -1, jnp.int32)
        if latch:
            coords_ref[...] = jnp.zeros((1, coords_dim, tile_h, tile_w), jnp.float32)
            if num_attrs:
                attr_out_ref[...] = jnp.zeros(
                    (1, num_attrs, tile_h, tile_w), jnp.float32
                )

    n_in_chunk = jnp.clip(cnt_ref[0, 0, t] - c * face_chunk, 0, face_chunk)

    @pl.when(n_in_chunk > 0)
    def _process_chunk():
        col = tx * tile_w + jax.lax.broadcasted_iota(jnp.int32, (rw, tile_w), 1)
        inv = 1.0 / image_size
        xp = (2.0 * col.astype(jnp.float32) + (1.0 - image_size)) * inv
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (rw, tile_w), 0)

        G = group_size

        def group_body(i, _):
            # G consecutive faces per iteration, over the union of their
            # row windows: the sequential z-accept stays exact (each face
            # tests against the depth after its predecessors' updates),
            # the loop/scalar overhead divides by G, and the latch stores
            # merge into one masked store per plane for the whole group.
            # Consecutive bin entries are id-adjacent and meshes are
            # spatially coherent, so the union row range is barely wider
            # than each face's own.
            base = G * i
            # clamp trailing reads in-bounds for non-multiple counts; the
            # results are masked out by their valid flags
            ks = [jnp.minimum(base + j, face_chunk - 1) for j in range(G)]

            def face(kk):
                cs = tuple(consts_ref[0, 0, j, kk] for j in range(17))
                return cs[:9], cs[9:12], cs[12], cs[13:17], ids_ref[0, 0, 0, kk]

            members = [face(k) for k in ks]
            # tail slots (faces that missed this tile) carry KILLED
            # sentinel bboxes from the prepass, so no per-face scalar
            # predicates run here; the union row-window coordinates come
            # prescheduled from the SMEM table
            r0 = tbl_ref[0, 0, i, 0]
            n_win = tbl_ref[0, 0, i, 1]

            def win_body(w, _):
                # r0, rw, tile_h are all 8-aligned; tell Mosaic so the
                # dynamic sublane slice compiles to aligned vector ops
                start = pl.multiple_of(
                    jnp.minimum(r0 + w * rw, tile_h - rw), 8
                )
                rows = pl.ds(start, rw)
                d = depth_ref[0, rows, :]
                gr = row_base + start + row_iota
                yp = (2.0 * gr.astype(jnp.float32) + (1.0 - image_size)) * inv

                accepts = []
                for j in range(G):
                    coef, iz, det, bbox, _fid = members[j]
                    aj, zj = _face_accept(
                        xp, yp, coef, iz, det, bbox, d, near, far
                    )
                    d = jnp.where(aj, zj, d)
                    accepts.append(aj)

                hit = accepts[0]
                for aj in accepts[1:]:
                    hit |= aj
                pltpu.store(depth_ref.at[0, rows, :], d, mask=hit)

                def cascade(vals):
                    v = vals[0]
                    for j in range(1, G):
                        v = jnp.where(accepts[j], vals[j], v)
                    return v

                pltpu.store(
                    index_ref.at[0, rows, :],
                    cascade([m[4] for m in members])
                    * jnp.ones((rw, tile_w), jnp.int32),
                    mask=hit,
                )
                if latch:
                    win_shape = (rw, tile_w)
                    for j in range(coords_dim):
                        val = cascade(
                            [coords_in_ref[0, 0, j, k] for k in ks]
                        )
                        pltpu.store(
                            coords_ref.at[0, j, rows, :],
                            jnp.broadcast_to(val, win_shape),
                            mask=hit,
                        )
                    for a in range(num_attrs):
                        val = cascade([attrs_ref[0, 0, a, k] for k in ks])
                        pltpu.store(
                            attr_out_ref.at[0, a, rows, :],
                            jnp.broadcast_to(val, win_shape),
                            mask=hit,
                        )
                return 0

            jax.lax.fori_loop(0, n_win, win_body, 0)
            return 0

        jax.lax.fori_loop(0, (n_in_chunk + G - 1) // G, group_body, 0)


def _bin_faces(consts, image_size, n_tile_y, n_tile_x, tile_h, tile_w,
               draw_backside, row_start=0):
    """Order-stable per-tile face binning (pure XLA prepass).

    Args:
      consts: [bs, nf, 17] per-face constants (:func:`resolve.face_constants`).
      row_start: global image row of the first output row (may be traced;
        nonzero for row-windowed / tile-sharded rendering).

    Returns (order [bs, n_tiles, nf] int32, cnt [bs, n_tiles] int32): for
    each image tile, the face ids overlapping it (by the same strict
    pixel-centre bbox test the kernel would apply), compacted to the
    front in ascending id order.  Degenerate (|det| < 1e-8) and culled
    backfaces are excluded here once instead of per (face, tile), using
    the same shared constants the kernel consumes.
    """
    bs, nf = consts.shape[:2]
    coef = tuple(consts[..., j] for j in range(9))
    det = consts[..., 12]
    xmin, xmax = consts[..., 13], consts[..., 14]
    ymin, ymax = consts[..., 15], consts[..., 16]

    valid = jnp.abs(det) >= DEGENERATE_EPS
    if not draw_backside:
        valid &= ~face_backside(coef)

    inv = 1.0 / image_size
    def lo(t0):  # NDC of a tile's first pixel centre
        return (2.0 * t0 + (1.0 - image_size)) * inv
    def hi(t0, ext):  # NDC of a tile's last pixel centre
        return (2.0 * (t0 + ext - 1) + (1.0 - image_size)) * inv

    tx0 = jnp.arange(n_tile_x, dtype=jnp.float32) * tile_w
    ty0 = row_start + jnp.arange(n_tile_y, dtype=jnp.float32) * tile_h
    x_ov = ~(
        (xmax[..., None] < lo(tx0)) | (hi(tx0, tile_w) < xmin[..., None])
    )  # [bs, nf, Tx]
    y_ov = ~(
        (ymax[..., None] < lo(ty0)) | (hi(ty0, tile_h) < ymin[..., None])
    )  # [bs, nf, Ty]
    hit = valid[..., None, None] & y_ov[..., :, None] & x_ov[..., None, :]
    hit = hit.reshape(bs, nf, n_tile_y * n_tile_x).transpose(0, 2, 1)

    # order-stable binary-key compaction: hits go to positions 0..cnt-1
    # in id order, misses fill the tail.  A stable argsort of the boolean
    # keys is the fastest formulation on TPU (device-measured: ~0 ms at
    # 2.5K faces, 1.3 ms at 158K -- a cumsum+scatter alternative costs
    # 0.5 / 3.4 ms because XLA TPU scatter serializes).
    order = jnp.argsort(~hit, axis=-1, stable=True).astype(jnp.int32)
    cnt = jnp.sum(hit, axis=-1).astype(jnp.int32)
    return order, cnt


def _run_binned(
    face_vertices,
    face_attrs,
    image_size,
    near,
    far,
    draw_backside,
    face_chunk,
    tile,
    row_window,
    latch,
    interpret,
    group_size=2,
    row_start=0,
    num_rows=None,
    coords_dim=9,
):
    """Common driver: bin -> gather bins -> pallas_call.

    ``row_start``/``num_rows`` select a horizontal row window of the image
    (the tile-sharded path renders only its own band; ``row_start`` may be
    traced, e.g. ``axis_index('tile') * rows`` inside shard_map).

    Returns (face_index_map, depth, coords [bs,9,H,W] or None, attrs or
    None) with H = num_rows; depth is ``far`` on background (the combine
    operand for face-sharded rendering).
    """
    bs, nf = face_vertices.shape[:2]
    if num_rows is None:
        num_rows = image_size
    # padded canvas (rows to 8, width to 128; NDC mapping keeps
    # image_size) so every size takes the kernel -- outputs are cropped
    out_rows, out_cols = num_rows, image_size
    num_rows = -(-num_rows // 8) * 8
    plane_w = -(-image_size // 128) * 128
    num_attrs = 0 if face_attrs is None else face_attrs.shape[-1]
    if tile is None:
        # pick the tallest tile whose resident planes (index + depth +
        # latched coords/attrs) fit VMEM with buffering headroom.  The
        # width must be lane-aligned (128-divisible); the height any
        # 8-multiple divisor of the padded row count.
        planes = 2 + ((9 + num_attrs) if latch else 0)
        tw = 128
        budget = 10 * 1024 * 1024
        th = None
        for cand in range(min(512, num_rows), 7, -8):
            if num_rows % cand == 0 and planes * cand * tw * 8 <= budget:
                th = cand
                break
        if th is None:
            th = 8
        tile = (th, tw)
    tile_h, tile_w = tile
    row_window = min(row_window, tile_h)
    assert num_rows % tile_h == 0 and plane_w % tile_w == 0
    assert tile_h % 8 == 0 and row_window % 8 == 0
    n_tile_y = num_rows // tile_h
    n_tile_x = plane_w // tile_w
    n_tiles = n_tile_y * n_tile_x

    consts = face_constants(face_vertices)
    order, cnt = _bin_faces(
        consts, image_size, n_tile_y, n_tile_x, tile_h, tile_w,
        draw_backside, row_start=row_start,
    )

    pad = (-nf) % face_chunk
    nf_p = nf + pad
    n_chunks = nf_p // face_chunk

    # gather each bin's per-face constants (and coords/attrs for the
    # latch path) in bin order; pad the tail.  Chunks are laid out
    # coord-major for cheap SMEM scalar reads, with the (tile, chunk)
    # axes flattened so every SMEM block's trailing dims equal the array
    # dims (a Pallas lowering requirement): [bs, T*nc, C, K]
    def bin_gather(per_face):
        d = per_face.shape[-1]
        g = jnp.take_along_axis(per_face[:, None], order[..., None], axis=2)
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return g.reshape(bs, n_tiles * n_chunks, face_chunk, d).transpose(
            0, 1, 3, 2
        )

    consts_cm = bin_gather(consts)
    ids = jnp.pad(order, ((0, 0), (0, 0), (0, pad)))
    ids = ids.reshape(bs, n_tiles * n_chunks, 1, face_chunk)

    # --- prescheduled groups (mirror of _run_windowed's prepass) --------
    # The binning order is a FULL permutation, so a chunk's tail slots
    # past cnt hold real face ids that missed this tile and must accept
    # nothing: kill their bboxes to the off-screen sentinel (replacing
    # the kernel's per-face tail predicates), then preschedule each
    # G-face group's row-window coordinates per tile into an SMEM table.
    assert face_chunk % group_size == 0, (face_chunk, group_size)
    gpc = face_chunk // group_size
    slot = jnp.arange(n_chunks * face_chunk, dtype=jnp.int32).reshape(
        1, 1, n_chunks, face_chunk
    )
    alive = (slot < cnt[:, :, None, None]).reshape(
        bs, n_tiles * n_chunks, 1, face_chunk
    )
    sent = jnp.asarray([4.0, -4.0, 4.0, -4.0], jnp.float32)
    bbox_k = jnp.where(
        alive, consts_cm[:, :, 13:17], sent[None, None, :, None]
    )
    consts_cm = jnp.concatenate([consts_cm[:, :, :13], bbox_k], axis=2)
    ymin_u = bbox_k[:, :, 2].reshape(bs, -1, gpc, group_size).min(-1)
    ymax_u = bbox_k[:, :, 3].reshape(bs, -1, gpc, group_size).max(-1)
    pos = jnp.arange(n_tiles * n_chunks, dtype=jnp.int32)
    tile_y = (pos // n_chunks) // n_tile_x
    rbf = (
        jnp.asarray(row_start, jnp.float32)
        + tile_y.astype(jnp.float32) * tile_h
    )[None, :, None]
    g_r0, g_nr = _row_windows(
        (0.0, 0.0, ymin_u, ymax_u), rbf, tile_h, row_window, image_size
    )
    tbl = jnp.stack([g_r0, g_nr], -1).astype(jnp.int32)  # [bs, T*nc, gpc, 2]

    rs_arr = jnp.asarray(row_start, jnp.int32).reshape(1)
    inputs = [rs_arr, cnt[:, None, :], ids, consts_cm, tbl]
    nc = n_chunks
    def chunk_spec(d):
        return pl.BlockSpec(
            (1, 1, d, face_chunk),
            lambda b, t, c: (b, t * nc + c, 0, 0),
            memory_space=pltpu.SMEM,
        )
    in_specs = [
        pl.BlockSpec(
            (1,), lambda b, t, c: (0,), memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 1, n_tiles), lambda b, t, c: (b, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        pl.BlockSpec(
            (1, 1, 1, face_chunk),
            lambda b, t, c: (b, t * nc + c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
        chunk_spec(17),
        pl.BlockSpec(
            (1, 1, gpc, 2),
            lambda b, t, c: (b, t * nc + c, 0, 0),
            memory_space=pltpu.SMEM,
        ),
    ]
    if latch:
        coords_src = (
            face_vertices.reshape(bs, nf, 9) if coords_dim == 9
            else face_vertices[..., :2].reshape(bs, nf, 6)
        )
        inputs.append(bin_gather(coords_src))
        in_specs.append(chunk_spec(coords_dim))
    if num_attrs:
        inputs.append(bin_gather(face_attrs))
        in_specs.append(chunk_spec(num_attrs))

    tile_idx = lambda b, t, c: (b, t // n_tile_x, t % n_tile_x)
    out_specs = [
        pl.BlockSpec((1, tile_h, tile_w), tile_idx),
        pl.BlockSpec((1, tile_h, tile_w), tile_idx),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bs, num_rows, plane_w), jnp.int32),
        jax.ShapeDtypeStruct((bs, num_rows, plane_w), jnp.float32),
    ]
    if latch:
        out_specs.append(
            pl.BlockSpec(
                (1, coords_dim, tile_h, tile_w),
                lambda b, t, c: (b, 0, t // n_tile_x, t % n_tile_x),
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (bs, coords_dim, num_rows, plane_w), jnp.float32
            )
        )
        if num_attrs:
            out_specs.append(
                pl.BlockSpec(
                    (1, num_attrs, tile_h, tile_w),
                    lambda b, t, c: (b, 0, t // n_tile_x, t % n_tile_x),
                )
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (bs, num_attrs, num_rows, plane_w), jnp.float32
                )
            )

    kernel = functools.partial(
        _binned_kernel,
        image_size=float(image_size),
        near=float(near),
        far=float(far),
        face_chunk=face_chunk,
        tile_h=tile_h,
        tile_w=tile_w,
        n_tile_x=n_tile_x,
        row_window=row_window,
        num_attrs=num_attrs,
        latch=latch,
        coords_dim=coords_dim,
        group_size=group_size,
    )

    def wrapped(*refs):
        refs = list(refs)
        rs_r = refs.pop(0)
        cnt_r = refs.pop(0)
        ids_r = refs.pop(0)
        consts_r = refs.pop(0)
        tbl_r = refs.pop(0)
        coords_in_r = refs.pop(0) if latch else None
        attrs_r = refs.pop(0) if num_attrs else None
        index_r = refs.pop(0)
        depth_r = refs.pop(0)
        coords_r = refs.pop(0) if latch else None
        attr_out_r = refs.pop(0) if (latch and num_attrs) else None
        kernel(rs_r, cnt_r, ids_r, consts_r, tbl_r, coords_in_r, attrs_r,
               index_r, depth_r, coords_r, attr_out_r)

    outs = pl.pallas_call(
        wrapped,
        grid=(bs, n_tiles, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_vmem_compiler_params(interpret),
        interpret=interpret,
    )(*inputs)

    def crop(x):  # padded canvas -> requested window
        return x[..., :out_rows, :out_cols]

    index, depth = crop(outs[0]), crop(outs[1])
    coords = crop(outs[2]) if latch else None
    attr_map = crop(outs[3]) if (latch and num_attrs) else None
    return index, depth, coords, attr_map


@functools.lru_cache(maxsize=None)
def _probe_vmem_budget(budget):
    """True iff Mosaic accepts a kernel holding ``budget`` bytes of
    VMEM-resident f32 output on the current backend.  AOT compile only
    (``.lower().compile()``) -- nothing executes; an over-budget kernel
    fails here instead of inside the user's first render."""
    rows = max(budget // 4 // 128, 8)
    def k(o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
    fn = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        compiler_params=_vmem_compiler_params(False, limit=budget),
    )
    try:
        jax.jit(fn).lower().compile()
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def _windowed_vmem_budget():
    """Resident-plane budget for the windowed kernel, derived from the
    device generation (v5e measured working at 64 MB resident: VMEM is
    128 MB there; older generations have 16-32 MB, so large images must
    take the binned kernel instead of failing to compile).

    ``NRV2_WINDOWED_VMEM_BUDGET`` (bytes) overrides.  On generations this
    code has NOT been measured on, the guess is validated by probe
    compiles at decreasing budgets -- a wrong guess degrades to the
    binned kernel rather than hard-failing the user's first compile."""
    env = os.environ.get("NRV2_WINDOWED_VMEM_BUDGET")
    if env:
        return int(env)
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # uninitialized backend: be conservative
        kind = ""
    if any(t in kind for t in ("v5 lite", "v5e", "v5p", "v6", "v7")):
        return 64 * 1024 * 1024  # measured working (v5e)
    if "cpu" in kind or not kind:
        return 64 * 1024 * 1024  # interpret mode: no VMEM limit applies
    # untested generation (v2-v4 have 16-32 MB VMEM): probe, don't guess
    for budget in (12, 6, 3):
        if _probe_vmem_budget(budget * 1024 * 1024):
            return budget * 1024 * 1024
    return 0  # every size takes the binned kernel


def _pick_mode(mode, image_size, num_rows, latch, num_attrs):
    """'windowed' (bin-free, whole band resident) whenever the resident
    planes fit VMEM; 'binned' otherwise.  Both kernels pad the canvas to
    (8-row, 128-lane) alignment internally, so layout never forces a
    mode -- sizing uses the padded plane dims."""
    if mode != "auto":
        return mode
    if num_rows is None:
        num_rows = image_size
    rows_p = -(-num_rows // 8) * 8
    plane_w = -(-image_size // 128) * 128
    planes = 2 + ((9 + num_attrs) if latch else 0)
    if planes * rows_p * plane_w * 4 > _windowed_vmem_budget():
        return "binned"
    return "windowed"


@functools.partial(
    jax.jit,
    static_argnames=(
        "image_size", "near", "far", "draw_backside", "face_chunk", "tile",
        "row_window", "interpret", "num_rows", "mode", "group_size",
        "latch_z", "planar_faces",
    ),
)
def resolve_gather_pallas(
    face_vertices,
    face_attrs,
    image_size,
    near=0.1,
    far=100.0,
    draw_backside=True,
    face_chunk=256,
    tile=None,
    row_window=None,
    interpret=False,
    row_start=0,
    num_rows=None,
    mode="auto",
    group_size=None,
    latch_z=True,
    planar_faces=False,
):
    """Fused z-resolve + winner-attribute gather (forward only).

    Args:
      face_vertices: [bs, nf, 3, 3] float32 NDC face vertices, or the
        coordinate-planar [bs, 3, 3, nf] layout when ``planar_faces``
        (see :func:`_run_windowed` -- avoids the lane-padded [nf, 3, 3]
        materialization; outputs are bit-identical).
      face_attrs: [bs, nf, A] float32 auxiliary per-face attributes to
        latch for the winning face (e.g. flattened UV triangles), or None.
      row_start/num_rows: optional row window (tile-sharded rendering);
        ``row_start`` may be traced, ``num_rows`` is static.
      latch_z: when False latch only the winner's XY coords (6 planes,
        layout x0,y0,x1,y1,x2,y2) -- silhouette rendering never reads z,
        so the kernel skips a third of its latch stores.

    Returns (channel-planar, the kernel's native layout; H = num_rows):
      (face_index_map [bs,H,W] i32,
       fvm_planar [bs,9,H,W] (or [bs,6,H,W] when not latch_z) f32 winner
       vertex coords -- 0 on background,
       attr_planes [bs,A,H,W] f32 or None).

    Gradients are wired up by ``ops.gather_resolve.resolve_and_gather``
    (scatter-add backward); this function itself is non-differentiable.
    """
    num_attrs = 0 if face_attrs is None else face_attrs.shape[-1]
    coords_dim = 9 if latch_z else 6
    nf = face_vertices.shape[-1] if planar_faces else face_vertices.shape[1]
    if group_size is None:
        # tuned on v5e at 512^2 (benchmarks/tune_resolve.py): tiny faces
        # (large meshes) amortize the per-group scalar bookkeeping over
        # 8 faces (light latch 158K: G=8 11.4 ms vs G=2 17.5; heavy
        # latch 158K: 15.4 vs 19.6); mid meshes prefer G=4 (light 2.4K:
        # 0.38 vs 0.42, 9.8K: 0.95 vs 1.14; heavy 9.8K: 1.22 vs 1.35);
        # only heavy-latch SMALL meshes keep G=2 (2.4K: 0.47 vs 0.55 --
        # big faces pay union-window growth on every latched plane).
        if nf >= 16384:
            group_size = 8
        elif latch_z and nf < 4096:
            group_size = 2
        else:
            group_size = 4
    if row_window is None:
        # round-5 interleaved sweep (benchmarks/ab_window_loop.py rigor):
        # mid meshes' faces span ~20 rows at the 512 canvas, so 24-row
        # windows cover most G=4 union bboxes in ONE window (0.348 ->
        # 0.324 ms at the 2.4K bench config; rw32 equal, rw48 +15%);
        # large meshes' tiny faces keep 16 (rw24 +10% at 158K)
        row_window = 16 if nf >= 16384 else 24
    if tile is not None and mode == "auto":
        mode = "binned"  # an explicit tile pins the binned kernel
    if _pick_mode(mode, image_size, num_rows, True, num_attrs) == "windowed":
        index, _, coords, attr_planes = _run_windowed(
            face_vertices, face_attrs, image_size, near, far, draw_backside,
            face_chunk, row_window, 128, True, interpret,
            group_size=group_size, row_start=row_start, num_rows=num_rows,
            coords_dim=coords_dim, planar_faces=planar_faces,
            group_unroll=_GROUP_UNROLL,
        )
    else:
        if planar_faces:
            # the binned prepass consumes [bs, nf, 3, 3]; images large
            # enough to need binning dwarf the one-time layout conversion
            face_vertices = face_vertices.transpose(0, 3, 2, 1)
        index, _, coords, attr_planes = _run_binned(
            face_vertices, face_attrs, image_size, near, far, draw_backside,
            face_chunk, tile, row_window, True, interpret,
            group_size=group_size, row_start=row_start, num_rows=num_rows,
            coords_dim=coords_dim,
        )
    return index, coords, attr_planes


def _bitpack_mask_np(occ):
    """Numpy twin of :func:`_bitpack_mask` for host-side occupancy."""
    import numpy as _np

    occ = _np.asarray(occ)
    n = occ.shape[-1]
    n_words = -(-n // 32)
    occ = _np.concatenate(
        [occ, _np.zeros(occ.shape[:-1] + (n_words * 32 - n,), bool)], axis=-1
    )
    return (
        occ.reshape(*occ.shape[:-1], n_words, 32).astype(_np.int64)
        << _np.arange(32, dtype=_np.int64)
    ).sum(axis=-1).astype(_np.uint32).view(_np.int32).astype(_np.int32)


def _bitpack_mask(occ):
    """Pack a bool occupancy array [..., n] into int32 words of 32 bits
    (little-endian within the word) for SMEM: flat int32 masks blow the
    ~1 MB SMEM budget once strips x chunks reaches atlas/large-mesh
    scale.  Kernels test ``(mask[..., c // 32] >> (c % 32)) & 1``."""
    n = occ.shape[-1]
    n_words = -(-n // 32)
    occ = jnp.pad(occ, [(0, 0)] * (occ.ndim - 1) + [(0, n_words * 32 - n)])
    return jnp.sum(
        occ.reshape(*occ.shape[:-1], n_words, 32).astype(jnp.int32)
        << jnp.arange(32, dtype=jnp.int32),
        axis=-1,
    )


def _scatter_kernel(
    cnt_ref,     # [1, 1, n_strips] int32 in SMEM: active chunks per strip
                 # (leading singleton: a 2-D (1, n_strips) block over a
                 # [bs, n_strips] array fails the TPU last-two-dims block
                 # rule whenever bs > 1)
    list_ref,    # [1, n_strips, n_chunks] int32 in SMEM: active chunk ids,
                 # ascending, compacted to the front (whole array resident;
                 # the constant block index means Mosaic never re-streams
                 # it).  When ``use_list`` is False this is instead the
                 # BITPACKED occupancy mask [1, n_strips, n_words].
    fim_ref,     # [1, 1, 1, T] int32: face-index map strip (global face ids)
    grad_ref,    # [1, 1, D, T] f32: per-pixel gradients strip, coord-planar
    out_ref,     # [1, D, nf_p] f32: THE WHOLE per-face gradient accumulator
    *,
    strip,       # T: pixels per strip
    face_chunk,  # K
    n_chunks,
    num_attrs,   # D
    use_list,
):
    """Pixel->face gradient scatter as MXU one-hot matmuls.

    out[:, f] = sum over pixels p of (fim[p] == f) * grad[:, p]

    This is the transpose of the winner-attribute gather (the reference's
    ``to_map`` backward, an atomicAdd scatter in the chainer twin,
    rasterize.py:94-115).  Background pixels (fim == -1) match no face id
    and contribute nothing, so no masking is needed.

    Design notes (why this shape):
      * The full accumulator is tiny (faces x ~9..24 floats) and stays
        VMEM-resident for the whole grid, so pixel strips stream through
        exactly ONCE -- HBM traffic is one read of the gradient image,
        not one per face chunk.  It is laid out [D, nf_p] -- faces on the
        LANES -- because a [nf_p, D] layout lane-pads D to 128 whenever
        XLA requests a tiled result layout (80 MB of VMEM at 157K faces,
        a compile-time OOM observed inside fused backward programs).
        Chunk stores land at 128-aligned lane offsets.
      * Within a strip, a ``fori_loop`` runs over the strip's COMPACT
        active-chunk list (the exact, ascending set of chunks holding any
        of its winners, built by one XLA argsort): mesh face ids are
        spatially coherent, so a strip typically touches only 2-4 chunks
        and the loop executes exactly that many iterations.  (A
        bit-mask-predicated loop over ALL chunks -- the previous design --
        spends ~30 scalar cycles per INACTIVE chunk; at 158K faces that
        is 617 iterations per strip of which ~3 do work, and the scalar
        loop, not the one-hot math, dominated the kernel at ~8% of its
        roof.)
      * The one-hot is built [K, T] (ids down sublanes, pixels along
        lanes) so the fim strip loads as a [1, T] lane-major row, and the
        gradients load coord-planar [D, T] -- neither needs a transpose or
        lane padding, and the dot contracts over lanes on both sides.
      * The MXU's native multiply is bf16; a raw f32 dot either truncates
        (2e-3 rel error) or costs 6 passes under Precision.HIGHEST.  The
        one-hot factor is EXACT in bf16, so splitting only the gradient
        into hi + lo bf16 halves gives ~2^-17 relative error in 2 passes.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = grad_ref[0, 0]                       # [D, T] f32
    g_hi = g.astype(jnp.bfloat16)
    g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    fim = fim_ref[0, 0]                      # [1, T] int32

    def accumulate(c):
        ids = c * face_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (face_chunk, 1), 0
        )
        one_hot = (fim == ids).astype(jnp.bfloat16)   # [K, T]

        def dot_t(a, b):  # [D, T] x [K, T] -> [D, K], contract lanes
            return jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = dot_t(g_hi, one_hot) + dot_t(g_lo, one_hot)
        col = pl.multiple_of(c * face_chunk, 128)
        out_ref[0, :, pl.ds(col, face_chunk)] += acc

    if use_list:
        def chunk_body(i, _):
            accumulate(list_ref[0, t, i])
            return 0

        jax.lax.fori_loop(0, cnt_ref[0, 0, t], chunk_body, 0)
    else:
        # bitpacked word-skip loop (exact lists too big for SMEM)
        n_words = -(-n_chunks // 32)

        def word_body(w, _):
            _set_bit_loop(
                list_ref[0, t, w], lambda b: accumulate(w * 32 + b)
            )
            return 0

        jax.lax.fori_loop(0, n_words, word_body, 0)


def _scatter_kernel_patch(
    cnt_ref,     # [1, 1, n_strips] int32 SMEM (see _scatter_kernel)
    list_ref,    # [1, n_strips, n_chunks] int32 SMEM (or bitpacked mask)
    fim_ref,     # [1, ph, pw] int32: one SPATIAL patch of the index map
    grad_ref,    # [1, D, ph, pw] f32: the matching gradient patch
    out_ref,     # [1, D, nf_p] f32: the whole per-face accumulator
    *,
    ph,
    pw,
    face_chunk,
    n_chunks,
    num_attrs,
    use_list,
):
    """:func:`_scatter_kernel` with the (ph, pw) SPATIAL patch reorder
    moved INTO the BlockSpec index map: grid step t streams patch
    (t // nx, t % nx) of the raw [bs, D, H, W] planes straight from HBM,
    so the two full-image XLA relayout copies the old path paid (12 MB
    at 512^2 x 6 planes -- 2 of the census's 64 bench-step kernels) do
    not exist at all.  The one-hot math is identical, just evaluated per
    pw-lane sub-row: ph dots of [D, pw] x [K, pw] contract the same
    lanes as one [D, ph*pw] x [K, ph*pw] dot (the MXU processes 128
    contraction lanes per pass either way, accumulating passes in f32
    lane order -- on hardware the sums match the strip kernel's;
    interpret mode may round differently within the bf16-split bound)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = grad_ref[0]                          # [D, ph, pw] f32
    g_hi = g.astype(jnp.bfloat16)
    g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    fim = fim_ref[0]                         # [ph, pw] int32

    def accumulate(c):
        ids = c * face_chunk + jax.lax.broadcasted_iota(
            jnp.int32, (face_chunk, 1), 0
        )

        def dot_t(a, b):  # [D, pw] x [K, pw] -> [D, K], contract lanes
            return jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc_hi = acc_lo = None
        for j in range(ph):
            one_hot = (fim[j][None] == ids).astype(jnp.bfloat16)  # [K, pw]
            dh = dot_t(g_hi[:, j], one_hot)
            dl = dot_t(g_lo[:, j], one_hot)
            acc_hi = dh if acc_hi is None else acc_hi + dh
            acc_lo = dl if acc_lo is None else acc_lo + dl
        col = pl.multiple_of(c * face_chunk, 128)
        out_ref[0, :, pl.ds(col, face_chunk)] += acc_hi + acc_lo

    if use_list:
        def chunk_body(i, _):
            accumulate(list_ref[0, t, i])
            return 0

        jax.lax.fori_loop(0, cnt_ref[0, 0, t], chunk_body, 0)
    else:
        n_words = -(-n_chunks // 32)

        def word_body(w, _):
            _set_bit_loop(
                list_ref[0, t, w], lambda b: accumulate(w * 32 + b)
            )
            return 0

        jax.lax.fori_loop(0, n_words, word_body, 0)


# SMEM is ~1 MB on current TPUs (a 1.7 MB list was rejected by the
# compiler with "Allocation would exceed memory (size=1048576)"); keep
# half for the occupancy structures
_SMEM_BUDGET = 512 * 1024

# Groups processed per windowed-resolve loop iteration (A/B switch for
# benchmarks/tune_resolve.py; see _windowed_kernel group_unroll)
_GROUP_UNROLL = 1
# Windowed-resolve window-loop structure: "auto" (flat when compiled,
# nested in interpret -- see the contraction note in _windowed_kernel),
# or "flat"/"nested" to force (A/B switch)
_WINDOW_LOOP = "auto"
# Fold the group preschedule into the fused constants kernel (round 5;
# False forces the XLA prepass -- A/B switch)
_FUSED_PRESCHED = True


def _scatter_geometry(P, num_faces, strip, face_chunk):
    """Shared size tuning for the one-hot scatter: returns
    (strip, face_chunk, pad_p, n_strips, pad, nf_p, n_chunks, use_list).
    Pure python on static ints -- :func:`slot_scatter_occupancy` replays
    it on the host so precomputed occupancy lists match the kernel
    geometry.  ``use_list`` False means the exact per-strip chunk lists
    cannot fit SMEM at this scale and the kernel runs the BITPACKED
    word-skip loop instead."""
    strip = min(strip, max(512, P))
    face_chunk = max(128, (face_chunk + 127) // 128 * 128)
    # the [face_chunk, strip] bf16 one-hot lives on the scoped-VMEM stack
    # (16 MB limit, shared with the accumulator and grad strips)
    ONE_HOT_BUDGET = 8 * 1024 * 1024
    while -(-P // strip) > 1024 and face_chunk * strip * 2 < ONE_HOT_BUDGET:
        strip *= 2     # cap the strip count while the one-hot budget allows
    while face_chunk * strip * 2 > ONE_HOT_BUDGET and face_chunk > 128:
        face_chunk //= 2
    while face_chunk * strip * 2 > ONE_HOT_BUDGET and strip > 512:
        strip //= 2
    # pad the pixel axis up to a strip multiple (padding pixels get
    # fim = -1, matching no chunk) -- shrinking the strip instead blows
    # up the strip count for non-power-of-two P
    pad_p = (-P) % strip
    n_strips = (P + pad_p) // strip

    # prefer exact per-strip chunk lists in SMEM: grow the chunk while
    # they overflow and the one-hot budget still allows; past that point
    # fall back to the bitpacked mask (32x smaller).  Growth is capped at
    # 8x the requested chunk: per-hit MXU work scales with face_chunk
    # (each active chunk's one-hot matmul is [face_chunk, strip], and a
    # coherent id span costs ~spread + face_chunk), so unbounded growth
    # trades bounded scalar savings for unbounded matmul waste -- beyond
    # the cap the bitpacked word-skip loop is the cheaper fallback.
    chunk_cap = face_chunk * 8
    while (
        n_strips * (-(-num_faces // face_chunk)) * 4 > _SMEM_BUDGET
        and face_chunk < num_faces
        and face_chunk * 2 <= chunk_cap
        and face_chunk * 2 * strip * 2 <= ONE_HOT_BUDGET
    ):
        face_chunk *= 2
    pad = (-num_faces) % face_chunk
    nf_p = num_faces + pad
    n_chunks = nf_p // face_chunk
    use_list = n_strips * n_chunks * 4 <= _SMEM_BUDGET
    return strip, face_chunk, pad_p, n_strips, pad, nf_p, n_chunks, use_list


def slot_scatter_occupancy(ids, num_rows_out, strip=2048, face_chunk=128):
    """Host-side (numpy) active-chunk lists for a STATIC id map.

    Args:
      ids: [P] or [bs, P] int numpy array (e.g. the face->vertex slot map
        ``faces.reshape(-1)``; < 0 matches nothing).
      num_rows_out/strip/face_chunk: must match the later
        ``scatter_to_faces_pallas(..., strip=strip, face_chunk=face_chunk,
        patch=None)`` call -- the geometry replay handles the auto-tuning.

    Returns (cnt [bs, n_strips], active [bs, n_strips, n_chunks]) int32
    numpy arrays for the ``occupancy`` parameter.
    """
    import numpy as _np

    ids = _np.asarray(ids)
    if ids.ndim == 1:
        ids = ids[None]
    bs, P = ids.shape
    strip, face_chunk, pad_p, n_strips, pad, nf_p, n_chunks, use_list = (
        _scatter_geometry(P, num_rows_out, strip, face_chunk)
    )
    ids_p = _np.concatenate(
        [ids, _np.full((bs, pad_p), -1, ids.dtype)], axis=1
    )
    chunk_of = _np.where(ids_p < 0, -1, ids_p // face_chunk).reshape(
        bs, n_strips, strip
    )
    occ = (
        chunk_of[..., None] == _np.arange(n_chunks, dtype=_np.int64)
    ).any(axis=2)
    cnt = occ.sum(axis=-1).astype(_np.int32)
    if use_list:
        active = _np.argsort(~occ, axis=-1, kind="stable").astype(_np.int32)
    else:
        active = _bitpack_mask_np(occ)
    return cnt, active


def _scatter_patch_blockspec(grad_map, face_index_map, num_faces, ph, pw,
                             face_chunk, interpret, planar_out):
    """Zero-copy body of the planar patch-reordered scatter: grid step
    t = (row_block * nx + col_block) DMAs spatial patch (t // nx, t % nx)
    of the raw [bs, D, H, W] gradient planes / [bs, H, W] index map via
    its BlockSpec index maps -- no XLA relayout copies (the old path
    paid 2 full-image transposes, 12 MB at 512^2 x 6 planes).  The
    occupancy build reduces over the in-patch axes of a pure reshape, so
    its strip order matches the grid's (row-block, col-block) raster
    order by construction."""
    bs, D, H, W = grad_map.shape
    Hp, Wp = -(-H // ph) * ph, -(-W // pw) * pw
    if (Hp, Wp) != (H, W):
        grad_map = jnp.pad(
            grad_map, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W))
        )
        face_index_map = jnp.pad(
            face_index_map, ((0, 0), (0, Hp - H), (0, Wp - W)),
            constant_values=-1,
        )
    ny, nx = Hp // ph, Wp // pw
    strip, face_chunk, pad_p, n_strips, pad, nf_p, n_chunks, use_list = (
        _scatter_geometry(Hp * Wp, num_faces, ph * pw, face_chunk)
    )
    assert strip == ph * pw and pad_p == 0 and n_strips == ny * nx, (
        strip, ph * pw, pad_p, n_strips, ny, nx,
    )
    chunk_of = jnp.where(
        face_index_map < 0, -1, face_index_map // face_chunk
    ).reshape(bs, ny, ph, nx, pw)
    occ = jnp.any(
        chunk_of[..., None] == jnp.arange(n_chunks, dtype=jnp.int32),
        axis=(2, 4),
    ).reshape(bs, n_strips, n_chunks)
    cnt = jnp.sum(occ, axis=-1).astype(jnp.int32)
    if use_list:
        active = jnp.argsort(~occ, axis=-1, stable=True).astype(jnp.int32)
    else:
        active = _bitpack_mask(occ)
    n_list = active.shape[-1]
    kernel = functools.partial(
        _scatter_kernel_patch,
        ph=ph, pw=pw, face_chunk=face_chunk, n_chunks=n_chunks,
        num_attrs=D, use_list=use_list,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_strips), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_strips, n_list), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, ph, pw), lambda b, t: (b, t // nx, t % nx)),
            pl.BlockSpec(
                (1, D, ph, pw), lambda b, t: (b, 0, t // nx, t % nx)
            ),
        ],
        out_specs=pl.BlockSpec((1, D, nf_p), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bs, D, nf_p), jnp.float32),
        interpret=interpret,
    )(cnt.reshape(bs, 1, n_strips), active, face_index_map, grad_map)
    if planar_out:
        return out[:, :, :num_faces]
    return out[:, :, :num_faces].transpose(0, 2, 1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_faces", "strip", "face_chunk", "interpret", "planar", "patch",
        "planar_out", "sub_batch",
    ),
)
def scatter_to_faces_pallas(
    grad_map,
    face_index_map,
    num_faces,
    strip=2048,
    face_chunk=128,
    interpret=False,
    planar=False,
    patch=(16, 128),
    occupancy=None,
    planar_out=False,
    sub_batch=8,
):
    """Pixel grads -> [bs, num_faces, D] per-face grads.  ``grad_map`` is
    [bs, H, W, D], or [bs, D, H, W] when ``planar`` (the pipeline's
    layout -- cheaper: the strip reshape stays plane-major).

    ``sub_batch``: batches larger than this run as a ``lax.map`` over
    sub-batches (bs padded up; pad images scatter nothing and are
    cropped).  Measured on v5e (512^2, 2.5K faces): per-image cost is a
    STEP function of the compiled batch -- ~0.13 ms/img at bs<=8 vs
    ~0.19 ms/img at bs>=16 with identical per-image work, i.e. an
    XLA-level working-set artifact, not per-grid-step overhead; mapping
    over 8-image sub-batches restores the bs<=8 regime (6.0 -> 4.1 ms at
    bs=32, same-session A/B).  ``None`` disables.

    ``planar_out``: return [bs, D, num_faces] -- the kernel accumulator's
    NATIVE layout (zero relayout; the [bs, num_faces, D] form pays a
    minor-dim-D transpose that TPU tiling pads 128/D-fold).

    Pallas TPU replacement for the XLA segment-sum in
    ``gather_resolve._scatter_to_faces`` (the backward of the fused
    resolve+gather): the segment sum becomes predicated one-hot matmuls on
    the MXU with the whole per-face accumulator VMEM-resident (see
    ``_scatter_kernel``).

    ``patch``: pixels are reordered into (ph, pw) SPATIAL patches before
    stripping (a pure reshape/transpose -- the scatter is order-
    invariant).  The one-hot work scales with how many face-id chunks a
    strip's winners span; a horizontal row strip crosses the whole mesh
    (measured 648 active (strip, chunk) pairs = 1.36G one-hot compares at
    512^2 x 158K faces) while spatial patches see only the local surface
    (16x128 patches: 3.6x fewer compares).  Pass ``patch=None`` for raw
    row-major order.  Defaults tuned on v5e at 512^2 x 158K faces:
    1.0 ms vs 2.0 ms for the round-2 row-strip layout (same-session A/B).

    ``occupancy``: optional precomputed (cnt [bs, n_strips] int32,
    active [bs, n_strips, n_chunks] int32) active-chunk lists (ascending,
    front-compacted), skipping the O(P x n_chunks) on-device occupancy
    build.  Callers with a STATIC index map (e.g. the face->vertex slot
    scatter: mesh connectivity is a compile-time constant in every real
    workload) compute it once in numpy for free; sizes must match the
    strip/face_chunk geometry after auto-tuning, so build it with
    :func:`slot_scatter_occupancy`.
    """
    if planar:
        bs, D, H, W = grad_map.shape
    else:
        bs, H, W, D = grad_map.shape

    if sub_batch is not None and bs > sub_batch:
        nb = -(-bs // sub_batch)
        pad_b = nb * sub_batch - bs
        gm = jnp.pad(
            grad_map, ((0, pad_b),) + ((0, 0),) * (grad_map.ndim - 1)
        )
        fim = jnp.pad(
            face_index_map,
            ((0, pad_b),) + ((0, 0),) * (face_index_map.ndim - 1),
            constant_values=-1,
        )
        xs = (
            gm.reshape((nb, sub_batch) + gm.shape[1:]),
            fim.reshape((nb, sub_batch) + fim.shape[1:]),
        )
        if occupancy is not None:
            cnt, active = occupancy
            cnt = jnp.pad(cnt, ((0, pad_b), (0, 0)))
            active = jnp.pad(
                active, ((0, pad_b),) + ((0, 0),) * (active.ndim - 1)
            )
            xs += (
                cnt.reshape((nb, sub_batch) + cnt.shape[1:]),
                active.reshape((nb, sub_batch) + active.shape[1:]),
            )

        def _one(args):
            g, f = args[:2]
            occ = (args[2], args[3]) if len(args) > 2 else None
            return scatter_to_faces_pallas(
                g, f, num_faces, strip=strip, face_chunk=face_chunk,
                interpret=interpret, planar=planar, patch=patch,
                occupancy=occ, planar_out=planar_out, sub_batch=None,
            )

        out = jax.lax.map(_one, xs)
        return out.reshape((nb * sub_batch,) + out.shape[2:])[:bs]

    if patch is not None and H >= 2 * patch[0] and W >= patch[1]:
        ph, pw = patch
        Hp, Wp = -(-H // ph) * ph, -(-W // pw) * pw
        if planar and occupancy is None and num_faces >= 16384 and (
            _scatter_geometry(Hp * Wp, num_faces, ph * pw, face_chunk)[0]
            == ph * pw
        ):
            # zero-copy patch path: the reorder lives in the kernel's
            # BlockSpec index map (_scatter_kernel_patch); only
            # unaligned sizes pay a pad.  Measured v5e crossover
            # (benchmarks/ab_scatter_blockspec.py, same-session
            # interleaved): at 158K faces the BlockSpec DMA wins 0.74 vs
            # 0.98 ms (the 12 MB of XLA relayout copies disappear); at
            # 2.4K faces it LOSES 0.15 vs 0.09 ms (short kernel, the
            # per-patch strided plane DMAs don't amortize), so small
            # meshes keep the copy path.
            return _scatter_patch_blockspec(
                grad_map, face_index_map, num_faces, ph, pw, face_chunk,
                interpret, planar_out,
            )
        fim2 = jnp.pad(
            face_index_map, ((0, 0), (0, Hp - H), (0, Wp - W)),
            constant_values=-1,
        )
        face_index_map = fim2.reshape(
            bs, Hp // ph, ph, Wp // pw, pw
        ).transpose(0, 1, 3, 2, 4)
        if planar:
            g2 = jnp.pad(grad_map, ((0, 0), (0, 0), (0, Hp - H), (0, Wp - W)))
            grad_map = g2.reshape(
                bs, D, Hp // ph, ph, Wp // pw, pw
            ).transpose(0, 1, 2, 4, 3, 5).reshape(bs, D, Hp * Wp // pw, pw)
        else:
            g2 = jnp.pad(
                grad_map, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
            )
            grad_map = g2.reshape(
                bs, Hp // ph, ph, Wp // pw, pw, D
            ).transpose(0, 1, 3, 2, 4, 5).reshape(bs, Hp * Wp // pw, pw, D)
        H, W = Hp * Wp // pw, pw
    P = H * W
    strip, face_chunk, pad_p, n_strips, pad, nf_p, n_chunks, use_list = (
        _scatter_geometry(P, num_faces, strip, face_chunk)
    )

    fim_pad = jnp.pad(
        face_index_map.reshape(bs, P), ((0, 0), (0, pad_p)),
        constant_values=-1,
    )
    fim_flat = fim_pad.reshape(bs, n_strips, 1, strip)
    # coord-planar strips: [bs, n_strips, D, T] (lane dim = pixels)
    if planar:
        grad_flat = grad_map.reshape(bs, D, P)
    else:
        grad_flat = grad_map.reshape(bs, P, D).transpose(0, 2, 1)
    grad_flat = jnp.pad(grad_flat, ((0, 0), (0, 0), (0, pad_p)))
    grad_flat = grad_flat.reshape(bs, D, n_strips, strip).transpose(0, 2, 1, 3)

    # exact per-strip ACTIVE-CHUNK LISTS: the ascending set of chunks
    # holding any of the strip's winners, compacted to the front by a
    # stable argsort (bg/pad pixels -> chunk -1, match none).  The
    # occupancy build is O(pixels x n_chunks) compares (~1.6 ms at 630K
    # faces); a per-strip [min, max] chunk RANGE was tried and is 1.5x
    # slower end to end (strip winners are sparse, not contiguous).
    if occupancy is not None:
        cnt, active = occupancy
        w = n_chunks if use_list else -(-n_chunks // 32)
        assert active.shape == (bs, n_strips, w), (
            active.shape, (bs, n_strips, w),
        )
    else:
        chunk_of = jnp.where(fim_pad < 0, -1, fim_pad // face_chunk).reshape(
            bs, n_strips, strip
        )
        occ = jnp.any(
            chunk_of[..., None] == jnp.arange(n_chunks, dtype=jnp.int32),
            axis=2,
        )
        cnt = jnp.sum(occ, axis=-1).astype(jnp.int32)   # [bs, n_strips]
        if use_list:
            active = jnp.argsort(~occ, axis=-1, stable=True).astype(jnp.int32)
        else:
            active = _bitpack_mask(occ)

    n_list = active.shape[-1]
    kernel = functools.partial(
        _scatter_kernel,
        strip=strip,
        face_chunk=face_chunk,
        n_chunks=n_chunks,
        num_attrs=D,
        use_list=use_list,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_strips), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_strips, n_list),
                lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 1, 1, strip), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, 1, D, strip), lambda b, t: (b, t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, nf_p), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bs, D, nf_p), jnp.float32),
        interpret=interpret,
    )(cnt.reshape(bs, 1, n_strips), active, fim_flat, grad_flat)
    if planar_out:
        return out[:, :, :num_faces]
    return out[:, :, :num_faces].transpose(0, 2, 1)


def _scatter_rows_kernel(
    pmask_ref,   # [1, n_strips, n_pwords] int32 in SMEM: BITPACKED
                 # per-(strip, part) any-hit flags
    mask_ref,    # [1, n_strips, n_words] int32 in SMEM: BITPACKED occupancy
    ids_ref,     # [1, 1, 1, T] int32: target row ids, one strip
    g_ref,       # [1, 1, D, T] f32: gradients, one strip
    out_ref,     # [1, D, part] f32: accumulator for ONE table part
    *,
    chunk,
    chunks_per_part,
    D,
    n_words,
):
    """Row scatter-add into a LARGE table, one VMEM-resident part at a
    time: out[:, ids[t]] += g[:, t].

    The sibling of ``_scatter_kernel`` for tables too large to keep the
    whole accumulator resident (e.g. texture atlases: a 2.3M-texel f32
    accumulator is 27 MB).  Grid is (batch, part, strip) with strips
    innermost, so each part's accumulator stays resident while every
    gradient strip streams past once per part.

    The scalar control path is three-tier (ids in a strip are coherent,
    so almost all candidate (part, strip, chunk) triples have no hits,
    and inactive scalar iterations -- not one-hot math -- dominated the
    old flat chunk loop):
      1. one per-(part, strip) flag skips the whole program body,
      2. a word loop over the part's mask span skips 32 chunks per test,
      3. only set bits build the [chunk, T] one-hot (bf16 hi+lo gradient
         split as in ``_scatter_kernel``, ~2^-17 rel).
    """
    p = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    pbit = (pmask_ref[0, s, p // 32] >> (p % 32)) & 1

    @pl.when(pbit != 0)
    def _part_active():
        ids = ids_ref[0, 0]                      # [1, T]
        g = g_ref[0, 0]                          # [D, T]
        g_hi = g.astype(jnp.bfloat16)
        g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        c_lo = p * chunks_per_part
        w_lo = c_lo // 32
        # static span of words covering this part's chunks (+1 for the
        # word straddling the part boundary)
        span = chunks_per_part // 32 + 2

        def word_body(wi, _):
            w = w_lo + wi
            wv = jnp.minimum(w, n_words - 1)
            word = jnp.where(w < n_words, mask_ref[0, s, wv], 0)

            def emit(b):
                c = wv * 32 + b
                k = c - c_lo
                ok = (k >= 0) & (k < chunks_per_part)

                @pl.when(ok)
                def _accumulate():
                    rows = c * chunk + jax.lax.broadcasted_iota(
                        jnp.int32, (chunk, 1), 0
                    )
                    one_hot = (ids == rows).astype(jnp.bfloat16)  # [K, T]

                    def dot_t(a):  # [D, T] x [K, T] -> [D, K]
                        return jax.lax.dot_general(
                            a, one_hot,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )

                    col = pl.multiple_of(k * chunk, 128)
                    out_ref[0, :, pl.ds(col, chunk)] += (
                        dot_t(g_hi) + dot_t(g_lo)
                    )

            _set_bit_loop(word, emit)
            return 0

        jax.lax.fori_loop(0, span, word_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("num_rows_out", "strip", "chunk", "part_bytes", "interpret"),
)
def scatter_rows_pallas(
    grads,
    ids,
    num_rows_out,
    strip=4096,
    chunk=512,
    part_bytes=4 * 1024 * 1024,
    interpret=False,
):
    """Scatter-add [bs, D, P] gradients into a [bs, num_rows_out, D]
    table by row id ([bs, P] int32; id < 0 contributes nothing).

    ``part_bytes`` bounds the resident accumulator part; together with
    the [chunk, strip] bf16 one-hot and the double-buffered gradient
    strips it must fit the 16 MB scoped-VMEM stack.

    TPU replacement for XLA's serial scatter / segment-sum when the
    target is large (measured 42 ms for 1M rows into a 2.3M-texel atlas;
    sortedness does not help XLA).  See ``_scatter_rows_kernel``.
    """
    bs, D, P = grads.shape
    strip = min(strip, max(512, P))
    chunk = max(128, (chunk + 127) // 128 * 128)
    # joint budget: the [chunk, strip] bf16 one-hot + the part accumulator
    # share the 16 MB scoped-VMEM stack
    ONE_HOT_BUDGET = 6 * 1024 * 1024
    while -(-P // strip) > 1024 and chunk * strip * 2 < ONE_HOT_BUDGET:
        strip *= 2
    while chunk * strip * 2 > ONE_HOT_BUDGET and chunk > 128:
        chunk //= 2
    while chunk * strip * 2 > ONE_HOT_BUDGET and strip > 512:
        strip //= 2
    pad_p = (-P) % strip
    n_strips = (P + pad_p) // strip
    ids_p = jnp.pad(
        ids.reshape(bs, P), ((0, 0), (0, pad_p)), constant_values=-1
    )
    g_p = jnp.pad(grads, ((0, 0), (0, 0), (0, pad_p)))

    chunks_per_part = max(1, part_bytes // (D * chunk * 4))
    part = chunks_per_part * chunk
    n_parts = -(-num_rows_out // part)
    n_chunks = n_parts * chunks_per_part
    n_p = n_chunks * chunk

    chunk_of = jnp.where(ids_p < 0, -1, ids_p // chunk)
    occ = jnp.any(
        chunk_of.reshape(bs, n_strips, strip)[..., None]
        == jnp.arange(n_chunks, dtype=jnp.int32),
        axis=2,
    )                                        # [bs, n_strips, n_chunks]
    mask = _bitpack_mask(occ)                # [bs, n_strips, n_words]
    n_words = mask.shape[-1]
    # per-(strip, part) any-hit flags: coherent ids put a strip's rows in
    # 1-2 parts, so most (part, strip) programs skip on one scalar test
    p_occ = jnp.any(
        occ.reshape(bs, n_strips, n_parts, chunks_per_part), axis=-1
    )
    pmask = _bitpack_mask(p_occ)             # [bs, n_strips, n_pwords]
    n_pwords = pmask.shape[-1]

    kernel = functools.partial(
        _scatter_rows_kernel,
        chunk=chunk,
        chunks_per_part=chunks_per_part,
        D=D,
        n_words=n_words,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_parts, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, n_strips, n_pwords), lambda b, p, s: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_strips, n_words), lambda b, p, s: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 1, 1, strip), lambda b, p, s: (b, s, 0, 0)),
            pl.BlockSpec((1, 1, D, strip), lambda b, p, s: (b, s, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, part), lambda b, p, s: (b, 0, p)),
        out_shape=jax.ShapeDtypeStruct((bs, D, n_p), jnp.float32),
        interpret=interpret,
    )(
        pmask,
        mask,
        ids_p.reshape(bs, n_strips, 1, strip),
        g_p.reshape(bs, D, n_strips, strip).transpose(0, 2, 1, 3),
    )
    return out[:, :, :num_rows_out].transpose(0, 2, 1)


def _gather_kernel(
    cnt_ref,     # [1, 1, n_strips] int32 in SMEM: active chunks per strip
                 # (leading singleton: a 2-D (1, n_strips) block over a
                 # [bs, n_strips] array fails the TPU last-two-dims block
                 # rule whenever bs > 1)
    list_ref,    # [1, n_strips, n_chunks] int32 in SMEM: active chunk ids,
                 # ascending, compacted to the front (whole array resident);
                 # the BITPACKED mask [1, n_strips, n_words] when not
                 # ``use_list``
    ids_ref,     # [1, 1, 1, T] int32: row ids to gather, one strip
    table_ref,   # [1, D, n_p] f32: THE WHOLE table, VMEM-resident
    out_ref,     # [1, 1, D, T] f32 ([1, D, T] when ``planar_out``)
    *,
    strip,
    chunk,
    n_chunks,
    D,
    use_list,
    planar_out=False,
):
    """Row gather as predicated one-hot MXU matmuls (BIT-exact).

    out[:, t] = table[:, ids[t]]

    The transpose of ``_scatter_kernel``'s pattern: per strip of ids, loop
    the strip's compact active-chunk list (coherent ids touch only a few
    chunks; the loop runs exactly that many iterations -- see
    ``_scatter_kernel`` for why a mask-predicated loop over all chunks
    loses) and accumulate ``table_chunk @ one_hot``.

    Exactness: the MXU multiplies in bf16, so the f32 table is split into
    THREE bf16 parts (hi + mid + lo covers all 24 mantissa bits; each
    successive residual is exactly representable).  Every output column
    has exactly ONE nonzero one-hot term, so each dot yields that part
    exactly and the two f32 adds reconstruct the original value with no
    rounding -- the result is bit-identical to the rows themselves (the
    resolve consumes these values, so approximate would break the
    bit-exact-backends invariant).
    """
    t = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)
    ids = ids_ref[0, 0]                      # [1, T]

    def store(acc):  # [D, T]
        if planar_out:
            out_ref[0] += acc
        else:
            out_ref[0, 0] += acc

    def accumulate(c):
        rows = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, 1), 0
        )
        one_hot = (ids == rows).astype(jnp.bfloat16)   # [K, T]
        col = pl.multiple_of(c * chunk, 128)
        tbl = table_ref[0, :, pl.ds(col, chunk)]       # [D, K] f32
        hi = tbl.astype(jnp.bfloat16)
        r1 = tbl - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

        def dot(a):  # [D, K] x [K, T] -> [D, T]
            return jax.lax.dot_general(
                a, one_hot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        store(dot(hi) + dot(mid) + dot(lo))

    if use_list:
        def chunk_body(i, _):
            accumulate(list_ref[0, t, i])
            return 0

        jax.lax.fori_loop(0, cnt_ref[0, 0, t], chunk_body, 0)
    else:
        # bitpacked word-skip loop (exact lists too big for SMEM); a set
        # bit beyond n_chunks cannot occur (_bitpack_mask zero-pads)
        n_words = -(-n_chunks // 32)

        def word_body(w, _):
            _set_bit_loop(
                list_ref[0, t, w], lambda b: accumulate(w * 32 + b)
            )
            return 0

        jax.lax.fori_loop(0, n_words, word_body, 0)


def _gather_geometry(P, n, strip, chunk):
    """Shared size tuning for the one-hot row gather: returns
    (strip, chunk, pad_p, n_strips, pad_n, n_p, n_chunks, use_list).
    Pure python on static ints -- :func:`slot_gather_occupancy` replays
    it on the host so precomputed occupancy lists match the kernel
    geometry.  See :func:`_scatter_geometry` for ``use_list``."""
    strip = min(strip, max(128, P))
    chunk = max(128, (chunk + 127) // 128 * 128)
    # the [chunk, strip] bf16 one-hot lives on the scoped-VMEM stack
    ONE_HOT_BUDGET = 8 * 1024 * 1024
    while -(-P // strip) > 1024 and chunk * strip * 2 < ONE_HOT_BUDGET:
        strip *= 2     # cap the strip count while the one-hot budget allows
    while chunk * strip * 2 > ONE_HOT_BUDGET and chunk > 128:
        chunk //= 2
    while chunk * strip * 2 > ONE_HOT_BUDGET and strip > 512:
        strip //= 2
    pad_p = (-P) % strip
    n_strips = (P + pad_p) // strip
    # prefer exact per-strip chunk lists in SMEM (bitpacked fallback past
    # the budget -- see _scatter_geometry)
    while (
        n_strips * (-(-n // chunk)) * 4 > _SMEM_BUDGET
        and chunk < n
        and chunk * 2 * strip * 2 <= ONE_HOT_BUDGET
    ):
        chunk *= 2
    pad_n = (-n) % chunk
    n_p = n + pad_n
    n_chunks = n_p // chunk
    use_list = n_strips * n_chunks * 4 <= _SMEM_BUDGET
    return strip, chunk, pad_p, n_strips, pad_n, n_p, n_chunks, use_list


def slot_gather_occupancy(ids, n, strip=2048, chunk=512):
    """Host-side (numpy) active-chunk lists for a STATIC
    :func:`gather_rows_pallas` id map (e.g. the face->vertex slots).
    Returns (cnt [bs, n_strips], active [bs, n_strips, n_chunks]) int32
    for its ``occupancy`` parameter; strip/chunk must match the call."""
    import numpy as _np

    ids = _np.asarray(ids)
    if ids.ndim == 1:
        ids = ids[None]
    bs, P = ids.shape
    strip, chunk, pad_p, n_strips, pad_n, n_p, n_chunks, use_list = (
        _gather_geometry(P, n, strip, chunk)
    )
    ids_p = _np.concatenate(
        [ids, _np.zeros((bs, pad_p), ids.dtype)], axis=1
    )
    chunk_of = (ids_p // chunk).reshape(bs, n_strips, strip)
    occ = (
        chunk_of[..., None] == _np.arange(n_chunks, dtype=_np.int64)
    ).any(axis=2)
    cnt = occ.sum(axis=-1).astype(_np.int32)
    if use_list:
        active = _np.argsort(~occ, axis=-1, kind="stable").astype(_np.int32)
    else:
        active = _bitpack_mask_np(occ)
    return cnt, active


@functools.partial(
    jax.jit,
    static_argnames=("strip", "chunk", "interpret", "planar_out"),
)
def gather_rows_pallas(
    table, ids, strip=2048, chunk=512, interpret=False, occupancy=None,
    planar_out=False,
):
    """``table[b, ids[b]]``: [bs, n, D] x [bs, P] int32 -> [bs, P, D],
    bit-exact, via predicated one-hot MXU matmuls (``_gather_kernel``).

    ``planar_out``: return [bs, D, P] instead (the kernel's NATIVE
    layout -- the [bs, P, D] form costs a minor-dim-D relayout that TPU
    tiling pads 128/D-fold; callers chaining into planar consumers, e.g.
    the face-vertex gather feeding ``resolve_gather_pallas``
    ``planar_faces``, skip it entirely).

    TPU replacement for XLA's row gather, which executes serially
    (~16 ns/row: 7.5 ms for the 473K-row face-vertex gather at 158K
    faces).  Requires ids >= 0.  Efficient when ids are chunk-local
    (vertex ids of nearby faces -- true for any coherently-numbered
    mesh); worst-case (ids uniform over a huge table) degrades toward
    one-hot work over every chunk, so callers with incoherent ids should
    prefer the XLA gather.

    ``occupancy``: optional precomputed (cnt, active) lists from
    :func:`slot_gather_occupancy` (static id maps), skipping the
    on-device occupancy build.
    """
    bs, n, D = table.shape
    P = ids.shape[-1]
    strip, chunk, pad_p, n_strips, pad_n, n_p, n_chunks, use_list = (
        _gather_geometry(P, n, strip, chunk)
    )
    ids_p = jnp.pad(ids.reshape(bs, P), ((0, 0), (0, pad_p)))
    table_pl = jnp.pad(
        table.transpose(0, 2, 1), ((0, 0), (0, 0), (0, pad_n))
    )  # [bs, D, n_p]

    if occupancy is not None:
        cnt, active = occupancy
        w = n_chunks if use_list else -(-n_chunks // 32)
        assert active.shape == (bs, n_strips, w), (
            active.shape, (bs, n_strips, w),
        )
    else:
        chunk_of = ids_p // chunk
        occ = jnp.any(
            chunk_of.reshape(bs, n_strips, strip)[..., None]
            == jnp.arange(n_chunks, dtype=jnp.int32),
            axis=2,
        )
        cnt = jnp.sum(occ, axis=-1).astype(jnp.int32)
        if use_list:
            active = jnp.argsort(~occ, axis=-1, stable=True).astype(jnp.int32)
        else:
            active = _bitpack_mask(occ)

    n_list = active.shape[-1]
    kernel = functools.partial(
        _gather_kernel, strip=strip, chunk=chunk, n_chunks=n_chunks, D=D,
        use_list=use_list, planar_out=planar_out,
    )
    if planar_out:
        # flat [bs, D, n_strips*strip]: a (1, D, strip) block is legal (D
        # spans its whole dim) where a 4-D (1, D, 1, strip) block is not
        # (second-minor block dim 1 fails the /8 rule)
        out_specs = pl.BlockSpec((1, D, strip), lambda b, t: (b, 0, t))
        out_shape = jax.ShapeDtypeStruct(
            (bs, D, n_strips * strip), jnp.float32
        )
    else:
        out_specs = pl.BlockSpec((1, 1, D, strip), lambda b, t: (b, t, 0, 0))
        out_shape = jax.ShapeDtypeStruct((bs, n_strips, D, strip), jnp.float32)
    # tables past ~12 MB (e.g. texture atlases) exceed the 16 MB default
    # scoped-VMEM limit once the one-hot + strip buffers stack on top
    table_bytes = D * n_p * 4
    params = (
        _vmem_compiler_params(interpret, limit=table_bytes)
        if table_bytes > 12 * 1024 * 1024 and not interpret else None
    )
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_strips), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_strips, n_list), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 1, 1, strip), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, D, n_p), lambda b, t: (b, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(cnt.reshape(bs, 1, n_strips), active, ids_p.reshape(bs, n_strips, 1, strip), table_pl)
    if planar_out:
        return out[:, :, :P]
    return out.transpose(0, 1, 3, 2).reshape(bs, n_strips * strip, D)[:, :P]


# ---------------------------------------------------------------------------
# Face-range slot ops: the planar [bs, 3, 3, nf] twins of
# gather_rows_pallas / scatter_to_faces_pallas for the face->vertex slot
# maps.  A FLAT k-major slot strip covers 3x more faces than a face-major
# one at equal width, so its vertex-id span (and one-hot work) grows ~3x
# (measured: 539 -> 1387 active chunks on the 158K-face teapot, flipping
# the gather's cost model back to XLA).  Here a strip is a range of FACES
# and each program handles all three vertex slots of that range with
# per-k one-hot dots -- face-major locality, planar layout, zero
# relayouts on either side.


def _slots3_geometry(nf, n, fstrip, chunk):
    """Size tuning shared by the face-range slot kernels and their host
    occupancy builder: returns (fstrip, chunk, pad_f, n_strips, pad_n,
    n_p, n_chunks, use_list).  Pure python on static ints."""
    fstrip = min(fstrip, max(128, -(-nf // 128) * 128))
    fstrip = -(-fstrip // 128) * 128
    chunk = max(128, (chunk + 127) // 128 * 128)
    # each per-k [chunk, fstrip] bf16 one-hot lives on the scoped stack
    ONE_HOT_BUDGET = 8 * 1024 * 1024
    while -(-nf // fstrip) > 1024 and chunk * fstrip * 2 < ONE_HOT_BUDGET:
        fstrip *= 2
    while chunk * fstrip * 2 > ONE_HOT_BUDGET and chunk > 128:
        chunk //= 2
    while chunk * fstrip * 2 > ONE_HOT_BUDGET and fstrip > 128:
        fstrip //= 2
    pad_f = (-nf) % fstrip
    n_strips = (nf + pad_f) // fstrip
    while (
        n_strips * (-(-n // chunk)) * 4 > _SMEM_BUDGET
        and chunk < n
        and chunk * 2 * fstrip * 2 <= ONE_HOT_BUDGET
    ):
        chunk *= 2
    pad_n = (-n) % chunk
    n_p = n + pad_n
    n_chunks = n_p // chunk
    use_list = n_strips * n_chunks * 4 <= _SMEM_BUDGET
    return fstrip, chunk, pad_f, n_strips, pad_n, n_p, n_chunks, use_list


def slots3_occupancy(faces, n, fstrip=2816, chunk=512):
    """Host-side (numpy) active-chunk lists for the face-range slot
    kernels: ``faces`` is the [nf, 3] int connectivity; a strip's
    occupancy is the union over its face range's three vertex slots.
    fstrip/chunk must match the kernel call (geometry is replayed)."""
    import numpy as _np

    faces = _np.asarray(faces)
    nf = faces.shape[0]
    fstrip, chunk, pad_f, n_strips, pad_n, n_p, n_chunks, use_list = (
        _slots3_geometry(nf, n, fstrip, chunk)
    )
    ids = _np.concatenate(
        [faces, _np.full((pad_f, 3), -1, faces.dtype)], axis=0
    )
    chunk_of = _np.where(ids < 0, -1, ids // chunk)
    chunk_of = chunk_of.reshape(n_strips, fstrip * 3)
    occ = (
        chunk_of[..., None] == _np.arange(n_chunks, dtype=_np.int64)
    ).any(axis=1)[None]  # [1, n_strips, n_chunks]
    cnt = occ.sum(axis=-1).astype(_np.int32)
    if use_list:
        active = _np.argsort(~occ, axis=-1, kind="stable").astype(_np.int32)
    else:
        active = _bitpack_mask_np(occ)
    return cnt, active


def _gather3_kernel(
    cnt_ref,     # [1, 1, n_strips] int32 SMEM
    list_ref,    # [1, n_strips, n_chunks] int32 SMEM (or bitpacked words)
    ids_ref,     # [1, 3, F] int32: the strip's face range, all 3 slots
    table_ref,   # [1, D, n_p] f32: THE WHOLE table, VMEM-resident
    out_ref,     # [1, D, 3, F] f32
    *,
    chunk,
    n_chunks,
    D,
    use_list,
):
    """Face-range one-hot row gather: out[:, k, f] = table[:, ids[k, f]].

    Same 3-way bf16 split (bit-exact) as ``_gather_kernel``; the only
    difference is the strip structure -- one [chunk, F] one-hot per
    vertex slot k over a shared face range, so the active-chunk list
    stays as small as the face-major layout's.
    """
    t = pl.program_id(1)
    out_ref[...] = jnp.zeros_like(out_ref)

    def accumulate(c):
        rows = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, 1), 0
        )
        col = pl.multiple_of(c * chunk, 128)
        tbl = table_ref[0, :, pl.ds(col, chunk)]       # [D, K] f32
        hi = tbl.astype(jnp.bfloat16)
        r1 = tbl - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)

        for k in range(3):
            one_hot = (ids_ref[0, k:k + 1, :] == rows).astype(jnp.bfloat16)

            def dot(a, oh=one_hot):  # [D, K] x [K, F] -> [D, F]
                return jax.lax.dot_general(
                    a, oh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            out_ref[0, :, k] += dot(hi) + dot(mid) + dot(lo)

    if use_list:
        def chunk_body(i, _):
            accumulate(list_ref[0, t, i])
            return 0

        jax.lax.fori_loop(0, cnt_ref[0, 0, t], chunk_body, 0)
    else:
        n_words = -(-n_chunks // 32)

        def word_body(w, _):
            _set_bit_loop(
                list_ref[0, t, w], lambda b: accumulate(w * 32 + b)
            )
            return 0

        jax.lax.fori_loop(0, n_words, word_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("fstrip", "chunk", "interpret"),
)
def gather_faces3_pallas(
    table, ids3, fstrip=2816, chunk=512, interpret=False, occupancy=None
):
    """Planar face-vertex gather: [bs, n, D] x [bs, 3, nf] int32 ->
    [bs, D, 3, nf] with out[b, :, k, f] = table[b, ids3[b, k, f]].
    Bit-exact (3-way bf16 split); see ``_gather3_kernel``.

    ``occupancy``: optional (cnt, active) from :func:`slots3_occupancy`
    (broadcast to bs), skipping the on-device occupancy build.
    """
    bs, n, D = table.shape
    nf = ids3.shape[-1]
    fstrip, chunk, pad_f, n_strips, pad_n, n_p, n_chunks, use_list = (
        _slots3_geometry(nf, n, fstrip, chunk)
    )
    ids_p = jnp.pad(ids3.reshape(bs, 3, nf), ((0, 0), (0, 0), (0, pad_f)))
    table_pl = jnp.pad(
        table.transpose(0, 2, 1), ((0, 0), (0, 0), (0, pad_n))
    )  # [bs, D, n_p]

    if occupancy is not None:
        cnt, active = occupancy
        w = n_chunks if use_list else -(-n_chunks // 32)
        assert active.shape == (bs, n_strips, w), (
            active.shape, (bs, n_strips, w),
        )
    else:
        chunk_of = ids_p.reshape(bs, 3, n_strips, fstrip).transpose(
            0, 2, 1, 3
        ).reshape(bs, n_strips, 3 * fstrip) // chunk
        occ = jnp.any(
            chunk_of[..., None] == jnp.arange(n_chunks, dtype=jnp.int32),
            axis=2,
        )
        cnt = jnp.sum(occ, axis=-1).astype(jnp.int32)
        if use_list:
            active = jnp.argsort(~occ, axis=-1, stable=True).astype(jnp.int32)
        else:
            active = _bitpack_mask(occ)

    n_list = active.shape[-1]
    kernel = functools.partial(
        _gather3_kernel, chunk=chunk, n_chunks=n_chunks, D=D,
        use_list=use_list,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_strips), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_strips, n_list), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 3, fstrip), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, D, n_p), lambda b, t: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, D, 3, fstrip), lambda b, t: (b, 0, 0, t)),
        out_shape=jax.ShapeDtypeStruct(
            (bs, D, 3, nf + pad_f), jnp.float32
        ),
        interpret=interpret,
    )(cnt.reshape(bs, 1, n_strips), active, ids_p, table_pl)
    return out[..., :nf] if pad_f else out


def _scatter3_kernel(
    cnt_ref,     # [1, 1, n_strips] int32 SMEM
    list_ref,    # [1, n_strips, n_chunks] int32 SMEM (or bitpacked words)
    ids_ref,     # [1, 3, F] int32: the strip's face range, all 3 slots
    g_ref,       # [1, D, 3, F] f32: planar slot gradients
    out_ref,     # [1, D, n_p] f32: THE WHOLE accumulator, VMEM-resident
    *,
    chunk,
    n_chunks,
    D,
    use_list,
):
    """Face-range slot scatter-add: out[:, ids[k, f]] += g[:, k, f].

    The transpose of ``_gather3_kernel``; bf16 hi+lo gradient split as in
    ``_scatter_kernel`` (~2^-17 rel).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def accumulate(c):
        rows = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (chunk, 1), 0
        )
        acc = jnp.zeros((D, chunk), jnp.float32)
        for k in range(3):
            one_hot = (ids_ref[0, k:k + 1, :] == rows).astype(jnp.bfloat16)
            g = g_ref[0, :, k]                   # [D, F] f32
            g_hi = g.astype(jnp.bfloat16)
            g_lo = (g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def dot_t(a, oh=one_hot):  # [D, F] x [K, F] -> [D, K]
                return jax.lax.dot_general(
                    a, oh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            acc += dot_t(g_hi) + dot_t(g_lo)
        col = pl.multiple_of(c * chunk, 128)
        out_ref[0, :, pl.ds(col, chunk)] += acc

    if use_list:
        def chunk_body(i, _):
            accumulate(list_ref[0, t, i])
            return 0

        jax.lax.fori_loop(0, cnt_ref[0, 0, t], chunk_body, 0)
    else:
        n_words = -(-n_chunks // 32)

        def word_body(w, _):
            _set_bit_loop(
                list_ref[0, t, w], lambda b: accumulate(w * 32 + b)
            )
            return 0

        jax.lax.fori_loop(0, n_words, word_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n", "fstrip", "chunk", "interpret"),
)
def scatter_slots3_pallas(
    g3, ids3, n, fstrip=1408, chunk=256, interpret=False, occupancy=None
):
    """Planar slot scatter: [bs, D, 3, nf] x [bs, 3, nf] int32 ->
    [bs, n, D] with out[b, ids3[b, k, f]] += g3[b, :, k, f] (ids < 0
    match nothing).  See ``_scatter3_kernel``.
    """
    bs, D = g3.shape[:2]
    nf = g3.shape[-1]
    fstrip, chunk, pad_f, n_strips, pad_n, n_p, n_chunks, use_list = (
        _slots3_geometry(nf, n, fstrip, chunk)
    )
    ids_p = jnp.pad(
        ids3.reshape(bs, 3, nf), ((0, 0), (0, 0), (0, pad_f)),
        constant_values=-1,
    )
    g_p = jnp.pad(g3, ((0, 0), (0, 0), (0, 0), (0, pad_f)))

    if occupancy is not None:
        cnt, active = occupancy
        w = n_chunks if use_list else -(-n_chunks // 32)
        assert active.shape == (bs, n_strips, w), (
            active.shape, (bs, n_strips, w),
        )
    else:
        chunk_of = jnp.where(ids_p < 0, -1, ids_p // chunk)
        chunk_of = chunk_of.reshape(bs, 3, n_strips, fstrip).transpose(
            0, 2, 1, 3
        ).reshape(bs, n_strips, 3 * fstrip)
        occ = jnp.any(
            chunk_of[..., None] == jnp.arange(n_chunks, dtype=jnp.int32),
            axis=2,
        )
        cnt = jnp.sum(occ, axis=-1).astype(jnp.int32)
        if use_list:
            active = jnp.argsort(~occ, axis=-1, stable=True).astype(jnp.int32)
        else:
            active = _bitpack_mask(occ)

    n_list = active.shape[-1]
    kernel = functools.partial(
        _scatter3_kernel, chunk=chunk, n_chunks=n_chunks, D=D,
        use_list=use_list,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bs, n_strips),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_strips), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, n_strips, n_list), lambda b, t: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 3, fstrip), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, D, 3, fstrip), lambda b, t: (b, 0, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, D, n_p), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bs, D, n_p), jnp.float32),
        interpret=interpret,
    )(cnt.reshape(bs, 1, n_strips), active, ids_p, g_p)
    return out[:, :, :n].transpose(0, 2, 1)


def compute_face_index_map_pallas(
    faces,
    image_size,
    near=0.1,
    far=100.0,
    draw_backside=True,
    face_chunk=256,
    tile=None,
    row_window=None,
    interpret=False,
    row_start=0,
    num_rows=None,
    return_depth=False,
    mode="auto",
    group_size=None,
):
    """Per-pixel z-buffered visible-face id (Pallas TPU kernel).

    Args:
      faces: [bs, nf, 3, 3] float32 NDC face vertices.
      tile: (tile_h, tile_w) pixel tile; defaults tuned on v5e.
      row_start/num_rows: optional row window (tile-sharded rendering).
      return_depth: also return the winning depths (``far`` on background)
        -- the combine operand for face-sharded rendering.

    Returns int32 [bs, num_rows, image_size]; -1 = background.
    (index, depth) when ``return_depth``.
    Bit-identical semantics to ``resolve.compute_face_index_map``.
    """
    if group_size is None:
        # no latch stores at all: large meshes amortize scalar bookkeeping
        # over 4-face groups like the xy-latch path (resolve_gather_pallas)
        group_size = 4 if faces.shape[1] >= 16384 else 2
    if row_window is None:
        row_window = 16 if faces.shape[1] >= 16384 else 24
    if tile is not None and mode == "auto":
        mode = "binned"  # an explicit tile pins the binned kernel
    if _pick_mode(mode, image_size, num_rows, False, 0) == "windowed":
        index, depth, _, _ = _run_windowed(
            faces, None, image_size, near, far, draw_backside,
            face_chunk, row_window, 128, False, interpret,
            group_size=group_size, row_start=row_start, num_rows=num_rows,
            group_unroll=_GROUP_UNROLL,
        )
    else:
        index, depth, _, _ = _run_binned(
            faces, None, image_size, near, far, draw_backside,
            face_chunk, tile, row_window, False, interpret,
            group_size=group_size, row_start=row_start, num_rows=num_rows,
        )
    if return_depth:
        return index, depth
    return index


compute_face_index_map_pallas = functools.partial(
    jax.jit,
    static_argnames=(
        "image_size", "near", "far", "draw_backside", "face_chunk", "tile",
        "row_window", "interpret", "num_rows", "return_depth", "mode",
        "group_size",
    ),
)(compute_face_index_map_pallas)
