"""resolve_and_gather: z-resolve fused with winner-attribute gather,
with a scatter-add backward.

This op is the TPU-native answer to the reference's kernel + gather
split: the CUDA pipeline resolves visibility (kernel N1) and then the
Python layer re-gathers per-face data at every pixel (``to_map``,
utils.py:104-114, whose autograd transpose is an atomicAdd scatter in the
chainer twin, rasterize.py:94-115).  Here the winning face's vertex
coordinates and auxiliary attributes come OUT of the resolve kernel
directly as channel planes (vector stores inside the face stream -- no
gathers, no layout changes), and the backward is one fused MXU one-hot
matmul scatter (deterministic, no atomics).

Layout: everything is channel-planar (NCHW) -- the latched coordinate
map is [bs, 9, H, W] and attributes [bs, A, H, W] -- matching the Pallas
kernel's native output and the pipeline's layout, so no transposes occur
on either side of the op.

Gradient semantics match ``to_map`` exactly: d(face_data)[b, fim[p]] +=
g[p] over foreground pixels; the face-index map itself carries no
gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .maps import to_map
from .resolve import compute_face_index_map


def _scatter_to_faces(grad_map, face_index_map, num_faces):
    """[bs, H, W, D] pixel grads -> [bs, nf, D] per-face grads
    (masked segment-sum; the transpose of the winner-gather).  XLA
    fallback used off-TPU; the TPU path is scatter_to_faces_pallas."""
    bs = grad_map.shape[0]
    D = grad_map.shape[-1]
    flat_g = grad_map.reshape(bs, -1, D)
    flat_i = face_index_map.reshape(bs, -1)
    mask = (flat_i >= 0)[..., None]
    flat_g = jnp.where(mask, flat_g, 0.0)
    safe_i = jnp.maximum(flat_i, 0)

    def per_batch(g, i):
        return jax.ops.segment_sum(g, i, num_segments=num_faces)

    return jax.vmap(per_batch)(flat_g, safe_i)


def _interpret():
    """Pallas kernels run compiled on TPU, interpreted elsewhere (the
    interpret path is pure jax ops -- used by the CPU test mesh and the
    driver's multichip dryrun)."""
    return jax.default_backend() != "tpu"


# the slot ops' tuned geometry (v5e, 158K faces / 236K vertices,
# same-session A/Bs): gradient scatter 4096-slot strips x 256-vertex
# chunks -- 1.7 ms vs 6.6 ms for XLA's segment-sum; forward gather
# 8192 x 512 -- 4.1 ms (dynamic prep) vs 5.0 ms for XLA's row gather.
# Smaller strips lose to per-program overhead, larger to one-hot width.
_SLOT_STRIP = 4096
_SLOT_CHUNK = 256
_GATHER_STRIP = 8192
_GATHER_CHUNK = 512
# face-range twins (planar [bs, 3, 3, nf] path): a strip is fstrip FACES
# (3 slots each), so fstrip = strip/3 keeps the per-strip vertex-id span
# -- and hence the one-hot work -- equal to the face-major layout's
_SLOT3_FSTRIP = 1408
_SLOT3_CHUNK = 256
_GATHER3_FSTRIP = 2816
_GATHER3_CHUNK = 512


# v5e cost-model constants for the one-hot-vs-XLA crossover, fitted to
# same-session A/Bs at 473K slots / 236K vertices: XLA's serial row ops
# run ~10-14 ns/row; the one-hot kernels cost ~2 VPU lane-ops per
# compare (build + cast) plus ~3 us of per-strip program overhead.
# NOTE on the gather rate: standalone, XLA's take runs at 2.3-4.6
# ns/slot outside a table-size cliff (see _gather_table_pad) -- but
# IN SITU the one-hot gather still wins at scale because it emits the
# coordinate-planar [bs, 3, 3, nf] layout directly, while the XLA path
# pays the minor-dim-3 relayout behind jnp.take (full-step A/B:
# one-hot wins by 0.8-1.0 ms at 473K slots and ~0.6 ms at 1.9M, loses
# ~0.3 ms at 118K -- hence the _GATHER_MIN_SLOTS floor).
_XLA_SCATTER_NS = 14.0
_XLA_GATHER_NS = 10.6  # effective in-situ rate (take + planar relayout)
_GATHER_MIN_SLOTS = 250_000
_LANEOPS_PER_S = 0.96e12
_STRIP_OVERHEAD_S = 3e-6


def _onehot_wins(cnt, K, T, n_strips, xla_ns, n_slots):
    compares = float(cnt.sum()) * K * T
    t_onehot = compares * 2 / _LANEOPS_PER_S + n_strips * _STRIP_OVERHEAD_S
    return t_onehot < n_slots * xla_ns * 1e-9


def _gather_table_pad(nv):
    """Rows to pad a gather TABLE past XLA:TPU's table-size perf cliff.

    Measured on v5e (473K-slot gather, coherent ids, N-differenced scan
    chains): jnp.take runs at 2.3-4.6 ns/slot for tables below ~229K or
    at/above ~278K rows, but ~11.6 ns/slot (4-5x) for tables inside
    (229376, 278528) -- reproduced at 245760/262144 slow vs
    229376/278528 fast, and on the real 236,544-vertex subdivided
    teapot (5.4 ms -> 2.07 ms once padded to 2^19).  Zero-padding the
    table through the band is a pure copy (< 10 us).  This protects the
    XLA path (small or id-incoherent meshes, where the one-hot gather is
    not selected) from the cliff; at scale the one-hot gather still wins
    in situ via its planar-native output (see the note on
    _XLA_GATHER_NS)."""
    if 229376 < nv < 278528:
        return 278528 - nv
    return 0


@functools.lru_cache(maxsize=16)
def _slot_occupancy_cached(faces_bytes, nf, nv, k_major):
    """Host-side active-chunk lists for the face->vertex slot scatter
    AND forward gather (mesh connectivity is static in every real
    workload, so this runs numpy once per mesh and the lists become free
    trace constants).  Either direction is None when the exact host
    occupancy says its one-hot kernel would LOSE to the XLA row op
    (id spread grows with mesh size; at ~631K faces the gather crosses
    back to XLA).

    ``k_major``: lists for the PLANAR path's face-range kernels
    (``gather_faces3_pallas`` / ``scatter_slots3_pallas``, whose
    [bs, 3, 3, nf] layout flattens k-major) instead of the flat
    face-major slot kernels.  Occupancy lists are geometry- and
    order-dependent; a mismatch silently drops contributions, so this
    flag must track the caller's ``planar``.
    """
    from .resolve_pallas import (
        slot_gather_occupancy,
        slot_scatter_occupancy,
        slots3_occupancy,
    )

    slots = np.frombuffer(faces_bytes, np.int32)
    assert slots.size == nf * 3
    # keep NUMPY (jnp constants created inside a trace would leak as
    # tracers through this cache); consumers treat them as trace constants
    if k_major:
        faces = slots.reshape(nf, 3)
        scatter = slots3_occupancy(
            faces, nv, fstrip=_SLOT3_FSTRIP, chunk=_SLOT3_CHUNK
        )
        if not _onehot_wins(
            scatter[0], _SLOT3_CHUNK, 3 * _SLOT3_FSTRIP,
            scatter[0].shape[-1], _XLA_SCATTER_NS, slots.size,
        ):
            scatter = None
        gather = slots3_occupancy(
            faces, nv, fstrip=_GATHER3_FSTRIP, chunk=_GATHER3_CHUNK
        )
        if slots.size < _GATHER_MIN_SLOTS or not _onehot_wins(
            gather[0], _GATHER3_CHUNK, 3 * _GATHER3_FSTRIP,
            gather[0].shape[-1], _XLA_GATHER_NS, slots.size,
        ):
            gather = None
        return scatter, gather
    scatter = slot_scatter_occupancy(
        slots, nv, strip=_SLOT_STRIP, face_chunk=_SLOT_CHUNK
    )
    if not _onehot_wins(
        scatter[0], _SLOT_CHUNK, _SLOT_STRIP, scatter[0].shape[-1],
        _XLA_SCATTER_NS, slots.size,
    ):
        scatter = None
    gather = slot_gather_occupancy(
        slots, nv, strip=_GATHER_STRIP, chunk=_GATHER_CHUNK
    )
    if slots.size < _GATHER_MIN_SLOTS or not _onehot_wins(
        gather[0], _GATHER_CHUNK, _GATHER_STRIP, gather[0].shape[-1],
        _XLA_GATHER_NS, slots.size,
    ):
        gather = None
    return scatter, gather


def slot_occupancy(faces, num_vertices, planar=False):
    """(scatter_lists, gather_lists) for :func:`gather_face_vertices` --
    each a (cnt, active) pair or None where XLA wins -- or None overall
    when ``faces`` is traced (non-constant).  ``planar`` must match the
    later ``gather_face_vertices(..., planar=...)`` call (it fixes the
    slot order the lists are built for)."""
    if isinstance(faces, jax.core.Tracer):
        return None
    f = np.asarray(faces, np.int32)
    occ = _slot_occupancy_cached(f.tobytes(), f.shape[0], num_vertices, planar)
    if occ == (None, None):
        return None
    return occ


def _gfv_primal(vertices, face_indices, backend, occupancy, planar):
    gather_occ = None if occupancy is None else occupancy[1]
    nf = face_indices.shape[0]
    if backend == "pallas" and gather_occ is not None:
        bs, nv = vertices.shape[:2]
        occ = tuple(
            jnp.broadcast_to(o, (bs,) + o.shape[1:]) for o in gather_occ
        )
        if planar:
            from .resolve_pallas import gather_faces3_pallas

            ids3 = jnp.broadcast_to(face_indices.T[None], (bs, 3, nf))
            return gather_faces3_pallas(
                vertices, ids3, fstrip=_GATHER3_FSTRIP,
                chunk=_GATHER3_CHUNK, occupancy=occ,
                interpret=_interpret(),
            )  # [bs, coord, k, nf]; bit-exact == jnp.take
        from .resolve_pallas import gather_rows_pallas

        ids = jnp.broadcast_to(
            face_indices.reshape(-1)[None], (bs, nf * 3)
        )
        out = gather_rows_pallas(
            vertices, ids, strip=_GATHER_STRIP, chunk=_GATHER_CHUNK,
            occupancy=occ, interpret=_interpret(),
        )  # bit-exact == jnp.take (3-way bf16 split)
        return out.reshape(bs, nf, 3, 3)
    pad = _gather_table_pad(vertices.shape[1])
    if pad:
        vertices = jnp.pad(vertices, ((0, 0), (0, pad), (0, 0)))
    out = jnp.take(vertices, face_indices, axis=1)  # [bs, nf, k, coord]
    if planar:
        out = out.transpose(0, 3, 2, 1)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def gather_face_vertices(
    vertices, face_indices, backend, occupancy=None, planar=False
):
    """``vertices[:, face_indices]`` ([bs, nv, 3] -> [bs, nf, 3, 3]) with
    selectable forward-gather and shared-vertex-gradient-transpose
    backends.

    This is the reference's face assembly (rasterize.py:231-232).
    ``backend='pallas'`` with host-precomputed ``occupancy``
    (:func:`slot_occupancy` -- free, the mesh is static in every real
    workload) runs BOTH directions as one-hot MXU matmuls over the nf*3
    slots, looping each slot strip's compact active-vertex-chunk list:
    the forward through the BIT-exact ``gather_rows_pallas`` (3-way bf16
    split; measures 4.1 vs 5.0 ms for XLA's serial row gather at 158K
    faces / 236K coherent vertices), the transpose through
    ``scatter_to_faces_pallas`` (1.7 vs 6.6 ms for XLA's segment-sum).
    Without occupancy (traced faces) both directions fall back to XLA.

    ``planar``: return the coordinate-planar [bs, 3 (coord), 3 (vertex),
    nf] layout instead -- what ``resolve_gather_pallas(planar_faces=
    True)`` consumes, so the hot path never materializes the
    [bs, nf, 3, 3] form (whose minor dims of 3 lane-pad 42x under TPU
    tiling; measured ~2.6 ms of pure layout copies at 158K faces).  The
    kernel directions then run as the FACE-RANGE one-hot ops
    (``gather_faces3_pallas`` / ``scatter_slots3_pallas``): a flat
    k-major slot strip would span 3x more faces -- and ~2.6x the active
    vertex chunks (measured on the 158K-face teapot, flipping the
    gather's cost model to XLA) -- than the face-major order at equal
    width, so these strip over FACES and handle all three vertex slots
    per program, keeping the one-hot work at face-major levels.
    ``occupancy`` must then be built with ``slot_occupancy(...,
    planar=True)`` (face-range geometry).
    """
    return _gfv_primal(vertices, face_indices, backend, occupancy, planar)


def _gfv_fwd(vertices, face_indices, backend, occupancy=None, planar=False):
    out = _gfv_primal(vertices, face_indices, backend, occupancy, planar)
    return out, (face_indices, vertices.shape[1], occupancy)


def _gfv_bwd(backend, planar, residuals, g):
    face_indices, num_vertices, occupancy = residuals
    bs = g.shape[0]
    nf = g.shape[-1] if planar else g.shape[1]
    slots = nf * 3
    flat_idx = (
        face_indices.T.reshape(-1) if planar else face_indices.reshape(-1)
    )
    scatter_occ = None if occupancy is None else occupancy[0]
    # with occupancy present, the per-direction None means the host cost
    # model picked XLA for that direction
    use_kernel = backend == "pallas" and (
        occupancy is None or scatter_occ is not None
    )
    if use_kernel:
        occ = scatter_occ
        if occ is not None:
            # the slot map is batch-invariant; broadcast the host lists
            occ = tuple(
                jnp.broadcast_to(o, (bs,) + o.shape[1:]) for o in occ
            )
        if planar:
            from .resolve_pallas import scatter_slots3_pallas

            nf_ = g.shape[-1]
            ids3 = jnp.broadcast_to(face_indices.T[None], (bs, 3, nf_))
            g_vertices = scatter_slots3_pallas(
                g, ids3, num_vertices, fstrip=_SLOT3_FSTRIP,
                chunk=_SLOT3_CHUNK, occupancy=occ, interpret=_interpret(),
            )
        else:
            from .resolve_pallas import scatter_to_faces_pallas

            slot_map = jnp.broadcast_to(flat_idx[None], (bs, slots))
            g_vertices = scatter_to_faces_pallas(
                g.reshape(bs, 1, slots, 3), slot_map, num_vertices,
                strip=_SLOT_STRIP, face_chunk=_SLOT_CHUNK, patch=None,
                occupancy=occ, interpret=_interpret(),
            )
    else:
        def per_batch(gb):
            flat_g = (
                gb.transpose(1, 2, 0).reshape(slots, 3) if planar
                else gb.reshape(slots, 3)
            )
            return jax.ops.segment_sum(
                flat_g, flat_idx, num_segments=num_vertices
            )

        g_vertices = jax.vmap(per_batch)(g)
    g_idx = np.zeros(face_indices.shape, jax.dtypes.float0)
    g_occ = (
        None if occupancy is None
        else tuple(
            None if pair is None
            else tuple(np.zeros(o.shape, jax.dtypes.float0) for o in pair)
            for pair in occupancy
        )
    )
    return g_vertices, g_idx, g_occ


gather_face_vertices.defvjp(_gfv_fwd, _gfv_bwd)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10),
)
def resolve_and_gather(
    face_vertices,
    face_attrs,
    row_start,
    image_size,
    near,
    far,
    draw_backside,
    backend,
    num_rows,
    latch_z=True,
    planar_faces=False,
):
    """Returns (face_index_map, fvm_planar, attr_planes).

    Args:
      face_vertices: [bs, nf, 3, 3] NDC face vertices (differentiable),
        or the coordinate-planar [bs, 3 (coord), 3 (vertex), nf] layout
        when ``planar_faces`` (requires ``backend='pallas'``; see
        :func:`gather_face_vertices` ``planar`` -- the hot path then
        never materializes a minor-dim-3 array, and the backward's
        vertex-coordinate cotangent comes back planar too).
      face_attrs: [bs, nf, A] auxiliary per-face attributes
        (differentiable), or None.
      row_start: first image row to render (int scalar; may be traced --
        the tile-sharded path passes ``axis_index('tile') * rows``).
      backend: 'pallas' (fused kernel) or 'xla' (resolve + to_map gathers).
      num_rows: rows to render (static), or None for the full image.
      latch_z: when False, only the winner's XY coords are latched (the
        silhouette path never reads z) and fvm_planar's z planes (2,5,8)
        are constant zeros; no gradient flows into vertex z either way
        through those planes.

    Outputs (H = num_rows):
      face_index_map: [bs, H, W] int32, -1 background (non-differentiable).
      fvm_planar: [bs, 9, H, W] winner vertex coords, 0 on background.
      attr_planes: [bs, A, H, W] or None.
    """
    return _forward(
        face_vertices, face_attrs, row_start, image_size, near, far,
        draw_backside, backend, num_rows, latch_z, planar_faces,
    )


_XY_PLANES = (0, 1, 3, 4, 6, 7)


def _forward(face_vertices, face_attrs, row_start, image_size, near, far,
             draw_backside, backend, num_rows, latch_z, planar_faces):
    if backend == "pallas":
        from .resolve_pallas import resolve_gather_pallas

        fim, fvm_c, attr_planes = resolve_gather_pallas(
            jax.lax.stop_gradient(face_vertices),
            None if face_attrs is None else jax.lax.stop_gradient(face_attrs),
            image_size,
            near,
            far,
            draw_backside,
            row_start=row_start,
            num_rows=num_rows,
            interpret=_interpret(),
            latch_z=latch_z,
            planar_faces=planar_faces,
        )
    else:
        assert not planar_faces, "planar_faces requires backend='pallas'"
        bs, nf = face_vertices.shape[:2]
        coords_src = (
            face_vertices.reshape(bs, nf, 9) if latch_z
            else face_vertices[..., :2].reshape(bs, nf, 6)
        )
        fim = compute_face_index_map(
            jax.lax.stop_gradient(face_vertices),
            image_size, near, far, draw_backside,
            row_start=row_start, num_rows=num_rows,
        )
        fvm_c = to_map(coords_src, fim).transpose(0, 3, 1, 2)
        attr_planes = (
            None if face_attrs is None
            else to_map(face_attrs, fim).transpose(0, 3, 1, 2)
        )
    if latch_z:
        fvm_planar = fvm_c
    else:
        # assemble the 9-plane layout with zero z planes (fused away by
        # XLA into the consumers; both backends produce the same planes)
        z = jnp.zeros_like(fvm_c[:, :1])
        fvm_planar = jnp.concatenate(
            [fvm_c[:, 0:2], z, fvm_c[:, 2:4], z, fvm_c[:, 4:6], z], 1
        )
    return fim, fvm_planar, attr_planes


def _fwd(face_vertices, face_attrs, row_start, image_size, near, far,
         draw_backside, backend, num_rows, latch_z, planar_faces):
    out = _forward(
        face_vertices, face_attrs, row_start, image_size, near, far,
        draw_backside, backend, num_rows, latch_z, planar_faces,
    )
    fim = out[0]
    nf = face_vertices.shape[-1] if planar_faces else face_vertices.shape[1]
    residuals = (fim, nf)
    return out, residuals


def _bwd(image_size, near, far, draw_backside, backend, num_rows, latch_z,
         planar_faces, residuals, g):
    fim, num_faces = residuals
    _, g_fvm, g_attr = g
    bs, H, W = fim.shape
    has_attr = g_attr is not None and not isinstance(
        g_attr, jax.custom_derivatives.SymbolicZero
    )
    if not latch_z:
        # z planes are constant zeros in the primal: drop their cotangents
        g_fvm = g_fvm[:, _XY_PLANES]
    C = g_fvm.shape[1]
    if backend == "pallas":
        from .resolve_pallas import scatter_to_faces_pallas

        # one fused kernel call: coords and attrs share the one-hot
        # matmul; the planar cotangents [bs, D, H, W] are already in the
        # strip-major layout the kernel wants.  With planar faces the
        # per-face result stays in the accumulator's native [bs, D, nf]
        # layout (plane p = 3k + coord reshapes to [bs, k, coord, nf]
        # for free; only a cheap major-dim swap to coord-major remains).
        g_all = jnp.concatenate([g_fvm, g_attr], 1) if has_attr else g_fvm
        per_face = scatter_to_faces_pallas(
            g_all, fim, num_faces, planar=True, interpret=_interpret(),
            planar_out=planar_faces,
        )
        if planar_faces:
            g_coords = per_face[:, :C]
            g_attrs = (
                per_face[:, C:].transpose(0, 2, 1) if has_attr else None
            )
        else:
            g_coords = per_face[..., :C]
            g_attrs = per_face[..., C:] if has_attr else None
    else:
        g_coords = _scatter_to_faces(
            g_fvm.transpose(0, 2, 3, 1), fim, num_faces
        )
        g_attrs = (
            _scatter_to_faces(g_attr.transpose(0, 2, 3, 1), fim, num_faces)
            if has_attr else None
        )
    if planar_faces:
        # planes p = 3k + coord (xy-latch: 2k + coord, pad z back)
        if latch_z:
            gk = g_coords.reshape(bs, 3, 3, num_faces)
        else:
            gk = jnp.pad(
                g_coords.reshape(bs, 3, 2, num_faces),
                ((0, 0), (0, 0), (0, 1), (0, 0)),
            )
        g_faces = gk.transpose(0, 2, 1, 3)  # [bs, coord, k, nf]
    elif latch_z:
        g_faces = g_coords.reshape(bs, num_faces, 3, 3)
    else:
        g_faces = jnp.pad(
            g_coords.reshape(bs, num_faces, 3, 2), ((0, 0),) * 3 + ((0, 1),)
        )
    # row_start is an integer scalar: its cotangent is the trivial float0
    g_row_start = np.zeros((), jax.dtypes.float0)
    return g_faces, g_attrs, g_row_start


resolve_and_gather.defvjp(_fwd, _bwd)
