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


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_face_vertices(vertices, face_indices, backend):
    """``vertices[:, face_indices]`` ([bs, nv, 3] -> [bs, nf, 3, 3]) with
    a selectable shared-vertex-gradient transpose.

    This is the reference's face assembly (rasterize.py:231-232).  The
    forward is always XLA's row gather.  ``backend='pallas'`` runs the
    transpose as predicated one-hot MXU matmuls over the nf*3 slots
    (``scatter_to_faces_pallas``; 'faces' are vertices there); 'xla' uses
    the segment-sum.

    Measured guidance (v5e, 158K faces / 236K vertices, first-use-
    coherent ids): XLA wins BOTH directions here -- fwd gather 5.4 vs
    10.0 ms, transpose 2.4 vs 5.1 ms -- so the pipeline passes 'xla'.
    Vertex-id COHERENCE is what makes XLA's sorted scatter fast (the same
    transpose cost 8.0 ms before the benchmark meshes were renumbered in
    first-use order); the one-hot kernels win only where the target is
    small relative to the source (the pixel->face scatter: 2.7 vs
    4.6 ms) or where XLA's serial scatter degenerates (the 2.3M-texel
    atlas: 42 ms -> scatter_rows_pallas).
    """
    return jnp.take(vertices, face_indices, axis=1)


def _gfv_fwd(vertices, face_indices, backend):
    out = jnp.take(vertices, face_indices, axis=1)
    return out, (face_indices, vertices.shape[1])


def _gfv_bwd(backend, residuals, g):
    face_indices, num_vertices = residuals
    bs, nf = g.shape[:2]
    slots = nf * 3
    flat_idx = face_indices.reshape(-1)
    if backend == "pallas":
        from .resolve_pallas import scatter_to_faces_pallas

        slot_map = jnp.broadcast_to(flat_idx[None, None], (bs, 1, slots))
        g_vertices = scatter_to_faces_pallas(
            g.reshape(bs, 1, slots, 3), slot_map, num_vertices,
            face_chunk=512, interpret=_interpret(),
        )
    else:
        def per_batch(gb):
            return jax.ops.segment_sum(
                gb.reshape(slots, 3), flat_idx, num_segments=num_vertices
            )

        g_vertices = jax.vmap(per_batch)(g)
    g_idx = np.zeros(face_indices.shape, jax.dtypes.float0)
    return g_vertices, g_idx


gather_face_vertices.defvjp(_gfv_fwd, _gfv_bwd)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9),
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
):
    """Returns (face_index_map, fvm_planar, attr_planes).

    Args:
      face_vertices: [bs, nf, 3, 3] NDC face vertices (differentiable).
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
        draw_backside, backend, num_rows, latch_z,
    )


_XY_PLANES = (0, 1, 3, 4, 6, 7)


def _forward(face_vertices, face_attrs, row_start, image_size, near, far,
             draw_backside, backend, num_rows, latch_z):
    bs, nf = face_vertices.shape[:2]
    coords_src = (
        face_vertices.reshape(bs, nf, 9) if latch_z
        else face_vertices[..., :2].reshape(bs, nf, 6)
    )
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
        )
    else:
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
         draw_backside, backend, num_rows, latch_z):
    out = _forward(
        face_vertices, face_attrs, row_start, image_size, near, far,
        draw_backside, backend, num_rows, latch_z,
    )
    fim = out[0]
    residuals = (fim, face_vertices.shape[1])
    return out, residuals


def _bwd(image_size, near, far, draw_backside, backend, num_rows, latch_z,
         residuals, g):
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
        # strip-major layout the kernel wants
        g_all = jnp.concatenate([g_fvm, g_attr], 1) if has_attr else g_fvm
        per_face = scatter_to_faces_pallas(
            g_all, fim, num_faces, planar=True, interpret=_interpret()
        )
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
    if latch_z:
        g_faces = g_coords.reshape(bs, num_faces, 3, 3)
    else:
        g_faces = jnp.pad(
            g_coords.reshape(bs, num_faces, 3, 2), ((0, 0),) * 3 + ((0, 1),)
        )
    # row_start is an integer scalar: its cotangent is the trivial float0
    g_row_start = np.zeros((), jax.dtypes.float0)
    return g_faces, g_attrs, g_row_start


resolve_and_gather.defvjp(_fwd, _bwd)
