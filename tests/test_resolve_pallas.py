"""Pallas resolve kernel parity vs the XLA reference resolve.

Runs in interpreter mode on CPU; on real TPU hardware the compiled kernel
was verified bit-exact against the same oracle (see resolve_pallas.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import neural_renderer_v2_pytorch_tpu as nr
from neural_renderer_v2_pytorch_tpu.ops.resolve import compute_face_index_map
from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
    compute_face_index_map_pallas,
)


@pytest.mark.parametrize("draw_backside", [True, False])
def test_pallas_matches_reference_teapot(reference_data, draw_backside):
    vertices, faces = nr.load_obj(str(reference_data / "teapot.obj"))
    renderer = nr.Renderer()
    renderer.viewpoints = nr.get_points_from_angles(2.732, 30, 45)
    tv = renderer.transform_vertices(jnp.asarray(vertices[None]))
    fv = jnp.take(tv, jnp.asarray(faces), axis=1)

    ref = np.asarray(compute_face_index_map(fv, 128, 0.1, 100.0, draw_backside, 16))
    pal = np.asarray(
        compute_face_index_map_pallas(
            fv, 128, 0.1, 100.0, draw_backside, face_chunk=32, tile=(64, 128),
            interpret=True,
        )
    )
    assert (ref == pal).all()


def test_pallas_batched_and_odd_faces():
    # batch of 2 random triangle soups, face count not a chunk multiple
    rng = np.random.RandomState(0)
    fv = jnp.asarray(rng.uniform(-1, 1, size=(2, 37, 3, 3)).astype("float32"))
    fv = fv.at[..., 2].set(jnp.abs(fv[..., 2]) + 0.5)  # positive depths

    ref = np.asarray(compute_face_index_map(fv, 64, 0.1, 100.0, True, 8))
    pal = np.asarray(
        compute_face_index_map_pallas(
            fv, 64, 0.1, 100.0, True, face_chunk=16, tile=(64, 64), interpret=True
        )
    )
    assert (ref == pal).all()
    assert (ref >= -1).all() and (ref < 37).all()


def test_row_window_matches_full_image(reference_data):
    """Row-windowed resolve (the tile-sharded path) must reproduce the
    full-image result band by band, including latched planes and depth,
    with a traced row_start."""
    import jax

    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas,
    )

    vertices, faces = nr.load_obj(str(reference_data / "teapot.obj"))
    renderer = nr.Renderer()
    renderer.viewpoints = nr.get_points_from_angles(2.732, 30, 45)
    tv = renderer.transform_vertices(jnp.asarray(vertices[None]))
    fv = jnp.take(tv, jnp.asarray(faces), axis=1)
    rng = np.random.RandomState(3)
    attrs = jnp.asarray(rng.rand(1, fv.shape[1], 5).astype("float32"))

    full = resolve_gather_pallas(fv, attrs, 128, interpret=True)
    bands = [
        resolve_gather_pallas(
            fv, attrs, 128, interpret=True,
            row_start=jnp.int32(r), num_rows=32,
        )
        for r in range(0, 128, 32)
    ]
    for j, name in enumerate(["index", "coords", "attrs"]):
        got = np.concatenate([np.asarray(b[j]) for b in bands], axis=-2)
        np.testing.assert_array_equal(got, np.asarray(full[j]), err_msg=name)

    # depth via the non-latch entry, traced row window under jit
    ref_i, ref_d = compute_face_index_map_pallas(
        fv, 128, interpret=True, return_depth=True
    )
    win = jax.jit(
        lambda f, r: compute_face_index_map_pallas(
            f, 128, interpret=True, row_start=r, num_rows=64,
            return_depth=True,
        )
    )
    for r in (0, 64):
        wi, wd = win(fv, jnp.int32(r))
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(ref_i)[:, r:r + 64])
        np.testing.assert_array_equal(np.asarray(wd), np.asarray(ref_d)[:, r:r + 64])


def test_latch_matches_to_map_oracle():
    """The fused latch (winner vertex-coord + attribute planes via the
    masked-store group cascade) against the XLA resolve + to_map path, on
    a random scene with an odd face count and group_size=2 chunks."""
    from neural_renderer_v2_pytorch_tpu.ops.maps import to_map
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas,
    )

    rng = np.random.RandomState(7)
    bs, nf = 2, 53
    fv = jnp.asarray(rng.uniform(-1, 1, size=(bs, nf, 3, 3)).astype("float32"))
    fv = fv.at[..., 2].set(jnp.abs(fv[..., 2]) + 0.3)
    attrs = jnp.asarray(rng.rand(bs, nf, 7).astype("float32"))

    fim, fvm, am = resolve_gather_pallas(
        fv, attrs, 64, face_chunk=16, tile=(32, 64), interpret=True
    )
    ref_fim = compute_face_index_map(fv, 64)
    np.testing.assert_array_equal(np.asarray(fim), np.asarray(ref_fim))
    ref_fvm = to_map(fv.reshape(bs, nf, 9), ref_fim).transpose(0, 3, 1, 2)
    ref_am = to_map(attrs, ref_fim).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(np.asarray(fvm), np.asarray(ref_fvm))
    np.testing.assert_array_equal(np.asarray(am), np.asarray(ref_am))


@pytest.mark.parametrize("row_window,group_size", [(16, 2), (8, 8), (8, 16)])
@pytest.mark.parametrize("draw_backside", [True, False])
def test_windowed_mode_matches_binned_and_xla(draw_backside, row_window, group_size):
    """The bin-free windowed kernel must be bit-identical to both the
    binned kernel and the XLA resolve, including latch planes, on a
    random soup with degenerates, duplicates, and an odd face count --
    across the (row_window, group_size) tuning space the TPU scheduler
    picks from (8-row windows halve the vector work of tiny faces)."""
    from neural_renderer_v2_pytorch_tpu.ops.maps import to_map
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas,
    )

    rng = np.random.RandomState(11)
    bs, nf = 2, 71
    fv = rng.uniform(-1, 1, size=(bs, nf, 3, 3)).astype("float32")
    fv[..., 2] = np.abs(fv[..., 2]) + 0.3
    fv[:, 5] = fv[:, 3]          # duplicate face
    fv[:, 7, 1] = fv[:, 7, 0]    # degenerate edge
    FV = jnp.asarray(fv)
    attrs = jnp.asarray(rng.rand(bs, nf, 4).astype("float32"))

    win = resolve_gather_pallas(
        FV, attrs, 128, draw_backside=draw_backside, interpret=True,
        mode="windowed", face_chunk=32, row_window=row_window,
        group_size=group_size,
    )
    binned = resolve_gather_pallas(
        FV, attrs, 128, draw_backside=draw_backside, interpret=True,
        mode="binned",
    )
    for w, b, name in zip(win, binned, ("index", "coords", "attrs")):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(b), err_msg=name)
    ref = compute_face_index_map(FV, 128, draw_backside=draw_backside)
    np.testing.assert_array_equal(np.asarray(win[0]), np.asarray(ref))

    # non-latch + depth + row window
    wi, wd = compute_face_index_map_pallas(
        FV, 128, draw_backside=draw_backside, interpret=True,
        mode="windowed", return_depth=True, row_start=jnp.int32(64),
        num_rows=64,
    )
    ri, rd = compute_face_index_map(
        FV, 128, draw_backside=draw_backside, return_depth=True
    )
    np.testing.assert_array_equal(np.asarray(wi), np.asarray(ri)[:, 64:])
    np.testing.assert_array_equal(np.asarray(wd), np.asarray(rd)[:, 64:])


def test_gather_rows_pallas_bit_exact():
    """The one-hot MXU gather must be BIT-exact vs jnp.take (its output
    feeds the resolve, whose backends are asserted bit-identical),
    including values with full 24-bit mantissas, odd sizes, and repeats."""
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        gather_rows_pallas,
    )

    rng = np.random.RandomState(12)
    for n, P, D in ((37, 100, 3), (700, 4096, 5)):
        table = jnp.asarray(
            (rng.randn(2, n, D) * np.exp(rng.uniform(-20, 20, (2, n, D))))
            .astype("float32")
        )
        ids = jnp.asarray(rng.randint(0, n, size=(2, P)).astype("int32"))
        got = np.asarray(
            gather_rows_pallas(table, ids, strip=512, chunk=128, interpret=True)
        )
        want = np.asarray(
            jax.vmap(lambda t, i: jnp.take(t, i, axis=0))(table, ids)
        )
        np.testing.assert_array_equal(got, want)


def test_scatter_rows_matches_segment_sum():
    """The parted-accumulator row scatter (large tables, e.g. texture
    atlases) against the XLA oracle, with out-of-range (-1) ids, a table
    larger than one part, and an odd P."""
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_rows_pallas,
    )

    rng = np.random.RandomState(14)
    bs, D, P, T = 2, 5, 1000, 3000
    g = jnp.asarray(rng.randn(bs, D, P).astype("float32"))
    ids = jnp.asarray(rng.randint(-1, T, size=(bs, P)).astype("int32"))

    got = np.asarray(
        scatter_rows_pallas(
            g, ids, T, strip=512, chunk=128,
            part_bytes=128 * 128 * 4 * D,  # force multiple parts
            interpret=True,
        )
    )

    def per(gb, ib):
        m = (ib >= 0)[:, None]
        return jnp.zeros((T, D)).at[jnp.maximum(ib, 0)].add(
            jnp.where(m, gb.T, 0.0)
        )

    want = np.asarray(jax.vmap(per)(g, ids))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-4 * scale)


def test_atlas_taps_texture_grads_match_autodiff():
    """The quad-merged texture-gradient backward (kernel path, interpret
    mode) against plain XLA autodiff of the taps, on a random atlas with
    taps crossing row boundaries."""
    from neural_renderer_v2_pytorch_tpu.ops.shading import _atlas_taps

    rng = np.random.RandomState(15)
    bs, th, tw, P = 2, 37, 53, 500
    T = th * tw
    flat = jnp.asarray(rng.rand(bs, 3, T).astype("float32"))
    # anchors anywhere a full 2x2 quad stays in range
    idx = jnp.asarray(rng.randint(0, T - tw - 2, size=(bs, P)).astype("int32"))
    cotan = rng.randn(bs, 4, 3, P).astype("float32")

    def loss(f, kernel):
        return jnp.sum(_atlas_taps(f, idx, tw, kernel) * cotan)

    g_ref = np.asarray(jax.grad(lambda f: loss(f, False))(flat))
    g_ker = np.asarray(jax.grad(lambda f: loss(f, True))(flat))
    scale = max(np.abs(g_ref).max(), 1e-6)
    np.testing.assert_allclose(g_ker, g_ref, atol=1e-4 * scale)
    # forward values equal the straightforward gathers
    np.testing.assert_array_equal(
        np.asarray(_atlas_taps(flat, idx, tw, True)),
        np.asarray(_atlas_taps(flat, idx, tw, False)),
    )


def test_atlas_taps_patch_reordered_grads_match():
    """The (16, 128) spatial patch reorder of the quad-merged scatter
    (hw given, odd image shape exercising the pad rows/cols) must produce
    the same texture gradients as the unordered kernel path and XLA
    autodiff -- the scatter is order-invariant up to f32 reassociation."""
    from neural_renderer_v2_pytorch_tpu.ops.shading import _atlas_taps

    rng = np.random.RandomState(16)
    bs, th, tw = 2, 41, 67
    H, W = 37, 150  # pads to (48, 256) patches
    P, T = H * W, th * tw
    flat = jnp.asarray(rng.rand(bs, 3, T).astype("float32"))
    idx = jnp.asarray(rng.randint(0, T - tw - 2, size=(bs, P)).astype("int32"))
    cotan = rng.randn(bs, 4, 3, P).astype("float32")

    def loss(f, kernel, hw):
        return jnp.sum(_atlas_taps(f, idx, tw, kernel, hw) * cotan)

    g_ref = np.asarray(jax.grad(lambda f: loss(f, False, None))(flat))
    g_pat = np.asarray(jax.grad(lambda f: loss(f, True, (H, W)))(flat))
    scale = max(np.abs(g_ref).max(), 1e-6)
    np.testing.assert_allclose(g_pat, g_ref, atol=1e-4 * scale)


def test_gather_face_vertices_grad_matches_segment_sum():
    """The vertex-gather's MXU-scatter transpose (shared-vertex gradient
    accumulation) against the XLA segment-sum path, with heavy vertex
    sharing and unused vertices."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
        gather_face_vertices,
    )

    rng = np.random.RandomState(13)
    nv, nf, bs = 29, 53, 2
    vertices = jnp.asarray(rng.randn(bs, nv, 3).astype("float32"))
    faces = jnp.asarray(rng.randint(0, nv, size=(nf, 3)).astype("int32"))
    cotan = rng.randn(bs, nf, 3, 3).astype("float32")

    def loss(v, backend):
        return jnp.sum(gather_face_vertices(v, faces, backend) * cotan)

    g_xla = np.asarray(jax.grad(lambda v: loss(v, "xla"))(vertices))
    g_pal = np.asarray(jax.grad(lambda v: loss(v, "pallas"))(vertices))
    scale = np.abs(g_xla).max()
    np.testing.assert_allclose(g_pal, g_xla, atol=1e-4 * scale)
    # forward is a plain gather either way
    np.testing.assert_array_equal(
        np.asarray(gather_face_vertices(vertices, faces, "pallas")),
        np.asarray(jnp.take(vertices, faces, axis=1)),
    )


def test_gather_face_vertices_planar_parity():
    """The coordinate-planar gather ([bs, 3, 3, nf], k-major slots) must
    be a pure relayout of the standard [bs, nf, 3, 3] gather -- values
    bit-equal and vertex gradients matching the XLA segment-sum -- with
    and without host-precomputed (k-major) occupancy lists."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
        gather_face_vertices,
        slot_occupancy,
    )

    rng = np.random.RandomState(7)
    nv, nf, bs = 61, 47, 2
    vertices = jnp.asarray(rng.randn(bs, nv, 3).astype("float32"))
    faces = jnp.asarray(rng.randint(0, nv, size=(nf, 3)).astype("int32"))
    std = np.asarray(jnp.take(vertices, faces, axis=1))

    occ = slot_occupancy(np.asarray(faces), nv, planar=True)
    for backend, occupancy in [("xla", None), ("pallas", None), ("pallas", occ)]:
        planar = np.asarray(
            gather_face_vertices(vertices, faces, backend, occupancy, True)
        )
        assert planar.shape == (bs, 3, 3, nf)
        np.testing.assert_array_equal(
            planar.transpose(0, 3, 2, 1), std, err_msg=f"{backend} {occupancy is not None}"
        )

    cotan = rng.randn(bs, 3, 3, nf).astype("float32")

    def loss(v, backend, occupancy):
        return jnp.sum(
            gather_face_vertices(v, faces, backend, occupancy, True) * cotan
        )

    g_xla = np.asarray(jax.grad(lambda v: loss(v, "xla", None))(vertices))
    # oracle: the standard-layout xla gather with the relayouted cotangent
    g_std = np.asarray(
        jax.grad(
            lambda v: jnp.sum(
                gather_face_vertices(v, faces, "xla")
                * cotan.transpose(0, 3, 2, 1)
            )
        )(vertices)
    )
    # k-major vs face-major slot order changes the segment-sum
    # accumulation order: equal up to f32 rounding, not bitwise
    scale0 = np.abs(g_std).max()
    np.testing.assert_allclose(g_xla, g_std, atol=1e-6 * scale0)
    for occupancy in [None, occ]:
        g_pal = np.asarray(
            jax.grad(lambda v: loss(v, "pallas", occupancy))(vertices)
        )
        scale = np.abs(g_std).max()
        np.testing.assert_allclose(g_pal, g_std, atol=1e-4 * scale)


def test_resolve_and_gather_planar_faces_parity(reference_data):
    """resolve_and_gather(planar_faces=True) on the [bs, 3, 3, nf] layout:
    forward bit-equal to the standard layout, backward matching with the
    cotangent relayouted, with and without attrs, both latch_z modes."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
        resolve_and_gather,
    )

    vertices, faces = nr.load_obj(str(reference_data / "teapot.obj"))
    renderer = nr.Renderer()
    renderer.viewpoints = nr.get_points_from_angles(2.732, 30, 45)
    tv = renderer.transform_vertices(jnp.asarray(vertices[None]))
    fv = jnp.take(tv, jnp.asarray(faces), axis=1)
    fvp = fv.transpose(0, 3, 2, 1)
    nf = fv.shape[1]
    rng = np.random.RandomState(3)
    attrs = jnp.asarray(rng.randn(1, nf, 5).astype("float32"))

    for latch_z, use_attrs in [(True, True), (False, False)]:
        a = attrs if use_attrs else None
        fim_s, fvm_s, ap_s = resolve_and_gather(
            fv, a, 0, 64, 0.1, 100.0, True, "pallas", None, latch_z, False
        )
        fim_p, fvm_p, ap_p = resolve_and_gather(
            fvp, a, 0, 64, 0.1, 100.0, True, "pallas", None, latch_z, True
        )
        np.testing.assert_array_equal(np.asarray(fim_s), np.asarray(fim_p))
        np.testing.assert_array_equal(np.asarray(fvm_s), np.asarray(fvm_p))
        if use_attrs:
            np.testing.assert_array_equal(np.asarray(ap_s), np.asarray(ap_p))

        cot = jnp.asarray(rng.randn(*fvm_s.shape).astype("float32"))

        def loss_s(x, a=a):
            _, m, _ = resolve_and_gather(
                x, a, 0, 64, 0.1, 100.0, True, "pallas", None, latch_z, False
            )
            return jnp.sum(m * cot)

        def loss_p(x, a=a):
            _, m, _ = resolve_and_gather(
                x, a, 0, 64, 0.1, 100.0, True, "pallas", None, latch_z, True
            )
            return jnp.sum(m * cot)

        g_s = np.asarray(jax.grad(loss_s)(fv))
        g_p = np.asarray(jax.grad(loss_p)(fvp))
        scale = max(np.abs(g_s).max(), 1e-6)
        np.testing.assert_allclose(
            g_p.transpose(0, 3, 2, 1), g_s, atol=1e-6 * scale
        )


def test_scatter_to_faces_matches_segment_sum(reference_data):
    """The MXU one-hot scatter backward == the XLA segment-sum oracle."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import _scatter_to_faces
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
    )

    vertices, faces = nr.load_obj(str(reference_data / "teapot.obj"))
    renderer = nr.Renderer()
    renderer.viewpoints = nr.get_points_from_angles(2.732, 30, 45)
    tv = renderer.transform_vertices(jnp.asarray(vertices[None]))
    fv = jnp.take(tv, jnp.asarray(faces), axis=1)
    nf = fv.shape[1]

    fim = compute_face_index_map(fv, 128, 0.1, 100.0, True, 16)
    rng = np.random.RandomState(1)
    g = jnp.asarray(rng.randn(1, 128, 128, 9).astype("float32"))

    ref = np.asarray(_scatter_to_faces(g, fim, nf))
    pal = np.asarray(
        scatter_to_faces_pallas(g, fim, nf, strip=2048, face_chunk=64, interpret=True)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=1e-4 * scale)


def test_scatter_to_faces_tiny_image_and_odd_faces():
    """Strip auto-shrink (P < default strip) and non-multiple face counts."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import _scatter_to_faces
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
    )

    rng = np.random.RandomState(2)
    nf = 37
    fim = jnp.asarray(rng.randint(-1, nf, size=(2, 32, 32)).astype("int32"))
    g = jnp.asarray(rng.randn(2, 32, 32, 5).astype("float32"))
    ref = np.asarray(_scatter_to_faces(g, fim, nf))
    pal = np.asarray(
        scatter_to_faces_pallas(g, fim, nf, face_chunk=16, interpret=True)
    )
    scale = np.abs(ref).max()
    np.testing.assert_allclose(pal, ref, atol=1e-4 * scale)


def test_scatter_to_faces_sub_batch_bit_exact():
    """The large-bs lax.map split (sub_batch) is bit-identical to the
    monolithic kernel, at a bs that is NOT a multiple of sub_batch (pad
    images must scatter nothing), for NHWC, planar/planar_out, and the
    static-occupancy path."""
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
        slot_scatter_occupancy,
    )

    rng = np.random.RandomState(5)
    nf, bs = 50, 10
    fim = jnp.asarray(rng.randint(-1, nf, size=(bs, 16, 128)).astype("int32"))
    g = jnp.asarray(rng.randn(bs, 16, 128, 4).astype("float32"))

    full = np.asarray(
        scatter_to_faces_pallas(
            g, fim, nf, face_chunk=16, interpret=True, sub_batch=None
        )
    )
    sub = np.asarray(
        scatter_to_faces_pallas(
            g, fim, nf, face_chunk=16, interpret=True, sub_batch=4
        )
    )
    np.testing.assert_array_equal(sub, full)

    gp = jnp.asarray(np.asarray(g).transpose(0, 3, 1, 2))
    for planar_out in (False, True):
        a = np.asarray(
            scatter_to_faces_pallas(
                gp, fim, nf, face_chunk=16, interpret=True,
                planar=True, planar_out=planar_out, sub_batch=None,
            )
        )
        b = np.asarray(
            scatter_to_faces_pallas(
                gp, fim, nf, face_chunk=16, interpret=True,
                planar=True, planar_out=planar_out, sub_batch=4,
            )
        )
        np.testing.assert_array_equal(b, a)

    # static ids (the face->vertex slot-map use) + occupancy lists
    ids = np.tile(
        rng.randint(-1, nf, size=(1, 2048)).astype("int32"), (bs, 1)
    )
    gi = jnp.asarray(rng.randn(bs, 1, 2048, 3).astype("float32"))
    occ = slot_scatter_occupancy(ids, nf, strip=512, face_chunk=16)
    kw = dict(strip=512, face_chunk=16, patch=None, interpret=True)
    a = np.asarray(
        scatter_to_faces_pallas(
            gi, jnp.asarray(ids), nf, occupancy=occ, sub_batch=None, **kw
        )
    )
    b = np.asarray(
        scatter_to_faces_pallas(
            gi, jnp.asarray(ids), nf, occupancy=occ, sub_batch=4, **kw
        )
    )
    np.testing.assert_array_equal(b, a)


@pytest.mark.parametrize("size", [320, 640, 136])
def test_non_power_of_two_sizes(size):
    """Auto tile selection must handle any 8-aligned image size (a fixed
    128-wide tile used to assert on sizes not divisible by 128)."""
    rng = np.random.RandomState(4)
    fv = jnp.asarray(rng.uniform(-1, 1, size=(1, 23, 3, 3)).astype("float32"))
    fv = fv.at[..., 2].set(jnp.abs(fv[..., 2]) + 0.5)
    ref = np.asarray(compute_face_index_map(fv, size, 0.1, 100.0, True, 8))
    pal = np.asarray(
        compute_face_index_map_pallas(fv, size, interpret=True)
    )
    assert (ref == pal).all()


def test_fuzz_random_scenes_resolve_and_scatter():
    """Randomized parity sweep: batched random triangle soups with exact
    duplicates, degenerate edges, and near-plane straddlers; the Pallas
    resolve must match the XLA resolve exactly and the scatter kernel the
    segment-sum (a larger 12-trial sweep ran clean on real TPU)."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import _scatter_to_faces
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
    )

    rng = np.random.RandomState(123)
    for _ in range(4):
        bs = int(rng.randint(1, 4))
        nf = int(rng.choice([3, 17, 100]))
        size = int(rng.choice([32, 64]))
        backside = bool(rng.rand() < 0.5)
        fv = rng.uniform(-1, 1, (bs, nf, 3, 3)).astype("float32")
        fv[..., 2] = np.abs(fv[..., 2]) + 0.1
        if nf > 4:
            fv[:, 1] = fv[:, 0]
            fv[:, 2, 1] = fv[:, 2, 0]
        FV = jnp.asarray(fv)
        ref = np.asarray(
            compute_face_index_map(FV, size, draw_backside=backside)
        )
        pal = np.asarray(
            compute_face_index_map_pallas(
                FV, size, draw_backside=backside, interpret=True
            )
        )
        assert (ref == pal).all()

        g = jnp.asarray(rng.randn(bs, size, size, 7).astype("float32"))
        r2 = np.asarray(_scatter_to_faces(g, jnp.asarray(ref), nf))
        p2 = np.asarray(
            scatter_to_faces_pallas(g, jnp.asarray(ref), nf, interpret=True)
        )
        scale = max(np.abs(r2).max(), 1e-6)
        np.testing.assert_allclose(p2, r2, atol=1e-4 * scale)


def test_scatter_planar_layout_matches_nhwc():
    """gather_resolve's backward always uses the planar=True layout on
    TPU; guard it against the NHWC-layout oracle."""
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
    )

    rng = np.random.RandomState(9)
    nf = 41
    fim = jnp.asarray(rng.randint(-1, nf, size=(2, 32, 32)).astype("int32"))
    g = rng.randn(2, 32, 32, 6).astype("float32")
    nhwc = np.asarray(
        scatter_to_faces_pallas(jnp.asarray(g), fim, nf, interpret=True)
    )
    planar = np.asarray(
        scatter_to_faces_pallas(
            jnp.asarray(g.transpose(0, 3, 1, 2)), fim, nf,
            interpret=True, planar=True,
        )
    )
    np.testing.assert_array_equal(planar, nhwc)


def test_vmem_budget_fallback_to_binned(reference_data, monkeypatch):
    """A too-small VMEM budget (wrong guess on an untested TPU
    generation, or the NRV2_WINDOWED_VMEM_BUDGET override) must degrade
    mode='auto' to the binned kernel -- bit-exact, never a hard compile
    error."""
    from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp

    monkeypatch.setenv("NRV2_WINDOWED_VMEM_BUDGET", "4096")
    rp._windowed_vmem_budget.cache_clear()
    try:
        assert rp._pick_mode("auto", 128, None, True, 6) == "binned"

        vertices, faces = nr.load_obj(str(reference_data / "teapot.obj"))
        renderer = nr.Renderer()
        renderer.viewpoints = nr.get_points_from_angles(2.732, 30, 45)
        tv = renderer.transform_vertices(jnp.asarray(vertices[None]))
        fv = jnp.take(tv, jnp.asarray(faces), axis=1)
        ref = np.asarray(compute_face_index_map(fv, 64, 0.1, 100.0, True, 16))
        pal = np.asarray(
            compute_face_index_map_pallas(
                fv, 64, 0.1, 100.0, True, interpret=True, mode="auto"
            )
        )
        assert (ref == pal).all()
    finally:
        monkeypatch.delenv("NRV2_WINDOWED_VMEM_BUDGET")
        rp._windowed_vmem_budget.cache_clear()


def test_vmem_probe_walkdown(monkeypatch):
    """On an unmeasured device generation the budget walks down probe by
    probe instead of hard-coding 12 MB; all probes failing means 'always
    binned' (budget 0), not an error."""
    from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp

    class FakeDev:
        device_kind = "TPU v3"

    monkeypatch.setattr(rp.jax, "devices", lambda: [FakeDev()])

    rp._windowed_vmem_budget.cache_clear()
    monkeypatch.setattr(rp, "_probe_vmem_budget", lambda b: b <= 6 * 2**20)
    assert rp._windowed_vmem_budget() == 6 * 2**20

    rp._windowed_vmem_budget.cache_clear()
    monkeypatch.setattr(rp, "_probe_vmem_budget", lambda b: False)
    assert rp._windowed_vmem_budget() == 0
    assert rp._pick_mode("auto", 32, None, False, 0) == "binned"

    rp._windowed_vmem_budget.cache_clear()


def test_scatter_patch_blockspec_matches_copy_path():
    """The zero-copy patch scatter (_scatter_kernel_patch: reorder via
    BlockSpec index maps) == the relayout-copy path and the segment-sum
    oracle, including a pad-needing odd size."""
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
        _scatter_to_faces,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
    )

    rng = np.random.RandomState(3)
    for H, W in [(128, 128), (96, 160), (130, 136)]:
        nf = 301
        fim = jnp.asarray(rng.randint(-1, nf, size=(2, H, W)).astype("int32"))
        g = rng.randn(2, 7, H, W).astype("float32")
        # call the blockspec body directly: the public entry gates it to
        # >= 16384 faces (measured crossover), too big for interpret mode
        from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
            _scatter_patch_blockspec,
        )

        new = np.asarray(
            _scatter_patch_blockspec(
                jnp.asarray(g), fim, nf, 16, 128, 128,
                interpret=True, planar_out=False,
            )
        )
        old = np.asarray(
            scatter_to_faces_pallas(
                jnp.asarray(g), fim, nf, interpret=True, planar=True,
                patch=None,
            )
        )
        ref = np.asarray(
            _scatter_to_faces(
                jnp.asarray(g.transpose(0, 2, 3, 1)), fim, nf
            )
        )
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(new, old, atol=1e-5 * scale)
        np.testing.assert_allclose(new, ref, atol=1e-4 * scale)


def test_bitpacked_word_skip_paths(monkeypatch):
    """Force use_list=False (the bitpacked word-skip loops, normally
    reached only when per-strip chunk lists exceed SMEM -- e.g. 158K
    faces at 512^2) by shrinking the SMEM budget, and check the
    scatter/gather kernels against their exact-list twins.  Guards the
    set-bit scan (_set_bit_loop) on every kernel that uses it."""
    from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp

    rng = np.random.RandomState(11)
    # > the ONE_HOT_BUDGET face-chunk cap (1024 at strip 2048), so the
    # tiny SMEM budget cannot be satisfied by growing the chunk and the
    # geometry must fall back to the bitpacked mask
    nf = 3000
    fim = jnp.asarray(rng.randint(-1, nf, size=(2, 64, 64)).astype("int32"))
    g = jnp.asarray(rng.randn(2, 5, 64, 64).astype("float32"))
    want = np.asarray(
        rp.scatter_to_faces_pallas(g, fim, nf, interpret=True, planar=True)
    )

    monkeypatch.setattr(rp, "_SMEM_BUDGET", 16)
    # the entry points are jitted and the SMEM budget is read at TRACE
    # time, so the monkeypatch must bust the jit cache or the second
    # call would replay the unforced executable (vacuous comparison)
    rp.scatter_to_faces_pallas.clear_cache()
    rp.gather_rows_pallas.clear_cache()
    assert rp._scatter_geometry(64 * 64, nf, 2048, 128)[-1] is False  # sanity
    got = np.asarray(
        rp.scatter_to_faces_pallas(g, fim, nf, interpret=True, planar=True)
    )
    np.testing.assert_array_equal(got, want)

    # the patch-BlockSpec kernel's bitpacked branch
    fim2 = jnp.asarray(rng.randint(-1, nf, size=(1, 128, 128)).astype("int32"))
    g2 = jnp.asarray(rng.randn(1, 4, 128, 128).astype("float32"))
    got2 = np.asarray(
        rp._scatter_patch_blockspec(
            g2, fim2, nf, 16, 128, 1024, interpret=True, planar_out=False
        )
    )
    monkeypatch.undo()
    want2 = np.asarray(
        rp._scatter_patch_blockspec(
            g2, fim2, nf, 16, 128, 1024, interpret=True, planar_out=False
        )
    )
    np.testing.assert_array_equal(got2, want2)

    # one-hot row gather's bitpacked branch (budget still 16 from above;
    # compute the forced result first, then undo + cache-bust for the
    # exact-list oracle)
    table = jnp.asarray(rng.randn(1, 3000, 6).astype("float32"))
    ids = jnp.asarray(rng.randint(0, 3000, size=(1, 900)).astype("int32"))
    monkeypatch.setattr(rp, "_SMEM_BUDGET", 16)
    rp.gather_rows_pallas.clear_cache()
    got3 = np.asarray(rp.gather_rows_pallas(table, ids, interpret=True))
    monkeypatch.undo()
    rp.gather_rows_pallas.clear_cache()
    want3 = np.asarray(rp.gather_rows_pallas(table, ids, interpret=True))
    np.testing.assert_array_equal(got3, want3)
    # leave no forced-geometry executables behind for later tests
    rp.scatter_to_faces_pallas.clear_cache()


def test_fused_preschedule_matches_xla_prepass():
    """The constants kernel's in-kernel preschedule (kill + roll-fold
    group unions + window table, round 5) against the XLA prepass it
    replaces: killed bboxes bit-equal, window tuples equal at every
    group base lane.  Window math is all-f32 on integer-valued floats
    (contraction-free), so interpret mode is an exact oracle; det is
    contraction-sensitive but only within 1 ulp of DEGENERATE_EPS,
    unreachable for this data."""
    from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp
    from neural_renderer_v2_pytorch_tpu.ops.resolve import (
        DEGENERATE_EPS, face_backside, face_constants_planar,
    )

    rng = np.random.RandomState(17)
    bs, nf, K, G = 2, 700, 256, 4
    S, rows, rw, cw, rs = 256, 256, 16, 128, 32
    fvp = jnp.asarray(rng.randn(bs, 3, 3, nf).astype("float32") + 1.0)

    for draw_backside in (True, False):
        consts, coords, wtbl = rp._face_chunks_pallas(
            fvp, K, 6, True,
            presched=dict(
                draw_backside=draw_backside, group_size=G, num_rows=rows,
                row_window=rw, col_window=cw, image_size=S,
            ),
            row_start=rs,
        )

        # oracle: the XLA prepass on the XLA constants builder
        pad = (-nf) % K
        n_chunks = (nf + pad) // K
        cp = jnp.pad(face_constants_planar(fvp), ((0, 0), (0, 0), (0, pad)))
        consts_ch = cp.reshape(bs, 17, n_chunks, K).transpose(0, 2, 1, 3)
        det = consts_ch[:, :, 12]
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
        gpc = K // G
        gb = bbox_k.reshape(bs, n_chunks, 4, gpc, G)
        xmin_u, xmax_u = gb[:, :, 0].min(-1), gb[:, :, 1].max(-1)
        ymin_u, ymax_u = gb[:, :, 2].min(-1), gb[:, :, 3].max(-1)
        g_r0, g_nr = rp._row_windows(
            (0.0, 0.0, ymin_u, ymax_u), jnp.float32(rs), rows, rw, S
        )
        g_c0, g_nc = rp._col_windows((xmin_u, xmax_u, 0.0, 0.0), cw, S)
        tbl_ref = np.asarray(
            jnp.stack([g_r0, g_nr, g_c0, g_nc], -1).astype(jnp.int32)
        )  # [bs, nc, gpc, 4]

        np.testing.assert_array_equal(
            np.asarray(consts[:, :, 13:17]), np.asarray(bbox_k),
            err_msg="killed bboxes (draw_backside=%s)" % draw_backside,
        )
        got = np.asarray(wtbl)[:, :, :, ::G]  # base lanes -> [bs,nc,4,gpc]
        np.testing.assert_array_equal(
            got.transpose(0, 1, 3, 2), tbl_ref,
            err_msg="window table (draw_backside=%s)" % draw_backside,
        )
