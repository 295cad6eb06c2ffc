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
