"""Direct A/B parity against the LIVING reference (CPU torch).

The reference's pure-torch modules (no CUDA, no chainer) load and run on
CPU: differentiation, utils (maximum/pad_zeros/to_map/mask_foreground,
create_textures, get_points_from_angles), look/look_at/perspective,
load_obj/save_obj.  These tests import them through an importlib shim
(the package __init__ pulls in the CUDA extension, so modules are loaded
individually under a synthetic package) and assert near-bit parity --
the reference's own primary oracle tier (SURVEY.md section 4.1), applied
with the reference itself as the oracle instead of re-derived math.

Reference anchors: neural_renderer_torch/differentiation.py:6-40,
utils.py:30-160, look.py:5-41, look_at.py:5-44, perspective.py:4-18,
load_obj.py:7-166, save_obj.py:5-47.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/neural_renderer_torch/"


@pytest.fixture(scope="module")
def ref(reference_data):
    """The chainer-free reference modules under a synthetic package."""
    del reference_data  # ensures the reference checkout is present
    pkg = types.ModuleType("_refnr")
    pkg.__path__ = [REF]
    sys.modules.setdefault("_refnr", pkg)
    mods = {}
    for m in ("utils", "differentiation", "look", "look_at", "perspective",
              "load_obj", "save_obj"):
        name = "_refnr." + m
        if name not in sys.modules:
            spec = importlib.util.spec_from_file_location(name, REF + m + ".py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        mods[m] = sys.modules[name]
    return types.SimpleNamespace(**mods)


def _t(x):
    return torch.tensor(np.asarray(x))


# ---------------------------------------------------------------------------
# differentiation: the NMR approximate-gradient op (the heart of the renderer)


def test_differentiation_backward_matches_reference(ref):
    """Our planar custom-vjp backward vs the reference autograd Function,
    on random images/cotangents (NHWC<->NCHW transposed at the boundary)."""
    from neural_renderer_v2_pytorch_tpu.ops.differentiation import differentiation

    rng = np.random.RandomState(0)
    for C, H in ((3, 16), (1, 9), (4, 32)):
        images = rng.rand(2, H, H, C).astype("float32")
        coords = rng.rand(2, H, H, 2).astype("float32")
        cotan = rng.randn(2, H, H, C).astype("float32")

        ti = _t(images).requires_grad_(True)
        tc = _t(coords).requires_grad_(True)
        out = ref.differentiation.differentiation(ti, tc)
        out.backward(_t(cotan))
        ref_gi = ti.grad.numpy()
        ref_gc = tc.grad.numpy()  # [bs, H, W, 2] = (x, y)

        def f(img, crd):
            return jnp.sum(
                differentiation(img.transpose(0, 3, 1, 2),
                                crd.transpose(0, 3, 1, 2))
                * cotan.transpose(0, 3, 1, 2)
            )

        # jax.grad returns gradients in the NHWC shape of the test inputs
        gi, gc = jax.grad(f, argnums=(0, 1))(jnp.asarray(images), jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(gi), ref_gi, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gc), ref_gc, atol=1e-6 * max(1.0, np.abs(ref_gc).max())
        )


def test_maximum_matches_reference(ref):
    from neural_renderer_v2_pytorch_tpu.ops.differentiation import maximum

    rng = np.random.RandomState(1)
    r = rng.randn(4, 64).astype("float32")
    l = rng.randn(4, 64).astype("float32")
    # exercise every branch: ties within eps, both-negative, r>l, l>=r
    l[0] = r[0] + rng.uniform(-5e-5, 5e-5, 64).astype("float32")
    r[1] = -np.abs(r[1]); l[1] = -np.abs(l[1])
    ref_out = ref.utils.maximum(_t(r)[..., None], _t(l)[..., None]).numpy()[..., 0]
    ours = np.asarray(maximum(jnp.asarray(r), jnp.asarray(l)))
    np.testing.assert_array_equal(ours, ref_out)


# ---------------------------------------------------------------------------
# camera transforms


def test_look_at_matches_reference(ref):
    """Batch sizes 2 and 4 only: the reference's argless torch.cross
    (look_at.py:29-30) resolves the cross axis to *the first dim of
    size 3*, so batch size 3 crosses over the BATCH axis -- a latent
    reference bug we do not reproduce."""
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at

    rng = np.random.RandomState(2)
    for bs in (2, 4):
        v = rng.randn(bs, 11, 3).astype("float32")
        eyes = rng.randn(bs, 3).astype("float32") * 3
        ref_out = ref.look_at.look_at(_t(v), _t(eyes)).numpy()
        ours = np.asarray(look_at(jnp.asarray(v), jnp.asarray(eyes)))
        np.testing.assert_allclose(ours, ref_out, atol=1e-5)
    # 1-D viewpoint broadcast branch (look_at.py:20-21)
    v = rng.randn(2, 5, 3).astype("float32")
    eye = np.float32([1.0, 2.0, -3.0])
    ref_out = ref.look_at.look_at(_t(v), _t(eye)).numpy()
    ours = np.asarray(look_at(jnp.asarray(v), jnp.asarray(eye)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def test_torch_look_is_broken_we_follow_chainer(ref):
    """The torch reference's ``look`` is a broken translation: it applies
    ``r.transpose(1, 0)`` to a [1, 3, 3] rotation (look.py:41) where the
    chainer original does a batched transpose (chainer look.py:43
    ``matmul(..., transb=True)``), so it raises for every input.  Pin that
    fact (if an upstream fix lands, switch to direct A/B), and check ours
    against the chainer semantics computed inline with numpy."""
    from neural_renderer_v2_pytorch_tpu.ops.camera import look

    rng = np.random.RandomState(3)
    v = rng.randn(1, 7, 3).astype("float32")
    eyes = rng.randn(1, 3).astype("float32")
    with pytest.raises(RuntimeError):
        ref.look.look(_t(v), _t(eyes))

    def chainer_look(v, eye, direction, up):
        z = direction / np.linalg.norm(direction)
        x = np.cross(up, z); x /= np.linalg.norm(x)
        y = np.cross(z, x); y /= np.linalg.norm(y)
        r = np.stack((x, y, z))             # [3, 3]
        return (v - eye[:, None]) @ r.T

    direction = np.float32([0, 0, 1])
    up = np.float32([0, 1, 0])
    ref_out = chainer_look(v, eyes, direction, up)
    ours = np.asarray(look(jnp.asarray(v), jnp.asarray(eyes)))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def test_perspective_matches_reference(ref):
    from neural_renderer_v2_pytorch_tpu.ops.camera import perspective

    rng = np.random.RandomState(4)
    v = rng.randn(2, 9, 3).astype("float32")
    v[..., 2] += 4.0
    for angle in (30.0, 45.0):
        ref_out = ref.perspective.perspective(_t(v), angle).numpy()
        ours = np.asarray(perspective(jnp.asarray(v), angle))
        np.testing.assert_allclose(ours, ref_out, atol=1e-5)


def test_get_points_from_angles_matches_reference(ref):
    from neural_renderer_v2_pytorch_tpu.utils.helpers import get_points_from_angles

    for args in ((2.732, 30, 45), (1.0, -20, 135), (5.0, 0, 0)):
        ref_out = np.asarray(ref.utils.get_points_from_angles(*args))
        ours = np.asarray(get_points_from_angles(*args))
        np.testing.assert_allclose(ours, ref_out, atol=1e-6)
    # tensor (differentiable) branch
    d, e, a = (_t(np.float32([2.0, 3.0])), _t(np.float32([10.0, 20.0])),
               _t(np.float32([40.0, 80.0])))
    ref_out = ref.utils.get_points_from_angles(d, e, a).numpy()
    ours = np.asarray(
        get_points_from_angles(
            jnp.asarray([2.0, 3.0]), jnp.asarray([10.0, 20.0]), jnp.asarray([40.0, 80.0])
        )
    )
    np.testing.assert_allclose(ours, ref_out, atol=1e-6)


# ---------------------------------------------------------------------------
# gather/mask ops: values AND gradients


def test_to_map_matches_reference_values_and_grads(ref):
    from neural_renderer_v2_pytorch_tpu.ops.maps import to_map

    rng = np.random.RandomState(5)
    data = rng.randn(2, 13, 4).astype("float32")
    idx = rng.randint(-1, 13, size=(2, 8, 8)).astype("int32")
    ref_out = ref.utils.to_map(_t(data), _t(idx)).numpy()
    ours = np.asarray(to_map(jnp.asarray(data), jnp.asarray(idx)))
    np.testing.assert_array_equal(ours, ref_out)

    cotan = rng.randn(*ref_out.shape).astype("float32")
    td = _t(data).requires_grad_(True)
    ref.utils.to_map(td, _t(idx)).backward(_t(cotan))
    g = np.asarray(
        jax.grad(lambda d: jnp.sum(to_map(d, jnp.asarray(idx)) * cotan))(
            jnp.asarray(data)
        )
    )
    np.testing.assert_allclose(g, td.grad.numpy(), atol=1e-6)


def test_mask_foreground_matches_reference_values_and_grads(ref):
    from neural_renderer_v2_pytorch_tpu.ops.maps import mask_foreground

    rng = np.random.RandomState(6)
    data = rng.randn(2, 8, 8, 3).astype("float32")
    idx = rng.randint(-1, 5, size=(2, 8, 8)).astype("int32")
    ref_out = ref.utils.mask_foreground(_t(data), _t(idx)).numpy()
    ours = np.asarray(mask_foreground(jnp.asarray(data), jnp.asarray(idx)))
    np.testing.assert_array_equal(ours, ref_out)

    cotan = rng.randn(*ref_out.shape).astype("float32")
    td = _t(data).requires_grad_(True)
    ref.utils.mask_foreground(td, _t(idx)).backward(_t(cotan))
    g = np.asarray(
        jax.grad(lambda d: jnp.sum(mask_foreground(d, jnp.asarray(idx)) * cotan))(
            jnp.asarray(data)
        )
    )
    np.testing.assert_array_equal(g, td.grad.numpy())


def test_create_textures_matches_reference(ref):
    from neural_renderer_v2_pytorch_tpu.utils.helpers import create_textures

    for nf, ts, flat in ((8, 2, False), (100, 4, False), (5, 3, True)):
        rv, rf, rt = ref.utils.create_textures(nf, texture_size=ts, flatten=flat)
        ov, of, ot = create_textures(nf, texture_size=ts, flatten=flat)
        np.testing.assert_array_equal(np.asarray(ov), np.asarray(rv))
        np.testing.assert_array_equal(np.asarray(of), np.asarray(rf))
        np.testing.assert_array_equal(np.asarray(ot), np.asarray(rt))


# ---------------------------------------------------------------------------
# OBJ I/O round trips


def test_load_obj_matches_reference(ref, reference_data):
    from neural_renderer_v2_pytorch_tpu.utils.obj_io import load_obj

    path = str(reference_data / "teapot.obj")
    for norm in (True, False):
        rv, rf = ref.load_obj.load_obj(path, normalization=norm)
        ov, of = load_obj(path, normalization=norm)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(rf))
        np.testing.assert_allclose(np.asarray(ov), np.asarray(rv), atol=1e-6)


def test_load_obj_textured_matches_reference(ref):
    """Full textured load (vt parsing, mtl, atlas packing, UV rescale) on
    the multi-material test model; arrays must match bit-for-bit."""
    import glob

    from neural_renderer_v2_pytorch_tpu.utils.obj_io import load_obj

    objs = sorted(glob.glob("/root/reference/tests_chainer/data/*/*.obj"))
    if not objs:
        pytest.skip("no textured obj assets in the reference checkout")
    for path in objs:
        rv, rf, rvt, rft, rtex = ref.load_obj.load_obj(path, load_textures=True)
        ov, of, ovt, oft, otex = load_obj(path, load_textures=True)
        np.testing.assert_allclose(np.asarray(ov), np.asarray(rv), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(of), np.asarray(rf))
        np.testing.assert_allclose(np.asarray(ovt), np.asarray(rvt), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(oft), np.asarray(rft))
        np.testing.assert_allclose(np.asarray(otex), np.asarray(rtex), atol=1e-6)


def _write_multimaterial_asset(dirpath):
    """Synthesize an obj+mtl with two textured materials of DIFFERENT
    widths plus one flat-Kd material: covers the atlas width-padding and
    the flat-Kd 2x2-patch packing branch (reference load_obj.py:84-94 /
    repo obj_io.py flat-Kd branch), which no shipped asset exercises
    (the 1cde... golden's model.obj is absent from the checkout)."""
    try:
        import imageio.v2 as iio
    except ImportError:  # pragma: no cover
        import imageio as iio

    rng = np.random.RandomState(11)
    texA = (rng.rand(4, 8, 3) * 255).astype("uint8")
    texC = (rng.rand(3, 6, 3) * 255).astype("uint8")
    iio.imwrite(str(dirpath / "texA.png"), texA)
    iio.imwrite(str(dirpath / "texC.png"), texC)
    (dirpath / "scene.mtl").write_text(
        "newmtl matA\nmap_Kd texA.png\n\n"
        "newmtl matB\nKd 0.2 0.7 0.4\n\n"
        "newmtl matC\nmap_Kd texC.png\n"
    )
    # three coplanar patches side by side at z=0: a QUAD (fan
    # triangulation) with matA, a triangle with matB (flat Kd, f lines
    # without vt ids), a triangle with matC
    (dirpath / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v -0.9 -0.5 0\nv -0.4 -0.5 0\nv -0.4 0.5 0\nv -0.9 0.5 0\n"
        "v -0.2 -0.5 0\nv 0.3 -0.5 0\nv 0.05 0.5 0\n"
        "v 0.4 -0.5 0\nv 0.9 -0.5 0\nv 0.65 0.5 0\n"
        "vt 0.1 0.1\nvt 0.9 0.1\nvt 0.9 0.9\nvt 0.1 0.9\n"
        "vt 0.2 0.2\nvt 0.8 0.2\nvt 0.5 0.8\n"
        "usemtl matA\n"
        "f 1/1 2/2 3/3 4/4\n"
        "usemtl matB\n"
        "f 5 6 7\n"
        "usemtl matC\n"
        "f 8/5 9/6 10/7\n"
    )
    return dirpath / "scene.obj"


def test_multimaterial_flat_kd_load_matches_reference(ref, tmp_path):
    """Loader A/B on the synthetic multi-material asset: atlas packing
    with width padding, UV texel rescaling per material strip, and the
    flat-Kd 2x2 patch + 3 synthetic UV vertices must match the living
    reference loader bit-for-bit (load_obj.py:84-94)."""
    from neural_renderer_v2_pytorch_tpu.utils.obj_io import load_obj

    path = str(_write_multimaterial_asset(tmp_path))
    rv, rf, rvt, rft, rtex = ref.load_obj.load_obj(path, load_textures=True)
    ov, of, ovt, oft, otex = load_obj(path, load_textures=True)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(rv), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(of), np.asarray(rf))
    np.testing.assert_array_equal(np.asarray(ovt), np.asarray(rvt))
    np.testing.assert_array_equal(np.asarray(oft), np.asarray(rft))
    np.testing.assert_array_equal(np.asarray(otex), np.asarray(rtex))

    # structure pins: atlas is the vertical strip stack (4 + 2 + 3 rows,
    # width padded to the widest material), and the flat-Kd patch rows
    # hold the Kd color with the 3 synthetic UV verts pointing into them
    assert otex.shape == (3, 9, 8)
    np.testing.assert_allclose(
        otex[:, 4:6, :2],
        np.broadcast_to(np.array([0.2, 0.7, 0.4], "float32")[:, None, None], (3, 2, 2)),
        atol=1e-7,
    )
    np.testing.assert_array_equal(
        ovt[-3:], np.array([[0, 4], [0, 5], [1, 5]], "float32")
    )
    # face row 2 is the flat-Kd triangle (rows 0-1 = the fan-triangulated
    # matA quad): its UV face points at the 3 synthetic trailing verts
    np.testing.assert_array_equal(oft[2], [len(ovt) - 3, len(ovt) - 2, len(ovt) - 1])


def test_multimaterial_flat_kd_render(ref, tmp_path):
    """The loaded multi-material scene renders through ``render()``: the
    flat-Kd triangle's pixels must show exactly the Kd color (its whole
    2x2 patch is that color, so bilinear taps cannot blend anything
    else), and every material must be visible."""
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr

    path = str(_write_multimaterial_asset(tmp_path))
    v, f, vt, ft, tex = nr.load_obj(path, load_textures=True)

    renderer = nr.Renderer()
    renderer.anti_aliasing = False
    renderer.image_size = 64
    renderer.viewpoints = nr.get_points_from_angles(2.732, 0, 0)

    rgba = np.asarray(
        renderer.render(
            jnp.asarray(v[None]), jnp.asarray(f), jnp.asarray(vt[None]),
            jnp.asarray(ft), jnp.asarray(tex[None]),
        )
    )[0]
    assert np.isfinite(rgba).all()
    assert rgba.min() >= 0.0 and rgba.max() <= 1.0 + 1e-6

    # locate each material's pixels by rendering its faces alone
    def mask_of(face_rows):
        s = np.asarray(
            renderer.render_silhouettes(
                jnp.asarray(v[None]), jnp.asarray(f[face_rows])
            )
        )[0]
        return s > 0.5

    # faces: quad -> rows 0-1 (matA), row 2 (matB), row 3 (matC)
    mA, mB, mC = mask_of([0, 1]), mask_of([2]), mask_of([3])
    assert mA.sum() > 50 and mB.sum() > 50 and mC.sum() > 50
    kd = np.array([0.2, 0.7, 0.4], "float32")
    np.testing.assert_allclose(
        rgba[:3, mB].T, np.tile(kd, (int(mB.sum()), 1)), atol=1e-5
    )
    # textured materials sample from their own strips: their pixel colors
    # must be drawn from the (padded) atlas value range, not the Kd color
    assert not np.allclose(rgba[:3, mA].mean(axis=1), kd, atol=1e-2)


def test_save_obj_matches_reference(ref, tmp_path):
    """save_obj must write byte-identical .obj/.mtl text for the same
    inputs (the reference normalizes UVs back to [0, 1] and writes
    1-indexed faces).  The reference path only accepts numpy textures
    (save_obj.py:13 does ::-1 slicing, which torch rejects) and mutates
    vertices_t in place, so each call gets its own copies; texture VALUES
    go through the PNG (ours clips float [0,1] -> uint8, the reference
    relies on imageio's conversion), so the text is the parity surface."""
    from neural_renderer_v2_pytorch_tpu.utils.obj_io import save_obj

    rng = np.random.RandomState(7)
    v = rng.randn(5, 3).astype("float32")
    f = np.array([[0, 1, 2], [2, 3, 4]], "int32")
    vt = rng.rand(4, 2).astype("float32") * 16
    ft = np.array([[0, 1, 2], [1, 2, 3]], "int32")
    tex_u8 = rng.randint(0, 255, size=(3, 16, 16)).astype("uint8")

    ours = tmp_path / "ours.obj"
    theirs = tmp_path / "theirs.obj"
    save_obj(str(ours), v, f, vt.copy(), ft, tex_u8.astype("float32") / 255.0)
    ref.save_obj.save_obj(str(theirs), v, f, vt.copy(), ft, tex_u8)
    assert ours.read_text() == theirs.read_text().replace("theirs", "ours")
    rm = (theirs.parent / "theirs.mtl").read_text().replace("theirs", "ours")
    assert (ours.parent / "ours.mtl").read_text() == rm

    # geometry-only variant
    save_obj(str(ours), v, f)
    ref.save_obj.save_obj(str(theirs), v, f)
    assert ours.read_text() == theirs.read_text().replace("theirs", "ours")


# ---------------------------------------------------------------------------
# The shading/texture stack and the FULL pipeline (reference rasterize.py on
# CPU): importing reference rasterize.py pulls the CUDA extension through one
# top-level import (rasterize.py:5); stubbing that module in sys.modules
# leaves sample_textures (rasterize.py:100-153), compute_normal_map
# (:162-190), the 3-light loop (:252-283), blend_backgrounds (:156-159), and
# rasterize_core's differentiable tail all running pure-torch -- so the
# entire textured+lit gradient path can be anchored to the living reference
# instead of golden PNGs.


@pytest.fixture(scope="module")
def refr(ref):
    """Reference rasterize.py + lights + rasterize_param on CPU, with the
    CUDA extension import (its ONLY GPU dependency) stubbed out."""
    if "_refnr.cuda" not in sys.modules:
        cuda_pkg = types.ModuleType("_refnr.cuda")
        cuda_pkg.__path__ = [REF + "cuda/"]
        sys.modules["_refnr.cuda"] = cuda_pkg
        stub = types.ModuleType("_refnr.cuda.rasterize_cuda")
        for name in (
            "face_index_map_forward_safe",
            "face_index_map_forward_unsafe",
            "compute_weight_map_c",
            "mask_foreground_forward",
            "mask_foreground_backward",
        ):
            setattr(stub, name, None)
        sys.modules["_refnr.cuda.rasterize_cuda"] = stub
    mods = {"utils": ref.utils, "differentiation": ref.differentiation}
    for m in ("lights", "rasterize_param", "rasterize"):
        name = "_refnr." + m
        if name not in sys.modules:
            spec = importlib.util.spec_from_file_location(name, REF + m + ".py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
        mods[m] = sys.modules[name]
    return types.SimpleNamespace(**mods)


def _texture_scene(rng, bs=2, nf=40, H=24, W=24, th=16, tw=20):
    """Random inputs for the texture sampler: faces with z in [1, 3], UV
    texel coordinates with every bilinear tap strictly in range, a random
    face-index map with background, and a normalized weight map."""
    faces = rng.rand(bs, nf, 3, 3).astype("float32")
    faces[..., :2] = faces[..., :2] * 1.8 - 0.9
    faces[..., 2] = faces[..., 2] * 2.0 + 1.0
    ft = np.stack(
        [
            rng.uniform(0.5, tw - 2.6, size=(bs, nf, 3)),
            rng.uniform(0.5, th - 2.6, size=(bs, nf, 3)),
        ],
        axis=-1,
    ).astype("float32")
    textures = rng.rand(bs, 3, th, tw).astype("float32")
    fim = rng.randint(-1, nf, size=(bs, H, W)).astype("int32")
    w = rng.rand(bs, H, W, 3).astype("float32") + 0.05
    w /= w.sum(-1, keepdims=True)
    return faces, ft, textures, fim, w


def test_sample_textures_matches_reference_values_and_grads(refr):
    """Perspective-correct UV interpolation + bbox clamp + bilinear atlas
    taps (reference rasterize.py:100-153): values and autograd gradients
    w.r.t. textures, face z, and the UV triangles."""
    from neural_renderer_v2_pytorch_tpu.ops.shading import sample_textures

    rng = np.random.RandomState(31)
    faces, ft, textures, fim, w = _texture_scene(rng)
    eps = 1e-3  # large enough that the bbox clamp visibly bites

    tf = _t(faces).requires_grad_(True)
    tft = _t(ft).requires_grad_(True)
    ttex = _t(textures).requires_grad_(True)
    ref_out = refr.rasterize.sample_textures(
        tf, tft, ttex, _t(fim), _t(w), eps
    )
    ours = np.asarray(
        sample_textures(
            jnp.asarray(faces), jnp.asarray(ft), jnp.asarray(textures),
            jnp.asarray(fim), jnp.asarray(w), eps,
        )
    )
    np.testing.assert_allclose(ours, ref_out.detach().numpy(), atol=2e-6)

    cotan = rng.randn(*ours.shape).astype("float32")
    ref_out.backward(_t(cotan))

    def loss(fc, uv, tx):
        return jnp.sum(
            sample_textures(fc, uv, tx, jnp.asarray(fim), jnp.asarray(w), eps)
            * cotan
        )

    gf, gft, gtex = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(faces), jnp.asarray(ft), jnp.asarray(textures)
    )
    for got, want in (
        (gf, tf.grad), (gft, tft.grad), (gtex, ttex.grad),
    ):
        want = want.numpy()
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5 * scale)


def test_compute_normal_map_matches_reference_values_and_grads(refr):
    """Face normals -> incidence scatter -> normalize -> gather ->
    barycentric smoothing (reference rasterize.py:162-190), both smooth
    modes, with gradients w.r.t. vertices flowing through the whole chain
    (the incidence matmul's set-vs-add difference is only reachable
    through degenerate faces, whose cross product is zero)."""
    from neural_renderer_v2_pytorch_tpu.ops.shading import compute_normal_map

    rng = np.random.RandomState(32)
    bs, nv, nf, H = 2, 30, 50, 16
    vertices = rng.randn(bs, nv, 3).astype("float32")
    face_indices = rng.randint(0, nv, size=(nf, 3)).astype("int32")
    fim = rng.randint(-1, nf, size=(bs, H, H)).astype("int32")
    w = rng.rand(bs, H, H, 3).astype("float32")
    cotan = rng.randn(bs, H, H, 3).astype("float32")

    for smooth in (True, False):
        tv = _t(vertices).requires_grad_(True)
        tfaces = tv[:, face_indices.astype("int64")]
        ref_out = refr.rasterize.compute_normal_map(
            tv, _t(face_indices.astype("int64")), tfaces, _t(fim), _t(w),
            smooth=smooth,
        )
        ref_out.backward(_t(cotan))

        def loss(v):
            fc = v[:, face_indices]
            nm = compute_normal_map(
                v, jnp.asarray(face_indices), fc, jnp.asarray(fim),
                jnp.asarray(w), smooth=smooth,
            )
            return jnp.sum(nm * cotan), nm

        (g, ours) = jax.grad(loss, has_aux=True)(jnp.asarray(vertices))
        np.testing.assert_allclose(
            np.asarray(ours), ref_out.detach().numpy(), atol=1e-5
        )
        want = tv.grad.numpy()
        scale = max(np.abs(want).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(g), want, atol=1e-4 * scale)


def test_blend_backgrounds_matches_reference(refr):
    """Background compositing (reference rasterize.py:156-159).  The
    torch reference is numpy-only in practice: it calls .astype on the
    comparison result and ::-1 flips on `backgrounds`, both of which
    torch tensors reject (SURVEY 3.2: broken/untested with tensors) --
    so the A/B runs it on numpy arrays, which is exactly how the chainer
    twin executes it (chainer rasterize.py:574-577)."""
    from neural_renderer_v2_pytorch_tpu.ops.shading import blend_backgrounds

    rng = np.random.RandomState(33)
    bs, H = 2, 12
    fim = rng.randint(-1, 5, size=(bs, H, H)).astype("int32")
    rgb = rng.rand(bs, H, H, 3).astype("float32")
    bg = rng.rand(bs, H, H, 3).astype("float32")
    ref_out = refr.rasterize.blend_backgrounds(fim, rgb, bg)
    ours = np.asarray(
        blend_backgrounds(jnp.asarray(fim), jnp.asarray(rgb), jnp.asarray(bg))
    )
    np.testing.assert_allclose(ours, np.asarray(ref_out), atol=1e-7)


def test_full_pipeline_matches_reference_with_injected_resolve(refr, monkeypatch):
    """END-TO-END A/B vs the living reference's rasterize_core
    (rasterize.py:194-329): textured RGB + silhouette + depth, 3 lights,
    AA on and off -- values AND gradients w.r.t. vertices, textures, UV
    triangles, and the directional light's color/direction.

    The reference's two non-differentiable CUDA maps (face-index, weight)
    are replaced by OUR XLA resolve's outputs (bit-pinned to the CUDA
    semantics by the golden suites), so everything downstream --
    to_map gathers, sample_textures, normal/lighting, depth/coordinate
    maps, differentiation, flip, AA pooling, and the whole autograd
    transpose through them -- is the reference's own torch code.  This
    closes PARITY.md's 'full-pipeline grads cannot be A/B'd' bracket down
    to exactly the injected resolve constants."""
    from neural_renderer_v2_pytorch_tpu.models import lights as our_lights
    from neural_renderer_v2_pytorch_tpu.ops import resolve
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam, RasterizeParam, rasterize_all,
    )

    rng = np.random.RandomState(34)
    bs, nv, nf, nvt, size = 2, 25, 40, 30, 16
    th, tw = 16, 20
    vertices = rng.randn(bs, nv, 3).astype("float32") * 0.5
    vertices[..., 2] += 2.0  # in front of the camera, inside [near, far]
    face_indices = rng.randint(0, nv, size=(nf, 3)).astype("int32")
    vt = np.stack(
        [
            rng.uniform(0.5, tw - 2.6, size=(bs, nvt)),
            rng.uniform(0.5, th - 2.6, size=(bs, nvt)),
        ],
        axis=-1,
    ).astype("float32")
    ft = rng.randint(0, nvt, size=(nf, 3)).astype("int32")
    textures = rng.rand(bs, 3, th, tw).astype("float32")
    amb_c = rng.rand(bs, 3).astype("float32") * 0.3
    dir_c = rng.rand(bs, 3).astype("float32")
    dir_d = rng.randn(bs, 3).astype("float32")
    dir_d /= np.linalg.norm(dir_d, axis=1, keepdims=True)
    spec_c = rng.rand(bs, 3).astype("float32") * 0.5
    spec_a = np.full((bs,), 2.0, "float32")

    def fim_stub(faces_t, hyper):
        fv = jnp.asarray(faces_t.detach().numpy())
        out = resolve.compute_face_index_map(
            fv, hyper.image_size, near=hyper.near, far=hyper.far,
            draw_backside=hyper.draw_backside,
        )
        return _t(np.asarray(out))

    def wm_stub(faces_t, fim_t):
        fv = jnp.asarray(faces_t.detach().numpy())
        out = resolve.compute_weight_map(fv, jnp.asarray(fim_t.numpy()))
        return _t(np.asarray(out))

    monkeypatch.setattr(refr.rasterize, "compute_face_index_map", fim_stub)
    monkeypatch.setattr(refr.rasterize, "compute_weight_map", wm_stub)

    for aa in (True, False):
        # ---- reference (torch autograd) ----
        tv = _t(vertices).requires_grad_(True)
        tvt = _t(vt).requires_grad_(True)
        ttex = _t(textures).requires_grad_(True)
        tdc = _t(dir_c).requires_grad_(True)
        tdd = _t(dir_d).requires_grad_(True)
        ref_lights = [
            refr.lights.AmbientLight(_t(amb_c)),
            refr.lights.DirectionalLight(tdc, tdd),
            refr.lights.SpecularLight(_t(spec_c), _t(spec_a), backside=True),
        ]
        params = refr.rasterize_param.RasterizeParam(
            vertices_textures=tvt,
            faces_textures=_t(ft.astype("int64")),
            textures=ttex,
            lights=ref_lights,
        )
        hyper = refr.rasterize_param.RasterizeHyperparam(
            image_size=size, anti_aliasing=aa,
            draw_rgb=True, draw_silhouettes=True, draw_depth=True,
        )
        ref_out = refr.rasterize.rasterize_core(
            tv, _t(face_indices.astype("int64")), params, hyper
        )
        cotan = rng.randn(*ref_out.shape).astype("float32")
        ref_out.backward(_t(cotan))

        # ---- ours ----
        hp = RasterizeHyperparam(
            image_size=size, anti_aliasing=aa, backend="xla",
        )

        def loss(v, uv, tx, dc, dd):
            p = RasterizeParam(
                vertices_textures=uv,
                faces_textures=jnp.asarray(ft),
                textures=tx,
                lights=(
                    our_lights.AmbientLight(jnp.asarray(amb_c)),
                    our_lights.DirectionalLight(dc, dd),
                    our_lights.SpecularLight(
                        jnp.asarray(spec_c), jnp.asarray(spec_a), backside=True
                    ),
                ),
            )
            out = rasterize_all(v, jnp.asarray(face_indices), p, hp)
            return jnp.sum(out * cotan), out

        grads, ours = jax.grad(loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            jnp.asarray(vertices), jnp.asarray(vt), jnp.asarray(textures),
            jnp.asarray(dir_c), jnp.asarray(dir_d),
        )

        np.testing.assert_allclose(
            np.asarray(ours), ref_out.detach().numpy(), atol=1e-5,
            err_msg=f"values aa={aa}",
        )
        for name, got, want in (
            ("vertices", grads[0], tv.grad),
            ("vertices_textures", grads[1], tvt.grad),
            ("textures", grads[2], ttex.grad),
            ("light color", grads[3], tdc.grad),
            ("light direction", grads[4], tdd.grad),
        ):
            want = want.numpy()
            scale = max(np.abs(want).max(), 1e-6)
            np.testing.assert_allclose(
                np.asarray(got), want, atol=2e-5 * scale,
                err_msg=f"grad {name} aa={aa}",
            )
