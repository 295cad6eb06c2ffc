"""Hardware-only validation (skipped in the CPU test environment).

The committed suite runs on CPU jax (conftest forces it); these cases run
the compiled Pallas kernels on a real TPU when one is present:

    JAX_PLATFORMS= NR_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py

(Each case mirrors a check that was also executed manually on v5e during
development -- see PARITY.md / commit messages.)
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("NR_TEST_TPU"),
    reason="set NR_TEST_TPU=1 (and unset the forced-CPU config) to run on TPU",
)


@requires_tpu
def test_pallas_bit_exact_on_tpu():
    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.resolve import compute_face_index_map
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        compute_face_index_map_pallas,
    )

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    vertices, faces = nr.load_obj("/root/reference/tests_torch/data/teapot.obj")
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    tv = jax.jit(lambda v: perspective(look_at(v, eye), angle=30.0))(
        jnp.asarray(vertices[None])
    )
    fv = tv[:, np.asarray(faces)]
    ref = np.asarray(jax.jit(lambda f: compute_face_index_map(f, 512))(fv))
    pal = np.asarray(jax.jit(lambda f: compute_face_index_map_pallas(f, 512))(fv))
    np.testing.assert_array_equal(ref, pal)


@requires_tpu
def test_golden_parity_on_tpu():
    import jax

    import neural_renderer_v2_pytorch_tpu as nr

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("no TPU backend")
    name = "4e49873292196f02574b5684eaec43e9"
    base = "/root/reference/tests_torch/data/"
    ref = nr.imread(base + name + ".png")
    v, f, vt, ft, tex = nr.load_obj(base + name + "/model.obj", load_textures=True)
    r = nr.Renderer()
    r.draw_backside = False
    r.viewpoints = nr.get_points_from_angles(2.5, 10, -90)
    img = np.asarray(r.render(v[None], f, vt[None], ft, tex[None]))[0].transpose(1, 2, 0)
    d = np.abs(ref - img)
    assert d.mean() < 5e-4
    assert (d.max(-1) > 1e-2).mean() < 1e-3
