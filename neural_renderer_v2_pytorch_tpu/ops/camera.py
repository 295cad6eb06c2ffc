"""Camera / viewpoint transforms (pure jnp, vmap/jit friendly).

TPU-native re-design of the reference geometry layer:
  - ``look_at``   (reference: neural_renderer_torch/look_at.py:5-44)
  - ``look``      (reference: neural_renderer_torch/look.py:5-41)
  - ``perspective`` (reference: neural_renderer_torch/perspective.py:4-18)

All three are pure functions over float32 arrays.  They are fully
differentiable (example4 optimises the camera position through
``look_at``) and free of data-dependent control flow so they trace into a
single fused XLA computation.

Conventions (matching the reference exactly, required for golden parity):
  * ``perspective`` divides x,y by ``z * tan(angle)`` and keeps z in camera
    units -- it is NOT a 4x4 projection matrix.  The angle conversion uses
    the reference's literal constant ``3.1416`` (perspective.py:10), not
    ``pi``, because downstream golden images depend on it.
  * NDC is [-1, 1] with pixel centres at ``(2*i + 1 - S) / S``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x, axis=-1, eps=1e-12):
    """L2-normalize along ``axis`` (same semantics as F.normalize)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _as_batched(v, batch_size, name):
    v = jnp.asarray(v, dtype=jnp.float32)
    if v.ndim == 1:
        v = jnp.broadcast_to(v[None, :], (batch_size, v.shape[0]))
    return v


def _rotate(vertices, r):
    """``vertices @ r^T`` as elementwise f32 multiply-adds.

    A [nv, 3] x [3, 3] matmul on the MXU pads K=3 to the systolic width
    (measured 3.6 ms at 236K vertices under precision=HIGHEST -- the
    6-pass exact-f32 algorithm on a 40x-padded problem); the expanded
    form is nine f32 fmas on the VPU (~microseconds) with the same full
    f32 precision, which golden parity requires (the default bf16 MXU
    path shifts edge pixels in the resolve: mean abs diff 1.8e-3 vs
    3.0e-4 against the reference PNGs).
    """
    x, y, z = vertices[..., 0], vertices[..., 1], vertices[..., 2]
    r = r[:, :, None, :]                                      # [bs, 3, 1, 3]
    out = [
        x * r[:, i, :, 0] + y * r[:, i, :, 1] + z * r[:, i, :, 2]
        for i in range(3)
    ]
    return jnp.stack(out, axis=-1)


def look_at(vertices, viewpoints, at=None, up=None):
    """'Look at' transformation of vertices.

    Args:
      vertices: [bs, nv, 3] float32.
      viewpoints: [3] or [bs, 3] camera positions (list/tuple/array).
      at: gaze target, default origin.
      up: up vector, default +y.

    Returns:
      [bs, nv, 3] vertices in camera coordinates.

    Reference: neural_renderer_torch/look_at.py:5-44.  Builds a rotation
    whose rows are (x_axis, y_axis, z_axis) from normalized cross products
    and applies ``(v - eye) @ R^T``.
    """
    vertices = jnp.asarray(vertices, dtype=jnp.float32)
    assert vertices.ndim == 3
    batch_size = vertices.shape[0]

    if at is None:
        at = jnp.array([0.0, 0.0, 0.0], dtype=jnp.float32)
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)

    viewpoints = _as_batched(viewpoints, batch_size, "viewpoints")
    at = _as_batched(at, batch_size, "at")
    up = _as_batched(up, batch_size, "up")

    z_axis = _normalize(at - viewpoints)                      # [bs, 3]
    x_axis = _normalize(jnp.cross(up, z_axis))                # [bs, 3]
    y_axis = _normalize(jnp.cross(z_axis, x_axis))            # [bs, 3]

    # rotation matrix rows = new axes: [bs, 3, 3]
    r = jnp.stack((x_axis, y_axis, z_axis), axis=1)

    vertices = vertices - viewpoints[:, None, :]
    return _rotate(vertices, r)


def look(vertices, viewpoints, direction=None, up=None):
    """'Look' transformation: camera at ``viewpoints`` gazing along a fixed
    ``direction`` (instead of at a target point).

    Reference: neural_renderer_torch/look.py:5-41.  (The reference contains
    a latent transpose bug for batched inputs; we implement the intended
    semantics -- identical to look_at but with a fixed gaze direction --
    which matches the chainer original.)
    """
    vertices = jnp.asarray(vertices, dtype=jnp.float32)
    assert vertices.ndim == 3
    batch_size = vertices.shape[0]

    if direction is None:
        direction = jnp.array([0.0, 0.0, 1.0], dtype=jnp.float32)
    if up is None:
        up = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)

    viewpoints = _as_batched(viewpoints, batch_size, "viewpoints")
    direction = _as_batched(direction, batch_size, "direction")
    up = _as_batched(up, batch_size, "up")

    z_axis = _normalize(direction)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))

    r = jnp.stack((x_axis, y_axis, z_axis), axis=1)           # [bs, 3, 3]

    vertices = vertices - viewpoints[:, None, :]
    return _rotate(vertices, r)


def perspective(vertices, angle=30.0):
    """Perspective divide: ``x, y <- x / (z * tan(angle)), y / (z * tan(angle))``
    keeping z.  Reference: neural_renderer_torch/perspective.py:4-18.

    ``angle`` is in degrees; may be a python scalar or a [bs] array.
    """
    vertices = jnp.asarray(vertices, dtype=jnp.float32)
    assert vertices.ndim == 3
    angle = jnp.asarray(angle, dtype=jnp.float32)
    # NOTE: the reference uses the literal 3.1416 (perspective.py:10);
    # keep it for bit-level parity with golden renders.
    angle = angle / 180.0 * 3.1416
    width = jnp.tan(angle)
    width = jnp.broadcast_to(jnp.atleast_1d(width)[:, None], vertices.shape[:2])
    z = vertices[:, :, 2]
    x = vertices[:, :, 0] / z / width
    y = vertices[:, :, 1] / z / width
    return jnp.stack((x, y, z), axis=2)
