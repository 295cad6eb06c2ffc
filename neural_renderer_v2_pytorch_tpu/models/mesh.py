"""Trainable ``Mesh`` container.

Functional-JAX re-design of the reference nn.Module (neural_renderer_
torch/mesh.py:7-37): parameters live in an explicit pytree dict returned
by ``init_params()``; ``get_batch(params, batch_size)`` broadcasts them
for a minibatch.  Per-parameter learning rates map onto
``utils.optim.adam`` (the reference attaches ``.lr`` attributes to
torch Parameters for its custom Adam; here they're a dict passed to the
optimizer).

The reference's per-face 5D texture parameter ``(nf, ts, ts, ts, 3)`` is a
v1-era leftover that is shape-incompatible with the v2 UV-atlas
rasterizer (SURVEY.md #13); we keep it for API parity but also provide
``init_uv_params()`` producing a v2-compatible (vertices_t, faces_t,
texture atlas) bundle via ``create_textures``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.helpers import create_textures
from ..utils.obj_io import load_obj


class Mesh(object):
    def __init__(self, filename_obj, texture_size=4, normalization=True):
        vertices, faces = load_obj(filename_obj, normalization)
        self.vertices = jnp.asarray(vertices)
        self.faces = jnp.asarray(faces)
        self.num_vertices = self.vertices.shape[0]
        self.num_faces = self.faces.shape[0]
        self.texture_size = texture_size

        # v1-style per-face texture parameter (mesh.py:19-21)
        shape = (self.num_faces, texture_size, texture_size, texture_size, 3)
        key = jax.random.PRNGKey(0)
        self.textures = jax.random.normal(key, shape, dtype=jnp.float32)

        self.lr_vertices = None
        self.lr_textures = None

    # ---- functional parameter API -------------------------------------
    def init_params(self):
        """Trainable parameter pytree."""
        return {"vertices": self.vertices, "textures": self.textures}

    def init_uv_params(self, texture_size=None):
        """v2 UV-atlas texture bundle: (vertices_t, faces_t, textures)."""
        ts = texture_size or self.texture_size
        vertices_t, faces_t, textures = create_textures(self.num_faces, texture_size=ts)
        return jnp.asarray(vertices_t), jnp.asarray(faces_t), jnp.asarray(textures)

    def get_batch(self, batch_size, params=None):
        """Broadcast (vertices, faces, sigmoid(textures)) for a minibatch
        (mesh.py:28-33)."""
        vertices = params["vertices"] if params else self.vertices
        textures = params["textures"] if params else self.textures
        vertices = jnp.broadcast_to(vertices[None], (batch_size,) + vertices.shape)
        faces = jnp.broadcast_to(self.faces[None], (batch_size,) + self.faces.shape)
        textures = jax.nn.sigmoid(
            jnp.broadcast_to(textures[None], (batch_size,) + textures.shape)
        )
        return vertices, faces, textures

    def set_lr(self, lr_vertices, lr_textures):
        """Per-parameter learning rates (mesh.py:35-37); consumed by
        ``utils.optim.adam`` as {'vertices': lr_v, 'textures': lr_t}."""
        self.lr_vertices = lr_vertices
        self.lr_textures = lr_textures

    def param_lrs(self):
        return {"vertices": self.lr_vertices, "textures": self.lr_textures}
