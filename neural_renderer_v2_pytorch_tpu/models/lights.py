"""Light sources.

Pytree-registered dataclasses (flax.struct) so a list of lights can flow
straight through ``jax.jit`` / ``jax.grad`` -- colors, directions and
specular exponents are all leaves and therefore differentiable.

Reference: neural_renderer_torch/lights.py:4-39.  Shading math lives in
ops/shading.py (reference rasterize.py:252-283).
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp


class Light:
    """Base class for light sources (reference lights.py:4-8) -- a real
    class, so reference-style ``isinstance(x, Light)`` checks AND
    user-defined subclasses of the concrete lights behave exactly as
    they do with the reference."""


@flax.struct.dataclass
class AmbientLight(Light):
    """Flat per-batch color added to the color-weight map."""

    color: jnp.ndarray  # [bs, 3]


@flax.struct.dataclass
class DirectionalLight(Light):
    """Lambertian light: intensity = relu(-direction . normal)
    (or abs(.) when ``backside``)."""

    color: jnp.ndarray      # [bs, 3]
    direction: jnp.ndarray  # [bs, 3]
    backside: bool = flax.struct.field(pytree_node=False, default=False)


@flax.struct.dataclass
class SpecularLight(Light):
    """View-aligned specular: intensity = ((0,0,1) . -normal)^alpha."""

    color: jnp.ndarray                 # [bs, 3]
    alpha: Optional[jnp.ndarray] = None  # [bs]; None -> ones
    backside: bool = flax.struct.field(pytree_node=False, default=False)
