from .mesh import auto_mesh, make_mesh
from .render import (
    rasterize_core_sharded,
    rasterize_depth_sharded,
    rasterize_rgb_sharded,
    rasterize_rgba_sharded,
    rasterize_silhouettes_sharded,
)
