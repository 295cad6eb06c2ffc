from . import distributed
from .faces import compute_face_index_map_face_sharded, ordered_z_combine
from .mesh import auto_mesh, make_mesh
from .render import (
    rasterize_core_sharded,
    rasterize_depth_sharded,
    rasterize_rgb_sharded,
    rasterize_rgba_sharded,
    rasterize_silhouettes_sharded,
)
