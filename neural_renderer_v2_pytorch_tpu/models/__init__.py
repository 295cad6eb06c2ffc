from .lights import AmbientLight, DirectionalLight, Light, SpecularLight
from .mesh import Mesh
from .renderer import Renderer
