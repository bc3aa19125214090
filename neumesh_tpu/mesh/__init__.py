from .triangle_mesh import TriangleMesh  # noqa: F401
from .grid import MeshGrid  # noqa: F401
