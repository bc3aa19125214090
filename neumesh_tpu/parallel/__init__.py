from .mesh import get_device_mesh, ray_sharder, replicate  # noqa: F401
from . import dist  # noqa: F401
