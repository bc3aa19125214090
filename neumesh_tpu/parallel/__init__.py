from .mesh import (BATCH_AXIS, DATA_AXIS, get_device_mesh,  # noqa: F401
                   get_global_mesh, make_global_batch, ray_sharder,
                   replicate)
from . import dist  # noqa: F401
