from .editable import EditingParams, EditablePrimitive  # noqa: F401
from .texture_model import TextureEditableNeuMesh  # noqa: F401
