from .mesh import create_mesh, MeshConfig
from .sharding import infer_param_shardings, batch_sharding, replicated
