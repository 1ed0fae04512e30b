from aladin_tpu.parallel.mesh import create_mesh, parse_mesh_shape  # noqa: F401
from aladin_tpu.parallel.sharding import batch_sharding, param_shardings  # noqa: F401
