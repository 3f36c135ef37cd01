from .mesh import make_mesh, shard_problem, pad_blocks  # noqa: F401
from .distributed import init_distributed, global_mesh  # noqa: F401
