from .mesh import make_mesh, shard_problem, pad_blocks  # noqa: F401
