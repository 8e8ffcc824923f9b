from .mesh import make_mesh, shard_batch_spec  # noqa: F401
