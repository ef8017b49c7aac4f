from .mesh import make_mesh, scene_sharding, replicate, shard_batch  # noqa: F401
