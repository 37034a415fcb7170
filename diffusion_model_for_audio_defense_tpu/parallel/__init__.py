from .mesh import device_mesh, data_shard, replicate  # noqa: F401
