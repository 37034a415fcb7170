from .mesh import device_mesh, data_shard, dp_shard_fn, replicate, shard_batch  # noqa: F401
from .multihost import process_shard_kwargs, setup_dist  # noqa: F401
from .sequence import make_sp_forward, sequence_sharding, shard_waveform  # noqa: F401
