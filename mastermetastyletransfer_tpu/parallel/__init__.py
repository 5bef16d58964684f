from mastermetastyletransfer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, batch_sharding, replicated_sharding,
)
from mastermetastyletransfer_tpu.parallel.spatial_shmap import (  # noqa: F401
    make_spatial_stylize_shmap, spatial_shmap_unsupported,
)
