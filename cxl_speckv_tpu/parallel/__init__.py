from cxl_speckv_tpu.parallel.mesh import make_mesh  # noqa: F401
from cxl_speckv_tpu.parallel.sharding import (  # noqa: F401
    param_shardings,
    pool_shardings,
    shard_params,
    shard_pools,
)
