from cxl_speckv_tpu.core.block_pool import BlockPool  # noqa: F401
from cxl_speckv_tpu.core.block_table import BlockTable  # noqa: F401
from cxl_speckv_tpu.core.directory import (  # noqa: F401
    BlockState,
    DirectoryStatistics,
    ResidencyDirectory,
)
