from cxl_speckv_tpu.runtime.kv_cache import TieredKVCache  # noqa: F401
from cxl_speckv_tpu.runtime.transfer import TransferEngine, TransferStatistics  # noqa: F401
