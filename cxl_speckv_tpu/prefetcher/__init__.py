from cxl_speckv_tpu.prefetcher.controller import PrefetchController, PrefetchStatistics  # noqa: F401
from cxl_speckv_tpu.prefetcher.lstm import LSTMPredictor  # noqa: F401
