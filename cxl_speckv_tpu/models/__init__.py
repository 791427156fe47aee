from cxl_speckv_tpu.models.configs import (  # noqa: F401
    PRESETS,
    LlamaConfig,
    llama_3_2_1b,
    llama_3_8b,
    llama_3_70b,
    tiny_test_config,
)
from cxl_speckv_tpu.models.llama import (  # noqa: F401
    decode_step,
    forward_dense,
    init_params,
    param_count,
    prefill_chunk,
)
