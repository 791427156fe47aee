from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention  # noqa: F401
from cxl_speckv_tpu.ops.paged_attention import paged_attention  # noqa: F401
from cxl_speckv_tpu.ops.paged_attention_ref import paged_attention_ref  # noqa: F401
from cxl_speckv_tpu.ops.quant import (  # noqa: F401
    dequantize_kv,
    kv_storage_dtype,
    quantize_kv,
)
