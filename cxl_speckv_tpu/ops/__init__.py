from cxl_speckv_tpu.ops.quant import (  # noqa: F401
    dequantize_kv,
    kv_storage_dtype,
    quantize_kv,
)
