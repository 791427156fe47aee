"""cxl_speckv_tpu — a TPU-native disaggregated KV-cache engine for LLM serving.

Built from scratch in JAX/XLA/Pallas with the capabilities of the CXL-SpecKV
reference system (FastLM/CXL-SpecKV, FPGA'26), redesigned TPU-first:

- The CXL memory pool (reference `src/cxl_memory/cxl_memory_manager.cpp`)
  becomes a tiered paged-KV allocator spanning TPU HBM and TPU-VM host DRAM
  (`cxl_speckv_tpu.core`, `cxl_speckv_tpu.runtime`).
- The FPGA compression engine (reference `hardware/rtl/kv_compress.v`,
  `src/fpga_engine/cache_engine.cpp`) becomes Pallas INT8/INT4/FP8
  KV-quantization kernels with dequantization fused into the attention matmul
  (`cxl_speckv_tpu.ops`).
- The LSTM speculative prefetcher (reference
  `src/prefetcher/speculative_prefetcher.cpp`) becomes a JAX LSTM predictor +
  host prefetch controller (`cxl_speckv_tpu.prefetcher`).
- The MESI coherence directory (reference `hardware/rtl/coherence_directory.v`,
  `src/cxl_memory/coherence_manager.cpp`) becomes a block-residency state
  machine in the host runtime (`cxl_speckv_tpu.core.directory`).
- On top sits a continuous-batching decode engine for Llama-class models
  (`cxl_speckv_tpu.engine`, `cxl_speckv_tpu.models`), tensor-sharded across
  device meshes via `jax.sharding` (`cxl_speckv_tpu.parallel`).
"""

__version__ = "0.1.0"

from cxl_speckv_tpu.config import (  # noqa: F401
    CacheConfig,
    EngineConfig,
    PrefetchConfig,
    SystemConfig,
)
