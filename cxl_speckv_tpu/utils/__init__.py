from cxl_speckv_tpu.utils.tracing import PhaseTimer, trace_context  # noqa: F401
