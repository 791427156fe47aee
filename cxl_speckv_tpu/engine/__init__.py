from cxl_speckv_tpu.engine.engine import Engine, EngineOutput  # noqa: F401
from cxl_speckv_tpu.engine.request import Request, RequestState  # noqa: F401
from cxl_speckv_tpu.engine.spec import NgramProposer, SpecDecoder  # noqa: F401
from cxl_speckv_tpu.engine.scoring import score_prompts  # noqa: F401
