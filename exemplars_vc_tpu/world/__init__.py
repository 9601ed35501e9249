from exemplars_vc_tpu.world.f0 import estimate_f0, refine_f0_stonemask  # noqa: F401
from exemplars_vc_tpu.world.cheaptrick import cheaptrick  # noqa: F401
from exemplars_vc_tpu.world.d4c import d4c_aperiodicity  # noqa: F401
from exemplars_vc_tpu.world.analysis import WorldFeatures, analyze  # noqa: F401
from exemplars_vc_tpu.world.synthesis import synthesize  # noqa: F401
