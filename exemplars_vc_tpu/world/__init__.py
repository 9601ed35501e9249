from exemplars_vc_tpu.world.f0 import (  # noqa: F401
    estimate_f0,
    estimate_f0_tracked,
    refine_f0_stonemask,
)
from exemplars_vc_tpu.world.dio import estimate_f0_dio  # noqa: F401
from exemplars_vc_tpu.world.harvest import estimate_f0_harvest  # noqa: F401
from exemplars_vc_tpu.world.cheaptrick import cheaptrick  # noqa: F401
from exemplars_vc_tpu.world.d4c import d4c_aperiodicity  # noqa: F401
from exemplars_vc_tpu.world.analysis import WorldFeatures, analyze  # noqa: F401
from exemplars_vc_tpu.world.synthesis import synthesize  # noqa: F401
