from exemplars_vc_tpu.obs.logging import get_logger, new_run_dir  # noqa: F401
from exemplars_vc_tpu.obs.metrics import mcd, mcd_aligned, spectral_convergence  # noqa: F401
from exemplars_vc_tpu.obs.profiling import Timer, trace_to  # noqa: F401
