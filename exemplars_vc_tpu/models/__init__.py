from exemplars_vc_tpu.models.warping import (  # noqa: F401
    WarpingNetConfig,
    init_warping_params,
    warping_forward,
    warping_forward_batch,
)
