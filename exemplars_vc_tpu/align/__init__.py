from exemplars_vc_tpu.align.dtw import (  # noqa: F401
    dtw,
    dtw_batch,
    pairwise_sqdist,
)
from exemplars_vc_tpu.align.exemplar import (  # noqa: F401
    build_exemplar_dicts,
    build_exemplar_dicts_padded,
    gather_aligned,
)
