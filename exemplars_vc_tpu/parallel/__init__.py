from exemplars_vc_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: F401
from exemplars_vc_tpu.parallel.sharded_nmf import sharded_nmf_activations  # noqa: F401
from exemplars_vc_tpu.parallel.sharded_dtw import sharded_dtw_batch  # noqa: F401
from exemplars_vc_tpu.parallel.distributed import initialize_multihost  # noqa: F401
