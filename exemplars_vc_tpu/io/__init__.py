from exemplars_vc_tpu.io.wav import read_wav, write_wav  # noqa: F401
from exemplars_vc_tpu.io.store import (  # noqa: F401
    ArtifactStore,
    load_speaker,
    pad_to_bucket,
    stack_ragged,
)
