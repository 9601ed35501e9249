from exemplars_vc_tpu.pipelines.make_dict import make_dictionary  # noqa: F401
from exemplars_vc_tpu.pipelines.conv_dicts import build_conversion_dicts  # noqa: F401
from exemplars_vc_tpu.pipelines.convert import convert_utterance  # noqa: F401
from exemplars_vc_tpu.pipelines.evaluate import (  # noqa: F401
    evaluate_heldout,
    heldout_pair,
    no_conversion_baseline,
)
