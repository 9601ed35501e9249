from exemplars_vc_tpu.dsp.windows import get_window  # noqa: F401
from exemplars_vc_tpu.dsp.stft import frame_signal, stft, istft, stft_magnitude  # noqa: F401
from exemplars_vc_tpu.dsp.mel import mel_filterbank, melspectrogram, mfcc, dct_matrix  # noqa: F401
from exemplars_vc_tpu.dsp.griffin_lim import griffin_lim  # noqa: F401
from exemplars_vc_tpu.dsp.cqt import cqt, cqt_frequencies, cqt_magnitude, hybrid_cqt  # noqa: F401
from exemplars_vc_tpu.dsp.minqt import iminqt, minqt, minqt_plan  # noqa: F401
from exemplars_vc_tpu.dsp.nsgt import nsgt, insgt, nsgt_plan, nsgt_frequencies  # noqa: F401
from exemplars_vc_tpu.dsp.mcep import mcep, mcep_frames, mcep_to_spectrum, warped_basis  # noqa: F401
from exemplars_vc_tpu.dsp.lpc import lpc, lpc_to_lsp  # noqa: F401
