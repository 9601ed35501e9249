"""Source separation — TPU-native coverage of the reference's vendored
pyfasst toolbox (SURVEY §2.2).

The reference vendors pyfasst (``dependencies/pyfasst-master``) but never
imports it from the pipeline (verified in SURVEY §1); its capabilities are
nonetheless part of the component inventory. This package re-designs the
core of that toolbox TPU-first:

- ``isnmf``: Itakura-Saito NMF multiplicative updates with optional fixed
  factors (≙ ``pyfasst/tools/nmf.py:NMF_decomposition/NMF_decomp_init``)
  and the Durrieu source/filter variant (≙ ``SFNMF_decomp_init``).
- ``multichannel``: the FASST model family's core — EM for the local
  Gaussian model (per-source NMF spectral power × full-rank spatial
  covariance, Wiener-filter separation), jitted end-to-end
  (≙ ``pyfasst/audioModel.py:FASST/MultiChanNMFInst_FASST/MultiChanNMFConv``).

The Viterbi tracking kernel (pyfasst's only native extension) lives in
``align.viterbi``; melody-style f0 tracking built on it is
``world.f0.estimate_f0_tracked``.
"""

from exemplars_vc_tpu.separate.isnmf import is_nmf, is_divergence, sf_nmf
from exemplars_vc_tpu.separate.multichannel import (
    MultichannelNMF,
    fit_multichannel_nmf,
    separate_signal,
)

__all__ = [
    "is_nmf",
    "is_divergence",
    "sf_nmf",
    "MultichannelNMF",
    "fit_multichannel_nmf",
    "separate_signal",
]
