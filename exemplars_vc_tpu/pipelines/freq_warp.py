"""Stage 02 — frequency-warping variants (DFW, AMF, neural).

The reference has three variants: a DFW script that is an empty stub
(``02_freq_warping_DFW.py:52``), an AMF/LPC experiment that computes
hamming→LPC→LSP per frame and stops (``02_freq_warping_AMF.py:67-81``), and
the neural net (see exemplars_vc_tpu.models). Here all three are functional:

- :func:`amf_warping` — per aligned frame pair, LSP line frequencies of source
  and target define a piecewise-linear warping ω_tar = w(ω_src) (the classic
  formant-anchored AMF idea the reference's experiment was heading toward).
- :func:`dfw_warping` — dynamic frequency warping: DTW *along the frequency
  axis* of aligned log-spectra pairs; the averaged path is the warping
  function. Reuses the batched wavefront DTW kernel with spectra as
  "sequences" of 1-dim samples.
- :func:`apply_warping` — resample a spectrum along a warping function
  (linear interpolation, vectorized/jitted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.align import dtw_batch
from exemplars_vc_tpu.dsp import lpc, lpc_to_lsp
from exemplars_vc_tpu.dsp.windows import get_window


@jax.jit
def _interp_monotone(x_new: jnp.ndarray, xp: jnp.ndarray, fp: jnp.ndarray) -> jnp.ndarray:
    return jnp.interp(x_new, xp, fp)


def amf_warping(
    frames_src: jnp.ndarray,
    frames_tar: jnp.ndarray,
    order: int = 20,
) -> jnp.ndarray:
    """Aligned time-domain frame pairs → per-pair warping functions.

    frames_src/tar: (N, frame_length) *aligned* raw frames. Returns (N, order+2)
    warping anchor pairs stacked as ω_src→ω_tar including endpoints (0, π).
    Frames are hamming-windowed as in the reference (``02_freq_warping_AMF.py:67``).
    """
    n = frames_src.shape[-1]
    w = get_window("hamming", n, periodic=False, dtype=frames_src.dtype)
    lsp_s = lpc_to_lsp(lpc(frames_src * w, order=order))
    lsp_t = lpc_to_lsp(lpc(frames_tar * w, order=order))
    zeros = jnp.zeros(lsp_s.shape[:-1] + (1,), lsp_s.dtype)
    pis = jnp.full(lsp_s.shape[:-1] + (1,), jnp.pi, lsp_s.dtype)
    anchors_src = jnp.concatenate([zeros, lsp_s, pis], axis=-1)
    anchors_tar = jnp.concatenate([zeros, lsp_t, pis], axis=-1)
    return jnp.stack([anchors_src, anchors_tar], axis=-2)  # (N, 2, order+2)


def apply_warping(spec: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Warp a spectrum (n_bins,) with anchor pairs (2, P): resample the source
    spectrum at the inverse-warped frequency of every output bin."""
    n_bins = spec.shape[-1]
    omega = jnp.linspace(0.0, jnp.pi, n_bins)
    # ω_src for each target bin: inverse of the monotone anchor map
    src_of_tar = _interp_monotone(omega, anchors[1], anchors[0])
    pos = src_of_tar / jnp.pi * (n_bins - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_bins - 1)
    hi = jnp.clip(lo + 1, 0, n_bins - 1)
    frac = pos - lo
    return spec[lo] * (1.0 - frac) + spec[hi] * frac


def dfw_warping(
    spec_src: jnp.ndarray,
    spec_tar: jnp.ndarray,
    eps: float = 1e-8,
) -> tuple[np.ndarray, np.ndarray]:
    """Dynamic frequency warping of aligned spectrum pairs.

    spec_src/tar: (N, n_bins) *time-aligned* magnitude spectra. Each pair's
    log-spectra are DTW-aligned along the frequency axis; returns
    (path_bins_src (N, P), path_bins_tar (N, P)) padded with −1 — the
    frequency-warping curves. This completes the reference's empty ``dfw()``
    stub with the standard DFW formulation."""
    n, b = spec_src.shape
    ls = jnp.log(jnp.maximum(spec_src, eps))[..., None]   # (N, bins, 1)
    lt = jnp.log(jnp.maximum(spec_tar, eps))[..., None]
    lens = jnp.full((n,), b, dtype=jnp.int32)
    r = dtw_batch(ls, lt, lens, lens)
    return np.asarray(r.path_i), np.asarray(r.path_j)


def warping_curve_from_path(path_i: np.ndarray, path_j: np.ndarray, n_bins: int) -> np.ndarray:
    """Collapse a DFW path to a function tar_bin(src_bin) by averaging the
    path's j per i (host-side, small)."""
    curve = np.zeros(n_bins)
    counts = np.zeros(n_bins)
    valid = path_i >= 0
    np.add.at(curve, path_i[valid], path_j[valid])
    np.add.at(counts, path_i[valid], 1)
    counts = np.maximum(counts, 1)
    return curve / counts
