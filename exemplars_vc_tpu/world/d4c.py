"""D4C-style band aperiodicity estimation in JAX.

Replaces ``pw.d4c`` (reference ``03_a_b_r_parallel.py:97``,
``04_align_n_nmf.py:411``). Functional reformulation (not a C port): per
voiced frame the harmonic-to-total energy ratio is measured in coarse bands —
energy within ±f0/4 of each harmonic counts as periodic, the rest as
aperiodic — and the per-band aperiodicity √(noise/total) is interpolated to
the requested spectrum grid. The analysis window spans 8 pitch periods so the
Hanning mainlobe (± 2·f0/periods = f0/4) fits inside the harmonic mask.
Unvoiced frames get aperiodicity ≈ 1 (WORLD's convention). Everything is one
batched rFFT + masked reductions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from exemplars_vc_tpu.dsp import fft as _fft

from exemplars_vc_tpu.world.cheaptrick import _windowed_waveform_batch

AP_FLOOR = 0.001
AP_CEIL = 0.999999
_PERIODS = 8.0      # analysis window length in pitch periods


@partial(jax.jit, static_argnames=("sr", "fft_size", "n_bands", "internal_fft"))
def d4c_aperiodicity(
    x: jnp.ndarray,
    f0: jnp.ndarray,
    centers: jnp.ndarray,
    sr: int = 16000,
    fft_size: int = 1024,
    n_bands: int = 8,
    internal_fft: int = 2048,
) -> jnp.ndarray:
    """Aperiodicity (n_frames, fft_size//2+1) in (0, 1)."""
    f0_safe = jnp.where(f0 > 0, f0, 150.0)
    # clamp so the 8-period window fits the internal buffer
    f0_win = jnp.maximum(f0_safe, _PERIODS * sr / internal_fft)
    seg = _windowed_waveform_batch(
        x.astype(jnp.float32), centers, f0_win, sr, internal_fft,
        periods=_PERIODS, bias_removal=False,
    )
    power = _fft.rfft_magsq(seg, n=internal_fft)   # (F, Bi)
    Bi = power.shape[-1]
    bin_hz = sr / internal_fft
    freqs = jnp.arange(Bi) * bin_hz                                    # (Bi,)

    # distance of each bin to the nearest harmonic of this frame's f0
    ratio = freqs[None, :] / f0_win[:, None]
    dist = jnp.abs(ratio - jnp.round(ratio)) * f0_win[:, None]         # Hz
    harmonic_mask = (dist <= f0_win[:, None] / 4.0).astype(power.dtype)

    # coarse linear bands up to Nyquist
    edges = jnp.linspace(0.0, sr / 2.0, n_bands + 1)
    band_idx = jnp.clip(
        jnp.searchsorted(edges, freqs, side="right") - 1, 0, n_bands - 1
    )
    one_hot = jax.nn.one_hot(band_idx, n_bands, dtype=power.dtype)     # (Bi, bands)

    total = power @ one_hot                                            # (F, bands)
    harm = (power * harmonic_mask) @ one_hot
    noise = jnp.maximum(total - harm, 0.0)
    ap_band = jnp.sqrt(noise / jnp.maximum(total, 1e-20))
    ap_band = jnp.clip(ap_band, AP_FLOOR, AP_CEIL)

    # interpolate band values to the requested output grid
    B = fft_size // 2 + 1
    out_freqs = jnp.arange(B) * (sr / fft_size)
    centers_hz = 0.5 * (edges[:-1] + edges[1:])
    ap_full = jax.vmap(lambda v: jnp.interp(out_freqs, centers_hz, v))(ap_band)

    unvoiced = (f0 <= 0)[:, None]
    return jnp.where(unvoiced, AP_CEIL, ap_full)
