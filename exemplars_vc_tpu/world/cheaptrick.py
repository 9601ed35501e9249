"""CheapTrick-style spectral-envelope estimation in JAX.

Replaces ``pw.cheaptrick`` (reference ``03_a_b_r_parallel.py:94``,
``04_align_n_nmf.py:410``). Same three-stage structure as CheapTrick
(Morise 2015), reformulated for fixed shapes + batched FFTs:

1. pitch-synchronous analysis: per frame, a Hanning window of length 3·T0
   (T0 = sr/f0) — realized as a masked window over a fixed-size buffer so all
   frames batch, power spectrum via one batched rFFT;
2. frequency-domain smoothing with a rectangular window of width 2f0/3 —
   realized exactly as a box integral via cumulative sums with linear
   interpolation at fractional endpoints (per-frame width is data-dependent
   but the op stays fixed-shape);
3. spectral recovery liftering in the cepstral domain: divide by the
   smoothing sinc and apply the q1-lifter (q1 = −0.15, q0 = 1−2q1·cos-term
   structure as in the paper).

Unvoiced frames use a default f0 (WORLD's convention) so their envelope is a
plain smoothed spectrum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from exemplars_vc_tpu.dsp import fft as _fft


DEFAULT_F0 = 500.0   # WORLD's kDefaultF0 for unvoiced frames
Q1 = -0.15           # CheapTrick lifter coefficient


def _windowed_segments(x, centers, f0_safe, sr, max_len, periods=3.0):
    """Per-frame Hanning windows of length ``periods``·T0 over a fixed
    (F, max_len) buffer (T0 = sr/f0)."""
    pad = max_len // 2
    xp = jnp.pad(x, (pad, pad), mode="constant")
    idx = centers[:, None] + jnp.arange(max_len)[None, :]
    seg = xp[idx]                                           # (F, L) centered
    half = (periods / 2.0) * sr / f0_safe                   # window half-length
    n = jnp.arange(max_len) - max_len // 2                  # centered sample index
    inside = jnp.abs(n[None, :]) <= half[:, None]
    win = 0.5 + 0.5 * jnp.cos(jnp.pi * n[None, :] / half[:, None])
    win = jnp.where(inside, win, 0.0)
    seg = seg * win
    # normalize window energy so spectral level is window-invariant
    norm = jnp.sqrt(jnp.sum(win * win, axis=-1, keepdims=True))
    return seg / jnp.maximum(norm, 1e-12)


def _box_smooth_freq(power, width_bins):
    """Rectangular smoothing along frequency with per-frame fractional width.

    power: (F, B); width_bins: (F,) full width in bins. Implemented as the
    exact box integral via cumulative sum + linear interpolation at the
    fractional endpoints (mirror boundary)."""
    B = power.shape[-1]
    # mirror-pad so the box never runs out of support
    P = jnp.concatenate([power[:, 1:][:, ::-1], power, power[:, :-1][:, ::-1]], axis=-1)
    base = B - 1                                            # index of bin 0 in P
    csum = jnp.cumsum(jnp.pad(P, ((0, 0), (1, 0))), axis=-1)  # (F, 3B-1)

    def integral(pos):
        """∫_0^pos P over padded bins (pos float, per frame+bin)."""
        lo = jnp.floor(pos).astype(jnp.int32)
        frac = pos - lo
        lo = jnp.clip(lo, 0, csum.shape[-1] - 2)
        c0 = jnp.take_along_axis(csum, lo, axis=-1)
        p0 = jnp.take_along_axis(P, jnp.clip(lo, 0, P.shape[-1] - 1), axis=-1)
        return c0 + frac * p0

    half = (width_bins / 2.0)[:, None]
    bins = jnp.arange(B)[None, :].astype(power.dtype)
    hi = integral(base + bins + half)
    lo = integral(base + bins - half)
    return (hi - lo) / jnp.maximum(width_bins[:, None], 1e-6)


@partial(jax.jit, static_argnames=("sr", "fft_size", "max_win"))
def cheaptrick(
    x: jnp.ndarray,
    f0: jnp.ndarray,
    centers: jnp.ndarray,
    sr: int = 16000,
    fft_size: int = 1024,
    f0_floor: float = 71.0,
    max_win: int | None = None,
) -> jnp.ndarray:
    """Spectral envelope (n_frames, fft_size//2+1), linear power scale.

    centers: sample position of each frame (same convention as f0 frames)."""
    if max_win is None:
        max_win = fft_size
    f0_safe = jnp.where(f0 > 0, f0, DEFAULT_F0)
    f0_safe = jnp.maximum(f0_safe, f0_floor)

    seg = _windowed_segments(x, centers, f0_safe, sr, max_win)
    spec = _fft.rfft_magsq(seg, n=fft_size)   # (F, B)
    B = spec.shape[-1]

    # stage 2: rectangular smoothing, width 2f0/3 in Hz → bins
    bin_hz = sr / fft_size
    width_bins = (2.0 * f0_safe / 3.0) / bin_hz
    smoothed = _box_smooth_freq(spec, width_bins)
    smoothed = jnp.maximum(smoothed, 1e-12 * jnp.max(smoothed, axis=-1, keepdims=True) + 1e-30)

    # stage 3: liftering in the cepstral (quefrency) domain, as CheapTrick's
    # SmoothingWithRecovery: multiply the quefrency coefficients of the log
    # spectrum by the sinc smoothing lifter sin(πf0τ)/(πf0τ) and the q1
    # compensation lifter (1−2q1) + 2q1·cos(2πf0τ)
    log_spec = jnp.log(smoothed)
    full = jnp.concatenate([log_spec, log_spec[:, -2:0:-1]], axis=-1)  # symmetric (F, fft)
    tau = jnp.arange(B)[None, :] / sr                                  # quefrency (s)
    arg = jnp.pi * f0_safe[:, None] * tau
    lifter_smooth = jnp.where(arg > 1e-6, jnp.sin(arg) / jnp.maximum(arg, 1e-6), 1.0)
    lifter_q = (1.0 - 2.0 * Q1) + 2.0 * Q1 * jnp.cos(2.0 * jnp.pi * f0_safe[:, None] * tau)
    log_env = _fft.irfft(
        _fft.rfft(full) * (lifter_smooth * lifter_q).astype(jnp.complex64),
        n=full.shape[-1],
    )[:, :B]
    # keep exp() away from float32 under/overflow
    return jnp.exp(jnp.clip(log_env, -80.0, 80.0))
