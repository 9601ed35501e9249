"""Float64 oracle of WORLD's D4C band-aperiodicity estimator.

The reference calls ``pw.d4c`` (``/root/reference/03_a_b_r_parallel.py:97``,
``04_align_n_nmf.py:411``). pyworld cannot install here (PARITY.md), so this
is a standalone float64 numpy implementation of D4C as published (M. Morise,
"D4C, a band-aperiodicity estimator for high-quality speech synthesis",
Speech Communication 84, 2016) and as realized in the WORLD C++ sources
(d4c.cpp):

- **LoveTrain** voiced-band check: 3·T0 Hanning window (bias removed),
  power spectrum on a 2^(1+⌊log2(3·fs/40+1)⌋) grid; ratio of cumulated
  power in (100, 4000] Hz over (100, 7900] Hz. Frames with f0 = 0 or ratio
  ≤ threshold (0.85) stay fully aperiodic (1 − 1e-12).
- **Static centroid**: two 4·T0 Blackman windows at ±0.25/f0 around the
  frame position, each normalized to unit energy; per-window centroid
  spectrum Re(conj(X)·FFT(t·x̂)); summed, then DC-corrected.
- **Smoothed power spectrum**: 4·T0 Hanning window, power, DC correction,
  rectangular smoothing of width f0.
- **Static group delay**: centroid / smoothed power, smoothed with width
  f0/2, then DETRENDED by subtracting its width-f0 smoothing.
- **Coarse aperiodicity** per 3 kHz band: Nuttall-windowed segment of the
  group delay around the band center (window_length =
  ⌊3000·fft/fs⌋·2+1), FFT, power spectrum SORTED ascending, and
  ap_dB = 10·log10(cum[N/2 − boundary − 1] / cum[N/2]) with
  boundary = round(8·fft/window_length) — the fraction of group-delay
  spectral energy NOT in the top ~8 main lobes. Revised by
  min(0, ap + (f0 − 100)/50).
- **Full band**: linear interpolation in dB over the coarse axis
  [0 → −60 dB, 3000·i → estimates, fs/2 → ≈0 dB], then 10^(dB/20).

Scale conventions cancel: the coarse statistic is a power RATIO of the
windowed group delay, so window-energy normalization choices do not affect
the result (documented here because the C code is inconsistent about them).
"""

from __future__ import annotations

import numpy as np

from tests.oracles.world_cheaptrick import (
    _dc_correction,
    _linear_smoothing,
    matlab_round,
)

K_FLOOR_F0_D4C = 47.0
K_LOWEST_F0_LOVE = 40.0
K_FREQ_INTERVAL = 3000.0
K_UPPER_LIMIT = 15000.0
K_THRESHOLD = 0.85
K_SAFE_MIN = 1e-12


def d4c_fft_size(fs: int) -> int:
    return int(2 ** (1 + int(np.log2(4.0 * fs / K_FLOOR_F0_D4C + 1.0))))


def love_train_fft_size(fs: int) -> int:
    return int(2 ** (1 + int(np.log2(3.0 * fs / K_LOWEST_F0_LOVE + 1.0))))


def n_bands(fs: int) -> int:
    return int(min(K_UPPER_LIMIT, fs / 2.0 - K_FREQ_INTERVAL) / K_FREQ_INTERVAL)


def nuttall(n: int) -> np.ndarray:
    m = np.arange(n)
    return (0.355768 - 0.487396 * np.cos(2 * np.pi * m / (n - 1))
            + 0.144232 * np.cos(4 * np.pi * m / (n - 1))
            - 0.012604 * np.cos(6 * np.pi * m / (n - 1)))


def _windowed(x, fs, f0, position_s, half_length, kind, normalize=False,
              remove_bias=True):
    """WORLD d4c GetWindowedWaveform: window of ``2·half_length`` periods."""
    half = matlab_round(half_length * fs / f0)
    base = np.arange(-half, half + 1)
    origin = matlab_round(position_s * fs + 0.001)
    safe = np.clip(origin + base, 0, len(x) - 1)
    pos = base / half_length / fs
    if kind == "hanning":
        window = 0.5 * np.cos(np.pi * pos * f0) + 0.5
    else:  # blackman
        window = (0.42 + 0.5 * np.cos(np.pi * pos * f0)
                  + 0.08 * np.cos(2 * np.pi * pos * f0))
    wave = x[safe] * window
    if remove_bias:
        wave -= window * (wave.sum() / window.sum())
    if normalize:
        wave /= np.sqrt(np.sum(wave**2)) + 1e-300
    return wave


def love_train_ratio(x, fs, f0, position_s) -> float:
    fft_size = love_train_fft_size(fs)
    b0 = int(np.ceil(100.0 * fft_size / fs))
    b1 = int(np.ceil(4000.0 * fft_size / fs))
    b2 = int(np.ceil(7900.0 * fft_size / fs))
    wave = _windowed(x, fs, max(f0, K_LOWEST_F0_LOVE), position_s, 1.5,
                     "hanning")
    buf = np.zeros(fft_size)
    buf[: len(wave)] = wave[: fft_size]
    power = np.abs(np.fft.rfft(buf)) ** 2
    power[: b0 + 1] = 0.0
    cum = np.cumsum(power)
    b2 = min(b2, len(cum) - 1)
    return float(cum[b1] / max(cum[b2], 1e-300))


def _centroid(x, fs, f0, position_s, fft_size) -> np.ndarray:
    wave = _windowed(x, fs, f0, position_s, 2.0, "blackman", normalize=True)
    buf = np.zeros(fft_size)
    buf[: len(wave)] = wave[: fft_size]
    X = np.fft.rfft(buf)
    Y = np.fft.rfft(buf * np.arange(fft_size))
    return (X.real * Y.real + X.imag * Y.imag)  # Re(conj(X)·Y)


def static_group_delay(x, fs, f0, position_s, fft_size) -> np.ndarray:
    c1 = _centroid(x, fs, f0, position_s - 0.25 / f0, fft_size)
    c2 = _centroid(x, fs, f0, position_s + 0.25 / f0, fft_size)
    centroid = _dc_correction(c1 + c2, f0, fs, fft_size)

    wave = _windowed(x, fs, f0, position_s, 2.0, "hanning")
    buf = np.zeros(fft_size)
    buf[: len(wave)] = wave[: fft_size]
    power = np.abs(np.fft.rfft(buf)) ** 2
    power = _dc_correction(power, f0, fs, fft_size)
    power = _linear_smoothing(power, f0, fs, fft_size)

    gd = centroid / np.maximum(power, 1e-300)
    gd = _linear_smoothing(gd, f0 / 2.0, fs, fft_size)
    return gd - _linear_smoothing(gd, f0, fs, fft_size)


def coarse_aperiodicity(gd, fs, fft_size, window) -> np.ndarray:
    wl = len(window)
    boundary = matlab_round(fft_size * 8.0 / wl)
    half = wl // 2
    out = np.empty(n_bands(fs))
    for i in range(len(out)):
        center = int(K_FREQ_INTERVAL * (i + 1) * fft_size / fs)
        seg = gd[center - half : center - half + wl] * window
        buf = np.zeros(fft_size)
        buf[:wl] = seg
        power = np.sort(np.abs(np.fft.rfft(buf)) ** 2)
        cum = np.cumsum(power)
        out[i] = 10.0 * np.log10(
            cum[fft_size // 2 - boundary - 1] / max(cum[-1], 1e-300)
        )
    return out


def d4c_frame(x, fs, f0, position_s, out_fft_size,
              threshold: float = K_THRESHOLD) -> np.ndarray:
    """Aperiodicity (out_fft_size//2+1,) in (0, 1) for one frame."""
    B = out_fft_size // 2 + 1
    if f0 <= 0 or love_train_ratio(x, fs, f0, position_s) <= threshold:
        return np.full(B, 1.0 - K_SAFE_MIN)
    fft_size = d4c_fft_size(fs)
    f0_use = max(f0, K_FLOOR_F0_D4C)
    gd = static_group_delay(x, fs, f0_use, position_s, fft_size)
    wl = int(K_FREQ_INTERVAL * fft_size / fs) * 2 + 1
    coarse = coarse_aperiodicity(gd, fs, fft_size, nuttall(wl))
    coarse = np.minimum(0.0, coarse + (f0_use - 100.0) / 50.0)
    nb = len(coarse)
    axis = np.concatenate([[0.0], K_FREQ_INTERVAL * (1 + np.arange(nb)),
                           [fs / 2.0]])
    vals = np.concatenate([[-60.0], coarse, [-K_SAFE_MIN]])
    freqs = np.arange(B) * fs / out_fft_size
    ap_db = np.interp(freqs, axis, vals)
    return 10.0 ** (ap_db / 20.0)


def d4c_oracle(x, fs, f0, positions_s, out_fft_size,
               threshold: float = K_THRESHOLD) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return np.stack([
        d4c_frame(x, fs, float(f), float(p), out_fft_size, threshold)
        for f, p in zip(f0, positions_s)
    ])
