"""Float64 oracle of WORLD's CheapTrick spectral-envelope estimator.

The reference calls ``pw.cheaptrick`` (``/root/reference/03_a_b_r_parallel.py:94``,
``04_align_n_nmf.py:410``). pyworld cannot install in this image (no egress;
see PARITY.md), so this is a standalone float64 numpy implementation of
CheapTrick as published (M. Morise, "CheapTrick, a spectral envelope
estimator for high-quality speech synthesis", Speech Communication 67, 2015)
and as realized in the WORLD C++ sources (cheaptrick.cpp / common.cpp):

per frame, with f0 (unvoiced -> kDefaultF0 = 500 Hz):

1. GetWindowedWaveform — pitch-synchronous segment of length 3*T0:
   half_window_length = matlab_round(1.5*fs/f0), Hanning
   w(n) = 0.5*cos(pi*(n/1.5/fs)*f0) + 0.5 over n = -half..+half, normalized
   by sqrt(sum w^2); out-of-range sample indexes clamp to the signal edges
   (safe_index); the windowed mean is removed via the window-weighted bias
   (waveform -= window * sum(waveform)/sum(window)).
2. GetPowerSpectrum + DCCorrection — |FFT|^2 on fft_size points; bins below
   f0 get the spectrum mirrored about f0 added
   (output[i] = input[i] + input(f0 - f_i)).
3. LinearSmoothing — rectangular smoothing of full width 2*f0/3 Hz realized
   as the difference of the linearly-interpolated cumulative integral of a
   mirror-extended spectrum (WORLD's SetParametersForLinearSmoothing +
   interp1Q, reproduced exactly, including the half-bin origin).
4. SmoothingWithRecovery — log, cepstrum via FFT of the symmetrized log
   spectrum keeping the real (cosine) part, multiply by the smoothing
   lifter sin(pi*f0*t)/(pi*f0*t) and the compensation lifter
   (1 - 2*q1) + 2*q1*cos(2*pi*f0*t) with q1 = -0.15, back to exp.

Determinism: WORLD dithers with randn()*1e-12 (GetWindowedWaveform,
AddInfinitesimalNoise) purely to dodge log(0); the oracle uses a
deterministic 1e-12 floor instead — the difference is below double rounding
of any real-speech spectrum.
"""

from __future__ import annotations

import numpy as np

K_DEFAULT_F0 = 500.0
K_FLOOR_F0 = 71.0
Q1 = -0.15


def matlab_round(x: float) -> int:
    return int(np.floor(x + 0.5)) if x > 0 else int(np.ceil(x - 0.5))


def get_fft_size(fs: int, f0_floor: float = K_FLOOR_F0) -> int:
    """WORLD: fft_size = 2^(1 + floor(log2(3*fs/f0_floor + 1)))."""
    return int(2 ** (1 + int(np.log2(3.0 * fs / f0_floor + 1.0))))


def _windowed_waveform(x: np.ndarray, fs: int, f0: float,
                       position_s: float) -> np.ndarray:
    half = matlab_round(1.5 * fs / f0)
    base = np.arange(-half, half + 1)
    origin = matlab_round(position_s * fs + 0.001)
    safe = np.clip(origin + base, 0, len(x) - 1)
    pos = base / 1.5 / fs
    window = 0.5 * np.cos(np.pi * pos * f0) + 0.5
    window /= np.sqrt(np.sum(window**2))
    waveform = x[safe] * window
    waveform -= window * (waveform.sum() / window.sum())
    return waveform


def _dc_correction(power: np.ndarray, f0: float, fs: int,
                   fft_size: int) -> np.ndarray:
    out = power.copy()
    upper_limit = 2 + int(f0 * fft_size / fs)
    upper_limit_replica = upper_limit - 1
    bin_hz = fs / fft_size
    freqs = np.arange(upper_limit_replica) * bin_hz
    # replica(f) = power interpolated at (f0 - f), on the regular bin grid
    q = (f0 - freqs) / bin_hz
    lo = np.floor(q).astype(int)
    frac = q - lo
    lo = np.clip(lo, 0, len(power) - 2)
    replica = power[lo] * (1 - frac) + power[lo + 1] * frac
    out[:upper_limit_replica] += replica
    return out


def _linear_smoothing(power: np.ndarray, width: float, fs: int,
                      fft_size: int) -> np.ndarray:
    """WORLD common.cpp LinearSmoothing, reproduced exactly."""
    half_bins = fft_size // 2
    boundary = int(width * fft_size / fs) + 1
    n_mirror = half_bins + boundary * 2 + 1
    mirroring = np.empty(n_mirror)
    mirroring[:boundary] = power[boundary:0:-1]
    mirroring[boundary : half_bins + boundary] = power[:half_bins]
    for i in range(half_bins + boundary, n_mirror):
        mirroring[i] = power[half_bins - (i - (half_bins + boundary))]
    segment = np.cumsum(mirroring * fs / fft_size)
    origin = -(boundary - 0.5) * fs / fft_size
    dx = fs / fft_size
    freq_axis = np.arange(half_bins + 1) / fft_size * fs - width / 2.0

    def interp1q(xq):
        q = (xq - origin) / dx
        lo = np.clip(np.floor(q).astype(int), 0, n_mirror - 2)
        frac = q - lo
        return segment[lo] * (1 - frac) + segment[lo + 1] * frac

    low = interp1q(freq_axis)
    high = interp1q(freq_axis + width)
    return (high - low) / width


def _smoothing_with_recovery(power: np.ndarray, f0: float, fs: int,
                             fft_size: int, q1: float = Q1) -> np.ndarray:
    half_bins = fft_size // 2
    i = np.arange(half_bins + 1)
    quefrency = i / fs
    smoothing = np.ones(half_bins + 1)
    arg = np.pi * f0 * quefrency[1:]
    smoothing[1:] = np.sin(arg) / arg
    compensation = (1.0 - 2.0 * q1) + 2.0 * q1 * np.cos(
        2.0 * np.pi * f0 * quefrency
    )
    log_spec = np.log(power)
    symmetric = np.concatenate([log_spec, log_spec[-2:0:-1]])
    cep = np.fft.rfft(symmetric).real  # cosine part only (WORLD zeroes imag)
    cep = cep * smoothing * compensation
    # inverse with the cosine-only spectrum: irfft of the real array
    log_env = np.fft.irfft(cep.astype(complex), n=fft_size)[: half_bins + 1]
    return np.exp(log_env)


def cheaptrick_frame(
    x: np.ndarray, fs: int, f0: float, position_s: float,
    fft_size: int | None = None, q1: float = Q1,
) -> np.ndarray:
    """Spectral envelope (power) of one frame — WORLD CheapTrickGeneralBody."""
    fft_size = fft_size or get_fft_size(fs)
    f0 = K_DEFAULT_F0 if f0 <= K_FLOOR_F0 else float(f0)
    wave = _windowed_waveform(np.asarray(x, np.float64), fs, f0, position_s)
    buf = np.zeros(fft_size)
    buf[: len(wave)] = wave[: fft_size]
    power = np.abs(np.fft.rfft(buf)) ** 2
    power = _dc_correction(power, f0, fs, fft_size)
    power = _linear_smoothing(power, f0 * 2.0 / 3.0, fs, fft_size)
    power = power + 1e-12  # deterministic stand-in for AddInfinitesimalNoise
    return _smoothing_with_recovery(power, f0, fs, fft_size, q1)


def cheaptrick_oracle(
    x: np.ndarray, fs: int, f0: np.ndarray, positions_s: np.ndarray,
    fft_size: int | None = None, q1: float = Q1,
) -> np.ndarray:
    """(T,) signal + per-frame f0/positions -> (n_frames, fft_size//2+1)."""
    fft_size = fft_size or get_fft_size(fs)
    return np.stack([
        cheaptrick_frame(x, fs, float(f), float(p), fft_size, q1)
        for f, p in zip(f0, positions_s)
    ])
