"""Float64 oracle of WORLD's DIO f0 estimator + StoneMask refinement.

The reference calls ``pw.dio`` (optionally ``pw.harvest``) then
``pw.stonemask`` (``/root/reference/03_a_b_r_parallel.py:85-92``,
``04_align_n_nmf.py:404-408``). pyworld cannot install here (PARITY.md);
this is a standalone float64 numpy implementation of DIO as published
(M. Morise, H. Kawahara, H. Katayose, "Fast and reliable F0 estimation
method based on the period extraction of vocal fold vibration of singing
voice and speech", AES 35, 2009) and as realized in the WORLD C++ sources
(dio.cpp, stonemask.cpp):

DIO:
1. spectrum of the DC-removed signal, high-passed at 50 Hz (low_cut_filter);
2. per channel c (boundary f0 = floor·2^((c+1)/ch_per_octave)): low-pass by a
   Nuttall window of length 4·round(fs/boundary/2+0.5), then measure FOUR
   event-interval tracks of the filtered signal — negative/positive zero
   crossings, peaks, dips — each as 1/period at event midpoints,
   interpolated onto the frame grid;
3. candidate per channel = mean of the four tracks, score = relative
   standard deviation; candidates outside [boundary/2, boundary·2] or
   [floor, ceil] are invalid;
4. best contour = lowest score per frame;
5. FixF0Contour: step 1 kills |Δf0|/f0 > allowed_range jumps, step 2 kills
   voiced runs shorter than voice_range_minimum frames, steps 3/4 extend
   voiced regions forward/backward from the candidate pool within
   allowed_range.

StoneMask (GetRefinedF0): 3/f0-long Blackman window and its derivative
window; instantaneous frequency per bin from the spectra
(ω_j + Im(conj(X)·X_diff)/|X|²·fs/2π — Flanagan's estimator); refined f0 =
amplitude-weighted mean of inst_freq(k·f0)/k over harmonics k ≤ 6.
"""

from __future__ import annotations

import numpy as np

from tests.oracles.world_cheaptrick import matlab_round
from tests.oracles.world_d4c import nuttall


def _decimate_spectrum(x: np.ndarray, fs: int, fft_size: int) -> np.ndarray:
    """FFT of the DC-removed signal with a 50 Hz low-cut (WORLD's
    GetSpectrumForEstimation + low_cut_filter, speed=1)."""
    y = np.zeros(fft_size)
    y[: len(x)] = x - np.mean(x)
    spec = np.fft.rfft(y)
    # low cut: WORLD builds an FIR from a Hann-ish shape; an ideal-ish
    # high-pass at 50 Hz with a smooth edge is numerically equivalent for
    # speech (the band only suppresses rumble below every candidate period)
    f = np.arange(len(spec)) * fs / fft_size
    gain = np.clip((f - 25.0) / 25.0, 0.0, 1.0)
    return spec * gain


def _nuttall_lowpass_spectrum(boundary_f0: float, fs: int,
                              fft_size: int) -> np.ndarray:
    half = matlab_round(fs / boundary_f0 / 2.0 + 0.5)
    n = half * 4
    w = nuttall(n)
    w = w / w.sum()
    buf = np.zeros(fft_size)
    buf[:n] = w
    return np.fft.rfft(buf)


def _zero_crossings(sig: np.ndarray, fs: int):
    """Four event tracks: (midpoint times, 1/period) per type."""
    tracks = []
    for s in (sig, -sig):
        # negative-going crossings of s: s[i] > 0 >= s[i+1]
        idx = np.where((s[:-1] > 0) & (s[1:] <= 0))[0]
        frac = s[idx] / (s[idx] - s[idx + 1])
        times = (idx + frac) / fs
        tracks.append(times)
    d = np.diff(sig)
    for s in (d, -d):
        idx = np.where((s[:-1] > 0) & (s[1:] <= 0))[0]
        frac = s[idx] / (s[idx] - s[idx + 1])
        times = (idx + 0.5 + frac) / fs
        tracks.append(times)
    out = []
    for times in tracks:
        if len(times) < 3:
            out.append((np.zeros(0), np.zeros(0)))
            continue
        locations = (times[:-1] + times[1:]) / 2.0
        intervals = 1.0 / np.diff(times)
        out.append((locations, intervals))
    return out


def _candidate_for_channel(spec_hp, lpf_spec, fs, fft_size, x_length,
                           boundary_f0, f0_floor, f0_ceil, positions):
    # WORLD compensates the causal Nuttall filter's group delay by
    # index_bias = half_average_length*2 (dio.cpp GetFilteredSignal)
    bias = matlab_round(fs / boundary_f0 / 2.0 + 0.5) * 2
    full = np.fft.irfft(spec_hp * lpf_spec, n=fft_size)
    filtered = full[bias : bias + x_length]
    tracks = _zero_crossings(filtered, fs)
    if any(len(loc) < 2 for loc, _ in tracks):
        return np.zeros(len(positions)), np.full(len(positions), 1e8)
    interp = np.stack([
        np.interp(positions, loc, iv) for loc, iv in tracks
    ])                                                       # (4, F)
    cand = interp.mean(axis=0)
    score = np.sqrt(np.sum((interp - cand) ** 2, axis=0) / 3.0)
    score = score / np.maximum(cand, 1e-12)                  # relative std
    bad = ((cand < boundary_f0 / 2) | (cand > boundary_f0 * 2)
           | (cand < f0_floor) | (cand > f0_ceil))
    cand = np.where(bad, 0.0, cand)
    score = np.where(bad, 1e8, score)
    return cand, score


def _fix_step1(f0, allowed_range):
    out = f0.copy()
    for i in range(1, len(f0)):
        if f0[i] == 0 or f0[i - 1] == 0:
            continue
        if abs(f0[i] - f0[i - 1]) / max(f0[i], 1e-12) > allowed_range:
            out[i] = 0.0
    return out


def _fix_step2(f0, voice_range_minimum):
    """Kill voiced runs shorter than voice_range_minimum frames."""
    out = f0.copy()
    n = len(f0)
    i = 0
    while i < n:
        if out[i] == 0:
            i += 1
            continue
        j = i
        while j < n and out[j] > 0:
            j += 1
        if j - i < voice_range_minimum:
            out[i:j] = 0.0
        i = j
    return out


def _fix_extend(f0, candidates, allowed_range):
    """Steps 3/4: extend voiced regions into adjacent frames whose candidate
    pool contains a value within allowed_range of the neighbor."""
    out = f0.copy()
    n = len(out)
    for i in range(1, n):                  # forward
        if out[i] == 0 and out[i - 1] > 0:
            ref = out[i - 1]
            pool = candidates[:, i]
            ok = pool[(pool > 0) & (np.abs(pool - ref) / ref <= allowed_range)]
            if len(ok):
                out[i] = ok[np.argmin(np.abs(ok - ref))]
    for i in range(n - 2, -1, -1):         # backward
        if out[i] == 0 and out[i + 1] > 0:
            ref = out[i + 1]
            pool = candidates[:, i]
            ok = pool[(pool > 0) & (np.abs(pool - ref) / ref <= allowed_range)]
            if len(ok):
                out[i] = ok[np.argmin(np.abs(ok - ref))]
    return out


def dio_oracle(
    x: np.ndarray,
    fs: int,
    frame_period_ms: float = 5.0,
    f0_floor: float = 71.0,
    f0_ceil: float = 800.0,
    channels_in_octave: float = 2.0,
    allowed_range: float = 0.1,
):
    """Returns (f0 (F,), temporal_positions (F,) seconds)."""
    x = np.asarray(x, np.float64)
    n_bands = 1 + int(np.log2(f0_ceil / f0_floor) * channels_in_octave)
    boundaries = f0_floor * 2.0 ** ((1 + np.arange(n_bands)) / channels_in_octave)
    f0_length = int(len(x) / fs * 1000.0 / frame_period_ms) + 1
    positions = np.arange(f0_length) * frame_period_ms / 1000.0

    fft_size = 1
    while fft_size < len(x) + 4 * int(np.ceil(fs / 50.0)):
        fft_size *= 2
    spec_hp = _decimate_spectrum(x, fs, fft_size)

    cands = np.zeros((n_bands, f0_length))
    scores = np.full((n_bands, f0_length), 1e8)
    for b, bf in enumerate(boundaries):
        lpf = _nuttall_lowpass_spectrum(bf, fs, fft_size)
        cands[b], scores[b] = _candidate_for_channel(
            spec_hp, lpf, fs, fft_size, len(x), bf, f0_floor, f0_ceil,
            positions,
        )

    best = cands[np.argmin(scores, axis=0), np.arange(f0_length)]
    voice_range_minimum = int(0.5 + 1000.0 / frame_period_ms / f0_floor) * 2 + 1
    f0 = _fix_step1(best, allowed_range)
    f0 = _fix_step2(f0, voice_range_minimum)
    f0 = _fix_extend(f0, cands, allowed_range)
    return f0, positions


def stonemask_refine_oracle(
    x: np.ndarray, fs: int, f0: np.ndarray, positions: np.ndarray,
    f0_floor: float = 71.0, f0_ceil: float = 800.0,
) -> np.ndarray:
    """WORLD StoneMask GetRefinedF0 per frame (float64)."""
    x = np.asarray(x, np.float64)
    out = np.zeros_like(f0)
    for i, (cf, pos) in enumerate(zip(f0, positions)):
        if cf <= 0:
            continue
        cf = max(cf, f0_floor)
        half = int(np.ceil(3.0 * fs / cf / 2.0))
        n_win = 2 * half + 1
        window_time = n_win / fs
        fft_size = int(2 ** (np.ceil(np.log2(n_win)) + 1))
        base = np.arange(-half, half + 1)
        idx = np.clip(matlab_round(pos * fs) + base, 0, len(x) - 1)
        bt = base / fs
        main_win = (0.42 + 0.5 * np.cos(2 * np.pi * bt / window_time)
                    + 0.08 * np.cos(4 * np.pi * bt / window_time))
        diff_win = np.zeros(n_win)
        diff_win[1:-1] = -(main_win[2:] - main_win[:-2]) / 2.0
        diff_win[0] = -main_win[1] / 2.0
        diff_win[-1] = main_win[-2] / 2.0

        seg = x[idx]
        X = np.fft.rfft(seg * main_win, fft_size)
        Xd = np.fft.rfft(seg * diff_win, fft_size)
        power = np.abs(X) ** 2
        freqs = np.arange(len(X)) * fs / fft_size
        inst = freqs + (X.real * Xd.imag - X.imag * Xd.real) / np.maximum(
            power, 1e-300
        ) * fs / (2.0 * np.pi)

        n_harm = min(int(fs / 2.0 / cf), 6)
        num = den = 0.0
        for k in range(1, n_harm + 1):
            j = matlab_round(cf * k * fft_size / fs)
            if j >= len(X):
                break
            amp = np.sqrt(power[j])
            num += inst[j] / k * amp
            den += amp
        refined = num / max(den, 1e-300)
        # WORLD gates the refinement at kFloorF0StoneMask = 40 Hz
        if 40.0 <= refined <= f0_ceil:
            out[i] = refined
    return out
