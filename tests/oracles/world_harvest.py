"""Float64 oracle of WORLD's Harvest f0 estimator.

The reference's conversion-dictionary stage calls ``pw.harvest``
(``/root/reference/03_a_b_r_parallel.py:87``, ``03_a_b_r.py:72-81``).
pyworld cannot install here (PARITY.md); this is a standalone float64 numpy
implementation of Harvest as published (M. Morise, "Harvest: A
high-performance fundamental frequency estimator from speech signals",
INTERSPEECH 2017) and structured like the WORLD C++ sources (harvest.cpp):

1. DC removal + 50 Hz low-cut of the input (GetWaveformAndSpectrum);
2. DENSE band-pass channel bank — boundary f0s at ``channels_in_octave=40``
   per octave over [0.9·floor, 1.1·ceil]; channel filter = a 4-period
   Nuttall window (length 2·round(2·fs/boundary)+1) modulated by
   cos(2π·boundary·t) (GetFilteredSignal), applied zero-phase in the
   spectral domain;
3. per channel, the FOUR event-interval tracks (negative/positive zero
   crossings, peaks, dips), interpolated onto the INTERNAL 1 ms frame grid;
   a channel yields a candidate only where the four agree near the channel
   center: mean within [0.9, 1.1]·boundary and within [floor, ceil]
   (GetF0CandidateContour);
4. official candidates per frame — runs of adjacent agreeing channels are
   merged to their mean (DetectOfficialF0Candidates), then each frame's
   candidate pool is overlapped with its ±3 neighbor frames
   (OverlapF0Candidates);
5. refinement (RefineF0Candidates/GetRefinedF0): per (frame, candidate), a
   3-period Blackman window and its derivative give per-bin instantaneous
   frequency (Flanagan); refined f0 = amplitude-weighted mean of
   inst(k·f0)/k over harmonics k ≤ 6, and the candidate's SCORE = inverse
   mean relative deviation of the harmonic instantaneous frequencies from
   the harmonic relation (our realization of Harvest's reliability score);
6. contour: best-score candidate per frame; FixStep1 jump removal,
   FixStep2 short-run removal, FixStep3/4 bidirectional extension from the
   candidate pools (same fix family as DIO but on the 1 ms grid);
7. zero-phase smoothing of voiced segments (two passes of the [¼, ½, ¼]
   FIR — our stand-in for WORLD's forward-backward biquad; same intent:
   remove 1-frame jitter without phase lag), then sampling the 1 ms contour
   at the requested frame period.

Deliberate deviations from harvest.cpp, documented for the golden tests:
no decimation to 8 kHz (we filter at the native rate — the channel bank is
already band-limited), the neighbor-overlap width (3) and the reliability
score form are our realizations of the paper's description, and the smoother
is FIR rather than the C code's biquad. These change no structural stage.
"""

from __future__ import annotations

import numpy as np

from tests.oracles.world_cheaptrick import matlab_round
from tests.oracles.world_d4c import nuttall
from tests.oracles.world_dio import _decimate_spectrum, _zero_crossings

BASIC_PERIOD_MS = 1.0          # harvest.cpp basic_frame_period
CHANNELS_IN_OCTAVE = 40.0
OVERLAP_NEIGHBORS = 3
MAX_CANDIDATES = 12


def _bandpass_spectrum(boundary_f0: float, fs: int, fft_size: int):
    # 4-period Nuttall-windowed cosine: mainlobe ≈ ±boundary/2, so each
    # channel passes ONLY content near its center (a 2-period filter lets
    # the 2nd harmonic swamp weak-fundamental channels)
    half = matlab_round(fs / boundary_f0 * 2.0)
    n = 2 * half + 1
    t = (np.arange(n) - half) / fs
    w = nuttall(n) * np.cos(2.0 * np.pi * boundary_f0 * t)
    buf = np.zeros(fft_size)
    buf[:n] = w
    return np.fft.rfft(buf), half


def _channel_candidates(spec_hp, fs, fft_size, x_length, boundary_f0,
                        f0_floor, f0_ceil, positions):
    """(F,) candidate contour for one channel (0 where rejected)."""
    bp, bias = _bandpass_spectrum(boundary_f0, fs, fft_size)
    filtered = np.fft.irfft(spec_hp * bp, n=fft_size)[bias : bias + x_length]
    tracks = _zero_crossings(filtered, fs)
    if any(len(loc) < 2 for loc, _ in tracks):
        return np.zeros(len(positions))
    interp = np.stack([
        np.interp(positions, loc, iv) for loc, iv in tracks
    ])                                                        # (4, F)
    cand = interp.mean(axis=0)
    bad = ((cand < 0.9 * boundary_f0) | (cand > 1.1 * boundary_f0)
           | (cand < f0_floor) | (cand > f0_ceil))
    return np.where(bad, 0.0, cand)


def _official_candidates(raw: np.ndarray, max_candidates: int = MAX_CANDIDATES):
    """Merge runs of adjacent agreeing channels per frame → (C, F)."""
    n_ch, F = raw.shape
    out = np.zeros((max_candidates, F))
    for t in range(F):
        col = raw[:, t]
        cands = []
        i = 0
        while i < n_ch:
            if col[i] == 0.0:
                i += 1
                continue
            j = i
            while j < n_ch and col[j] > 0.0:
                j += 1
            if j - i > 2:                    # ≥3 adjacent channels agree
                cands.append(col[i:j].mean())
            i = j
        for k, c in enumerate(cands[:max_candidates]):
            out[k, t] = c
    return out


def _overlap_candidates(cands: np.ndarray, n: int = OVERLAP_NEIGHBORS):
    """Each frame also sees its ±n neighbors' candidates → (C·(2n+1), F)."""
    C, F = cands.shape
    outs = [cands]
    for s in range(1, n + 1):
        left = np.zeros_like(cands)
        left[:, s:] = cands[:, :-s]
        right = np.zeros_like(cands)
        right[:, :-s] = cands[:, s:]
        outs.extend([left, right])
    return np.concatenate(outs, axis=0)


def _refine_candidate(x, fs, pos, cf, f0_floor, f0_ceil):
    """GetRefinedF0: returns (refined_f0, score)."""
    if cf <= 0:
        return 0.0, 0.0
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
    num = den = dev = 0.0
    for k in range(1, n_harm + 1):
        j = matlab_round(cf * k * fft_size / fs)
        if j >= len(X):
            break
        amp = np.sqrt(power[j])
        num += inst[j] / k * amp
        den += amp
        dev += amp * abs(inst[j] / k - cf) / cf
    if den <= 0:
        return 0.0, 0.0
    refined = num / den
    score = 1.0 / (dev / den + 1e-12)        # inverse mean relative deviation
    if refined < f0_floor or refined > f0_ceil:
        return 0.0, 0.0
    return refined, score


def _fix_step4_merge(f0, candidates, allowed_range, max_gap):
    """Bridge short unvoiced gaps whose endpoints agree within
    allowed_range, filling from the candidate pools."""
    out = f0.copy()
    n = len(out)
    i = 0
    while i < n:
        if out[i] > 0:
            i += 1
            continue
        j = i
        while j < n and out[j] == 0:
            j += 1
        if 0 < i and j < n and (j - i) <= max_gap:
            a, b = out[i - 1], out[j]
            if abs(a - b) / max(a, 1e-12) <= allowed_range:
                for t in range(i, j):
                    ref = a + (b - a) * (t - i + 1) / (j - i + 1)
                    pool = candidates[:, t]
                    ok = pool[(pool > 0)
                              & (np.abs(pool - ref) / ref <= allowed_range)]
                    if len(ok):
                        out[t] = ok[np.argmin(np.abs(ok - ref))]
        i = j
    return out


def _smooth_voiced(f0):
    """Two zero-phase [¼ ½ ¼] passes per voiced segment."""
    out = f0.copy()
    n = len(out)
    i = 0
    while i < n:
        if out[i] == 0:
            i += 1
            continue
        j = i
        while j < n and out[j] > 0:
            j += 1
        seg = out[i:j]
        for _ in range(2):
            if len(seg) >= 3:
                pad = np.concatenate([[seg[0]], seg, [seg[-1]]])
                seg = 0.25 * pad[:-2] + 0.5 * pad[1:-1] + 0.25 * pad[2:]
        out[i:j] = seg
        i = j
    return out


def harvest_oracle(
    x: np.ndarray,
    fs: int,
    frame_period_ms: float = 5.0,
    f0_floor: float = 71.0,
    f0_ceil: float = 800.0,
    allowed_range: float = 0.1,
):
    """Returns (f0 (F,), temporal_positions (F,) s) at the REQUESTED frame
    period; all estimation runs on the internal 1 ms grid."""
    from tests.oracles.world_dio import _fix_extend, _fix_step1, _fix_step2

    x = np.asarray(x, np.float64)
    adj_floor = f0_floor * 0.9
    adj_ceil = f0_ceil * 1.1
    n_ch = 1 + int(np.log2(adj_ceil / adj_floor) * CHANNELS_IN_OCTAVE)
    boundaries = adj_floor * 2.0 ** ((1 + np.arange(n_ch)) / CHANNELS_IN_OCTAVE)

    F1 = int(len(x) / fs * 1000.0 / BASIC_PERIOD_MS) + 1
    pos1 = np.arange(F1) * BASIC_PERIOD_MS / 1000.0

    fft_size = 1
    while fft_size < len(x) + 4 * int(np.ceil(fs / 50.0)):
        fft_size *= 2
    spec_hp = _decimate_spectrum(x, fs, fft_size)

    raw = np.zeros((n_ch, F1))
    for b, bf in enumerate(boundaries):
        raw[b] = _channel_candidates(spec_hp, fs, fft_size, len(x), bf,
                                     f0_floor, f0_ceil, pos1)

    cands = _official_candidates(raw)

    refined = np.zeros_like(cands)
    scores = np.zeros_like(cands)
    for c in range(cands.shape[0]):
        for t in range(F1):
            refined[c, t], scores[c, t] = _refine_candidate(
                x, fs, pos1[t], cands[c, t], f0_floor, f0_ceil)
    # overlap AFTER refinement: each frame also sees its ±3 neighbors'
    # refined candidates and scores (refining the shifted copies at the
    # shifted positions is ~identical within 3 ms and 7× the FFT work)
    refined = _overlap_candidates(refined)
    scores = _overlap_candidates(scores)

    best = np.argmax(scores, axis=0)
    f0 = refined[best, np.arange(F1)]
    f0 = np.where(scores[best, np.arange(F1)] > 0, f0, 0.0)

    voice_range_minimum = int(0.5 + 1000.0 / BASIC_PERIOD_MS / f0_floor) + 1
    f0 = _fix_step1(f0, allowed_range)
    f0 = _fix_step2(f0, voice_range_minimum)
    f0 = _fix_extend(f0, refined, allowed_range)
    f0 = _fix_step4_merge(f0, refined, allowed_range,
                          max_gap=voice_range_minimum)
    # final own-frame re-refinement of the selected contour: recovers the
    # tracking accuracy the neighbor-overlap trades away on moving f0
    for t in range(F1):
        if f0[t] > 0:
            r, s = _refine_candidate(x, fs, pos1[t], f0[t], f0_floor, f0_ceil)
            if s > 0:
                f0[t] = r
    f0 = _smooth_voiced(f0)

    # sample the 1 ms contour at the requested period
    Fq = int(len(x) / fs * 1000.0 / frame_period_ms) + 1
    posq = np.arange(Fq) * frame_period_ms / 1000.0
    idx = np.minimum(np.floor(posq * 1000.0 / BASIC_PERIOD_MS + 0.5).astype(int),
                     F1 - 1)
    return f0[idx], posq
