import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.dsp.cqt import cqt, cqt_frequencies, cqt_magnitude


def naive_cqt_frame(x_frame_centered, sr, freqs, bins_per_octave):
    """Direct per-bin inner products (the definition the kernel bank encodes)."""
    Q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    max_len = int(np.ceil(Q * sr / freqs[0]))
    out = np.zeros(len(freqs), np.complex64)
    for k, fk in enumerate(freqs):
        nk = int(np.ceil(Q * sr / fk))
        n = np.arange(nk)
        win = 0.5 - 0.5 * np.cos(2 * np.pi * n / nk)
        kern = win * np.exp(-2j * np.pi * fk / sr * n) * (2.0 / nk)
        start = (max_len - nk) // 2
        out[k] = (x_frame_centered[start : start + nk] * kern).sum()
    return out


def test_cqt_matches_naive_inner_products():
    sr, hop = 8000, 200
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000).astype(np.float32)
    freqs = cqt_frequencies(36, 55.0, 12)
    C = np.asarray(cqt(jnp.asarray(x), sr=sr, hop_length=hop, fmin=55.0,
                       n_bins=36, bins_per_octave=12))
    Q = 1.0 / (2.0 ** (1.0 / 12) - 1.0)
    max_len = int(np.ceil(Q * sr / 55.0))
    xp = np.pad(x, (max_len // 2, max_len // 2), mode="reflect")
    for fi in (0, 3, 10):
        frame = xp[fi * hop : fi * hop + max_len]
        ref = naive_cqt_frame(frame, sr, freqs, 12)
        np.testing.assert_allclose(C[fi], ref, rtol=2e-4, atol=2e-5)


def test_cqt_tone_peaks_at_its_bin():
    sr = 8000
    freqs = cqt_frequencies(48, 55.0, 12)
    t = np.arange(8000) / sr
    for target_bin in (12, 30, 43):
        x = np.sin(2 * np.pi * freqs[target_bin] * t).astype(np.float32)
        M = np.asarray(cqt_magnitude(jnp.asarray(x), sr=sr, hop_length=400,
                                     fmin=55.0, n_bins=48, bins_per_octave=12))
        mid = M[M.shape[0] // 2]
        assert int(np.argmax(mid)) == target_bin
        # hann-windowed unit-amplitude tone → |coef| ≈ 0.5 at the center bin
        assert 0.35 < mid[target_bin] < 0.65


def test_cqt_rejects_bins_above_nyquist():
    import pytest

    with pytest.raises(ValueError):
        cqt(jnp.zeros(1000), sr=8000, fmin=1000.0, n_bins=36, bins_per_octave=12)


def test_cqt_batched_leading_axes():
    x = np.random.default_rng(1).standard_normal((3, 2000)).astype(np.float32)
    C = cqt(jnp.asarray(x), sr=8000, hop_length=500, fmin=110.0, n_bins=24)
    assert C.shape[:1] == (3,) and C.shape[-1] == 24
    single = cqt(jnp.asarray(x[1]), sr=8000, hop_length=500, fmin=110.0, n_bins=24)
    np.testing.assert_allclose(np.asarray(C[1]), np.asarray(single), rtol=1e-5)


def test_hybrid_cqt_covers_full_spectrum():
    from exemplars_vc_tpu.dsp.cqt import hybrid_cqt

    sr, f_lo, f_hi = 16000, 220.0, 7000.0
    t = np.arange(8000) / sr
    x = (np.sin(2 * np.pi * f_lo * t) + np.sin(2 * np.pi * f_hi * t)).astype(np.float32)
    # 60 CQ bins from C1: top CQ band ≈ 1047 Hz → 7 kHz only in the linear part
    cq, lin, lin_freqs = hybrid_cqt(jnp.asarray(x), sr=sr, n_bins=60)
    assert cq.shape[-2] == lin.shape[-2]               # aligned hop grid
    freqs_cq = cqt_frequencies(60, 32.70319566257483)
    assert lin_freqs[0] > freqs_cq[-1]                 # complementary coverage
    # the low tone peaks in the CQ part at the right bin
    k_lo = int(np.argmax(np.abs(np.asarray(cq)).mean(axis=0)))
    assert abs(freqs_cq[k_lo] - f_lo) / f_lo < 0.06
    # the high tone peaks in the linear part at the right bin
    k_hi = int(np.argmax(np.abs(np.asarray(lin)).mean(axis=0)))
    assert abs(lin_freqs[k_hi] - f_hi) < 40.0 + 1e-9
