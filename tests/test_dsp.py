import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from exemplars_vc_tpu.dsp import (
    frame_signal,
    get_window,
    griffin_lim,
    istft,
    mel_filterbank,
    mfcc,
    stft,
)
from exemplars_vc_tpu.dsp.mel import dct_matrix, power_to_db


def _sig(n=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 16000
    return (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 880 * t)
        + 0.01 * rng.standard_normal(n)
    ).astype(np.float32)


def test_windows_match_scipy():
    for name in ["hann", "hamming", "blackman"]:
        w = np.asarray(get_window(name, 400, periodic=True))
        ref = scipy.signal.get_window(name, 400, fftbins=True)
        np.testing.assert_allclose(w, ref, atol=1e-6)
        ws = np.asarray(get_window(name, 400, periodic=False))
        refs = scipy.signal.get_window(name, 400, fftbins=False)
        np.testing.assert_allclose(ws, refs, atol=1e-6)


def test_frame_signal():
    x = jnp.arange(1000, dtype=jnp.float32)
    f = frame_signal(x, 400, 80)
    assert f.shape == ((1000 - 400) // 80 + 1, 400)
    np.testing.assert_array_equal(np.asarray(f[1]), np.arange(80, 480))


def test_stft_matches_scipy():
    x = _sig()
    S = np.asarray(stft(jnp.asarray(x), n_fft=400, hop_length=80))
    # scipy ShortTimeFFT equivalent: periodic hann, centered, reflect padding
    w = scipy.signal.get_window("hann", 400, fftbins=True)
    xp = np.pad(x, 200, mode="reflect")
    n_frames = S.shape[0]
    ref = np.stack(
        [np.fft.rfft(xp[i * 80 : i * 80 + 400] * w) for i in range(n_frames)]
    )
    np.testing.assert_allclose(S, ref, atol=1e-3)


def test_stft_istft_roundtrip():
    x = _sig()
    S = stft(jnp.asarray(x), n_fft=400, hop_length=80)
    y = np.asarray(istft(S, n_fft=400, hop_length=80, length=len(x)))
    # interior must reconstruct near-perfectly (NOLA inverse)
    err = np.abs(y[400:-400] - x[400:-400])
    assert err.max() < 1e-4


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(16000, 400, n_mels=128)
    assert fb.shape == (128, 201)
    assert (fb >= 0).all()
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_dct_matrix_orthonormal():
    D = dct_matrix(128, 128, dtype=np.float64)
    np.testing.assert_allclose(D @ D.T, np.eye(128), atol=1e-10)


def test_power_to_db_topdb():
    S = jnp.asarray([1.0, 1e-12])
    db = np.asarray(power_to_db(S))
    assert db[0] == 0.0
    assert db[1] == -80.0  # clamped at max - top_db


def test_mfcc_shapes_and_sanity():
    x = _sig()
    m = np.asarray(mfcc(jnp.asarray(x), sr=16000, n_fft=400, hop_length=80))
    assert m.shape == (1 + len(x) // 80, 20)
    assert np.isfinite(m).all()
    # c0 tracks loudness: scaled signal shifts c0 but not higher coeffs much
    m2 = np.asarray(mfcc(jnp.asarray(0.1 * x), sr=16000, n_fft=400, hop_length=80))
    assert abs((m2[:, 0] - m[:, 0]).mean()) > 1.0


def test_griffin_lim_reconstructs_tone():
    x = _sig(8000)
    mag = jnp.abs(stft(jnp.asarray(x), n_fft=400, hop_length=80))
    y = np.asarray(
        griffin_lim(mag, n_fft=400, hop_length=80, n_iter=100, length=len(x))
    )
    assert y.shape == x.shape
    mag_y = np.abs(np.asarray(stft(jnp.asarray(y), n_fft=400, hop_length=80)))
    # spectral convergence: reconstructed magnitude close to target
    sc = np.linalg.norm(mag_y - np.asarray(mag)) / np.linalg.norm(np.asarray(mag))
    assert sc < 0.1


def test_griffin_lim_source_phase_init_beats_random():
    """Seeding GL with the signal's own phase should land (near-)perfectly
    even at a tiny iteration budget, and strictly beat white-noise phase at
    the same budget (the VC pipeline seeds with the source utterance's
    phase — same frame grid as the converted magnitude)."""
    x = _sig(8000, seed=3)
    S = stft(jnp.asarray(x), n_fft=400, hop_length=80)
    mag = jnp.abs(S)

    def sc_err(y):
        mag_y = np.abs(np.asarray(stft(jnp.asarray(y), n_fft=400, hop_length=80)))
        return np.linalg.norm(mag_y - np.asarray(mag)) / np.linalg.norm(np.asarray(mag))

    y_src = np.asarray(griffin_lim(mag, n_fft=400, hop_length=80, n_iter=5,
                                   length=len(x), init_phase=S))
    y_rand = np.asarray(griffin_lim(mag, n_fft=400, hop_length=80, n_iter=5,
                                    length=len(x)))
    err_src, err_rand = sc_err(y_src), sc_err(y_rand)
    assert err_src < 0.02            # own phase: essentially consistent already
    assert err_src < 0.5 * err_rand  # and far ahead of the random seed


def test_stft_on_reference_audio(sf1_wav):
    x, sr = sf1_wav
    S = stft(jnp.asarray(x[: 2 * sr], dtype=jnp.float32), n_fft=400, hop_length=80)
    assert S.shape[1] == 201
    assert bool(jnp.isfinite(jnp.abs(S)).all())


def test_lpc_matches_toeplitz_solve():
    """lpc() solves the Yule-Walker normal equations — pin against a direct
    Toeplitz solve (this module previously had zero direct coverage)."""
    import scipy.linalg

    from exemplars_vc_tpu.dsp.lpc import lpc

    rng = np.random.default_rng(0)
    x = np.convolve(rng.standard_normal(4000),
                    [1.0, -1.2, 0.8, -0.3, 0.1], mode="same")
    frame = (x[500:900] * np.hamming(400)).astype(np.float32)
    order = 10
    a = np.asarray(lpc(jnp.asarray(frame), order=order), np.float64)
    # oracle: biased autocorrelation + Toeplitz solve
    f = frame.astype(np.float64)
    r = np.correlate(f, f, "full")[len(f) - 1 : len(f) + order]
    a_ref = scipy.linalg.solve_toeplitz((r[:-1], r[:-1]), -r[1:])
    np.testing.assert_allclose(a[1:], a_ref, rtol=1e-4, atol=1e-5)
    # gain: sqrt of the residual power
    g_ref = np.sqrt(r[0] + a_ref @ r[1:])
    assert abs(a[0] - g_ref) / g_ref < 1e-3


def test_lpc_to_lsp_matches_root_finding():
    """LSP values pinned against numpy polynomial root-finding on the
    correctly-built degree-(p+1) sum/difference polynomials (the regression
    that motivated this test built them one degree short)."""
    from exemplars_vc_tpu.dsp.lpc import lpc, lpc_to_lsp

    rng = np.random.default_rng(1)
    x = np.convolve(rng.standard_normal(4000),
                    [1.0, -0.9, 0.6, -0.2], mode="same")
    for start in (500, 1500, 2500):
        frame = (x[start : start + 400] * np.hamming(400)).astype(np.float32)
        a = np.asarray(lpc(jnp.asarray(frame), order=10), np.float64)
        a1 = a.copy()
        a1[0] = 1.0
        p = np.concatenate([a1, [0.0]]) + np.concatenate([[0.0], a1[::-1]])
        q = np.concatenate([a1, [0.0]]) - np.concatenate([[0.0], a1[::-1]])

        def uc_roots(c):
            r = np.roots(c)
            r = r[np.abs(np.abs(r) - 1) < 1e-3]
            w = np.angle(r)
            w = w[(w > 1e-6) & (w < np.pi - 1e-6)]
            return np.sort(np.unique(np.round(w, 6)))

        truth = np.sort(np.concatenate([uc_roots(p), uc_roots(q)]))
        got = np.asarray(lpc_to_lsp(jnp.asarray(a)), np.float64)
        assert got.shape == truth.shape
        np.testing.assert_allclose(got, truth, atol=1e-4)
        assert (np.diff(got) > 0).all()          # strictly ascending


def test_griffin_lim_short_length_is_valid():
    """A requested length shorter than the magnitude's natural span must
    return a trimmed signal, not crash the loop carry."""
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    mag = jnp.abs(stft(jnp.asarray(x), n_fft=400, hop_length=80))
    y = griffin_lim(mag, n_fft=400, hop_length=80, n_iter=10, length=1000)
    y = np.asarray(y)
    assert y.shape == (1000,)
    assert np.isfinite(y).all() and np.abs(y).max() > 0.1
