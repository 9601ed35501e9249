"""The matmul-DFT path must match numpy's FFT bit-for-bit-ish — it is the only
FFT available on the axon TPU backend (native XLA FFT is UNIMPLEMENTED there,
so on TPU every transform in the framework rides these matmuls)."""

import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.dsp import fft as F


def _force_matmul(monkeypatch):
    monkeypatch.setattr(F, "_use_native", lambda: False)


def test_rfft_matches_numpy(monkeypatch):
    _force_matmul(monkeypatch)
    rng = np.random.default_rng(0)
    for n in [400, 512, 1024]:
        x = rng.standard_normal((7, n)).astype(np.float32)
        got = np.asarray(F.rfft(jnp.asarray(x), n=n))
        ref = np.fft.rfft(x, n=n, axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got.real, ref.real, atol=2e-4 * scale)
        np.testing.assert_allclose(got.imag, ref.imag, atol=2e-4 * scale)


def test_rfft_pads_and_truncates(monkeypatch):
    _force_matmul(monkeypatch)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 400)).astype(np.float32)
    got = np.asarray(F.rfft(jnp.asarray(x), n=512))
    ref = np.fft.rfft(x, n=512, axis=-1)
    np.testing.assert_allclose(got, ref, atol=2e-3)
    got2 = np.asarray(F.rfft(jnp.asarray(x), n=256))
    ref2 = np.fft.rfft(x[:, :256], n=256, axis=-1)
    np.testing.assert_allclose(got2, ref2, atol=2e-3)


def test_irfft_matches_numpy(monkeypatch):
    _force_matmul(monkeypatch)
    rng = np.random.default_rng(2)
    for n in [400, 512]:
        X = (rng.standard_normal((5, n // 2 + 1)) + 1j * rng.standard_normal((5, n // 2 + 1))).astype(np.complex64)
        got = np.asarray(F.irfft(jnp.asarray(X), n=n))
        ref = np.fft.irfft(X, n=n, axis=-1)
        np.testing.assert_allclose(got, ref, atol=3e-4 * np.abs(X).max())


def test_irfft_of_real_input(monkeypatch):
    _force_matmul(monkeypatch)
    rng = np.random.default_rng(3)
    X = np.abs(rng.standard_normal((4, 257))).astype(np.float32)  # power spectrum
    got = np.asarray(F.irfft(jnp.asarray(X), n=512))
    ref = np.fft.irfft(X, n=512, axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_roundtrip(monkeypatch):
    _force_matmul(monkeypatch)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((6, 512)).astype(np.float32)
    back = np.asarray(F.irfft(F.rfft(jnp.asarray(x), n=512), n=512))
    np.testing.assert_allclose(back, x, atol=1e-3)


def test_rfft_magsq(monkeypatch):
    _force_matmul(monkeypatch)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((6, 400)).astype(np.float32)
    got = np.asarray(F.rfft_magsq(jnp.asarray(x), n=512))
    ref = np.abs(np.fft.rfft(x, n=512, axis=-1)) ** 2
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3 * ref.max())


def test_full_dsp_chain_under_matmul_dft(monkeypatch):
    """STFT→ISTFT roundtrip stays exact when the DFT is matmul-based."""
    _force_matmul(monkeypatch)
    from exemplars_vc_tpu.dsp import istft, stft

    rng = np.random.default_rng(6)
    x = rng.standard_normal(8000).astype(np.float32) * 0.1
    S = stft(jnp.asarray(x), n_fft=400, hop_length=80)
    y = np.asarray(istft(S, n_fft=400, hop_length=80, length=len(x)))
    assert np.abs(y[400:-400] - x[400:-400]).max() < 1e-3


def test_conv_stft_matches_native():
    """The fused convolutional STFT (TPU path) must equal framing+FFT.
    _stft_conv is called directly (the jitted stft caches per backend, so a
    monkeypatched dispatch would silently reuse the native trace)."""
    from exemplars_vc_tpu.dsp.stft import _stft_conv, stft as do_stft

    rng = np.random.default_rng(11)
    x = rng.standard_normal(12000).astype(np.float32)
    ref = np.asarray(do_stft(jnp.asarray(x)))
    xp = np.pad(x, 200, mode="reflect")
    got = np.asarray(_stft_conv(jnp.asarray(xp), 400, 80, "hann"))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got.real, ref.real, atol=3e-4 * scale)
    np.testing.assert_allclose(got.imag, ref.imag, atol=3e-4 * scale)


def test_conv_stft_batched():
    from exemplars_vc_tpu.dsp.stft import _stft_conv

    rng = np.random.default_rng(12)
    xb = rng.standard_normal((3, 8400)).astype(np.float32)
    got = np.asarray(jnp.abs(_stft_conv(jnp.asarray(xb), 400, 80, "hann")))
    for i in range(3):
        single = np.asarray(jnp.abs(_stft_conv(jnp.asarray(xb[i]), 400, 80, "hann")))
        np.testing.assert_allclose(got[i], single, atol=1e-3)


def test_conv_ola_matches_scatter():
    from exemplars_vc_tpu.dsp.stft import _ola_conv

    rng = np.random.default_rng(13)
    frames = rng.standard_normal((30, 400)).astype(np.float32)
    got = np.asarray(_ola_conv(jnp.asarray(frames), 80))
    out_len = 400 + 80 * 29
    ref = np.zeros(out_len, np.float32)
    for f in range(30):
        ref[f * 80 : f * 80 + 400] += frames[f]
    np.testing.assert_allclose(got, ref, atol=1e-4)
