import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplars_vc_tpu.separate import (
    fit_multichannel_nmf,
    is_divergence,
    is_nmf,
    separate_signal,
    sf_nmf,
)

EPS = 1e-10


def ref_is_nmf(SX, W, H, n_iter, update_W=True, update_H=True):
    """Direct numpy transcription of the pyfasst update semantics
    (tools/nmf.py:133-157): per iteration, W-update (with column
    normalization shipping energy into H) against a fresh reconstruction,
    then H-update against a fresh reconstruction."""
    SX, W, H = SX.astype(np.float64), W.astype(np.float64), H.astype(np.float64)
    if update_W:
        W = W / W.sum(axis=0)
    for _ in range(n_iter):
        if update_W:
            hat = W @ H
            num = (SX / np.maximum(hat**2, EPS)) @ H.T
            den = (1.0 / np.maximum(hat, EPS)) @ H.T
            W *= num / np.maximum(den, EPS)
            sumW = W.sum(axis=0)
            sumW[sumW == 0] = 1.0
            W /= sumW
            H *= sumW[:, None]
        if update_H:
            hat = W @ H
            num = W.T @ (SX / np.maximum(hat**2, EPS))
            den = W.T @ (1.0 / np.maximum(hat, EPS))
            H *= num / np.maximum(den, EPS)
    return W, H


def low_rank_power(rng, F=48, N=40, K=3):
    Wt = rng.random((F, K)) + 0.1
    Ht = rng.random((K, N)) + 0.1
    return (Wt @ Ht).astype(np.float32)


def test_is_nmf_matches_pyfasst_oracle(rng):
    SX = low_rank_power(rng)
    W0 = (rng.standard_normal((48, 5)) ** 2).astype(np.float32)
    H0 = (rng.standard_normal((5, 40)) ** 2).astype(np.float32)
    W, H = is_nmf(SX, n_components=5, n_iter=8, W_init=W0, H_init=H0)
    Wr, Hr = ref_is_nmf(SX, W0, H0, n_iter=8)
    np.testing.assert_allclose(np.asarray(W), Wr, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(H), Hr, rtol=2e-3, atol=1e-5)


def test_is_nmf_monotone_divergence(rng):
    SX = low_rank_power(rng)
    key = jax.random.PRNGKey(3)
    prev = None
    for it in (2, 8, 30):
        W, H = is_nmf(SX, n_components=4, n_iter=it, key=key)
        d = float(is_divergence(jnp.asarray(SX), W @ H))
        if prev is not None:
            assert d <= prev * (1 + 1e-5)
        prev = d
    # a rank-3 target with 4 components must fit well
    assert prev / SX.size < 0.05


def test_is_nmf_fixed_W_stays_fixed(rng):
    SX = low_rank_power(rng)
    W0 = (rng.random((48, 4)) + 0.1).astype(np.float32)
    W, H = is_nmf(SX, n_components=4, n_iter=6, W_init=W0, update_W=False)
    np.testing.assert_array_equal(np.asarray(W), W0)
    # H alone still reduces the divergence vs its init
    d0 = float(is_divergence(jnp.asarray(SX), jnp.asarray(W0) @ jnp.ones((4, 40)) * SX.mean()))
    d1 = float(is_divergence(jnp.asarray(SX), W @ H))
    assert d1 < d0


def test_is_nmf_W_columns_normalized(rng):
    SX = low_rank_power(rng)
    W, H = is_nmf(SX, n_components=4, n_iter=5, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(W).sum(axis=0), 1.0, rtol=1e-4)


def test_sf_nmf_fits_source_filter_structure(rng):
    # target built from the model itself: excitation combs × smooth filters
    F, N = 64, 32
    exc = np.zeros((F, 2), np.float32)
    exc[::8, 0] = 1.0   # comb with period 8
    exc[::5, 1] = 1.0   # comb with period 5
    filt = np.stack(
        [np.exp(-np.arange(F) / 20.0), np.exp(-((np.arange(F) - 30) ** 2) / 200.0)],
        axis=1,
    ).astype(np.float32)
    h = (rng.random((2, N)) + 0.05).astype(np.float32)
    hf = (rng.random((2, N)) + 0.05).astype(np.float32)
    SX = (exc @ h) * (filt @ hf) + 0.01

    out = sf_nmf(SX, n_components=2, n_filt_components=2, n_res_components=1,
                 n_iter=60, key=jax.random.PRNGKey(0))
    W, H, WF, HF, WR, HR = (np.asarray(a) for a in out)
    assert W.shape == (F, 2) and H.shape == (2, N)
    assert WF.shape == (F, 2) and HF.shape == (2, N)
    hat = (W @ H) * (WF @ HF) + WR @ HR
    d = float(is_divergence(jnp.asarray(SX), jnp.asarray(hat)))
    d0 = float(is_divergence(jnp.asarray(SX), jnp.full_like(jnp.asarray(SX), SX.mean())))
    assert d < 0.1 * d0


def _two_source_stereo(rng, T=6000, sr=8000):
    """Ground-truth stereo mixture: a low tone panned left, a high tone
    panned right, with distinct AM envelopes."""
    t = np.arange(T) / sr
    s1 = (np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    s2 = (np.sign(np.sin(2 * np.pi * 1223 * t)) * (1 + 0.5 * np.cos(2 * np.pi * 3 * t))).astype(np.float32)
    a1 = np.array([1.0, 0.2], np.float32)
    a2 = np.array([0.2, 1.0], np.float32)
    img1 = a1[:, None] * s1[None, :]
    img2 = a2[:, None] * s2[None, :]
    return img1, img2, (img1 + img2)


def test_multichannel_nll_monotone(rng):
    img1, img2, mix = _two_source_stereo(rng)
    from exemplars_vc_tpu.dsp.stft import stft

    S = stft(jnp.asarray(mix), n_fft=128, hop_length=64)
    X = jnp.transpose(S, (2, 1, 0))
    model = fit_multichannel_nmf(X, n_sources=2, n_components=2, n_em=12,
                                 key=jax.random.PRNGKey(0))
    nll = np.asarray(model.neg_log_like)
    # EM on the local Gaussian model: NLL non-increasing (small slack for f32)
    assert nll[-1] < nll[0]
    viol = np.diff(nll) > np.abs(nll[:-1]) * 1e-3
    assert viol.sum() <= 1, f"NLL increased at iterations {np.where(viol)[0]}"


def test_multichannel_separation_recovers_panned_sources(rng):
    img1, img2, mix = _two_source_stereo(rng)
    images, model = separate_signal(
        jnp.asarray(mix), n_sources=2, n_components=2, n_em=40,
        n_fft=128, hop_length=32, key=jax.random.PRNGKey(1),
    )
    images = np.asarray(images)
    assert images.shape == (2, 2, mix.shape[1])

    # near-conservativity: Wiener images sum back to the mixture up to the
    # energy the fitted model fails to cover (see separate_signal docstring)
    resid = np.linalg.norm(images.sum(axis=0) - mix) / np.linalg.norm(mix)
    assert resid < 0.10, f"reconstruction residual {resid:.3f}"

    # permutation-invariant quality: each true image matched by some estimate
    def sdr(ref, est):
        num = float((ref**2).sum())
        den = float(((ref - est) ** 2).sum()) + 1e-12
        return 10 * np.log10(num / den)

    perms = [(0, 1), (1, 0)]
    best = max(
        min(sdr(img1, images[p[0]]), sdr(img2, images[p[1]])) for p in perms
    )
    # mixture-as-estimate scores ~0-4 dB on these pans; demand real separation
    base = min(sdr(img1, mix), sdr(img2, mix))
    assert best > base + 5.0, f"separation SDR {best:.1f} dB vs mixture baseline {base:.1f} dB"


def test_multichannel_three_channels_general_inverse(rng):
    # C=3 exercises the jnp.linalg.inv fallback path
    t = np.arange(3000) / 8000.0
    s1 = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    s2 = np.sin(2 * np.pi * 900 * t).astype(np.float32)
    a1 = np.array([1.0, 0.5, 0.1], np.float32)
    a2 = np.array([0.1, 0.5, 1.0], np.float32)
    mix = a1[:, None] * s1 + a2[:, None] * s2
    images, model = separate_signal(
        jnp.asarray(mix), n_sources=2, n_components=1, n_em=10,
        n_fft=128, hop_length=64, key=jax.random.PRNGKey(2),
    )
    assert np.asarray(images).shape == (2, 3, 3000)
    assert np.all(np.isfinite(np.asarray(images)))
