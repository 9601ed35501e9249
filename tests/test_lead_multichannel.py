"""Composed multichannel source-F0-filter model (audioModel.py:2551/3016).

EM-consistency and separation-quality tests on synthetic panned stereo
mixtures, mirroring the vendored pyfasst suite's tiny-iteration smoke
pattern plus quantitative checks the reference never had.
"""

import numpy as np
import jax
import jax.numpy as jnp

from exemplars_vc_tpu.separate import (
    fit_multichannel_sf,
    separate_lead_multichannel,
)
from exemplars_vc_tpu.separate.lead import (
    hann_filter_basis,
    harmonic_dictionary,
)
from exemplars_vc_tpu.separate.lead_multichannel import (
    _wiener_images_sf,
    model_power,
)

from tests.test_stereo_simm import _stereo_melody_mixture


def _mixture_stft(x, n_fft=1024, hop=256):
    from exemplars_vc_tpu.dsp.stft import stft

    S = stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop)
    return jnp.transpose(S, (2, 1, 0))  # (F, N, C)


class TestFitMultichannelSF:
    def test_nll_decreases(self):
        x, _, _ = _stereo_melody_mixture(T=8000)
        X = _mixture_stft(x)
        F = X.shape[0]
        f0_grid = 150.0 * 2.0 ** (np.arange(20) / 12.0)
        WF0 = harmonic_dictionary(f0_grid, (F - 1) * 2, 16000.0, 10)
        WGAMMA = hann_filter_basis(F, 10)
        model = fit_multichannel_sf(
            X, WF0, WGAMMA, n_acc_sources=1, n_filters=3,
            n_acc_components=4, n_em=15)
        nll = np.asarray(model.neg_log_like)
        assert np.isfinite(nll).all()
        assert nll[-1] < nll[0]
        # EM on the local Gaussian model is monotone up to float32 noise
        assert np.mean(np.diff(nll) <= abs(nll[0]) * 1e-5) > 0.85

    def test_spatial_covariances_hermitian_normalized(self):
        x, _, _ = _stereo_melody_mixture(T=8000)
        X = _mixture_stft(x)
        F = X.shape[0]
        f0_grid = 150.0 * 2.0 ** (np.arange(12) / 12.0)
        WF0 = harmonic_dictionary(f0_grid, (F - 1) * 2, 16000.0, 8)
        WGAMMA = hann_filter_basis(F, 8)
        model = fit_multichannel_sf(X, WF0, WGAMMA, n_em=5,
                                    n_acc_components=3)
        R = np.asarray(model.R)
        assert np.allclose(R, np.conj(np.swapaxes(R, -1, -2)), atol=1e-5)
        tr = np.real(np.trace(R, axis1=-2, axis2=-1))
        assert np.allclose(tr, 2.0, atol=1e-3)

    def test_wiener_images_reconstruct_mixture(self):
        x, _, _ = _stereo_melody_mixture(T=8000)
        X = _mixture_stft(x)
        F = X.shape[0]
        f0_grid = 150.0 * 2.0 ** (np.arange(12) / 12.0)
        WF0 = harmonic_dictionary(f0_grid, (F - 1) * 2, 16000.0, 8)
        WGAMMA = hann_filter_basis(F, 8)
        model = fit_multichannel_sf(X, WF0, WGAMMA, n_em=10,
                                    n_acc_components=4)
        v = model_power(model, WF0, WGAMMA)
        Y = _wiener_images_sf(X, v, model.R)
        resid = np.asarray(jnp.abs(Y.sum(axis=0) - X))
        scale = float(jnp.abs(X).mean())
        # Wiener images sum to the mixture up to the model-vs-empirical gap
        assert resid.mean() < 0.15 * scale


class TestSeparateLeadMultichannel:
    def test_improves_over_mixture_and_tracks_panning(self):
        x, true_lead, f0s = _stereo_melody_mixture()
        res = separate_lead_multichannel(
            x, sample_rate=16000.0, n_fft=1024, hop_length=256,
            f0_min=150.0, f0_max=500.0, n_harmonics=10, n_accomp=8,
            n_iter_simm=25, n_em=15)
        lead = np.asarray(res.lead, np.float64)
        assert lead.shape == x.shape
        assert np.isfinite(lead).all()

        def snr(est):
            e = est - true_lead
            return 10 * np.log10(np.sum(true_lead ** 2) / np.sum(e ** 2))

        snr_mix = snr(x.astype(np.float64))
        snr_est = snr(lead)
        assert snr_est > snr_mix + 4.0, (snr_mix, snr_est)

        # the lead's estimated spatial direction matches its panning:
        # principal eigenvector of mean R₀ ≈ [cos 0.2, sin 0.2]
        R0 = np.asarray(res.model.R)[0].mean(axis=0)
        w, V = np.linalg.eigh(R0)
        a = V[:, -1]
        a = np.abs(a)  # direction up to phase
        truth = np.array([np.cos(0.2), np.sin(0.2)])
        cos_sim = float(a @ truth / np.linalg.norm(a))
        assert cos_sim > 0.95, (a, cos_sim)

    def test_empirical_spatial_init(self):
        x, true_lead, _ = _stereo_melody_mixture(T=8000)
        res = separate_lead_multichannel(
            x, f0_min=150.0, f0_max=500.0, n_harmonics=10, n_accomp=6,
            n_iter_simm=15, n_em=8, spatial_init="empirical")
        assert np.isfinite(np.asarray(res.lead)).all()
        assert res.accomp.shape == x.shape

    def test_multiple_accompaniment_sources(self):
        x, _, _ = _stereo_melody_mixture(T=8000)
        res = separate_lead_multichannel(
            x, f0_min=150.0, f0_max=500.0, n_harmonics=10, n_accomp=6,
            n_iter_simm=10, n_em=6, n_acc_sources=2)
        assert res.model.W.shape[0] == 2      # two free-NMF sources
        assert res.model.R.shape[0] == 3      # lead + 2 accompaniment
        assert res.lead.shape == x.shape
        assert res.accomp.shape == x.shape    # summed accompaniment images
        nll = np.asarray(res.model.neg_log_like)
        assert nll[-1] < nll[0]
