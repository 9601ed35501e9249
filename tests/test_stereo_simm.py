"""Stereo SIMM: float64-oracle trajectory parity + separation quality.

The oracle (``tests/oracles/stereo_simm.py``) implements the reference's
``SIMM.py:397`` Stereo_SIMM update schedule in float64; the JAX module must
track it. Separation quality is checked on a synthetic panned
melody+accompaniment stereo mixture with known ground truth.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exemplars_vc_tpu.separate import separate_lead_stereo, stereo_simm
from exemplars_vc_tpu.separate.lead import (
    hann_filter_basis,
    harmonic_dictionary,
)

from tests.oracles.stereo_simm import stereo_simm_oracle


def _tiny_problem(seed=0, F=33, N=12, NF0=8, P=6, K=3, R=4):
    rng = np.random.default_rng(seed)
    f0_grid = 100.0 * 2.0 ** (np.arange(NF0) / 12.0)
    WF0 = np.asarray(harmonic_dictionary(f0_grid, (F - 1) * 2, 2000.0,
                                         n_harmonics=5), np.float64)
    WGAMMA = np.asarray(hann_filter_basis(F, P), np.float64)
    inits = dict(
        HGAMMA=np.abs(rng.standard_normal((P, K))),
        HPHI=np.abs(rng.standard_normal((K, N))),
        HF0=np.abs(rng.standard_normal((NF0, N))),
        WM=np.abs(rng.standard_normal((F, R))),
        HM=np.abs(rng.standard_normal((R, N))),
    )
    bR = rng.uniform(size=R)
    beta = np.stack([bR, 1.0 - bR])
    SXR = np.abs(rng.standard_normal((F, N))) ** 2 + 0.1
    SXL = np.abs(rng.standard_normal((F, N))) ** 2 + 0.1
    return SXR, SXL, WF0, WGAMMA, inits, beta


class TestStereoSIMMOracleParity:
    @pytest.mark.parametrize("update_hgamma", [True, False])
    def test_trajectory_matches_float64_oracle(self, update_hgamma):
        SXR, SXL, WF0, WGAMMA, inits, beta = _tiny_problem()
        n_iter = 6
        ref = stereo_simm_oracle(SXR, SXL, WF0, WGAMMA, n_iter=n_iter,
                                 beta=beta, update_hgamma=update_hgamma,
                                 **inits)
        got = stereo_simm(
            SXR, SXL, WF0, WGAMMA, n_filters=inits["HGAMMA"].shape[1],
            n_accomp=inits["WM"].shape[1], n_iter=n_iter,
            update_hgamma=update_hgamma,
            HGAMMA_init=inits["HGAMMA"], HPHI_init=inits["HPHI"],
            HF0_init=inits["HF0"], WM_init=inits["WM"], HM_init=inits["HM"],
            beta_init=beta)
        for name in ("alpha", "beta", "HGAMMA", "HPHI", "HF0", "WM", "HM"):
            r = np.asarray(ref[name])
            g = np.asarray(getattr(got, name))
            scale = max(np.abs(r).max(), 1e-12)
            err = np.abs(g - r).max() / scale
            assert err < 5e-3, f"{name}: rel err {err}"
        # IS error trace agrees too
        assert np.allclose(np.asarray(got.is_error), ref["is_error"],
                           rtol=1e-3), (got.is_error, ref["is_error"])

    def test_is_error_decreases(self):
        SXR, SXL, WF0, WGAMMA, inits, beta = _tiny_problem(seed=3)
        got = stereo_simm(SXR, SXL, WF0, WGAMMA,
                          n_filters=3, n_accomp=4, n_iter=25,
                          beta_init=beta, **{
                              k + "_init": v for k, v in inits.items()})
        errs = np.asarray(got.is_error)
        assert errs[-1] < errs[0]
        # overwhelmingly monotone (MU + damped gain updates)
        assert np.mean(np.diff(errs) <= 1e-6 * abs(errs[0])) > 0.9

    def test_alpha_beta_normalized(self):
        SXR, SXL, WF0, WGAMMA, inits, beta = _tiny_problem(seed=5)
        got = stereo_simm(SXR, SXL, WF0, WGAMMA, n_filters=3, n_accomp=4,
                          n_iter=10, beta_init=beta,
                          **{k + "_init": v for k, v in inits.items()})
        assert np.isclose(float(got.alpha.sum()), 1.0, atol=1e-5)
        assert np.allclose(np.asarray(got.beta).sum(axis=0), 1.0, atol=1e-5)


def _stereo_melody_mixture(sr=16000, T=16000, pan_lead=0.2, pan_acc=0.7,
                           seed=0):
    """Panned harmonic melody + panned chordal accompaniment.

    The accompaniment is the musical (low-rank) kind the SIMM model
    targets: a sustained triad with mild vibrato plus light noise. (An
    unstructured broadband-noise accompaniment defeats the comb-dictionary
    model in both this implementation and the reference's.)
    """
    rng = np.random.default_rng(seed)
    t = np.arange(T) / sr
    # melody: 3-note line, rich harmonics
    f0s = [220.0, 277.2, 246.9]
    seg = T // len(f0s)
    lead = np.zeros(T)
    for i, f0 in enumerate(f0s):
        sl = slice(i * seg, (i + 1) * seg if i < len(f0s) - 1 else T)
        for h in range(1, 9):
            lead[sl] += (1.0 / h) * np.sin(2 * np.pi * h * f0 * t[sl])
    lead /= np.abs(lead).max()
    acc = np.zeros(T)
    for f in (98.0, 123.5, 147.0):
        for h in range(1, 6):
            acc += (0.7 / h) * np.sin(
                2 * np.pi * h * f * t + 0.3 * np.sin(2 * np.pi * 0.9 * t))
    acc += 0.05 * rng.standard_normal(T)
    acc /= np.abs(acc).max()
    x = np.stack([
        np.cos(pan_lead) * lead + np.cos(pan_acc) * acc,
        np.sin(pan_lead) * lead + np.sin(pan_acc) * acc,
    ]).astype(np.float32)
    true_lead = np.stack([np.cos(pan_lead) * lead, np.sin(pan_lead) * lead])
    return x, true_lead, f0s


class TestSeparateLeadStereo:
    def test_separates_panned_melody(self):
        x, true_lead, f0s = _stereo_melody_mixture()
        res = separate_lead_stereo(
            x, sample_rate=16000.0, n_fft=1024, hop_length=256,
            f0_min=150.0, f0_max=500.0, n_iter=25, n_accomp=8,
            n_harmonics=10)
        lead = np.asarray(res.lead, np.float64)
        assert lead.shape == x.shape
        # mixture SNR of the lead source vs its stereo image estimate
        mix_err = x.astype(np.float64) - true_lead
        est_err = lead - true_lead
        snr_mix = 10 * np.log10(np.sum(true_lead ** 2) / np.sum(mix_err ** 2))
        snr_est = 10 * np.log10(np.sum(true_lead ** 2) / np.sum(est_err ** 2))
        assert snr_est > snr_mix + 5.0, (snr_mix, snr_est)
        # the melody should be recovered on voiced frames (within a semitone)
        voiced = res.f0 > 0
        assert voiced.mean() > 0.5
        # each frame's true f0: piecewise constant
        hop, n_fft = 256, 1024
        centers = np.arange(len(res.f0)) * hop
        seg = x.shape[1] // len(f0s)
        true_f0 = np.asarray(f0s)[np.minimum(centers // seg, len(f0s) - 1)]
        cents = 1200 * np.abs(np.log2(res.f0[voiced] / true_f0[voiced]))
        assert np.median(cents) < 100, np.median(cents)

    def test_alpha_tracks_lead_panning(self):
        # lead toward ch0, accomp toward ch1 → alphaR > alphaL; the
        # mirrored mixture must flip the ordering
        x, _, _ = _stereo_melody_mixture(pan_lead=0.2, pan_acc=0.7)
        res = separate_lead_stereo(x, n_iter=25, f0_min=150.0, f0_max=500.0,
                                   n_accomp=8, n_harmonics=10)
        alpha = np.asarray(res.model.alpha)
        assert alpha[0] > alpha[1], alpha

        pi2 = np.pi / 2
        xm, _, _ = _stereo_melody_mixture(pan_lead=pi2 - 0.2,
                                          pan_acc=pi2 - 0.7)
        resm = separate_lead_stereo(xm, n_iter=25, f0_min=150.0,
                                    f0_max=500.0, n_accomp=8, n_harmonics=10)
        alpham = np.asarray(resm.model.alpha)
        assert alpham[1] > alpham[0], alpham

    def test_mono_input_promoted(self):
        x, _, _ = _stereo_melody_mixture()
        res = separate_lead_stereo(x[0], n_iter=5, f0_min=150.0,
                                   f0_max=500.0, n_accomp=4)
        assert res.lead.shape[0] == 2


class TestHarmonicDictionaryVariants:
    """KLGLOTT88 source + chirped atoms (pyfasst generate_WF0_chirped)."""

    def test_klglott88_amplitudes_decay_and_convergence(self):
        from exemplars_vc_tpu.separate.lead import klglott88_amplitudes

        a = klglott88_amplitudes(10)
        # ODGD (flow DERIVATIVE) at Ot=0.5 peaks at h=2, then rolls off —
        # matches the reference's analytic generate_ODGD_spec shape
        assert np.argmax(a) == 1
        assert a[0] > 0.8                        # h=1 close behind
        assert np.all(np.diff(a[1:]) < 0)        # monotone after the peak
        a2 = klglott88_amplitudes(10, oversample=16384)
        assert np.abs(a - a2).max() < 1e-4       # oversampling converged

    def test_chirped_dictionary_shapes_and_widths(self):
        f0g = 100 * 2.0 ** (np.arange(6) / 12.0)
        W = np.asarray(harmonic_dictionary(f0g, 1024, 16000.0, 8,
                                           chirp_per_f0=3))
        assert W.shape == (513, 18)
        assert np.allclose(W.sum(axis=0), 1.0, atol=1e-5)
        # later chirp variants spread energy over more bins (flatter columns)
        peak0 = W[:, 0].max()
        peak2 = W[:, 2].max()
        assert peak2 < peak0

    def test_klglott88_source_separates_melody(self):
        from exemplars_vc_tpu.separate.lead import hann_filter_basis
        from exemplars_vc_tpu.separate.stereo_simm import stereo_simm

        x, true_lead, _ = _stereo_melody_mixture(T=8000)
        from exemplars_vc_tpu.dsp.stft import stft
        import jax.numpy as jnp

        S = stft(jnp.asarray(x), n_fft=1024, hop_length=256)
        X = jnp.transpose(S, (0, 2, 1))
        SXR = jnp.maximum(jnp.abs(X[0]) ** 2, 1e-20)
        SXL = jnp.maximum(jnp.abs(X[1]) ** 2, 1e-20)
        sc = 0.5 * (SXR.mean() + SXL.mean())
        n_steps = 40
        f0g = 150.0 * 2.0 ** (np.arange(n_steps) / 24.0)
        WF0 = harmonic_dictionary(f0g, 1024, 16000.0, 10, source="klglott88")
        WG = hann_filter_basis(513, 10)
        m = stereo_simm(SXR / sc, SXL / sc, WF0, WG, n_filters=3,
                        n_accomp=6, n_iter=15)
        errs = np.asarray(m.is_error)
        assert np.isfinite(errs).all() and errs[-1] < errs[0]

