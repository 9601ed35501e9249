"""MinQT: minimum-Q constrained CQT+linear transform (pyfasst minqt.py:309).

Tests the defining min-Q property, the analysis/adjoint pair, and exact
least-squares invertibility (stronger than pyfasst's approximate icqt)."""

import numpy as np
import pytest

import jax.numpy as jnp

from exemplars_vc_tpu.dsp.minqt import (
    _conv_adjoint,
    _conv_analysis,
    iminqt,
    minqt,
    minqt_plan,
)

SR = 16000


@pytest.fixture(scope="module")
def plan():
    return minqt_plan(SR, bins_per_octave=12, lin_fft=1024)


def test_min_q_property(plan):
    """EVERY bin's Q = f_k·len_k/fs stays at or above the minimum Q
    (up to atom-length rounding of half a sample)."""
    assert plan.q_values.shape == (plan.n_bins,)
    # rounding Nk = round(Q·fs/fk) perturbs Q by at most fk/(2·fs) ≤ 0.5
    assert plan.q_values.min() >= plan.q_min - 0.5
    # linear bins: Q grows with frequency (p ≥ Kmax ≥ Q)
    lin_q = plan.q_values[plan.n_cq :]
    assert (np.diff(lin_q) > 0).all()
    assert lin_q[0] >= plan.q_min


def test_split_frequency_formula(plan):
    """split = 2^(−1/b)·Kmax·fs/N_lin (pyfasst minqt.py:322-324), and the
    linear bins start exactly at Kmax·fs/N_lin."""
    kmax = int(np.ceil(plan.q_min))
    expect = 2.0 ** (-1 / 12) * kmax * SR / plan.lin_fft
    assert abs(plan.split_hz - expect) < 1e-9
    assert abs(plan.freqs_hz[plan.n_cq] - kmax * SR / plan.lin_fft) < 1e-9
    # frequencies ascend across the CQ/linear boundary
    assert (np.diff(plan.freqs_hz) > 0).all()


def test_analysis_shapes(plan):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(4096), jnp.float32)
    C = minqt(x, sr=SR)
    assert C.ndim == 2 and C.shape[1] == plan.n_bins
    assert C.dtype == jnp.complex64
    # batched leading dims
    C2 = minqt(jnp.stack([x, x]), sr=SR)
    assert C2.shape == (2,) + C.shape
    np.testing.assert_allclose(np.asarray(C2[0]), np.asarray(C), rtol=1e-6)


def test_adjoint_identity(plan):
    """<A x, c> == <x, Aᴴ c>: the transposed-conv adjoint is exact."""
    rng = np.random.default_rng(1)
    T = 2048
    kernel = jnp.asarray(plan.kernel)
    x = jnp.asarray(rng.standard_normal((1, T)), jnp.float32)
    Ax = _conv_analysis(x, kernel, plan.hop)
    c = jnp.asarray(rng.standard_normal(Ax.shape), jnp.float32)
    lhs = float(jnp.sum(Ax * c))
    rhs = float(jnp.sum(x * _conv_adjoint(c, kernel, plan.hop, T)))
    assert abs(lhs - rhs) <= 1e-3 * max(abs(lhs), 1.0)


def test_sine_peaks_at_matching_bin(plan):
    """A pure tone's energy concentrates at the nearest center frequency, in
    both the CQ and the linear region."""
    t = np.arange(8192) / SR
    for f_target in (110.0, 2000.0):
        x = jnp.asarray(np.sin(2 * np.pi * f_target * t), jnp.float32)
        mag = np.abs(np.asarray(minqt(x, sr=SR)))[4:-4]   # interior frames
        k_peak = int(mag.mean(axis=0).argmax())
        f_peak = plan.freqs_hz[k_peak]
        assert abs(np.log2(f_peak / f_target)) < 1.5 / 12, (f_target, f_peak)


def test_exact_inverse_in_band():
    """Least-squares inverse reconstructs in-band signals: SNR > 40 dB on the
    interior (edges lack frame coverage by construction)."""
    rng = np.random.default_rng(2)
    T = 4096
    t = np.arange(T) / SR
    x = np.zeros(T)
    for f in (90.0, 220.0, 700.0, 1500.0, 3300.0, 6100.0):
        x += rng.uniform(0.3, 1.0) * np.sin(2 * np.pi * f * t + rng.uniform(0, 6))
    x = x.astype(np.float32)
    C = minqt(jnp.asarray(x), sr=SR)
    y = np.asarray(iminqt(C, length=T, sr=SR))
    lo, hi = 1024, T - 1024
    err = x[lo:hi] - y[lo:hi]
    snr = 10 * np.log10(np.sum(x[lo:hi] ** 2) / max(np.sum(err**2), 1e-20))
    assert snr > 40.0, snr
