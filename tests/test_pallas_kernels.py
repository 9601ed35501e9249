"""Pallas kernels validated in interpreter mode against the XLA/scan
implementations (compiled-mode parity is exercised on real TPU by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplars_vc_tpu.align.dtw import _skew, dtw, pairwise_sqdist
from exemplars_vc_tpu.align.dtw_pallas import dtw_wavefront_pallas, fits_vmem
from exemplars_vc_tpu.factorize.nmf import nmf_activations
from exemplars_vc_tpu.factorize.nmf_pallas import nmf_activations_pallas


def test_nmf_pallas_matches_xla():
    rng = np.random.default_rng(0)
    F, K, D = 40, 130, 25   # deliberately unaligned → exercises padding
    A = np.abs(rng.standard_normal((K, D))).astype(np.float32)
    X = np.abs(rng.standard_normal((F, D))).astype(np.float32)
    ref = nmf_activations(jnp.asarray(X), jnp.asarray(A), tol=0.0, max_iter=40)
    got = nmf_activations_pallas(
        jnp.asarray(X), jnp.asarray(A), tol=0.0, max_iter=40,
        tile_f=8, tile_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got.H), np.asarray(ref.H), rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(got.error), float(ref.error), rtol=1e-3)


def test_nmf_pallas_early_stop_matches():
    rng = np.random.default_rng(1)
    A = np.abs(rng.standard_normal((64, 16))).astype(np.float32)
    X = np.abs(rng.standard_normal((24, 16))).astype(np.float32)
    ref = nmf_activations(jnp.asarray(X), jnp.asarray(A), tol=1e-2, max_iter=150)
    got = nmf_activations_pallas(
        jnp.asarray(X), jnp.asarray(A), tol=1e-2, max_iter=150,
        tile_f=8, tile_k=64, interpret=True,
    )
    assert int(got.n_iter) == int(ref.n_iter)


def _skewed(a, b):
    C = pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    return _skew(C)


def test_dtw_pallas_matches_scan():
    rng = np.random.default_rng(2)
    N = 3
    T = 48
    fa = rng.standard_normal((N, T, 4)).astype(np.float32)
    fb = rng.standard_normal((N, T, 4)).astype(np.float32)
    lens = np.stack([
        np.array([48, 30, 17], np.int32), np.array([48, 41, 23], np.int32)
    ], axis=1)

    sk = jnp.stack([
        _skewed(fa[i], fb[i]) for i in range(N)
    ])
    cost, dirs = dtw_wavefront_pallas(sk, jnp.asarray(lens), interpret=True)

    for i in range(N):
        ref = dtw(jnp.asarray(fa[i]), jnp.asarray(fb[i]),
                  len_a=lens[i, 0], len_b=lens[i, 1])
        assert abs(float(cost[i]) - float(ref.raw_distance)) < 1e-2, i
        # directions must reproduce the same optimal path via the shared
        # backtrace
        from exemplars_vc_tpu.align.dtw import _backtrace

        pi, pj, pl_ = _backtrace(
            dirs[i].astype(jnp.int8), jnp.int32(lens[i, 0]), jnp.int32(lens[i, 1]),
            2 * T - 1,
        )
        assert int(pl_) == int(ref.path_len)
        np.testing.assert_array_equal(
            np.asarray(pi[: int(pl_)]), np.asarray(ref.path_i[: int(ref.path_len)])
        )


def test_fits_vmem():
    assert fits_vmem(704, 871)
    assert not fits_vmem(4096, 4096)


def test_nmf_pallas_fused_matches_xla():
    rng = np.random.default_rng(3)
    F, K, D = 16, 256, 25
    A = np.abs(rng.standard_normal((K, D))).astype(np.float32)
    X = np.abs(rng.standard_normal((F, D))).astype(np.float32)
    ref = nmf_activations(jnp.asarray(X), jnp.asarray(A), tol=0.0, max_iter=30)
    got = nmf_activations_pallas(
        jnp.asarray(X), jnp.asarray(A), tol=0.0, max_iter=30,
        tile_f=8, tile_k=128, interpret=True, fused=True,
    )
    np.testing.assert_allclose(np.asarray(got.H), np.asarray(ref.H), rtol=2e-3, atol=1e-5)


def test_gl_pallas_matches_projection_oracle():
    """The fused GL kernel (interpret mode) must reproduce, iteration for
    iteration, the pure-jnp center=False consistency projection + fast-GL
    momentum updates (griffin_lim_pallas.project_nocenter_reference)."""
    from exemplars_vc_tpu.dsp.griffin_lim_pallas import (
        gl_angles_fused,
        project_nocenter_reference,
        supports,
    )

    rng = np.random.default_rng(5)
    F, n_fft, hop = 12, 32, 8
    nb = n_fft // 2 + 1
    assert supports(F, n_fft, hop)
    mag = jnp.asarray(np.abs(rng.standard_normal((F, nb))), jnp.float32)
    ang = jnp.asarray(
        np.exp(2j * np.pi * rng.random((F, nb))).astype(np.complex64))
    mom = 0.9 / 1.9
    a, prev = ang, jnp.zeros_like(ang)
    for _ in range(6):
        reb = project_nocenter_reference(mag * a, n_fft, hop)
        t = reb - mom * prev
        prev = reb
        a = t / jnp.maximum(jnp.abs(t), 1e-16)
    got = gl_angles_fused(mag, ang, n_fft, hop, n_iter=6, momentum=0.9,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a),
                               rtol=1e-4, atol=1e-5)


def test_gl_pallas_projection_matches_istft_stft():
    """The kernel's center=False projection must equal the library
    istft→stft round trip under the same (center=False) convention — i.e.
    the fused loop optimizes a true STFT-consistency projection, not an
    arbitrary linear map."""
    from exemplars_vc_tpu.dsp.griffin_lim_pallas import (
        project_nocenter_reference,
    )
    from exemplars_vc_tpu.dsp.stft import istft, stft

    rng = np.random.default_rng(6)
    F, n_fft, hop = 10, 40, 8
    nb = n_fft // 2 + 1
    spec = jnp.asarray(
        (rng.standard_normal((F, nb)) + 1j * rng.standard_normal((F, nb))
         ).astype(np.complex64))
    got = project_nocenter_reference(spec, n_fft, hop)
    y = istft(spec, n_fft=n_fft, hop_length=hop, center=False)
    ref = stft(y, n_fft=n_fft, hop_length=hop, center=False)[:F]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)


def test_gl_pallas_quality_parity_with_xla_gl():
    """End-to-end: phases from the fused kernel must reconstruct the target
    magnitude as well as the XLA griffin_lim at the same budget (edge
    projections differ; interior fixed points coincide)."""
    from exemplars_vc_tpu.dsp.griffin_lim import griffin_lim
    from exemplars_vc_tpu.dsp.griffin_lim_pallas import gl_angles_fused
    from exemplars_vc_tpu.dsp.stft import istft, stft

    rng = np.random.default_rng(7)
    n_fft, hop = 64, 16
    # a real-ish magnitude: STFT of a harmonic signal
    t = np.arange(4096) / 16000.0
    x = np.sin(2 * np.pi * 220 * t) + 0.4 * np.sin(2 * np.pi * 440 * t)
    mag = jnp.abs(stft(jnp.asarray(x, jnp.float32), n_fft=n_fft,
                       hop_length=hop))
    F = mag.shape[0]
    ang0 = jnp.asarray(
        np.exp(2j * np.pi * rng.random(mag.shape)).astype(np.complex64))

    def sc(y):
        m = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop))[:F]
        return float(jnp.linalg.norm(m - mag) / jnp.linalg.norm(mag))

    y_x = griffin_lim(mag, n_fft=n_fft, hop_length=hop, n_iter=30,
                      momentum=0.9, init_phase=ang0)
    a_p = gl_angles_fused(mag, ang0, n_fft, hop, n_iter=30, momentum=0.9,
                          interpret=True)
    y_p = istft(mag * a_p, n_fft=n_fft, hop_length=hop)
    assert np.isfinite(np.asarray(y_p)).all()
    assert sc(y_p) < 1.3 * sc(y_x) + 0.02, (sc(y_p), sc(y_x))
