"""MVDR beamforming + directivity diagrams (pyfasst spatial/dirdiag parity).

Physics-based checks: distortionless response toward the target, deep nulls
on interferers, and diagram geometry (peak at the steered angle).
"""

import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.separate.beamform import (
    apply_beamformer,
    directivity_diagram,
    mvdr_filter,
    ula_steering,
)

FREQS = np.linspace(100.0, 7900.0, 64)


def test_steering_vector_geometry():
    a = np.asarray(ula_steering(jnp.asarray([0.0, np.pi / 4]), jnp.asarray(FREQS),
                                n_sensors=3))
    assert a.shape == (2, 64, 3)
    # broadside (θ=0): zero delay → all sensors in phase
    np.testing.assert_allclose(a[0], np.ones_like(a[0]), atol=1e-6)
    # unit modulus everywhere
    np.testing.assert_allclose(np.abs(a[1]), 1.0, atol=1e-6)


def test_mvdr_distortionless_and_nulls():
    th_t, th_i = 0.3, -0.7
    at = ula_steering(jnp.asarray([th_t]), jnp.asarray(FREQS))[0]
    ai = ula_steering(jnp.asarray([th_i]), jnp.asarray(FREQS))
    w = mvdr_filter(at, ai, diag_load=1e-6)
    # unit gain toward the target at every frequency
    g_t = np.asarray(jnp.einsum("fc,fc->f", jnp.conj(w), at))
    np.testing.assert_allclose(g_t.real, 1.0, atol=1e-4)
    np.testing.assert_allclose(g_t.imag, 0.0, atol=1e-4)
    # strong suppression of the interferer direction (skip lowest freqs where
    # a 2-sensor array can't resolve the angles)
    g_i = np.abs(np.asarray(jnp.einsum("fc,tfc->tf", jnp.conj(w), ai)))[0]
    assert np.median(g_i[8:]) < 1e-2


def test_directivity_diagram_peaks_at_target():
    th_t = 0.5
    at = ula_steering(jnp.asarray([th_t]), jnp.asarray(FREQS))[0]
    w = mvdr_filter(at)
    thetas, diag = directivity_diagram(w, jnp.asarray(FREQS), n_thetas=181)
    diag = np.asarray(diag)
    assert diag.shape == (181, len(FREQS))
    # below the spatial-aliasing frequency (d ≤ λ/2 → f ≤ c/2d ≈ 1133 Hz) the
    # target angle attains the maximum response, and that response is ≈ 0 dB
    k = int(np.argmin(np.abs(FREQS - 1000.0)))
    tgt = int(np.argmin(np.abs(np.asarray(thetas) - th_t)))
    assert diag[tgt, k] >= diag[:, k].max() - 1e-3
    assert abs(float(diag[tgt, k])) < 0.1  # distortionless → 0 dB toward target


def test_apply_beamformer_recovers_target_from_mixture():
    rng = np.random.default_rng(0)
    F_, N = len(FREQS), 50
    at = np.asarray(ula_steering(jnp.asarray([0.4]), jnp.asarray(FREQS)))[0]
    ai = np.asarray(ula_steering(jnp.asarray([-0.9]), jnp.asarray(FREQS)))[0]
    s = (rng.standard_normal((F_, N)) + 1j * rng.standard_normal((F_, N)))
    v = (rng.standard_normal((F_, N)) + 1j * rng.standard_normal((F_, N)))
    X = s[..., None] * at[:, None, :] + v[..., None] * ai[:, None, :]
    w = mvdr_filter(jnp.asarray(at), jnp.asarray(ai)[None], diag_load=1e-6)
    y = np.asarray(apply_beamformer(w, jnp.asarray(X)))
    # beamformed output ≈ target source (interferer nulled), away from the
    # unresolvable lowest frequencies
    err = np.linalg.norm(y[8:] - s[8:]) / np.linalg.norm(s[8:])
    assert err < 0.05


def test_mvdr_accepts_single_interferer_as_2d():
    at = ula_steering(jnp.asarray([0.3]), jnp.asarray(FREQS))[0]
    ai3 = ula_steering(jnp.asarray([-0.7]), jnp.asarray(FREQS))
    w2 = mvdr_filter(at, ai3[0], diag_load=1e-6)   # (F, C) single interferer
    w3 = mvdr_filter(at, ai3, diag_load=1e-6)      # documented (1, F, C)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w3), atol=1e-6)
