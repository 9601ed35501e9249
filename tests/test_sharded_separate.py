import jax
import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.dsp.stft import stft
from exemplars_vc_tpu.parallel.mesh import make_mesh
from exemplars_vc_tpu.parallel.sharded_separate import separate_batch
from exemplars_vc_tpu.separate import fit_multichannel_nmf


def _mixture_batch(M=4, T=2400, sr=8000, seed=0):
    """M stereo mixtures of two panned tones with per-mixture frequencies."""
    rng = np.random.default_rng(seed)
    mixes = []
    for m in range(M):
        t = np.arange(T) / sr
        f1, f2 = rng.uniform(150, 400), rng.uniform(800, 1600)
        s1 = np.sin(2 * np.pi * f1 * t).astype(np.float32)
        s2 = np.sin(2 * np.pi * f2 * t).astype(np.float32)
        mixes.append(np.array([[1.0], [0.2]]) * s1 + np.array([[0.2], [1.0]]) * s2)
    X = [np.transpose(np.asarray(stft(jnp.asarray(mx, jnp.float32),
                                      n_fft=128, hop_length=64)), (2, 1, 0))
         for mx in mixes]
    return jnp.stack([jnp.asarray(x) for x in X])   # (M, F, N, C)


def test_separate_batch_runs_sharded_over_mesh():
    X = _mixture_batch(M=8)
    mesh = make_mesh(data=8, dict_=1)
    images, nll = separate_batch(X, n_sources=2, n_components=2, n_em=8,
                                 key=jax.random.PRNGKey(0), mesh=mesh)
    assert images.shape == (8, 2) + X.shape[1:]
    nll = np.asarray(nll)
    assert nll.shape == (8, 8)
    # EM improves every mixture independently
    assert (nll[:, -1] < nll[:, 0]).all()
    # mixtures are independent: each source-image pair sums back to its mix
    resid = np.abs(np.asarray(jnp.abs(images.sum(axis=1) - X)))
    scale = np.abs(np.asarray(jnp.abs(X))).max()
    assert resid.max() < 0.15 * scale


def test_separate_batch_matches_single_mixture_path():
    """Batch row 0 must equal fitting that mixture alone with the same init
    (vmap + sharding change the schedule, not the math)."""
    X = _mixture_batch(M=2, seed=3)
    key = jax.random.PRNGKey(7)
    mesh = make_mesh(data=2, dict_=1)
    images, nll = separate_batch(X, n_sources=2, n_components=2, n_em=6,
                                 key=key, mesh=mesh)

    # reproduce row-0 inits exactly as separate_batch builds them
    from exemplars_vc_tpu.separate.multichannel import random_spatial_init

    M, F, N, C = X.shape
    kw, kh, kr = jax.random.split(key, 3)
    W0 = (jax.random.normal(kw, (M, 2, F, 2)) ** 2)[0]
    H0 = (jax.random.normal(kh, (M, 2, 2, N)) ** 2)[0]
    R0 = random_spatial_init(jax.random.split(kr, M)[0], 2, F, C)

    single = fit_multichannel_nmf(X[0], n_sources=2, n_components=2, n_em=6,
                                  W_init=W0, H_init=H0, R_init=R0)
    np.testing.assert_allclose(np.asarray(nll)[0], np.asarray(single.neg_log_like),
                               rtol=2e-4)
