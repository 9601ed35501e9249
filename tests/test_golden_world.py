"""Golden parity: world/ vs float64 oracles of WORLD's algorithms.

pyworld cannot install in this image (PARITY.md records the evidence); the
oracles in tests/oracles/ are standalone float64 ports of the published
WORLD algorithms. These tests fail if world/cheaptrick.py drifts from the
reference algorithm (``pw.cheaptrick`` at ``03_a_b_r_parallel.py:94``).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from exemplars_vc_tpu.world.cheaptrick import cheaptrick, world_fft_size
from tests.oracles.make_goldens import W_FFT, W_HOP_MS, WORLD_UTTS

GOLDENS = os.path.join(
    os.path.dirname(__file__), "goldens", "world_cheaptrick_oracle.npz"
)
REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def goldens():
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference data not available")
    return np.load(GOLDENS)


def _lsd_db(a, b):
    return np.sqrt(
        np.mean((10 * np.log10(a + 1e-30) - 10 * np.log10(b + 1e-30)) ** 2, axis=-1)
    )


def test_world_default_fft_size():
    # WORLD: 2^(1+floor(log2(3*fs/f0_floor+1))) = 1024 for fs=16k, floor=71
    assert world_fft_size(16000, 71.0) == 1024


def test_cheaptrick_matches_world_oracle(goldens):
    """Log-spectral distortion vs the float64 WORLD oracle <= 0.1 dB on every
    golden frame of every utterance (measured headroom ~0.0004 dB max)."""
    from exemplars_vc_tpu.io import read_wav

    for spk, name in WORLD_UTTS:
        key = f"{spk}_{name}"
        x, sr = read_wav(os.path.join(REF_DATA, spk, name + ".wav"))
        f0 = goldens[f"{key}_f0"]
        sel = goldens[f"{key}_sel"]
        hop = int(round(sr * W_HOP_MS / 1000.0))
        centers = np.arange(len(f0)) * hop
        env = np.asarray(
            cheaptrick(
                jnp.asarray(x, jnp.float32), jnp.asarray(f0, jnp.float32),
                jnp.asarray(centers), sr=sr, fft_size=W_FFT,
            )
        )[sel]
        lsd = _lsd_db(env, goldens[f"{key}_sp"].astype(np.float64))
        assert lsd.max() <= 0.1, f"{key}: max LSD {lsd.max():.4f} dB"


def test_cheaptrick_golden_reproducible(goldens):
    """Re-running the float64 oracle on a few frames reproduces the stored
    golden (deterministic float64 numpy)."""
    from exemplars_vc_tpu.io import read_wav
    from tests.oracles.world_cheaptrick import cheaptrick_oracle

    spk, name = WORLD_UTTS[0]
    key = f"{spk}_{name}"
    x, sr = read_wav(os.path.join(REF_DATA, spk, name + ".wav"))
    f0 = goldens[f"{key}_f0"]
    sel = goldens[f"{key}_sel"][:3]
    hop = int(round(sr * W_HOP_MS / 1000.0))
    env = cheaptrick_oracle(
        np.asarray(x, np.float64), sr, f0[sel], sel * hop / sr, fft_size=W_FFT
    )
    np.testing.assert_allclose(
        env.astype(np.float32), goldens[f"{key}_sp"][:3], rtol=1e-6, atol=0
    )


def test_cheaptrick_unvoiced_uses_default_f0(goldens):
    """WORLD semantics: f0 <= floor (incl. unvoiced 0) analyzes at
    kDefaultF0 = 500 Hz — envelope equals an explicit 500 Hz call."""
    from exemplars_vc_tpu.io import read_wav

    spk, name = WORLD_UTTS[0]
    x, sr = read_wav(os.path.join(REF_DATA, spk, name + ".wav"))
    xj = jnp.asarray(x, jnp.float32)
    centers = jnp.asarray(np.arange(10) * 80 + 8000)
    e0 = np.asarray(cheaptrick(xj, jnp.zeros(10), centers, sr=sr, fft_size=W_FFT))
    e500 = np.asarray(
        cheaptrick(xj, jnp.full(10, 500.0), centers, sr=sr, fft_size=W_FFT)
    )
    np.testing.assert_allclose(e0, e500, rtol=1e-6)
