"""Golden parity: world/dio.py + StoneMask vs float64 WORLD oracles.

The oracles (tests/oracles/world_dio.py) implement DIO and StoneMask's
GetRefinedF0 as published; pyworld itself cannot install here (PARITY.md).
Gates are in cents (bit parity is impossible across float32/float64 and the
static-vs-per-frame FFT grids); measured headroom: DIO median ~0.5 cents,
StoneMask median ~0.45 cents on the bundled speech.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from exemplars_vc_tpu.world.dio import estimate_f0_dio
from exemplars_vc_tpu.world.f0 import refine_f0_stonemask
from tests.oracles.world_dio import dio_oracle, stonemask_refine_oracle

REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def speech():
    import os

    if not os.path.isdir(REF_DATA):
        pytest.skip("reference data not available")
    from exemplars_vc_tpu.io import read_wav

    out = []
    for utt in ("SF1/100001", "TF1/100002"):
        x, sr = read_wav(f"{REF_DATA}/{utt}.wav")
        out.append((utt, np.asarray(x, np.float64), sr))
    return out


def test_dio_matches_oracle(speech):
    for utt, x, sr in speech:
        f0_o, _ = dio_oracle(x, sr)
        f0_j = np.asarray(estimate_f0_dio(jnp.asarray(x, jnp.float32), sr=sr)[0])
        n = min(len(f0_o), len(f0_j))
        f0_o, f0_j = f0_o[:n], f0_j[:n]
        vuv_agree = float(((f0_o > 0) == (f0_j > 0)).mean())
        assert vuv_agree >= 0.90, (utt, vuv_agree)
        both = (f0_o > 0) & (f0_j > 0)
        assert both.sum() > 50
        cents = 1200 * np.abs(np.log2(f0_j[both] / f0_o[both]))
        assert np.median(cents) <= 2.0, (utt, float(np.median(cents)))
        assert np.percentile(cents, 95) <= 25.0, (utt, float(np.percentile(cents, 95)))


def test_stonemask_matches_oracle(speech):
    """Same input contour through both refiners."""
    for utt, x, sr in speech:
        f0_o, pos = dio_oracle(x, sr)
        ref_o = stonemask_refine_oracle(x, sr, f0_o, pos)
        ref_j = np.asarray(
            refine_f0_stonemask(jnp.asarray(x, jnp.float32),
                                jnp.asarray(f0_o, jnp.float32), sr=sr)
        )
        n = min(len(ref_o), len(ref_j))
        m = (ref_o[:n] > 0) & (ref_j[:n] > 0)
        assert m.sum() > 50
        cents = 1200 * np.abs(np.log2(ref_j[:n][m] / ref_o[:n][m]))
        assert np.median(cents) <= 2.0, (utt, float(np.median(cents)))
        assert np.percentile(cents, 95) <= 15.0, (utt, float(np.percentile(cents, 95)))


def test_dio_known_truth_synthetic():
    """Accuracy against a KNOWN contour (vibrato + harmonics + noise):
    DIO within ~15 cents median, StoneMask within ~3 cents."""
    fs = 16000
    t = np.arange(int(fs * 0.8)) / fs
    f_true = 180.0 + 12.0 * np.sin(2 * np.pi * 4.0 * t)
    phase = 2 * np.pi * np.cumsum(f_true) / fs
    rng = np.random.default_rng(0)
    x = sum(np.sin(k * phase) / k for k in range(1, 12))
    x = (x + 0.02 * rng.standard_normal(len(t))).astype(np.float32)

    f0, voiced = estimate_f0_dio(jnp.asarray(x), sr=fs)
    f0 = np.asarray(f0)
    pos = np.arange(len(f0)) * 0.005
    truth = np.interp(pos, t, f_true)
    v = f0 > 0
    assert v.mean() > 0.9                       # nearly fully voiced
    cents = 1200 * np.abs(np.log2(f0[v] / truth[v]))
    assert np.median(cents) <= 15.0, float(np.median(cents))

    ref = np.asarray(refine_f0_stonemask(jnp.asarray(x), jnp.asarray(f0), sr=fs))
    m = ref > 0
    cents_r = 1200 * np.abs(np.log2(ref[m] / truth[m]))
    assert np.median(cents_r) <= 3.0, float(np.median(cents_r))


def test_dio_unvoiced_noise_is_rejected():
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.1 * rng.standard_normal(16000), jnp.float32)
    f0, voiced = estimate_f0_dio(x, sr=16000)
    assert float(np.asarray(voiced).mean()) < 0.3
