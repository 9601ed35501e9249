"""Golden parity: world/harvest.py vs the float64 Harvest oracle.

The oracle (tests/oracles/world_harvest.py) implements Harvest as published
(Morise, INTERSPEECH 2017); pyworld itself cannot install here (PARITY.md).
Gates are in cents (bit parity is impossible across float32/float64 and the
static-vs-per-frame FFT grids); measured headroom on the bundled speech:
median ~0.7 cents, VUV agreement ~0.97.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from exemplars_vc_tpu.world.harvest import estimate_f0_harvest
from tests.oracles.world_harvest import harvest_oracle

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
        out.append((utt, np.asarray(x[: 2 * sr], np.float64), sr))
    return out


def test_harvest_matches_oracle(speech):
    for utt, x, sr in speech:
        f0_o, _ = harvest_oracle(x, sr)
        f0_j = np.asarray(
            estimate_f0_harvest(jnp.asarray(x, jnp.float32), sr=sr)[0])
        n = min(len(f0_o), len(f0_j))
        f0_o, f0_j = f0_o[:n], f0_j[:n]
        vuv_agree = float(((f0_o > 0) == (f0_j > 0)).mean())
        assert vuv_agree >= 0.90, (utt, vuv_agree)
        both = (f0_o > 0) & (f0_j > 0)
        assert both.sum() > 50
        cents = 1200 * np.abs(np.log2(f0_j[both] / f0_o[both]))
        assert np.median(cents) <= 2.0, (utt, float(np.median(cents)))
        # the tail is onset frames where candidate selection legitimately
        # differs across float32/float64 (both contours unstable there)
        assert np.percentile(cents, 75) <= 25.0, (
            utt, float(np.percentile(cents, 75)))


@pytest.mark.parametrize("case", ["steady", "glide", "vibrato", "weak"])
def test_harvest_known_truth(case):
    """Accuracy against KNOWN contours — harvest's selling point is the
    weak-fundamental case (gross errors where interval methods octave-trap)."""
    fs = 16000
    T = int(0.8 * fs)
    t = np.arange(T) / fs
    rng = np.random.default_rng(0)
    if case == "steady":
        f_true = np.full(T, 120.0)
    elif case == "glide":
        f_true = 100.0 * 3.0 ** (t / t[-1])
    elif case == "vibrato":
        f_true = 180.0 + 12.0 * np.sin(2 * np.pi * 5.0 * t)
    else:
        f_true = np.full(T, 200.0)
    phase = 2 * np.pi * np.cumsum(f_true) / fs
    if case == "weak":
        x = sum(np.sin(k * phase) for k in range(2, 7)) + 0.2 * np.sin(phase)
    else:
        x = sum(np.sin(k * phase) / k for k in range(1, 7))
    x = (x + 0.01 * rng.standard_normal(T)).astype(np.float32)

    f0, voiced = estimate_f0_harvest(jnp.asarray(x), sr=fs)
    f0 = np.asarray(f0)
    pos = np.arange(len(f0)) * 0.005
    truth = np.interp(pos, t, f_true)
    v = f0 > 0
    assert v.mean() > 0.9, (case, v.mean())
    cents = 1200 * np.abs(np.log2(f0[v] / truth[v]))
    assert np.median(cents) <= 3.0, (case, float(np.median(cents)))
    assert (cents > 100).mean() <= 0.05, (case, float((cents > 100).mean()))


def test_harvest_unvoiced_noise_is_rejected():
    rng = np.random.default_rng(1)
    x = jnp.asarray(0.1 * rng.standard_normal(16000), jnp.float32)
    f0, voiced = estimate_f0_harvest(x, sr=16000)
    assert float(np.asarray(voiced).mean()) < 0.3


def test_harvest_through_analyze():
    """f0_method='harvest' wires through the analysis pipeline."""
    from exemplars_vc_tpu.world import analyze

    fs = 16000
    t = np.arange(int(0.5 * fs)) / fs
    x = sum(np.sin(2 * np.pi * 150.0 * k * t) / k for k in range(1, 6))
    feats = analyze(jnp.asarray(x, jnp.float32), sr=fs, f0_method="harvest")
    f0 = np.asarray(feats.f0)
    v = f0 > 0
    assert v[5:-5].mean() > 0.9
    assert abs(np.median(f0[v]) - 150.0) / 150.0 < 0.02
