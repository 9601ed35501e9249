import os

import numpy as np
import pytest

from exemplars_vc_tpu.config import load_config
from exemplars_vc_tpu.pipelines.stream import StreamingConverter

DATA = "/root/reference/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(DATA, "SF1")), reason="reference data missing"
)


def _dicts():
    rng = np.random.default_rng(0)
    K, D = 256, 201
    A = np.abs(rng.standard_normal((K, D))).astype(np.float32)
    B = np.abs(rng.standard_normal((K, D))).astype(np.float32)
    return A, B


def test_streaming_nmf_matches_batch():
    """Row independence: chunked activations reproduce the batch conversion."""
    cfg = load_config(overrides=["nmf.max_iter=80", "nmf.tol=0"])
    A, B = _dicts()
    rng = np.random.default_rng(1)
    X = np.abs(rng.standard_normal((96, 201))).astype(np.float32)

    sc = StreamingConverter(cfg, A, B)
    chunks = [sc._convert_block(X[i : i + 32]) for i in range(0, 96, 32)]
    streamed = np.concatenate(chunks, axis=0)
    batch = sc._convert_block(X)
    np.testing.assert_allclose(streamed, batch, rtol=1e-4, atol=1e-5)


def test_streaming_with_source_phase_seed():
    """push(phase_chunk=...) seeds GL with the chunk's phase; with the
    magnitude's own phase a tiny budget already reconstructs near-exactly."""
    import jax.numpy as jnp

    from exemplars_vc_tpu.dsp import stft

    cfg = load_config()
    A, B = _dicts()
    sc = StreamingConverter(cfg, A, B, context_frames=16, synth_iters=5)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(64 * 80).astype(np.float32) * 0.1
    S = stft(jnp.asarray(x), n_fft=400, hop_length=80)[:64]

    outs = []
    for _ in range(2):
        # bypass the NMF (identity conversion) to isolate the synthesis seed
        y = sc._synthesize(np.asarray(np.abs(S)), phase_new=S)
        assert y.shape == (64 * 80,)
        assert np.isfinite(y).all()
        outs.append(y)
    # second chunk reuses the stored context phase without error
    assert sc._context_phase is not None
    assert sc._context_phase.shape[0] == 16


def test_streaming_audio_continuity():
    cfg = load_config(overrides=["nmf.max_iter=30"])
    A, B = _dicts()
    rng = np.random.default_rng(2)
    sc = StreamingConverter(cfg, A, B, context_frames=16,
                            synth_iters=20)
    outs = []
    for _ in range(3):
        mag = np.abs(rng.standard_normal((64, 201))).astype(np.float32)
        y = sc.push(mag)
        assert y.shape == (64 * 80,)
        assert np.isfinite(y).all()
        outs.append(y)
    total = np.concatenate(outs)
    assert total.shape == (3 * 64 * 80,)


def test_streaming_row_independent_levers_match_batch():
    """prune_topk/activation_power are per-frame → chunked ≡ batch holds;
    the temporal levers (context_frames, h_smooth) are force-zeroed by the
    constructor to preserve the contract."""
    cfg = load_config(overrides=[
        "nmf.max_iter=60", "nmf.tol=0", "nmf.prune_topk=16",
        "nmf.prune_iters=40", "nmf.activation_power=1.3",
        "nmf.h_smooth=2", "nmf.context_frames=2",
    ])
    A, B = _dicts()
    sc = StreamingConverter(cfg, A, B)
    assert sc.cfg.nmf.h_smooth == 0 and sc.cfg.nmf.context_frames == 0
    assert sc.cfg.nmf.prune_topk == 16          # row-independent: passes through
    rng = np.random.default_rng(7)
    X = np.abs(rng.standard_normal((64, 201))).astype(np.float32)
    chunks = [sc._convert_block(X[i : i + 16]) for i in range(0, 64, 16)]
    streamed = np.concatenate(chunks, axis=0)
    batch = sc._convert_block(X)
    np.testing.assert_allclose(streamed, batch, rtol=1e-4, atol=1e-5)
