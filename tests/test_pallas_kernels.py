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
