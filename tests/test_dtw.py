import jax.numpy as jnp
import numpy as np

from exemplars_vc_tpu.align import (
    build_exemplar_dicts,
    dtw,
    dtw_batch,
    gather_aligned,
    pairwise_sqdist,
)


def ref_dtw(a, b):
    """Classic-recurrence DTW oracle (the `dtw` package semantics:
    D[i,j] = C[i,j] + min(diag, up, left); traceback prefers diagonal)."""
    ta, tb = len(a), len(b)
    C = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    D = np.full((ta, tb), np.inf)
    D[0, 0] = C[0, 0]
    for i in range(ta):
        for j in range(tb):
            if i == 0 and j == 0:
                continue
            opts = []
            if i > 0 and j > 0:
                opts.append(D[i - 1, j - 1])
            if i > 0:
                opts.append(D[i - 1, j])
            if j > 0:
                opts.append(D[i, j - 1])
            D[i, j] = C[i, j] + min(opts)
    # traceback
    i, j = ta - 1, tb - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        cands = []
        if i > 0 and j > 0:
            cands.append((D[i - 1, j - 1], (i - 1, j - 1)))
        if i > 0:
            cands.append((D[i - 1, j], (i - 1, j)))
        if j > 0:
            cands.append((D[i, j - 1], (i, j - 1)))
        _, (i, j) = min(cands, key=lambda t: t[0])
        path.append((i, j))
    path.reverse()
    return D[ta - 1, tb - 1], np.array(path)


def test_pairwise_sqdist():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 3)).astype(np.float32)
    b = rng.standard_normal((7, 3)).astype(np.float32)
    C = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(C, ref, atol=1e-4)


def test_dtw_matches_oracle_small():
    rng = np.random.default_rng(1)
    for trial in range(5):
        ta, tb = rng.integers(4, 30), rng.integers(4, 30)
        a = rng.standard_normal((ta, 4)).astype(np.float32)
        b = rng.standard_normal((tb, 4)).astype(np.float32)
        ref_d, ref_path = ref_dtw(a, b)
        r = dtw(jnp.asarray(a), jnp.asarray(b))
        assert abs(float(r.raw_distance) - ref_d) < 1e-2 * max(1.0, abs(ref_d))
        pl = int(r.path_len)
        got = np.stack([np.asarray(r.path_i[:pl]), np.asarray(r.path_j[:pl])], 1)
        np.testing.assert_array_equal(got, ref_path)


def test_dtw_identical_sequences_is_diagonal():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((20, 6)).astype(np.float32)
    r = dtw(jnp.asarray(a), jnp.asarray(a))
    assert float(r.raw_distance) < 1e-4  # float32 matmul epsilon
    pl = int(r.path_len)
    assert pl == 20
    np.testing.assert_array_equal(np.asarray(r.path_i[:pl]), np.arange(20))
    np.testing.assert_array_equal(np.asarray(r.path_j[:pl]), np.arange(20))


def test_dtw_padded_matches_unpadded():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((17, 4)).astype(np.float32)
    b = rng.standard_normal((23, 4)).astype(np.float32)
    r0 = dtw(jnp.asarray(a), jnp.asarray(b))
    ap = np.zeros((32, 4), np.float32)
    ap[:17] = a
    bp = np.zeros((32, 4), np.float32)
    bp[:23] = b
    r1 = dtw(jnp.asarray(ap), jnp.asarray(bp), len_a=17, len_b=23)
    assert abs(float(r0.raw_distance) - float(r1.raw_distance)) < 1e-3
    pl0, pl1 = int(r0.path_len), int(r1.path_len)
    assert pl0 == pl1
    np.testing.assert_array_equal(np.asarray(r0.path_i[:pl0]), np.asarray(r1.path_i[:pl1]))
    np.testing.assert_array_equal(np.asarray(r0.path_j[:pl0]), np.asarray(r1.path_j[:pl1]))


def test_dtw_batch_matches_single():
    rng = np.random.default_rng(4)
    N, T, D = 4, 40, 5
    feats_a = rng.standard_normal((N, T, D)).astype(np.float32)
    feats_b = rng.standard_normal((N, T, D)).astype(np.float32)
    lens_a = np.array([40, 31, 17, 25], np.int32)
    lens_b = np.array([40, 28, 33, 9], np.int32)
    rb = dtw_batch(jnp.asarray(feats_a), jnp.asarray(feats_b), jnp.asarray(lens_a), jnp.asarray(lens_b))
    for n in range(N):
        rs = dtw(
            jnp.asarray(feats_a[n]), jnp.asarray(feats_b[n]),
            len_a=lens_a[n], len_b=lens_b[n],
        )
        assert abs(float(rb.raw_distance[n]) - float(rs.raw_distance)) < 1e-3
        pl = int(rs.path_len)
        assert int(rb.path_len[n]) == pl
        np.testing.assert_array_equal(np.asarray(rb.path_i[n, :pl]), np.asarray(rs.path_i[:pl]))


def test_path_monotone_and_bounded():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((50, 8)).astype(np.float32)
    b = rng.standard_normal((64, 8)).astype(np.float32)
    r = dtw(jnp.asarray(a), jnp.asarray(b))
    pl = int(r.path_len)
    pi, pj = np.asarray(r.path_i[:pl]), np.asarray(r.path_j[:pl])
    assert pi[0] == 0 and pj[0] == 0
    assert pi[-1] == 49 and pj[-1] == 63
    di, dj = np.diff(pi), np.diff(pj)
    assert ((di >= 0) & (di <= 1)).all() and ((dj >= 0) & (dj <= 1)).all()
    assert ((di + dj) >= 1).all()


def test_gather_and_build_exemplars():
    rng = np.random.default_rng(6)
    feats_a = rng.standard_normal((2, 30, 3)).astype(np.float32)
    feats_b = rng.standard_normal((2, 30, 3)).astype(np.float32)
    r = dtw_batch(
        jnp.asarray(feats_a), jnp.asarray(feats_b),
        jnp.asarray([30, 20], np.int32), jnp.asarray([30, 25], np.int32),
    )
    A, B = build_exemplar_dicts(
        feats_a, feats_b, np.asarray(r.path_i), np.asarray(r.path_j), np.asarray(r.path_len)
    )
    assert A.shape == B.shape
    assert A.shape[0] == int(r.path_len.sum())
    g = np.asarray(gather_aligned(jnp.asarray(feats_a[0]), r.path_i[0]))
    pl0 = int(r.path_len[0])
    np.testing.assert_allclose(g[:pl0], feats_a[0][np.asarray(r.path_i[0, :pl0])])


def test_padded_exemplar_dicts_match_exact_solve():
    """The device-side padded/packed dictionary must (a) contain exactly the
    exact dictionary's rows first, and (b) give the same NMF solution over
    those rows — the padding rows are inert."""
    from exemplars_vc_tpu.align.exemplar import build_exemplar_dicts_padded
    from exemplars_vc_tpu.factorize import nmf_activations

    rng = np.random.default_rng(9)
    feats_a = np.abs(rng.standard_normal((2, 40, 6))).astype(np.float32)
    feats_b = np.abs(rng.standard_normal((2, 40, 6))).astype(np.float32)
    r = dtw_batch(
        jnp.asarray(feats_a), jnp.asarray(feats_b),
        jnp.asarray([40, 25], np.int32), jnp.asarray([35, 30], np.int32),
    )
    A_exact, B_exact = build_exemplar_dicts(
        feats_a, feats_b, np.asarray(r.path_i), np.asarray(r.path_j),
        np.asarray(r.path_len),
    )
    k_true = int(np.asarray(r.path_len).sum())
    k_pad = ((k_true + 15) // 16) * 16
    A_pad, B_pad = build_exemplar_dicts_padded(
        jnp.asarray(feats_a), jnp.asarray(feats_b), r.path_i, r.path_j,
        k_pad=k_pad,
    )
    assert A_pad.shape == (k_pad, 6)
    np.testing.assert_allclose(np.asarray(A_pad[:k_true]), A_exact, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B_pad[:k_true]), B_exact, rtol=1e-6)
    assert float(jnp.abs(A_pad[k_true:]).sum()) == 0.0

    X = np.abs(rng.standard_normal((12, 6))).astype(np.float32)
    st_exact = nmf_activations(jnp.asarray(X), jnp.asarray(A_exact), max_iter=30)
    st_pad = nmf_activations(jnp.asarray(X), A_pad, max_iter=30)
    # same reconstruction (padding rows inert); H-init scale differs with K,
    # so compare the converged product, not H elementwise
    np.testing.assert_allclose(
        np.asarray(st_pad.H @ (A_pad)), np.asarray(st_exact.H @ jnp.asarray(A_exact)),
        rtol=5e-3, atol=1e-4,
    )
    # activations on padding rows are identically zero after the first update
    assert float(jnp.abs(st_pad.H[:, k_true:]).max()) == 0.0


def test_banded_dtw_wide_band_is_exact():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((40, 5)).astype(np.float32)
    b = rng.standard_normal((55, 5)).astype(np.float32)
    full = dtw(jnp.asarray(a), jnp.asarray(b))
    banded = dtw(jnp.asarray(a), jnp.asarray(b), band=100)
    assert abs(float(full.raw_distance) - float(banded.raw_distance)) < 1e-3
    np.testing.assert_array_equal(np.asarray(full.path_i), np.asarray(banded.path_i))


def test_banded_dtw_tight_band_monotone():
    rng = np.random.default_rng(8)
    a = rng.standard_normal((60, 5)).astype(np.float32)
    b = (a[::1] + 0.01 * rng.standard_normal((60, 5))).astype(np.float32)
    r = dtw(jnp.asarray(a), jnp.asarray(b), band=5)
    pl_ = int(r.path_len)
    pi, pj = np.asarray(r.path_i[:pl_]), np.asarray(r.path_j[:pl_])
    assert pi[-1] == 59 and pj[-1] == 59
    assert (np.abs(pi - pj) <= 5).all()
    assert float(r.raw_distance) < 1.0
