"""Exemplar-dictionary construction from DTW paths.

Replaces the reference's python gather loops: ``make_exemplar_dict_W``
(``01_make_dict_parallel.py:291-292`` — keeps the index paths), the aligned
feature gathers of ``align_sp_ap_f0`` (``04_align_n_nmf.py:113-167`` — frame j
of utterance i ← feat[path[j]], SURVEY's HOT LOOP #2), and the dictionary
flattening of ``init_A_exemplar`` (``04_align_n_nmf.py:230-246``).

Here each gather is a single ``jnp.take`` per utterance (vmapped), and the
flattened parallel dictionaries (A = source exemplars, B = target exemplars)
come out as fixed-shape padded matrices + validity mask — ready to be the NMF
dictionary, sharded over devices along the exemplar axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def gather_aligned(feat: jnp.ndarray, path: jnp.ndarray) -> jnp.ndarray:
    """(T, D) features + (P,) path indices (−1 padded) → (P, D) aligned frames.

    Padded entries return row 0; mask with ``path >= 0`` downstream."""
    return jnp.take(feat, jnp.clip(path, 0, feat.shape[0] - 1), axis=0)


@jax.jit
def gather_aligned_batch(feats: jnp.ndarray, paths: jnp.ndarray) -> jnp.ndarray:
    """(N, T, D) + (N, P) → (N, P, D)."""
    return jax.vmap(gather_aligned)(feats, paths)


from functools import partial


@partial(jax.jit, static_argnames=("k_pad",))
def build_exemplar_dicts_padded(
    feats_a: jnp.ndarray,
    feats_b: jnp.ndarray,
    path_i: jnp.ndarray,
    path_j: jnp.ndarray,
    k_pad: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-resident exemplar dictionaries with inert padding rows.

    (N, T, D) features + (N, P) paths → (K_pad, D) matrices where rows at
    padded path positions (index −1) are zeroed. Zero rows are exactly inert
    in every activation solver: they contribute nothing to H·A, their MU
    numerator column X·Aᵀ is 0 (FISTA gradient likewise; QR maps them to zero
    Q rows), so their activations collapse to 0 and the solution over the
    real rows is identical to the compacted (K, D) dictionary (the only
    difference is sklearn's H-init scale sqrt(mean(X)/K), which uses the
    padded row count). ``k_pad`` (static, typically Σ path_len rounded up to
    a bucket) packs the valid rows first with one stable argsort-gather and
    trims the buffer — without it K_pad = N·P, which measured ~2.4× larger
    than the true exemplar count and inflates every NMF matmul accordingly.
    Shapes are static per bucket, so the NMF executable is reused across
    corpora; nothing round-trips through the host (the reference's
    list-extend gather loops — ``04_align_n_nmf.py:230-246`` — ran on host,
    and so did this module's :func:`build_exemplar_dicts`, at a multi-MB
    device↔host cost per run).
    """
    A = jax.vmap(gather_aligned)(feats_a, path_i)
    B = jax.vmap(gather_aligned)(feats_b, path_j)
    valid = (path_i >= 0)[..., None]
    A = jnp.where(valid, A, 0.0)
    B = jnp.where(valid, B, 0.0)
    D = A.shape[-1]
    A = A.reshape(-1, D).astype(jnp.float32)
    B = B.reshape(-1, D).astype(jnp.float32)
    if k_pad is not None and k_pad < A.shape[0]:
        # valid rows first (stable: original exemplar order preserved)
        order = jnp.argsort(jnp.where(valid.reshape(-1), 0, 1), stable=True)
        order = order[:k_pad]
        A, B = A[order], B[order]
    return A, B


@partial(jax.jit, static_argnames=("k_pad", "k_true", "prune_frac"))
def alignment_keep_mask(
    feats_a: jnp.ndarray,
    feats_b: jnp.ndarray,
    path_i: jnp.ndarray,
    path_j: jnp.ndarray,
    k_pad: int,
    k_true: int,
    prune_frac: float,
) -> jnp.ndarray:
    """(k_pad,) bool mask keeping the best-aligned (1−prune_frac) of the
    true exemplar pairs (dictionary cleaning, ``data.dict_prune_frac``).

    Rank = per-pair DTW alignment cost ‖feat_a[path_i] − feat_b[path_j]‖²
    over the ALIGNMENT features (the same cost DTW minimized); rows packed
    exactly like :func:`build_exemplar_dicts_padded` so the mask applies
    row-wise to every gathered feature dictionary. A badly-aligned pair
    (source frame matched to a target frame of different phonetic content)
    teaches the conversion a wrong mapping; zeroing it is exact and inert
    in every solver (see ``build_exemplar_dicts_padded``)."""
    Am, Bm = build_exemplar_dicts_padded(feats_a, feats_b, path_i, path_j,
                                         k_pad=k_pad)
    cost = jnp.sum((Am - Bm) ** 2, axis=1)
    valid = jnp.arange(k_pad) < k_true
    ranked = jnp.sort(jnp.where(valid, cost, jnp.inf))
    idx = min(max(int((1.0 - prune_frac) * k_true), 1), k_pad - 1)
    thr = ranked[idx]
    return valid & (cost <= thr)


@jax.jit
def apply_keep_mask(M: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Zero the rows of (K, D) M where keep is False."""
    return M * keep[:, None].astype(M.dtype)


def build_exemplar_dicts(
    feats_a: np.ndarray,
    feats_b: np.ndarray,
    path_i: np.ndarray,
    path_j: np.ndarray,
    path_lens: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten aligned frame pairs of all utterances into the parallel
    exemplar dictionaries.

    feats_a/feats_b: (N, T, D) padded features; path_i/path_j: (N, P) DTW
    paths (−1 padded); returns (A, B) of shape (K, D) with
    K = Σ path_lens — exactly the frame-pair dictionary the reference builds
    by list-extending per utterance (``04_align_n_nmf.py:230-246``).
    Host-side (ragged concat); the device-side padded form is
    :func:`gather_aligned_batch` + mask.
    """
    a_rows, b_rows = [], []
    for n in range(feats_a.shape[0]):
        ln = int(path_lens[n])
        ia = np.asarray(path_i[n, :ln])
        ib = np.asarray(path_j[n, :ln])
        a_rows.append(np.asarray(feats_a[n])[ia])
        b_rows.append(np.asarray(feats_b[n])[ib])
    return np.concatenate(a_rows, axis=0), np.concatenate(b_rows, axis=0)
