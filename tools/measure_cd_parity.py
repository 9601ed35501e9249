"""Measure FISTA-NNLS vs sklearn-`cd` activation agreement (PARITY C12).

The reference's torch variant solves fixed-dictionary activations with
sklearn's coordinate-descent path (``04_align_n_nmf_pytorch.py:207-208``:
``non_negative_factorization(X, H=W, init='custom', update_H=False,
solver='cd', beta_loss='frobenius', max_iter=200)``). Our 'cd'/'nnls'
solver is FISTA at the same iteration budget — same convex problem
(min ‖X − H·A‖_F, H ≥ 0; sklearn's cd adds no regularization by default),
different algorithm. This script quantifies how close the two land on the
BUNDLED problem (held-out 100162 magnitudes over the 8-pair dictionary):

- relative Frobenius distance between H matrices,
- mean per-frame cosine similarity of activation rows,
- relative distance of the converted output H·B (what synthesis consumes),
- reconstruction objectives of both solutions,
- MCD of both converted+synthesized signals vs the true held-out target.

Run: ``python tools/measure_cd_parity.py`` (CPU; writes JSON to stdout).
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from sklearn.decomposition import non_negative_factorization

    from exemplars_vc_tpu.config import load_config
    from exemplars_vc_tpu.dsp import griffin_lim
    from exemplars_vc_tpu.factorize import nnls_activations
    from exemplars_vc_tpu.io import ArtifactStore, read_wav
    from exemplars_vc_tpu.pipelines.conv_dicts import extract_stft_features
    from exemplars_vc_tpu.pipelines.convert import (
        _aligned_dicts,
        mcd_between_signals,
    )
    from exemplars_vc_tpu.pipelines.evaluate import heldout_pair

    data = "/root/reference/data"
    cfg = load_config(overrides=["data.tar=TF1", "misc.nb_file=8"])
    store = ArtifactStore("/tmp/cd_parity_store")
    dicts, kind = _aligned_dicts(cfg, store, data, 8)
    assert kind == "stft"
    A, B = (np.asarray(v, np.float64) for v in dicts["stft"])

    src_wav, tar_wav = heldout_pair(data)
    x, sr = read_wav(src_wav)
    X = np.asarray(extract_stft_features(x, cfg), np.float64)
    tar_sig, _ = read_wav(tar_wav)

    # the reference's exact sklearn call (04_align_n_nmf_pytorch.py:207-208)
    H_cd, _, n_iter_cd = non_negative_factorization(
        X=X, H=A, init="custom", update_H=False, n_components=A.shape[0],
        beta_loss="frobenius", solver="cd", tol=1e-4, max_iter=200)

    Xj, Aj = jnp.asarray(X, jnp.float32), jnp.asarray(A, jnp.float32)
    H_fista = np.asarray(nnls_activations(Xj, Aj, n_iter=200), np.float64)
    # the production budget: one cd "iteration" is a K-coordinate SWEEP, so
    # the solver dispatch runs 10× max_iter FISTA steps (config.nnls_iters)
    H_conv = np.asarray(nnls_activations(Xj, Aj, n_iter=2000), np.float64)

    def rel(a, b):
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))

    def row_cosine(a, b):
        num = (a * b).sum(axis=1)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return float(np.mean(num / np.maximum(den, 1e-30)))

    Y_cd = H_cd @ B
    Y_fista = H_fista @ B

    def synth_mcd(Y):
        audio = np.asarray(griffin_lim(
            jnp.asarray(Y, jnp.float32), n_fft=cfg.mcep.frame_length,
            hop_length=cfg.mcep.hop_length, n_iter=100, length=len(x)))
        return float(mcd_between_signals(audio, tar_sig, cfg))

    Y_conv = H_conv @ B
    out = {
        "problem": {"F": X.shape[0], "D": X.shape[1], "K": A.shape[0],
                    "sklearn_cd_n_iter": int(n_iter_cd)},
        "H_rel_frobenius_vs_cd": rel(H_fista, H_cd),
        "H_row_cosine_mean": row_cosine(H_fista, H_cd),
        "converted_rel_frobenius_vs_cd": rel(Y_fista, Y_cd),
        "objective_cd": float(np.linalg.norm(X - H_cd @ A)),
        "objective_fista_200": float(np.linalg.norm(X - H_fista @ A)),
        "objective_fista_2000": float(np.linalg.norm(X - H_conv @ A)),
        "converted_rel_frobenius_vs_cd_2000": rel(Y_conv, Y_cd),
        "H_row_cosine_mean_2000": row_cosine(H_conv, H_cd),
        "heldout_mcd_db_cd": synth_mcd(Y_cd),
        "heldout_mcd_db_fista_200": synth_mcd(Y_fista),
        "heldout_mcd_db_fista_2000": synth_mcd(Y_conv),
    }
    out["heldout_mcd_delta_db_2000"] = round(
        out["heldout_mcd_db_fista_2000"] - out["heldout_mcd_db_cd"], 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
