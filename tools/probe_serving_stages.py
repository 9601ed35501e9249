#!/usr/bin/env python
"""Stage breakdown of serve.convert_batch vs serial at production K."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "/root/reference/data"
WARPS = ",".join(f"{w:g}" for w in
                 [0.86, 0.88, 0.90, 0.92, 0.94, 0.96, 0.98,
                  1.02, 1.04, 1.06, 1.08, 1.10, 1.12, 1.14])


def main():
    import jax
    import jax.numpy as jnp

    from exemplars_vc_tpu.config import load_config
    from exemplars_vc_tpu.dsp import griffin_lim
    from exemplars_vc_tpu.factorize import convert_features
    from exemplars_vc_tpu.io import ArtifactStore, read_wav
    from exemplars_vc_tpu.io.store import list_speaker_wavs
    from exemplars_vc_tpu.pipelines.conv_dicts import extract_stft_features
    from exemplars_vc_tpu.pipelines.convert import _solve_activations
    from exemplars_vc_tpu.pipelines.serve import Converter
    from exemplars_vc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    cfg = load_config(overrides=[
        "data.tar=TF1", "misc.nb_file=8", f"data.dict_augment_warps={WARPS}",
    ])
    tmp = tempfile.mkdtemp(prefix="evc_probe2_")
    conv = Converter(cfg, ArtifactStore(tmp), DATA, nb_file=8)
    A, B = conv.dicts["stft"]
    utts = list_speaker_wavs(DATA, "SF1")[:4]

    # warm everything once
    conv.convert_batch(utts, synth_iters=60)
    for p in utts:
        conv.convert(p, synth_iters=60)

    res = {}

    # ---- serial total -----------------------------------------------------
    t0 = time.time()
    for p in utts:
        conv.convert(p, synth_iters=60)
    res["serial_total_ms"] = round(1000 * (time.time() - t0), 1)

    # ---- batch total ------------------------------------------------------
    t0 = time.time()
    conv.convert_batch(utts, synth_iters=60)
    res["batch_total_ms"] = round(1000 * (time.time() - t0), 1)

    # ---- batch stage split (mirrors convert_batch internals) --------------
    t0 = time.time()
    sigs, mags = [], []
    for p in utts:
        x, sr = read_wav(p)
        sigs.append((x, sr))
        mags.append(extract_stft_features(x, cfg))
    X_all = jnp.concatenate([jnp.asarray(m, jnp.float32) for m in mags], axis=0)
    jax.block_until_ready(X_all)
    res["batch_features_ms"] = round(1000 * (time.time() - t0), 1)
    splits = np.cumsum([m.shape[0] for m in mags])[:-1]
    bounds = [0] + list(splits) + [X_all.shape[0]]

    t0 = time.time()
    st = _solve_activations(X_all, A, cfg)
    Y_all = convert_features(st.H, B)
    jax.block_until_ready(Y_all)
    res["batch_solve_ms"] = round(1000 * (time.time() - t0), 1)
    res["batch_n_iter"] = int(st.n_iter)

    t0 = time.time()
    outs = []
    for i, (x, sr) in enumerate(sigs):
        Y = Y_all[bounds[i]:bounds[i + 1]]
        outs.append(np.asarray(griffin_lim(
            Y, n_fft=cfg.mcep.frame_length, hop_length=cfg.mcep.hop_length,
            n_iter=60, length=len(x))))
    res["batch_synth_ms"] = round(1000 * (time.time() - t0), 1)

    # serial n_iter per utterance for comparison
    iters = []
    for m in mags:
        stm = _solve_activations(jnp.asarray(m, jnp.float32), A, cfg)
        jax.block_until_ready(stm.H)
        iters.append(int(stm.n_iter))
    res["serial_n_iters"] = iters

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
