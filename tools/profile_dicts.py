"""Profile the dictionary-build stage sub-steps with device fences.

VERDICT r3 item 4: the fenced ``dicts`` stage is 0.458 s of the 0.582 s
synced pipeline — this tool splits it into load / alignment features / DTW
/ conversion features (src, tar) / exemplar gather+pack, each fenced, plus
the artifact-store write cost (the bench builds into a FRESH store every
run, so the async npz writes d2h their payloads through the ~20 MB/s
tunnel during the stage).

Run on the real chip: ``python tools/profile_dicts.py``; add ``--cpu`` for
the CPU backend. Prints one JSON object.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

from exemplars_vc_tpu.runtime import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import numpy as np

DATA = "/root/reference/data"


def fenced(fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def one_build(cfg, store, flush_store=True):
    """One full dictionary preparation with per-substep fences."""
    from exemplars_vc_tpu.align import dtw_batch
    from exemplars_vc_tpu.align.exemplar import build_exemplar_dicts_padded
    from exemplars_vc_tpu.io import load_speaker
    from exemplars_vc_tpu.pipelines.conv_dicts import build_conversion_dicts
    from exemplars_vc_tpu.pipelines.make_dict import (
        _extract_batch_stacked,
        _pack_paths,
        make_dictionary,
    )

    t = {}
    t0 = time.perf_counter()
    src_sigs, _ = load_speaker(DATA, "SF1", nb_file=8, cpu_rate=cfg.misc.cpu_rate)
    tar_sigs, _ = load_speaker(DATA, "TF1", nb_file=8, cpu_rate=cfg.misc.cpu_rate)
    t["load"] = time.perf_counter() - t0

    (FA, la), dt = fenced(lambda: _extract_batch_stacked(src_sigs, cfg, "mfcc"))
    t["align_feats_src"] = dt
    (FB, lb), dt = fenced(lambda: _extract_batch_stacked(tar_sigs, cfg, "mfcc"))
    t["align_feats_tar"] = dt

    r, dt = fenced(lambda: dtw_batch(FA, FB, la, lb))
    t["dtw_compute"] = dt
    t0 = time.perf_counter()
    packed = np.asarray(_pack_paths(r.path_i, r.path_j, r.path_len, r.distance))
    t["dtw_path_transfer"] = time.perf_counter() - t0
    N, P = r.path_i.shape
    path_i = packed[: N * P].reshape(N, P)
    path_j = packed[N * P : 2 * N * P].reshape(N, P)
    path_len = packed[2 * N * P : 2 * N * P + N]

    sf, dt = fenced(lambda: build_conversion_dicts(cfg, store, DATA, "SF1",
                                                   nb_file=8).feats["stft"])
    t["conv_feats_src"] = dt
    tf_, dt = fenced(lambda: build_conversion_dicts(cfg, store, DATA, "TF1",
                                                    nb_file=8).feats["stft"])
    t["conv_feats_tar"] = dt

    k_true = int(path_len.sum())
    k_pad = ((k_true + 511) // 512) * 512
    (A, B), dt = fenced(lambda: build_exemplar_dicts_padded(
        sf, tf_, path_i, path_j, k_pad=k_pad))
    t["exemplar_gather"] = dt

    # store-write drain: wait for the async artifact writer to finish so the
    # next build's numbers aren't polluted by this build's d2h transfers
    t0 = time.perf_counter()
    if flush_store and hasattr(store, "flush"):
        store.flush()
    t["store_flush_wait"] = time.perf_counter() - t0
    t["total"] = sum(v for k, v in t.items())
    return {k: round(v, 4) for k, v in t.items()}


def main():
    from exemplars_vc_tpu.config import load_config
    from exemplars_vc_tpu.io import ArtifactStore
    from exemplars_vc_tpu.pipelines.convert import _aligned_dicts

    cfg = load_config(overrides=["data.tar=TF1", "misc.nb_file=8"])
    runs = []
    for k in range(4):
        store = ArtifactStore(tempfile.mkdtemp(prefix=f"evc_prof_{k}_"))
        runs.append(one_build(cfg, store))
        print(f"build {k}: {runs[-1]}", file=sys.stderr, flush=True)

    # reference: the production _aligned_dicts wall time into a fresh store
    t0 = time.perf_counter()
    store = ArtifactStore(tempfile.mkdtemp(prefix="evc_prof_ad_"))
    dicts, _ = _aligned_dicts(cfg, store, DATA, 8)
    jax.block_until_ready(dicts)
    aligned = time.perf_counter() - t0

    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "builds": runs,
        "aligned_dicts_fresh_store_s": round(aligned, 4),
    }, indent=1), flush=True)


if __name__ == "__main__":
    main()
