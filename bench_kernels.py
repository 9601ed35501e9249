#!/usr/bin/env python
"""Per-kernel microbenchmarks on the current backend.

Times each hot kernel with realistic shapes, forcing device completion via a
scalar reduction (full-array device→host transfers run at ~20 MB/s through
this environment's TPU tunnel and would swamp compute; see CLAUDE.md).
Each timing uses fresh inputs — the tunnel memoizes repeat executions on
identical buffers.

Usage: python bench_kernels.py            (whatever backend the env provides)
Prints one JSON line: {kernel: {median_s, runs}}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from exemplars_vc_tpu.align.dtw import dtw_batch
    from exemplars_vc_tpu.dsp import griffin_lim, mcep, mfcc, stft
    from exemplars_vc_tpu.factorize.nmf import nmf_activations
    from exemplars_vc_tpu.factorize.nmf_pallas import nmf_activations_pallas
    from exemplars_vc_tpu.world import analyze, synthesize

    rng = np.random.default_rng(0)
    platform = jax.devices()[0].platform
    log(f"platform: {platform}")

    def timed(name, make_args, fn, reduce_fn, n=3):
        fn(*make_args())  # compile
        jax.block_until_ready(reduce_fn(fn(*make_args())))
        times = []
        for _ in range(n):
            args = make_args()
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(reduce_fn(out)))
            times.append(time.time() - t0)
        med = float(np.median(times))
        log(f"{name}: {med:.4f}s  (runs {['%.3f' % t for t in times]})")
        return {"median_s": round(med, 4), "runs": [round(t, 4) for t in times]}

    results = {}

    # batched DTW: 8 pairs, ~900 frames, 20 dims (the dict-build workload)
    T = 896
    results["dtw_batch_8x896"] = timed(
        "dtw_batch_8x896",
        lambda: (
            jnp.asarray(rng.standard_normal((8, T, 20)), jnp.float32),
            jnp.asarray(rng.standard_normal((8, T, 20)), jnp.float32),
            jnp.asarray(rng.integers(700, T, 8), jnp.int32),
            jnp.asarray(rng.integers(700, T, 8), jnp.int32),
        ),
        dtw_batch,
        lambda r: r.raw_distance,
    )

    # NMF MU, production dictionary (K≈7.4k) and 100k scale
    for K in (7424, 100352):
        X = lambda: jnp.asarray(np.abs(rng.standard_normal((704, 201))), jnp.float32)
        A = jnp.asarray(np.abs(rng.standard_normal((K, 201))), jnp.float32)
        results[f"nmf_mu_xla_K{K}_50it"] = timed(
            f"nmf_mu_xla_K{K}_50it",
            lambda: (X(), A),
            lambda x, a: nmf_activations(x, a, tol=0.0, max_iter=50),
            lambda st: st.H,
        )
        results[f"nmf_mu_pallas_K{K}_50it"] = timed(
            f"nmf_mu_pallas_K{K}_50it",
            lambda: (X(), A),
            lambda x, a: nmf_activations_pallas(x, a, tol=0.0, max_iter=50),
            lambda st: st.H,
        )

    # Griffin-Lim 300 on a full-utterance magnitude
    results["griffin_lim_300"] = timed(
        "griffin_lim_300",
        lambda: (jnp.asarray(np.abs(rng.standard_normal((704, 201))), jnp.float32),),
        lambda m: griffin_lim(m, n_iter=300, length=56320),
        lambda y: y,
    )

    # STFT + MFCC + mcep over one utterance batch
    sig = lambda: jnp.asarray(rng.standard_normal(90112), jnp.float32)
    results["stft_1utt"] = timed(
        "stft_1utt", lambda: (sig(),), lambda x: jnp.abs(stft(x)), lambda m: m
    )
    results["mfcc_1utt"] = timed(
        "mfcc_1utt", lambda: (sig(),), lambda x: mfcc(x), lambda m: m
    )
    results["mcep_1utt"] = timed(
        "mcep_1utt", lambda: (sig(),), lambda x: mcep(x), lambda c: c
    )

    # WORLD analysis + synthesis, 2 s of audio
    wsig = lambda: jnp.asarray(rng.standard_normal(32000) * 0.1, jnp.float32)
    results["world_analyze_2s"] = timed(
        "world_analyze_2s", lambda: (wsig(),), lambda x: analyze(x),
        lambda f: f.sp,
    )
    feats = analyze(wsig())
    results["world_synth_2s"] = timed(
        "world_synth_2s",
        lambda: (feats.f0 + jnp.asarray(rng.random(), jnp.float32) * 0,
                 feats.sp, feats.ap),
        lambda f0, sp, ap: synthesize(f0, sp, ap),
        lambda y: y,
    )

    print(json.dumps({"platform": platform, "kernels": results}), flush=True)


if __name__ == "__main__":
    main()
