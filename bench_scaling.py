#!/usr/bin/env python
"""Scaling harness: large sharded-dictionary NMF conversion (BASELINE config 5).

Measures the dictionary-sharded NMF (exemplars_vc_tpu.parallel.sharded_nmf) on
a synthetic 100k+-frame exemplar dictionary:

- single-device throughput at production scale (K=100k, D=201, F=704 — the
  (F,K)·(K,D) MU matmuls at ~2·2·F·K·D ≈ 57 GFLOP/iter),
- multi-device runs over every mesh size available (real chips on a pod
  slice; virtual CPU devices validate the collectives but share one socket,
  so their wall-clock is NOT a scaling signal and is labeled as such).

Usage:
    python bench_scaling.py [--devices N] [--k 100352] [--iters 50]

Prints one JSON line with per-mesh timings and efficiency.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=100352)  # 100k+, multiple of 1024
    ap.add_argument("--f", type=int, default=704)
    ap.add_argument("--d", type=int, default=201)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--devices", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exemplars_vc_tpu.parallel import make_mesh, sharded_nmf_activations

    n_dev = args.devices or len(jax.devices())
    platform = jax.devices()[0].platform
    virtual = platform == "cpu"
    log(f"platform={platform} devices={n_dev} K={args.k} F={args.f} D={args.d}")

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.abs(rng.standard_normal((args.f, args.d))), jnp.float32)
    A = jnp.asarray(np.abs(rng.standard_normal((args.k, args.d))), jnp.float32)
    flops_per_iter = 4.0 * args.f * args.k * args.d  # two (F,K)x(K,D)-class matmuls

    results = []
    shard_counts = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev and args.k % s == 0]
    for shards in shard_counts:
        mesh = make_mesh(data=1, dict_=shards, devices=jax.devices()[:shards])
        t0 = time.time()
        st = sharded_nmf_activations(X, A, mesh, tol=0.0, max_iter=args.iters)
        jax.block_until_ready(st.H)
        cold = time.time() - t0
        t0 = time.time()
        st = sharded_nmf_activations(X, A, mesh, tol=0.0, max_iter=args.iters)
        jax.block_until_ready(st.H)
        hot = time.time() - t0
        tflops = flops_per_iter * args.iters / hot / 1e12
        results.append({
            "dict_shards": shards, "steady_s": round(hot, 3),
            "cold_s": round(cold, 3), "tflops": round(tflops, 2),
            "error": float(st.error),
        })
        log(f"shards={shards}: {hot:.3f}s steady ({tflops:.2f} TFLOP/s)")

    base = results[0]["steady_s"]
    for r in results:
        r["speedup"] = round(base / r["steady_s"], 3)
        r["efficiency"] = round(base / r["steady_s"] / r["dict_shards"], 3)

    print(json.dumps({
        "metric": "sharded-dictionary NMF (K=%d) MU iterations" % args.k,
        "platform": platform,
        "virtual_devices": virtual,
        "note": ("virtual CPU devices share one socket: timings validate the "
                 "sharded collectives, not scaling") if virtual else
                "real-chip scaling over ICI",
        "results": results,
    }), flush=True)


if __name__ == "__main__":
    main()
