#!/usr/bin/env python
"""Standalone TPU timing for the DTW kernel: compile time + steady state.

Run alone (single TPU process!) under timeout:
    timeout 1200 python tools/time_dtw_tpu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from exemplars_vc_tpu.align.dtw import dtw_batch

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    N, TA, TB, D = 8, 1408, 1408, 20   # the bench bucket shape
    fa = jnp.asarray(rng.standard_normal((N, TA, D)), jnp.float32)
    fb = jnp.asarray(rng.standard_normal((N, TB, D)), jnp.float32)
    la = jnp.asarray(rng.integers(1100, TA + 1, N), jnp.int32)
    lb = jnp.asarray(rng.integers(1100, TB + 1, N), jnp.int32)

    t0 = time.time()
    compiled = jax.jit(dtw_batch).lower(fa, fb, la, lb).compile()
    t_compile = time.time() - t0
    print(f"compile: {t_compile:.2f} s", flush=True)

    for k in range(3):
        t0 = time.time()
        res = compiled(fa, fb, la, lb)
        jax.block_until_ready(res.distance)
        print(f"exec {k}: {time.time() - t0:.4f} s", flush=True)
    print("dist[0]:", float(res.distance[0]), "path_len[0]:",
          int(res.path_len[0]), flush=True)


if __name__ == "__main__":
    sys.exit(main())
