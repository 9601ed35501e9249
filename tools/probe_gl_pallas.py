"""Time the fused Pallas GL kernel vs the XLA griffin_lim on the real TPU.

Production shape: (688, 201) magnitude, n_fft=400, hop=80, 300 iterations,
momentum 0.9, source-phase style init. Fresh inputs per rep; timings drain
via a value readback (the only method that survives the tunnel's async +
memoization artifacts — see bench_kernels.py).

Usage: python tools/probe_gl_pallas.py [--iters 300] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--frames", type=int, default=688)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from exemplars_vc_tpu import runtime
    runtime.enable_persistent_compilation_cache()
    from exemplars_vc_tpu.dsp.griffin_lim import griffin_lim
    from exemplars_vc_tpu.dsp.griffin_lim_pallas import gl_angles_fused, supports

    F, nb, n_fft, hop = args.frames, 201, 400, 80
    print("backend:", jax.default_backend(), "supports:", supports(F, n_fft, hop),
          file=sys.stderr)
    rng = np.random.default_rng(0)

    def fresh():
        mag = jnp.asarray(np.abs(rng.standard_normal((F, nb))).astype(np.float32))
        # phases built ON device — this backend cannot transfer complex64
        th = jnp.asarray((2 * np.pi * rng.random((F, nb))).astype(np.float32))
        return mag, jax.lax.complex(jnp.cos(th), jnp.sin(th))

    def time_xla():
        mag, ph = fresh()
        t0 = time.perf_counter()
        y = griffin_lim(mag, n_fft=n_fft, hop_length=hop, n_iter=args.iters,
                        momentum=0.9, init_phase=ph)
        _ = float(jnp.sum(y))          # value readback drains the dispatch
        return time.perf_counter() - t0

    def time_pallas():
        mag, ph = fresh()
        t0 = time.perf_counter()
        a = gl_angles_fused(mag, ph, n_fft, hop, args.iters, 0.9)
        _ = float(jnp.sum(jnp.real(a)))
        return time.perf_counter() - t0

    out = {"iters": args.iters, "frames": F}
    for name, fn in [("xla", time_xla), ("pallas", time_pallas)]:
        cold = fn()
        times = [fn() for _ in range(args.reps)]
        out[name] = {"cold_s": round(cold, 3),
                     "steady_s": [round(t, 4) for t in times],
                     "median_s": round(sorted(times)[len(times) // 2], 4)}
        print(name, out[name], file=sys.stderr)
    out["speedup"] = round(out["xla"]["median_s"] / out["pallas"]["median_s"], 2)

    # quality: both phase estimates applied to the same magnitude must reach
    # a comparable spectral convergence (they optimize slightly different
    # edge projections; interiors coincide)
    from exemplars_vc_tpu.dsp.stft import stft
    mag, ph = fresh()
    y_x = griffin_lim(mag, n_fft=n_fft, hop_length=hop, n_iter=args.iters,
                      momentum=0.9, init_phase=ph)
    from exemplars_vc_tpu.dsp.griffin_lim import istft
    a_p = gl_angles_fused(mag, ph, n_fft, hop, args.iters, 0.9)
    y_p = istft(mag * a_p, n_fft=n_fft, hop_length=hop)

    def sc(y):
        m = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop))[: mag.shape[0]]
        return float(jnp.linalg.norm(m - mag) / jnp.linalg.norm(mag))

    out["spectral_convergence"] = {"xla": round(sc(y_x), 4),
                                   "pallas": round(sc(y_p), 4)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
