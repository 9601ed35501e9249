"""WORLD-class analysis orchestration: f0 → envelope → aperiodicity.

The jitted replacement for the reference's pyworld chains
``pw.dio → pw.stonemask → pw.cheaptrick → pw.d4c``
(``03_a_b_r_parallel.py:85-98``, ``04_align_n_nmf.py:396-431``)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from exemplars_vc_tpu.world.cheaptrick import cheaptrick
from exemplars_vc_tpu.world.d4c import d4c_aperiodicity
from exemplars_vc_tpu.world.f0 import estimate_f0, estimate_f0_tracked, refine_f0_stonemask


class WorldFeatures(NamedTuple):
    f0: jnp.ndarray       # (F,) Hz, 0 where unvoiced
    sp: jnp.ndarray       # (F, fft//2+1) spectral envelope (power)
    ap: jnp.ndarray       # (F, fft//2+1) aperiodicity in (0, 1)
    centers: jnp.ndarray  # (F,) sample positions
    sr: int
    frame_period_ms: float


def analyze(
    x: jnp.ndarray,
    sr: int = 16000,
    frame_period_ms: float = 5.0,
    f0_floor: float = 71.0,
    f0_ceil: float = 800.0,
    fft_size: int = 1024,
    refine_f0: bool = True,
    f0_method: str = "ncc",
) -> WorldFeatures:
    x = x.astype(jnp.float32)
    hop = int(round(sr * frame_period_ms / 1000.0))
    if f0_method == "dio":
        # WORLD's DIO algorithm (event-interval channels + contour fixing)
        from exemplars_vc_tpu.world.dio import estimate_f0_dio

        f0, _ = estimate_f0_dio(
            x, sr=sr, frame_period_ms=frame_period_ms,
            f0_floor=f0_floor, f0_ceil=f0_ceil,
        )
    elif f0_method == "harvest":
        # WORLD's Harvest (dense band-pass channels + IF-refined candidates)
        from exemplars_vc_tpu.world.harvest import estimate_f0_harvest

        f0, _ = estimate_f0_harvest(
            x, sr=sr, frame_period_ms=frame_period_ms,
            f0_floor=f0_floor, f0_ceil=f0_ceil,
        )
    elif f0_method == "tracked":
        # candidate-lattice Viterbi contour (harvest-style; robust to noise)
        f0, _ = estimate_f0_tracked(
            x, sr=sr, frame_period_ms=frame_period_ms,
            f0_floor=f0_floor, f0_ceil=f0_ceil,
        )
    else:
        f0, _ = estimate_f0(
            x, sr=sr, frame_period_ms=frame_period_ms,
            f0_floor=f0_floor, f0_ceil=f0_ceil,
        )
    if refine_f0:   # reference config f0_is_refined (config/config:43)
        f0 = refine_f0_stonemask(x, f0, sr=sr, frame_period_ms=frame_period_ms,
                                 f0_floor=f0_floor, f0_ceil=f0_ceil)
    centers = jnp.arange(f0.shape[0]) * hop
    sp = cheaptrick(x, f0, centers, sr=sr, fft_size=fft_size, f0_floor=f0_floor)
    ap = d4c_aperiodicity(x, f0, centers, sr=sr, fft_size=fft_size)
    return WorldFeatures(f0=f0, sp=sp, ap=ap, centers=centers,
                         sr=sr, frame_period_ms=frame_period_ms)
