"""Objective quality metrics.

The reference has no metrics at all (quality control is listen-and-look,
SURVEY §4); the driver's BASELINE demands mel-cepstral distortion (MCD) vs
the reference output, so it is first-class here."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_MCD_CONST = 10.0 / np.log(10.0) * np.sqrt(2.0)


def mcd(c_a: jnp.ndarray, c_b: jnp.ndarray, exclude_c0: bool = True) -> jnp.ndarray:
    """Mel-cepstral distortion in dB between aligned mcep sequences (T, M+1).

    MCD = (10/ln10)·√2·√Σ_m (c_a,m − c_b,m)², averaged over frames; c0 (gain)
    excluded by convention."""
    s = 1 if exclude_c0 else 0
    d = c_a[..., s:] - c_b[..., s:]
    per_frame = _MCD_CONST * jnp.sqrt(jnp.sum(d * d, axis=-1))
    return jnp.mean(per_frame)


def mcd_aligned(c_a: jnp.ndarray, c_b: jnp.ndarray) -> jnp.ndarray:
    """MCD after DTW-aligning the two sequences (different lengths ok)."""
    from exemplars_vc_tpu.align import dtw, gather_aligned

    r = dtw(c_a, c_b)
    ga = gather_aligned(c_a, r.path_i)
    gb = gather_aligned(c_b, r.path_j)
    mask = (r.path_i >= 0).astype(c_a.dtype)
    s = 1
    d = ga[..., s:] - gb[..., s:]
    per_frame = _MCD_CONST * jnp.sqrt(jnp.sum(d * d, axis=-1))
    return jnp.sum(per_frame * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def spectral_convergence(mag_est: jnp.ndarray, mag_ref: jnp.ndarray) -> jnp.ndarray:
    """‖|X̂| − |X|‖_F / ‖|X|‖_F."""
    return jnp.linalg.norm(mag_est - mag_ref) / jnp.maximum(
        jnp.linalg.norm(mag_ref), 1e-12
    )
