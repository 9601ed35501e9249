"""Window functions as jittable JAX arrays.

Covers the reference's window usage: periodic hann for STFT (librosa default,
``03_a_b_r_parallel.py:103``), symmetric blackman for mel-cepstral framing
(``pysptk.blackman`` at ``01_make_dict_parallel.py:127``), and hamming for the
AMF/LPC variant (``02_freq_warping_AMF.py:67``).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_window(name: str, length: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Build a window. ``periodic=True`` matches scipy ``fftbins=True`` /
    librosa STFT; ``periodic=False`` gives the symmetric variant (numpy/SPTK)."""
    n = jnp.arange(length, dtype=jnp.float64)
    denom = length if periodic else max(length - 1, 1)
    t = 2.0 * jnp.pi * n / denom
    if name in ("hann", "hanning"):
        w = 0.5 - 0.5 * jnp.cos(t)
    elif name == "hamming":
        w = 0.54 - 0.46 * jnp.cos(t)
    elif name == "blackman":
        w = 0.42 - 0.5 * jnp.cos(t) + 0.08 * jnp.cos(2.0 * t)
    elif name in ("rect", "boxcar", "ones"):
        w = jnp.ones(length, dtype=jnp.float64)
    else:
        raise ValueError(f"unknown window {name!r}")
    return w.astype(dtype)
