"""FFT layer with a TPU matmul-DFT path.

The axon TPU backend does not implement XLA's FFT op (probed: every
``jnp.fft.*`` call fails UNIMPLEMENTED, and the failure wedges the runtime).
For this framework's transform sizes (400/512/1024/2048 points over hundreds
to thousands of frames) the TPU-idiomatic answer is better than a C FFT
anyway: express the DFT as two real matmuls against precomputed cos/sin
matrices — one (frames × N) · (N × N/2+1) contraction that lands straight on
the MXU at near-peak utilization, with no twiddle-factor shuffles. FLOP count
is O(N²) per frame instead of O(N log N), but at N ≤ 2048 the MXU eats the
difference and the batched matmul wins on wall-clock.

``rfft``/``irfft`` dispatch: native XLA FFT where it exists (CPU tests —
exact parity with numpy), matmul-DFT elsewhere. All call sites in dsp/ and
world/ go through this module.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _use_native() -> bool:
    return jax.default_backend() == "cpu"


@lru_cache(maxsize=32)
def _rdft_mats(n: int):
    t = np.arange(n)[:, None]
    k = np.arange(n // 2 + 1)[None, :]
    ang = -2.0 * np.pi * t * k / n
    return (
        np.cos(ang).astype(np.float32),       # (n, n//2+1)
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=32)
def _irdft_mats(n: int):
    n_bins = n // 2 + 1
    k = np.arange(n_bins)[:, None]
    t = np.arange(n)[None, :]
    ang = 2.0 * np.pi * k * t / n
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    if n % 2 == 0:
        w[-1] = 1.0
    cr = (w * np.cos(ang) / n).astype(np.float32)   # (n_bins, n) for Re
    ci = (-w * np.sin(ang) / n).astype(np.float32)  # (n_bins, n) for Im
    return cr, ci


def rfft(x: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """Real FFT along the last axis (axis=-1 only)."""
    if axis != -1:
        raise NotImplementedError("rfft: axis=-1 only")
    if n is None:
        n = x.shape[-1]
    if _use_native():
        return jnp.fft.rfft(x, n=n, axis=-1)
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    elif x.shape[-1] > n:
        x = x[..., :n]
    C, S = _rdft_mats(n)
    xr = x.astype(jnp.float32)
    re = jnp.dot(xr, jnp.asarray(C), preferred_element_type=jnp.float32)
    im = jnp.dot(xr, jnp.asarray(S), preferred_element_type=jnp.float32)
    return jax.lax.complex(re, im)


def irfft(X: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """Inverse real FFT along the last axis (axis=-1 only)."""
    if axis != -1:
        raise NotImplementedError("irfft: axis=-1 only")
    if n is None:
        n = 2 * (X.shape[-1] - 1)
    if _use_native():
        return jnp.fft.irfft(X, n=n, axis=-1)
    n_bins = n // 2 + 1
    if X.shape[-1] < n_bins:
        pad = [(0, 0)] * (X.ndim - 1) + [(0, n_bins - X.shape[-1])]
        X = jnp.pad(X, pad)
    elif X.shape[-1] > n_bins:
        X = X[..., :n_bins]
    CR, CI = _irdft_mats(n)
    Xc = X.astype(jnp.complex64) if not jnp.iscomplexobj(X) else X
    re = jnp.real(Xc).astype(jnp.float32)
    im = jnp.imag(Xc).astype(jnp.float32)
    out = jnp.dot(re, jnp.asarray(CR), preferred_element_type=jnp.float32)
    out = out + jnp.dot(im, jnp.asarray(CI), preferred_element_type=jnp.float32)
    return out


def rfft_magsq(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """|rfft(x)|² without materializing complex values (fastest on TPU)."""
    if n is None:
        n = x.shape[-1]
    if _use_native():
        s = jnp.fft.rfft(x, n=n, axis=-1)
        return jnp.real(s) ** 2 + jnp.imag(s) ** 2
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        x = jnp.pad(x, pad)
    elif x.shape[-1] > n:
        x = x[..., :n]
    C, S = _rdft_mats(n)
    xr = x.astype(jnp.float32)
    re = jnp.dot(xr, jnp.asarray(C), preferred_element_type=jnp.float32)
    im = jnp.dot(xr, jnp.asarray(S), preferred_element_type=jnp.float32)
    return re * re + im * im
