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


def _pad_trunc_last(x: jnp.ndarray, n: int) -> jnp.ndarray:
    if x.shape[-1] < n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        return jnp.pad(x, pad)
    return x[..., :n]


def rfft(x: jnp.ndarray, n: int | None = None, axis: int = -1) -> jnp.ndarray:
    """Real FFT along the last axis (axis=-1 only)."""
    if axis != -1:
        raise NotImplementedError("rfft: axis=-1 only")
    if n is None:
        n = x.shape[-1]
    if _use_native():
        return jnp.fft.rfft(x, n=n, axis=-1)
    x = _pad_trunc_last(x, n)
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
    X = _pad_trunc_last(X, n_bins)
    CR, CI = _irdft_mats(n)
    Xc = X.astype(jnp.complex64) if not jnp.iscomplexobj(X) else X
    re = jnp.real(Xc).astype(jnp.float32)
    im = jnp.imag(Xc).astype(jnp.float32)
    out = jnp.dot(re, jnp.asarray(CR), preferred_element_type=jnp.float32)
    out = out + jnp.dot(im, jnp.asarray(CI), preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Full complex FFT for long signals (NSGT & full-spectrum transforms).
#
# A direct matmul DFT is O(n²) memory in the coefficient matrix, which is fine
# at frame sizes (≤2048) but not for whole-utterance spectra (n ~ 10⁴-10⁵).
# The TPU answer is a two-factor Cooley-Tukey split n = n1·n2: reshape, DFT
# over each factor as a batched matmul (recursing while a factor is still
# >2048), with a twiddle multiply in between. Every step is an MXU matmul on
# static shapes; complex arithmetic is carried as explicit (re, im) pairs so
# nothing depends on backend complex-matmul support.
# ---------------------------------------------------------------------------

_DIRECT_FFT_MAX = 2048


@lru_cache(maxsize=32)
def _cdft_mats(n: int, sign: int):
    t = np.arange(n)[:, None]
    k = np.arange(n)[None, :]
    ang = sign * 2.0 * np.pi * t * k / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@lru_cache(maxsize=32)
def _twiddle(n1: int, n2: int, sign: int):
    t2 = np.arange(n2)[:, None]
    k1 = np.arange(n1)[None, :]
    ang = sign * 2.0 * np.pi * t2 * k1 / (n1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split_factor(n: int) -> tuple[int, int]:
    """Most balanced n1·n2 = n with n1 ≤ n2 (n1 = 1 iff n is prime)."""
    for n1 in range(int(np.sqrt(n)), 1, -1):
        if n % n1 == 0:
            return n1, n // n1
    return 1, n


def _cdft_matmul(re: jnp.ndarray, im: jnp.ndarray, n: int, sign: int):
    """Complex DFT along the last axis as real matmuls; returns (re, im)."""
    n1, n2 = _split_factor(n) if n > _DIRECT_FFT_MAX else (1, n)
    if n1 == 1:  # small enough for one matmul, or prime (rare; caller pads)
        C, S = _cdft_mats(n, sign)
        C, S = jnp.asarray(C), jnp.asarray(S)
        return (
            jnp.dot(re, C, preferred_element_type=jnp.float32)
            - jnp.dot(im, S, preferred_element_type=jnp.float32),
            jnp.dot(re, S, preferred_element_type=jnp.float32)
            + jnp.dot(im, C, preferred_element_type=jnp.float32),
        )
    lead = re.shape[:-1]
    # input index t = t1·n2 + t2 → (t2, t1) layout, inner DFT over t1
    re2 = jnp.swapaxes(re.reshape(lead + (n1, n2)), -1, -2)
    im2 = jnp.swapaxes(im.reshape(lead + (n1, n2)), -1, -2)
    ar, ai = _cdft_matmul(re2, im2, n1, sign)            # (..., t2, k1)
    TC, TS = _twiddle(n1, n2, sign)
    TC, TS = jnp.asarray(TC), jnp.asarray(TS)
    br = ar * TC - ai * TS
    bi = ar * TS + ai * TC
    br = jnp.swapaxes(br, -1, -2)                        # (..., k1, t2)
    bi = jnp.swapaxes(bi, -1, -2)
    cr, ci = _cdft_matmul(br, bi, n2, sign)              # (..., k1, k2)
    # output index k = k1 + n1·k2 → flatten in (k2, k1) order
    cr = jnp.swapaxes(cr, -1, -2).reshape(lead + (n,))
    ci = jnp.swapaxes(ci, -1, -2).reshape(lead + (n,))
    return cr, ci


def fft(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Full complex FFT along the last axis (matmul Cooley-Tukey on TPU)."""
    if n is None:
        n = x.shape[-1]
    if _use_native():
        return jnp.fft.fft(x, n=n, axis=-1)
    x = _pad_trunc_last(x, n)
    if jnp.iscomplexobj(x):
        re, im = jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    else:
        re = x.astype(jnp.float32)
        im = jnp.zeros_like(re)
    r, i = _cdft_matmul(re, im, n, -1)
    return jax.lax.complex(r, i)


def ifft(X: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Full complex inverse FFT along the last axis."""
    if n is None:
        n = X.shape[-1]
    if _use_native():
        return jnp.fft.ifft(X, n=n, axis=-1)
    X = _pad_trunc_last(X, n)
    if jnp.iscomplexobj(X):
        re, im = jnp.real(X).astype(jnp.float32), jnp.imag(X).astype(jnp.float32)
    else:
        re = X.astype(jnp.float32)
        im = jnp.zeros_like(re)
    r, i = _cdft_matmul(re, im, n, +1)
    return jax.lax.complex(r / n, i / n)


def rfft_magsq(x: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """|rfft(x)|² without materializing complex values (fastest on TPU)."""
    if n is None:
        n = x.shape[-1]
    if _use_native():
        s = jnp.fft.rfft(x, n=n, axis=-1)
        return jnp.real(s) ** 2 + jnp.imag(s) ** 2
    x = _pad_trunc_last(x, n)
    C, S = _rdft_mats(n)
    xr = x.astype(jnp.float32)
    re = jnp.dot(xr, jnp.asarray(C), preferred_element_type=jnp.float32)
    im = jnp.dot(xr, jnp.asarray(S), preferred_element_type=jnp.float32)
    return re * re + im * im
