"""Framing, STFT and ISTFT as jitted JAX ops with static shapes.

Replaces librosa/numpy STFT use in the reference:
- ``librosa.core.stft(n_fft=400, hop_length=80, window='hann')`` feature path
  (``03_a_b_r_parallel.py:101-105``, ``04_align_n_nmf.py:422``)
- ``librosa.util.frame(frame_length=400, hop_length=80)`` mcep framing
  (``01_make_dict_parallel.py:126``)
- the hand-rolled reconstruction stft/istft (``zz_audio_utilities.py:181-218``)

Design: framing is one strided gather; the FFT is XLA's batched rfft (maps to
the TPU FFT path); ISTFT does window-sum–normalized overlap-add via
scatter-add, which is mathematically exact (NOLA) rather than the reference's
unnormalized overlap-add.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from exemplars_vc_tpu.dsp import fft as _fft

from exemplars_vc_tpu.dsp.windows import get_window


@partial(jax.jit, static_argnames=("frame_length", "hop_length"))
def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(T,) -> (n_frames, frame_length), no padding (librosa.util.frame).

    When hop divides the frame length (the 400/80 default), framing is pure
    reshape + static slices — no gather op, which matters on TPU where big
    gathers serialize."""
    n = (x.shape[-1] - frame_length) // hop_length + 1
    if frame_length % hop_length == 0 and x.ndim == 1:
        r = frame_length // hop_length
        n_chunks = x.shape[-1] // hop_length
        chunks = x[: n_chunks * hop_length].reshape(n_chunks, hop_length)
        parts = [chunks[k : k + n] for k in range(r)]   # static slices
        return jnp.stack(parts, axis=1).reshape(n, frame_length)
    idx = jnp.arange(n)[:, None] * hop_length + jnp.arange(frame_length)[None, :]
    return x[..., idx]


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "window", "center", "pad_mode"),
)
def stft(
    x: jnp.ndarray,
    n_fft: int = 400,
    hop_length: int = 80,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """STFT of a (possibly batched) signal → (..., n_frames, n_fft//2+1) complex.

    ``center=True`` + periodic hann + reflect padding matches the librosa
    defaults the reference was built against. Frame axis is time-major (the
    reference immediately transposes librosa's output to frames-major —
    ``03_a_b_r_parallel.py:103``)."""
    w = get_window(window, n_fft, periodic=True, dtype=x.dtype)
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode=pad_mode)
    frames = frame_signal(x, n_fft, hop_length)
    return _fft.rfft(frames * w, n=n_fft)


def stft_magnitude(x: jnp.ndarray, **kw) -> jnp.ndarray:
    return jnp.abs(stft(x, **kw))


@partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "window", "center", "length"),
)
def istft(
    spec: jnp.ndarray,
    n_fft: int = 400,
    hop_length: int = 80,
    window: str = "hann",
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with window-sum normalization (exact NOLA inverse).

    spec: (n_frames, n_fft//2+1) complex, frames-major."""
    w = get_window(window, n_fft, periodic=True, dtype=jnp.float32)
    frames = _fft.irfft(spec, n=n_fft).astype(jnp.float32) * w

    n_frames = spec.shape[-2]
    out_len = n_fft + hop_length * (n_frames - 1)

    if n_fft % hop_length == 0:
        # scatter-free overlap-add: split each frame into r hop-chunks and
        # accumulate r statically-shifted reshapes (TPU scatters serialize)
        r = n_fft // hop_length
        chunks = frames.reshape(n_frames, r, hop_length)
        acc = jnp.zeros((n_frames + r - 1, hop_length), dtype=frames.dtype)
        wacc = jnp.zeros((n_frames + r - 1, hop_length), dtype=frames.dtype)
        w2 = (w * w).reshape(r, hop_length)
        for k in range(r):
            acc = acc.at[k : k + n_frames].add(chunks[:, k])
            wacc = wacc.at[k : k + n_frames].add(
                jnp.broadcast_to(w2[k], (n_frames, hop_length))
            )
        y = acc.reshape(-1)[:out_len]
        wsum = wacc.reshape(-1)[:out_len]
    else:
        idx = (
            jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
        ).reshape(-1)
        y = jnp.zeros(out_len, dtype=frames.dtype).at[idx].add(frames.reshape(-1))
        wsum = jnp.zeros(out_len, dtype=frames.dtype).at[idx].add(
            jnp.tile(w * w, (n_frames,))
        )
    y = y / jnp.maximum(wsum, 1e-8)

    if center:
        y = y[n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        if y.shape[0] < length:  # librosa semantics: zero-pad the tail
            y = jnp.pad(y, (0, length - y.shape[0]))
        y = y[:length]
    return y
