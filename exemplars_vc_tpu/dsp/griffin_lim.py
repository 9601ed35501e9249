"""Griffin-Lim phase reconstruction as one jitted fixed-point loop.

Replaces ``reconstruct_signal_griffin_lim`` (``zz_audio_utilities.py:258-292``:
random init, N iterations of stft→phase→istft, per-iteration RMSE print). Here
the whole loop is a ``lax.fori_loop`` compiled once — no host round-trips —
with optional momentum (fast Griffin-Lim, Perraudin et al. 2013) which the
reference does not have; momentum=0 reproduces the classic update.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from exemplars_vc_tpu.dsp.stft import istft, stft


@partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "n_iter", "length", "momentum", "return_phase"
    ),
)
def griffin_lim(
    magnitude: jnp.ndarray,
    n_fft: int = 400,
    hop_length: int = 80,
    n_iter: int = 300,
    length: int | None = None,
    momentum: float = 0.9,
    key: jax.Array | None = None,
    init_phase: jnp.ndarray | None = None,
    return_phase: bool = False,
) -> jnp.ndarray:
    """(n_frames, n_bins) magnitude → time signal.

    n_iter=300 matches the reference's budget (``04_align_n_nmf.py:187``).
    By default phases are initialized randomly (as in the reference, which
    initializes the *signal* with white noise — ``zz_audio_utilities.py:281``);
    zero-phase init stalls in a symmetric fixed point. ``key`` defaults to
    PRNGKey(0) for determinism.

    ``init_phase``: optional complex STFT (or unit-phase array) with at least
    ``magnitude.shape[0]`` frames whose angles seed the iteration. In voice
    conversion the natural seed is the *source utterance's* phase — the
    converted magnitude lives on the same frame grid, and starting from real
    speech phase (correct group delay, harmonic phase coherence) converges
    far closer to a consistent spectrogram than white-noise phase at the same
    iteration budget (see tests/test_dsp.py).

    ``return_phase``: also return the final unit-phase complex array (same
    shape as ``magnitude``) so callers (e.g. streaming overlap-save) can seed
    the next chunk with the *converged* phase rather than the initial seed.
    """
    mag = jnp.maximum(magnitude, 0.0).astype(jnp.float32)
    if init_phase is not None:
        ip = init_phase[: mag.shape[0]].astype(jnp.complex64)
        # exactly-zero seed bins (digital silence, zero-mean DC) get unit
        # phase so the first iterate is magnitude-consistent everywhere
        angles = jnp.where(
            jnp.abs(ip) > 0.0,
            ip / jnp.maximum(jnp.abs(ip), 1e-16),
            jnp.complex64(1.0),
        )
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        angles = jnp.exp(
            2j * jnp.pi * jax.random.uniform(key, mag.shape, dtype=jnp.float32)
        ).astype(jnp.complex64)

    def project(angles):
        """mag∘angles → signal → stft (one GL projection pair).

        The loop always synthesizes at the magnitude's NATURAL length —
        applying a short requested ``length`` here would drop frames from
        the re-analysis and crash the loop carry; ``length`` only shapes
        the final output below."""
        y = istft(mag * angles, n_fft=n_fft, hop_length=hop_length)
        s = stft(y, n_fft=n_fft, hop_length=hop_length)
        return s[: mag.shape[0]]

    def body(_, carry):
        angles, prev_rebuilt = carry
        rebuilt = project(angles)
        # momentum extrapolation; momentum=0.0 → plain Griffin-Lim
        tprev = rebuilt - (momentum / (1.0 + momentum)) * prev_rebuilt
        angles = tprev / jnp.maximum(jnp.abs(tprev), 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles))
    )
    y = istft(mag * angles, n_fft=n_fft, hop_length=hop_length, length=length)
    if return_phase:
        return y, angles
    return y
