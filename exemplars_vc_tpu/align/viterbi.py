"""Batched Viterbi tracking in JAX.

Replaces the reference tree's only native-language kernel: the Cython/C++
``viterbiTracking`` in vendored pyfasst
(``dependencies/pyfasst-master/pyfasst/SeparateLeadStereo/tracking/_tracking.pyx:11-93``),
an O(S²·N) max-sum DP over HMM states used for melody tracking. Same DP
family as the DTW wavefront: here the whole S×S transition max is one
broadcasted reduction per frame, the frame loop is a ``lax.scan``, and
independent sequences batch with ``vmap``.

Semantics match the Cython exactly, including first-index tie-breaking in
the argmax (the Cython uses a strict ``>`` update, keeping the lowest state
index on ties — as does ``jnp.argmax``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def viterbi_track(
    log_density: jnp.ndarray,
    log_prior: jnp.ndarray,
    log_transition: jnp.ndarray,
) -> jnp.ndarray:
    """Most-likely state path.

    log_density: (S, N) per-frame state log-likelihoods;
    log_prior: (S,); log_transition: (S, S) with [s', s] = log p(s | s').
    Returns (N,) int32 best state path."""
    S, N = log_density.shape
    cum0 = log_prior + log_density[:, 0]

    def forward(cum, obs):
        # scores[s', s] = cum[s'] + T[s', s]
        scores = cum[:, None] + log_transition
        ante = jnp.argmax(scores, axis=0).astype(jnp.int32)     # (S,)
        cum_new = jnp.max(scores, axis=0) + obs
        return cum_new, ante

    cum_final, antecedents = jax.lax.scan(
        forward, cum0, jnp.moveaxis(log_density, 1, 0)[1:]
    )  # antecedents: (N-1, S)

    last = jnp.argmax(cum_final).astype(jnp.int32)

    def backward(state, ante_row):
        prev = ante_row[state]
        return prev, state

    # emits [p(N-1), p(N-2), …, p(1)]; the final carry is p(0)
    first, path_rev = jax.lax.scan(backward, last, antecedents[::-1])
    return jnp.concatenate([first[None], path_rev[::-1]])


@jax.jit
def viterbi_track_batch(
    log_density: jnp.ndarray,
    log_prior: jnp.ndarray,
    log_transition: jnp.ndarray,
) -> jnp.ndarray:
    """(B, S, N) densities → (B, N) paths (shared prior/transition)."""
    return jax.vmap(lambda d: viterbi_track(d, log_prior, log_transition))(log_density)
