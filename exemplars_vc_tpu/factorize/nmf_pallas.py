"""Pallas TPU kernels for the fixed-dictionary NMF multiplicative update.

Each MU iteration  H ← H ⊙ Num / ((H·A)·Aᵀ)  becomes two Mosaic kernels:

1. ``_recon``: P = H·A — a blocked MXU matmul with the K (exemplar) axis as
   the accumulation grid dimension; P (F, D) is also the reconstruction used
   for the convergence check, so it is not wasted traffic.
2. ``_update``: for every (F-tile, K-tile): Den = P_tile · A_tileᵀ fused with
   the elementwise H ⊙ Num / Den epilogue — the denominator never touches HBM.

Numerics are identical to factorize.nmf (same EPSILON guard, same init, same
10-iteration tol cadence); shapes are padded to 128-lane tiles (zero-padding
is exact for this algebra: padded K rows of A are zero so they contribute
nothing, padded D columns likewise). ``nmf_activations_pallas`` mirrors the
XLA version's signature and returns the same NmfState.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exemplars_vc_tpu.factorize.nmf import _EPS, NmfState


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _recon_kernel(h_ref, a_ref, p_ref):
    """Grid (F/TF, K/TK), K innermost: accumulate P += H_tile · A_tile."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        p_ref[:] = jnp.zeros_like(p_ref)

    p_ref[:] += jnp.dot(h_ref[:], a_ref[:], preferred_element_type=jnp.float32)


def _update_kernel(p_ref, a_ref, h_ref, num_ref, out_ref):
    """Grid (F/TF, K/TK): Den = P·Aᵀ fused with H ⊙ Num / Den."""
    den = jnp.dot(p_ref[:], a_ref[:].T, preferred_element_type=jnp.float32)
    den = jnp.where(den == 0.0, _EPS, den)
    out_ref[:] = h_ref[:] * (num_ref[:] / den)


@partial(
    jax.jit,
    static_argnames=("max_iter", "check_every", "tile_f", "tile_k", "interpret"),
)
def nmf_activations_pallas(
    X: jnp.ndarray,
    A: jnp.ndarray,
    tol: float = 1e-4,
    max_iter: int = 150,
    check_every: int = 10,
    tile_f: int = 256,
    tile_k: int = 512,
    interpret: bool = False,
) -> NmfState:
    """Frobenius-loss fixed-dictionary NMF with Pallas-fused MU iterations."""
    F, D = X.shape
    K = A.shape[0]
    Fp, Kp, Dp = _round_up(F, tile_f), _round_up(K, tile_k), _round_up(D, 128)

    Xp = jnp.zeros((Fp, Dp), jnp.float32).at[:F, :D].set(X.astype(jnp.float32))
    Ap = jnp.zeros((Kp, Dp), jnp.float32).at[:K, :D].set(A.astype(jnp.float32))

    avg = jnp.sqrt(jnp.maximum(X.mean(), 0.0) / K).astype(jnp.float32)
    H0 = jnp.full((Fp, Kp), avg, jnp.float32)
    Num = jnp.dot(Xp, Ap.T, preferred_element_type=jnp.float32)

    grid_recon = (Fp // tile_f, Kp // tile_k)

    recon = pl.pallas_call(
        _recon_kernel,
        grid=grid_recon,
        in_specs=[
            pl.BlockSpec((tile_f, tile_k), lambda f, k: (f, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, Dp), lambda f, k: (k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_f, Dp), lambda f, k: (f, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, Dp), jnp.float32),
        interpret=interpret,
    )

    update = pl.pallas_call(
        _update_kernel,
        grid=grid_recon,
        in_specs=[
            pl.BlockSpec((tile_f, Dp), lambda f, k: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, Dp), lambda f, k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, tile_k), lambda f, k: (f, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, tile_k), lambda f, k: (f, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_f, tile_k), lambda f, k: (f, k), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Fp, Kp), jnp.float32),
        interpret=interpret,
    )

    def mu_step(H):
        P = recon(H, Ap)
        return update(P, Ap, H, Num)

    # padded F rows have X=0 but nonzero initial reconstruction; mask them so
    # the convergence error matches the unpadded solver exactly
    row_mask = (jnp.arange(Fp) < F).astype(jnp.float32)[:, None]

    def frob_error(H):
        R = (Xp - recon(H, Ap)) * row_mask
        return jnp.sqrt(jnp.sum(R * R))

    err_init = frob_error(H0)
    n_blocks = max_iter // check_every

    def cond(c):
        _, blk, _, done = c
        return (blk < n_blocks) & ~done

    def body(c):
        H, blk, prev, done = c
        H = jax.lax.fori_loop(0, check_every, lambda _, h: mu_step(h), H)
        err = frob_error(H)
        conv = (tol > 0) & ((prev - err) < tol * err_init)
        return (H, blk + 1, err, conv)

    H, blocks, err, _ = jax.lax.while_loop(
        cond, body, (H0, jnp.int32(0), err_init, jnp.bool_(False))
    )
    rem = max_iter - n_blocks * check_every
    if rem:
        H = jax.lax.fori_loop(0, rem, lambda _, h: mu_step(h), H)
        err = frob_error(H)
    return NmfState(H[:F, :K], blocks * check_every, err)
