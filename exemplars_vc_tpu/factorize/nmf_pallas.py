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


def _fused_mu_call(Fp, Kp, Dp, tile_f, tile_k, interpret):
    """One pallas_call per MU iteration: both matmuls + the elementwise
    update inside a single kernel. Per F-tile program:

      phase 1: stream K chunks of H and A through double-buffered VMEM,
               accumulating P = H·A in scratch (never touches HBM);
      phase 2: stream K chunks again, computing Den = P·Aᵀ fused with
               H ⊙ Num / Den and DMAing the updated chunk back out.

    Halves kernel launches and removes the P round trip vs the two-kernel
    version."""
    n_k = Kp // tile_k

    def kernel(h_hbm, a_hbm, num_hbm, out_hbm, p_acc, h_buf, a_buf, num_buf,
               out_buf, sems):
        f = pl.program_id(0)
        row0 = f * tile_f

        def h_dma(slot, kc):
            return pltpu.make_async_copy(
                h_hbm.at[pl.ds(row0, tile_f), pl.ds(kc * tile_k, tile_k)],
                h_buf.at[slot], sems.at[slot, 0])

        def a_dma(slot, kc):
            return pltpu.make_async_copy(
                a_hbm.at[pl.ds(kc * tile_k, tile_k), :], a_buf.at[slot],
                sems.at[slot, 1])

        def num_dma(slot, kc):
            return pltpu.make_async_copy(
                num_hbm.at[pl.ds(row0, tile_f), pl.ds(kc * tile_k, tile_k)],
                num_buf.at[slot], sems.at[slot, 2])

        # ---- phase 1: P = H·A over K chunks, double buffered ---------------
        p_acc[:] = jnp.zeros_like(p_acc)
        h_dma(0, 0).start()
        a_dma(0, 0).start()

        def phase1(kc, _):
            slot = kc % 2
            nxt = (kc + 1) % 2

            @pl.when(kc + 1 < n_k)
            def _():
                h_dma(nxt, kc + 1).start()
                a_dma(nxt, kc + 1).start()

            h_dma(slot, kc).wait()
            a_dma(slot, kc).wait()
            p_acc[:] += jnp.dot(h_buf[slot], a_buf[slot],
                                preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_k, phase1, 0)

        # ---- phase 2: H ⊙ Num / (P·Aᵀ) over K chunks ----------------------
        h_dma(0, 0).start()
        a_dma(0, 0).start()
        num_dma(0, 0).start()

        def out_dma(slot, kc):
            return pltpu.make_async_copy(
                out_buf.at[slot],
                out_hbm.at[pl.ds(row0, tile_f), pl.ds(kc * tile_k, tile_k)],
                sems.at[slot, 3])

        def phase2(kc, _):
            slot = kc % 2
            nxt = (kc + 1) % 2

            @pl.when(kc + 1 < n_k)
            def _():
                h_dma(nxt, kc + 1).start()
                a_dma(nxt, kc + 1).start()
                num_dma(nxt, kc + 1).start()

            h_dma(slot, kc).wait()
            a_dma(slot, kc).wait()
            num_dma(slot, kc).wait()

            @pl.when(kc >= 2)
            def _():
                out_dma(slot, kc - 2).wait()

            den = jnp.dot(p_acc[:], a_buf[slot].T,
                          preferred_element_type=jnp.float32)
            den = jnp.where(den == 0.0, _EPS, den)
            out_buf[slot] = h_buf[slot] * (num_buf[slot] / den)
            out_dma(slot, kc).start()
            return 0

        jax.lax.fori_loop(0, n_k, phase2, 0)
        out_dma((n_k - 1) % 2, n_k - 1).wait()
        @pl.when(n_k >= 2)
        def _():
            out_dma(n_k % 2, n_k - 2).wait()

    return pl.pallas_call(
        kernel,
        grid=(Fp // tile_f,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Fp, Kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_f, Dp), jnp.float32),
            pltpu.VMEM((2, tile_f, tile_k), jnp.float32),
            pltpu.VMEM((2, tile_k, Dp), jnp.float32),
            pltpu.VMEM((2, tile_f, tile_k), jnp.float32),
            pltpu.VMEM((2, tile_f, tile_k), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


@partial(
    jax.jit,
    static_argnames=("max_iter", "check_every", "tile_f", "tile_k", "interpret", "fused"),
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
    fused: bool = False,
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

    if fused:
        fused_call = _fused_mu_call(Fp, Kp, Dp, tile_f, tile_k, interpret)

        def mu_step(H):
            return fused_call(H, Ap, Num)
    else:
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
    n_iter = blocks * check_every
    if rem:
        H = jax.lax.fori_loop(0, rem, lambda _, h: mu_step(h), H)
        err = frob_error(H)
        n_iter = n_iter + rem
    return NmfState(H[:F, :K], n_iter, err)
