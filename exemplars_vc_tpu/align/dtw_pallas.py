"""Pallas TPU kernel for the DTW anti-diagonal wavefront.

The scan-based version (align/dtw.py) emits one XLA loop step per diagonal —
correct everywhere, but it compiles slowly on TPU (minutes for ~1800-step
scans through the remote-compile path) and pays HBM round trips per step.
This kernel runs the whole DP for one pair inside a single Mosaic program:
the skewed cost matrix lives in VMEM, the two rolling wavefronts are VMEM
scratch, and diagonals are processed in blocks of 32 (Mosaic requires
dynamically-indexed sublane offsets to be provably tile-aligned — int8 packs
32 sublanes — so the inner 32 steps are unrolled and direction rows are
flushed as one aligned (32, L) store). Batch = grid dimension.

VMEM budget: skewed cost (n_diag × L) f32 + directions int8 + two (1, L)
wavefronts. L ≤ ~1024 fits comfortably; ``fits_vmem`` reports the limit and
callers fall back to the scan implementation beyond it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
_DIAG_BLOCK = 32   # int8 sublane packing → aligned dynamic stores


def fits_vmem(ta: int, tb: int, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    l = -(-ta // 128) * 128
    n_diag = -(-(ta + tb - 1) // _DIAG_BLOCK) * _DIAG_BLOCK
    need = n_diag * l * 4 + n_diag * l + 4 * l * 4
    return need <= budget_bytes


def _make_kernel(n_diag: int, L: int):
    def kernel(lens_ref, sk_ref, cost_ref, dirs_ref, prev_ref, prev2_ref):
        """One utterance pair per grid step.

        lens_ref: scalar-prefetch SMEM (N, 2) int32 [len_a, len_b]; sk_ref:
        VMEM (1, n_diag, L) skewed costs; dirs_ref: (1, n_diag, L) int8 out;
        cost_ref: VMEM (1, 8, 128) f32 out (final cost broadcast into the
        smallest legal tile); prev/prev2: (1, L) f32 scratch wavefronts."""
        la = lens_ref[pl.program_id(0), 0]
        lb = lens_ref[pl.program_id(0), 1]
        end_d = la + lb - 2
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

        prev_ref[:] = jnp.full((1, L), BIG, dtype=jnp.float32)
        prev2_ref[:] = jnp.full((1, L), BIG, dtype=jnp.float32)

        def outer(blk, _):
            base = pl.multiple_of(blk * _DIAG_BLOCK, _DIAG_BLOCK)
            sk_block = sk_ref[0, pl.ds(base, _DIAG_BLOCK), :]   # (32, L)
            prev = prev_ref[:]
            prev2 = prev2_ref[:]
            rows = []
            for s in range(_DIAG_BLOCK):                        # unrolled
                d = base + s
                sk_d = sk_block[s : s + 1, :]                   # (1, L) static
                j = d - iota

                left = jnp.where(j >= 1, prev, BIG)             # (i, j-1)
                up = pltpu.roll(prev, shift=1, axis=1)          # (i-1, j)
                diag = pltpu.roll(prev2, shift=1, axis=1)       # (i-1, j-1)
                up = jnp.where(iota >= 1, up, BIG)
                diag = jnp.where((iota >= 1) & (j >= 1), diag, BIG)

                # tie order diag < up < left (matches scan version)
                best = jnp.minimum(jnp.minimum(diag, up), left)
                choice = jnp.where(
                    best == diag, 0, jnp.where(best == up, 1, 2)
                ).astype(jnp.int8)
                best = jnp.where((d == 0) & (iota == 0), 0.0, best)

                on_diag = (j >= 0) & (iota < L)
                new = jnp.where(on_diag, sk_d + jnp.minimum(best, BIG), BIG)
                new = jnp.minimum(new, BIG)

                rows.append(choice)
                prev2 = prev
                prev = new

                @pl.when(d == end_d)
                def _(new=new):
                    final = jnp.sum(jnp.where(iota == la - 1, new, 0.0))
                    cost_ref[0] = jnp.full((8, 128), final, dtype=jnp.float32)

            dirs_ref[0, pl.ds(base, _DIAG_BLOCK), :] = jnp.concatenate(rows, axis=0)
            prev_ref[:] = prev
            prev2_ref[:] = prev2
            return 0

        jax.lax.fori_loop(0, n_diag // _DIAG_BLOCK, outer, 0)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def dtw_wavefront_pallas(
    sk: jnp.ndarray, lens: jnp.ndarray, interpret: bool = False
):
    """Batched wavefront DP.

    sk: (N, n_diag, L) skewed costs (align.dtw._skew, vmapped);
    lens: (N, 2) int32 [len_a, len_b] per pair.
    Returns (cost (N,), dirs (N, n_diag, L) int8, padded to tile multiples)."""
    n, n_diag0, L0 = sk.shape
    n_diag = -(-n_diag0 // _DIAG_BLOCK) * _DIAG_BLOCK
    L = -(-L0 // 128) * 128
    if (n_diag, L) != (n_diag0, L0):
        # BIG-cost padding: the DP never selects padded cells and the
        # backtrace never walks past the true diagonals
        sk = jnp.pad(sk, ((0, 0), (0, n_diag - n_diag0), (0, L - L0)),
                     constant_values=BIG)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,   # lens (N, 2) fully resident in SMEM
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, n_diag, L), lambda i, lens: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, lens: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_diag, L), lambda i, lens: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, L), jnp.float32),
            pltpu.VMEM((1, L), jnp.float32),
        ],
    )

    cost, dirs = pl.pallas_call(
        _make_kernel(n_diag, L),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, n_diag, L), jnp.int8),
        ],
        interpret=interpret,
    )(lens.astype(jnp.int32), sk.astype(jnp.float32))
    return cost[:, 0, 0], dirs
