"""Pallas TPU kernel for the DTW anti-diagonal wavefront.

The scan-based version (align/dtw.py) emits one XLA loop step per diagonal —
correct everywhere, but each step is a handful of (L,)-vector ops with loop
overhead. This kernel runs the whole DP for one pair inside a single Mosaic
program: the skewed cost matrix lives in VMEM, the two rolling wavefronts are
VMEM scratch, and the ~2·L-step loop is a ``fori_loop`` with pure VPU work per
step (rolls + selects) and an int8 direction write. Batch = grid dimension.

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


def fits_vmem(ta: int, tb: int, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    l = ta
    n_diag = ta + tb - 1
    need = n_diag * l * 4 + n_diag * l + 4 * l * 4
    return need <= budget_bytes


def _make_kernel(n_diag: int, L: int):
    def kernel(lens_ref, sk_ref, cost_ref, dirs_ref, prev_ref, prev2_ref):
        """One utterance pair per grid step.

        lens_ref: SMEM (1, 2) int32 [len_a, len_b]; sk_ref: VMEM (1, n_diag, L)
        skewed costs; dirs_ref: (1, n_diag, L) int8 out; cost_ref: SMEM (1, 1)
        f32 out; prev/prev2: (1, L) f32 scratch (rolling wavefronts)."""
        la = lens_ref[0, 0]
        lb = lens_ref[0, 1]
        end_d = la + lb - 2
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

        prev_ref[:] = jnp.full((1, L), BIG, dtype=jnp.float32)
        prev2_ref[:] = jnp.full((1, L), BIG, dtype=jnp.float32)

        def body(d, _):
            sk_d = sk_ref[0, pl.ds(d, 1), :]                  # (1, L)
            prev = prev_ref[:]
            prev2 = prev2_ref[:]
            j = d - iota

            left = jnp.where(j >= 1, prev, BIG)               # (i, j-1)
            up = pltpu.roll(prev, shift=1, axis=1)            # (i-1, j)
            diag = pltpu.roll(prev2, shift=1, axis=1)         # (i-1, j-1)
            up = jnp.where(iota >= 1, up, BIG)
            diag = jnp.where((iota >= 1) & (j >= 1), diag, BIG)

            # tie order diag < up < left (matches scan version / dtw package)
            best = jnp.minimum(jnp.minimum(diag, up), left)
            choice = jnp.where(
                best == diag, 0, jnp.where(best == up, 1, 2)
            ).astype(jnp.int8)
            best = jnp.where((d == 0) & (iota == 0), 0.0, best)

            on_diag = (j >= 0) & (iota < L)
            new = jnp.where(on_diag, sk_d + jnp.minimum(best, BIG), BIG)
            new = jnp.minimum(new, BIG)

            dirs_ref[0, pl.ds(d, 1), :] = choice
            prev2_ref[:] = prev
            prev_ref[:] = new

            @pl.when(d == end_d)
            def _():
                cost_ref[0, 0] = jnp.sum(jnp.where(iota == la - 1, new, 0.0))

            return 0

        jax.lax.fori_loop(0, n_diag, body, 0)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def dtw_wavefront_pallas(
    sk: jnp.ndarray, lens: jnp.ndarray, interpret: bool = False
):
    """Batched wavefront DP.

    sk: (N, n_diag, L) skewed costs (align.dtw._skew, vmapped);
    lens: (N, 2) int32 [len_a, len_b] per pair.
    Returns (cost (N,), dirs (N, n_diag, L) int8)."""
    n, n_diag, L = sk.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_diag, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_diag, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, n_diag, L), jnp.int8),
        ],
        interpret=interpret,
    )(lens.astype(jnp.int32), sk.astype(jnp.float32))
    return cost[:, 0], dirs
