"""Griffin-Lim with ALL iterations fused into ONE Pallas TPU kernel.

Why: the XLA ``griffin_lim`` (dsp/griffin_lim.py) compiles the 300-iteration
fixed point into one program, but each iteration still lowers to ~8-10
separate TPU kernels (complex multiply, irfft matmul, two OLA convs, divide,
analysis conv, slice, momentum/normalize), and on this backend each
sequential kernel costs tens of µs of launch/pipeline latency — the
BENCHMARKS roofline table shows GL300 at ~100 µs/iteration, ~5% of the
bandwidth frontier, latency-bound (601 dependent small transforms). All the
per-iteration state (spectrogram, frames, signal, bases) is a few MB — it
fits VMEM — so the whole loop runs inside a single kernel where an iteration
is a chain of small MXU matmuls plus VPU ops with zero launch overhead.

Design (shaped by what Mosaic lowers well — no pads, no lane concats, no
unaligned lane slices; every data movement is a matmul or a sublane roll):

- **center=False projection.** The in-loop consistency projection uses
  uncentered framing: the synthesis frame grid and the analysis frame grid
  coincide (frame t covers y[t·hop : t·hop+n_fft] of the un-cropped OLA
  signal), making every shift hop-aligned. This is a mathematically exact
  NOLA projection (window-sum normalization included, edge frames exactly
  normalized); it differs from the XLA loop (center=True + reflect pad)
  only in the treatment of the r−1 frames at each end. Interior fixed
  points are identical; tests assert equal reconstruction quality.
- **Separate re/im planes.** Complex state is two (Fp, bins) float32
  arrays; the DFT bases are the cached matmul-DFT matrices of dsp/fft.py
  split into real/imag parts, so the transform math matches the XLA path.
- **Chunked signal layout + circular rolls.** The OLA signal lives as
  (Fp, hop) rows, Fp = F + r − 1 (exactly the OLA length, r = n_fft/hop).
  The synthesis bases are pre-chunked host-side into r lane-blocks
  (r, bins, hop); OLA is y = Σ_c roll(spec @ Bsyn[c], c) — the input rows
  beyond F are kept zero (zero magnitude rows), so the circular wrap
  injects exactly the zeros an acyclic shift would. Re-framing composes
  with the analysis matmul: frames @ Bana = Σ_c roll(y, −c) @ Bana[c·hop:
  (c+1)·hop] with Bana pre-chunked by rows (r, hop, bins). Rows ≥ F of the
  iterate are garbage after the wrap but are annihilated every iteration
  by the zero magnitude rows before they touch anything.

One iteration inside the kernel (2r + 2r small matmuls + elementwise):
    s       = mag ⊙ angles                      (re, im)
    y       = (Σ_c roll(s·Bsynᶜ, c)) ⊙ inv_wsum  OLA + NOLA normalize
    rebuilt = Σ_c roll(y, −c) · Banaᶜ            re-frame ∘ rfft
    angles  = normalize(rebuilt − μ/(1+μ)·prev);  prev = rebuilt

Same math family as the reference's ``reconstruct_signal_griffin_lim``
(``zz_audio_utilities.py:258-292``) at its 300-iteration budget
(``04_align_n_nmf.py:187``).

MEASURED OUTCOME (real TPU, artifacts/gl_pallas_tpu.json): **parity** with
the XLA loop (0.080 vs 0.075 s quiet-window medians, equal spectral
convergence). Eliminating every per-iteration kernel launch did not move
GL300 — the loop is at its serial small-tensor compute floor, not at a
dispatch-latency floor. The kernel therefore ships as an OPT-IN
engineering reference (with interpreter-mode parity tests); the XLA
``griffin_lim`` remains the production synthesis path on every backend.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from exemplars_vc_tpu.dsp.fft import _irdft_mats, _rdft_mats
from exemplars_vc_tpu.dsp.windows import get_window

_VMEM_BUDGET = 12 * 1024 * 1024


def _pad_axis(a: np.ndarray, axis: int, to: int) -> np.ndarray:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, to - a.shape[axis])
    return np.pad(a, pad)


@lru_cache(maxsize=8)
def _gl_mats(n_fft: int, hop: int, window: str, hop_pad: int | None = None):
    """Chunked float32 bases:
    bsyn_re/bsyn_im (r, bins, hop)  — irfft ∘ window, lane-chunked
    bana_re/bana_im (r, hop, bins)  — window ∘ rfft, row-chunked
    ``hop_pad``: zero-pad the hop axis to this width (the compiled kernel
    keeps the signal lanes 128-aligned; the zero columns/rows are inert).
    """
    w = np.asarray(get_window(window, n_fft, periodic=True,
                              dtype=jnp.float32), np.float32)
    CR, CI = _irdft_mats(n_fft)            # (bins, n_fft)
    C, S = _rdft_mats(n_fft)               # (n_fft, bins)
    r = n_fft // hop
    bins = n_fft // 2 + 1
    b_syn_re = (CR * w[None, :]).reshape(bins, r, hop).transpose(1, 0, 2)
    b_syn_im = (CI * w[None, :]).reshape(bins, r, hop).transpose(1, 0, 2)
    b_ana_re = (C * w[:, None]).reshape(r, hop, bins)
    b_ana_im = (S * w[:, None]).reshape(r, hop, bins)
    if hop_pad is not None and hop_pad != hop:
        b_syn_re = _pad_axis(b_syn_re, 2, hop_pad)
        b_syn_im = _pad_axis(b_syn_im, 2, hop_pad)
        b_ana_re = _pad_axis(b_ana_re, 1, hop_pad)
        b_ana_im = _pad_axis(b_ana_im, 1, hop_pad)
    return tuple(np.ascontiguousarray(a, np.float32)
                 for a in (b_syn_re, b_syn_im, b_ana_re, b_ana_im))


@lru_cache(maxsize=32)
def _inv_wsum(n_frames: int, n_fft: int, hop: int, window: str):
    """1 / window-sum in the (F+r−1, hop) chunked-signal layout (numpy)."""
    w = np.asarray(get_window(window, n_fft, periodic=True,
                              dtype=jnp.float32), np.float64)
    r = n_fft // hop
    out_len = n_fft + hop * (n_frames - 1)
    wsum = np.zeros(out_len)
    for t in range(n_frames):
        wsum[t * hop : t * hop + n_fft] += w * w
    inv = 1.0 / np.maximum(wsum, 1e-8)
    return inv.reshape(n_frames + r - 1, hop).astype(np.float32)


def supports(n_frames: int, n_fft: int, hop: int) -> bool:
    """Layout + VMEM feasibility of the fused kernel for this shape.

    Accounting: resident state (3 inputs + 2 outputs + 2 momentum scratch,
    all (Fp, bins)), the chunked bases, the two live (r, Fp, hop_p) batched
    intermediates, and the normalizer. The broadcast lhs of each batched
    matmul is NOT double-counted — Mosaic reuses those buffers
    (empirically: the production shape (688 frames, 400/80) compiles and
    runs on a 16 MB-VMEM chip; this estimate puts it at ~9.9 MB)."""
    if hop <= 0 or n_fft % hop != 0:
        return False
    bins = n_fft // 2 + 1
    r = n_fft // hop
    hop_p = -(-hop // 128) * 128
    fp = -(-(n_frames + r - 1) // 8) * 8
    fb = 7 * fp * bins + 2 * r * fp * hop_p \
        + 4 * r * bins * hop_p + 2 * fp * hop_p
    return fb * 4 < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_iter", "momentum",
                                   "interpret"))
def gl_pallas_angles(
    mag: jnp.ndarray,
    a0_re: jnp.ndarray,
    a0_im: jnp.ndarray,
    bsr: jnp.ndarray,
    bsi: jnp.ndarray,
    bar: jnp.ndarray,
    bai: jnp.ndarray,
    inv_w: jnp.ndarray,
    *,
    n_fft: int,
    hop: int,
    n_iter: int,
    momentum: float,
    interpret: bool = False,
):
    """(Fp, bins) magnitude (rows ≥ F zero) + initial phases → final phases
    (re, im) after n_iter fused GL iterations."""
    fp, bins = mag.shape
    r = n_fft // hop
    hp = inv_w.shape[1]          # padded hop lanes (128-aligned)
    mom = float(momentum) / (1.0 + float(momentum))

    # batched-matmul dimension numbers: (r, M, K) × (r, K, N) → (r, M, N).
    # Layout note: this chip's strided roll supports rotating the
    # SECOND-MINOR axis with the stride advancing along the MAJOR axis, so
    # the chunk axis must lead: (r, Fp, hp) with roll(axis=1,
    # stride_axis=0). (A lane-stacked single-matmul variant — (Fp, r·hp)
    # reshaped to (Fp, r, hp), rolling the major axis — was rejected by
    # Mosaic for exactly this constraint, and measured no faster in the
    # compiled batched form anyway; see BENCHMARKS §Kernels round 5.)
    dn = (((2,), (1,)), ((0,), (0,)))

    def kernel(mag_ref, a0r_ref, a0i_ref, bsr_ref, bsi_ref, bar_ref, bai_ref,
               iw_ref, ore_ref, oim_ref, pre_ref, pim_ref):
        ore_ref[:] = a0r_ref[:]
        oim_ref[:] = a0i_ref[:]
        pre_ref[:] = jnp.zeros_like(pre_ref)
        pim_ref[:] = jnp.zeros_like(pim_ref)

        def bmm(lhs, rhs):
            return jax.lax.dot_general(lhs, rhs, dimension_numbers=dn,
                                       preferred_element_type=jnp.float32)

        def body(_, carry):
            m = mag_ref[:]
            sre = jnp.broadcast_to(m * ore_ref[:], (r, fp, bins))
            sim = jnp.broadcast_to(m * oim_ref[:], (r, fp, bins))
            # synthesis: one batched matmul per plane, then the OLA
            # staircase (chunk c row-rolled by +c) as ONE strided roll.
            # Rows ≥ F of the spec are zero (zero mag rows), so the
            # circular wrap injects exactly the acyclic-shift zeros.
            sf = bmm(sre, bsr_ref[:]) + bmm(sim, bsi_ref[:])   # (r, Fp, hp)
            sf = pltpu.roll(sf, 0, 1, stride=1, stride_axis=0)
            y = jnp.sum(sf, axis=0) * iw_ref[:]                # (Fp, hp)
            # analysis: slot c needs roll(y, −(r−1−c)) against the
            # REVERSED row-chunked bases (host-side order) — a single
            # strided roll of the broadcast, then one batched matmul per
            # plane and a sum over chunks.
            yb = jnp.broadcast_to(y, (r, fp, hp))
            yb = pltpu.roll(yb, fp - (r - 1), 1, stride=1, stride_axis=0)
            rre = jnp.sum(bmm(yb, bar_ref[:]), axis=0)         # (Fp, bins)
            rim = jnp.sum(bmm(yb, bai_ref[:]), axis=0)
            tre = rre - mom * pre_ref[:]
            tim = rim - mom * pim_ref[:]
            pre_ref[:] = rre
            pim_ref[:] = rim
            norm = jnp.maximum(jnp.sqrt(tre * tre + tim * tim), 1e-16)
            ore_ref[:] = tre / norm
            oim_ref[:] = tim / norm
            return carry

        jax.lax.fori_loop(0, n_iter, body, 0)

    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((fp, bins), jnp.float32),
                   jax.ShapeDtypeStruct((fp, bins), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((fp, bins), jnp.float32),
                        pltpu.VMEM((fp, bins), jnp.float32)],
        interpret=interpret,
        # analysis bases enter in reversed chunk order so the in-kernel
        # staircase roll can use a single non-negative stride (see kernel)
    )(mag, a0_re, a0_im, bsr, bsi,
      jnp.flip(bar, axis=0), jnp.flip(bai, axis=0), inv_w)


def project_nocenter_reference(spec: jnp.ndarray, n_fft: int, hop: int,
                               window: str = "hann") -> jnp.ndarray:
    """Pure-jnp twin of the kernel's center=False consistency projection
    (complex in/out) — the oracle for the interpreter parity tests and the
    spec of what the fused loop computes each iteration."""
    b_syn_re, b_syn_im, b_ana_re, b_ana_im = _gl_mats(n_fft, hop, window)
    F = spec.shape[0]
    r = n_fft // hop
    re = jnp.real(spec).astype(jnp.float32)
    im = jnp.imag(spec).astype(jnp.float32)
    y = jnp.zeros((F + r - 1, hop), jnp.float32)
    for c in range(r):
        sf_c = re @ jnp.asarray(b_syn_re[c]) + im @ jnp.asarray(b_syn_im[c])
        y = y.at[c : c + F, :].add(sf_c)
    y = y * jnp.asarray(_inv_wsum(F, n_fft, hop, window))
    nb = n_fft // 2 + 1
    rre = jnp.zeros((F, nb), jnp.float32)
    rim = jnp.zeros((F, nb), jnp.float32)
    for c in range(r):
        yc = y[c : c + F, :]
        rre = rre + yc @ jnp.asarray(b_ana_re[c])
        rim = rim + yc @ jnp.asarray(b_ana_im[c])
    return jax.lax.complex(rre, rim)


def gl_angles_fused(
    magnitude: jnp.ndarray,
    angles0: jnp.ndarray,
    n_fft: int,
    hop: int,
    n_iter: int,
    momentum: float,
    window: str = "hann",
    interpret: bool = False,
) -> jnp.ndarray:
    """Complex (F, bins) magnitude + initial unit phases → final unit phases
    via the fused kernel. Host-side glue: builds the chunked bases and the
    NOLA normalizer (uploaded ONCE per shape via the device cache below —
    ~2 MB of constants must not re-cross the ~20 MB/s tunnel every call),
    zero-extends the state to Fp = F + r − 1 rows (the roll-wrap invariant),
    and splits/joins re|im (this backend cannot transfer complex64, so the
    complex views stay on device)."""
    F, nb = magnitude.shape
    r = n_fft // hop
    # compiled-layout padding: signal lanes to a 128 multiple, rows to an
    # 8 multiple (strided rolls need aligned shapes). All padding is zero
    # and provably inert: zero magnitude rows re-zero the wrapped rows
    # every iteration, zero basis columns/rows keep the padded lanes zero.
    hop_p = -(-hop // 128) * 128
    fp = -(-(F + r - 1) // 8) * 8
    bsr, bsi, bar, bai = _gl_consts_dev(n_fft, hop, window, hop_p)
    inv_w = _inv_wsum_dev(F, fp, n_fft, hop, hop_p, window)
    pad = ((0, fp - F), (0, 0))
    mag = jnp.pad(jnp.maximum(magnitude, 0.0).astype(jnp.float32), pad)
    a0_re = jnp.pad(jnp.real(angles0).astype(jnp.float32), pad)
    a0_im = jnp.pad(jnp.imag(angles0).astype(jnp.float32), pad)
    ore, oim = gl_pallas_angles(
        mag, a0_re, a0_im, bsr, bsi, bar, bai, inv_w,
        n_fft=n_fft, hop=hop, n_iter=n_iter, momentum=momentum,
        interpret=interpret)
    return jax.lax.complex(ore[:F], oim[:F])


@lru_cache(maxsize=8)
def _gl_consts_dev(n_fft: int, hop: int, window: str, hop_pad: int):
    """Device-resident chunked bases, uploaded once per shape."""
    return tuple(jnp.asarray(a) for a in _gl_mats(n_fft, hop, window, hop_pad))


@lru_cache(maxsize=32)
def _inv_wsum_dev(n_frames: int, fp: int, n_fft: int, hop: int,
                  hop_pad: int, window: str) -> jnp.ndarray:
    """Device-resident padded NOLA normalizer, uploaded once per shape."""
    iw = np.zeros((fp, hop_pad), np.float32)
    iw[: n_frames + n_fft // hop - 1, :hop] = _inv_wsum(
        n_frames, n_fft, hop, window)
    return jnp.asarray(iw)
