"""Generate the committed golden arrays under tests/goldens/.

Run from the repo root:  python -m tests.oracles.make_goldens

Goldens are float64 oracle outputs on the bundled VCC utterances
(/root/reference/data/{SF1,TF1}/*.wav) with the reference's exact analysis
parameters (frame 400 / hop 80 / blackman / order 25 / alpha 0.42 —
``01_make_dict_parallel.py:126-129``). Frames are subsampled on a fixed
stride so the files stay small while covering every utterance.
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

REF_DATA = "/root/reference/data"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "goldens")
FRAME, HOP, ORDER, ALPHA, STRIDE = 400, 80, 25, 0.42, 23


def blackman_exact(n: int) -> np.ndarray:
    """Symmetric Blackman window in float64 (numpy's definition, which is
    also pysptk.blackman's)."""
    m = np.arange(n, dtype=np.float64)
    return (0.42 - 0.5 * np.cos(2 * np.pi * m / (n - 1))
            + 0.08 * np.cos(4 * np.pi * m / (n - 1)))


def make_mcep_goldens() -> None:
    from exemplars_vc_tpu.io import read_wav
    from tests.oracles.sptk_mcep import mcep_frames_oracle

    win = blackman_exact(FRAME)
    out: dict[str, np.ndarray] = {}
    for spk in ("SF1", "TF1"):
        for fn in sorted(os.listdir(os.path.join(REF_DATA, spk))):
            if not fn.endswith(".wav"):
                continue
            x, sr = read_wav(os.path.join(REF_DATA, spk, fn))
            x = np.asarray(x, dtype=np.float64)
            n = (len(x) - FRAME) // HOP + 1
            idx = np.arange(0, n, STRIDE)
            frames = np.stack([x[i * HOP : i * HOP + FRAME] for i in idx]) * win
            c = mcep_frames_oracle(frames, order=ORDER, alpha=ALPHA, n_fft=FRAME)
            key = f"{spk}_{fn[:-4]}"
            out[f"{key}_frames"] = idx.astype(np.int32)
            out[f"{key}_mcep"] = c
            print(f"{key}: {len(idx)} frames, c0 range "
                  f"[{c[:, 0].min():.2f}, {c[:, 0].max():.2f}]")
    path = os.path.join(OUT_DIR, "mcep_sptk_oracle.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes")


# WORLD golden parameters: 5 ms frames, fft 1024 (= WORLD's default for
# fs=16k, f0_floor=71), frames subsampled so the files stay small.
W_HOP_MS, W_FFT, W_STRIDE = 5.0, 1024, 29
WORLD_UTTS = (("SF1", "100001"), ("SF1", "100005"),
              ("TF1", "100002"), ("TF1", "100008"))


def make_world_goldens() -> None:
    """CheapTrick envelopes from the float64 oracle, on a COMMITTED f0
    contour (the repo's estimator output, stored alongside, so the golden is
    a pure function of the committed inputs — f0 estimation parity is tested
    separately)."""
    import jax.numpy as jnp

    from exemplars_vc_tpu.io import read_wav
    from exemplars_vc_tpu.world.f0 import estimate_f0, refine_f0_stonemask
    from tests.oracles.world_cheaptrick import cheaptrick_oracle

    out: dict[str, np.ndarray] = {}
    for spk, name in WORLD_UTTS:
        x, sr = read_wav(os.path.join(REF_DATA, spk, name + ".wav"))
        xj = jnp.asarray(x, jnp.float32)
        f0, _ = estimate_f0(xj, sr=sr, frame_period_ms=W_HOP_MS)
        f0 = np.asarray(
            refine_f0_stonemask(xj, f0, sr=sr, frame_period_ms=W_HOP_MS)
        ).astype(np.float64)
        hop = int(round(sr * W_HOP_MS / 1000.0))
        sel = np.arange(0, len(f0), W_STRIDE)
        env = cheaptrick_oracle(
            np.asarray(x, np.float64), sr, f0[sel], sel * hop / sr,
            fft_size=W_FFT,
        )
        key = f"{spk}_{name}"
        out[f"{key}_f0"] = f0
        out[f"{key}_sel"] = sel.astype(np.int32)
        out[f"{key}_sp"] = env.astype(np.float32)  # compared at ~0.1 dB
        print(f"{key}: {len(sel)} frames, voiced {(f0 > 0).sum()}/{len(f0)}")
    path = os.path.join(OUT_DIR, "world_cheaptrick_oracle.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes")


def make_d4c_goldens() -> None:
    """D4C aperiodicity from the float64 oracle on the SAME committed f0
    contours as the cheaptrick goldens."""
    from exemplars_vc_tpu.io import read_wav
    from tests.oracles.world_d4c import d4c_oracle

    cheap = np.load(os.path.join(OUT_DIR, "world_cheaptrick_oracle.npz"))
    out: dict[str, np.ndarray] = {}
    for spk, name in WORLD_UTTS:
        key = f"{spk}_{name}"
        x, sr = read_wav(os.path.join(REF_DATA, spk, name + ".wav"))
        f0 = cheap[f"{key}_f0"]
        sel = cheap[f"{key}_sel"]
        hop = int(round(sr * W_HOP_MS / 1000.0))
        ap = d4c_oracle(np.asarray(x, np.float64), sr, f0[sel],
                        sel * hop / sr, W_FFT)
        out[f"{key}_ap"] = ap.astype(np.float32)
        print(f"{key}: {len(sel)} frames, ap range "
              f"[{ap.min():.4f}, {ap.max():.6f}]")
    path = os.path.join(OUT_DIR, "world_d4c_oracle.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    os.makedirs(OUT_DIR, exist_ok=True)
    make_mcep_goldens()
    make_world_goldens()
    make_d4c_goldens()


if __name__ == "__main__":
    main()
