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


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
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
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "mcep_sptk_oracle.npz")
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
