"""Float64 oracle of SPTK's mel-cepstral analysis (``pysptk.mcep``).

The reference extracts MCEPs with ``pysptk.mcep(order=25, alpha=0.42)`` on
blackman(400)-windowed frames (``/root/reference/01_make_dict_parallel.py:126-129``).
SPTK's mcep implements Fukada et al., "An adaptive algorithm for mel-cepstral
analysis of speech", ICASSP 1992: find the mel-cepstrum c minimizing

    E(c) = (1/N) sum_k [ exp(R_k) - R_k - 1 ],
    R_k  = log I(w_k) - log |D(w_k)|^2,
    log |D(w)| = sum_{m=0}^{M} c_m cos(m * wt(w)),

where I is the periodogram |FFT(x, N)|^2 on the uniform N-point circle grid
and wt is the first-order all-pass warped frequency with factor alpha.

SPTK's Newton iteration computes the gradient/Hessian via warped
autocorrelations of exp(R): with r(tau) = (1/N) sum_k exp(R_k) cos(tau*wt_k),

    dE/dc_m      = -(2/N) sum_k (exp(R_k) - 1) cos(m wt_k)
    d2E/dc_m dc_l = (2/N) sum_k exp(R_k) [cos((m-l)wt_k) + cos((m+l)wt_k)]
                 = 2 [ r(|m-l|) + r(m+l) ]            (Toeplitz + Hankel)

and solves the Toeplitz-plus-Hankel system (SPTK's ``theq``). E is CONVEX in
c (its Hessian is 4 Phi^T diag(w e^R) Phi >= 0), so the minimizer is unique:
any correctly-converged solver — SPTK's, or this one — lands on the same c
for the same periodogram grid. This oracle forms the same Hessian densely
(order+1 is 26; no need for the Toeplitz trick at this size), runs damped
Newton in float64 until ||delta||_inf < 1e-12, and is therefore the exact
minimizer of the criterion SPTK iterates on.

Grid note: pysptk.mcep with itype=0 (windowed waveform input) uses
N = len(x) as the FFT length, i.e. N = 400 and 201 half-circle bins for the
reference's calls; tests pass n_fft explicitly to match.
"""

from __future__ import annotations

import numpy as np


def warped_phase(omega: np.ndarray, alpha: float) -> np.ndarray:
    """Phase response of the all-pass z~^-1 = (z^-1 - a)/(1 - a z^-1)."""
    return omega + 2.0 * np.arctan2(
        alpha * np.sin(omega), 1.0 - alpha * np.cos(omega)
    )


def criterion(c: np.ndarray, log_I: np.ndarray, phi: np.ndarray,
              w: np.ndarray) -> float:
    R = log_I - 2.0 * (phi @ c)
    eR = np.exp(np.clip(R, -700.0, 700.0))
    return float(np.sum(w * (eR - R - 1.0)))


def mcep_oracle(
    x: np.ndarray,
    order: int = 25,
    alpha: float = 0.42,
    n_fft: int | None = None,
    max_iter: int = 200,
    tol: float = 1e-12,
    floor_rel: float = 1e-8,
) -> np.ndarray:
    """Mel-cepstrum of one windowed frame, converged to machine precision.

    x: float64 windowed frame (the caller applies blackman(400) as the
    reference does). Returns c of shape (order+1,) float64.
    """
    x = np.asarray(x, dtype=np.float64)
    N = int(n_fft or len(x))
    spec = np.abs(np.fft.rfft(x, N)) ** 2
    # periodogram floor (SPTK guards log(0); relative floor like the kernel)
    spec = np.maximum(spec, floor_rel * spec.max() + 1e-300)
    log_I = np.log(spec)

    n_bins = N // 2 + 1
    omega = 2.0 * np.pi * np.arange(n_bins) / N
    wt = warped_phase(omega, alpha)
    phi = np.cos(np.outer(wt, np.arange(order + 1)))  # (n_bins, M+1)
    # half-circle weights equivalent to the uniform full-circle sum
    w = np.ones(n_bins)
    w[0] = 0.5
    if N % 2 == 0:
        w[-1] = 0.5
    w *= 2.0 / N

    # any init works (the criterion is convex); weighted LS log-smoothing
    phiw = phi * w[:, None]
    c = np.linalg.solve(phi.T @ phiw, phiw.T @ (0.5 * log_I))

    E = criterion(c, log_I, phi, w)
    for _ in range(max_iter):
        R = log_I - 2.0 * (phi @ c)
        eR = np.exp(np.clip(R, -700.0, 700.0))
        g = -2.0 * (phi.T @ (w * (eR - 1.0)))
        H = 4.0 * (phi.T * (w * eR)) @ phi
        delta = np.linalg.solve(H, -g)
        # damped: backtrack if the (convex) criterion fails to decrease
        step = 1.0
        for _ in range(60):
            c_new = c + step * delta
            E_new = criterion(c_new, log_I, phi, w)
            if E_new <= E:
                break
            step *= 0.5
        c, E = c_new, E_new
        if np.max(np.abs(step * delta)) < tol:
            break
    return c


def mcep_frames_oracle(
    frames: np.ndarray, order: int = 25, alpha: float = 0.42,
    n_fft: int | None = None,
) -> np.ndarray:
    """(n_frames, frame_length) windowed frames -> (n_frames, order+1)."""
    return np.stack(
        [mcep_oracle(f, order=order, alpha=alpha, n_fft=n_fft) for f in frames]
    )
