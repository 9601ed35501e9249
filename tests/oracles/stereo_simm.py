"""Float64 numpy oracle of pyfasst's Stereo_SIMM estimation.

Independent from-scratch implementation of the damped multiplicative-update
schedule published in Durrieu et al. (IEEE TASLP 2010) as realized by the
reference's vendored ``SeparateLeadStereo/SIMM/SIMM.py:397`` (``Stereo_SIMM``):
update order HF0 → HPHI → HM → HGAMMA → WM → α → β per iteration, with the
normalization/energy-shipping conventions and the 0.1·ω damping on the
mixing gains. Used to pin ``exemplars_vc_tpu.separate.stereo_simm`` —
the JAX module is validated against this float64 trajectory, not against
installed pyfasst (which does not exist in this image; see PARITY.md).
"""

from __future__ import annotations

import numpy as np

EPS = 1e-20


def _colnorm(M):
    s = M.sum(axis=0)
    out = M.copy()
    nz = s > 0
    out[:, nz] = out[:, nz] / s[nz]
    return out, s


def stereo_simm_oracle(SXR, SXL, WF0, WGAMMA, HGAMMA, HPHI, HF0, WM, HM,
                       alpha=(0.5, 0.5), beta=None, n_iter=10, omega=1.0,
                       update_hgamma=True, update_accomp=True):
    """Run n_iter Stereo-SIMM iterations in float64; return the parameter
    dict and the per-iteration IS reconstruction error."""
    SXR = np.asarray(SXR, np.float64)
    SXL = np.asarray(SXL, np.float64)
    WF0 = np.asarray(WF0, np.float64)
    WGAMMA = np.asarray(WGAMMA, np.float64)
    HGAMMA = np.array(HGAMMA, np.float64)
    HPHI = np.array(HPHI, np.float64)
    HF0 = np.array(HF0, np.float64)
    WM = np.array(WM, np.float64)
    HM = np.array(HM, np.float64)
    aR, aL = float(alpha[0]), float(alpha[1])
    if beta is None:
        raise ValueError("pass explicit beta for deterministic parity")
    bR = np.array(beta[0], np.float64)
    bL = np.array(beta[1], np.float64)
    pw = omega
    pg = 0.1 * omega

    def recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM):
        SF0 = WF0 @ HF0
        SPHI = (WGAMMA @ HGAMMA) @ HPHI
        lead = SF0 * SPHI
        hatR = np.maximum(aR ** 2 * lead + (WM * bR ** 2) @ HM, EPS)
        hatL = np.maximum(aL ** 2 * lead + (WM * bL ** 2) @ HM, EPS)
        return SF0, SPHI, lead, hatR, hatL

    errs = []
    for _ in range(n_iter):
        WPHI = WGAMMA @ HGAMMA

        # HF0
        SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
        comR = aR ** 2 * SPHI / hatR
        comL = aL ** 2 * SPHI / hatL
        num = comR * SXR / hatR + comL * SXL / hatL
        den = comR + comL
        HF0 = HF0 * (WF0.T @ num / np.maximum(WF0.T @ den, EPS)) ** pw

        # HPHI + renorm into HF0
        SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
        comR = aR ** 2 * SF0 / hatR
        comL = aL ** 2 * SF0 / hatL
        num = comR * SXR / hatR + comL * SXL / hatL
        den = comR + comL
        HPHI = HPHI * (WPHI.T @ num / np.maximum(WPHI.T @ den, EPS)) ** pw
        HPHI, s = _colnorm(HPHI)
        HF0 = HF0 * s[None, :]

        # HM
        if update_accomp:
            SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
            WMR = WM * bR ** 2
            WML = WM * bL ** 2
            num = WMR.T @ (SXR / hatR ** 2) + WML.T @ (SXL / hatL ** 2)
            den = WMR.T @ (1.0 / hatR) + WML.T @ (1.0 / hatL)
            HM = HM * (num / np.maximum(den, EPS)) ** pw

        # HGAMMA + double renorm
        if update_hgamma:
            SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
            comR = aR ** 2 * SF0 / hatR
            comL = aL ** 2 * SF0 / hatL
            num = comR * SXR / hatR + comL * SXL / hatL
            den = comR + comL
            HGAMMA = HGAMMA * (
                WGAMMA.T @ (num @ HPHI.T)
                / np.maximum(WGAMMA.T @ (den @ HPHI.T), EPS)) ** pw
            HGAMMA, sg = _colnorm(HGAMMA)
            HPHI = HPHI * sg[:, None]
            HPHI, s = _colnorm(HPHI)
            HF0 = HF0 * s[None, :]

        # WM + renorm into HM
        if update_accomp:
            SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
            num = ((SXR / hatR ** 2) @ (HM.T * (bR ** 2)[None, :])
                   + (SXL / hatL ** 2) @ (HM.T * (bL ** 2)[None, :]))
            den = ((1.0 / hatR) @ (HM.T * (bR ** 2)[None, :])
                   + (1.0 / hatL) @ (HM.T * (bL ** 2)[None, :]))
            WM = WM * (num / np.maximum(den, EPS)) ** pw
            WM, sw = _colnorm(WM)
            HM = HM * sw[:, None]

        # alpha
        SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
        dR = lead / hatR
        aR = max(aR * (np.sum(dR * SXR / hatR) / np.sum(dR)) ** pg, EPS)
        dL = lead / hatL
        aL = max(aL * (np.sum(dL * SXL / hatL) / np.sum(dL)) ** pg, EPS)
        aR = aR / max(aR + aL, 1e-3)
        aL = 1.0 - aR

        # beta
        if update_accomp:
            SF0, SPHI, lead, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
            numR = np.einsum("fr,fn,rn->r", WM, SXR / hatR ** 2, HM)
            denR = np.einsum("fr,fn,rn->r", WM, 1.0 / hatR, HM)
            bR = bR * (numR / np.maximum(denR, EPS)) ** pg
            numL = np.einsum("fr,fn,rn->r", WM, SXL / hatL ** 2, HM)
            denL = np.einsum("fr,fn,rn->r", WM, 1.0 / hatL, HM)
            bL = bL * (numL / np.maximum(denL, EPS)) ** pg
            bR = bR / np.maximum(bR + bL, EPS)
            bL = 1.0 - bR

        _, _, _, hatR, hatL = recon(aR, aL, HGAMMA, HPHI, HF0, bR, bL, HM, WM)
        rR = SXR / hatR
        rL = SXL / hatL
        errs.append(float(np.sum(rR - np.log(np.maximum(rR, EPS)) - 1.0)
                          + np.sum(rL - np.log(np.maximum(rL, EPS)) - 1.0)))

    return dict(alpha=np.array([aR, aL]), HGAMMA=HGAMMA, HPHI=HPHI, HF0=HF0,
                beta=np.stack([bR, bL]), HM=HM, WM=WM,
                is_error=np.asarray(errs))
