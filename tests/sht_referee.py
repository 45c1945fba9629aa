"""Shared scalar SHT referee on a Gauss-Legendre x FFT grid.

Used by the curved-covariance Monte Carlo referees (test_curved.py)
and the MASTER coupling referees (test_bandpowers.py): synthesize
Gaussian skies from per-m coefficient batches, mask them, analyze
pseudo-powers.  Round-trip exactness (unmasked pseudo-power equals the
input Sum_m factor |a_lm|^2 to ~1e-11) is asserted where used.
"""

import numpy as np


def _sht_lambda_tables(lmax, x):
    """Orthonormal associated Legendre λ_lm(x) = N_lm P_l^m, listed per
    m as (lmax+1-m, len(x)) arrays (stable m-diagonal seed + upward ℓ
    recursion; round-trip exact to 7e-12, asserted in the referee)."""
    x = np.asarray(x, float)
    sx = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    out = []
    lam_mm = np.full_like(x, np.sqrt(1.0 / (4.0 * np.pi)))
    for m in range(lmax + 1):
        rows = np.zeros((lmax + 1 - m, x.size))
        rows[0] = lam_mm
        if m + 1 <= lmax:
            rows[1] = x * np.sqrt(2.0 * m + 3.0) * lam_mm
        for ell in range(m + 2, lmax + 1):
            a = np.sqrt((4.0 * ell * ell - 1.0) / (ell * ell - m * m))
            b = np.sqrt(((ell - 1.0) ** 2 - m * m)
                        / (4.0 * (ell - 1.0) ** 2 - 1.0))
            rows[ell - m] = a * (x * rows[ell - m - 1]
                                 - b * rows[ell - m - 2])
        out.append(rows)
        lam_mm = -np.sqrt((2.0 * m + 3.0) / (2.0 * m + 2.0)) * sx * lam_mm
    return out


def _sht_synth(lams, a_re, a_im, n_phi):
    """Batched synthesis: maps (n_real, n_lat, n_phi) from per-m
    coefficient batches (FFT in azimuth)."""
    n_real, n_lat = a_re[0].shape[0], lams[0].shape[1]
    spec = np.zeros((n_real, n_lat, n_phi // 2 + 1), dtype=complex)
    for m in range(len(lams)):
        spec[:, :, m] = ((a_re[m] + 1j * a_im[m]) @ lams[m]).conj()
    return np.fft.irfft(spec.conj(), n=n_phi, axis=2) * n_phi


def _sht_pseudo_power(lams, maps, wq, n_phi):
    """Pseudo-power P̃_ℓ = Σ_m |ã_ℓm|² of (n_real, n_lat, n_phi) maps
    (GL quadrature in latitude, FFT in azimuth)."""
    f = np.fft.rfft(maps, axis=2) * (2.0 * np.pi / n_phi)
    lmax = len(lams) - 1
    ps = np.zeros((maps.shape[0], lmax + 1))
    for m in range(lmax + 1):
        alm = (f[:, :, m] * wq[None, :]) @ lams[m].T
        ps[:, m:] += (1.0 if m == 0 else 2.0) * np.abs(alm) ** 2
    return ps


def gaussian_alm_batch(rng, cl, lmax, n_real):
    """(a_re, a_im) per-m coefficient batches for Gaussian skies with
    spectrum ``cl`` (len lmax+1): m = 0 real with variance C_l, m > 0
    complex with variance C_l/2 per component (the Σ_m factor-2
    convention of _sht_pseudo_power)."""
    a_re, a_im = [], []
    for m in range(lmax + 1):
        sig = np.sqrt(np.maximum(cl[m:], 0.0) * (1.0 if m == 0 else 0.5))
        a_re.append(rng.normal(size=(n_real, lmax + 1 - m)) * sig)
        a_im.append(np.zeros((n_real, lmax + 1 - m)) if m == 0
                    else rng.normal(size=(n_real, lmax + 1 - m)) * sig)
    return a_re, a_im
