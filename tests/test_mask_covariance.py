"""Survey-mask Gaussian covariance (chomp_tpu.mask): uniform-limit
equality, disc-mask Monte Carlo referee, noise closure.

The MC referee is the VERDICT round-2 missing-#3 done-criterion: a
brute-force masked flat sky — Gaussian field with known C(q), binary
disc mask, FFT pair-normalized w(theta) estimator — against the
analytic coupled formula.  MC error with n_mc realizations is
~sqrt(2/n_mc) per covariance entry (4% at 1200), plus pixelization of
the thinnest annuli; tolerances reflect that.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import covariance
from chomp_tpu.mask import (
    DiscMask,
    UniformMask,
    masked_gaussian_covariance,
    pair_normalization,
)

OMEGA_S = 0.1
N2D = 3.0e7


def cl_powerlaw(ells):
    return 1.0e-6 * (np.asarray(ells) / 100.0) ** -1.4


def test_uniform_mask_reduces_to_gaussian_covariance():
    """UniformMask(Omega_s) must equal covariance.gaussian_covariance
    exactly (same integrand, D_i = A_i Omega_s, delta limit only)."""
    edges = covariance.theta_bin_edges_deg(n_bins=6)
    ref = np.asarray(covariance.gaussian_covariance(
        lambda e: jnp.asarray(cl_powerlaw(e)), edges, N2D, OMEGA_S,
        n_ell_cov=1024))
    got = np.asarray(masked_gaussian_covariance(
        lambda e: jnp.asarray(cl_powerlaw(e)), edges, N2D,
        UniformMask(OMEGA_S), n_ell_cov=1024))
    np.testing.assert_allclose(got, ref, rtol=1e-10)


def test_disc_mask_structure():
    """Disc closed forms: pair function limits, D_i monotonicity, and
    the masked covariance exceeding the naive uniform one for bins
    approaching the footprint scale (fewer pairs -> more variance)."""
    r = 0.05
    m = DiscMask(r)
    np.testing.assert_allclose(m.pair_function(0.0), np.pi * r * r,
                               rtol=1e-12)
    assert m.pair_function(2.1 * r) == 0.0
    edges = np.degrees(np.array([0.002, 0.004, 0.01, 0.02, 0.04, 0.08]))
    d = pair_normalization(m, np.radians(edges))
    a_i = np.pi * (np.radians(edges[1:]) ** 2 - np.radians(edges[:-1]) ** 2)
    frac = d / (a_i * m.area2)
    assert np.all(np.diff(frac) < 0) and frac[0] > 0.9 and frac[-1] < 0.5
    cov_m = np.asarray(masked_gaussian_covariance(
        lambda e: jnp.asarray(cl_powerlaw(e)), edges, N2D, m,
        n_ell_cov=1024))
    ev = np.linalg.eigvalsh(0.5 * (cov_m + cov_m.T))
    assert np.all(ev > 0)
    # Noise-only comparison (the signal part is NOT monotone under
    # masking: coupling also suppresses super-survey power): fewer
    # pairs in the footprint -> strictly more shot variance than the
    # uniform-footprint formula, growing toward the mask scale.
    zero_cl = lambda e: jnp.zeros(len(np.asarray(e)))
    noise_m = np.diag(np.asarray(masked_gaussian_covariance(
        zero_cl, edges, N2D, m, n_ell_cov=512)))
    noise_u = np.diag(np.asarray(masked_gaussian_covariance(
        zero_cl, edges, N2D, UniformMask(m.area2), n_ell_cov=512)))
    assert np.all(noise_m > noise_u)
    assert (noise_m / noise_u)[-1] > (noise_m / noise_u)[0]


def _mc_setup():
    n, box = 256, 2.0
    a = box / n
    x = (np.arange(n) - n // 2) * a
    xg, yg = np.meshgrid(x, x, indexing="ij")
    radius = 0.5
    w = ((xg**2 + yg**2) <= radius**2).astype(float)
    q1 = 2 * np.pi * np.fft.fftfreq(n, d=a)
    qx, qy = np.meshgrid(q1, q1, indexing="ij")
    qq = np.sqrt(qx**2 + qy**2)
    rx = np.minimum(np.arange(n), n - np.arange(n)) * a
    rxg, ryg = np.meshgrid(rx, rx, indexing="ij")
    r = np.sqrt(rxg**2 + ryg**2)
    # Bins >= 8 pixels wide (pixelization of thinner annuli dominates
    # the comparison otherwise).
    edges = np.array([0.07, 0.13, 0.21, 0.33, 0.5])
    binm = np.stack([((r >= lo) & (r < hi)).ravel()
                     for lo, hi in zip(edges[:-1], edges[1:])])
    rr = (np.real(np.fft.ifft2(np.abs(np.fft.fft2(w)) ** 2)) * a * a).ravel()
    d_grid = binm @ rr * a * a
    return n, a, w, qq, edges, binm, d_grid, radius


def _mc_run(field_amp, n_mc, seed, batch: int = 48):
    """Batched over realizations (one (B, N, N) FFT stack per step):
    ~6x faster than the realization-at-a-time loop that made this the
    single slowest test in the suite (268 s -> well under a minute)."""
    n, a, w, qq, edges, binm, d_grid, radius = _mc_setup()
    rng = np.random.default_rng(seed)
    binm_f = binm.astype(float)
    nb = binm.shape[0]
    west = np.empty((n_mc, nb))
    for s in range(0, n_mc, batch):
        b = min(batch, n_mc - s)
        wn = rng.standard_normal((b, n, n))
        d = np.real(np.fft.ifft2(np.fft.fft2(wn, axes=(-2, -1))
                                 * field_amp, axes=(-2, -1)))
        f = np.fft.fft2(w * d, axes=(-2, -1))
        cw = (np.real(np.fft.ifft2(np.abs(f) ** 2, axes=(-2, -1)))
              * a * a).reshape(b, -1)
        west[s:s + b] = (cw @ binm_f.T) * a * a / d_grid
    return np.cov(west.T)


@pytest.mark.slow
def test_disc_mask_mc_referee_signal():
    """Signal-only masked covariance vs 1200-realization MC: diagonal
    within MC noise + pixelization (20%), leading off-diagonals too."""
    n, a, w, qq, edges, binm, d_grid, radius = _mc_setup()

    def cq(q):
        return 1.0 / (1.0 + (np.asarray(q) / 20.0) ** 2.2)

    amp = np.sqrt(cq(qq) / (a * a))
    cov_mc = _mc_run(amp, 1200, seed=11)
    cov_an = np.asarray(masked_gaussian_covariance(
        lambda e: jnp.asarray(cq(e)), np.degrees(edges), np.inf,
        DiscMask(radius), n_ell_cov=1024, ell_lo=0.5,
        ell_hi=2 * np.pi / a / 1.2, n_phi=128))
    ratio = np.diag(cov_mc) / np.diag(cov_an)
    assert np.all((ratio > 0.8) & (ratio < 1.25)), ratio
    # Adjacent-bin correlations (well above MC noise).
    for i in range(3):
        assert abs(cov_mc[i, i + 1] / cov_an[i, i + 1] - 1.0) < 0.3
    # And the naive uniform formula is measurably WRONG here (the whole
    # point): it underestimates the largest-bin variance by >40%.
    cov_naive = np.asarray(masked_gaussian_covariance(
        lambda e: jnp.asarray(cq(e)), np.degrees(edges), np.inf,
        UniformMask(DiscMask(radius).area2), n_ell_cov=1024, ell_lo=0.5,
        ell_hi=2 * np.pi / a / 1.2))
    assert np.diag(cov_mc)[-1] / np.diag(cov_naive)[-1] > 1.4


@pytest.mark.slow
def test_disc_mask_mc_referee_noise():
    """Pure shot/pixel noise: the exact masked pair-count closure
    2 N² / D_i against a noise-only MC."""
    n, a, w, qq, edges, binm, d_grid, radius = _mc_setup()
    sigma_pix = 1.0
    n_q = sigma_pix**2 * a * a          # white spectrum == 1/n2d analog
    amp = np.full((n, n), np.sqrt(n_q / (a * a)))
    cov_mc = _mc_run(amp, 800, seed=13)
    expected = 2.0 * n_q**2 / d_grid
    ratio = np.diag(cov_mc) / expected
    assert np.all((ratio > 0.85) & (ratio < 1.15)), ratio
    # Off-diagonals vanish within MC noise (~sqrt(2 var_i var_j/n_mc)).
    dg = np.diag(cov_mc)
    bound = 5.0 * np.sqrt(2.0 * np.outer(dg, dg) / 800)
    off = np.abs(cov_mc - np.diag(dg))
    assert np.all(off <= bound), (off / bound)


def test_gaussian_block_mask_parameter():
    """gaussian_block(mask=...) (the VERDICT-letter API): UniformMask
    equals the unmasked formula exactly; DiscMask in the pure
    delta-limit equals masked_gaussian_covariance with the coupling
    disabled; works for the J2 block too."""
    edges = covariance.theta_bin_edges_deg(n_bins=5)

    def cl(e):
        return jnp.asarray(cl_powerlaw(e))

    n = 1.0 / N2D
    ref = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, edges, edges, OMEGA_S, 0, 0, n, n, n, n,
        n_ell_cov=512))
    uni = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, edges, edges, 12345.0, 0, 0, n, n, n, n,
        n_ell_cov=512, mask=UniformMask(OMEGA_S)))
    np.testing.assert_allclose(uni, ref, rtol=1e-10)

    disc = DiscMask(0.17)
    blk = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, edges, edges, 0.0, 0, 0, n, n, n, n,
        n_ell_cov=512, mask=disc))
    # masked_gaussian_covariance in the pure delta limit (resolve factor
    # pushes q* below the grid) must coincide: same prefactors, same
    # masked noise closure.  Note its cl_fn form computes Ct^2 - N^2
    # with N = 1/n2d while the 4-leg block with all noises=n gives
    # nn = 2 N^2 — identical algebra.
    mg = np.asarray(masked_gaussian_covariance(
        cl, edges, N2D, disc, n_ell_cov=512, resolve_factor=1e12))
    np.testing.assert_allclose(blk, mg, rtol=1e-9)
    # J2 block with a mask: runs, symmetric, positive diagonal.
    blk2 = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, edges, edges, 0.0, 2, 2, n, 1e-9, 0.0, 0.0,
        n_ell_cov=512, mask=disc))
    np.testing.assert_allclose(blk2, blk2.T, rtol=1e-8)
    assert np.all(np.diag(blk2) > 0)
