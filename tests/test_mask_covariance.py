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
    # masked_gaussian_covariance at DEFAULT settings must coincide —
    # gaussian_block now carries the same full low-ell coupling block
    # (its Ct^2 - N^2 integrand with N = 1/n2d equals the 4-leg
    # nn = 2 N^2 algebra identically).
    mg = np.asarray(masked_gaussian_covariance(
        cl, edges, N2D, disc, n_ell_cov=512))
    # (identical algebra, different fp association in the noise
    # subtraction: ~5e-8 relative)
    np.testing.assert_allclose(blk, mg, rtol=1e-6)
    # J2 block with a mask: runs, symmetric, positive diagonal.
    blk2 = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, edges, edges, 0.0, 2, 2, n, 1e-9, 0.0, 0.0,
        n_ell_cov=512, mask=disc))
    np.testing.assert_allclose(blk2, blk2.T, rtol=1e-8)
    assert np.all(np.diag(blk2) > 0)


def test_pixel_mask_matches_disc():
    """PixelMask on a pixelized disc reproduces the analytic DiscMask:
    areas, pair function, |W2~|^2 at low q, and the full masked
    covariance to pixelization accuracy."""
    from chomp_tpu.mask import PixelMask

    radius = 0.5
    n, box = 512, 2.0
    a = box / n
    x = (np.arange(n) - n // 2 + 0.5) * a
    xg, yg = np.meshgrid(x, x, indexing="ij")
    pm = PixelMask(((xg**2 + yg**2) <= radius**2).astype(float), a)
    dm = DiscMask(radius)
    assert abs(pm.area2 / dm.area2 - 1.0) < 5e-3
    assert abs(pm.area4 / dm.area4 - 1.0) < 5e-3
    th = np.array([0.05, 0.2, 0.5, 0.9])
    np.testing.assert_allclose(pm.pair_function(th), dm.pair_function(th),
                               rtol=2e-2)
    # wtilde2_sq is a band average (nearest-shell) — compare its
    # INTEGRAL against the analytic Airy (Parseval: both must carry
    # the same total mask power), not pointwise values.
    qg = np.linspace(0.0, 200.0, 4001)
    ip = np.trapezoid(pm.wtilde2_sq(qg) * qg, qg)
    idd = np.trapezoid(dm.wtilde2_sq(qg) * qg, qg)
    assert abs(ip / idd - 1.0) < 0.02, (ip, idd)
    assert abs(pm.coupling_width / dm.coupling_width - 1.0) < 5e-3
    # End-to-end masked covariance: pixel vs analytic disc.
    edges = np.degrees(np.array([0.07, 0.13, 0.21, 0.33, 0.5]))

    def cl(e):
        return jnp.asarray(1.0 / (1.0 + (np.asarray(e) / 20.0) ** 2.2))

    cov_p = np.asarray(masked_gaussian_covariance(
        cl, edges, 1e6, pm, n_ell_cov=512, ell_lo=0.5, ell_hi=300.0))
    cov_d = np.asarray(masked_gaussian_covariance(
        cl, edges, 1e6, dm, n_ell_cov=512, ell_lo=0.5, ell_hi=300.0))
    np.testing.assert_allclose(np.diag(cov_p), np.diag(cov_d), rtol=0.05)
    # Content-hash caching: equal maps are equal masks (coupling-matrix
    # cache hits), different maps are not.
    pm2 = PixelMask(((xg**2 + yg**2) <= radius**2).astype(float), a)
    assert pm == pm2 and hash(pm) == hash(pm2)
    pm3 = PixelMask(((xg**2 + yg**2) <= (0.9 * radius) ** 2).astype(float),
                    a)
    assert pm != pm3


@pytest.mark.slow
def test_disc_mask_mc_referee_joint_spin2():
    """Spin-2 masked MC referee: correlated (delta_g, kappa) Gaussian
    fields, shear gamma = e^{2i phi} kappa, masked pair-normalized
    w_gg AND gamma_t estimators on a disc footprint — the full
    [w, gt] x [w, gt] Gaussian covariance against
    covariance.gaussian_block(mask=...) (which applies the same
    coupling matrix to the spin-2 blocks at narrow-kernel order).
    Also checks the gamma_t MC MEAN against the J2 Hankel of C_gk
    (convention anchor).  Signal-only (no shot/shape noise)."""
    n, a, w, qq, edges, binm, d_grid, radius = _mc_setup()

    def c_gg(q):
        return 1.0 / (1.0 + (np.asarray(q) / 20.0) ** 2.2)

    def c_kk(q):
        return 0.6 / (1.0 + (np.asarray(q) / 15.0) ** 2.0)

    def c_gk(q):
        # strong but sub-Cauchy-Schwarz cross-correlation
        return 0.7 * np.sqrt(c_gg(q) * c_kk(q))

    amp_k = np.sqrt(c_kk(qq)) / a
    amp_g1 = c_gk(qq) / np.maximum(np.sqrt(c_kk(qq)), 1e-30) / a
    amp_g2 = np.sqrt(np.maximum(c_gg(qq) - c_gk(qq) ** 2 / np.maximum(
        c_kk(qq), 1e-30), 0.0)) / a
    q1 = 2 * np.pi * np.fft.fftfreq(n, d=a)
    qxg, qyg = np.meshgrid(q1, q1, indexing="ij")
    qc = qxg + 1j * qyg
    phase2 = np.where(qq > 0, (qc / np.maximum(qq, 1e-30)) ** 2, 0.0)
    # Separation-lattice spin-2 phase e^{-2i phi_r}.
    rx1 = np.arange(n) * a
    rx1[n // 2:] -= n * a                      # signed separations
    rxg, ryg = np.meshgrid(rx1, rx1, indexing="ij")
    rr = np.sqrt(rxg**2 + ryg**2)
    rc = rxg + 1j * ryg
    ephase = np.where(rr > 0, np.conj(
        (rc / np.maximum(rr, 1e-30)) ** 2), 0.0)

    rng = np.random.default_rng(17)
    n_mc, batch = 1000, 24
    nb = binm.shape[0]
    binm_f = binm.astype(float)
    est = np.empty((n_mc, 2 * nb))
    for s in range(0, n_mc, batch):
        b = min(batch, n_mc - s)
        f1 = np.fft.fft2(rng.standard_normal((b, n, n)), axes=(-2, -1))
        f2 = np.fft.fft2(rng.standard_normal((b, n, n)), axes=(-2, -1))
        dg = np.real(np.fft.ifft2(f1 * amp_g1 + f2 * amp_g2,
                                  axes=(-2, -1)))
        gam = np.fft.ifft2(phase2 * (f1 * amp_k), axes=(-2, -1))
        fg = np.fft.fft2(w * dg, axes=(-2, -1))
        fgam = np.fft.fft2(w * gam, axes=(-2, -1))
        # w_gg bins.
        cw = (np.real(np.fft.ifft2(np.abs(fg) ** 2, axes=(-2, -1)))
              * a * a).reshape(b, -1)
        est[s:s + b, :nb] = (cw @ binm_f.T) * a * a / d_grid
        # gamma_t bins: G(r) = sum_x W dg(x) W gam(x+r); project with
        # -Re[e^{-2i phi_r} G(r)].
        g_r = (np.fft.ifft2(np.conj(fg) * fgam, axes=(-2, -1))
               * a * a)
        gt = (-np.real(ephase * g_r)).reshape(b, -1)
        est[s:s + b, nb:] = (gt @ binm_f.T) * a * a / d_grid
    cov_mc = np.cov(est.T)

    # Convention anchor: the gamma_t MC mean equals the Jbar^2 Hankel
    # of C_gk (masked means are unbiased for pair-normalized
    # estimators).
    lnq = np.linspace(np.log(0.5), np.log(2 * np.pi / a / 1.2), 4096)
    qg = np.exp(lnq)
    wqg = qg**2 * np.gradient(lnq)
    jb2 = np.asarray(covariance.bin_averaged_j2(jnp.asarray(qg), edges))
    gt_pred = (jb2 * (c_gk(qg) * wqg)[None, :]).sum(axis=1) / (2 * np.pi)
    gt_mean = est[:, nb:].mean(axis=0)
    err = np.sqrt(np.diag(cov_mc)[nb:] / n_mc)
    assert np.all(np.abs(gt_mean - gt_pred) < 5 * err + 0.02 * np.abs(
        gt_pred)), (gt_mean, gt_pred, err)

    # Analytic masked joint blocks.
    dm = DiscMask(radius)
    deg = np.degrees(edges)
    kw = dict(n_ell_cov=1024, ell_lo=0.5, ell_hi=2 * np.pi / a / 1.2,
              mask=dm)

    def j(f):
        return lambda e: jnp.asarray(f(e))

    c_ww = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_gg), j(c_gg), j(c_gg), deg, deg, 0.0, 0, 0, **kw))
    c_wg = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_gk), j(c_gk), j(c_gg), deg, deg, 0.0, 0, 2, **kw))
    c_gt = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_kk), j(c_gk), j(c_gk), deg, deg, 0.0, 2, 2, **kw))
    cov_an = np.block([[c_ww, c_wg], [c_wg.T, c_gt]])

    dg_mc = np.diag(cov_mc)
    dg_an = np.diag(cov_an)
    ratio = dg_mc / dg_an
    # w-block diagonal at MC + pixelization accuracy; the gamma_t auto
    # block carries the documented CONSERVATIVE overprediction (the
    # leading azimuthal-moment kernels miss the partial-annulus wedge
    # coupling) growing toward the footprint-scale bin — measured
    # ratios [0.91, 0.91, 0.83, 0.64] with the (K0+K4)/2 kernel.
    assert np.all((ratio[:nb] > 0.78) & (ratio[:nb] < 1.25)), ratio
    assert np.all((ratio[nb:] > 0.55) & (ratio[nb:] < 1.25)), ratio
    # Cross w x gt block: correlations match in sign and magnitude for
    # the well-measured entries.
    for i in range(nb):
        r_mc = cov_mc[i, nb + i] / np.sqrt(dg_mc[i] * dg_mc[nb + i])
        r_an = cov_an[i, nb + i] / np.sqrt(dg_an[i] * dg_an[nb + i])
        assert abs(r_mc - r_an) < 0.2, (i, r_mc, r_an)


@pytest.mark.slow
def test_disc_mask_mc_referee_xipm():
    """Spin-2 xi_+/xi_- masked MC referee: pure-E Gaussian shear field
    gamma = e^{2i phi_q} kappa on a disc footprint; pair-normalized
    xi_+ = Re<gamma gamma*> and xi_- = Re[e^{-4i phi_r} <gamma gamma>]
    estimators.  Validates the NEW mu = 4 pieces end-to-end: the J4 bin
    factors, the {0,4} Weber-Schafheitlin structure, and the
    generalized masked moment kernels (K4 mixed, (K0+K8)/2 for the
    xi_- auto block).  Signal-only (the noise closures are exact and
    tested separately).  MC means are also anchored to the Jbar0/Jbar4
    Hankels of C_kk."""
    n, a, w, qq, edges, binm, d_grid, radius = _mc_setup()

    def c_kk(q):
        return 0.6 / (1.0 + (np.asarray(q) / 15.0) ** 2.0)

    amp_k = np.sqrt(c_kk(qq)) / a
    q1 = 2 * np.pi * np.fft.fftfreq(n, d=a)
    qxg, qyg = np.meshgrid(q1, q1, indexing="ij")
    qc = qxg + 1j * qyg
    phase2 = np.where(qq > 0, (qc / np.maximum(qq, 1e-30)) ** 2, 0.0)
    rx1 = np.arange(n) * a
    rx1[n // 2:] -= n * a
    rxg, ryg = np.meshgrid(rx1, rx1, indexing="ij")
    rr = np.sqrt(rxg**2 + ryg**2)
    rc = rxg + 1j * ryg
    ephase4 = np.where(rr > 0, np.conj(
        (rc / np.maximum(rr, 1e-30)) ** 4), 0.0)

    rng = np.random.default_rng(23)
    n_mc, batch = 1000, 24
    nb = binm.shape[0]
    binm_f = binm.astype(float)
    est = np.empty((n_mc, 2 * nb))
    for s in range(0, n_mc, batch):
        b = min(batch, n_mc - s)
        f1 = np.fft.fft2(rng.standard_normal((b, n, n)), axes=(-2, -1))
        gam = np.fft.ifft2(phase2 * (f1 * amp_k), axes=(-2, -1))
        wg = w * gam
        fgam = np.fft.fft2(wg, axes=(-2, -1))
        fgam_c = np.fft.fft2(np.conj(wg), axes=(-2, -1))
        # xi_+: sum_x gamma*(x) gamma(x+r) = ifft(|F|^2).
        xp = (np.real(np.fft.ifft2(np.abs(fgam) ** 2, axes=(-2, -1)))
              * a * a).reshape(b, -1)
        est[s:s + b, :nb] = (xp @ binm_f.T) * a * a / d_grid
        # xi_-: sum_x gamma(x) gamma(x+r) = ifft(conj(F[conj g]) F[g]);
        # project with +Re[e^{-4i phi_r} G(r)] (i^4 = +1).
        g_r = (np.fft.ifft2(np.conj(fgam_c) * fgam, axes=(-2, -1))
               * a * a)
        xm = np.real(ephase4 * g_r).reshape(b, -1)
        est[s:s + b, nb:] = (xm @ binm_f.T) * a * a / d_grid
    cov_mc = np.cov(est.T)

    # Mean anchors: EXACT lattice expectations of the pair-normalized
    # estimators (binary mask): E[est_i] = sum_bin pc(r) xi_lat(r) /
    # sum_bin pc(r), with xi+_lat = ifft(C)/a^2 and
    # xi-_lat = Re[e^{-4i phi_r} ifft(phase2^2 C)]/a^2 — pins the J4
    # phase convention (i^4 = +1) with no continuum/Brillouin-zone
    # approximation; the Hankel-vs-lattice agreement itself is covered
    # by the unmasked transform referees.
    ww_grid = np.real(np.fft.ifft2(np.abs(np.fft.fft2(w)) ** 2)) * a * a
    # Effective spectra of the CONSTRUCTED field: phase2(q=0) = 0 kills
    # the DC mode (|phase2|^2 = 1 elsewhere) — C(0)/box^2 = 0.15 here,
    # a visible constant offset in xi_+ if naively included.
    c_eff = np.abs(phase2) ** 2 * c_kk(qq)
    xi_p_lat = np.real(np.fft.ifft2(c_eff)) / (a * a)
    xi_m_lat = np.real(ephase4 * np.fft.ifft2(phase2**2 * c_kk(qq))) \
        / (a * a)
    xp_pred = (binm_f @ (ww_grid * xi_p_lat).ravel()) * a * a / d_grid
    xm_pred = (binm_f @ (ww_grid * xi_m_lat).ravel()) * a * a / d_grid
    err = np.sqrt(np.diag(cov_mc) / n_mc)
    xp_mean, xm_mean = est[:, :nb].mean(axis=0), est[:, nb:].mean(axis=0)
    assert np.all(np.abs(xp_mean - xp_pred) < 5 * err[:nb]), \
        (xp_mean, xp_pred, err[:nb])
    assert np.all(np.abs(xm_mean - xm_pred) < 5 * err[nb:]), \
        (xm_mean, xm_pred, err[nb:])

    dm = DiscMask(radius)
    deg = np.degrees(edges)
    kw = dict(n_ell_cov=1024, ell_lo=0.5, ell_hi=2 * np.pi / a / 1.2,
              mask=dm)

    def j(f):
        return lambda e: jnp.asarray(f(e))

    c4 = (j(c_kk),) * 4
    c_pp = np.asarray(covariance.gaussian_block(
        *c4, deg, deg, 0.0, 0, 0, **kw))
    c_pm = np.asarray(covariance.gaussian_block(
        *c4, deg, deg, 0.0, 0, 4, **kw))
    c_mm = np.asarray(covariance.gaussian_block(
        *c4, deg, deg, 0.0, 4, 4, **kw))
    cov_an = np.block([[c_pp, c_pm], [c_pm.T, c_mm]])

    dg_mc = np.diag(cov_mc)
    dg_an = np.diag(cov_an)
    ratio = dg_mc / dg_an
    print("xi+ auto mc/an:", np.round(ratio[:nb], 3))
    print("xi- auto mc/an:", np.round(ratio[nb:], 3))
    # xi_+ auto: CONSERVATIVE overprediction at footprint-scale bins
    # (measured ~1.7-2.4x here, where every bin is a sizeable fraction
    # of the disc radius and C(q) peaks inside the coupled regime): the
    # second Wick pairing <gamma gamma><gamma* gamma*> carries an
    # e^{4i phi_k} field-phase coherence that the azimuthal-moment
    # kernels do not suppress — same class as the documented gamma_t
    # 1.6x (gaussian_block docstring); the curved route carries the
    # exact sphere bin geometry for this regime.
    assert np.all((ratio[:nb] > 0.35) & (ratio[:nb] < 1.1)), ratio
    # xi_- auto ((K0+K8)/2): matches MC at 10-15% here.
    assert np.all((ratio[nb:] > 0.7) & (ratio[nb:] < 1.3)), ratio
    # xi_+ x xi_- cross correlations for the well-measured entries.
    for i in range(nb):
        r_mc = cov_mc[i, nb + i] / np.sqrt(dg_mc[i] * dg_mc[nb + i])
        r_an = cov_an[i, nb + i] / np.sqrt(dg_an[i] * dg_an[nb + i])
        print(f"pm corr bin {i}: mc={r_mc:.3f} an={r_an:.3f}")
        assert abs(r_mc - r_an) < 0.35, (i, r_mc, r_an)


# ---------------------------------------------------------------------------
# Beyond-NKA refinements (round 5): field-phase suppression, weighted
# delta factors, MC-calibrated wedge residuals.
# ---------------------------------------------------------------------------


def test_field_phase_suppression_closed_forms():
    """The m_s(t) azimuthal means inside S_s are the contour-integral
    closed forms m2 = (1-t^2)_+, m4 = [(1-t^2)(1-3t^2)]_{t<1}: check
    against a brute-force average of cos(s psi); S_s limits: -> 1 far
    above the coupling width, -> 0 deep inside it, monotone-ish."""
    from chomp_tpu.mask import field_phase_suppression

    phi = np.linspace(0.0, 2.0 * np.pi, 20001)[:-1]
    for t in (0.2, 0.6, 0.9, 1.3, 2.5):
        psi = np.arctan2(t * np.sin(phi), 1.0 - t * np.cos(phi))
        m2_b = np.mean(np.cos(2 * psi))
        m4_b = np.mean(np.cos(4 * psi))
        m2 = max(1.0 - t * t, 0.0)
        m4 = (1.0 - t * t) * (1.0 - 3.0 * t * t) if t < 1 else 0.0
        np.testing.assert_allclose(m2_b, m2, atol=2e-4)
        np.testing.assert_allclose(m4_b, m4, atol=2e-4)

    dm = DiscMask(0.5)
    q = np.array([0.2, 2.0, 20.0, 1000.0])
    for s in (2, 4):
        ss = field_phase_suppression(dm, q, s)
        assert ss[0] < 0.02 and ss[-1] > 0.98, (s, ss)
        assert np.all(np.diff(ss) > 0), ss
    with pytest.raises(ValueError, match="spin"):
        field_phase_suppression(dm, q, 3)


def test_weighted_bin_bessel_reduces_to_jbar():
    """Small bins (R̄₂₂ ≈ A₄ across the bin): the weighted factors
    equal the closed-form bin-averaged Bessel for every mu; a
    footprint-scale bin is strictly damped."""
    dm = DiscMask(0.5)
    ells = np.logspace(0.0, 2.5, 200)
    small = np.array([0.01, 0.012, 0.015])
    for mu in (0, 2, 4):
        bw = covariance._weighted_bin_bessel(dm, small, mu, ells)
        jb = np.asarray(covariance.bin_averaged_bessel(
            jnp.asarray(ells), small, mu))
        np.testing.assert_allclose(bw, jb, rtol=0, atol=2.5e-2)
    wide = np.array([0.35, 0.5])
    bw_w = covariance._weighted_bin_bessel(dm, wide, 0, ells)
    jb_w = np.asarray(covariance.bin_averaged_bessel(
        jnp.asarray(ells), wide, 0))
    # damped at low ell where Jbar ~ 1
    assert bw_w[0, 0] < 0.75 * jb_w[0, 0]


def test_spin2_wedge_factors_surface():
    dm = DiscMask(0.5)
    edges = np.degrees(np.array([0.1, 0.25, 0.45]))
    f_gt = covariance.spin2_wedge_factors(dm, edges, "gt")
    f_xp = covariance.spin2_wedge_factors(dm, edges, "xip")
    assert np.all((f_gt > 0.5) & (f_gt <= 1.0))
    assert np.all(np.diff(f_gt) < 0)          # stronger at wider bins
    assert np.all(f_xp > f_gt)                # xi+ residual is milder
    with pytest.raises(ValueError, match="probe"):
        covariance.spin2_wedge_factors(dm, edges, "ww")
    with pytest.raises(ValueError, match="beyond_nka"):
        covariance.gaussian_block(cl_powerlaw, cl_powerlaw, cl_powerlaw,
                                  cl_powerlaw, edges, edges, 0.1,
                                  beyond_nka=True)


@pytest.mark.slow
def test_beyond_nka_highq_weighted_delta():
    """High-q-dominated spectrum on footprint-scale bins: the old
    A4-normalized delta formula overpredicts up to 2x; the
    sqrt(R̄₂₂)-weighted factors land on the MC (measured 1.04-1.09)."""
    n, box = 256, 2.0
    a = box / n
    x = (np.arange(n) - n // 2) * a
    xg, yg = np.meshgrid(x, x, indexing="ij")
    radius = 0.5
    w = ((xg**2 + yg**2) <= radius**2).astype(float)
    qq_ = np.sqrt(np.add.outer(
        (2 * np.pi * np.fft.fftfreq(n, d=a))**2,
        (2 * np.pi * np.fft.fftfreq(n, d=a))**2))
    rabs = np.sqrt(
        np.minimum(np.arange(n), n - np.arange(n))[:, None]**2 * a * a
        + np.minimum(np.arange(n), n - np.arange(n))[None, :]**2 * a * a)
    edges = np.array([0.2, 0.3, 0.42, 0.5])
    binm = np.stack([((rabs >= lo) & (rabs < hi)).ravel()
                     for lo, hi in zip(edges[:-1], edges[1:])])
    ww_ = (np.real(np.fft.ifft2(np.abs(np.fft.fft2(w))**2))
           * a * a).ravel()
    d_grid = binm @ ww_ * a * a

    def cq(q):
        q = np.asarray(q)
        return (q / 150.0)**2 / (1.0 + (q / 150.0)**6)

    amp = np.sqrt(cq(qq_) / (a * a))
    rng = np.random.default_rng(5)
    n_mc, batch = 900, 24
    est = np.empty((n_mc, len(edges) - 1))
    binm_f = binm.astype(float)
    for s in range(0, n_mc, batch):
        b = min(batch, n_mc - s)
        wn = rng.standard_normal((b, n, n))
        d = np.real(np.fft.ifft2(
            np.fft.fft2(wn, axes=(-2, -1)) * amp, axes=(-2, -1)))
        f = np.fft.fft2(w * d, axes=(-2, -1))
        cw = (np.real(np.fft.ifft2(np.abs(f)**2, axes=(-2, -1)))
              * a * a).reshape(b, -1)
        est[s:s + b] = (cw @ binm_f.T) * a * a / d_grid
    cov_mc = np.cov(est.T)
    dm = DiscMask(radius)
    deg = np.degrees(edges)
    cl = lambda e: jnp.asarray(cq(e))
    kw = dict(n_ell_cov=1024, ell_lo=0.5, ell_hi=2 * np.pi / a / 1.2,
              mask=dm)
    c_old = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, deg, deg, 0.0, 0, 0, **kw))
    c_new = np.asarray(covariance.gaussian_block(
        cl, cl, cl, cl, deg, deg, 0.0, 0, 0, beyond_nka=True, **kw))
    r_old = np.diag(cov_mc) / np.diag(c_old)
    r_new = np.diag(cov_mc) / np.diag(c_new)
    assert np.all((r_new > 0.85) & (r_new < 1.25)), (r_old, r_new)
    assert r_old[-1] < 0.65, r_old      # the documented overprediction


@pytest.mark.slow
def test_beyond_nka_heldout_square():
    """HELD-OUT validation (VERDICT round-4 item 3): a SQUARE
    PixelMask footprint and a spectrum shape not in the calibration
    set.  With beyond_nka (S4 field-phase damping + weighted delta +
    wedge factors) the spin-2 autos land within the target bands —
    gamma_t ~<20%, xi_+ ~<25% incl. MC noise (from 1.6x / 2.4x) —
    while the plain-NKA xi_+ stays >1.45x overpredicted at the worst
    bin."""
    import tools.calibrate_spin2_wedge as cal

    r = cal.run_config(0.5, q0=20.0, gamma=2.1, n_mc=500, seed=777,
                       shape="square")
    assert np.all((r["b_gt"] > 0.78) & (r["b_gt"] < 1.25)), r["b_gt"]
    assert np.all((r["b_xip"] > 0.75) & (r["b_xip"] < 1.30)), r["b_xip"]
    # improvement pinned: plain NKA xi+ is far worse
    assert np.min(r["r_xip"]) < 0.70, r["r_xip"]
    # ww stays uncorrected and conservative-or-right
    assert np.all((r["b_ww"] > 0.7) & (r["b_ww"] < 1.25)), r["b_ww"]


def test_beyond_nka_joint_builder_wiring(fiducial, fiducial_model):
    """joint_3x2pt_covariance(beyond_nka=True, mask=...) runs, is
    finite/symmetric, REDUCES the gt and xi_+ auto variances (the
    conservatism being removed), and leaves the default path
    untouched."""
    from chomp_tpu import default_halo, projection

    h = default_halo()
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    d_src = projection.DNdzGaussian(
        z_min=jnp.asarray(0.3), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.2), sigma_z=jnp.asarray(0.3))
    # footprint-scale bins on a small disc survey
    dm = DiscMask(np.radians(2.0))
    edges = np.linspace(0.3, 2.0, 5)          # degrees
    kw = dict(include_nongaussian=False, n_ell_cov_g=1024, mask=dm)
    cov0 = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, fiducial_model, dist, d_src, edges, 0.0,
        N2D, 1.0e-9, **kw))
    cov1 = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, fiducial_model, dist, d_src, edges, 0.0,
        N2D, 1.0e-9, beyond_nka=True, **kw))
    nb = len(edges) - 1
    assert np.all(np.isfinite(cov1))
    np.testing.assert_allclose(cov1, cov1.T,
                               atol=1e-10 * np.abs(cov1).max())
    d0, d1 = np.diag(cov0), np.diag(cov1)
    # gt auto rows are [nb:2nb], xi+ [2nb:3nb]
    assert np.all(d1[nb:2 * nb] < d0[nb:2 * nb])
    assert np.all(d1[2 * nb:3 * nb] < d0[2 * nb:3 * nb])
    # and the reduction is material at the footprint-scale bins
    assert d1[2 * nb - 1] < 0.85 * d0[2 * nb - 1]
