"""bandpowers.py: MASTER mode-coupling, decoupled band powers, NKA
covariance.

Referee strategy:
  1. An INDEPENDENT algebraic route: the coupling matrices are re-built
     from explicit Wigner-3j symbols (Racah's closed formula via
     lgamma, exact to rounding at small l) summed against the mask's
     harmonic coefficients — the quadrature route must match to ~1e-12.
  2. Exact identities: full-sky reduction M = I / leakage = 0, the
     white-noise row sum A2/4pi, piecewise-constant decoupling
     exactness, full-sky covariance = 2C^2/(2l+1).
  3. A scalar-field Monte Carlo on an apodized cap (shared SHT
     referee): mean pseudo/decoupled band powers (exact coupling,
     tight) and the NKA covariance (approximate, loose band).
"""

from math import lgamma

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import bandpowers as bp
from chomp_tpu.curved import (ProfileCurvedMask, SphericalCapMask,
                              UniformSphereMask)
from tests.sht_referee import (_sht_lambda_tables, _sht_pseudo_power,
                               _sht_synth, gaussian_alm_batch)


def _lnf(n):
    return lgamma(n + 1.0)


def wigner3j(j1, j2, j3, m1, m2, m3):
    """Racah's closed formula (float, exact to rounding for small j) —
    fully independent of the quadrature identities under test."""
    if m1 + m2 + m3 != 0 or not abs(j1 - j2) <= j3 <= j1 + j2:
        return 0.0
    if abs(m1) > j1 or abs(m2) > j2 or abs(m3) > j3:
        return 0.0
    t1, t2 = j2 - m1 - j3, j1 + m2 - j3
    t3, t4, t5 = j1 + j2 - j3, j1 - m1, j2 + m2
    ln_pref = 0.5 * (_lnf(j1 + j2 - j3) + _lnf(j1 - j2 + j3)
                     + _lnf(-j1 + j2 + j3) - _lnf(j1 + j2 + j3 + 1)
                     + _lnf(j1 + m1) + _lnf(j1 - m1) + _lnf(j2 + m2)
                     + _lnf(j2 - m2) + _lnf(j3 + m3) + _lnf(j3 - m3))
    s = 0.0
    for t in range(max(0, t1, t2), min(t3, t4, t5) + 1):
        ln_den = (_lnf(t) + _lnf(t - t1) + _lnf(t - t2) + _lnf(t3 - t)
                  + _lnf(t4 - t) + _lnf(t5 - t))
        s += (-1.0) ** t * np.exp(ln_pref - ln_den)
    return s * (-1.0) ** (j1 - j2 - m3)


def _apodized_cap(lmax_mask=192):
    """Smooth taper 1 -> 0 over theta in [0.35, 0.6] rad (fast harmonic
    decay: series-truncation effects negligible at these lmax)."""
    th = np.linspace(0.0, 0.6, 61)
    w = np.clip((0.6 - th) / 0.25, 0.0, 1.0)
    return ProfileCurvedMask(th, w, lmax_mask=lmax_mask)


def test_coupling_vs_racah_3j():
    """All four coupling kernels vs the explicit 3j construction
    M_{ll'} = (2l'+1) sum_L c_L 3j 3j with c_L the mask's xi_W
    Legendre coefficients — independent algebra, ~1e-12 agreement."""
    lmax = 14
    mask = _apodized_cap(lmax_mask=40)
    m = bp.master_coupling(mask, lmax)
    c_l = np.asarray(mask._xi_w_c)               # xi_W = sum c_L P_L
    n_l = len(c_l)
    ref = {k: np.zeros((lmax + 1, lmax + 1)) for k in
           ("00", "02", "pp", "mm")}
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            s00 = s02 = spp = smm = 0.0
            for ll in range(n_l):
                w000 = wigner3j(l1, l2, ll, 0, 0, 0)
                w220 = wigner3j(l1, l2, ll, 2, -2, 0)
                par = 0.5 * (1.0 + (-1.0) ** (l1 + l2 + ll))
                s00 += c_l[ll] * w000 * w000
                s02 += c_l[ll] * w000 * w220
                spp += c_l[ll] * w220 * w220 * par
                smm += c_l[ll] * w220 * w220 * (1.0 - par)
            fac = 2.0 * l2 + 1.0
            ref["00"][l1, l2] = fac * s00
            ref["02"][l1, l2] = fac * s02
            ref["pp"][l1, l2] = fac * spp
            ref["mm"][l1, l2] = fac * smm
    for k in ("00", "02", "pp", "mm"):
        np.testing.assert_allclose(m[k], ref[k], atol=2e-12,
                                   err_msg=k)


def test_full_sky_identity():
    """W == 1: every coupling is the identity (spin-2 blocks on their
    l >= 2 support) and the EE<->BB leakage vanishes."""
    lmax = 32
    m = bp.master_coupling(UniformSphereMask(), lmax)
    np.testing.assert_allclose(m["00"], np.eye(lmax + 1), atol=1e-10)
    eye2 = np.eye(lmax + 1)
    eye2[:2] = 0.0
    np.testing.assert_allclose(m["pp"], eye2, atol=1e-10)
    np.testing.assert_allclose(m["02"][2:, 2:], np.eye(lmax - 1),
                               atol=1e-10)
    np.testing.assert_allclose(m["mm"], 0.0, atol=1e-10)


def test_white_noise_row_sum():
    """sum_l' M_{ll'} -> xi_W(1) = A2/4pi (completeness): the exact
    white-noise coupling, and the white_noise_pseudo_cl helper.  A
    smooth mask converges fast; check rows well below lmax."""
    lmax = 128
    mask = _apodized_cap()
    m = bp.master_coupling(mask, lmax, spins=(0,))["00"]
    target = mask.area2 / (4.0 * np.pi)
    rows = m[8:64].sum(axis=1)
    np.testing.assert_allclose(rows, target, rtol=2e-3)
    nl = bp.white_noise_pseudo_cl(3.0, mask, lmax)
    np.testing.assert_allclose(nl, 3.0 * target, rtol=1e-12)


def test_decoupling_exact_on_binwise_constant():
    """F = M_b^{-1} P M applied to a C that is constant within each
    band returns exactly those constants (the defining property of the
    MASTER binned decoupling), and D M Q = I."""
    lmax = 96
    mask = _apodized_cap()
    m = bp.master_coupling(mask, lmax, spins=(0,))["00"]
    edges = [2, 16, 30, 44, 58]
    ops = bp.decoupled_operator(m, edges)
    _, q = bp.bin_operator(lmax, edges)
    np.testing.assert_allclose(ops["D"] @ m @ q, np.eye(4), atol=1e-10)
    c_b = np.array([3.0, 1.5, 0.8, 0.45])
    np.testing.assert_allclose(ops["F"] @ (q @ c_b), c_b, atol=1e-10)


def test_bin_operator_weights_and_errors():
    p, q = bp.bin_operator(9, [2, 5, 8], weights=np.arange(10.0))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-14)
    np.testing.assert_allclose(p[0, 2:5],
                               np.array([2.0, 3.0, 4.0]) / 9.0)
    assert q[:, 0].sum() == 3 and q[2, 0] == 1.0 and q[5, 1] == 1.0
    with pytest.raises(ValueError):
        bp.bin_operator(9, [2, 12])
    with pytest.raises(ValueError):
        bp.bin_operator(9, [5, 2])


def test_full_sky_covariance_exact():
    """Uniform mask: the NKA kernel is delta/(2l+1) and the bandpower
    block reduces EXACTLY to binning of 2 C^ac C^bd-type / (2l+1)."""
    lmax = 48
    k = bp.pseudo_covariance_kernel(UniformSphereMask(), lmax)
    ells = np.arange(lmax + 1)
    np.testing.assert_allclose(k, np.diag(1.0 / (2 * ells + 1.0)),
                               atol=1e-10)
    edges = [2, 12, 24, 40]
    m = bp.master_coupling(UniformSphereMask(), lmax, spins=(0,))["00"]
    d = bp.decoupled_operator(m, edges)["D"]
    c1 = 1.0 / (ells + 3.0) ** 2
    c2 = 2.0 / (ells + 5.0) ** 1.5
    blk = np.asarray(bp.bandpower_gaussian_block(
        d, d, jnp.asarray(c1), jnp.asarray(c2), jnp.asarray(c1),
        jnp.asarray(c2), k))
    direct = d @ np.diag(2.0 * c1 * c2 / (2 * ells + 1.0)) @ d.T
    # Off-diagonals are exact zeros (disjoint bands on the full sky):
    # compare at rounding level relative to the diagonal scale.
    np.testing.assert_allclose(blk, direct, rtol=1e-10,
                               atol=1e-12 * np.diag(direct).max())


def test_theory_operator_interpolation_accuracy():
    """The static Catmull-Rom log-ell table reproduces a smooth
    C_ell at <1e-4 through a bandpower window (halo-model-like
    curvature: a double power law with a BAO-ish wiggle)."""
    lmax = 512
    ells = np.arange(lmax + 1)
    le = np.maximum(ells, 1.0)

    def cl_fn(e):
        e = np.asarray(e, dtype=float)
        return (1.0 / (e + 30.0) ** 1.8 * (1.0 + 0.05 * np.sin(
            2.0 * np.log(e + 1.0))))

    m = bp.master_coupling(_apodized_cap(), lmax, spins=(0,))["00"]
    f = bp.decoupled_operator(m, [2, 40, 120, 300, 500])["F"]
    tbl, op = bp.bandpower_theory_operator(f, n_tbl=96)
    got = np.asarray(op @ jnp.asarray(cl_fn(tbl)))
    f_lo = f.copy()
    f_lo[:, :2] = 0.0
    expect = f_lo @ cl_fn(le)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


@pytest.fixture(scope="module")
def mc_setup():
    """512 Gaussian skies on an apodized cap: pseudo-powers and
    decoupled band powers (shared by the mean and covariance MC
    referees)."""
    lmax, n_lat, n_phi = 64, 192, 256
    mask = _apodized_cap()
    xg, wq = np.polynomial.legendre.leggauss(n_lat)
    lams = _sht_lambda_tables(lmax, xg)
    th = np.arccos(xg)
    w_map = np.interp(th, np.linspace(0.0, 0.6, 61),
                      np.clip((0.6 - np.linspace(0.0, 0.6, 61)) / 0.25,
                              0.0, 1.0), left=1.0, right=0.0)
    ells = np.arange(lmax + 1)
    cl_true = 1.0 / (ells + 5.0) ** 3
    rng = np.random.default_rng(11)
    # Round-trip check once (unmasked pseudo == input power in MC mean
    # is exact per realization only as Sum_m |a|^2; assert on one batch)
    ps_batches = []
    for _ in range(8):
        a_re, a_im = gaussian_alm_batch(rng, cl_true, lmax, 64)
        maps = _sht_synth(lams, a_re, a_im, n_phi)
        ps = _sht_pseudo_power(lams, maps * w_map[None, :, None], wq,
                               n_phi)
        ps_batches.append(ps / (2.0 * ells + 1.0)[None, :])
    pseudo = np.concatenate(ps_batches)        # (512, lmax+1) C~_l
    m = bp.master_coupling(mask, lmax, spins=(0,))["00"]
    edges = [2, 16, 30, 44, 58]
    ops = bp.decoupled_operator(m, edges)
    return mask, lmax, cl_true, pseudo, m, ops, edges


def test_mc_mean_coupling(mc_setup):
    """<C~_l> = M C and <B_q> = F C against 512 masked realizations —
    the mean coupling is exact, so agreement is limited only by MC
    noise (~1.5% per band at 512 draws)."""
    mask, lmax, cl_true, pseudo, m, ops, edges = mc_setup
    p, _ = bp.bin_operator(lmax, edges)
    got_b = (p @ pseudo.T).mean(axis=1)
    exp_b = p @ (m @ cl_true)
    err_b = (p @ pseudo.T).std(axis=1) / np.sqrt(pseudo.shape[0])
    assert np.all(np.abs(got_b - exp_b) < 4.0 * err_b), (
        got_b / exp_b - 1.0, err_b / exp_b)
    np.testing.assert_allclose(got_b, exp_b, rtol=0.05)
    dec = (ops["D"] @ pseudo.T).mean(axis=1)
    exp_d = ops["F"] @ cl_true
    # Decoupled bands 2-4 sit ~500x below band 1 (steep C_l) — bound
    # each by its own MC error, not a relative tolerance on ~zero.
    err_d = (ops["D"] @ pseudo.T).std(axis=1) / np.sqrt(pseudo.shape[0])
    assert np.all(np.abs(dec - exp_d) < 4.0 * err_d), (
        (dec - exp_d) / err_d)
    np.testing.assert_allclose(dec[0], exp_d[0], rtol=0.02)


def test_mc_nka_covariance(mc_setup):
    """NKA bandpower covariance vs the MC covariance of the decoupled
    band powers: diagonal within the usual NKA band, and the STRONG
    anti-correlation the decoupling induces on a small cap (measured
    rho_1 ~ [-0.95, -0.81, -0.47], rho_2 ~ [+0.78, +0.40]) reproduced
    to ~0.1 in correlation units."""
    mask, lmax, cl_true, pseudo, m, ops, edges = mc_setup
    dec = (ops["D"] @ pseudo.T).T                # (512, 4)
    cov_mc = np.cov(dec.T)
    kern = bp.pseudo_covariance_kernel(mask, lmax)
    blk = np.asarray(bp.bandpower_gaussian_block(
        ops["D"], ops["D"], jnp.asarray(cl_true), jnp.asarray(cl_true),
        jnp.asarray(cl_true), jnp.asarray(cl_true), kern))
    r = np.diag(blk) / np.diag(cov_mc)
    assert np.all((r > 0.65) & (r < 1.5)), r
    rho_mc = cov_mc / np.sqrt(np.outer(np.diag(cov_mc),
                                       np.diag(cov_mc)))
    rho_an = blk / np.sqrt(np.outer(np.diag(blk), np.diag(blk)))
    assert np.diag(rho_mc, 1)[0] < -0.5          # the regime is real
    np.testing.assert_allclose(np.diag(rho_an, 1), np.diag(rho_mc, 1),
                               atol=0.15)
    np.testing.assert_allclose(np.diag(rho_an, 2), np.diag(rho_mc, 2),
                               atol=0.15)


def test_spin_covariance_kernels_vs_racah_3j():
    """pseudo_covariance_kernels_spin vs the explicit 3j construction
    sum_L w_L 3j 3j with w_L the xi_{W^2} Legendre coefficients —
    independent algebra, ~1e-12 (the W^2 twin of the coupling
    referee; kernel 2 carries the even-parity projection)."""
    lmax = 12
    mask = _apodized_cap(lmax_mask=40)
    kerns = bp.pseudo_covariance_kernels_spin(mask, lmax)
    # xi_{W^2} Legendre coefficients on the same truncation the mask
    # object uses (incl. its Parseval repair scale).
    c_l = np.asarray(mask._xi_w2_c) * mask._xi_w2_scale
    ref = {k: np.zeros((lmax + 1, lmax + 1)) for k in (0, 1, 2)}
    for l1 in range(lmax + 1):
        for l2 in range(lmax + 1):
            s0 = s1 = s2 = 0.0
            for ll in range(len(c_l)):
                w000 = wigner3j(l1, l2, ll, 0, 0, 0)
                w220 = wigner3j(l1, l2, ll, 2, -2, 0)
                par = 0.5 * (1.0 + (-1.0) ** (l1 + l2 + ll))
                s0 += c_l[ll] * w000 * w000
                s1 += c_l[ll] * w000 * w220
                s2 += c_l[ll] * w220 * w220 * par
            ref[0][l1, l2], ref[1][l1, l2], ref[2][l1, l2] = s0, s1, s2
    for k in (0, 1, 2):
        np.testing.assert_allclose(kerns[k], ref[k], atol=2e-12,
                                   err_msg=str(k))
    # Spin-0 kernel agrees with the scalar helper bitwise.
    np.testing.assert_allclose(kerns[0],
                               bp.pseudo_covariance_kernel(mask, lmax),
                               rtol=0, atol=0)


def test_spin_kernels_full_sky():
    """Uniform mask: every spin kernel is delta_{ll'}/(2l+1) on its
    support (l >= 2 rows/cols for the spin-2 families)."""
    lmax = 32
    kerns = bp.pseudo_covariance_kernels_spin(UniformSphereMask(), lmax)
    ells = np.arange(lmax + 1)
    diag = np.diag(1.0 / (2.0 * ells + 1.0))
    np.testing.assert_allclose(kerns[0], diag, atol=1e-10)
    d2 = diag.copy()
    d2[:2] = 0.0
    np.testing.assert_allclose(kerns[2], d2, atol=1e-10)
    np.testing.assert_allclose(kerns[1][2:, 2:], diag[2:, 2:],
                               atol=1e-10)


def test_cap_vs_profile_consistency():
    """A binary cap built as a ProfileCurvedMask (step profile) and the
    exact SphericalCapMask give the same spin-0 coupling to the
    band-limit truncation level."""
    lmax = 48
    rad = 0.5
    cap = SphericalCapMask(rad)
    th = np.linspace(0.0, rad, 201)
    prof = ProfileCurvedMask(np.append(th, rad + 1e-6),
                             np.append(np.ones_like(th), 0.0),
                             lmax_mask=512)
    m1 = bp.master_coupling(cap, lmax, spins=(0,))["00"]
    m2 = bp.master_coupling(prof, lmax, spins=(0,))["00"]
    # hard edge: truncated-series xi_W differs at the Gibbs level;
    # couplings agree to ~1% of the row maximum
    assert np.max(np.abs(m1 - m2)) < 0.02 * np.max(m1)
