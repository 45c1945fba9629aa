"""Revised halofit (chomp_tpu.nlpower).

Referees: an INDEPENDENT scipy implementation of the published
Takahashi 2012 formulas (quad sigma_G^2 + brentq nonlinear scale +
finite-difference n_eff/C — a completely separate code path that
catches assembly/vectorization errors; the constants themselves are
the published appendix values on both sides), plus the physical
limits: P_NL -> P_lin at low k, the sigma_G(1/k_sigma) = 1 closure,
sigma_8 monotonicity, and pipeline integration (matter_power="halofit"
touches ONLY the mm legs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chomp_tpu import background, linear, nlpower
from chomp_tpu.params import GridSpec, default_cosmo, default_halo

COSMO = default_cosmo()


def _scipy_halofit(cosmo, k, z):
    """Independent numpy/scipy halofit on the same EH98 linear input."""
    from scipy.integrate import quad
    from scipy.optimize import brentq

    def d2l(kk, zz):
        return float(kk**3 / (2 * np.pi**2)
                     * linear.linear_power(cosmo, kk, zz))

    def s2(lnr, zz):
        r = np.exp(lnr)
        val, _ = quad(lambda lnk: d2l(np.exp(lnk), zz)
                      * np.exp(-(np.exp(lnk) * r) ** 2),
                      np.log(1e-5), np.log(1e3), epsrel=1e-10, limit=400)
        return val

    lnr_s = brentq(lambda lnr: np.log(s2(lnr, z)), np.log(0.05),
                   np.log(30.0), xtol=1e-12)
    k_sig = np.exp(-lnr_s)
    h = 1e-4
    lns = [np.log(s2(lnr_s + d, z)) for d in (-h, 0.0, h)]
    n = -3.0 - (lns[2] - lns[0]) / (2 * h)
    c = -(lns[2] - 2 * lns[1] + lns[0]) / h**2

    om_z = float(background.omega_m_z(cosmo, z))
    ol_z = float(background.omega_l_z(cosmo, z))
    w_z = float(cosmo.w0 + cosmo.wa * z / (1.0 + z))
    ow1w = ol_z * (1.0 + w_z)
    an = 10 ** (1.5222 + 2.8553 * n + 2.3706 * n**2 + 0.9903 * n**3
                + 0.2250 * n**4 - 0.6038 * c + 0.1749 * ow1w)
    bn = 10 ** (-0.5642 + 0.5864 * n + 0.5716 * n**2 - 1.5474 * c
                + 0.2279 * ow1w)
    cn = 10 ** (0.3698 + 2.0404 * n + 0.8161 * n**2 + 0.5869 * c)
    gam = 0.1971 - 0.0843 * n + 0.8460 * c
    alp = abs(6.0835 + 1.3373 * n - 0.1959 * n**2 - 5.5274 * c)
    bet = (2.0379 - 0.7354 * n + 0.3157 * n**2 + 1.2490 * n**3
           + 0.3980 * n**4 - 0.1682 * c)
    nun = 10 ** (5.2105 + 3.6902 * n)
    f1a, f2a, f3a = om_z**-0.0732, om_z**-0.1423, om_z**0.0725
    f1b, f2b, f3b = om_z**-0.0307, om_z**-0.0585, om_z**0.0743
    frac = min(max(ol_z / (1.0 - om_z), 0.0), 1.0)
    f1 = frac * f1b + (1 - frac) * f1a
    f2 = frac * f2b + (1 - frac) * f2a
    f3 = frac * f3b + (1 - frac) * f3a

    out = []
    for kk in np.atleast_1d(k):
        y = kk / k_sig
        dl = d2l(kk, z)
        dq = (dl * (1 + dl) ** bet / (1 + alp * dl)
              * np.exp(-(y / 4 + y**2 / 8)))
        dh = (an * y ** (3 * f1)
              / (1 + bn * y**f2 + (cn * f3 * y) ** (3 - gam)))
        dh = dh / (1 + nun / y**2)
        out.append((dq + dh) * 2 * np.pi**2 / kk**3)
    return np.asarray(out), k_sig, n, c


@pytest.mark.slow
def test_halofit_vs_scipy_referee():
    k = np.array([0.02, 0.1, 0.3, 1.0, 3.0, 10.0, 30.0])
    for z in (0.0, 1.0):
        ref, ks_r, n_r, c_r = _scipy_halofit(COSMO, k, z)
        ks, n, c = [float(x) for x in nlpower.halofit_params(COSMO, z)]
        assert abs(ks / ks_r - 1) < 1e-6
        assert abs(n - n_r) < 1e-5
        assert abs(c - c_r) < 1e-4       # FD curvature limits the ref
        p = np.asarray(nlpower.halofit_power(COSMO, jnp.asarray(k), z))
        np.testing.assert_allclose(p, ref, rtol=3e-4)


def test_closure_and_convergence():
    for z in (0.0, 2.0):
        ks, n, c = [float(x) for x in nlpower.halofit_params(COSMO, z)]
        s2 = float(nlpower.sigma_g2(COSMO, 1.0 / ks, z))
        assert abs(s2 - 1.0) < 1e-10
        assert -2.5 < n < -1.0 and 0.1 < c < 1.0
    # Quadrature order-doubling on sigma_G^2.
    nlpower._gauss_sigma_nodes.cache_clear()
    s_lo = float(nlpower.sigma_g2(COSMO, 2.0, 0.0))
    k_np, w_np = nlpower._gauss_sigma_nodes(1536)
    d2 = (k_np**3 / (2 * np.pi**2)
          * np.asarray(linear.linear_power(COSMO, jnp.asarray(k_np),
                                           0.0)))
    s_hi = float(np.sum(d2 * w_np * np.exp(-(k_np * 2.0) ** 2)))
    assert abs(s_lo / s_hi - 1.0) < 1e-9


def test_linear_limit_and_boost():
    k = jnp.asarray([1e-3, 5e-3, 1e-2])
    ratio = np.asarray(nlpower.halofit_power(COSMO, k, 0.0)
                       / linear.linear_power(COSMO, k, 0.0))
    np.testing.assert_allclose(ratio, 1.0, rtol=0.015)
    # N-body-calibrated magnitudes: boost at k=1 (z=0) is O(5), and
    # smaller at z=1 (less nonlinear growth).
    b0 = float(nlpower.halofit_power(COSMO, 1.0, 0.0)
               / linear.linear_power(COSMO, 1.0, 0.0))
    b1 = float(nlpower.halofit_power(COSMO, 1.0, 1.0)
               / linear.linear_power(COSMO, 1.0, 1.0))
    assert 3.0 < b0 < 12.0 and 1.5 < b1 < b0


def test_sigma8_monotone_and_grad():
    import dataclasses

    def p_at(s8):
        return nlpower.halofit_power(
            dataclasses.replace(COSMO, sigma_8=s8), 1.0, 0.0)

    p = jax.vmap(p_at)(jnp.asarray([0.7, 0.8, 0.9]))
    assert np.all(np.diff(np.asarray(p)) > 0)
    g = float(jax.grad(lambda s: jnp.sum(p_at(s)))(jnp.asarray(0.811)))
    assert np.isfinite(g) and g > 0


def test_pipeline_matter_power_swap():
    """matter_power='halofit' changes ONLY the xi_pm rows; 'linear'
    likewise; w/gt identical to the halo run."""
    from chomp_tpu.parallel.sweep import make_pipeline
    from chomp_tpu.projection import DNdzGaussian

    from chomp_tpu.hod import default_hod

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32,
                 n_theta=6)
    dist = DNdzGaussian(z_min=0.1, z_max=1.2, z0=0.5, sigma_z=0.15)
    theta = np.geomspace(0.05, 1.0, 6)
    kw = dict(theta_deg=theta, z_pivot=0.5, grid=g, include_shear=True)
    out_h = make_pipeline(default_halo(), default_hod(), dist,
                          **kw)(COSMO)
    out_f = make_pipeline(default_halo(), default_hod(), dist,
                          matter_power="halofit", **kw)(COSMO)
    out_l = make_pipeline(default_halo(), default_hod(), dist,
                          matter_power="linear", **kw)(COSMO)
    np.testing.assert_allclose(np.asarray(out_f["w_theta"]),
                               np.asarray(out_h["w_theta"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out_f["gamma_t"]),
                               np.asarray(out_h["gamma_t"]), rtol=1e-12)
    xp_h = np.asarray(out_h["xi_plus"])
    xp_f = np.asarray(out_f["xi_plus"])
    xp_l = np.asarray(out_l["xi_plus"])
    assert np.isfinite(xp_f).all() and np.isfinite(xp_l).all()
    # linear < halofit <= halo-model at sub-degree scales (the halo
    # model over-predicts the 1h/2h transition vs N-body; measured
    # halofit/halo ~ 0.9 at k ~ 0.1-0.3).
    assert np.all(xp_l[0] < xp_f[0]) and xp_f[0] < xp_h[0]
    # Large-angle bin: all three agree at the few-% level (linear
    # scales dominate).
    assert abs(xp_f[-1] / xp_h[-1] - 1.0) < 0.05
    assert abs(xp_l[-1] / xp_h[-1] - 1.0) < 0.10


@pytest.mark.slow
def test_exact_z_halofit_anchor_route():
    """exact_z_anchors + matter_power='halofit' carries the full shape
    evolution: the xi_+ prediction differs from the separable
    (pivot-frozen) halofit route in the expected direction and both
    reduce to the same answer when the kernel is narrow around the
    pivot."""
    from chomp_tpu.parallel.sweep import make_pipeline
    from chomp_tpu.projection import DNdzGaussian

    from chomp_tpu.hod import default_hod

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32,
                 n_theta=6)
    dist = DNdzGaussian(z_min=0.35, z_max=0.65, z0=0.5, sigma_z=0.05)
    theta = np.geomspace(0.05, 1.0, 6)
    kw = dict(theta_deg=theta, grid=g, include_shear=True)
    sep = make_pipeline(default_halo(), default_hod(), dist,
                        z_pivot=0.5, matter_power="halofit", **kw)(COSMO)
    exz = make_pipeline(default_halo(), default_hod(), dist,
                        exact_z_anchors=6, matter_power="halofit",
                        **kw)(COSMO)
    xp_s, xp_e = np.asarray(sep["xi_plus"]), np.asarray(exz["xi_plus"])
    assert np.isfinite(xp_e).all()
    # The lensing kernel reaches z=0 where halofit is MORE nonlinear
    # than the pivot-frozen z=0.5 shape D^2-scaled: exact-z xi_+ at
    # small theta must exceed the separable route, but by a bounded
    # factor.
    assert 1.0 < xp_e[0] / xp_s[0] < 2.5
    assert abs(xp_e[-1] / xp_s[-1] - 1.0) < 0.2


def test_covariance_matter_power_swap():
    """matter_power='halofit' on the tomographic covariance touches
    exactly the blocks with an mm leg: w x w unchanged, xi x xi
    changed, gt x gt unchanged (gm legs), all finite."""
    from chomp_tpu import covariance, halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.projection import DNdzGaussian

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32)
    lens = [DNdzGaussian(z_min=0.1, z_max=0.9, z0=0.4, sigma_z=0.12)]
    src = [DNdzGaussian(z_min=0.2, z_max=1.6, z0=0.8, sigma_z=0.2)]
    model = halo.build_halo_model(COSMO, default_halo(), default_hod(),
                                  0.4, grid=g)
    edges = np.geomspace(0.1, 1.0, 4)
    kw = dict(theta_edges_deg=edges, omega_s_sr=0.3,
              n2d_lens_list=[3e7], shape_noise_list=[1.7e-9],
              grid=g, n_ell_cov_g=1024)
    c_h = np.asarray(covariance.tomographic_3x2pt_covariance(
        COSMO, default_halo(), model, lens, src, **kw))
    c_f = np.asarray(covariance.tomographic_3x2pt_covariance(
        COSMO, default_halo(), model, lens, src,
        matter_power="halofit", **kw))
    assert np.isfinite(c_f).all()
    nb = len(edges) - 1
    # Probe order: w_0, gt_00, xip_00, xim_00 — 3 theta bins each.
    np.testing.assert_allclose(c_f[:nb, :nb], c_h[:nb, :nb],
                               rtol=1e-12)                 # w x w
    np.testing.assert_allclose(c_f[nb:2 * nb, :nb],
                               c_h[nb:2 * nb, :nb], rtol=1e-12)
    xi = slice(2 * nb, 3 * nb)
    assert np.max(np.abs(c_f[xi, xi] / c_h[xi, xi] - 1.0)) > 0.01
