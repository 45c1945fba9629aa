"""Independent scipy oracle: trusted-slow float64 adaptive quadrature.

Regenerated from SURVEY.md Appendix D (the survey session's measurement
artifact).  Conventions exactly match SURVEY.md Appendix B — chomp's
documented behavior (nu = squared peak height, NFW97 delta_c fit,
EH98 no-wiggle default, h-units).  Every JAX grid quadrature in
``chomp_tpu`` is validated against this module per SURVEY.md §4's test
strategy ("tests/oracle/ scipy implementation, adaptive quad, float64").
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy import integrate
from scipy.optimize import brentq
from scipy.special import j0, jn, sici

OM, OB, H, SIG8, NS, TCMB = 0.278, 0.046, 0.7, 0.811, 0.960, 2.726
OL = 1.0 - OM
CH = 299792.458 / 100.0  # c/H0 in Mpc/h
RHO_CRIT = 2.7754e11


def ez(z):
    return np.sqrt(OM * (1 + z) ** 3 + OL)


def chi(z):
    v, _ = integrate.quad(lambda zp: 1.0 / ez(zp), 0, z, epsrel=1e-10)
    return CH * v


def growth_unnorm(z):
    a = 1.0 / (1 + z)
    integ, _ = integrate.quad(
        lambda ap: ap**-3 * (OM / ap**3 + OL) ** -1.5, 1e-8, a, epsrel=1e-10
    )
    return 2.5 * OM * np.sqrt(OM / a**3 + OL) * integ


@lru_cache(maxsize=None)
def _d0():
    return growth_unnorm(0.0)


def growth(z):
    return growth_unnorm(z) / _d0()


# EH98 no-wiggle transfer (k in h/Mpc)
OMH2, OBH2 = OM * H * H, OB * H * H
THETA = TCMB / 2.7
S_NW = 44.5 * np.log(9.83 / OMH2) / np.sqrt(1.0 + 10.0 * OBH2**0.75)  # Mpc
FB = OB / OM
ALPHA_G = 1.0 - 0.328 * np.log(431.0 * OMH2) * FB + 0.38 * np.log(22.3 * OMH2) * FB * FB


def transfer(k):
    ks = k * H * S_NW
    gamma_eff = OM * H * (ALPHA_G + (1.0 - ALPHA_G) / (1.0 + (0.43 * ks) ** 4))
    q = k * THETA * THETA / gamma_eff
    l0 = np.log(2.0 * np.e + 1.8 * q)
    c0 = 14.2 + 731.0 / (1.0 + 62.5 * q)
    return l0 / (l0 + c0 * q * q)


def p_unnorm(k):
    return k**NS * transfer(k) ** 2


def w_th(x):
    return 3.0 * (np.sin(x) - x * np.cos(x)) / x**3


def sigma2_r(r, pk=p_unnorm):
    """sigma^2_un(R) over ln k in [ln 1e-5, ln 1e3].

    NOTE (Appendix A errata, verified round 1 with mpmath at 30 digits):
    ``scipy.integrate.quad`` silently under-converges on the oscillatory
    W^2(kR) tail (even chunked, even at epsrel=1e-12), biasing the
    survey-session normalization by ~+7.5e-5 relative.  A dense composite
    Simpson rule (2^20+1 points; converged to <1e-12, agreeing with
    mpmath) is the trusted oracle here.
    """
    lnk = np.linspace(np.log(1e-5), np.log(1e3), 2**20 + 1)
    k = np.exp(lnk)
    f = k**3 * pk(k) * w_th(k * r) ** 2 / (2 * np.pi**2)
    return integrate.simpson(f, x=lnk)


@lru_cache(maxsize=None)
def norm():
    return SIG8**2 / sigma2_r(8.0)


def pk_lin(k, z=0.0):
    return norm() * p_unnorm(k) * growth(z) ** 2


def sigma_m(m, z=0.0):
    rho_bar = RHO_CRIT * OM
    r = (3.0 * m / (4.0 * np.pi * rho_bar)) ** (1.0 / 3.0)
    return np.sqrt(norm() * sigma2_r(r)) * growth(z)


def delta_c(z=0.0):
    omz = OM * (1 + z) ** 3 / ez(z) ** 2
    return 0.15 * (12.0 * np.pi) ** (2.0 / 3.0) * omz**0.0055


def nu(m, z=0.0):
    return (delta_c(z) / sigma_m(m, z)) ** 2


@lru_cache(maxsize=None)
def mstar():
    """log10 M* where nu(M*, z=0) = 1."""
    return brentq(lambda lm: nu(10**lm) - 1.0, 10.0, 15.0, xtol=1e-10)


# Sheth-Tormen, chomp nu-squared convention (SURVEY.md App. B.4).
ST_A, ST_Q = 0.707, 0.3


def f_nu_raw(v):
    return (
        (1.0 + (ST_A * v) ** (-ST_Q))
        * np.sqrt(ST_A * v)
        * np.exp(-ST_A * v / 2.0)
        / v
    )


@lru_cache(maxsize=None)
def f_norm(m_min=1e9, m_max=1e16):
    numin, numax = nu(m_min), nu(m_max)
    fn_int, _ = integrate.quad(f_nu_raw, numin, numax, epsrel=1e-10, limit=400)
    return 1.0 / fn_int


def bias_st_raw(v, z=0.0):
    dc = delta_c(z)
    return 1.0 + (ST_A * v - 1.0) / dc + 2.0 * ST_Q / (dc * (1.0 + (ST_A * v) ** ST_Q))


@lru_cache(maxsize=None)
def bias_norm(m_min=1e9, m_max=1e16):
    numin, numax = nu(m_min), nu(m_max)
    fn = f_norm(m_min, m_max)
    v, _ = integrate.quad(
        lambda x: fn * f_nu_raw(x) * bias_st_raw(x), numin, numax,
        epsrel=1e-10, limit=400,
    )
    return 1.0 / v


def dndlnm(m, m_min=1e9, m_max=1e16):
    """dn/dlnM in (h/Mpc)^3.

    dn/dM = f_n(nu) (rho_bar/M^2) (dnu/dlnM), so
    dn/dlnM = M dn/dM = f_n(nu) (rho_bar/M) (dnu/dlnM)
    (SURVEY.md Appendix B.4; dnu/dlnM here by central difference).
    """
    fn = f_norm(m_min, m_max)
    eps = 1e-4
    lnm = np.log(m)
    nu_hi = nu(np.exp(lnm + eps))
    nu_lo = nu(np.exp(lnm - eps))
    dnu_dlnm = (nu_hi - nu_lo) / (2 * eps)
    rho_bar = RHO_CRIT * OM
    return fn * f_nu_raw(nu(m)) * (rho_bar / m) * dnu_dlnm


# ---------------------------------------------------------------------------
# Projections: Limber C_ell and w(theta) for linear clustering.
# ---------------------------------------------------------------------------
Z0, SZ = 1.0, 0.2
ZMIN, ZMAX = 0.0, 2.0


def dndz_raw(z):
    return np.exp(-0.5 * ((z - Z0) / SZ) ** 2)


@lru_cache(maxsize=None)
def _dndz_norm():
    v, _ = integrate.quad(dndz_raw, ZMIN, ZMAX, epsrel=1e-10)
    return v


def fz(z):
    return dndz_raw(z) / _dndz_norm()


@lru_cache(maxsize=None)
def _chi_growth_splines():
    """Dense cubic splines of chi(z), D(z) (1e-10-level, for speed in the
    projection integrals; the underlying quads are smooth/converged)."""
    from scipy.interpolate import CubicSpline

    zg = np.linspace(1e-6, 3.5, 1200)
    chis = np.array([chi(z) for z in zg])
    ds = np.array([growth(z) for z in zg])
    return CubicSpline(zg, chis), CubicSpline(zg, ds)


def pk_lin_z0(k):
    return norm() * p_unnorm(k)


def cl_limber(ell, pk_z0=pk_lin_z0):
    """Limber C_l for the clustering dN/dz above, with separable growth:
    P(k, z) = pk_z0(k) * D(z)^2 (chomp's factorization — SURVEY.md §2
    kernel.Kernel note).  ``pk_z0`` may be the halo-model P(k) at z=0."""
    chi_s, d_s = _chi_growth_splines()

    def integ(z):
        x = chi_s(z)
        k = (ell + 0.5) / x
        return fz(z) ** 2 * ez(z) / CH / x**2 * pk_z0(k) * d_s(z) ** 2

    v, _ = integrate.quad(integ, 0.02, ZMAX, epsrel=1e-9, limit=300)
    return v


def w_theta(theta_deg, cl=cl_limber, lmin=1.0, lmax=3e5):
    """w(theta) = ∫ l dl/(2 pi) C_l J0(l theta).

    Oscillatory-integral hygiene (same quad failure mode as sigma2_r):
    integrate piecewise between consecutive J0 zeros so each chunk is
    non-oscillatory, then sum.  C_l is evaluated on a log-l spline to
    keep cost sane (its own quadrature is smooth/converged).
    """
    from scipy.interpolate import CubicSpline
    from scipy.special import jn_zeros

    th = np.radians(theta_deg)
    lnl_grid = np.linspace(np.log(lmin), np.log(lmax), 400)
    cl_grid = np.array([cl(np.exp(x)) for x in lnl_grid])
    cl_spl = CubicSpline(lnl_grid, np.log(cl_grid))

    def integ(ell):
        return ell / (2 * np.pi) * np.exp(cl_spl(np.log(ell))) * j0(ell * th)

    n_zeros = min(int(lmax * th / np.pi) + 2, 100000)
    zeros = jn_zeros(0, n_zeros) / th
    edges = np.concatenate([[lmin], zeros[(zeros > lmin) & (zeros < lmax)], [lmax]])
    total = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        v, _ = integrate.quad(integ, lo, hi, epsrel=1e-10, limit=200)
        total += v
    return total


# ---------------------------------------------------------------------------
# NFW profile Fourier transform.
# ---------------------------------------------------------------------------


def delta_v_fn(z=0.0):
    omz = OM * (1 + z) ** 3 / ez(z) ** 2
    x = omz - 1.0
    return (18 * np.pi**2 + 82.0 * x - 39.0 * x * x) / omz  # BN98, wrt mean


def concentration(m, z=0.0):
    return 9.0 / (1.0 + z) * (m / 10 ** mstar()) ** (-0.13)


def y_nfw(k, m, z=0.0):
    rho_bar = RHO_CRIT * OM
    rv = (3.0 * m / (4.0 * np.pi * rho_bar * delta_v_fn(z))) ** (1.0 / 3.0)
    c = concentration(m, z)
    rs = rv / c
    krs = k * rs
    si1, ci1 = sici((1 + c) * krs)
    si0, ci0 = sici(krs)
    mc = np.log(1.0 + c) - c / (1.0 + c)
    return (
        np.sin(krs) * (si1 - si0)
        - np.sin(c * krs) / ((1 + c) * krs)
        + np.cos(krs) * (ci1 - ci0)
    ) / mc


# ---------------------------------------------------------------------------
# Halo-model power spectra (independent quadrature path for validating
# chomp_tpu.halo — same Appendix B.7 formulas, scipy adaptive quad over
# lnM against spline-accelerated sigma(M)).
# ---------------------------------------------------------------------------

HOD_DEFAULT = dict(log10_m_min=12.14, sigma=0.15, log10_m_0=12.14,
                   log10_m_1p=13.43, alpha=1.0)

LN_M_MIN, LN_M_MAX = np.log(1e9), np.log(1e16)


@lru_cache(maxsize=None)
def _sigma2_spline():
    """Cubic spline of ln sigma^2_un(ln M) (Simpson-backed, ~1e-10)."""
    from scipy.interpolate import CubicSpline

    lnm = np.linspace(np.log(1e8), np.log(1e17), 400)
    rho_bar = RHO_CRIT * OM
    r = (3.0 * np.exp(lnm) / (4.0 * np.pi * rho_bar)) ** (1.0 / 3.0)
    s2 = np.array([sigma2_r(ri) for ri in r])
    return CubicSpline(lnm, np.log(s2))


def _nu_spl(lnm, z=0.0):
    s2 = np.exp(_sigma2_spline()(lnm)) * norm() * growth(z) ** 2
    return delta_c(z) ** 2 / s2


def _dnu_dlnm_spl(lnm, z=0.0):
    return -_nu_spl(lnm, z) * _sigma2_spline()(lnm, 1)


def _f_n_spl(lnm, z=0.0):
    return f_norm() * f_nu_raw(_nu_spl(lnm, z))


def _bias_n_spl(lnm, z=0.0):
    return bias_norm() * bias_st_raw(_nu_spl(lnm, z), z)


def _dndlnm_spl(lnm, z=0.0):
    rho_bar = RHO_CRIT * OM
    return _f_n_spl(lnm, z) * (rho_bar / np.exp(lnm)) * _dnu_dlnm_spl(lnm, z)


def hod_zheng_first(m, p=HOD_DEFAULT):
    from scipy.special import erf as _erf

    ncen = 0.5 * (1 + _erf((np.log10(m) - p["log10_m_min"]) / p["sigma"]))
    m0, m1p = 10 ** p["log10_m_0"], 10 ** p["log10_m_1p"]
    nsat = ncen * np.where(m > m0, (np.maximum(m - m0, 0) / m1p) ** p["alpha"], 0.0)
    return ncen, nsat


def hod_first_moment(m, p=HOD_DEFAULT):
    nc, ns = hod_zheng_first(m, p)
    return nc + ns


def hod_second_moment(m, p=HOD_DEFAULT):
    nc, ns = hod_zheng_first(m, p)
    return 2 * nc * ns + ns * ns


@lru_cache(maxsize=None)
def n_g(z=0.0):
    v, _ = integrate.quad(
        lambda lnm: _dndlnm_spl(lnm, z) * hod_first_moment(np.exp(lnm)),
        LN_M_MIN, LN_M_MAX, epsrel=1e-10, limit=400)
    return v


def y_nfw_mstar(k, m, m_star_val, z=0.0):
    """y_NFW with an explicit M* (to share the tested code's M*)."""
    rho_bar = RHO_CRIT * OM
    rv = (3.0 * m / (4.0 * np.pi * rho_bar * delta_v_fn(z))) ** (1.0 / 3.0)
    c = 9.0 / (1.0 + z) * (m / m_star_val) ** (-0.13)
    rs = rv / c
    krs = k * rs
    si1, ci1 = sici((1 + c) * krs)
    si0, ci0 = sici(krs)
    mc = np.log(1.0 + c) - c / (1.0 + c)
    return (np.sin(krs) * (si1 - si0) - np.sin(c * krs) / ((1 + c) * krs)
            + np.cos(krs) * (ci1 - ci0)) / mc


def halo_powers(k, z=0.0, m_star_val=None):
    """(p_lin, p_mm, p_gm, p_gg) at one k, Appendix B.7 conventions with
    the Scranton p-exponent heuristic (gg: <N(N-1)> < 1 -> y^1;
    gm: <N> < 1 -> y^1)."""
    if m_star_val is None:
        m_star_val = 10 ** mstar()
    rho_bar = RHO_CRIT * OM
    ngal = n_g(z)

    def quad_lnm(fn):
        v, _ = integrate.quad(fn, LN_M_MIN, LN_M_MAX, epsrel=1e-9, limit=400)
        return v

    def y(lnm):
        return y_nfw_mstar(k, np.exp(lnm), m_star_val, z)

    h_m = quad_lnm(lambda lnm: _f_n_spl(lnm, z) * _dnu_dlnm_spl(lnm, z)
                   * _bias_n_spl(lnm, z) * y(lnm))
    h_g = quad_lnm(lambda lnm: _dndlnm_spl(lnm, z)
                   * hod_first_moment(np.exp(lnm)) * _bias_n_spl(lnm, z)
                   * y(lnm)) / ngal
    pp_mm = quad_lnm(lambda lnm: _f_n_spl(lnm, z) * _dnu_dlnm_spl(lnm, z)
                     * np.exp(lnm) / rho_bar * y(lnm) ** 2)

    def gg_integrand(lnm):
        m = np.exp(lnm)
        n2 = hod_second_moment(m)
        p = np.where(n2 < 1.0, 1.0, 2.0)
        return _dndlnm_spl(lnm, z) * n2 * y(lnm) ** p

    pp_gg = quad_lnm(gg_integrand) / ngal**2

    def gm_integrand(lnm):
        m = np.exp(lnm)
        n1 = hod_first_moment(m)
        p = np.where(n1 < 1.0, 1.0, 2.0)
        return _dndlnm_spl(lnm, z) * m * n1 * y(lnm) ** p

    pp_gm = quad_lnm(gm_integrand) / (ngal * rho_bar)

    p_lin = pk_lin(k, z)
    return dict(
        linear_power=p_lin,
        power_mm=pp_mm + p_lin * h_m * h_m,
        power_gm=pp_gm + p_lin * h_m * h_g,
        power_gg=pp_gg + p_lin * h_g * h_g,
    )


# ---------------------------------------------------------------------------
# Lensing-efficiency window and general Limber (validates the projection
# layer's WindowConvergence path — BASELINE configs[3]).
# ---------------------------------------------------------------------------


def window_galaxy_z(z):
    return fz(z) * ez(z) / CH


def window_kappa_z(z):
    chi_s, _ = _chi_growth_splines()
    x = chi_s(z)

    def integ(zp):
        return fz(zp) * (chi_s(zp) - x) / chi_s(zp)

    v, _ = integrate.quad(integ, z, ZMAX, epsrel=1e-9, limit=200)
    return 1.5 * OM / CH**2 * (1 + z) * x * v


def cl_limber_general(ell, wa, wb, pk_z0=pk_lin_z0, zlo=1e-4, zhi=ZMAX):
    chi_s, d_s = _chi_growth_splines()

    def integ(z):
        x = chi_s(z)
        k = (ell + 0.5) / x
        dchi_dz = CH / ez(z)
        return wa(z) * wb(z) * dchi_dz / x**2 * pk_z0(k) * d_s(z) ** 2

    v, _ = integrate.quad(integ, zlo, zhi, epsrel=1e-9, limit=300)
    return v


def gamma_t_oracle(theta_deg, lmin=1.0, lmax=3e5):
    """gamma_t(theta) = ∫ l dl/(2 pi) C^{kappa g}_l J2(l theta), with the
    same Bessel-zero-chunked quadrature hygiene as w_theta."""
    from scipy.interpolate import CubicSpline
    from scipy.special import jn_zeros

    th = np.radians(theta_deg)
    lnl_grid = np.linspace(np.log(lmin), np.log(lmax), 400)
    cl_grid = np.array([cl_limber_general(np.exp(x), window_kappa_z,
                                          window_galaxy_z) for x in lnl_grid])
    cl_spl = CubicSpline(lnl_grid, np.log(cl_grid))

    def integ(ell):
        return ell / (2 * np.pi) * np.exp(cl_spl(np.log(ell))) * jn(2, ell * th)

    n_zeros = min(int(lmax * th / np.pi) + 4, 100000)
    zeros = jn_zeros(2, n_zeros) / th
    edges = np.concatenate([[lmin], zeros[(zeros > lmin) & (zeros < lmax)], [lmax]])
    total = 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        v, _ = integrate.quad(integ, lo, hi, epsrel=1e-10, limit=200)
        total += v
    return total


# ---------------------------------------------------------------------------
# General-cosmology oracle (non-fiducial validation: w0/wa dark energy,
# curvature, shifted parameters).  Same conventions as the fiducial
# functions above, parametrized.
# ---------------------------------------------------------------------------


def cosmo_funcs(om=OM, ob=OB, h=H, s8=SIG8, ns=NS, tcmb=TCMB,
                w0=-1.0, wa=0.0, ol=None):
    """Closure bundle of background/linear functions for arbitrary
    parameters (CPL dark energy, optional curvature via ol != 1-om)."""
    if ol is None:
        ol = 1.0 - om
    ok = 1.0 - om - ol

    def ez_g(z):
        zp1 = 1.0 + z
        de = ol * zp1 ** (3.0 * (1.0 + w0 + wa)) * np.exp(
            -3.0 * wa * (1.0 - 1.0 / zp1))
        return np.sqrt(om * zp1**3 + ok * zp1**2 + de)

    def chi_g(z):
        v, _ = integrate.quad(lambda zp: 1.0 / ez_g(zp), 0, z, epsrel=1e-10)
        return CH * v

    def growth_unnorm_g(z):
        a = 1.0 / (1 + z)
        integ, _ = integrate.quad(
            lambda ap: 1.0 / (ap * ez_g(1.0 / ap - 1.0)) ** 3, 1e-8, a,
            epsrel=1e-10, limit=300)
        return 2.5 * om * ez_g(z) * integ

    d0 = None

    def growth_g(z):
        nonlocal d0
        if d0 is None:
            d0 = growth_unnorm_g(0.0)
        return growth_unnorm_g(z) / d0

    omh2, obh2 = om * h * h, ob * h * h
    theta = tcmb / 2.7
    s_nw = 44.5 * np.log(9.83 / omh2) / np.sqrt(1.0 + 10.0 * obh2**0.75)
    fb = ob / om
    ag = (1.0 - 0.328 * np.log(431.0 * omh2) * fb
          + 0.38 * np.log(22.3 * omh2) * fb * fb)

    def transfer_g(k):
        ks = k * h * s_nw
        ge = om * h * (ag + (1.0 - ag) / (1.0 + (0.43 * ks) ** 4))
        q = k * theta * theta / ge
        l0 = np.log(2.0 * np.e + 1.8 * q)
        c0 = 14.2 + 731.0 / (1.0 + 62.5 * q)
        return l0 / (l0 + c0 * q * q)

    def p_unnorm_g(k):
        return k**ns * transfer_g(k) ** 2

    def sigma2_r_g(r):
        lnk = np.linspace(np.log(1e-5), np.log(1e3), 2**20 + 1)
        k = np.exp(lnk)
        f = k**3 * p_unnorm_g(k) * w_th(k * r) ** 2 / (2 * np.pi**2)
        return integrate.simpson(f, x=lnk)

    norm_g = s8**2 / sigma2_r_g(8.0)

    def pk_lin_g(k, z=0.0):
        return norm_g * p_unnorm_g(k) * growth_g(z) ** 2

    def sigma_m_g(m, z=0.0):
        rho_bar = RHO_CRIT * om
        r = (3.0 * m / (4.0 * np.pi * rho_bar)) ** (1.0 / 3.0)
        return np.sqrt(norm_g * sigma2_r_g(r)) * growth_g(z)

    return dict(ez=ez_g, chi=chi_g, growth=growth_g, pk_lin=pk_lin_g,
                sigma_m=sigma_m_g, norm=lambda: norm_g)


# ---------------------------------------------------------------------------
# SSC bias-weighted 1-halo response integrals (referee for
# chomp_tpu.ssc.response_one_halo_integrals): the one_halo integrands of
# halo_powers with an extra b(nu) factor.
# ---------------------------------------------------------------------------


def ssc_response_one_halo(k, z=0.0, m_star_val=None):
    """(i_mm_b, i_gg_b, i_gm_b) at one k by adaptive quadrature."""
    if m_star_val is None:
        m_star_val = 10 ** mstar()
    rho_bar = RHO_CRIT * OM
    ngal = n_g(z)

    def quad_lnm(fn):
        v, _ = integrate.quad(fn, LN_M_MIN, LN_M_MAX, epsrel=1e-9,
                              limit=400)
        return v

    def y(lnm):
        return y_nfw_mstar(k, np.exp(lnm), m_star_val, z)

    i_mm = quad_lnm(lambda lnm: _f_n_spl(lnm, z) * _dnu_dlnm_spl(lnm, z)
                    * _bias_n_spl(lnm, z) * np.exp(lnm) / rho_bar
                    * y(lnm) ** 2)

    def gg_integrand(lnm):
        m = np.exp(lnm)
        n2 = hod_second_moment(m)
        p = np.where(n2 < 1.0, 1.0, 2.0)
        return (_dndlnm_spl(lnm, z) * _bias_n_spl(lnm, z) * n2
                * y(lnm) ** p)

    i_gg = quad_lnm(gg_integrand) / ngal**2

    def gm_integrand(lnm):
        m = np.exp(lnm)
        n1 = hod_first_moment(m)
        p = np.where(n1 < 1.0, 1.0, 2.0)
        return (_dndlnm_spl(lnm, z) * _bias_n_spl(lnm, z) * m * n1
                * y(lnm) ** p)

    i_gm = quad_lnm(gm_integrand) / (ngal * rho_bar)
    return i_mm, i_gg, i_gm
