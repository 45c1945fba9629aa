"""Sheth-Tormen halo mass function and bias.

TPU-native replacement for the reference's ``mass_function.MassFunction``
(upstream:mass_function.py; SURVEY.md §2 row 4, Appendix B.4, C.1-C.3):

  - chomp builds an lnM spline grid, runs one adaptive sigma(M) Romberg
    per grid point (HOT LOOP 3, SURVEY.md §3.4), then integrates f(nu)
    with more Romberg.  Here ONE set of Gauss-Legendre nodes in lnM
    serves simultaneously as the evaluation grid, the interpolation
    table, and the quadrature rule for every mass integral downstream
    (n_g, halo-model 1h/2h integrals) — all sigma(M) values come from a
    single (n_mass x n_sigma) tensor contraction.
  - Conventions preserved exactly: nu = (delta_c/sigma)^2 (SQUARED peak
    height, Appendix C.1); f(nu) and b(nu) renormalized NUMERICALLY over
    the finite default mass range so that ∫ f dnu = 1 and ∫ f b dnu = 1
    (Appendix C.2 — values depend on [m_min, m_max]!).

Oracle targets: Appendix A.4 / tests/goldens.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, linear
from chomp_tpu.grids import gauss_legendre, gl_fixed
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec, HaloParams
from chomp_tpu.utils.tree import pytree_dataclass


@pytree_dataclass
class MassTables:
    """Precomputed mass-function state at one redshift (pure pytree —
    the functional analog of chomp's lazily-splined MassFunction object).

    ``ln_m``/``w_lnm`` are the GL nodes/weights in ln M: any mass
    integral is ``sum(w_lnm * integrand(nodes))``.
    """

    ln_m: jnp.ndarray        # (nM,) GL nodes
    w_lnm: jnp.ndarray       # (nM,) GL weights
    m: jnp.ndarray           # (nM,) masses
    sigma: jnp.ndarray       # (nM,) sigma(M, z)
    nu: jnp.ndarray          # (nM,) squared peak height
    dnu_dlnm: jnp.ndarray    # (nM,)
    f_nu: jnp.ndarray        # (nM,) NORMALIZED multiplicity f(nu)
    bias: jnp.ndarray        # (nM,) NORMALIZED ST bias b(nu)
    dndlnm: jnp.ndarray      # (nM,) dn/dlnM, (h/Mpc)^3
    f_norm: jnp.ndarray      # scalar
    bias_norm: jnp.ndarray   # scalar
    ln_m_star: jnp.ndarray   # scalar: ln M* where nu = 1
    delta_c: jnp.ndarray     # scalar: delta_c(z)
    growth: jnp.ndarray      # scalar: D(z)
    z: jnp.ndarray           # scalar


def halo_delta_c(cosmo: CosmoParams, halo: HaloParams, z=0.0):
    """Collapse threshold by sentinel (HaloParams docstring; the NFW97
    form is the SURVEY App. B.3 guess — [M]-confidence, so switchable):
    > 0 literal, -1 NFW97 fit, -2 Kitayama-Suto 1996 fit, -3 fixed EdS
    (3/20)(12 pi)^(2/3)."""
    dc = jnp.asarray(halo.delta_c)
    fit = jnp.where(
        dc > -1.5, background.delta_c(cosmo, z),
        jnp.where(dc > -2.5, background.delta_c_ks96(cosmo, z),
                  background.DELTA_C_EDS))
    return jnp.where(dc > 0.0, dc, fit)


#: Tinker et al. 2008 redshift-evolution exponent of b(z) at
#: Delta = 200 x mean: log10 alpha = -(0.75/log10(Delta/75))^1.2.
_T08_ALPHA = float(10.0 ** (-(0.75 / np.log10(200.0 / 75.0)) ** 1.2))
#: Tinker et al. 2010 bias coefficients at y = log10(Delta=200)
#: (their Table 2 fitting functions evaluated at y).
_T10_Y = float(np.log10(200.0))
_T10_EXP = float(np.exp(-(4.0 / _T10_Y) ** 4))
_T10_BIG_A = 1.0 + 0.24 * _T10_Y * _T10_EXP
_T10_LIT_A = 0.44 * _T10_Y - 0.88
_T10_BIG_C = 0.019 + 0.107 * _T10_Y + 0.19 * _T10_EXP
#: Tinker 2010's bias is calibrated with the FIXED EdS threshold.
_T10_DC = 1.686


def _f_tinker08_raw(nu, z, delta_c):
    """Tinker et al. 2008 multiplicity (Delta = 200 x mean background,
    their Eqs. 3-8 with the z-evolving coefficients, evolution clamped
    at z = 3 as in the calibration range) mapped to this framework's
    nu-squared convention: dn/dlnM = f_nu (rho/M) dnu/dlnM with
    dln sigma^{-1} = (1/2) dln nu, so f_nu = f(sigma) / (2 nu).
    Constants transcribed from the published paper (ApJ 688, 709) —
    same provenance policy as nlpower (referee'd by an independent
    implementation + abundance magnitudes in tests/test_mass.py)."""
    sig = delta_c / jnp.sqrt(nu)
    zc = jnp.clip(jnp.asarray(z), 0.0, 3.0)
    big_a = 0.186 * (1.0 + zc) ** -0.14
    a = 1.47 * (1.0 + zc) ** -0.06
    b = 2.57 * (1.0 + zc) ** -_T08_ALPHA
    f_sig = big_a * ((sig / b) ** -a + 1.0) * jnp.exp(-1.19 / sig**2)
    return f_sig / (2.0 * nu)


def _bias_tinker10_raw(nu):
    """Tinker et al. 2010 halo bias (Delta = 200 x mean; their Eq. 6
    with Table 2 coefficients), in peak height nu_t = sqrt(nu).
    Sim-calibrated amplitude — no PBS renormalization (the
    consistency ∫ f b dnu ~ 1 holds at the few-% level and is asserted
    in tests, not imposed)."""
    nut = jnp.sqrt(nu)
    na = nut**_T10_LIT_A
    return (1.0 - _T10_BIG_A * na / (na + _T10_DC**_T10_LIT_A)
            + 0.183 * nut**1.5 + _T10_BIG_C * nut**2.4)


def f_nu_raw(halo: HaloParams, nu, z=0.0, delta_c=_T10_DC):
    """Un-normalized multiplicity in the nu-squared convention.

    ``halo.mass_fn`` sentinel: 0 (default) = Sheth-Tormen (Appendix
    B.4: f ∝ (1 + (a nu)^-q) sqrt(a nu) exp(-a nu/2)/nu — chomp's
    form, finite-range renormalized in build_mass_tables); 1 = Tinker
    et al. 2008 at Delta = 200m (sim-calibrated amplitude, NOT
    renormalized).  ``z``/``delta_c`` are needed only by the Tinker
    branch (sigma = delta_c/sqrt(nu) and the z-evolving
    coefficients)."""
    a, q = halo.st_little_a, halo.stq
    anu = a * nu
    st = (1.0 + anu**-q) * jnp.sqrt(anu) * jnp.exp(-0.5 * anu) / nu
    sel = jnp.asarray(getattr(halo, "mass_fn", 0.0))
    if isinstance(sel, jnp.ndarray) and sel.ndim == 0 and not isinstance(
            sel, jax.core.Tracer) and float(sel) == 0.0:
        return st          # static fast path: no Tinker ops traced
    return jnp.where(sel < 0.5, st, _f_tinker08_raw(nu, z, delta_c))


def bias_raw(halo: HaloParams, nu, delta_c):
    """Un-normalized halo bias.  ``halo.mass_fn``: 0 = Sheth-Tormen
    (Appendix B.4: b = 1 + (a nu - 1)/delta_c +
    2 q/(delta_c (1 + (a nu)^q)), finite-range renormalized); 1 =
    Tinker et al. 2010 at Delta = 200m (calibrated, not
    renormalized)."""
    a, q = halo.st_little_a, halo.stq
    anu = a * nu
    st = (1.0 + (anu - 1.0) / delta_c
          + 2.0 * q / (delta_c * (1.0 + anu**q)))
    sel = jnp.asarray(getattr(halo, "mass_fn", 0.0))
    if isinstance(sel, jnp.ndarray) and sel.ndim == 0 and not isinstance(
            sel, jax.core.Tracer) and float(sel) == 0.0:
        return st
    return jnp.where(sel < 0.5, st, _bias_tinker10_raw(nu))


def build_mass_tables(
    cosmo: CosmoParams,
    halo: HaloParams,
    z=0.0,
    with_bao: bool = False,
    grid: GridSpec = DEFAULT_GRID,
) -> MassTables:
    """Build all mass-function state in one fused computation (the
    replacement for chomp ``MassFunction.__init__`` +
    ``_initialize_splines`` + ``_norm``/``_bias_norm``)."""
    ln_m_np, w_np = gl_fixed(float(np.log(grid.m_min)), float(np.log(grid.m_max)),
                             grid.n_mass)
    ln_m = jnp.asarray(ln_m_np)
    w_lnm = jnp.asarray(w_np)
    m = jnp.exp(ln_m)

    r = linear.radius_of_mass(cosmo, m)
    # At m_nu > 0 the collapse field is CDM+baryon: the EH99 "cb"
    # suppression at the build redshift enters the integrand, while D(z)
    # stays the separable scale-free growth (chomp_tpu.neutrino; exact
    # no-op at m_nu = 0).  Masses stay defined w.r.t. the TOTAL rho_bar.
    s2_un, ds2_dlnr = linear.sigma2_unnorm_r_and_dlnr(
        cosmo, r, with_bao, grid, nu_z=z, species="cb")
    norm = linear.power_norm(cosmo, with_bao, grid)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    sigma = jnp.sqrt(norm * s2_un) * d
    dc = halo_delta_c(cosmo, halo, z)
    nu = (dc / sigma) ** 2
    # d ln sigma^2 / d lnM = (1/3) (d sigma^2_un/d lnR)/sigma^2_un;
    # nu ∝ 1/sigma^2  =>  dnu/dlnM = -nu * d ln sigma^2 / d lnM.
    dnu_dlnm = -nu * ds2_dlnr / (3.0 * s2_un)

    f_raw = f_nu_raw(halo, nu, z, dc)
    # ∫ f dnu over [nu_min, nu_max] by the lnM-space rule (Appendix C.2:
    # renormalization over the FINITE mass range).  The Tinker forms
    # carry SIM-CALIBRATED amplitudes — renormalizing them to unity
    # would distort the abundance, so mass_fn != 0 pins both norms to 1
    # (Tinker08 does not integrate to 1 at Delta = 200m by design).
    sel = jnp.asarray(getattr(halo, "mass_fn", 0.0))
    f_integral = jnp.sum(w_lnm * f_raw * dnu_dlnm)
    f_norm = jnp.where(sel < 0.5, 1.0 / f_integral, 1.0)
    f_n = f_norm * f_raw

    b_raw = bias_raw(halo, nu, dc)
    b_integral = jnp.sum(w_lnm * f_n * b_raw * dnu_dlnm)
    bias_norm = jnp.where(sel < 0.5, 1.0 / b_integral, 1.0)
    b_n = bias_norm * b_raw

    dndlnm = f_n * (cosmo.rho_bar / m) * dnu_dlnm

    # M*: nu(M*) = 1, via interpolation of the monotone ln nu(ln M) table.
    ln_m_star = jnp.interp(0.0, jnp.log(nu), ln_m)

    return MassTables(
        ln_m=ln_m, w_lnm=w_lnm, m=m, sigma=sigma, nu=nu, dnu_dlnm=dnu_dlnm,
        f_nu=f_n, bias=b_n, dndlnm=dndlnm,
        f_norm=f_norm, bias_norm=bias_norm, ln_m_star=ln_m_star,
        delta_c=dc, growth=d, z=jnp.asarray(z),
    )


# ---------------------------------------------------------------------------
# chomp MassFunction method equivalents.
#
# Evaluations at arbitrary mass are EXACT (a fresh sigma(M) contraction,
# which is just one more tensor op) rather than interpolated off the GL
# table — linear interpolation between nodes costs ~1e-4 in the steep
# exponential cutoff, the exact path costs nothing at TPU throughput.
# Only genuinely inverse lookups (m_of_nu) go through the table.
# ---------------------------------------------------------------------------

def f_nu(tables: MassTables, halo: HaloParams, nu):
    """Normalized f(nu) (chomp ``MassFunction.f_nu``)."""
    return tables.f_norm * f_nu_raw(halo, nu, tables.z, tables.delta_c)


def bias_nu(tables: MassTables, halo: HaloParams, nu):
    """Normalized ST bias b(nu) (chomp ``MassFunction.bias_nu``)."""
    return tables.bias_norm * bias_raw(halo, nu, tables.delta_c)


def nu_of_m(cosmo: CosmoParams, tables: MassTables, m,
            with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """nu(M) at the tables' redshift, exact (chomp ``MassFunction.nu``).
    Uses the tables' own resolved delta_c so a non-default threshold
    convention (HaloParams.delta_c sentinel) stays consistent."""
    r = linear.radius_of_mass(cosmo, m)
    s2_un, _ = linear.sigma2_unnorm_r_and_dlnr(
        cosmo, r, with_bao, grid, nu_z=tables.z, species="cb")
    sigma = jnp.sqrt(linear.power_norm(cosmo, with_bao, grid) * s2_un
                     ) * tables.growth
    return (tables.delta_c / sigma) ** 2


def m_of_nu(tables: MassTables, nu):
    """M(nu) inverse lookup via the monotone table (chomp
    ``MassFunction.mass``): 4-point Lagrange in (ln nu, ln M) on the
    non-uniform GL nodes — ~1e-9 relative at the n_mass=256 default
    (linear interpolation cost 8e-5, outside the round-trip contract).
    API path only (one small gather); the pipelines never invert."""
    lnq = jnp.atleast_1d(jnp.log(jnp.asarray(nu)))
    xs = jnp.log(tables.nu)                    # increasing in M? nu grows
    ys = tables.ln_m
    n = xs.shape[0]
    i = jnp.clip(jnp.searchsorted(xs, lnq) - 1, 1, n - 3)
    idx = i[:, None] + jnp.arange(-1, 3)[None, :]          # (q, 4)
    xn = xs[idx]                                           # (q, 4)
    yn = ys[idx]
    out = jnp.zeros_like(lnq)
    for a in range(4):
        w = jnp.ones_like(lnq)
        for b_ in range(4):
            if b_ != a:
                w = w * (lnq - xn[:, b_]) / (xn[:, a] - xn[:, b_])
        out = out + w * yn[:, a]
    res = jnp.exp(out)
    return res if jnp.ndim(nu) else res[0]


def f_m(cosmo: CosmoParams, tables: MassTables, halo: HaloParams, m,
        with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """f(nu(M)) (chomp ``MassFunction.f_m``)."""
    return f_nu(tables, halo, nu_of_m(cosmo, tables, m, with_bao, grid))


def bias_m(cosmo: CosmoParams, tables: MassTables, halo: HaloParams, m,
           with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """b(nu(M)) (chomp ``MassFunction.bias_m``)."""
    return bias_nu(tables, halo, nu_of_m(cosmo, tables, m, with_bao, grid))


def dnu_dlnm_exact(cosmo: CosmoParams, tables: MassTables, m,
                   with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """Exact dnu/dlnM at the tables' redshift."""
    r = linear.radius_of_mass(cosmo, m)
    s2_un, ds2_dlnr = linear.sigma2_unnorm_r_and_dlnr(
        cosmo, r, with_bao, grid, nu_z=tables.z, species="cb")
    nu = tables.delta_c**2 / (s2_un * (tables.growth**2)
                              * linear.power_norm(cosmo, with_bao, grid))
    return -nu * ds2_dlnr / (3.0 * s2_un)


def dndm(cosmo: CosmoParams, tables: MassTables, halo: HaloParams, m,
         with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """dn/dM in (h/Mpc)^3 / (M_sun/h), exact (chomp
    ``MassFunction.dndm``): f_n(nu) (rho_bar/M^2) dnu/dlnM."""
    m = jnp.asarray(m)
    nu = nu_of_m(cosmo, tables, m, with_bao, grid)
    dnu = dnu_dlnm_exact(cosmo, tables, m, with_bao, grid)
    return f_nu(tables, halo, nu) * (cosmo.rho_bar / m**2) * dnu


def m_star(tables: MassTables):
    """M* with nu(M*) = 1 (chomp's M* used by the concentration)."""
    return jnp.exp(tables.ln_m_star)


def integrate_lnm(tables: MassTables, values):
    """∫ values dlnM over the default mass range with the table's GL rule
    (the workhorse behind n_g and every halo-model mass integral)."""
    return jnp.sum(tables.w_lnm * values, axis=-1)


@pytree_dataclass
class NodePack:
    """Mass-function quantities evaluated exactly at an arbitrary
    (possibly traced) set of lnM quadrature nodes — used for split-domain
    integrals whose panel boundaries depend on traced parameters (the
    Scranton y-exponent switch in the 1-halo terms)."""

    ln_m: jnp.ndarray
    w_lnm: jnp.ndarray
    m: jnp.ndarray
    nu: jnp.ndarray
    dnu_dlnm: jnp.ndarray
    f_nu: jnp.ndarray
    bias: jnp.ndarray
    dndlnm: jnp.ndarray


def node_pack(cosmo: CosmoParams, halo: HaloParams, tables: MassTables,
              ln_lo, ln_hi, n: int,
              with_bao: bool = False, grid: GridSpec = DEFAULT_GRID) -> NodePack:
    """GL rule of order ``n`` on [ln_lo, ln_hi] (traced endpoints OK) with
    all mass-function quantities computed exactly at the nodes.  The
    normalizations (f_norm/bias_norm/delta_c/growth) come from ``tables``
    so the pack is consistent with the full-range renormalization."""
    x, w = gauss_legendre(n)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    half = 0.5 * (ln_hi - ln_lo)
    ln_m = 0.5 * (ln_hi + ln_lo) + half * x
    w_lnm = half * w
    m = jnp.exp(ln_m)
    r = linear.radius_of_mass(cosmo, m)
    s2_un, ds2_dlnr = linear.sigma2_unnorm_r_and_dlnr(
        cosmo, r, with_bao, grid, nu_z=tables.z, species="cb")
    norm = linear.power_norm(cosmo, with_bao, grid)
    sigma = jnp.sqrt(norm * s2_un) * tables.growth
    nu = (tables.delta_c / sigma) ** 2
    dnu_dlnm = -nu * ds2_dlnr / (3.0 * s2_un)
    f_n = tables.f_norm * f_nu_raw(halo, nu, tables.z, tables.delta_c)
    b_n = tables.bias_norm * bias_raw(halo, nu, tables.delta_c)
    dndlnm = f_n * (cosmo.rho_bar / m) * dnu_dlnm
    return NodePack(ln_m=ln_m, w_lnm=w_lnm, m=m, nu=nu, dnu_dlnm=dnu_dlnm,
                    f_nu=f_n, bias=b_n, dndlnm=dndlnm)
