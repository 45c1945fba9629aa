"""Nonlinear matter power: revised halofit (Takahashi et al. 2012).

Capability extension beyond chomp (upstream's only nonlinear matter
power is the 1-halo + 2-halo model, SURVEY.md §2 row 6): the standard
fitting formula calibrated on high-resolution N-body suites — the
default matter power of every production cosmic-shear analysis.  The
halo-model mm spectrum is structurally useful (consistent with the
gg/gm HOD sector) but is known to be tens of percent off N-body in the
1-halo/2-halo transition (k ~ 0.1-1 h/Mpc), exactly the scales that
dominate xi_+/-.  This module provides

    P_NL(k, z) = (2 pi^2 / k^3) [ Delta^2_Q(k) + Delta^2_H(k) ]

with Takahashi 2012's revised coefficients (their Eqs. A1-A22; Smith
et al. 2003 functional form), as an OPT-IN replacement for the mm legs
of the prediction pipelines (``matter_power="halofit"`` on
make_pipeline / make_tomographic_pipeline — cosmic-shear xi_pm and
kappa rows; the gg/gm legs keep the HOD halo model, which halofit
cannot describe).

TPU-first design:
- sigma^2_G(R, z) (GAUSSIAN filter, as halofit requires — NOT the
  top-hat sigma of the mass sector) and both its lnR log-derivatives
  are ANALYTIC static-node quadratures over the EH98 spectrum: one
  (n_k,) contraction each, zero gathers, exact derivative formulas
  (d/dlnR brings down -2k^2R^2 e^{-k^2R^2} etc. under the integral).
- The nonlinear scale k_sigma = 1/R_sigma with sigma_G(R_sigma) = 1 is
  a FIXED-ITERATION Newton in ln R on ln sigma^2 (a near-linear
  monotone function of slope -(n_eff+3); 12 iterations from a
  growth-scaled seed reach float64 roundoff — residual asserted in
  tests).  Fixed iteration count keeps the program static and
  differentiable (the dominant autodiff path flows through the final
  residual, mimicking implicit differentiation).
- Everything is a closed-form elementwise map after that: jit / vmap /
  grad through cosmology and redshift both work.

Provenance of the constants: transcribed from the published Takahashi
et al. 2012 appendix (ApJ 761, 152, arXiv:1208.2701) — no numerical
tables or code available in this environment to diff against, so the
test suite referees an INDEPENDENT scipy implementation of the same
published formulas (catches transcription/assembly errors on one side)
plus the physical limits: P_NL -> P_lin at k << k_sigma, the
sigma_G(R_sigma) = 1 closure, N-body-calibrated boost magnitudes at
k = 1, and monotonicity in sigma_8.  Dark energy enters through
Omega_w(z) (1 + w(z)) in a_n/b_n with w(z) = w0 + wa z/(1+z) evaluated
at the target epoch (the constant-w calibration used at the local
equation of state — the standard CPL extension), and curvature through
the Smith03 open/flat interpolation of the f1-f3 exponents.

upstream: no counterpart (chomp has no N-body-calibrated power).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, linear
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec

__all__ = ["sigma_g2", "halofit_params", "halofit_power",
           "p_lattice_halofit"]

_HP = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _gauss_sigma_nodes(n: int = 768, k_lo: float = 1e-5,
                       k_hi: float = 1e3):
    """Static ln-k trapezoid nodes for the Gaussian-filtered variance
    (the e^{-k^2 R^2} cutoff needs reach to k ~ 100 for the z ~ 3
    nonlinear scale; convergence asserted by order-doubling)."""
    lnk = np.linspace(np.log(k_lo), np.log(k_hi), n)
    w = np.full(n, lnk[1] - lnk[0])
    w[0] *= 0.5
    w[-1] *= 0.5
    return np.exp(lnk), w


def _delta2_lin(cosmo: CosmoParams, k, z, with_bao: bool,
                grid: GridSpec):
    """Linear Delta^2 of the COLLAPSING sector: CDM+baryon at m_nu > 0
    (neutrinos free-stream out of the nonlinear collapse halofit models;
    the total-matter output rescale happens in halofit_power).  Identical
    to total matter at m_nu = 0."""
    return (k**3 / (2.0 * np.pi**2)
            * linear.linear_power(cosmo, k, z, with_bao, grid,
                                  species="cb"))


def sigma_g2(cosmo: CosmoParams, r, z=0.0, with_bao: bool = False,
             grid: GridSpec = DEFAULT_GRID):
    """Gaussian-filtered variance sigma^2_G(R, z) =
    ∫ dlnk Delta^2_L(k, z) e^{-k^2 R^2} (halofit's smoothing — distinct
    from the mass sector's top-hat sigma)."""
    k_np, w_np = _gauss_sigma_nodes()
    k = jnp.asarray(k_np)
    d2 = _delta2_lin(cosmo, k, z, with_bao, grid) * jnp.asarray(w_np)
    x2 = (k * jnp.asarray(r)[..., None]) ** 2
    return jnp.sum(d2 * jnp.exp(-x2), axis=-1)


def _sigma_g2_derivs(cosmo: CosmoParams, lnr, z, with_bao: bool,
                     grid: GridSpec):
    """(sigma^2, dln sigma^2/dlnR, d^2 ln sigma^2/dlnR^2) at scalar
    lnR — analytic in-integral derivatives:
        d sigma^2/dlnR   = ∫ Delta^2 (-2 x2) e^{-x2} dlnk,
        d^2 sigma^2/dlnR^2 = ∫ Delta^2 (4 x2^2 - 4 x2) e^{-x2} dlnk,
    x2 = k^2 R^2."""
    k_np, w_np = _gauss_sigma_nodes()
    k = jnp.asarray(k_np)
    d2w = _delta2_lin(cosmo, k, z, with_bao, grid) * jnp.asarray(w_np)
    x2 = (k * jnp.exp(lnr)) ** 2
    e = jnp.exp(-x2)
    s2 = jnp.sum(d2w * e)
    ds2 = jnp.sum(d2w * (-2.0 * x2) * e)
    d2s2 = jnp.sum(d2w * (4.0 * x2 * x2 - 4.0 * x2) * e)
    dln = ds2 / s2
    return s2, dln, d2s2 / s2 - dln * dln


def halofit_params(cosmo: CosmoParams, z=0.0, with_bao: bool = False,
                   grid: GridSpec = DEFAULT_GRID, n_newton: int = 12):
    """(k_sigma, n_eff, C): the nonlinear scale sigma_G(1/k_sigma) = 1
    by fixed-iteration Newton in lnR, and the effective index /
    curvature
        n_eff = -3 - dln sigma^2/dlnR |_{R_sigma},
        C     = -d^2 ln sigma^2 / dlnR^2 |_{R_sigma}."""
    z = jnp.asarray(z)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    # Seed: the fiducial R_sigma ~ 2.7 (Mpc/h) scales ~ (sigma_8 D)^1.3
    # (local slope of ln sigma in ln R ~ -0.77); Newton cleans up any
    # reasonable seed in <= 6 iterations.
    lnr = jnp.log(2.7) + 1.3 * jnp.log(cosmo.sigma_8 * d / 0.8)

    def step(lnr, _):
        s2, dln, _d2 = _sigma_g2_derivs(cosmo, lnr, z, with_bao, grid)
        return lnr - jnp.log(s2) / dln, None

    lnr, _ = jax.lax.scan(step, lnr, None, length=n_newton)
    _s2, dln, d2 = _sigma_g2_derivs(cosmo, lnr, z, with_bao, grid)
    return jnp.exp(-lnr), -3.0 - dln, -d2


def _f_exponents(om_z, ol_z):
    """Smith03 f1-f3: interpolation between the open (a) and flat-LCDM
    (b) calibrations by frac = Omega_L/(1 - Omega_m) (flat -> pure b)."""
    f1a, f2a, f3a = om_z**-0.0732, om_z**-0.1423, om_z**0.0725
    f1b, f2b, f3b = om_z**-0.0307, om_z**-0.0585, om_z**0.0743
    denom = jnp.maximum(1.0 - om_z, 1e-12)
    frac = jnp.clip(ol_z / denom, 0.0, 1.0)
    return (frac * f1b + (1.0 - frac) * f1a,
            frac * f2b + (1.0 - frac) * f2a,
            frac * f3b + (1.0 - frac) * f3a)


def halofit_power(cosmo: CosmoParams, k, z=0.0, with_bao: bool = False,
                  grid: GridSpec = DEFAULT_GRID):
    """P_NL(k, z) in (Mpc/h)^3 — Takahashi 2012 revised halofit on the
    framework's EH98 linear spectrum (with or without BAO wiggles)."""
    k = jnp.asarray(k)
    z = jnp.asarray(z)
    k_sig, n, c = halofit_params(cosmo, z, with_bao, grid)
    om_z = background.omega_m_z(cosmo, z)
    ol_z = background.omega_l_z(cosmo, z)
    w_z = cosmo.w0 + cosmo.wa * z / (1.0 + z)
    ow1w = ol_z * (1.0 + w_z)

    an = 10.0 ** (1.5222 + 2.8553 * n + 2.3706 * n**2 + 0.9903 * n**3
                  + 0.2250 * n**4 - 0.6038 * c + 0.1749 * ow1w)
    bn = 10.0 ** (-0.5642 + 0.5864 * n + 0.5716 * n**2 - 1.5474 * c
                  + 0.2279 * ow1w)
    cn = 10.0 ** (0.3698 + 2.0404 * n + 0.8161 * n**2 + 0.5869 * c)
    gam = 0.1971 - 0.0843 * n + 0.8460 * c
    alp = jnp.abs(6.0835 + 1.3373 * n - 0.1959 * n**2 - 5.5274 * c)
    bet = (2.0379 - 0.7354 * n + 0.3157 * n**2 + 1.2490 * n**3
           + 0.3980 * n**4 - 0.1682 * c)
    nun = 10.0 ** (5.2105 + 3.6902 * n)
    f1, f2, f3 = _f_exponents(om_z, ol_z)

    y = k / k_sig
    d2l = _delta2_lin(cosmo, k, z, with_bao, grid)
    # Two-halo (quasi-linear) term with the e^{-y/4 - y^2/8} rolloff.
    d2q = (d2l * (1.0 + d2l) ** bet / (1.0 + alp * d2l)
           * jnp.exp(-(y / 4.0 + y * y / 8.0)))
    # One-halo term (mu_n = 0 in the revised fit).
    d2hp = (an * y ** (3.0 * f1)
            / (1.0 + bn * y**f2 + (cn * f3 * y) ** (3.0 - gam)))
    d2h = d2hp / (1.0 + nun / jnp.maximum(y, 1e-30) ** 2)
    # cb -> total matter: one D_cbnu/D_cb factor per matter leg
    # (identically 1 at m_nu = 0; see chomp_tpu.neutrino).
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import neutrino

    r = neutrino.m_over_cb(cosmo, k, z, grid.n_growth)
    p_nl = (d2q + d2h) * r * r * (2.0 * np.pi**2) / k**3
    # Baryon feedback on the halofit route = the a_mod interpolation
    # against the TOTAL-MATTER linear power (the profile knobs have no
    # halofit analog; CosmoParams.a_mod docstring).
    p_lin_m = linear.linear_power(cosmo, k, z, with_bao, grid, species="m")
    return halo_mod._a_mod_mm(cosmo, p_nl, p_lin_m)


def p_lattice_halofit(cosmo: CosmoParams, z=0.0, with_bao: bool = False,
                      grid: GridSpec = DEFAULT_GRID):
    """halofit P_NL on the pipeline k lattice — drop-in for a
    p_lattice_halo_all row (``limber_fft.k_lattice`` returns ln k)."""
    from chomp_tpu.limber_fft import k_lattice

    return halofit_power(cosmo, jnp.exp(jnp.asarray(k_lattice(grid))),
                         z, with_bao, grid)
