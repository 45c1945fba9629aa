"""Redshift-space galaxy power-spectrum multipoles + Gaussian covariance.

Capability extension beyond chomp (upstream has only projected real-
space statistics; SURVEY.md §2 rows 9-13 are all w(theta)/gamma_t):
the spectroscopic full-shape observable P_ell(k) for ell = 0, 2, 4,
built on the SAME halo-model spectra as the photometric pipelines, so
a joint photo+spectro analysis shares one halo build and one parameter
vector.

Model — the standard dispersion ("Kaiser x FoG") mapping on the halo
model's nonlinear spectra:

    P_s(k, mu) = [P_gg(k) + 2 f mu^2 P_gm(k) + f^2 mu^4 P_mm(k)]
                 * D_FoG(k mu sigma_v),
    D_FoG(x)   = 1 / (1 + x^2 / 2)          (Lorentzian damping)

with f = dlnD/dlna the linear growth rate (background.growth_rate,
analytic from the exact integral growth) and sigma_v a TRACED
finger-of-god dispersion nuisance in (Mpc/h) (sigma_v = 0 makes
D_FoG = 1 bitwise).  P_gg/P_gm/P_mm come from halo.powers, so the
neutrino sector (cb-sector galaxies, total-matter rescale on matter
legs) and the baryon-feedback knobs flow through automatically; the
scale dependence of f itself at m_nu > 0 is neglected (sub-dominant to
the suppression already carried by the spectra — documented).

Multipoles are static Gauss-Legendre contractions over mu in [0, 1]
(the integrand is even):  P_ell = (2 ell + 1) ∫_0^1 dmu L_ell(mu) P_s
— zero gathers, one (n_ell, n_mu) x (n_mu, n_k) matmul.

Covariance — Gaussian mode counting in a volume V (FKP/Grieb et al.
2016 form), diagonal in k-bins:

    Cov[P_l(k), P_l'(k)] = (2l+1)(2l'+1) / N_k
                           * ∫_0^1 dmu L_l L_l' [P_s(k, mu) + 1/n]^2,
    N_k = V k^2 dk / (4 pi^2)   (independent complex modes per shell)

which reduces to the classic (P + 1/n)^2 / N_k FKP variance at l = 0
for a mu-independent spectrum (tested), with 1/n = 1/model.n_g the
Poisson shot noise.  Not modeled (documented): window convolution of
the multipoles, Alcock-Paczynski distortion (a fixed fiducial
geometry is assumed per sample), and non-Gaussian covariance terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, halo
from chomp_tpu.grids import gauss_legendre
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec, HaloParams

__all__ = ["power_rsd_mu", "multipoles", "multipole_covariance",
           "ap_parameters", "multipoles_ap", "f_sigma8"]


def f_sigma8(cosmo: CosmoParams, z, grid: GridSpec = DEFAULT_GRID):
    """The compressed growth observable f(z) sigma_8(z) every RSD
    analysis publishes: the scale-free growth rate times the z=0
    total-matter sigma_8 carried by D(z).  Likelihood-ready alongside
    chomp_tpu.bao — traced through every CosmoParams leaf."""
    z = jnp.asarray(z)
    f = background.growth_rate(cosmo, z, grid.n_growth)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    return f * cosmo.sigma_8 * d


def _legendre(ell: int, mu):
    """L_ell(mu) for the even multipoles used here (closed forms)."""
    if ell == 0:
        return jnp.ones_like(mu)
    if ell == 2:
        return 0.5 * (3.0 * mu * mu - 1.0)
    if ell == 4:
        m2 = mu * mu
        return 0.125 * (35.0 * m2 * m2 - 30.0 * m2 + 3.0)
    raise ValueError(f"only even ell in (0, 2, 4) supported, got {ell}")


def _fog(x):
    """Lorentzian finger-of-god damping 1/(1 + x^2/2); exactly 1.0 at
    sigma_v = 0 (x*0 = 0, 1/(1+0) = 1 — bitwise no-op default)."""
    return 1.0 / (1.0 + 0.5 * x * x)


def power_rsd_mu(cosmo: CosmoParams, halo_p: HaloParams, model, k, mu,
                 sigma_v=0.0, with_bao: bool = False,
                 grid: GridSpec = DEFAULT_GRID, powers=None):
    """P_s(k_i, mu_j): the dispersion-model redshift-space galaxy power
    (module docstring).  ``powers``: optionally pass a precomputed
    halo.powers dict (shared across multipoles + covariance)."""
    k = jnp.atleast_1d(jnp.asarray(k))
    mu = jnp.atleast_1d(jnp.asarray(mu))
    ps = halo.powers(cosmo, halo_p, model, k, with_bao, grid) \
        if powers is None else powers
    f = background.growth_rate(cosmo, model.mass.z, grid.n_growth)
    m2 = mu * mu                                      # (n_mu,)
    kaiser = (ps["power_gg"][:, None]
              + 2.0 * f * ps["power_gm"][:, None] * m2[None, :]
              + f * f * ps["power_mm"][:, None] * (m2 * m2)[None, :])
    x = k[:, None] * mu[None, :] * jnp.asarray(sigma_v)
    return kaiser * _fog(x)                           # (n_k, n_mu)


def _mu_rule(n_mu: int):
    x, w = gauss_legendre(n_mu)
    # Map [-1, 1] -> [0, 1].
    return jnp.asarray(0.5 * (x + 1.0)), jnp.asarray(0.5 * w)


def multipoles(cosmo: CosmoParams, halo_p: HaloParams, model, k,
               ells=(0, 2, 4), sigma_v=0.0, n_mu: int = 16,
               with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
               powers=None):
    """P_ell(k) for the requested even multipoles: (len(ells), n_k).

    The mu integrand is a degree-8 polynomial in mu times the rational
    FoG factor; n_mu = 16 GL nodes are referee-exact to ~1e-12 for
    k sigma_v ≲ 10 (tested against adaptive quadrature)."""
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, k, mu, sigma_v, with_bao,
                       grid, powers)                  # (n_k, n_mu)
    rows = jnp.stack([(2.0 * ell + 1.0) * _legendre(ell, mu) * w
                      for ell in ells])               # (n_ell, n_mu)
    return jnp.matmul(rows, p_s.T, precision=jax.lax.Precision.HIGHEST)


def ap_parameters(cosmo: CosmoParams, fid: CosmoParams, z, n: int = 64):
    """Alcock-Paczynski scaling factors (alpha_perp, alpha_par) at z:
    the observed coordinates were laid down with the FIDUCIAL cosmology,
    so transverse/radial separations rescale by

        alpha_perp = D_M(z) / D_M^fid(z),   alpha_par = D_H(z) / D_H^fid(z)

    (pure geometric convention — the template-fit convention divides
    each by r_d/r_d^fid; do that at the likelihood level if fitting
    compressed alphas).  Both exactly 1 at cosmo == fid."""
    z = jnp.asarray(z)
    a_perp = (background.transverse_comoving_distance(cosmo, z, n)
              / background.transverse_comoving_distance(fid, z, n))
    a_par = background.ez(fid, z) / background.ez(cosmo, z)
    return a_perp, a_par


def multipoles_ap(cosmo: CosmoParams, halo_p: HaloParams, model, k_obs,
                  fid: CosmoParams, ells=(0, 2, 4), sigma_v=0.0,
                  n_mu: int = 16, with_bao: bool = False,
                  grid: GridSpec = DEFAULT_GRID):
    """P_ell at OBSERVED wavenumbers ``k_obs`` (defined with the
    fiducial cosmology ``fid``) including the Alcock-Paczynski
    distortion:

        k_true mu_true = k' mu' / alpha_par,
        k_true sqrt(1-mu_true^2) = k' sqrt(1-mu'^2) / alpha_perp,
        P_obs(k', mu') = P_s(k_true, mu_true) / (alpha_perp^2 alpha_par)

    The halo-model spectra evaluate EXACTLY at any k (no spline), so
    the warped (n_k, n_mu) grid is one direct halo contraction — the
    TPU-native alternative to the usual interpolate-a-table approach.
    At cosmo == fid this reduces to :func:`multipoles` (alphas == 1;
    tested to float roundoff)."""
    k_obs = jnp.atleast_1d(jnp.asarray(k_obs))
    mu, w = _mu_rule(n_mu)
    a_perp, a_par = ap_parameters(cosmo, fid, model.mass.z, grid.n_dist)
    kpar = k_obs[:, None] * mu[None, :] / a_par          # (n_k, n_mu)
    kper = k_obs[:, None] * jnp.sqrt(1.0 - mu * mu)[None, :] / a_perp
    k_true = jnp.sqrt(kpar**2 + kper**2)
    mu_true = kpar / k_true
    ps = halo.powers(cosmo, halo_p, model, k_true.ravel(), with_bao, grid)
    f = background.growth_rate(cosmo, model.mass.z, grid.n_growth)
    m2 = (mu_true * mu_true).ravel()
    kaiser = (ps["power_gg"] + 2.0 * f * ps["power_gm"] * m2
              + f * f * ps["power_mm"] * m2 * m2)
    x = k_true.ravel() * mu_true.ravel() * jnp.asarray(sigma_v)
    p_s = (kaiser * _fog(x)).reshape(k_obs.shape[0], n_mu) / (
        a_perp * a_perp * a_par)
    rows = jnp.stack([(2.0 * ell + 1.0) * _legendre(ell, mu) * w
                      for ell in ells])
    return jnp.matmul(rows, p_s.T, precision=jax.lax.Precision.HIGHEST)


def multipole_covariance(cosmo: CosmoParams, halo_p: HaloParams, model,
                         k_edges, volume, ells=(0, 2, 4), sigma_v=0.0,
                         n_mu: int = 16, with_bao: bool = False,
                         grid: GridSpec = DEFAULT_GRID, n_bar=None):
    """Gaussian multipole covariance for k bins ``k_edges`` (h/Mpc) in a
    survey volume ``volume`` ((Mpc/h)^3): (n_ell n_k, n_ell n_k),
    ordered ell-major [P_ell0(k0..), P_ell2(k0..), ...], diagonal in k.

    The spectrum is evaluated at the bin centers (narrow-bin
    approximation — the standard choice; bin-averaging the mode count
    k^2 dk is exact).  ``n_bar``: galaxy density for the shot noise,
    default model.n_g."""
    k_edges = jnp.asarray(k_edges)
    k_mid = 0.5 * (k_edges[1:] + k_edges[:-1])
    # Independent complex modes per shell: V * (k^3_hi - k^3_lo)/3 / (4 pi^2)
    # (the exact integral of V k^2 dk / (4 pi^2) over the bin).
    n_k = volume * (k_edges[1:] ** 3 - k_edges[:-1] ** 3) / (
        3.0 * 4.0 * jnp.pi ** 2)
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, k_mid, mu, sigma_v,
                       with_bao, grid)                # (n_bin, n_mu)
    nb = model.n_g if n_bar is None else jnp.asarray(n_bar)
    tot2 = (p_s + 1.0 / nb) ** 2                      # (n_bin, n_mu)
    legs = jnp.stack([_legendre(ell, mu) for ell in ells])  # (n_ell, n_mu)
    # I[a, b, i] = (2 la + 1)(2 lb + 1)/N_i ∫ dmu L_a L_b tot2(k_i, mu)
    pref = jnp.asarray([(2.0 * ell + 1.0) for ell in ells])
    integ = jnp.einsum("am,bm,im,m->abi", legs, legs, tot2, w,
                       precision=jax.lax.Precision.HIGHEST)
    blocks = pref[:, None, None] * pref[None, :, None] * integ / n_k[None, None, :]
    n_ell, n_bin = len(ells), k_mid.shape[0]
    cov = jnp.zeros((n_ell, n_bin, n_ell, n_bin))
    idx = jnp.arange(n_bin)
    cov = cov.at[:, idx, :, idx].set(jnp.moveaxis(blocks, 2, 0))
    return cov.reshape(n_ell * n_bin, n_ell * n_bin)
