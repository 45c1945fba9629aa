"""Redshift distributions, radial windows, and Limber angular spectra.

TPU-native replacement for the reference's ``kernel.py`` distributions
and windows (upstream:kernel.py; SURVEY.md §2 rows 9-11, Appendix B.8):

  - dN/dz shapes: Gaussian, magnitude-limited z^a exp(-(z/z0)^b), and
    tabulated, normalized over [z_min, z_max] by GL quadrature.
  - W_galaxy(chi) = p(z) dz/dchi ;  W_kappa(chi) = (3/2) Omega_m (H0/c)^2
    (1+z) chi ∫_z dz' p(z') (chi'-chi)/chi'  (lensing efficiency).
  - Limber C_ell on arbitrary ell vectors:
        C_ell = ∫ dchi W_a W_b / chi^2 P((ell+1/2)/chi, z).

Design note (SURVEY.md §7): chomp never forms C_ell — it collapses
(W_a, W_b, D^2, J_0) into the splined K(k*theta) kernel because per-theta
Bessel quadrature was the CPU-era bottleneck.  The TPU pipeline computes
C_ell on a log-ell grid (smooth, non-oscillatory — plain GL over z) and
hands the oscillatory part to the FFTLog Hankel engine
(chomp_tpu.fftlog); the chomp-form K(k*theta) remains available in
chomp_tpu.kernelfn for API parity and equals this route to ~1e-4.

Growth separability: P(k, z) = P_pivot(k) * (D(z)/D_pivot)^2, exactly
chomp's factorization (the halo P is evaluated at the Halo object's
redshift and scaled by growth).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, linear
from chomp_tpu.grids import gl_fixed, gl_integrate, interp_loglog_cubic, loggrid
from chomp_tpu.params import C_OVER_H0, DEFAULT_GRID, CosmoParams, GridSpec
from chomp_tpu.utils.tree import pytree_dataclass

# ---------------------------------------------------------------------------
# Redshift distributions (chomp dNdz / dNdzGaussian / dNdzMagLim /
# dNdzInterpolation).
# ---------------------------------------------------------------------------


@pytree_dataclass
class DNdzGaussian:
    """p(z) ∝ exp(-(z-z0)^2/(2 sigma_z^2)) on [z_min, z_max] (chomp
    ``dNdzGaussian``)."""

    z_min: jnp.ndarray
    z_max: jnp.ndarray
    z0: jnp.ndarray
    sigma_z: jnp.ndarray

    def raw_dndz(self, z):
        return jnp.exp(-0.5 * ((z - self.z0) / self.sigma_z) ** 2)


@pytree_dataclass
class DNdzMagLim:
    """p(z) ∝ z^a exp(-(z/z0)^b) (chomp ``dNdzMagLim``)."""

    z_min: jnp.ndarray
    z_max: jnp.ndarray
    a: jnp.ndarray
    z0: jnp.ndarray
    b: jnp.ndarray

    def raw_dndz(self, z):
        zs = jnp.maximum(z, 1e-12)
        return zs**self.a * jnp.exp(-((zs / self.z0) ** self.b))


@pytree_dataclass
class DNdzInterpolation:
    """Tabulated p(z) with linear interpolation (chomp
    ``dNdzInterpolation``)."""

    z_min: jnp.ndarray
    z_max: jnp.ndarray
    z_array: jnp.ndarray
    n_array: jnp.ndarray

    def raw_dndz(self, z):
        return jnp.interp(z, self.z_array, self.n_array, left=0.0, right=0.0)


@pytree_dataclass
class DNdzShifted:
    """Additive photo-z shift nuisance: p(z) = p_base(z - dz) on the
    shifted support [z_min+dz, z_max+dz] — the standard Δz
    marginalization parametrization (capability extension beyond
    chomp, whose dN/dz classes are fixed at construction).  ``dz`` may
    be a traced scalar: shift, differentiate, and sample through the
    whole pipeline.  Exact-z anchor mode needs a CONCRETE z_max, so
    use concrete dz there (or size the anchors from the base)."""

    base: object
    dz: jnp.ndarray

    @property
    def z_min(self):
        return self.base.z_min + self.dz

    @property
    def z_max(self):
        return self.base.z_max + self.dz

    def raw_dndz(self, z):
        return self.base.raw_dndz(jnp.asarray(z) - self.dz)


def dndz_norm(dist, grid: GridSpec = DEFAULT_GRID):
    """∫ raw_dndz dz over [z_min, z_max] (chomp ``dNdz.normalize``)."""
    return gl_integrate(dist.raw_dndz, dist.z_min, dist.z_max, grid.n_z_dndz)


def dndz(dist, z, grid: GridSpec = DEFAULT_GRID):
    """Normalized p(z), zero outside [z_min, z_max] (chomp ``dNdz.dndz``)."""
    z = jnp.asarray(z)
    inside = (z >= dist.z_min) & (z <= dist.z_max)
    return jnp.where(inside, dist.raw_dndz(z), 0.0) / dndz_norm(dist, grid)


# ---------------------------------------------------------------------------
# Window functions (chomp WindowFunction / WindowFunctionGalaxy /
# WindowFunctionConvergence).  All in the d(chi) measure; parametrized by
# z (chi(z) is monotone) with chi-based wrappers via distance tables.
# ---------------------------------------------------------------------------


@pytree_dataclass
class WindowGalaxy:
    """W_g(chi) = p(z) dz/dchi = p(z) E(z)/(c/H0); ∫ W dchi = 1 (chomp
    ``WindowFunctionGalaxy``)."""

    dist: object

    def support(self):
        return self.dist.z_min, self.dist.z_max

    def window_z(self, cosmo: CosmoParams, z, grid: GridSpec = DEFAULT_GRID):
        return dndz(self.dist, z, grid) * background.ez(cosmo, z) / C_OVER_H0


@pytree_dataclass
class WindowConvergence:
    """Lensing efficiency (chomp ``WindowFunctionConvergence``):
    W_kappa(chi) = (3/2) Omega_m (H0/c)^2 (1+z) chi
                   * ∫_z^{z_max} dz' p(z') (chi'-chi)/chi'."""

    dist: object

    def support(self):
        return jnp.zeros_like(self.dist.z_min), self.dist.z_max

    def window_z(self, cosmo: CosmoParams, z, grid: GridSpec = DEFAULT_GRID):
        z = jnp.asarray(z)
        chi = background.comoving_distance(cosmo, z, grid.n_dist)

        def efficiency(zp):
            chip = background.comoving_distance(cosmo, zp, grid.n_dist)
            p = dndz(self.dist, zp, grid)
            return p * (chip - chi[..., None]) / jnp.maximum(chip, 1e-12)

        integral = gl_integrate(efficiency, z, self.dist.z_max, grid.n_z_lens)
        pref = 1.5 * cosmo.omega_m0 / C_OVER_H0**2
        return pref * (1.0 + z) * chi * integral


#: C1 * rho_crit for the NLA intrinsic-alignment amplitude (the
#: conventional normalization C1 = 5e-14 h^-2 M_sun^-1 Mpc^3 times
#: rho_crit — Hirata & Seljak 2004 / Bridle & King 2007).
C1_RHOCRIT = 0.0134


@pytree_dataclass
class WindowConvergenceIA:
    """Lensing efficiency PLUS the NLA intrinsic-alignment term — the
    effective E-field window

        W_E(χ) = W_κ(χ) + W_IA(χ),
        W_IA(χ) = -A_ia C1ρ_c Ω_m / D(z) ((1+z)/(1+z0))^η p(z) dz/dχ

    (nonlinear-linear alignment model: the IA contribution rides the
    same matter field, so GI and II terms arise automatically from the
    window products in every Limber integral — gt picks up W_g W_IA,
    ξ± pick up 2 W_κ W_IA + W_IA².  Capability extension beyond chomp.)
    All nuisance fields may be traced — differentiate/sample A_ia, η
    through the pipeline.  Conventional pivot z0 = 0.62."""

    dist: object
    a_ia: jnp.ndarray
    eta_ia: jnp.ndarray
    z0_ia: jnp.ndarray

    def support(self):
        return jnp.zeros_like(self.dist.z_min), self.dist.z_max

    def ia_term_z(self, cosmo: CosmoParams, z,
                  grid: GridSpec = DEFAULT_GRID):
        d = background.growth_factor(cosmo, z, grid.n_growth)
        amp = (-self.a_ia * C1_RHOCRIT * cosmo.omega_m0 / d
               * ((1.0 + z) / (1.0 + self.z0_ia)) ** self.eta_ia)
        return amp * dndz(self.dist, z, grid) \
            * background.ez(cosmo, z) / C_OVER_H0

    def window_z(self, cosmo: CosmoParams, z,
                 grid: GridSpec = DEFAULT_GRID):
        base = WindowConvergence(dist=self.dist).window_z(cosmo, z, grid)
        return base + self.ia_term_z(cosmo, z, grid)


def window_chi(cosmo: CosmoParams, win, chi_query, z_max=5.0,
               grid: GridSpec = DEFAULT_GRID, n_table: int = 512):
    """chomp-style W(chi) evaluation: invert chi -> z on a dense table,
    then evaluate the z-form window.  The table extends to the window's
    own support so a dN/dz reaching above ``z_max`` is never silently
    clamped to W(z_max)."""
    z_hi = jnp.maximum(jnp.asarray(win.support()[1], dtype=jnp.result_type(
        float)), z_max)
    zt = jnp.linspace(1e-6, z_hi, n_table)
    chit = background.comoving_distance(cosmo, zt, grid.n_dist)
    z = jnp.interp(jnp.asarray(chi_query), chit, zt)
    return win.window_z(cosmo, z, grid)


def z_bar(cosmo: CosmoParams, win_a, win_b, grid: GridSpec = DEFAULT_GRID):
    """W_a W_b-weighted mean redshift (chomp ``Kernel.z_bar``)."""
    lo_a, hi_a = win_a.support()
    lo_b, hi_b = win_b.support()
    lo = jnp.maximum(jnp.maximum(lo_a, lo_b), 1e-4)
    hi = jnp.maximum(hi_a, hi_b)

    def wprod(z):
        return (win_a.window_z(cosmo, z, grid) * win_b.window_z(cosmo, z, grid))

    num = gl_integrate(lambda z: wprod(z) * z, lo, hi, grid.n_z_proj)
    den = gl_integrate(wprod, lo, hi, grid.n_z_proj)
    return num / den


# ---------------------------------------------------------------------------
# P(k) tables for projection (separable growth) and the Limber integral.
# ---------------------------------------------------------------------------


@pytree_dataclass
class PowerTable:
    """ln P on a uniform ln k grid + the pivot growth factor, for
    separable P(k, z) = exp(ln_p(k)) * (D(z)/growth_pivot)^2."""

    ln_k0: jnp.ndarray      # scalar: first ln k
    dln: jnp.ndarray        # scalar: spacing
    ln_p: jnp.ndarray       # (n_k_table,)
    growth_pivot: jnp.ndarray

    def __call__(self, k):
        ln_p = interp_loglog_cubic(jnp.log(k), self.ln_k0, self.dln, self.ln_p)
        return jnp.exp(ln_p)


def _k_table(grid: GridSpec):
    ln_k, dln = loggrid(grid.k_table_min, grid.k_table_max, grid.n_k_table)
    return jnp.asarray(ln_k), dln


def power_table_linear(cosmo: CosmoParams, with_bao: bool = False,
                       grid: GridSpec = DEFAULT_GRID) -> PowerTable:
    """Linear P(k, z=0) table (pivot D = 1)."""
    ln_k, dln = _k_table(grid)
    p = linear.linear_power(cosmo, jnp.exp(ln_k), 0.0, with_bao, grid)
    return PowerTable(ln_k0=ln_k[0], dln=jnp.asarray(dln), ln_p=jnp.log(p),
                      growth_pivot=jnp.asarray(1.0))


def power_table_halo(cosmo: CosmoParams, halo_params, model, kind: str,
                     with_bao: bool = False,
                     grid: GridSpec = DEFAULT_GRID) -> PowerTable:
    """Halo-model P(k) table at the model's redshift (chomp's Correlation
    uses the Halo object's fixed-z spectrum times D^2 — the ``power_spec``
    string selector; kind in {linear_power, power_mm, power_gm, power_mg,
    power_gg})."""
    from chomp_tpu import halo as halo_mod

    ln_k, dln = _k_table(grid)
    p = halo_mod.powers(cosmo, halo_params, model, jnp.exp(ln_k), with_bao,
                        grid)[kind]
    return PowerTable(ln_k0=ln_k[0], dln=jnp.asarray(dln),
                      ln_p=jnp.log(jnp.maximum(p, 1e-300)),
                      growth_pivot=model.mass.growth)


def limber_cl(cosmo: CosmoParams, win_a, win_b, ells, p_table: PowerTable,
              grid: GridSpec = DEFAULT_GRID, ell_offset: float = 0.5):
    """Limber C_ell = ∫ dchi W_a W_b / chi^2 P((ell+offset)/chi, z)
    (rebuild-form of SURVEY.md Appendix B.8).  Plain GL over z — the
    Bessel oscillation lives downstream in the FFTLog.

    ``ell_offset=0.5`` is the standard Limber correction (the oracle/
    golden convention).  chomp's K(k theta) formulation corresponds
    EXACTLY to ``ell_offset=0.0`` (its kernel route substitutes
    k = ell/chi with no offset) — the two conventions differ by a few
    x1e-3 in w(theta) at 0.1-0.5 deg; pass 0.0 for bit-level parity with
    the chomp-form route."""
    ells = jnp.atleast_1d(jnp.asarray(ells))
    lo_a, hi_a = win_a.support()
    lo_b, hi_b = win_b.support()
    lo = jnp.maximum(jnp.maximum(lo_a, lo_b), 1e-4)
    hi = jnp.minimum(hi_a, hi_b)

    x, w = gl_fixed(0.0, 1.0, grid.n_z_proj)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    z = lo + (hi - lo) * x                       # (nz,)
    wz = w * (hi - lo)
    chi = background.comoving_distance(cosmo, z, grid.n_dist)
    d = background.growth_factor(cosmo, z, grid.n_growth) / p_table.growth_pivot
    wa = win_a.window_z(cosmo, z, grid)
    wb = win_b.window_z(cosmo, z, grid)
    dchi_dz = C_OVER_H0 / background.ez(cosmo, z)
    kern = wa * wb * dchi_dz / chi**2 * d * d * wz   # (nz,)

    k = (ells[:, None] + ell_offset) / chi[None, :]  # (nl, nz)
    p = p_table(k)
    return jnp.sum(p * kern[None, :], axis=-1)


def limber_cl_exact_z(cosmo: CosmoParams, halo_params, hod, win_a, win_b,
                      ells, kind: str = "power_gg", n_z: int = 32,
                      with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """Limber C_ell with EXACT redshift evolution of the halo model.

    Capability upgrade over the reference: chomp (and this framework's
    fast paths) use the separable approximation P(k, z) = P(k, z_pivot)
    D^2(z)/D^2(z_pivot), which ignores the z-evolution of the mass
    function, bias, HOD occupation of the halo field, and concentrations
    (a few-percent effect on nonlinear scales across a wide kernel).
    Here the FULL halo model is rebuilt at every projection node — on
    TPU that is just a vmap over z of the same fused tensor program —
    and P((ell+1/2)/chi(z), z) is evaluated EXACTLY at each node's k
    column (no interpolation anywhere).

    For ``kind='linear_power'`` the result equals the separable path
    identically (linear growth IS separable) — used as the validation
    anchor in the tests.
    """
    import jax

    from chomp_tpu import halo as halo_mod
    from chomp_tpu.grids import gl_fixed

    ells = jnp.atleast_1d(jnp.asarray(ells))
    lo_a, hi_a = win_a.support()
    lo_b, hi_b = win_b.support()
    lo = jnp.maximum(jnp.maximum(lo_a, lo_b), 1e-4)
    hi = jnp.minimum(hi_a, hi_b)

    x, w = gl_fixed(0.0, 1.0, n_z)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    z = lo + (hi - lo) * x
    wz = w * (hi - lo)
    chi = background.comoving_distance(cosmo, z, grid.n_dist)
    wa = win_a.window_z(cosmo, z, grid)
    wb = win_b.window_z(cosmo, z, grid)
    dchi_dz = C_OVER_H0 / background.ez(cosmo, z)
    kern = wa * wb * dchi_dz / chi**2 * wz               # (nz,)

    def p_column(z_j, chi_j):
        k_col = (ells + 0.5) / chi_j                     # (nl,)
        model = halo_mod.build_halo_model(cosmo, halo_params, hod, z_j,
                                          with_bao, grid)
        return halo_mod.powers(cosmo, halo_params, model, k_col,
                               with_bao, grid)[kind]

    p = jax.vmap(p_column)(z, chi)                       # (nz, nl)
    return jnp.sum(p * kern[:, None], axis=0)
