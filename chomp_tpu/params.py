"""Parameter pytrees and static grid configuration.

Mirrors the reference's ``defaults.py`` config layer (upstream:defaults.py;
SURVEY.md §2 row 1, Appendix B.0): ``default_params`` -> :class:`CosmoParams`,
``default_halo_params`` -> :class:`HaloParams`, ``default_limits`` +
``default_precision`` -> :class:`GridSpec`.

Design (SURVEY.md §7): the chomp dicts are mutable and propagated through
``set_cosmology``-style mutators; here they are immutable pytrees.
:class:`CosmoParams` is the **vmap axis** — an MCMC sweep is a
``CosmoParams`` with a leading batch dimension.  :class:`GridSpec` is the
**jit-static axis** — it fixes every array shape (quadrature orders, grid
sizes) so the whole pipeline compiles to one XLA program; chomp's adaptive
Romberg tolerances (``default_precision``) become fixed quadrature orders
whose convergence the test suite certifies by order-doubling.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from chomp_tpu.utils.tree import pytree_dataclass

# Speed of light / (100 km/s): c/H0 in Mpc/h units.
C_OVER_H0 = 2997.92458

# rho_crit in (M_sun/h) / (Mpc/h)^3; chomp derives the same constant from
# 1e-29 g/cm^3 scalings (SURVEY.md Appendix B.3): rho_bar = RHO_CRIT*omega_m.
RHO_CRIT = 2.7754e11


@pytree_dataclass
class CosmoParams:
    """Background + linear-power parameters.

    Mirrors chomp ``defaults.default_params`` (upstream:defaults.py):
    omega_m0=0.278, omega_b0=0.046, omega_l0=0.722, h=0.7, sigma_8=0.811,
    n_s=0.960, t_cmb=2.726, w0=-1, wa=0 (flat LCDM fiducial; SURVEY.md
    Appendix A preamble).  Radiation is NOT subtracted from omega_m
    (Appendix C.8: the oracle goldens use plain omega_m0).
    """

    omega_m0: jnp.ndarray
    omega_b0: jnp.ndarray
    omega_l0: jnp.ndarray
    h: jnp.ndarray
    sigma_8: jnp.ndarray
    n_s: jnp.ndarray
    t_cmb: jnp.ndarray
    w0: jnp.ndarray
    wa: jnp.ndarray
    # Summed neutrino mass Σm_ν in eV (TRACED — sample it like any other
    # parameter) and the number of degenerate massive species it is split
    # across.  m_nu = 0 reduces every spectrum to the EH98 baseline
    # bitwise (chomp_tpu.neutrino).  omega_m0 remains TOTAL matter
    # (cb + ν): the expansion history and lensing prefactors are
    # m_nu-independent at fixed omega_m0.
    m_nu: jnp.ndarray = 0.0
    n_nu: jnp.ndarray = 3.0
    # Baryon-feedback knobs (TRACED nuisance parameters — sample and
    # marginalize like cosmology; every default is an EXACT no-op).
    # They act on the MATTER profile / matter power only; galaxy legs
    # (pp_gg, h_g, satellite profiles) are the HOD's territory and are
    # untouched.  Scope: the Gaussian-path spectra (halo.powers /
    # tomographic_powers / powers_with_exclusion and nlpower.halofit);
    # trispectrum/SSC covariance legs keep the unmodified profile (an
    # O(feedback) effect on covariance CORRECTION terms — documented,
    # not modeled, same policy as the neutrino sector).
    #
    # bary_c   : multiplies c(M) of the MATTER NFW profile (HMcode-style
    #            concentration response, Mead et al. 2015's A/3.13 ratio;
    #            AGN feedback => bary_c < 1, less concentrated halos,
    #            suppressed 1-halo power).  1.0 = no feedback.
    # bary_eta : halo bloating — the matter y is evaluated at
    #            y(nu^bary_eta * k, M) with nu = delta_c/sigma(M) (Mead
    #            et al. 2015 eta; > 0 puffs up high-nu halos).  0.0 = off.
    # a_mod    : output-level interpolation between linear and nonlinear
    #            matter power (Amon & Eftathiou 2022):
    #            P_mm -> P_mm + (a_mod - 1)(P_mm - P_lin), applied to mm
    #            legs on BOTH the halo-model and halofit routes (gm/gg
    #            untouched).  1.0 = no modification; the (a_mod - 1) form
    #            is bitwise-exact at 1.0 AND has a clean d/d a_mod there.
    bary_c: jnp.ndarray = 1.0
    bary_eta: jnp.ndarray = 0.0
    a_mod: jnp.ndarray = 1.0

    @property
    def omega_k0(self):
        return 1.0 - self.omega_m0 - self.omega_l0

    @property
    def omega_c0(self):
        return self.omega_m0 - self.omega_b0

    @property
    def omega_nu0(self):
        """Massive-neutrino density Ω_ν0 = Σm_ν / (93.14 eV h²)."""
        return self.m_nu / (93.14 * self.h ** 2)

    @property
    def f_nu(self):
        """Neutrino mass fraction f_ν = Ω_ν/Ω_m."""
        return self.omega_nu0 / self.omega_m0

    @property
    def rho_bar(self):
        """Mean comoving matter density, (M_sun/h)/(Mpc/h)^3."""
        return RHO_CRIT * self.omega_m0

    @property
    def rho_crit(self):
        return jnp.asarray(RHO_CRIT) * jnp.ones_like(jnp.asarray(self.omega_m0))


def default_cosmo(**overrides) -> CosmoParams:
    """Fiducial flat LCDM (chomp defaults.py values; SURVEY.md App. A)."""
    vals = dict(
        omega_m0=0.278,
        omega_b0=0.046,
        omega_l0=0.722,
        h=0.7,
        sigma_8=0.811,
        n_s=0.960,
        t_cmb=2.726,
        w0=-1.0,
        wa=0.0,
        m_nu=0.0,
        n_nu=3.0,
        bary_c=1.0,
        bary_eta=0.0,
        a_mod=1.0,
    )
    vals.update(overrides)
    return CosmoParams(**{k: jnp.asarray(float(v)) for k, v in vals.items()})


@pytree_dataclass
class HaloParams:
    """Halo-model parameters.

    Mirrors chomp ``defaults.default_halo_params`` (upstream:defaults.py,
    SURVEY.md Appendix B.0): stq=0.3, st_little_a=0.707 (Sheth-Tormen),
    c0=9.0, beta=-0.13 (concentration c = c0/(1+z) * (M/M*)^beta),
    alpha=-1 (NFW inner slope; only -1 is supported, as in chomp's
    analytic y(k,M)).

    Convention selectors (SURVEY.md Appendix C.1/C.3/C.4 are [M]/[L]-
    confidence guesses — the reference mount was empty — so each choice
    is a config sentinel, not a hardcode; if the true chomp convention
    ever becomes checkable, matching it is a parameter change):

    ``delta_v`` — virial overdensity w.r.t. MEAN density:
      > 0 : that literal value (chomp's explicit-number mode)
      -1  : Bryan-Norman 1998 fit /Omega_m(z)  [default; App. A.6]
      -2  : Nakamura-Suto 1997 fit 18 pi^2 (1 + 0.4093 x^0.9052),
            x = 1/Omega_m(z) - 1
      -3  : fixed EdS value 18 pi^2

    ``delta_c`` — spherical-collapse threshold:
      > 0 : literal value
      -1  : NFW97 fit 0.15 (12 pi)^(2/3) Omega_m(z)^0.0055  [default]
      -2  : Kitayama-Suto 1996 fit (3/20)(12 pi)^(2/3)
            (1 + 0.0123 log10 Omega_m(z))
      -3  : fixed EdS value (3/20)(12 pi)^(2/3) = 1.68647

    ``mass_fn`` — multiplicity + bias family (beyond chomp, which is
    ST-only):
      0  : Sheth-Tormen f(nu) + ST bias, finite-range renormalized
           (chomp's convention)  [default]
      1  : Tinker et al. 2008 f(sigma) at Delta = 200 x mean
           (z-evolving coefficients) + Tinker et al. 2010 bias —
           sim-calibrated amplitudes, NOT renormalized (the modern
           standard for cluster abundances, chomp_tpu.clusters)
    """

    stq: jnp.ndarray
    st_little_a: jnp.ndarray
    c0: jnp.ndarray
    beta: jnp.ndarray
    alpha: jnp.ndarray
    delta_v: jnp.ndarray
    delta_c: jnp.ndarray
    mass_fn: jnp.ndarray = 0.0


def default_halo(**overrides) -> HaloParams:
    vals = dict(stq=0.3, st_little_a=0.707, c0=9.0, beta=-0.13, alpha=-1.0,
                delta_v=-1.0, delta_c=-1.0, mass_fn=0.0)
    vals.update(overrides)
    return HaloParams(**{k: jnp.asarray(float(v)) for k, v in vals.items()})


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static (hashable) grid/quadrature configuration.

    Replaces chomp ``defaults.default_limits`` + ``default_precision``
    (upstream:defaults.py): adaptive-Romberg tolerances become fixed
    Gauss-Legendre orders; spline ``npoints`` become dense grid sizes.
    All shapes downstream are functions of this object only, so it is the
    jit-static argument everywhere.
    """

    # Output k grid (chomp default_limits: k in [1e-3, 100] h/Mpc).
    k_min: float = 1.0e-3
    k_max: float = 1.0e2
    n_k: int = 1024

    # Wide internal k table for projections (P(k) interp source).
    k_table_min: float = 1.0e-5
    k_table_max: float = 1.0e4
    n_k_table: int = 4096

    # sigma(R) / normalization quadrature over ln k (oracle domain
    # [1e-5, 1e3]; composite GL resolves the top-hat W(kR) oscillations).
    sigma_k_min: float = 1.0e-5
    sigma_k_max: float = 1.0e3
    sigma_panels: int = 16
    sigma_n_per_panel: int = 64

    # Distance / growth quadrature orders.
    n_growth: int = 64
    n_dist: int = 64

    # Mass grid (chomp mass range; SURVEY.md A.4 uses [1e9, 1e16]).
    # n_mass=256 is converged to <2e-5 on P(k<=100) and <7e-6 on the
    # w/gamma_t bins vs n_mass=1024 (measured; the suite's goldens
    # certify it at their own tolerances) — halving from 512 cut the
    # halo stage ~2x on TPU.
    m_min: float = 1.0e9
    m_max: float = 1.0e16
    n_mass: int = 256

    # Projection (Limber) quadrature over z, and lensing-efficiency inner
    # quadrature.
    n_z_proj: int = 128
    n_z_lens: int = 128

    # FFTLog (Hankel) grid for w(theta)/gamma_t and the compat K(k*theta).
    # ell_max=3e7 covers the slowly-decaying 1-halo C_ell tail down to
    # theta = 0.001 deg at <3e-5 truncation (measured; linear spectra
    # converge far earlier).
    n_ell: int = 1024
    ell_min: float = 1.0e-1
    ell_max: float = 3.0e7
    # Fraction of the log-range cosine-tapered at each end before the
    # transform (suppresses periodic-wraparound ringing).
    fftlog_taper_lo: float = 0.08
    fftlog_taper_hi: float = 0.05

    # theta output range, degrees (BASELINE north star: [1e-3, 1] deg).
    theta_min_deg: float = 1.0e-3
    theta_max_deg: float = 1.0
    n_theta: int = 64

    # Redshift-distribution normalization quadrature.
    n_z_dndz: int = 256

    # FFT-convolution Limber lattice (chomp_tpu.limber_fft): spacing sets
    # the trapezoid error; the k/chi ranges bound the reachable
    # (ell+1/2)/chi arguments.
    lattice_dln: float = 0.008
    lattice_k_lo: float = 1.0e-5
    lattice_k_hi: float = 2.0e7
    lattice_chi_lo: float = 0.5
    lattice_chi_hi: float = 1.5e4

    # Trispectrum angle-average quadrature order.
    n_mu: int = 32

    # Convention selectors for [M]-confidence upstream choices (SURVEY.md
    # Appendix C.1/C.5; see also HaloParams.delta_v / .delta_c sentinels).
    # scranton_switch: the central/satellite 1-halo y-exponent heuristic
    # (y^1 below the <N>/<N(N-1)> = 1 crossing, y^2 above).  False uses
    # the plain y^2 convention everywhere.
    scranton_switch: bool = True
    # nu_convention: how peak height is REPORTED by the API layers —
    # chomp's "squared" nu = (delta_c/sigma)^2 (App. C.1) or the modern
    # "linear" nu = delta_c/sigma.  Internal tables are always squared.
    nu_convention: str = "squared"

    def replace(self, **kw) -> "GridSpec":
        return dataclasses.replace(self, **kw)


DEFAULT_GRID = GridSpec()
