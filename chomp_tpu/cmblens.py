"""CMB-lensing cross-correlations: the kappa_CMB tracer.

Capability extension beyond chomp (upstream:kernel.py has only the
galaxy and galaxy-convergence windows; SURVEY.md §2 rows 9-11): a
single-source-plane lensing window for the CMB last-scattering surface
plus the static configuration object that threads kappa_CMB probes
through the tomographic prediction and covariance builders — the
standard "5x2pt + kappa" program (galaxy clustering, galaxy-galaxy
lensing, cosmic shear, plus w_{g kappa_CMB}(theta) cross-correlations
with a CMB lensing map, e.g. DES x SPT/Planck).

Design (TPU-first, same rules as every other probe):

  - The window is CLOSED FORM — a delta-function source plane needs no
    efficiency integral:

        W_kCMB(chi) = (3/2) Omega_m (H0/c)^2 (1+z) chi (1 - chi/chi_*),

    chi_* = chi(z_*).  It rides the generic ``window_z`` path of the
    log-convolution lattice (limber_fft._window_on_lattice falls
    through to ``window_z`` — zero new lattice machinery), so every
    kappa_CMB probe row fuses into the SAME grouped convolution and
    static-operator contraction as the 3x2pt rows.
  - Reconstruction noise N_L^{kk} is an ell-dependent STATIC table.
    The Gaussian covariance splits it as
        N_L = (N_L - N_inf) + N_inf:
    the decaying residual folds into the C_ell^{kk} callable (resolved
    by the log-ell quadrature), while the white floor N_inf rides the
    analytic Bessel-completeness noise closure exactly like shot
    noise — no new integrals, no closure accuracy loss from a
    non-decaying integrand tail.

Accuracy notes (measured in tests/test_cmblens.py):

  - chi_* neglects radiation (as does every distance in this framework
    and in chomp): chi_* is ~1% high, which perturbs (1 - chi/chi_*)
    by <~0.4% at z <= 2 — far below the halo-model modeling error.
  - ``z_support`` truncates the kernel (default 12.0).  The g x kappa
    and gamma x kappa CROSS spectra are unaffected (the other window
    truncates first); only the C_ell^{kk} auto ingredient of the
    covariance loses the z > z_support tail — measured (z_support
    12 -> 24): 3.2% at ell = 100 GROWING to 6% at ell = 1000 (high
    multipoles pick up near-peak-P(k) scales from the deep tail);
    N_L dominates C_ell^{kk} there for any current experiment.  Raise
    z_support if that matters; the lattice (chi <= 1.5e4) and the
    Newton z <= 25 clamp are the hard ceilings.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import background
from chomp_tpu.params import C_OVER_H0, DEFAULT_GRID, CosmoParams, GridSpec
from chomp_tpu.utils.tree import pytree_dataclass

#: Redshift of the CMB last-scattering surface (Planck 2018 z_* =
#: 1089.9; the kernel is insensitive to +-10 here — chi_* enters only
#: through 1/chi_*).
Z_STAR_DEFAULT = 1090.0


@pytree_dataclass
class WindowConvergenceCMB:
    """Single-source-plane lensing efficiency (CMB lensing):

        W(chi) = (3/2) Omega_m (H0/c)^2 (1+z) chi (1 - chi/chi_*)_+

    for z <= z_support, zero above.  chi_* = chi(z_*) is evaluated per
    cosmology (traced — differentiate through it).  Duck-types the
    projection window protocol (``support``/``window_z``), so it works
    in every Limber/lattice/curved/exact-z route and in the covariance
    trispectrum/SSC leg machinery (tracer kind "m")."""

    z_star: jnp.ndarray
    z_support: jnp.ndarray

    def support(self):
        zs = jnp.asarray(self.z_support)
        return jnp.zeros_like(zs), zs

    def window_z(self, cosmo: CosmoParams, z, grid: GridSpec = DEFAULT_GRID):
        z = jnp.asarray(z)
        chi = background.comoving_distance(cosmo, z, grid.n_dist)
        chi_star = background.comoving_distance(cosmo, self.z_star,
                                                grid.n_dist)
        pref = 1.5 * cosmo.omega_m0 / C_OVER_H0**2
        w = pref * (1.0 + z) * chi * jnp.maximum(1.0 - chi / chi_star, 0.0)
        return jnp.where(z <= self.z_support, w, 0.0)


class CMBLensingSpec:
    """Static kappa_CMB configuration for the pipeline and covariance
    builders (NOT a pytree — everything here is concrete survey
    configuration, folded in at trace time like theta bins and noise
    levels).

    Parameters
    ----------
    z_star, z_support : float
        Source plane and kernel truncation (module docstring).
    nl_ell, nl : array_like or None
        Reconstruction-noise table N_L^{kk} at multipoles ``nl_ell``
        (both 1-D, same length; N_L > 0).  Interpolated log-log onto
        the static covariance ell grids; clamped to the edge values
        outside the table (the high-ell clamp N_inf = nl[-1] is
        treated as a WHITE floor through the analytic noise closure —
        see module docstring).  None = noiseless kappa map (forecast
        mode).
    """

    def __init__(self, z_star: float = Z_STAR_DEFAULT,
                 z_support: float = 12.0, nl_ell=None, nl=None):
        self.z_star = float(z_star)
        self.z_support = float(z_support)
        if (nl_ell is None) != (nl is None):
            raise ValueError("pass nl_ell and nl together (or neither)")
        if nl is None:
            self._ln_l = None
            self._ln_n = None
            self.nl_inf = 0.0
        else:
            nl_ell = np.asarray(nl_ell, dtype=float)
            nl = np.asarray(nl, dtype=float)
            if nl_ell.ndim != 1 or nl_ell.shape != nl.shape:
                raise ValueError("nl_ell and nl must be equal-length 1-D")
            if np.any(nl <= 0.0):
                raise ValueError("N_L must be positive (log-log interp)")
            if np.any(np.diff(nl_ell) <= 0.0):
                raise ValueError("nl_ell must be strictly increasing")
            self._ln_l = np.log(nl_ell)
            self._ln_n = np.log(nl)
            self.nl_inf = float(nl[-1])

    def window(self) -> WindowConvergenceCMB:
        return WindowConvergenceCMB(z_star=jnp.asarray(self.z_star),
                                    z_support=jnp.asarray(self.z_support))

    def nl_total(self, ells_np) -> np.ndarray:
        """N_L at ``ells_np`` (static numpy): log-log interpolation,
        edge-clamped outside the table."""
        if self._ln_l is None:
            return np.zeros(np.shape(np.asarray(ells_np)))
        # max(ell, tiny): the curved builders query from ell = 0, which
        # must land on the low-edge clamp (not a log(0) warning).
        ln = np.interp(np.log(np.maximum(np.asarray(ells_np, dtype=float),
                                         1e-300)),
                       self._ln_l, self._ln_n)
        return np.exp(ln)

    def nl_resid(self, ells_np) -> np.ndarray:
        """N_L(ell) - N_inf — the decaying part that folds into the
        C_ell^{kk} callable (>= 0 when N_L is monotone decreasing to
        its floor; any sign is handled)."""
        return self.nl_total(ells_np) - self.nl_inf


def as_cmb_spec(x) -> CMBLensingSpec:
    """Normalize the builders' ``cmb_lensing`` argument: True -> the
    default (noiseless) spec; a CMBLensingSpec passes through."""
    if x is True:
        return CMBLensingSpec()
    if isinstance(x, CMBLensingSpec):
        return x
    raise TypeError(
        f"cmb_lensing must be True or a CMBLensingSpec, got {type(x)!r}")
