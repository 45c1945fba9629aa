"""Halo occupation distributions.

TPU-native replacement for the reference's ``hod.py`` (upstream:hod.py;
SURVEY.md §2 row 5, Appendix B.5): ``HOD`` abstract first/second/nth
moments, the Zheng+05 five-parameter model [H], plus the Poisson,
Mandelbaum+05 [M] and Kravtsov+04 [L] variants.  Each model is an
immutable pytree whose parameters are vmap axes; dispatch is by Python
type (jit-static), so mixed-model code compiles specializations instead
of branching.

Moment conventions (Appendix B.5): satellites are Poisson around
<N_sat>, centrals are Bernoulli, satellites require a central:
  <N>        = <N_cen> + <N_sat>
  <N(N-1)>   = 2 <N_cen> <N_sat> + <N_sat>^2
  <(N)_n>    = n <N_cen> <N_sat>^(n-1) + <N_sat>^n   (factorial moment)

Each model also exposes ``breakpoints()``: the (traced) lnM locations
where its moments are non-smooth (satellite onsets, central steps).  The
halo layer refines its quadrature panels at these points so the 1-halo
integrals keep spectral convergence despite the kinks.
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu.special import erfc
from chomp_tpu.utils.tree import pytree_dataclass


@pytree_dataclass
class HODZheng:
    """Zheng et al. 2005 five-parameter HOD (chomp ``HODZheng(M_min,
    sigma, M_0, M_1p, alpha)``):

      <N_cen> = 1/2 [1 + erf((log10 M - log10 M_min)/sigma)]
      <N_sat> = <N_cen> ((M - M_0)/M_1')^alpha   for M > M_0, else 0.
    """

    log10_m_min: jnp.ndarray
    sigma: jnp.ndarray
    log10_m_0: jnp.ndarray
    log10_m_1p: jnp.ndarray
    alpha: jnp.ndarray

    def central_moment(self, m):
        x = (jnp.log10(m) - self.log10_m_min) / self.sigma
        # erfc form, NOT 0.5*(1 + erf(x)): identical in exact arithmetic
        # but float32-safe in the low-mass tail (see special.erfc — the
        # 1+erf form's one-ulp floor biased n_g by 8e-5 at prior-corner
        # cosmologies where sub-M_min halos dominate the abundance).
        return 0.5 * erfc(-x)

    def satellite_moment(self, m):
        m0 = 10.0**self.log10_m_0
        m1p = 10.0**self.log10_m_1p
        frac = jnp.maximum(m - m0, 0.0) / m1p
        return self.central_moment(m) * jnp.where(
            frac > 0.0, jnp.maximum(frac, 1e-300) ** self.alpha, 0.0
        )

    def first_moment(self, m):
        return self.central_moment(m) + self.satellite_moment(m)

    def second_moment(self, m):
        nc = self.central_moment(m)
        ns = self.satellite_moment(m)
        return 2.0 * nc * ns + ns * ns

    def nth_moment(self, m, n: int):
        if n == 1:
            return self.first_moment(m)
        nc = self.central_moment(m)
        ns = self.satellite_moment(m)
        return n * nc * ns ** (n - 1) + ns**n

    def breakpoints(self):
        # Satellite onset at M_0: moments are C^0 there ((M-M_0)^alpha).
        import math

        return (self.log10_m_0 * math.log(10.0),)


def default_hod(**overrides) -> HODZheng:
    """Fiducial Zheng05 HOD (SDSS-like; our documented defaults — the
    reference's own default HOD values are [M]-confidence, SURVEY.md §2)."""
    vals = dict(log10_m_min=12.14, sigma=0.15, log10_m_0=12.14,
                log10_m_1p=13.43, alpha=1.0)
    vals.update(overrides)
    return HODZheng(**{k: jnp.asarray(float(v)) for k, v in vals.items()})


@pytree_dataclass
class HODPoisson:
    """Pure-Poisson occupation around a power-law mean (chomp
    ``HODPoisson`` [M]): <N> = (M/M_min)^alpha for M > M_min, and
    <N(N-1)> = <N>^2 exactly."""

    log10_m_min: jnp.ndarray
    alpha: jnp.ndarray

    def first_moment(self, m):
        frac = m / 10.0**self.log10_m_min
        return jnp.where(frac > 1.0, frac**self.alpha, 0.0)

    def central_moment(self, m):
        return jnp.minimum(self.first_moment(m), 1.0)

    def satellite_moment(self, m):
        return self.first_moment(m) - self.central_moment(m)

    def second_moment(self, m):
        n = self.first_moment(m)
        return n * n

    def nth_moment(self, m, n: int):
        return self.first_moment(m) ** n

    def breakpoints(self):
        import math

        return (self.log10_m_min * math.log(10.0),)


@pytree_dataclass
class HODMandelbaum:
    """Mandelbaum et al. 2005 lensing HOD (chomp ``HODMandelbaum(M0, w)``
    [M]): central step at M0, satellites quadratic below 3 M0 and linear
    above (continuous):

      <N_cen> = theta(M - M0)
      <N_sat> = (M/(3 M0))^2 / w   for M < 3 M0
              = (M/(3 M0)) / w     for M >= 3 M0
    """

    m0: jnp.ndarray
    w: jnp.ndarray

    def central_moment(self, m):
        return jnp.where(m > self.m0, 1.0, 0.0)

    def satellite_moment(self, m):
        x = m / (3.0 * self.m0)
        return jnp.where(x < 1.0, x * x, x) / self.w

    def first_moment(self, m):
        return self.central_moment(m) + self.satellite_moment(m)

    def second_moment(self, m):
        nc = self.central_moment(m)
        ns = self.satellite_moment(m)
        return 2.0 * nc * ns + ns * ns

    def nth_moment(self, m, n: int):
        nc = self.central_moment(m)
        ns = self.satellite_moment(m)
        return n * nc * ns ** (n - 1) + ns**n

    def breakpoints(self):
        # Central step at M0; satellite quadratic->linear break at 3 M0.
        return (jnp.log(self.m0), jnp.log(3.0 * self.m0))


@pytree_dataclass
class HODKravtsov:
    """Kravtsov et al. 2004 subhalo HOD (chomp ``HODKravtsov`` [L]):
    <N_cen> = theta(M - M_min), <N_sat> = (M/M_1)^alpha."""

    log10_m_min: jnp.ndarray
    log10_m_1: jnp.ndarray
    alpha: jnp.ndarray

    def central_moment(self, m):
        return jnp.where(m > 10.0**self.log10_m_min, 1.0, 0.0)

    def satellite_moment(self, m):
        return self.central_moment(m) * (m / 10.0**self.log10_m_1) ** self.alpha

    def first_moment(self, m):
        return self.central_moment(m) + self.satellite_moment(m)

    def second_moment(self, m):
        nc = self.central_moment(m)
        ns = self.satellite_moment(m)
        return 2.0 * nc * ns + ns * ns

    def nth_moment(self, m, n: int):
        nc = self.central_moment(m)
        ns = self.satellite_moment(m)
        return n * nc * ns ** (n - 1) + ns**n

    def breakpoints(self):
        import math

        return (self.log10_m_min * math.log(10.0),)
