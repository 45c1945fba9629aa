"""chomp ``cosmology.py`` equivalent: SingleEpoch / MultiEpoch.

upstream:cosmology.py (SURVEY.md §2 rows 2-3, §3.2).  Thin object
wrappers over chomp_tpu.background / chomp_tpu.linear.
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import background, linear
from chomp_tpu.compat.defaults import cosmo_from_dict
from chomp_tpu.params import DEFAULT_GRID, C_OVER_H0


class SingleEpoch:
    """Background + linear power at one redshift (chomp
    ``SingleEpoch(redshift, cosmo_dict, with_bao)``)."""

    def __init__(self, redshift=0.0, cosmo_dict=None, with_bao=False,
                 grid=DEFAULT_GRID):
        self._z = float(redshift)
        self._dict = dict(cosmo_dict or {})
        self.cosmo = cosmo_from_dict(cosmo_dict)
        self.with_bao = bool(with_bao)
        self.grid = grid

    # -- mutators (chomp API; rebuild instead of spline invalidation) ----
    def set_cosmology(self, cosmo_dict):
        self._dict = dict(cosmo_dict)
        self.cosmo = cosmo_from_dict(cosmo_dict)

    def set_redshift(self, redshift):
        self._z = float(redshift)

    @property
    def redshift(self):
        return self._z

    # -- background ------------------------------------------------------
    def E(self, z=None):
        return background.ez(self.cosmo, self._z if z is None else z)

    def comoving_distance(self, z=None):
        return background.comoving_distance(
            self.cosmo, self._z if z is None else z, self.grid.n_dist)

    def angular_diameter_distance(self, z=None):
        return background.angular_diameter_distance(
            self.cosmo, self._z if z is None else z, self.grid.n_dist)

    def luminosity_distance(self, z=None):
        return background.luminosity_distance(
            self.cosmo, self._z if z is None else z, self.grid.n_dist)

    def growth_factor(self, z=None):
        return background.growth_factor(
            self.cosmo, self._z if z is None else z, self.grid.n_growth)

    def omega_m(self, z=None):
        return background.omega_m_z(self.cosmo, self._z if z is None else z)

    def omega_l(self, z=None):
        return background.omega_l_z(self.cosmo, self._z if z is None else z)

    def delta_c(self):
        return background.delta_c(self.cosmo, self._z)

    def delta_v(self):
        return background.delta_v(self.cosmo, self._z)

    def rho_crit(self):
        return self.cosmo.rho_crit

    def rho_bar(self):
        return self.cosmo.rho_bar

    # -- linear power ------------------------------------------------------
    def transfer_function(self, k):
        return linear.transfer(self.cosmo, k, self.with_bao)

    def linear_power(self, k):
        return linear.linear_power(self.cosmo, k, self._z, self.with_bao,
                                   self.grid)

    def delta_k(self, k):
        return linear.delta_k(self.cosmo, k, self._z, self.with_bao,
                              self.grid)

    def sigma_r(self, r):
        return linear.sigma_r(self.cosmo, r, self._z, self.with_bao,
                              self.grid)

    def sigma_m(self, m):
        return linear.sigma_m(self.cosmo, m, self._z, self.with_bao,
                              self.grid)

    def nu_m(self, m):
        return linear.nu_m(self.cosmo, m, self._z, self.with_bao, self.grid)

    nu = nu_m


class MultiEpoch:
    """Quantities over [z_min, z_max] (chomp ``MultiEpoch``)."""

    def __init__(self, z_min, z_max, cosmo_dict=None, with_bao=False,
                 grid=DEFAULT_GRID, n_table=1024):
        self.z_min = float(z_min)
        self.z_max = float(z_max)
        self.cosmo = cosmo_from_dict(cosmo_dict)
        self.with_bao = bool(with_bao)
        self.grid = grid
        self._zt = jnp.linspace(max(self.z_min, 1e-6), self.z_max, n_table)
        self._chit = background.comoving_distance(self.cosmo, self._zt,
                                                  grid.n_dist)

    def set_cosmology(self, cosmo_dict):
        self.cosmo = cosmo_from_dict(cosmo_dict)
        self._chit = background.comoving_distance(self.cosmo, self._zt,
                                                  self.grid.n_dist)

    def comoving_distance(self, z):
        return background.comoving_distance(self.cosmo, z, self.grid.n_dist)

    def redshift(self, chi):
        """z(chi) inverse lookup (chomp ``MultiEpoch.redshift``)."""
        return jnp.interp(jnp.asarray(chi), self._chit, self._zt)

    def growth_factor(self, z):
        return background.growth_factor(self.cosmo, z, self.grid.n_growth)

    def E(self, z):
        return background.ez(self.cosmo, z)

    def epoch0(self):
        """SingleEpoch at z=0 with the same cosmology."""
        se = SingleEpoch(0.0, None, self.with_bao, self.grid)
        se.cosmo = self.cosmo
        return se


H0_UNITS = C_OVER_H0  # exposed for parity with chomp's unit constants
