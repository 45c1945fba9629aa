"""chomp ``mass_function.py`` equivalent: MassFunction.

upstream:mass_function.py (SURVEY.md §2 row 4).
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import mass as mass_mod
from chomp_tpu.compat.cosmology import SingleEpoch
from chomp_tpu.compat.defaults import halo_from_dict
from chomp_tpu.params import DEFAULT_GRID


class MassFunction:
    """Sheth-Tormen mass function + bias (chomp
    ``MassFunction(redshift, cosmo_single_epoch, halo_dict)``)."""

    def __init__(self, redshift=0.0, cosmo_single_epoch=None, halo_dict=None,
                 grid=DEFAULT_GRID):
        self._epoch = cosmo_single_epoch or SingleEpoch(redshift)
        self._z = float(redshift)
        self._halo_dict = dict(halo_dict or {})
        self.grid = grid
        self._rebuild()

    def _rebuild(self):
        self.halo_params = halo_from_dict(self._halo_dict)
        self.tables = mass_mod.build_mass_tables(
            self._epoch.cosmo, self.halo_params, self._z,
            self._epoch.with_bao, self.grid)

    # -- mutators ----------------------------------------------------------
    def set_redshift(self, redshift):
        self._z = float(redshift)
        self._rebuild()

    def set_cosmology(self, cosmo_dict):
        self._epoch.set_cosmology(cosmo_dict)
        self._rebuild()

    def set_halo(self, halo_dict):
        self._halo_dict = dict(halo_dict)
        self._rebuild()

    # -- evaluation (chomp method names) ------------------------------------
    def f_nu(self, nu):
        return mass_mod.f_nu(self.tables, self.halo_params,
                             self._internal_nu(nu))

    def f_m(self, m):
        return mass_mod.f_m(self._epoch.cosmo, self.tables, self.halo_params,
                            m, self._epoch.with_bao, self.grid)

    def bias_nu(self, nu):
        return mass_mod.bias_nu(self.tables, self.halo_params,
                                self._internal_nu(nu))

    def bias_m(self, m):
        return mass_mod.bias_m(self._epoch.cosmo, self.tables,
                               self.halo_params, m, self._epoch.with_bao,
                               self.grid)

    def dndm(self, m):
        return mass_mod.dndm(self._epoch.cosmo, self.tables,
                             self.halo_params, m, self._epoch.with_bao,
                             self.grid)

    def _report_nu(self, nu2):
        """Peak height in the configured reporting convention
        (GridSpec.nu_convention): chomp's squared (delta_c/sigma)^2 or
        linear delta_c/sigma.  Internal tables are always squared."""
        return jnp.sqrt(nu2) if self.grid.nu_convention == "linear" else nu2

    def _internal_nu(self, nu):
        return nu**2 if self.grid.nu_convention == "linear" else nu

    def nu(self, m):
        return self._report_nu(mass_mod.nu_of_m(
            self._epoch.cosmo, self.tables, m, self._epoch.with_bao,
            self.grid))

    def mass(self, nu):
        return mass_mod.m_of_nu(self.tables, self._internal_nu(nu))

    @property
    def nu_min(self):
        return float(self._report_nu(self.tables.nu[0]))

    @property
    def nu_max(self):
        return float(self._report_nu(self.tables.nu[-1]))

    def m_star(self):
        return float(jnp.exp(self.tables.ln_m_star))
