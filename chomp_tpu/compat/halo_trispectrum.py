"""chomp ``halo_trispectrum.py`` equivalent.

upstream:halo_trispectrum.py (SURVEY.md §2 row 8 [M]).
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import trispectrum as tri_mod


class HaloTrispectrum:
    """Angle-averaged parallelogram trispectrum T(k1, k2) (chomp
    ``HaloTrispectrum``; Morrison & Schneider 2013 covariance input).
    Wraps a compat ``Halo`` object."""

    def __init__(self, input_halo, galaxy=False):
        self.halo = input_halo
        self.galaxy = bool(galaxy)

    def trispectrum_parallelogram(self, k1, k2, terms=("1h", "2h", "3h", "4h")):
        fn = (tri_mod.trispectrum_parallelogram_galaxy if self.galaxy
              else tri_mod.trispectrum_parallelogram)
        return fn(self.halo._epoch.cosmo, self.halo.halo_params,
                  self.halo.model, jnp.asarray(k1), jnp.asarray(k2),
                  self.halo._epoch.with_bao, self.halo.grid, terms=terms)

    def t_pt(self, k1, k2):
        """Tree-level PT parallelogram trispectrum (F2/F3 kernels)."""
        return tri_mod.t_pt_parallelogram(
            self.halo._epoch.cosmo, jnp.asarray(k1), jnp.asarray(k2),
            self.halo._epoch.with_bao, self.halo.grid)
