"""chomp ``covariance.py`` equivalent.

upstream:covariance.py (SURVEY.md §2 row 13 [M]).
"""

from __future__ import annotations

import numpy as np

from chomp_tpu import covariance as cov_mod
from chomp_tpu import projection
from chomp_tpu.params import DEFAULT_GRID


class Covariance:
    """Gaussian + shot-noise + trispectrum covariance of w(theta) bins
    for a survey area (chomp ``Covariance``).

    Parameters mirror the physical inputs: a compat ``Halo``, a galaxy
    window (compat ``WindowFunctionGalaxy``), survey area in deg^2, and
    2-D galaxy density per square arcminute.
    """

    def __init__(self, input_halo, window_galaxy, area_deg2, n_per_arcmin2,
                 theta_min_deg=0.001, theta_max_deg=1.0, bins=16,
                 power_spec="power_gg", galaxy_trispectrum=True,
                 grid=DEFAULT_GRID):
        self.halo = input_halo
        self.window = window_galaxy
        self.omega_s_sr = float(area_deg2) * (np.pi / 180.0) ** 2
        self.n2d = float(n_per_arcmin2) * (180.0 * 60.0 / np.pi) ** 2
        self.theta_edges_deg = np.logspace(np.log10(theta_min_deg),
                                           np.log10(theta_max_deg), bins + 1)
        self.power_spec = power_spec
        self.galaxy_trispectrum = bool(galaxy_trispectrum)
        self.grid = grid

    def _cl_fn(self):
        import jax.numpy as jnp

        power_fn = getattr(self.halo, self.power_spec)
        ln_k = jnp.asarray(np.linspace(np.log(self.grid.k_table_min),
                                       np.log(self.grid.k_table_max),
                                       self.grid.n_k_table))
        p = power_fn(jnp.exp(ln_k))
        pt = projection.PowerTable(
            ln_k0=ln_k[0], dln=ln_k[1] - ln_k[0],
            ln_p=jnp.log(jnp.maximum(p, 1e-300)),
            growth_pivot=self.halo.model.mass.growth)
        win = self.window.window

        def cl_fn(ells):
            return projection.limber_cl(self.halo._epoch.cosmo, win, win,
                                        ells, pt, self.grid)

        return cl_fn

    def gaussian_covariance(self):
        return cov_mod.gaussian_covariance(self._cl_fn(),
                                           self.theta_edges_deg, self.n2d,
                                           self.omega_s_sr)

    def nongaussian_covariance(self):
        return cov_mod.nongaussian_covariance(
            self.halo._epoch.cosmo, self.halo.halo_params, self.halo.model,
            self.window.redshift_dist.dist, self.theta_edges_deg,
            self.omega_s_sr, galaxy=self.galaxy_trispectrum,
            with_bao=self.halo._epoch.with_bao, grid=self.grid)

    def covariance(self):
        """Total covariance matrix (chomp's main entry)."""
        return self.gaussian_covariance() + self.nongaussian_covariance()

    def write(self, output_name):
        np.savetxt(output_name, np.asarray(self.covariance()))
