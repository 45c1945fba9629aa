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
                 grid=DEFAULT_GRID, n_k_tri=96, n_z_tri=24):
        self.halo = input_halo
        self.window = window_galaxy
        self.omega_s_sr = float(area_deg2) * (np.pi / 180.0) ** 2
        self.n2d = float(n_per_arcmin2) * (180.0 * 60.0 / np.pi) ** 2
        self.theta_edges_deg = np.logspace(np.log10(theta_min_deg),
                                           np.log10(theta_max_deg), bins + 1)
        self.power_spec = power_spec
        self.galaxy_trispectrum = bool(galaxy_trispectrum)
        self.grid = grid
        self.n_k_tri = int(n_k_tri)
        self.n_z_tri = int(n_z_tri)

    # -- mutators (chomp objects rebuild lazily; the compat halo carries
    # the cosmology/HOD state, so delegating and recomputing matches) ----
    def set_cosmology(self, cosmo_dict):
        self.halo.set_cosmology(cosmo_dict)

    def set_hod(self, hod_object):
        self.halo.set_hod(hod_object)

    def set_redshift(self, redshift):
        self.halo.set_redshift(redshift)

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
            with_bao=self.halo._epoch.with_bao, grid=self.grid,
            n_k_tri=self.n_k_tri, n_z_tri=self.n_z_tri)

    def covariance(self):
        """Total covariance matrix (chomp's main entry)."""
        return self.gaussian_covariance() + self.nongaussian_covariance()

    def write(self, output_name):
        np.savetxt(output_name, np.asarray(self.covariance()))


class JointCovariance:
    """Joint (w_gg, gamma_t) covariance for a lens sample + source
    sample — the full Morrison & Schneider 2013 clustering + g-g lensing
    program behind chomp's covariance.py (upstream:covariance.py; the
    exact upstream class surface is [M]-confidence, SURVEY.md §2 row 13;
    the physics blocks are chomp_tpu.covariance.joint_wtheta_gammat_
    covariance).

    Parameters: a compat ``Halo`` (provides P_gg/P_gm/P_mm and the
    trispectrum inputs), lens and source windows (compat
    ``WindowFunctionGalaxy``), survey area in deg^2, lens and source
    densities per square arcminute, and per-component shape dispersion
    ``sigma_eps``.
    """

    def __init__(self, input_halo, window_lens, window_source, area_deg2,
                 n_lens_per_arcmin2, n_src_per_arcmin2, sigma_eps=0.26,
                 theta_min_deg=0.001, theta_max_deg=1.0, bins=16,
                 exact_z=False, grid=DEFAULT_GRID):
        self.halo = input_halo
        self.window_lens = window_lens
        self.window_source = window_source
        self.omega_s_sr = float(area_deg2) * (np.pi / 180.0) ** 2
        per_sr = (180.0 * 60.0 / np.pi) ** 2
        self.n2d_lens = float(n_lens_per_arcmin2) * per_sr
        self.n2d_src = float(n_src_per_arcmin2) * per_sr
        self.shape_noise = float(sigma_eps) ** 2 / self.n2d_src
        self.theta_edges_deg = np.logspace(np.log10(theta_min_deg),
                                           np.log10(theta_max_deg), bins + 1)
        self.exact_z = bool(exact_z)
        self.grid = grid

    def set_cosmology(self, cosmo_dict):
        self.halo.set_cosmology(cosmo_dict)

    def set_hod(self, hod_object):
        self.halo.set_hod(hod_object)

    def covariance(self, include_nongaussian=True):
        """(2 bins, 2 bins) joint matrix ordered [w_gg bins, gamma_t
        bins]."""
        return cov_mod.joint_wtheta_gammat_covariance(
            self.halo._epoch.cosmo, self.halo.halo_params, self.halo.model,
            self.window_lens.redshift_dist.dist,
            self.window_source.redshift_dist.dist,
            self.theta_edges_deg, self.omega_s_sr, self.n2d_lens,
            self.shape_noise, with_bao=self.halo._epoch.with_bao,
            grid=self.grid, include_nongaussian=include_nongaussian,
            exact_z=self.exact_z)

    def write(self, output_name):
        np.savetxt(output_name, np.asarray(self.covariance()))
