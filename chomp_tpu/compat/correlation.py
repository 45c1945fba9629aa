"""chomp ``correlation.py`` equivalent: Correlation / MagCorrelation.

upstream:correlation.py (SURVEY.md §2 row 12, §3.1).  The ``power_spec``
string is resolved with getattr against the Halo object, exactly as the
reference does.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import correlation as corr_mod
from chomp_tpu import kernelfn, projection
from chomp_tpu.params import DEFAULT_GRID


class Correlation:
    """w(theta) over log-spaced bins (chomp ``Correlation(theta_min_deg,
    theta_max_deg, bins, input_kernel, input_halo, power_spec)``)."""

    _mu = 0.0

    def __init__(self, theta_min_deg=0.001, theta_max_deg=1.0, bins=20,
                 input_kernel=None, input_halo=None,
                 power_spec="linear_power", grid=DEFAULT_GRID):
        self.theta_min_deg = float(theta_min_deg)
        self.theta_max_deg = float(theta_max_deg)
        self.bins = int(bins)
        self.kernel = input_kernel
        self.halo = input_halo
        self.power_spec = power_spec
        self.grid = grid
        self.theta_deg = np.logspace(np.log10(self.theta_min_deg),
                                     np.log10(self.theta_max_deg), self.bins)
        self.wtheta_array = None

    # -- chomp mutators ------------------------------------------------------
    def set_power_spectrum(self, power_spec):
        """Select by string name, resolved via getattr (chomp parity)."""
        getattr(self.halo, power_spec)  # raise early if invalid
        self.power_spec = power_spec
        self.wtheta_array = None

    def set_cosmology(self, cosmo_dict):
        self.halo.set_cosmology(cosmo_dict)
        self.kernel.set_cosmology(cosmo_dict)
        self.wtheta_array = None

    def set_hod(self, input_hod):
        self.halo.set_hod(input_hod)
        self.wtheta_array = None

    # -- evaluation ------------------------------------------------------------
    def _p_table(self):
        """Power table from the selected Halo spectrum (getattr dispatch,
        as upstream)."""
        power_fn = getattr(self.halo, self.power_spec)
        ln_k = jnp.asarray(np.linspace(np.log(self.grid.k_table_min),
                                       np.log(self.grid.k_table_max),
                                       self.grid.n_k_table))
        p = power_fn(jnp.exp(ln_k))
        return projection.PowerTable(
            ln_k0=ln_k[0], dln=ln_k[1] - ln_k[0],
            ln_p=jnp.log(jnp.maximum(p, 1e-300)),
            growth_pivot=self.halo.model.mass.growth)

    def correlation(self, theta_deg):
        """w at arbitrary theta (chomp ``Correlation.correlation``) via
        the chomp-form ∫ dln k k^2/(2 pi) P(k) K(k theta) route."""
        return kernelfn.wtheta_chomp_form(
            self.halo._epoch.cosmo, self.kernel.tables, self._p_table(),
            theta_deg, self.grid)

    def compute_correlation(self):
        """Fill the (theta, w) table (chomp
        ``Correlation.compute_correlation``)."""
        self.wtheta_array = np.asarray(self.correlation(self.theta_deg))
        return self.wtheta_array

    def write(self, output_name):
        """ASCII theta, w(theta) table (chomp ``Correlation.write``)."""
        if self.wtheta_array is None:
            self.compute_correlation()
        corr_mod.write_ascii(output_name, self.theta_deg, self.wtheta_array)


class MagCorrelation(Correlation):
    """Galaxy-magnification correlation (chomp ``MagCorrelation`` [M]):
    2 (alpha - 1) x the galaxy-convergence cross-correlation; build it
    with a Kernel pairing a galaxy and a convergence window."""

    def __init__(self, *args, alpha_slope=2.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.alpha_slope = float(alpha_slope)

    def correlation(self, theta_deg):
        base = super().correlation(theta_deg)
        return 2.0 * (self.alpha_slope - 1.0) * base


class GalaxyGalaxyLensingCorrelation(Correlation):
    """Tangential shear gamma_t(theta): pair with a
    ``GalaxyGalaxyLensingKernel`` (J2) kernel."""
