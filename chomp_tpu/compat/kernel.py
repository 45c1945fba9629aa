"""chomp ``kernel.py`` equivalent: dN/dz, windows, projection kernel.

upstream:kernel.py (SURVEY.md §2 rows 9-11, §3.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import kernelfn, projection
from chomp_tpu.compat.cosmology import MultiEpoch
from chomp_tpu.params import DEFAULT_GRID


class dNdz:
    """Base redshift distribution (chomp ``dNdz(z_min, z_max)``)."""

    def __init__(self, z_min, z_max):
        self.z_min = float(z_min)
        self.z_max = float(z_max)
        self._dist = None  # set by subclass

    @property
    def dist(self):
        return self._dist

    def raw_dndz(self, z):
        return self._dist.raw_dndz(jnp.asarray(z))

    def normalize(self):
        """Kept for API parity: normalization happens inside dndz()."""
        return float(projection.dndz_norm(self._dist))

    def dndz(self, z):
        return projection.dndz(self._dist, z)


class dNdzGaussian(dNdz):
    def __init__(self, z_min, z_max, z0, sigma_z):
        super().__init__(z_min, z_max)
        self._dist = projection.DNdzGaussian(
            z_min=jnp.asarray(float(z_min)), z_max=jnp.asarray(float(z_max)),
            z0=jnp.asarray(float(z0)), sigma_z=jnp.asarray(float(sigma_z)))


class dNdzMagLim(dNdz):
    def __init__(self, z_min, z_max, a, z0, b):
        super().__init__(z_min, z_max)
        self._dist = projection.DNdzMagLim(
            z_min=jnp.asarray(float(z_min)), z_max=jnp.asarray(float(z_max)),
            a=jnp.asarray(float(a)), z0=jnp.asarray(float(z0)),
            b=jnp.asarray(float(b)))


class dNdzInterpolation(dNdz):
    def __init__(self, z_array, n_array, z_min=None, z_max=None):
        z_array = jnp.asarray(z_array)
        z_min = float(z_array[0]) if z_min is None else float(z_min)
        z_max = float(z_array[-1]) if z_max is None else float(z_max)
        super().__init__(z_min, z_max)
        self._dist = projection.DNdzInterpolation(
            z_min=jnp.asarray(z_min), z_max=jnp.asarray(z_max),
            z_array=z_array, n_array=jnp.asarray(n_array))


class WindowFunction:
    """Base radial window (chomp ``WindowFunction``)."""

    def __init__(self, redshift_dist: dNdz, cosmo_multi_epoch=None,
                 grid=DEFAULT_GRID):
        self.redshift_dist = redshift_dist
        self.cosmo = cosmo_multi_epoch or MultiEpoch(
            redshift_dist.z_min, max(redshift_dist.z_max, 1e-2))
        self.grid = grid
        self._win = None  # set by subclass

    @property
    def window(self):
        return self._win

    def set_cosmology(self, cosmo_dict):
        self.cosmo.set_cosmology(cosmo_dict)

    def window_function(self, chi):
        """W(chi) (chomp's signature form)."""
        return projection.window_chi(self.cosmo.cosmo, self._win, chi,
                                     z_max=max(self.redshift_dist.z_max, 1.0),
                                     grid=self.grid)

    def window_function_z(self, z):
        return self._win.window_z(self.cosmo.cosmo, z, self.grid)


class WindowFunctionGalaxy(WindowFunction):
    """W = dN/dz dz/dchi (chomp ``WindowFunctionGalaxy``)."""

    def __init__(self, redshift_dist, cosmo_multi_epoch=None,
                 grid=DEFAULT_GRID):
        super().__init__(redshift_dist, cosmo_multi_epoch, grid)
        self._win = projection.WindowGalaxy(dist=redshift_dist.dist)


class WindowFunctionConvergence(WindowFunction):
    """Lensing efficiency (chomp ``WindowFunctionConvergence``)."""

    def __init__(self, redshift_dist, cosmo_multi_epoch=None,
                 grid=DEFAULT_GRID):
        super().__init__(redshift_dist, cosmo_multi_epoch, grid)
        self._win = projection.WindowConvergence(dist=redshift_dist.dist)


class Kernel:
    """The k*theta-scaled Limber kernel K(k theta) (chomp
    ``Kernel(ktheta_min, ktheta_max, window_function_a,
    window_function_b, cosmo_multi_epoch, force_quad)``).

    ``force_quad=True`` bypasses the FFTLog spline and evaluates every
    ``kernel()`` query by direct dense-Simpson quadrature of
    ∫ dchi W_a W_b D^2 J_mu(k theta chi) — chomp's slow-but-sure path,
    kept as the independent referee."""

    mu = 0.0

    def __init__(self, ktheta_min=1e-8, ktheta_max=10.0,
                 window_function_a=None, window_function_b=None,
                 cosmo_multi_epoch=None, force_quad=False,
                 grid=DEFAULT_GRID):
        self.ktheta_min = float(ktheta_min)
        self.ktheta_max = float(ktheta_max)
        self.window_function_a = window_function_a
        self.window_function_b = window_function_b
        self.cosmo = (cosmo_multi_epoch or window_function_a.cosmo)
        self.force_quad = bool(force_quad)
        self.grid = grid
        self._rebuild()

    def _rebuild(self):
        self.tables = kernelfn.build_kernel(
            self.cosmo.cosmo, self.window_function_a.window,
            self.window_function_b.window, mu=self.mu, grid=self.grid)
        # The FFTLog grid is fixed (kernelfn.KTHETA_Y0 .. ~10); chomp's
        # constructor range is honored only within it.  Queries past the
        # grid would silently return the edge value/0, so fail loudly at
        # construction instead.
        import numpy as _np

        grid_lo = float(_np.exp(self.tables.ln_ktheta[0]))
        grid_hi = float(_np.exp(self.tables.ln_ktheta[-1]))
        if self.ktheta_min < grid_lo * 0.99 or self.ktheta_max > grid_hi * 1.01:
            raise ValueError(
                f"requested ktheta range [{self.ktheta_min:g}, "
                f"{self.ktheta_max:g}] exceeds the kernel grid coverage "
                f"[{grid_lo:g}, {grid_hi:g}] (kernelfn.KTHETA_Y0/"
                "N_KERNEL); widen the grid constants or narrow the range")

    def set_cosmology(self, cosmo_dict):
        self.cosmo.set_cosmology(cosmo_dict)
        self.window_function_a.set_cosmology(cosmo_dict)
        self.window_function_b.set_cosmology(cosmo_dict)
        self._rebuild()

    def kernel(self, ln_ktheta):
        """K at ln(k theta) (chomp ``Kernel.kernel``)."""
        if self.force_quad:
            return kernelfn.kernel_quad(
                self.cosmo.cosmo, self.window_function_a.window,
                self.window_function_b.window, ln_ktheta, mu=self.mu,
                grid=self.grid)
        return kernelfn.kernel_at(self.tables, ln_ktheta)

    @property
    def z_bar(self):
        return float(self.tables.z_bar)


class GalaxyGalaxyLensingKernel(Kernel):
    """J2 variant for tangential shear (chomp
    ``GalaxyGalaxyLensingKernel``)."""

    mu = 2.0
