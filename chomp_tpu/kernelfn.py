"""chomp-form projection kernel K(k*theta) — API parity for kernel.py.

The reference's signature design (upstream:kernel.py ``Kernel``,
``GalaxyGalaxyLensingKernel``; SURVEY.md §2 row 11, §3.3): because the
linear growth factorizes, the pair (W_a, W_b, cosmology) collapses into
ONE 1-D function

    K(k theta) = ∫ dchi W_a(chi) W_b(chi) D^2(z(chi)) J_{0|2}(k theta chi)

splined over ln(k theta) and reused for every (k, theta) pair.  chomp
evaluates it with Bessel-zero-chunked Romberg ("HOT LOOP 2", the most
expensive init); here it is ONE FFTLog matmul: with a(chi) = chi * W_a
W_b D^2 sampled on a static log-chi grid (zero outside the window
support — compactly supported, so no wraparound),

    K(y) = ∫ a(chi) J_mu(y chi) dchi/chi .

The C_ell route (projection.limber_cl + fftlog) is the preferred fast
path; this module exists for full API parity and as an independent
cross-check — ``wtheta_chomp_form`` reproduces chomp's
w(theta) = ∫ dln k k^2/(2 pi) P(k) K(k theta) pipeline end-to-end and is
tested to agree with the C_ell route.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import background
from chomp_tpu.fftlog import hankel_operator
from chomp_tpu.grids import gl_fixed
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec
from chomp_tpu.utils.tree import pytree_dataclass

# Static log-chi grid bounds (Mpc/h): generously brackets any window
# support for z in (0, ~10].  9 decades so the reciprocal K(k theta)
# grid can span [1e-8, 10] — chomp's kernel is queried from
# k_min*theta_min ~ 1e-8 up to k_max*theta_max ~ 2 (it is flat below
# y ~ 1/chi_max, but 1e-4 accuracy needs the rolloff resolved).
CHI_LO, CHI_HI = 1.0e-4, 1.0e5
KTHETA_Y0 = 1.0e-8
N_KERNEL = 2048


@pytree_dataclass
class KernelTables:
    """K(k theta) on a log grid + z_bar (chomp ``Kernel`` object state)."""

    ln_ktheta: jnp.ndarray   # (n,)
    k_vals: jnp.ndarray      # (n,) K at those points
    z_bar: jnp.ndarray       # W-weighted mean redshift


def _z_of_chi(cosmo: CosmoParams, chi, grid: GridSpec, z_hi: float = 10.0,
              n_table: int = 512):
    zt = jnp.linspace(1e-6, z_hi, n_table)
    chit = background.comoving_distance(cosmo, zt, grid.n_dist)
    return jnp.interp(chi, chit, zt)


def build_kernel(cosmo: CosmoParams, win_a, win_b, mu: float = 0.0,
                 grid: GridSpec = DEFAULT_GRID) -> KernelTables:
    """Assemble K(k theta) (chomp ``Kernel.__init__`` +
    ``_initialize_spline``) via one FFTLog application."""
    n = N_KERNEL
    ln0 = float(np.log(CHI_LO))
    dln = float(np.log(CHI_HI / CHI_LO) / (n - 1))
    chi = jnp.asarray(np.exp(ln0 + dln * np.arange(n)))

    z = _z_of_chi(cosmo, chi, grid)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    wa = win_a.window_z(cosmo, z, grid)
    wb = win_b.window_z(cosmo, z, grid)
    a = chi * wa * wb * d * d                     # compactly supported

    import jax

    y, h = hankel_operator(n, ln0, dln, mu, q=1.0, y0_target=KTHETA_Y0)
    k_vals = jnp.matmul(jnp.asarray(h), a,
                        precision=jax.lax.Precision.HIGHEST)

    from chomp_tpu.projection import z_bar as _z_bar

    return KernelTables(ln_ktheta=jnp.log(jnp.asarray(y)), k_vals=k_vals,
                        z_bar=_z_bar(cosmo, win_a, win_b, grid))


def kernel_at(tables: KernelTables, ln_ktheta):
    """K at ln(k theta) (chomp ``Kernel.kernel``; linear interpolation —
    K oscillates through zero, so no log-log trickery)."""
    return jnp.interp(jnp.asarray(ln_ktheta), tables.ln_ktheta,
                      tables.k_vals, left=tables.k_vals[0], right=0.0)


def kernel_quad(cosmo: CosmoParams, win_a, win_b, ln_ktheta, mu: float = 0.0,
                grid: GridSpec = DEFAULT_GRID, n_quad: int = 2**17 + 1):
    """Direct-quadrature K(k theta) (chomp ``force_quad=True``,
    upstream:kernel.py ``Kernel._kernel_integrand`` route): composite
    Simpson on a uniform chi grid dense enough to resolve the J_mu(y chi)
    oscillations over the window support (~20 nodes per period at
    y = 10, chi_max ~ 4000).  O(n_quad) Bessel evaluations per query —
    the referee path, not the fast path (that is the FFTLog spline).
    """
    from chomp_tpu.special import j0, j2

    ln_kt = jnp.atleast_1d(jnp.asarray(ln_ktheta))
    y = jnp.exp(ln_kt)
    z_hi = jnp.maximum(jnp.asarray(win_a.support()[1], dtype=y.dtype),
                       jnp.asarray(win_b.support()[1], dtype=y.dtype))
    chi_hi = background.comoving_distance(cosmo, z_hi, grid.n_dist)
    chi = jnp.linspace(1e-3, chi_hi, n_quad)
    z = _z_of_chi(cosmo, chi, grid)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    a = (win_a.window_z(cosmo, z, grid) * win_b.window_z(cosmo, z, grid)
         * d * d)
    h = (chi_hi - 1e-3) / (n_quad - 1)
    pattern = np.full(n_quad, 2.0)
    pattern[1::2] = 4.0
    pattern[0] = pattern[-1] = 1.0
    w = a * jnp.asarray(pattern) * (h / 3.0)
    bessel = j0 if mu == 0.0 else j2

    import jax

    # Sequential over query points: each row is n_quad Bessel evals and
    # a dot — bounding peak memory to O(n_quad) regardless of len(y).
    k_vals = jax.lax.map(lambda yy: jnp.sum(w * bessel(yy * chi)), y)
    return k_vals if jnp.ndim(ln_ktheta) else k_vals[0]


def wtheta_chomp_form(cosmo: CosmoParams, tables: KernelTables, p_table,
                      theta_deg, grid: GridSpec = DEFAULT_GRID,
                      n_lnk: int = 1024):
    """chomp's correlation route (upstream:correlation.py):
    w(theta) = ∫_{k_min}^{k_max} dln k k^2/(2 pi) P(k) K(k theta),
    GL over chomp's default_limits k range.  Cross-checks the C_ell +
    FFTLog fast path."""
    ln_k, w = gl_fixed(float(np.log(grid.k_min)), float(np.log(grid.k_max)),
                       n_lnk)
    ln_k = jnp.asarray(ln_k)
    w = jnp.asarray(w)
    k = jnp.exp(ln_k)
    p = p_table(k)
    th = jnp.radians(jnp.atleast_1d(jnp.asarray(theta_deg)))
    kern = kernel_at(tables, ln_k[None, :] + jnp.log(th)[:, None])
    return jnp.sum(k**2 / (2.0 * jnp.pi) * p * kern * w, axis=-1)
