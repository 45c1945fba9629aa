"""Angular correlation functions: w(theta) and tangential shear gamma_t.

TPU-native replacement for the reference's ``correlation.Correlation`` /
``MagCorrelation`` (upstream:correlation.py; SURVEY.md §2 row 12,
Appendix B.8):

  chomp:    w(theta) = ∫ dln k k^2/(2 pi) P(k) K(k theta)   per theta bin
            (Romberg; K from kernel.py's Bessel-chunked quadrature)
  rebuild:  C_ell on a log-ell grid (smooth Limber GL — projection.py)
            then  w(theta) = (1/2 pi) ∫ dl l C_l J_{0|2}(l theta)
            via ONE precomputed FFTLog dense operator == one batched
            MXU matmul (fftlog.py).  Equal to chomp's route to ~1e-4
            (validated against Bessel-zero-chunked quadrature goldens).

The ``power_spec`` string selector ('linear_power' | 'power_mm' |
'power_gm' | 'power_gg') mirrors chomp's getattr-based dispatch; here it
selects which halo-model spectrum feeds the Limber power table.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from chomp_tpu import projection
from chomp_tpu.fftlog import hankel_operator
from chomp_tpu.grids import interp_loglog_cubic
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec


def ell_grid(grid: GridSpec = DEFAULT_GRID):
    """The static log-ell FFTLog grid (numpy float64)."""
    ln0 = float(np.log(grid.ell_min))
    dln = float(np.log(grid.ell_max / grid.ell_min) / (grid.n_ell - 1))
    return np.exp(ln0 + dln * np.arange(grid.n_ell)), ln0, dln


def wtheta_operator(grid: GridSpec = DEFAULT_GRID, mu: float = 0.0):
    """(theta_grid_rad, W) such that  w(theta_j) = sum_m W[j,m] C_l(l_m).

    Folds the 1/(2 pi), the l^2 measure weight, and the end tapers into
    the FFTLog operator — the runtime transform is a bare matmul."""
    ells, ln0, dln = ell_grid(grid)
    theta, h = hankel_operator(
        grid.n_ell, ln0, dln, mu, q=1.0,
        taper_lo=grid.fftlog_taper_lo, taper_hi=grid.fftlog_taper_hi)
    w_op = h * (ells[None, :] ** 2) / (2.0 * np.pi)
    return theta, w_op


def theta_bins_deg(grid: GridSpec = DEFAULT_GRID):
    """Log-spaced output theta bins in degrees (chomp ``Correlation``
    constructor's theta_min/theta_max/bins)."""
    return np.logspace(np.log10(grid.theta_min_deg),
                       np.log10(grid.theta_max_deg), grid.n_theta)


def _interp_to_theta(theta_grid_rad, w_grid, theta_query_rad):
    """Interpolation of w to query thetas, zero-crossing safe.

    Log-magnitude cubic (sharp for the many-decade smooth decay) wherever
    the 4-point stencil is single-signed; plain LINEAR interpolation
    where the stencil straddles a zero crossing — ln|w| has a pole there
    and the cubic-with-restored-sign heuristic lost ~1e-2 absolute
    (guarded by tests/test_correlation.py's sign-crossing test; gamma_t
    can cross at large theta).  Supports batched w rows
    (..., n_theta_grid) via vmap over flattened leading dims."""
    import jax

    ln_t = jnp.log(theta_grid_rad)
    ln0 = ln_t[0]
    dln = ln_t[1] - ln0
    lnq = jnp.log(theta_query_rad)
    n = theta_grid_rad.shape[0]
    i = jnp.clip(jnp.floor((lnq - ln0) / dln).astype(jnp.int32), 1, n - 3)

    def one(w_row):
        sign = jnp.sign(jnp.interp(lnq, ln_t, w_row))
        ln_absw = jnp.log(jnp.maximum(jnp.abs(w_row), 1e-300))
        cubic = sign * jnp.exp(interp_loglog_cubic(lnq, ln0, dln, ln_absw))
        # One guard point beyond the cubic stencil on each side: the
        # log-magnitude curvature already blows up next to a crossing.
        idx = jnp.clip(i[:, None] + jnp.arange(-2, 4)[None, :], 0, n - 1)
        stencil = w_row[idx]                                      # (q, 6)
        single_signed = (jnp.all(stencil > 0.0, axis=-1)
                         | jnp.all(stencil < 0.0, axis=-1))
        linear = jnp.interp(lnq, ln_t, w_row)
        return jnp.where(single_signed, cubic, linear)

    if w_grid.ndim == 1:
        return one(w_grid)
    flat = w_grid.reshape(-1, w_grid.shape[-1])
    out = jax.vmap(one)(flat)
    return out.reshape(*w_grid.shape[:-1], out.shape[-1])


def wtheta_from_cl(cl_grid, theta_deg, grid: GridSpec = DEFAULT_GRID,
                   mu: float = 0.0):
    """w(theta) (or gamma_t with mu=2) from C_l sampled on the static
    ell grid.  ``cl_grid``: (..., n_ell); returns (..., n_theta_query).

    The Hankel matmul runs at HIGHEST precision: the oscillatory J0/J2
    cancellations lose ~1e-2 under the TPU's default bf16 matmul pass.
    """
    import jax

    theta_grid, w_op = wtheta_operator(grid, mu)
    w = jnp.matmul(cl_grid, jnp.asarray(w_op).T,
                   precision=jax.lax.Precision.HIGHEST)
    th = jnp.radians(jnp.atleast_1d(jnp.asarray(theta_deg)))
    return _interp_to_theta(jnp.asarray(theta_grid), w, th)


@lru_cache(maxsize=None)
def wtheta_bins_operator(theta_key, grid: GridSpec = DEFAULT_GRID,
                         mu: float = 0.0):
    """Fully-fused static operator: w(theta_bins) = Op @ C_l.

    Composes the FFTLog Hankel operator with value-space Catmull-Rom
    interpolation weights at the (static) theta bins — offline, in
    float64 numpy — so the whole Bessel transform + binning is ONE
    (B, n_ell) @ (n_ell, n_bins) matmul at runtime (the MXU shape the
    Pallas kernel in chomp_tpu.ops.fftlog_pallas consumes)."""
    theta_deg = np.asarray(theta_key)
    theta_grid, w_op = wtheta_operator(grid, mu)
    from chomp_tpu.grids import catmull_rom_weights_np

    ln_t = np.log(theta_grid)
    d = ln_t[1] - ln_t[0]
    q = np.log(np.radians(theta_deg))
    w2 = catmull_rom_weights_np(len(ln_t), (q - ln_t[0]) / d)
    return np.ascontiguousarray(w2 @ w_op)


def wtheta_from_cl_fused(cl_grid, theta_deg, grid: GridSpec = DEFAULT_GRID,
                         mu: float = 0.0, engine: str = "xla"):
    """w at STATIC theta bins from C_l rows via the fused operator.

    ``engine``: "xla" (jnp.matmul at HIGHEST precision — measured
    fastest) or "pallas" (the explicit Pallas MXU kernel; same accuracy,
    ~20% slower on v5e at these shapes but kept as the self-contained
    kernel path)."""
    import jax

    op = wtheta_bins_operator(tuple(np.asarray(theta_deg).tolist()), grid, mu)
    op_t = jnp.asarray(op).T
    if engine == "pallas":
        from chomp_tpu.ops.fftlog_pallas import hankel_matmul_pallas

        cl2 = jnp.atleast_2d(cl_grid)
        out = hankel_matmul_pallas(cl2, op_t,
                                   interpret=not _pallas_native())
        return out if cl_grid.ndim > 1 else out[0]
    return jnp.matmul(cl_grid, op_t, precision=jax.lax.Precision.HIGHEST)


def _pallas_native() -> bool:
    from chomp_tpu.ops.fftlog_pallas import on_tpu

    return on_tpu()


def wtheta(cosmo: CosmoParams, win_a, win_b, p_table, theta_deg=None,
           grid: GridSpec = DEFAULT_GRID):
    """Angular correlation w(theta) [J0] (chomp
    ``Correlation.compute_correlation`` + ``.correlation``)."""
    if theta_deg is None:
        theta_deg = theta_bins_deg(grid)
    ells, _, _ = ell_grid(grid)
    cl = projection.limber_cl(cosmo, win_a, win_b, jnp.asarray(ells), p_table,
                              grid)
    return wtheta_from_cl(cl, theta_deg, grid, mu=0.0)


def gamma_t(cosmo: CosmoParams, win_lens, win_src, p_table, theta_deg=None,
            grid: GridSpec = DEFAULT_GRID):
    """Tangential shear gamma_t(theta) [J2] (chomp's galaxy-galaxy
    lensing correlation through ``GalaxyGalaxyLensingKernel``)."""
    if theta_deg is None:
        theta_deg = theta_bins_deg(grid)
    ells, _, _ = ell_grid(grid)
    cl = projection.limber_cl(cosmo, win_lens, win_src, jnp.asarray(ells),
                              p_table, grid)
    return wtheta_from_cl(cl, theta_deg, grid, mu=2.0)


def xi_plus(cosmo: CosmoParams, win_src_a, win_src_b, p_table,
            theta_deg=None, grid: GridSpec = DEFAULT_GRID):
    """Shear-shear correlation xi_+(theta) — J0 transform of the
    convergence spectrum:  xi_+ = ∫ l dl/(2 pi) C^EE_l J0(l theta),
    with C^EE = C_kk in the flat-sky Limber limit and no B-modes
    (gravitational lensing at leading order).

    CAPABILITY EXTENSION beyond the reference: chomp covers clustering
    w(theta) + galaxy-galaxy lensing gamma_t (upstream:correlation.py,
    SURVEY.md §2 row 12); xi_+/xi_- complete the standard 3x2pt
    surface with the machinery already in place (same Limber + FFTLog
    Hankel engine, mu = 0 / 4)."""
    if theta_deg is None:
        theta_deg = theta_bins_deg(grid)
    ells, _, _ = ell_grid(grid)
    cl = projection.limber_cl(cosmo, win_src_a, win_src_b,
                              jnp.asarray(ells), p_table, grid)
    return wtheta_from_cl(cl, theta_deg, grid, mu=0.0)


def xi_minus(cosmo: CosmoParams, win_src_a, win_src_b, p_table,
             theta_deg=None, grid: GridSpec = DEFAULT_GRID):
    """Shear-shear correlation xi_-(theta) — the J4 transform:
    xi_- = ∫ l dl/(2 pi) C^EE_l J4(l theta).  See xi_plus."""
    if theta_deg is None:
        theta_deg = theta_bins_deg(grid)
    ells, _, _ = ell_grid(grid)
    cl = projection.limber_cl(cosmo, win_src_a, win_src_b,
                              jnp.asarray(ells), p_table, grid)
    return wtheta_from_cl(cl, theta_deg, grid, mu=4.0)


def magnification_correlation(cosmo: CosmoParams, win_gal, win_conv, p_table,
                              theta_deg=None, alpha_slope=2.0,
                              grid: GridSpec = DEFAULT_GRID):
    """Galaxy-magnification correlation (chomp ``MagCorrelation`` [M]):
    w_mag(theta) = 2 (alpha - 1) * w_{g kappa}(theta), with alpha the
    faint-end number-count slope."""
    if theta_deg is None:
        theta_deg = theta_bins_deg(grid)
    ells, _, _ = ell_grid(grid)
    cl = projection.limber_cl(cosmo, win_gal, win_conv, jnp.asarray(ells),
                              p_table, grid)
    return 2.0 * (alpha_slope - 1.0) * wtheta_from_cl(cl, theta_deg, grid,
                                                      mu=0.0)


def write_ascii(path, theta_deg, w, header="theta_deg  w(theta)"):
    """ASCII output table (chomp ``Correlation.write``)."""
    arr = np.column_stack([np.asarray(theta_deg), np.asarray(w)])
    np.savetxt(path, arr, header=header)
