"""Covariance of w(theta) bins: Gaussian + shot noise + trispectrum.

TPU-native replacement for the reference's ``covariance.py``
(upstream:covariance.py; SURVEY.md §2 row 13 [M]: "Gaussian + shot-noise
+ trispectrum covariance of w(theta) bins for a survey area", Morrison &
Schneider 2013).  For bin-averaged estimators over annuli
[theta_i^-, theta_i^+] in a survey of solid angle Omega_s with 2-D
galaxy density n2d (per steradian):

  Cov_G[i,j]  = (2/Omega_s) ∫ l dl/(2 pi) Jbar_i(l) Jbar_j(l)
                  [C_l^2 + 2 C_l/n2d]
  Cov_sn[i,j] = (2/Omega_s) delta_ij / (pi n2d^2 (th_i+^2 - th_i-^2))
                  (the pure shot-noise delta, integrated analytically)
  Cov_NG[i,j] = (1/Omega_s) ∬ (l dl/2pi)(l' dl'/2pi) Jbar_i(l) Jbar_j(l')
                  T_proj(l, l')
  T_proj(l,l') = ∫ dchi W^4/chi^6 (D/D_pivot)^6
                  T̄((l+1/2)/chi, (l'+1/2)/chi)

with the bin-averaged Bessel factor
  Jbar_i(l) = 2 [ th+ l J1(th+ l) - th- l J1(th- l) ]
              / (l^2 (th+^2 - th-^2)) ,
the angle-averaged parallelogram trispectrum T̄ from
chomp_tpu.trispectrum (galaxy version: HOD factorial-moment weights),
and the same separable-growth approximation the rest of the pipeline
uses (exact for the tree-PT 4h term; leading order for 1h-3h, mirroring
chomp's separable P(k) treatment).

Everything is dense linear algebra:  Cov_G = B diag(g) B^T and
Cov_NG = (1/Omega_s) B T_proj B^T with B[i, l] = Jbar_i(l) — two matmuls
on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, linear, trispectrum
from chomp_tpu.grids import gl_fixed
from chomp_tpu.halo import HaloModel
from chomp_tpu.params import C_OVER_H0, DEFAULT_GRID, CosmoParams, GridSpec, HaloParams
from chomp_tpu.special import j1
from chomp_tpu.projection import dndz


def theta_bin_edges_deg(grid: GridSpec = DEFAULT_GRID, n_bins: int = 16):
    """Log-spaced bin edges over the default theta range."""
    return np.logspace(np.log10(grid.theta_min_deg),
                       np.log10(grid.theta_max_deg), n_bins + 1)


def bin_averaged_j0(ells, edges_rad):
    """Jbar_i(l): (n_bins, n_ell)."""
    ells = jnp.asarray(ells)
    lo = jnp.asarray(edges_rad[:-1])[:, None]
    hi = jnp.asarray(edges_rad[1:])[:, None]
    x_hi = hi * ells[None, :]
    x_lo = lo * ells[None, :]
    num = 2.0 * (x_hi * j1(x_hi) - x_lo * j1(x_lo))
    return num / (ells[None, :] ** 2 * (hi * hi - lo * lo))


def _log_ell_weights(n: int, lo: float, hi: float):
    """Trapezoid rule in ln l on a dense log grid (numpy)."""
    lnl = np.linspace(np.log(lo), np.log(hi), n)
    w = np.full(n, lnl[1] - lnl[0])
    w[0] *= 0.5
    w[-1] *= 0.5
    return np.exp(lnl), w


def gaussian_covariance(cl_fn, theta_edges_deg, n2d, omega_s_sr,
                        n_ell_cov: int = 4096, ell_lo: float = 1.0,
                        ell_hi: float = 1.0e6):
    """Gaussian + shot-noise covariance (chomp Covariance's Gaussian
    part).  ``cl_fn(ells) -> C_l`` (any tracer spectrum)."""
    ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
    ells = jnp.asarray(ells_np)
    w = jnp.asarray(w_np)
    edges_rad = np.radians(np.asarray(theta_edges_deg))
    b = bin_averaged_j0(ells, edges_rad)                  # (nb, nl)
    cl = cl_fn(ells)
    g = (2.0 / omega_s_sr) * ells**2 * w / (2.0 * jnp.pi) * (
        cl * cl + 2.0 * cl / n2d)
    cov = (b * g[None, :]) @ b.T
    # Pure shot-noise delta, integrated analytically over the bins.
    lo = jnp.asarray(edges_rad[:-1])
    hi = jnp.asarray(edges_rad[1:])
    diag = (2.0 / omega_s_sr) / (jnp.pi * n2d**2 * (hi * hi - lo * lo))
    return cov + jnp.diag(diag)


def projected_trispectrum(cosmo: CosmoParams, halo_p: HaloParams,
                          model: HaloModel, dist, ells_cov,
                          galaxy: bool = True, with_bao: bool = False,
                          grid: GridSpec = DEFAULT_GRID,
                          n_k_tri: int = 96, n_z_tri: int = 24,
                          exact_z: bool = False):
    """T_proj(l, l') on a coarse ell grid: T̄ built on an (n_k_tri)^2
    log-k grid, bilinearly interpolated in (ln k, ln k') at each
    projection node, contracted over chi.

    ``exact_z=False`` (default): one T̄ table at the model's pivot
    redshift, scaled by the separable D^6(z) (exact for the tree-PT 4h
    term, leading order for 1h-3h — mirroring chomp's separable P
    treatment).  ``exact_z=True``: the FULL halo model and T̄ table are
    rebuilt at every projection node (vmap over z of the same fused
    program) — no growth approximation anywhere; ~n_z_tri x the cost."""
    ells_cov = jnp.asarray(ells_cov)
    # T̄ table(s).
    k_lo, k_hi = grid.k_table_min, grid.k_table_max
    ln_k = jnp.asarray(np.linspace(np.log(k_lo), np.log(k_hi), n_k_tri))
    kk = jnp.exp(ln_k)
    k1g, k2g = jnp.meshgrid(kk, kk, indexing="ij")
    tri_fn = (trispectrum.trispectrum_parallelogram_galaxy if galaxy
              else trispectrum.trispectrum_parallelogram)
    tbar = tri_fn(cosmo, halo_p, model, k1g.ravel(), k2g.ravel(),
                  with_bao, grid).reshape(n_k_tri, n_k_tri)
    dln = ln_k[1] - ln_k[0]

    def _sign_lnabs(t):
        """(sign, ln|t|) tables: bilinear in ln|T̄| with a separately
        interpolated sign preserves regions where the negative K13/P13
        star term dominates (plain ln(max(T,0)) would clamp them to 0)."""
        return jnp.where(t < 0.0, -1.0, 1.0), jnp.log(
            jnp.maximum(jnp.abs(t), 1e-300))

    def _bilinear(tbl, lnk1, lnk2):
        def idx(lnk):
            t = jnp.clip((lnk - ln_k[0]) / dln, 0.0, tbl.shape[0] - 1.001)
            i = jnp.floor(t).astype(jnp.int32)
            return i, t - i

        i, fi = idx(lnk1)
        j, fj = idx(lnk2)
        return ((1 - fi) * (1 - fj) * tbl[i, j] + fi * (1 - fj) * tbl[i + 1, j]
                + (1 - fi) * fj * tbl[i, j + 1] + fi * fj * tbl[i + 1, j + 1])

    sgn_tbar, ln_tbar = _sign_lnabs(tbar)

    def tbar_interp(lnk1, lnk2):
        """Sign-aware log-bilinear in (ln k, ln k') of T̄."""
        mag = jnp.exp(_bilinear(ln_tbar, lnk1, lnk2))
        return jnp.where(_bilinear(sgn_tbar, lnk1, lnk2) >= 0.0, mag, -mag)

    # Projection over z.
    z_lo = jnp.maximum(dist.z_min, 1e-3)
    z_nodes, z_w = gl_fixed(0.0, 1.0, n_z_tri)
    z_nodes = jnp.asarray(z_nodes)
    z_w = jnp.asarray(z_w)
    z = z_lo + (dist.z_max - z_lo) * z_nodes
    wz = z_w * (dist.z_max - z_lo)
    chi = background.comoving_distance(cosmo, z, grid.n_dist)
    d = (background.growth_factor(cosmo, z, grid.n_growth)
         / model.mass.growth)
    p_z = dndz(dist, z, grid)
    w_gal = p_z * background.ez(cosmo, z) / C_OVER_H0     # W_g(chi)
    weight = w_gal**4 / chi**6 * d**6 * (C_OVER_H0 / background.ez(cosmo, z)) * wz

    lnk1 = jnp.log((ells_cov[:, None] + 0.5) / chi[None, :])  # (nl, nz)
    out = jnp.zeros((ells_cov.shape[0], ells_cov.shape[0]))

    import jax

    if exact_z:
        from chomp_tpu import halo as halo_mod

        # No D^6 factor — the per-z tables carry the full evolution.
        weight_exact = (w_gal**4 / chi**6
                        * (C_OVER_H0 / background.ez(cosmo, z)) * wz)

        def body(carry, idx):
            model_z = halo_mod.build_halo_model(
                cosmo, halo_p, model.hod, z[idx], with_bao, grid)
            tb = tri_fn(cosmo, halo_p, model_z, k1g.ravel(), k2g.ravel(),
                        with_bao, grid).reshape(n_k_tri, n_k_tri)
            sgn_tb, ln_tb = _sign_lnabs(tb)
            lnk_z = lnk1[:, idx]
            mag = jnp.exp(_bilinear(ln_tb, lnk_z[:, None], lnk_z[None, :]))
            t_ab = jnp.where(
                _bilinear(sgn_tb, lnk_z[:, None], lnk_z[None, :]) >= 0.0,
                mag, -mag)
            return carry + weight_exact[idx] * t_ab, None

        out, _ = jax.lax.scan(body, out, jnp.arange(n_z_tri))
        return out

    # Contract over z: T_proj[a,b] = sum_z weight_z T̄(k_a(z), k_b(z)).
    def body(carry, idx):
        lnk_z = lnk1[:, idx]
        t_ab = tbar_interp(lnk_z[:, None], lnk_z[None, :])
        return carry + weight[idx] * t_ab, None

    out, _ = jax.lax.scan(body, out, jnp.arange(n_z_tri))
    return out


def nongaussian_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                           model: HaloModel, dist, theta_edges_deg,
                           omega_s_sr, galaxy: bool = True,
                           with_bao: bool = False,
                           grid: GridSpec = DEFAULT_GRID,
                           n_ell_cov: int = 96,
                           ell_lo: float = 1.0, ell_hi: float = 1.0e5,
                           exact_z: bool = False):
    """Non-Gaussian (connected trispectrum) covariance block."""
    ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
    ells = jnp.asarray(ells_np)
    w = jnp.asarray(w_np)
    edges_rad = np.radians(np.asarray(theta_edges_deg))
    b = bin_averaged_j0(ells, edges_rad)                  # (nb, nl)
    t_proj = projected_trispectrum(cosmo, halo_p, model, dist, ells,
                                   galaxy, with_bao, grid,
                                   exact_z=exact_z)
    meas = ells**2 * w / (2.0 * jnp.pi)                   # l dl/(2 pi)
    bm = b * meas[None, :]
    return (bm @ t_proj @ bm.T) / omega_s_sr


def wtheta_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                      model: HaloModel, dist, cl_fn, theta_edges_deg,
                      omega_s_sr, n2d, galaxy: bool = True,
                      with_bao: bool = False,
                      grid: GridSpec = DEFAULT_GRID):
    """Total covariance: Gaussian + shot noise + trispectrum (chomp
    ``Covariance`` object equivalent)."""
    cov_g = gaussian_covariance(cl_fn, theta_edges_deg, n2d, omega_s_sr)
    cov_ng = nongaussian_covariance(cosmo, halo_p, model, dist,
                                    theta_edges_deg, omega_s_sr, galaxy,
                                    with_bao, grid)
    return cov_g + cov_ng
