"""Curved-sky predictions and masked-sphere covariance — capability
beyond chomp's flat-sky / uniform-Omega_s treatment (chomp_tpu.curved).

Three stages:
  1. make_pipeline(geometry="curved"): exact multipole-sum w(theta) and
     gamma_t at the SAME runtime cost as the flat FFTLog route (the
     Legendre / Wigner-d sums are fused offline into one static lattice
     operator) — compare both routes on wide bins.
  2. A survey footprint as a pixel weight map on the sphere
     (PixelSphereMask): two disjoint caps, a geometry no azimuthal
     profile can represent.
  3. The joint [w_gg, gamma_t] covariance on that masked sphere
     (curved_joint_wtheta_gammat_covariance), fed by the gather-free
     lattice C_ells — compare its diagonal against the naive full-sky
     scaling.

CPU float64 (covariance eigenvalues are float32-sensitive).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu import halo as halo_mod
from chomp_tpu.curved import (PixelSphereMask, UniformSphereMask,
                              curved_joint_wtheta_gammat_covariance)
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import make_pipeline


def two_cap_weight_map(n_ring=256, n_phi=512, radius_deg=20.0,
                       center2=(2.0, 1.0)):
    """Binary two-cap footprint on the iso-latitude grid."""
    th = (np.arange(n_ring) + 0.5) * np.pi / n_ring
    ph = np.arange(n_phi) * 2 * np.pi / n_phi
    rad = np.radians(radius_deg)

    def cap(center):
        ct0, st0 = np.cos(center[0]), np.sin(center[0])
        mu = (ct0 * np.cos(th)[:, None] + st0 * np.sin(th)[:, None]
              * np.cos(ph[None, :] - center[1]))
        return mu >= np.cos(rad)

    return (cap((0.0, 0.0)) | cap(center2)).astype(float)


def main():
    cosmo = default_cosmo()
    halo_p = default_halo()
    hod = default_hod()
    grid = GridSpec(n_mass=128, n_ell=128, n_theta=10,
                    theta_min_deg=0.5, theta_max_deg=10.0)
    dist_l = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(0.7), sigma_z=jnp.asarray(0.2))
    dist_s = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.1), sigma_z=jnp.asarray(0.3))

    # 1. flat vs exact-curved predictions on wide bins
    kw = dict(z_pivot=0.7, grid=grid)
    out_flat = make_pipeline(halo_p, hod, dist_l, **kw)(cosmo)
    out_curv = make_pipeline(halo_p, hod, dist_l, geometry="curved",
                             **kw)(cosmo)
    th = np.asarray(out_flat["theta_deg"])
    print("theta [deg]      :", np.array2string(th, precision=2))
    print("w flat           :", np.array2string(
        np.asarray(out_flat["w_theta"]), precision=6))
    print("w curved (exact) :", np.array2string(
        np.asarray(out_curv["w_theta"]), precision=6))
    rel = np.asarray(out_curv["w_theta"]) / np.asarray(
        out_flat["w_theta"]) - 1.0
    print("curved/flat - 1  :", np.array2string(rel, precision=4),
          "(flat-sky approximation error, grows with theta; the "
          "relative measure blows up at the w zero crossing)")

    # 2. the footprint
    w_map = two_cap_weight_map()
    mask = PixelSphereMask(w_map)
    print(f"\nfootprint: two 20-deg caps, A2 = {mask.area2:.4f} sr "
          f"(fsky = {mask.area2 / (4 * np.pi):.3f})")

    # 3. joint covariance on the masked sphere
    model = halo_mod.build_halo_model(cosmo, halo_p, hod, 0.0, False,
                                      grid)
    edges = np.array([1.0, 2.0, 4.0, 8.0])
    n2d, shape_noise = 3.0e7, 1.0e-9
    cov = np.asarray(curved_joint_wtheta_gammat_covariance(
        cosmo, halo_p, model, dist_l, dist_s, edges, n2d, shape_noise,
        mask, ell_max=2048, grid=grid))
    cov_full = np.asarray(curved_joint_wtheta_gammat_covariance(
        cosmo, halo_p, model, dist_l, dist_s, edges, n2d, shape_noise,
        UniformSphereMask(), ell_max=2048, grid=grid))
    fsky = mask.area2 / (4.0 * np.pi)
    naive = np.diag(cov_full) / fsky
    print("masked sigma(w_i, gt_i) :", np.array2string(
        np.sqrt(np.diag(cov)), precision=3))
    print("excess vs fullsky/fsky  :", np.array2string(
        np.diag(cov) / naive, precision=3),
        "(>1 = mode coupling + pair-count edge deficit)")
    ev = np.linalg.eigvalsh(0.5 * (cov + cov.T))
    print("PSD:", bool(np.all(ev > 0)))


if __name__ == "__main__":
    main()
