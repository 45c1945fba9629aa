"""Survey-footprint (masked) w(theta) covariance — capability beyond
chomp's uniform-Omega_s treatment (chomp_tpu.mask).

A ~10-degree-radius disc survey: compare the uniform-footprint Gaussian
covariance against the mask-aware one (exact pair-count normalization +
low-ell mode coupling).  CPU float64 (covariance eigenvalues are
float32-sensitive).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import default_cosmo, default_halo, limber_fft, projection
from chomp_tpu import halo as halo_mod
from chomp_tpu.hod import default_hod
from chomp_tpu.mask import DiscMask, UniformMask, masked_gaussian_covariance


def main():
    cosmo = default_cosmo()
    halo_p = default_halo()
    hod = default_hod()
    model = halo_mod.build_halo_model(cosmo, halo_p, hod, 0.0, False)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    win = projection.WindowGalaxy(dist=dist)
    p_lat = limber_fft.p_lattice_halo(cosmo, halo_p, model, "power_gg")

    def cl_gg(ells_np):
        return limber_fft.limber_cl_fft(cosmo, win, win, ells_np, p_lat,
                                        growth_pivot=model.mass.growth)

    radius = np.radians(10.0)                      # ~314 deg^2 disc
    mask = DiscMask(float(radius))
    n2d = 3.0e7                                    # lens galaxies / sr
    edges = np.degrees(np.logspace(np.log10(np.radians(0.02)),
                                   np.log10(radius / 2.0), 9))

    cov_mask = np.asarray(masked_gaussian_covariance(
        cl_gg, edges, n2d, mask))
    cov_unif = np.asarray(masked_gaussian_covariance(
        cl_gg, edges, n2d, UniformMask(mask.area2)))

    print(f"disc radius 10 deg, area {mask.area2:.4f} sr, "
          f"{len(edges) - 1} theta bins {edges[0]:.3f}..{edges[-1]:.2f} deg")
    print(f"{'theta_mid[deg]':>14s} {'sigma_masked':>12s} "
          f"{'sigma_unifrm':>12s} {'ratio':>6s}")
    mid = np.sqrt(edges[:-1] * edges[1:])
    sm = np.sqrt(np.diag(cov_mask))
    su = np.sqrt(np.diag(cov_unif))
    for i in range(len(mid)):
        print(f"{mid[i]:14.3f} {sm[i]:12.3e} {su[i]:12.3e} "
              f"{sm[i] / su[i]:6.3f}")
    ev = np.linalg.eigvalsh(0.5 * (cov_mask + cov_mask.T))
    print("masked covariance PSD:", bool(np.all(ev > 0)))


if __name__ == "__main__":
    main()
