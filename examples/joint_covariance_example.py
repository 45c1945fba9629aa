"""Morrison & Schneider 2013 program end-to-end: the joint covariance of
galaxy clustering w_gg(theta) and galaxy-galaxy lensing gamma_t(theta)
for a lens sample + source sample (chomp covariance.py's use case,
rebuilt TPU-first in chomp_tpu.covariance).

Run: python examples/joint_covariance_example.py  (any backend; a couple
of minutes on CPU, seconds on TPU once compiled).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# Covariance assembly is an offline analysis product with near-zero
# eigenvalues: run it in float64 (float32 noise on the NG tables can
# push marginal correlations past 1).  The float32 TPU path is for the
# DATA VECTOR (w/gamma_t), not the covariance.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import covariance, default_cosmo, default_halo, halo
from chomp_tpu import correlation, limber_fft, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec

# Moderate grid: plenty for a covariance (data-vector accuracy needs are
# far looser than the signal's 1e-4 bar).
grid = GridSpec(n_mass=128, n_mu=8, sigma_panels=8, sigma_n_per_panel=32,
                n_growth=32, n_dist=32)

cosmo = default_cosmo()
halo_p = default_halo()
hod = default_hod()

# Lens sample at z ~ 0.5, source sample at z ~ 1.2.
lens = projection.DNdzGaussian(z_min=jnp.asarray(0.0), z_max=jnp.asarray(1.2),
                               z0=jnp.asarray(0.5), sigma_z=jnp.asarray(0.15))
src = projection.DNdzGaussian(z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
                              z0=jnp.asarray(1.2), sigma_z=jnp.asarray(0.3))

model = halo.build_halo_model(cosmo, halo_p, hod, 0.5, False, grid)

# Survey: 1000 deg^2, 2 lenses/arcmin^2, 10 sources/arcmin^2, sigma_e=0.26.
area_deg2 = 1000.0
omega_s = area_deg2 * (np.pi / 180.0) ** 2
per_sr = (180.0 * 60.0 / np.pi) ** 2
n_lens = 2.0 * per_sr
n_src = 10.0 * per_sr
shape_noise = 0.26**2 / n_src

edges_deg = np.logspace(-2, 0, 9)           # 8 bins, 0.01..1 deg
cov = np.asarray(covariance.joint_wtheta_gammat_covariance(
    cosmo, halo_p, model, lens, src, edges_deg, omega_s, n_lens,
    shape_noise, grid=grid, n_k_tri=48, n_z_tri=8))

nb = len(edges_deg) - 1
corr_mat = cov / np.sqrt(np.outer(np.diag(cov), np.diag(cov)))
print(f"joint covariance: {cov.shape}, condition number "
      f"{np.linalg.cond(cov):.2e}")
print("block correlation structure (w bins | gamma_t bins):")
for i in range(2 * nb):
    print("  " + " ".join(f"{corr_mat[i, j]:+.2f}" for j in range(2 * nb)))

# Signal-to-noise of the joint data vector, the number this matrix is
# for:  SNR^2 = d^T C^-1 d.
win_g = projection.WindowGalaxy(dist=lens)
win_k = projection.WindowConvergence(dist=src)
p_all = limber_fft.p_lattice_halo_all(cosmo, halo_p, model, False, grid)
centers = np.sqrt(edges_deg[:-1] * edges_deg[1:])
w = np.asarray(limber_fft.limber_wtheta_fft(
    cosmo, win_g, win_g, centers, p_all["power_gg"], grid,
    growth_pivot=model.mass.growth))
gt = np.asarray(limber_fft.limber_wtheta_fft(
    cosmo, win_k, win_g, centers, p_all["power_gm"], grid, mu=2.0,
    growth_pivot=model.mass.growth))
d = np.concatenate([w, gt])
snr = float(np.sqrt(d @ np.linalg.solve(cov, d)))
print(f"\njoint data vector S/N over {area_deg2:.0f} deg^2: {snr:.1f}")
print(f"w_gg(theta):    {w}")
print(f"gamma_t(theta): {gt}")
