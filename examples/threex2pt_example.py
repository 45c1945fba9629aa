"""Full 3x2pt analysis in chomp_tpu: data vector, joint covariance,
and a differentiable Fisher forecast.

Builds the stacked [w_gg, gamma_t, xi_+, xi_-] data vector (capability
extension beyond chomp — upstream covers clustering + g-g lensing
only), the matching (4 nb, 4 nb) Gaussian + connected covariance from
the same gather-free lattice halo evaluation, and then uses JAX
autodiff through the ENTIRE pipeline (transfer function -> mass
function -> halo model -> Limber -> Hankel) to forecast (Omega_m,
sigma_8) constraints — something the scipy-object reference cannot do
at all.

Run: python examples/threex2pt_example.py          (CPU f64 by design:
covariance eigenvalues are float32-sensitive; the prediction pipeline
itself is the TPU fast path used by bench.py.)
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import covariance, default_cosmo, default_halo, halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.parallel.sweep import make_pipeline

# Survey: ~1000 deg^2, lens sample at z~0.6, sources at z~1.
OMEGA_S = 0.3                     # sr
N2D_LENS = 3.0e7                  # lenses / sr
N2D_SRC = 7.0e7                   # sources / sr
SIGMA_EPS = 0.26                  # per component
SHAPE_NOISE = SIGMA_EPS**2 / N2D_SRC

cosmo = default_cosmo()
h = default_halo()
hod = default_hod()
dist_lens = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
    z0=jnp.asarray(0.6), sigma_z=jnp.asarray(0.15))
dist_src = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
    z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.3))

edges_deg = np.logspace(np.log10(0.05), np.log10(2.0), 9)   # 8 bins
theta_mid = np.sqrt(edges_deg[:-1] * edges_deg[1:])

# --- data vector (lens windows for w/gt, source windows for shear) ---
pipe_lens = make_pipeline(h, hod, dist_lens, theta_deg=theta_mid,
                          z_pivot=0.6)
pipe_src = make_pipeline(h, hod, dist_src, theta_deg=theta_mid,
                         include_lensing=False, include_shear=True,
                         z_pivot=1.0)


def data_vector(c):
    a = pipe_lens(c)
    b = pipe_src(c)
    return jnp.concatenate([a["w_theta"], a["gamma_t"],
                            b["xi_plus"], b["xi_minus"]])


vec = np.asarray(data_vector(cosmo))
nb = len(theta_mid)
print(f"3x2pt data vector: {vec.shape[0]} entries "
      f"({nb} bins x 4 probes)")

# --- joint covariance (Gaussian + connected, one halo evaluation) ---
model = halo.build_halo_model(cosmo, h, hod)
cov = np.asarray(covariance.joint_3x2pt_covariance(
    cosmo, h, model, dist_lens, dist_src, edges_deg, OMEGA_S,
    N2D_LENS, SHAPE_NOISE))
sd = np.sqrt(np.diag(cov))
print("per-probe S/N:",
      {name: float(np.sqrt(vec[i * nb:(i + 1) * nb] @ np.linalg.solve(
          cov[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb],
          vec[i * nb:(i + 1) * nb])))
       for i, name in enumerate(("w", "gt", "xi+", "xi-"))})

# --- Fisher forecast via autodiff through the whole pipeline ---
def vec_of_params(p):
    om, s8 = p
    c = dataclasses.replace(cosmo, omega_m0=om, omega_l0=1.0 - om,
                            sigma_8=s8)
    return data_vector(c)


jac = np.asarray(jax.jacfwd(vec_of_params)(
    jnp.array([cosmo.omega_m0, cosmo.sigma_8])))
fisher = jac.T @ np.linalg.solve(cov, jac)
err = np.sqrt(np.diag(np.linalg.inv(fisher)))
rho = np.linalg.inv(fisher)[0, 1] / (err[0] * err[1])
print(f"Fisher (Omega_m, sigma_8): sigma = {err[0]:.4f}, {err[1]:.4f}, "
      f"corr = {rho:+.2f}")
assert np.all(np.isfinite(fisher)) and np.all(err > 0)
print("OK")
