"""Cluster number counts in chomp_tpu: a SZ/optical-style cluster
abundance data vector, its Poisson + sample-variance covariance, the
counts x clustering super-sample cross-covariance, and a joint Fisher
forecast showing what the counts add.

Capability extension beyond chomp (upstream stops at the mass function;
SURVEY.md §2 row 4): counts of clusters selected on a lognormal mass
proxy, fully traced through (cosmology, mass-observable nuisance), so
Fisher/MCMC over the joint "counts + 3x2pt" vector is one jacfwd away.

Run: python examples/cluster_counts_example.py     (CPU f64 by design —
covariance eigenvalues; the counts themselves are a TPU-ready traced
function.)
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import clusters, default_cosmo, default_halo, halo, ssc
from chomp_tpu.hod import default_hod
from chomp_tpu.projection import DNdzGaussian

# Survey: ~5000 deg^2 footprint, clusters above ~2e14 in two proxy bins
# and three redshift bins.
OMEGA_S = 1.5                                   # sr
Z_EDGES = (0.2, 0.4, 0.6, 0.8)
SEL = clusters.ClusterSelection(
    ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 4.5e14, 2e16])),
    sigma_lnm=jnp.asarray(0.25),                # lognormal MOR scatter
    lnm_bias=jnp.asarray(0.0))

cosmo = default_cosmo()
hp = default_halo()

# ---------------------------------------------------------------------------
# Counts + covariance
# ---------------------------------------------------------------------------
counts = clusters.cluster_counts(cosmo, hp, SEL, Z_EDGES, OMEGA_S)
cov_nn = clusters.counts_covariance(cosmo, hp, SEL, Z_EDGES, OMEGA_S,
                                    geometry="flat")
n_flat = np.asarray(counts).reshape(-1)
print("expected counts (z bin x proxy bin):")
print(np.asarray(counts).round(1))
frac = np.sqrt(np.diag(np.asarray(cov_nn))) / n_flat
print("fractional sigma per bin (Poisson+SSC):", frac.round(3))
poisson_frac = 1.0 / np.sqrt(n_flat)
print("SSC inflation over pure Poisson:",
      (frac / poisson_frac).round(2))

# ---------------------------------------------------------------------------
# Joint with w(theta): the SSC cross block correlates the two probes
# ---------------------------------------------------------------------------
hod = default_hod()
dist = DNdzGaussian(z_min=0.15, z_max=0.9, z0=0.5, sigma_z=0.1)
model = halo.build_halo_model(cosmo, hp, hod, 0.5)
theta_edges = np.geomspace(0.2, 3.0, 6)

cov_nx = clusters.counts_3x2pt_ssc_cross(
    cosmo, hp, model, SEL, Z_EDGES, [dist], [], theta_edges, OMEGA_S,
    geometry="flat")
cov_xx_ssc = ssc.ssc_covariance(cosmo, hp, model, dist, theta_edges,
                                OMEGA_S)
joint_ssc = clusters.joint_counts_3x2pt_covariance(
    jnp.asarray(cov_nn), cov_nx, cov_xx_ssc)
d = np.sqrt(np.diag(np.asarray(joint_ssc)))
corr = np.asarray(joint_ssc) / np.outer(d, d)
print("\nmax |corr(N, w-theta-bin)| through shared footprint modes:",
      np.abs(corr[:len(n_flat), len(n_flat):]).max().round(3))

# ---------------------------------------------------------------------------
# Fisher: counts alone on (Omega_m, sigma_8), with the MOR scatter
# marginalized — the classic abundance degeneracy and what a
# self-calibrated proxy costs.
# ---------------------------------------------------------------------------


def counts_theory(p):
    om, s8, sig = p
    c = dataclasses.replace(cosmo, omega_m0=om, omega_l0=1.0 - om,
                            sigma_8=s8)
    s = dataclasses.replace(SEL, sigma_lnm=sig)
    return clusters.cluster_counts(c, hp, s, Z_EDGES,
                                   OMEGA_S).reshape(-1)


p0 = jnp.asarray([cosmo.omega_m0, cosmo.sigma_8, 0.25])
jac = jax.jacfwd(counts_theory)(p0)
cinv = np.linalg.inv(np.asarray(cov_nn))
fish = np.asarray(jac).T @ cinv @ np.asarray(jac)
# Gaussian prior sigma(sigma_lnm) = 0.05 (external MOR calibration).
fish_prior = fish + np.diag([0.0, 0.0, 1.0 / 0.05**2])
err = np.sqrt(np.diag(np.linalg.inv(fish_prior)))
print("\ncounts-only Fisher (MOR scatter marginalized, 0.05 prior):")
print(f"  sigma(Omega_m) = {err[0]:.4f}")
print(f"  sigma(sigma_8) = {err[1]:.4f}")
print(f"  sigma(sigma_lnM) = {err[2]:.4f}")
fixed = np.sqrt(np.diag(np.linalg.inv(fish[:2, :2])))
print(f"  (fixed-MOR sigma(Omega_m) = {fixed[0]:.4f}, "
      f"sigma(sigma_8) = {fixed[1]:.4f})")
