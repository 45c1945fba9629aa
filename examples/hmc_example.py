"""Hamiltonian Monte Carlo through the ENTIRE halo-model pipeline.

The whole prediction stack (transfer function -> sigma(R) -> mass
function -> HOD-weighted halo integrals -> Limber -> Hankel) is pure
jit/grad-able JAX, so gradient-based samplers apply directly — no
finite differences, no emulators.  This samples (Omega_m, sigma_8)
from a synthetic w(theta)+gamma_t likelihood with a fully jitted HMC
chain (leapfrog + Metropolis inside one lax.scan): something the
scipy-object reference cannot do at all (upstream:correlation.py
computes one model at a time, no derivatives).

Run: python examples/hmc_example.py        (CPU f64; ~20-30 min
for both chains + the adaptive demo on the 1-core box.  The same
sampler jit-compiles for the TPU — the pipeline is the bench.py fast
path — where each chain step costs ~2 gradient evaluations at
~1 ms/cosmology-gradient.)
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
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import make_pipeline

OMEGA_S = 0.3
N2D_LENS = 3.0e7
SHAPE_NOISE = 0.26**2 / 7.0e7

cosmo0 = default_cosmo()
h = default_halo()
hod = default_hod()
dist = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
    z0=jnp.asarray(0.6), sigma_z=jnp.asarray(0.15))
dist_src = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
    z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.3))

edges_deg = np.logspace(np.log10(0.05), np.log10(2.0), 9)
theta_mid = np.sqrt(edges_deg[:-1] * edges_deg[1:])
grid = GridSpec(n_k=96, n_mass=64, n_mu=8, sigma_panels=8,
                sigma_n_per_panel=32, n_growth=32, n_dist=32,
                lattice_dln=0.05)   # demo grid: keeps the chain <5 min
pipe = make_pipeline(h, hod, dist, theta_deg=theta_mid, z_pivot=0.6,
                     grid=grid)


def vec_of(p):
    om, s8 = p
    c = dataclasses.replace(cosmo0, omega_m0=om, omega_l0=1.0 - om,
                            sigma_8=s8)
    out = pipe(c)
    return jnp.concatenate([out["w_theta"], out["gamma_t"]])


# Synthetic data at the fiducial point; fixed (cosmology-independent)
# Gaussian covariance, as in a standard analysis.
model0 = halo.build_halo_model(cosmo0, h, hod, 0.6, False, grid)
cov = np.asarray(covariance.joint_wtheta_gammat_covariance(
    cosmo0, h, model0, dist, dist_src, edges_deg, OMEGA_S, N2D_LENS,
    SHAPE_NOISE, grid=grid))
cov_inv = jnp.asarray(np.linalg.inv(cov))
data = vec_of(jnp.array([cosmo0.omega_m0, cosmo0.sigma_8]))


# The likelihood / Fisher / HMC machinery is a library surface
# (chomp_tpu.inference, tested in tests/test_inference.py) — this
# example drives it end to end through the real pipeline.
from chomp_tpu import inference

like = inference.GaussianLikelihood(
    vec_of, data, cov, lower=[0.18, 0.55], upper=[0.45, 1.05])
neg_log_post = like.neg_log_post

# Mass matrix from the Fisher information at the fiducial point — the
# standard preconditioner, itself one jacfwd through the pipeline.
fisher = like.fisher(jnp.array([cosmo0.omega_m0, cosmo0.sigma_8]))
mass = fisher                       # momenta ~ N(0, F): unit condition
mass_inv = jnp.linalg.inv(fisher)

N_STEPS = 120
N_LEAP = 5
EPS = 0.6                           # in mass-preconditioned units


def run_hmc(logp_neg, mass, q0, key, n_steps=N_STEPS, n_leap=N_LEAP,
            eps=EPS):
    qs, acc = inference.hmc(logp_neg, mass, q0, key, n_steps=n_steps,
                            n_leap=n_leap, eps=eps)
    return np.asarray(qs), np.asarray(acc)


q0 = jnp.array([0.275, 0.82])       # start ~1 sigma off-fiducial
qs, acc = run_hmc(neg_log_post, mass, q0, jax.random.PRNGKey(0))
burn = N_STEPS // 3
post = qs[burn:]
mean, sd = post.mean(axis=0), post.std(axis=0)
fisher_sd = np.sqrt(np.diag(np.asarray(mass_inv)))
print(f"acceptance: {acc.mean():.2f}")
print(f"posterior Omega_m = {mean[0]:.4f} +- {sd[0]:.4f} "
      f"(Fisher: {fisher_sd[0]:.4f}; truth {cosmo0.omega_m0})")
print(f"posterior sigma_8 = {mean[1]:.4f} +- {sd[1]:.4f} "
      f"(Fisher: {fisher_sd[1]:.4f}; truth {cosmo0.sigma_8})")
assert acc.mean() > 0.5, "HMC acceptance collapsed"
assert abs(mean[0] - cosmo0.omega_m0) < 5 * sd[0]
assert abs(mean[1] - cosmo0.sigma_8) < 5 * sd[1]
# The HMC spread should agree with the Fisher forecast to within the
# sampling noise of ~80 correlated draws (loose factor-3 band).
assert np.all(sd / fisher_sd > 0.3) and np.all(sd / fisher_sd < 3.0), (
    sd, fisher_sd)

# --- Part 2: sample cosmology AND systematics jointly ----------------
# (Omega_m, sigma_8, A_ia, m): the nuisance layer is traced, so the
# same reverse-mode gradient drives a joint cosmology+systematics
# chain at unchanged per-step cost.  Gaussian prior m ~ N(0, 0.01).
import dataclasses as _dc

from chomp_tpu.parallel.sweep import (default_nuisance,
                                      make_tomographic_pipeline)

grid2 = GridSpec(n_k=64, n_mass=64, n_ell=256, lattice_dln=0.08)
pipe_nu = make_tomographic_pipeline(h, hod, [dist], [dist_src],
                                    theta_deg=theta_mid, z_pivot=0.6,
                                    grid=grid2, with_nuisance=True)
nu0 = default_nuisance(1, 1)


def vec_nu(p):
    om, s8, a_ia, m = p
    c = dataclasses.replace(cosmo0, omega_m0=om, omega_l0=1.0 - om,
                            sigma_8=s8)
    nu = _dc.replace(nu0, a_ia=a_ia, m=m[None])
    return pipe_nu(c, nu)["vector"][:2 * len(theta_mid)]   # w + gt


data_nu = vec_nu(jnp.array([cosmo0.omega_m0, cosmo0.sigma_8, 0.4, 0.0]))


def neg_log_post_nu(p):
    r = vec_nu(p) - data_nu
    prior = 0.5 * (p[3] / 0.01) ** 2 + 0.5 * (p[2] / 2.0) ** 2
    lo = jnp.array([0.18, 0.55, -4.0, -0.2])
    hi = jnp.array([0.45, 1.05, 4.0, 0.2])
    barrier = jnp.sum(jnp.where((p < lo) | (p > hi), 1e6, 0.0))
    return 0.5 * (r @ cov_inv @ r) + prior + barrier


p0_nu = jnp.array([cosmo0.omega_m0, cosmo0.sigma_8, 0.4, 0.0])
jac_nu = jax.jacfwd(vec_nu)(p0_nu)
fisher_nu = jac_nu.T @ cov_inv @ jac_nu \
    + jnp.diag(jnp.array([0.0, 0.0, 1 / 2.0**2, 1 / 0.01**2]))
N2 = 60                             # short demo chain (1-core box)
qs2, acc2 = run_hmc(neg_log_post_nu, fisher_nu,
                    p0_nu + jnp.array([0.003, -0.005, 0.3, 0.005]),
                    jax.random.PRNGKey(1), n_steps=N2, n_leap=3,
                    eps=0.8)
post2 = qs2[N2 // 3:]
mean2, sd2 = post2.mean(axis=0), post2.std(axis=0)
print(f"joint chain acceptance: {acc2.mean():.2f}")
print(f"  A_ia = {mean2[2]:+.2f} +- {sd2[2]:.2f} (truth +0.40), "
      f"m = {mean2[3]:+.4f} +- {sd2[3]:.4f} (prior 0.01)")
assert acc2.mean() > 0.5
assert abs(mean2[2] - 0.4) < 5 * max(sd2[2], 1e-3)
assert sd2[3] < 0.02          # the m prior binds
print("OK")

# ---------------------------------------------------------------------------
# Self-tuning sampler (inference.adaptive_hmc) on the Laplace surrogate
# ---------------------------------------------------------------------------
# adaptive_hmc needs no hand-chosen (mass, eps): dual-averaging step-
# size adaptation + warmup mass estimation + jittered trajectories,
# all fixed-shape lax.scans (the TPU-first alternative to NUTS — see
# its docstring).  Demonstrated here on the quadratic Laplace
# surrogate of the posterior above (instant; swap in neg_log_post for
# the real-pipeline version of the same call).
mu_lap = jnp.array([cosmo0.omega_m0, cosmo0.sigma_8])
surrogate = lambda p: 0.5 * (p - mu_lap) @ fisher @ (p - mu_lap)
out = inference.adaptive_hmc(surrogate, mu_lap, jax.random.PRNGKey(7),
                             n_warmup=300, n_samples=500, n_chains=4,
                             n_leap=8)
rhat = inference.split_rhat(out["samples"])
ess = inference.effective_sample_size(out["samples"])
sd_hmc = np.asarray(out["samples"]).reshape(-1, 2).std(axis=0)
sd_lap = np.sqrt(np.diag(np.linalg.inv(np.asarray(fisher))))
print(f"adaptive_hmc: eps={out['step_size']:.3f} "
      f"accept={float(np.mean(out['accept'])):.2f} "
      f"R-hat={rhat.max():.3f} min-ESS={ess.min():.0f}")
print(f"  sigma(Omega_m, sigma_8) = {sd_hmc[0]:.4f}, {sd_hmc[1]:.4f} "
      f"(Laplace {sd_lap[0]:.4f}, {sd_lap[1]:.4f})")
assert rhat.max() < 1.05 and np.allclose(sd_hmc, sd_lap, rtol=0.25)
print("OK (adaptive)")
