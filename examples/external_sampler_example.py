"""External-sampler adapter: numpy-in/numpy-out ln-posterior export.

VERDICT round-4 item 10 (surface completion of chomp_tpu.inference):
``inference.external_loglike`` wraps any of the library likelihoods
into the plain-numpy ``log_prob(p) -> float`` signature that emcee /
Cobaya / zeus / dynesty expect — jitted once, sign flipped to ln P,
non-finite mapped to -inf.  This demo:

  1. trains a fast emulator of the w(theta)+gamma_t pipeline (the
     production-serving pattern from examples/emulator_example.py),
  2. builds a GaussianLikelihood on the emulated theory,
  3. exports it with external_loglike and drives an ensemble MCMC:
     emcee if installed, else inference.ensemble_sample — the
     self-contained Goodman & Weare stretch-move fallback that
     exercises the IDENTICAL contract (this image has no network, so
     the fallback is what actually runs here),
  4. checks the ensemble posterior against the Fisher forecast.

Run: python examples/external_sampler_example.py  (CPU f64, ~2-3 min)
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from chomp_tpu import default_cosmo, default_halo, emulator, inference, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import make_pipeline
from chomp_tpu.utils.tree import replace

cosmo0 = default_cosmo()
dist = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
    z0=jnp.asarray(0.6), sigma_z=jnp.asarray(0.15))
theta = np.logspace(np.log10(0.05), np.log10(2.0), 10)
grid = GridSpec(n_k=96, n_mass=64, n_mu=8, sigma_panels=8,
                sigma_n_per_panel=32, n_growth=32, n_dist=32,
                lattice_dln=0.05)   # demo grid (emulator_example's)
pipe = make_pipeline(default_halo(), default_hod(), dist,
                     theta_deg=theta, z_pivot=0.6, grid=grid)


def theory_exact(p):
    c = replace(cosmo0, omega_m0=p[0], omega_l0=1.0 - p[0], sigma_8=p[1])
    out = pipe(c)
    return jnp.concatenate([out["w_theta"], out["gamma_t"]])


BOUNDS = np.array([[0.22, 0.34], [0.65, 0.95]])


def main():
    t0 = time.time()
    emu, rep = emulator.train_emulator(
        theory_exact, BOUNDS, jax.random.PRNGKey(0), n_train=192,
        n_val=24, n_pca=16, hidden=(96, 96), n_epochs=2500,
        batch_size=64)
    print(f"emulator: {rep.n_train} exact evals + fit in "
          f"{time.time() - t0:.0f}s, holdout max_rel {rep.max_rel_err:.1e}")

    # Synthetic data at the truth + a Gaussian likelihood with a box
    # prior matching the training bounds (outside the box the MLP is
    # extrapolating garbage — the barrier keeps the sampler home).
    p_true = jnp.asarray([float(cosmo0.omega_m0), float(cosmo0.sigma_8)])
    d0 = np.asarray(theory_exact(p_true))
    cov = np.diag((0.03 * np.abs(d0) + 1e-3 * np.abs(d0).max()) ** 2)
    like = inference.GaussianLikelihood(
        emu, d0, cov, lower=jnp.asarray(BOUNDS[:, 0]),
        upper=jnp.asarray(BOUNDS[:, 1]))

    # --- the adapter: plain-numpy log-probability ---------------------
    log_prob = inference.external_loglike(like)
    lp0 = log_prob(np.asarray(p_true))
    print(f"log_prob(p_true) = {lp0:.3f}   "
          f"log_prob(outside box) = {log_prob(np.array([0.9, 2.0])):.1f}")
    assert np.isfinite(lp0)

    # --- drive an ensemble sampler through the numpy contract ---------
    rng = np.random.default_rng(1)
    n_walkers, n_steps = 16, 400
    p0_w = np.asarray(p_true)[None, :] + 1e-3 * rng.normal(
        size=(n_walkers, 2))
    t0 = time.time()
    try:
        import emcee

        sampler = emcee.EnsembleSampler(n_walkers, 2, log_prob)
        sampler.run_mcmc(p0_w, n_steps, progress=False)
        chain = sampler.get_chain()                 # (steps, walkers, 2)
        acc = float(np.mean(sampler.acceptance_fraction))
        driver = "emcee"
    except ImportError:
        chain, acc = inference.ensemble_sample(log_prob, p0_w, n_steps,
                                               seed=2)
        driver = "ensemble_sample (emcee-fallback)"
    print(f"{driver}: {n_steps} steps x {n_walkers} walkers in "
          f"{time.time() - t0:.0f}s, accept {acc:.2f}")

    burn = n_steps // 2
    flat = chain[burn:].reshape(-1, 2)
    mean, sd = flat.mean(axis=0), flat.std(axis=0)
    f = np.asarray(like.fisher(p_true))
    sd_fisher = np.sqrt(np.diag(np.linalg.inv(f)))
    print(f"posterior mean {mean} (truth {np.asarray(p_true)})")
    print(f"posterior sd   {sd} vs Fisher {sd_fisher}")
    assert np.all(np.abs(mean - np.asarray(p_true)) < 4.0 * sd)
    assert np.all(np.abs(sd / sd_fisher - 1.0) < 0.5), (sd, sd_fisher)
    print("OK")


if __name__ == "__main__":
    main()
