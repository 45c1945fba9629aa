"""Gradient-based cosmology fitting — a capability the reference lacks.

The entire pipeline (EH98 transfer -> Sheth-Tormen -> halo model ->
Limber -> FFTLog Hankel) is differentiable, so chi^2 minimization uses
exact gradients instead of MCMC random walks.

Run:  python examples/fit_example.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import dataclasses

import jax
import jax.numpy as jnp

from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import make_inference_step, make_pipeline

grid = GridSpec(n_mass=256, lattice_dln=0.016, n_ell=512, n_theta=16)
dist = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
    z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
fn = make_pipeline(default_halo(), default_hod(), dist, grid=grid,
                   include_lensing=False)
fiducial = default_cosmo()


def observable(om):
    c = dataclasses.replace(fiducial, omega_m0=om, omega_l0=1.0 - om)
    return fn(c)["w_theta"]


data = observable(jnp.asarray(0.278))            # mock data at truth
invcov = jnp.eye(data.shape[0]) / 1e-8
init, step = make_inference_step(observable, data, invcov, learning_rate=2e-3)

params = jnp.asarray(0.32)                       # start away from truth
opt_state = init(params)
for i in range(25):
    params, opt_state, loss = step(params, opt_state)
    if i % 5 == 0:
        print(f"step {i:2d}: omega_m = {float(params):.4f}  chi2 = {float(loss):.3e}")
print(f"recovered omega_m = {float(params):.4f} (truth 0.2780)")
