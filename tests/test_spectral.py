"""Spectral-axis (ell) sharding: library-level shard_map pipeline
(SURVEY.md §5.7) equals the unsharded reference on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import correlation, default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.spectral import make_spectral_pipeline
from chomp_tpu.parallel.sweep import broadcast_cosmo

TINY = GridSpec(n_k=64, n_k_table=256, sigma_panels=4, sigma_n_per_panel=16,
                n_growth=16, n_dist=16, n_mass=64, n_z_proj=16, n_z_lens=16,
                n_ell=64, n_theta=8, n_z_dndz=32, n_mu=8)


def _dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


def test_spectral_sharded_matches_unsharded(fiducial):
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    h = default_halo()
    hod = default_hod()
    dist = _dist()
    theta = np.logspace(-2, 0, TINY.n_theta)

    fn = make_spectral_pipeline(h, hod, dist, mesh, theta_deg=theta,
                                grid=TINY)
    oms = jnp.linspace(0.25, 0.31, 4)
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms,
                            omega_l0=1.0 - oms)
    w_sharded = np.asarray(fn(batch))
    assert w_sharded.shape == (4, TINY.n_theta)

    # Unsharded reference: same table route, full ell grid, fused op.
    from chomp_tpu import halo as halo_mod

    win = projection.WindowGalaxy(dist=dist)
    ells = jnp.asarray(correlation.ell_grid(TINY)[0])

    def one(cosmo):
        model = halo_mod.build_halo_model(cosmo, h, hod, 0.0, False, TINY)
        pt = projection.power_table_halo(cosmo, h, model, "power_gg",
                                         False, TINY)
        cl = projection.limber_cl(cosmo, win, win, ells, pt, TINY)
        return correlation.wtheta_from_cl_fused(cl, theta, TINY, 0.0)

    w_ref = np.asarray(jax.jit(jax.vmap(one))(batch))
    np.testing.assert_allclose(w_sharded, w_ref, rtol=5e-12, atol=1e-16)

    # Divisibility guard.
    import pytest

    bad = Mesh(np.array(jax.devices()[:6]).reshape(2, 3), ("data", "model"))
    with pytest.raises(ValueError, match="not divisible"):
        make_spectral_pipeline(h, hod, dist, bad, grid=TINY)


def test_spectral_sharded_gamma_t(fiducial):
    """J2 (gamma_t) through the spectral-sharded pipeline: the fused
    operator's mu=2 columns shard identically."""
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("data", "model"))
    h = default_halo()
    hod = default_hod()
    dist = _dist()
    theta = np.logspace(-2, 0, TINY.n_theta)
    fn = make_spectral_pipeline(h, hod, dist, mesh, theta_deg=theta,
                                grid=TINY, power_spec="power_gm", mu=2.0)
    oms = jnp.linspace(0.26, 0.30, 4)
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms,
                            omega_l0=1.0 - oms)
    gt = np.asarray(fn(batch))
    assert gt.shape == (4, TINY.n_theta)
    assert np.all(np.isfinite(gt))


def test_global_mesh_sweep_divisibility_guard():
    """Single-process use of global_mesh_sweep still validates the
    batch/device divisibility."""
    import pytest

    from chomp_tpu import default_cosmo
    from chomp_tpu.parallel.multihost import global_mesh_sweep
    from chomp_tpu.parallel.sweep import broadcast_cosmo

    batch = broadcast_cosmo(default_cosmo(),
                            omega_m0=jnp.linspace(0.25, 0.3, 5))
    with pytest.raises(ValueError, match="not divisible"):
        global_mesh_sweep(lambda c: c.omega_m0, batch)
