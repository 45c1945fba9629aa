"""Sweep layer: vmap consistency, mesh sharding, inference step, dryrun."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import (
    broadcast_cosmo,
    make_inference_step,
    make_pipeline,
    sweep,
)

TINY = GridSpec(n_k=64, n_k_table=256, sigma_panels=4, sigma_n_per_panel=16,
                n_growth=16, n_dist=16, n_mass=64, n_z_proj=16, n_z_lens=16,
                n_ell=64, n_theta=8, n_z_dndz=32, n_mu=8)


def dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


def test_broadcast_cosmo(fiducial):
    oms = jnp.asarray([0.25, 0.3])
    b = broadcast_cosmo(fiducial, omega_m0=oms, omega_l0=1.0 - oms)
    assert b.omega_m0.shape == (2,)
    assert b.sigma_8.shape == (2,)
    np.testing.assert_allclose(b.sigma_8[0], fiducial.sigma_8)


@pytest.mark.slow
def test_sweep_vmap_equals_loop(fiducial):
    fn = make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                       include_lensing=False)
    oms = jnp.asarray([0.26, 0.278, 0.30])
    batch = broadcast_cosmo(fiducial, omega_m0=oms, omega_l0=1.0 - oms)
    out = sweep(fn, batch)
    for i, om in enumerate([0.26, 0.278, 0.30]):
        single = fn(dataclasses.replace(
            fiducial, omega_m0=jnp.asarray(om), omega_l0=jnp.asarray(1 - om)))
        np.testing.assert_allclose(out["w_theta"][i], single["w_theta"],
                                   rtol=1e-10)


def test_sweep_sharded_matches_unsharded(fiducial):
    """8-device virtual CPU mesh: sharded == unsharded (SURVEY.md §5.8)."""
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 virtual devices, got {n_dev}"
    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    fn = make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                       include_lensing=False)
    oms = jnp.linspace(0.25, 0.31, 8)
    batch = broadcast_cosmo(fiducial, omega_m0=oms, omega_l0=1.0 - oms)
    plain = sweep(fn, batch)
    sharded = sweep(fn, batch, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded["w_theta"]),
                               np.asarray(plain["w_theta"]), rtol=1e-8)


@pytest.mark.slow
def test_inference_step_descends(fiducial):
    """One adam step on omega_m0 decreases chi^2 toward mock data."""
    fn = make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                       include_lensing=False,
                       theta_deg=np.logspace(-2, 0, 8))

    def observable(om):
        c = dataclasses.replace(fiducial, omega_m0=om, omega_l0=1.0 - om)
        return fn(c)["w_theta"]

    data = observable(jnp.asarray(0.278))
    invcov = jnp.eye(data.shape[0]) / 1e-8
    init, step = make_inference_step(observable, data, invcov,
                                     learning_rate=1e-3)
    params = jnp.asarray(0.30)
    opt_state = init(params)
    losses = []
    for _ in range(3):
        params, opt_state, val = step(params, opt_state)
        losses.append(float(val))
    assert losses[-1] < losses[0]
    assert 0.25 < float(params) < 0.31


@pytest.mark.slow
def test_dryrun_multichip_runs():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_pytree_io_roundtrip(tmp_path, fiducial):
    from chomp_tpu.utils.io import load_pytree, save_pytree

    oms = jnp.asarray([0.25, 0.3])
    batch = broadcast_cosmo(fiducial, omega_m0=oms, omega_l0=1.0 - oms)
    path = tmp_path / "chunk.npz"
    save_pytree(path, batch)
    back = load_pytree(path, batch)
    np.testing.assert_allclose(np.asarray(back.omega_m0),
                               np.asarray(batch.omega_m0), rtol=0)
    np.testing.assert_allclose(np.asarray(back.sigma_8),
                               np.asarray(batch.sigma_8), rtol=0)


@pytest.mark.slow
def test_sweep_chunked_resumable(tmp_path, fiducial):
    """Chunked sweep writes per-chunk npz atomically and resumes by
    skipping existing chunks (the stateless-recovery contract)."""
    import os

    from chomp_tpu.parallel.sweep import read_chunks, sweep_chunked

    fn = make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                       include_lensing=False)
    oms = jnp.linspace(0.25, 0.31, 6)
    batch = broadcast_cosmo(fiducial, omega_m0=oms, omega_l0=1.0 - oms)
    out = tmp_path / "chunks"
    paths = sweep_chunked(fn, batch, out, chunk_size=2)
    assert len(paths) == 3 and all(os.path.exists(p) for p in paths)
    full = read_chunks(paths)
    assert full["w_theta"].shape == (6, TINY.n_theta)
    # Resume: delete one chunk, corrupt nothing else; only it re-runs.
    os.remove(paths[1])
    mtimes = {p: os.path.getmtime(p) for p in (paths[0], paths[2])}
    paths2 = sweep_chunked(fn, batch, out, chunk_size=2)
    assert paths2 == paths and os.path.exists(paths[1])
    assert all(os.path.getmtime(p) == mtimes[p] for p in mtimes)
    full2 = read_chunks(paths2)
    np.testing.assert_allclose(full2["w_theta"], full["w_theta"], rtol=1e-12)
    # A different input batch maps to different chunk files (the path tag
    # hashes the input slice) — stale chunks are never silently reused.
    oms_p = jnp.asarray([0.26, 0.305])
    batch_p = broadcast_cosmo(fiducial, omega_m0=oms_p, omega_l0=1.0 - oms_p)
    paths3 = sweep_chunked(fn, batch_p, out, chunk_size=2)
    assert not set(paths3) & set(paths)


def test_separable_growth_warning():
    """Deep kernel (z_bar ~ 1) with z_pivot=0 and no exact-z anchors
    fires the separable-growth bias warning (VERDICT round-2 weak #6);
    exact-z mode and a matched pivot stay silent."""
    import warnings

    with pytest.warns(UserWarning, match="separable growth"):
        make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                      include_lensing=False)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                      include_lensing=False, z_pivot=1.0)
        make_pipeline(default_halo(), default_hod(), dist(), grid=TINY,
                      include_lensing=False, exact_z_anchors=4)
