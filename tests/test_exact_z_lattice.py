"""Exact-z lattice Limber (Chebyshev anchor decomposition) — VERDICT
round-1 item 7: the gather-free fast path without the separable-growth
approximation, validated against the per-node exact table route.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import default_halo, limber_fft, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec

# Trimmed lattice: slightly coarser spacing than the flagship (both
# routes inherit the same physics; the lattice trapezoid error at
# dln=0.012 stays well under the 1e-4 assertion), bounds just covering
# the test window — keeps the CPU cost of the halo builds down.
G = GridSpec(n_mass=64, n_mu=8, sigma_panels=8, sigma_n_per_panel=32,
             n_growth=32, n_dist=32, lattice_dln=0.012,
             lattice_k_lo=1e-4, lattice_k_hi=1e4,
             lattice_chi_lo=50.0, lattice_chi_hi=7000.0)


def _win():
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.05), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    return projection.WindowGalaxy(dist=dist)


def test_exact_z_linear_equals_separable(fiducial):
    """For kind='linear_power' the evolution IS separable, so the
    Chebyshev-anchored exact-z route must reproduce the separable
    lattice route almost exactly (anchor interpolation of a constant
    P~ plus the per-node growth scaling) — the machinery test."""
    win = _win()
    ells = np.logspace(1, 3, 8)
    h = default_halo()
    hod = default_hod()
    cl_exact = np.asarray(limber_fft.limber_cl_fft_exact_z(
        fiducial, h, hod, win, win, ells, "linear_power", n_z_anchor=6,
        grid=G))
    p_lat = limber_fft.p_lattice_linear(fiducial, False, G)
    cl_sep = np.asarray(limber_fft.limber_cl_fft(
        fiducial, win, win, ells, p_lat, G))
    np.testing.assert_allclose(cl_exact, cl_sep, rtol=2e-5)


@pytest.mark.slow
def test_exact_z_gg_matches_table_route(fiducial):
    """Full halo-model gg: the J=8 anchored lattice route agrees with
    projection.limber_cl_exact_z (32-node GL, exact per-node halo
    model) to ~1e-5 (measured 1.5e-5 max on this config; asserted at
    1e-4, the BASELINE accuracy bar).  The separable route is >10%
    off for this z~1 kernel pivoted at z=0 — the capability gap this
    closes."""
    win = _win()
    ells = np.logspace(1, 3, 6)
    h = default_halo()
    hod = default_hod()
    cl_table = np.asarray(projection.limber_cl_exact_z(
        fiducial, h, hod, win, win, jnp.asarray(ells), "power_gg",
        n_z=32, grid=G))
    cl_lat = np.asarray(limber_fft.limber_cl_fft_exact_z(
        fiducial, h, hod, win, win, ells, "power_gg", n_z_anchor=8,
        grid=G))
    rel = np.abs(cl_lat / cl_table - 1)
    assert rel.max() < 1e-4, f"max rel {rel.max():.2e}"

    from chomp_tpu import halo as halo_mod

    model0 = halo_mod.build_halo_model(fiducial, h, hod, 0.0, False, G)
    p_lat = limber_fft.p_lattice_halo(fiducial, h, model0, "power_gg",
                                      False, G)
    cl_sep = np.asarray(limber_fft.limber_cl_fft(
        fiducial, win, win, ells, p_lat, G,
        growth_pivot=model0.mass.growth))
    assert np.median(np.abs(cl_sep / cl_table - 1)) > 0.1
