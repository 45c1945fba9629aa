"""NFW profile y(k, M) vs Appendix A.6 goldens + scipy oracle."""

import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, default_halo, mass, profiles
from tests import goldens
from tests.oracle import oracle


def test_y_nfw_goldens(fiducial):
    h = default_halo()
    t = mass.build_mass_tables(fiducial, h)
    m_star = mass.m_star(t)
    for (k, m), golden in zip(goldens.y_nfw_km, goldens.y_nfw):
        y = profiles.y_nfw(fiducial, h, jnp.asarray(k), jnp.asarray(m), m_star)
        np.testing.assert_allclose(y, golden, rtol=3e-5)


def test_y_nfw_dense_vs_oracle(fiducial):
    h = default_halo()
    t = mass.build_mass_tables(fiducial, h)
    m_star = mass.m_star(t)
    ks = np.logspace(-3, 2.5, 40)
    ms = np.logspace(10, 16, 13)
    ours = np.asarray(profiles.y_nfw(
        fiducial, h, jnp.asarray(ks)[:, None], jnp.asarray(ms)[None, :], m_star))
    # Oracle concentration uses its own M*; align by passing ours through.
    ref = np.empty_like(ours)
    for j, m in enumerate(ms):
        rho_bar = oracle.RHO_CRIT * oracle.OM
        rv = (3 * m / (4 * np.pi * rho_bar * oracle.delta_v_fn(0.0))) ** (1 / 3)
        c = 9.0 * (m / float(m_star)) ** (-0.13)
        rs = rv / c
        from scipy.special import sici
        krs = ks * rs
        si1, ci1 = sici((1 + c) * krs)
        si0, ci0 = sici(krs)
        mu = np.log(1 + c) - c / (1 + c)
        ref[:, j] = (np.sin(krs) * (si1 - si0) - np.sin(c * krs) / ((1 + c) * krs)
                     + np.cos(krs) * (ci1 - ci0)) / mu
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_y_limits(fiducial):
    """y -> 1 as k -> 0; y decreasing in k at fixed M."""
    h = default_halo()
    t = mass.build_mass_tables(fiducial, h)
    m_star = mass.m_star(t)
    y_small = profiles.y_nfw(fiducial, h, jnp.asarray(1e-5), jnp.asarray(1e14),
                             m_star)
    np.testing.assert_allclose(y_small, 1.0, rtol=1e-8)
    ks = jnp.asarray(np.logspace(-2, 2, 30))
    y = np.asarray(profiles.y_nfw(fiducial, h, ks, jnp.asarray(1e14), m_star))
    assert np.all(np.diff(y) < 0)


def test_virial_roundtrip_and_delta_v_override(fiducial):
    h = default_halo()
    rv = profiles.virial_radius(fiducial, h, jnp.asarray(1e14))
    m_back = profiles.virial_mass(fiducial, h, rv)
    np.testing.assert_allclose(m_back, 1e14, rtol=1e-12)
    # delta_v = -1 -> cosmology's BN98 value.
    np.testing.assert_allclose(
        profiles.halo_delta_v(fiducial, h), background.delta_v(fiducial, 0.0),
        rtol=1e-14)
    # Explicit positive delta_v is honored.
    import dataclasses
    h200 = dataclasses.replace(h, delta_v=jnp.asarray(200.0))
    np.testing.assert_allclose(profiles.halo_delta_v(fiducial, h200), 200.0,
                               rtol=1e-14)


def test_concentration_redshift_scaling(fiducial):
    h = default_halo()
    c0 = profiles.concentration(h, jnp.asarray(1e13), jnp.asarray(10.0**12.527))
    c1 = profiles.concentration(h, jnp.asarray(1e13), jnp.asarray(10.0**12.527),
                                z=1.0)
    np.testing.assert_allclose(c1, c0 / 2.0, rtol=1e-12)
