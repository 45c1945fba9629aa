"""Halo-model power spectra vs the independent oracle quadrature path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import default_halo, halo, linear, mass
from chomp_tpu.hod import default_hod
from chomp_tpu.params import DEFAULT_GRID
from tests.oracle import oracle


@pytest.fixture(scope="module")
def model(fiducial_model):
    return fiducial_model


@pytest.mark.slow
def test_n_g_vs_oracle(fiducial, model):
    np.testing.assert_allclose(model.n_g, oracle.n_g(), rtol=2e-5)


def test_powers_vs_oracle(fiducial, model):
    """mm/gm/gg at several k vs adaptive-quad oracle (BASELINE accuracy
    bar is 1e-4; float64 grids should do much better)."""
    h = default_halo()
    ks = np.array([1e-3, 1e-2, 0.1, 1.0, 10.0, 100.0])
    ours = halo.powers(fiducial, h, model, jnp.asarray(ks))
    m_star_val = float(halo.m_star(model.mass)) if hasattr(halo, "m_star") else None
    refs = [oracle.halo_powers(k, m_star_val=float(jnp.exp(model.mass.ln_m_star)))
            for k in ks]
    for key in ("linear_power", "power_mm", "power_gm", "power_gg"):
        ref = np.array([r[key] for r in refs])
        np.testing.assert_allclose(np.asarray(ours[key]), ref, rtol=5e-5,
                                   err_msg=key)


def test_two_halo_low_k_limits(fiducial, model):
    """h_m -> 1 (bias normalization contract) and h_g -> <b_g> as k -> 0,
    so P_mm -> P_lin at large scales."""
    h = default_halo()
    k = jnp.asarray([1e-4])
    h_m, h_g = halo.two_halo_integrals(fiducial, h, model, k)
    np.testing.assert_allclose(h_m[0], 1.0, rtol=1e-4)
    np.testing.assert_allclose(h_g[0], halo.galaxy_bias_avg(model), rtol=1e-4)


def test_one_halo_poisson_limit(fiducial, model):
    """As k -> 0, pp_mm -> ∫ f (M/rho_bar) dnu (halo shot-noise-like
    constant) — finite and positive."""
    h = default_halo()
    pp_mm, pp_gg, pp_gm = halo.one_halo_integrals(fiducial, h, model,
                                                  jnp.asarray([1e-4, 1e-3]))
    assert np.all(np.asarray(pp_mm) > 0)
    np.testing.assert_allclose(pp_mm[0], pp_mm[1], rtol=1e-3)


def test_power_mg_alias(fiducial, model):
    h = default_halo()
    k = jnp.asarray([0.5])
    np.testing.assert_allclose(
        halo.power_gm(fiducial, h, model, k),
        halo.power_mg(fiducial, h, model, k), rtol=0)


def test_powers_at_z(fiducial):
    """Halo model at z=1 builds and has sane limits."""
    h = default_halo()
    m1 = halo.build_halo_model(fiducial, h, default_hod(), z=1.0)
    k = jnp.asarray([1e-3])
    p = halo.powers(fiducial, h, m1, k)
    pp_mm, _, _ = halo.one_halo_integrals(fiducial, h, m1, k)
    # 2-halo limit: P_mm - 1h -> P_lin (h_m -> 1); the 1-halo constant
    # stays finite at low k (standard halo-model behavior).
    np.testing.assert_allclose(
        p["power_mm"][0] - pp_mm[0], p["linear_power"][0], rtol=1e-4)
    h_m, _ = halo.two_halo_integrals(fiducial, h, m1, k)
    np.testing.assert_allclose(h_m[0], 1.0, rtol=1e-4)


def test_exclusion_reduces_power(fiducial, model):
    h = default_halo()
    k = jnp.asarray([0.5, 2.0])
    base = halo.powers(fiducial, h, model, k)
    excl = halo.powers_with_exclusion(fiducial, h, model, k)
    assert np.all(np.asarray(excl["power_gg"]) <= np.asarray(base["power_gg"]))
    # And agrees at very large scales.
    k0 = jnp.asarray([1e-4])
    np.testing.assert_allclose(
        halo.powers_with_exclusion(fiducial, h, model, k0)["power_gg"],
        halo.powers(fiducial, h, model, k0)["power_gg"], rtol=1e-6)


def test_convergence_mass_doubling(fiducial):
    h = default_halo()
    hod = default_hod()
    m1 = halo.build_halo_model(fiducial, h, hod, grid=DEFAULT_GRID)
    m2 = halo.build_halo_model(fiducial, h, hod,
                               grid=DEFAULT_GRID.replace(n_mass=1024))
    k = jnp.asarray([0.1, 1.0, 10.0])
    p1 = halo.powers(fiducial, h, m1, k, grid=DEFAULT_GRID)
    p2 = halo.powers(fiducial, h, m2, k, grid=DEFAULT_GRID.replace(n_mass=1024))
    for key in ("power_mm", "power_gg", "power_gm"):
        # bottoms out at the sigma-quadrature node jitter (~2e-6 at high k)
        np.testing.assert_allclose(p1[key], p2[key], rtol=5e-6, err_msg=key)


def test_jit_grad_through_halo_power(fiducial):
    import dataclasses

    h = default_halo()
    hod = default_hod()

    @jax.jit
    def pgg_at_1(om):
        c = dataclasses.replace(fiducial, omega_m0=om, omega_l0=1.0 - om)
        m = halo.build_halo_model(c, h, hod)
        return halo.power_gg(c, h, m, jnp.asarray([1.0]))[0]

    g = jax.grad(pgg_at_1)(jnp.asarray(0.278))
    assert np.isfinite(float(g)) and float(g) != 0.0
