"""Mass function vs Appendix A.4 goldens + scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import default_halo, mass
from chomp_tpu.params import DEFAULT_GRID
from tests import goldens
from tests.oracle import oracle


def tables(fiducial):
    return mass.build_mass_tables(fiducial, default_halo())


def test_f_norm_golden(fiducial):
    t = tables(fiducial)
    np.testing.assert_allclose(t.f_norm, goldens.f_norm, rtol=1e-6)


def test_bias_raw_golden(fiducial):
    h = default_halo()
    t = tables(fiducial)
    b_raw = mass.bias_raw(h, jnp.asarray(1.0), t.delta_c)
    np.testing.assert_allclose(b_raw, goldens.bias_raw_nu1, rtol=1e-6)


def test_bias_normalization_consistency(fiducial):
    """∫ f b dnu = 1 after normalization (chomp's _bias_norm contract)."""
    t = tables(fiducial)
    integral = mass.integrate_lnm(t, t.f_nu * t.bias * t.dnu_dlnm)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-12)
    f_integral = mass.integrate_lnm(t, t.f_nu * t.dnu_dlnm)
    np.testing.assert_allclose(f_integral, 1.0, rtol=1e-12)


def test_bias_norm_vs_oracle(fiducial):
    t = tables(fiducial)
    np.testing.assert_allclose(t.bias_norm, oracle.bias_norm(), rtol=1e-6)


def test_dndlnm_vs_oracle(fiducial):
    t = tables(fiducial)
    ms = np.array([1e10, 1e11, 1e12, 1e13, 1e14, 1e15])
    ours = np.asarray(mass.dndm(fiducial, t, default_halo(), jnp.asarray(ms))) * ms
    ref = np.array([oracle.dndlnm(m) for m in ms])
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_nu_m_inverse_roundtrip(fiducial):
    t = tables(fiducial)
    ms = jnp.asarray([1e10, 1e12, 1e14, 1e15])
    nus = mass.nu_of_m(fiducial, t, ms)
    back = mass.m_of_nu(t, nus)
    # nu_of_m is exact; m_of_nu is an interpolated inverse (~1e-6 in lnM).
    np.testing.assert_allclose(back, ms, rtol=3e-5)


def test_m_star_golden(fiducial):
    t = tables(fiducial)
    np.testing.assert_allclose(
        t.ln_m_star / np.log(10.0), goldens.log10_mstar, atol=2e-5
    )


def test_f_m_and_bias_m(fiducial):
    h = default_halo()
    t = tables(fiducial)
    m = jnp.asarray(1e13)
    nu = mass.nu_of_m(fiducial, t, m)
    np.testing.assert_allclose(mass.f_m(fiducial, t, h, m), mass.f_nu(t, h, nu),
                               rtol=1e-12)
    np.testing.assert_allclose(mass.bias_m(fiducial, t, h, m),
                               mass.bias_nu(t, h, nu), rtol=1e-12)


def test_mass_tables_at_z1(fiducial):
    """z=1 tables: nu shifts by growth, norms self-consistent
    (BASELINE.json configs[1]: dn/dlnM at z=0 and z=1)."""
    h = default_halo()
    t1 = mass.build_mass_tables(fiducial, h, z=1.0)
    integral = mass.integrate_lnm(t1, t1.f_nu * t1.dnu_dlnm)
    np.testing.assert_allclose(integral, 1.0, rtol=1e-12)
    nus1 = np.array([oracle.nu(m, 1.0) for m in (1e12, 1e14)])
    ours = mass.nu_of_m(fiducial, t1, jnp.asarray([1e12, 1e14]))
    np.testing.assert_allclose(ours, nus1, rtol=1e-5)


def test_convergence_n_mass_doubling(fiducial):
    h = default_halo()
    t = mass.build_mass_tables(fiducial, h, grid=DEFAULT_GRID)
    t2 = mass.build_mass_tables(fiducial, h,
                                grid=DEFAULT_GRID.replace(n_mass=1024))
    # Node-set jitter at the n_mass=256 default: 2.1e-7 measured on
    # f_norm (the exponential cutoff is the hardest integrand), 2e-9 on
    # bias_norm.
    np.testing.assert_allclose(t.f_norm, t2.f_norm, rtol=1e-6)
    np.testing.assert_allclose(t.bias_norm, t2.bias_norm, rtol=1e-7)


def test_jit_grad_through_tables(fiducial):
    import dataclasses

    h = default_halo()

    @jax.jit
    def ng_like(om):
        c = dataclasses.replace(fiducial, omega_m0=om, omega_l0=1.0 - om)
        t = mass.build_mass_tables(c, h)
        return t.f_norm

    g = jax.grad(ng_like)(jnp.asarray(0.278))
    assert np.isfinite(float(g))
