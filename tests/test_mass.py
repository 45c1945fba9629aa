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


# ---------------------------------------------------------------------------
# Tinker 2008/2010 family (mass_fn=1; beyond chomp)
# ---------------------------------------------------------------------------

def test_tinker08_vs_independent_numpy(fiducial):
    """Independent numpy transcription of the published Tinker08/
    Tinker10 formulas against the module's branch (catches assembly/
    convention errors; constants shared by provenance)."""
    h = default_halo(mass_fn=1.0)
    for z in (0.0, 1.0):
        t = mass.build_mass_tables(fiducial, h, z)
        sig = np.asarray(t.delta_c) / np.sqrt(np.asarray(t.nu))
        alpha = 10.0 ** (-(0.75 / np.log10(200.0 / 75.0)) ** 1.2)
        big_a = 0.186 * (1 + z) ** -0.14
        a = 1.47 * (1 + z) ** -0.06
        b = 2.57 * (1 + z) ** -alpha
        f_sig = big_a * ((sig / b) ** -a + 1) * np.exp(-1.19 / sig**2)
        ref_fnu = f_sig / (2.0 * np.asarray(t.nu))
        np.testing.assert_allclose(np.asarray(t.f_nu), ref_fnu,
                                   rtol=1e-12)
        y = np.log10(200.0)
        ee = np.exp(-(4.0 / y) ** 4)
        big_a2 = 1.0 + 0.24 * y * ee
        lit_a = 0.44 * y - 0.88
        big_c = 0.019 + 0.107 * y + 0.19 * ee
        nut = np.sqrt(np.asarray(t.nu))
        ref_b = (1.0 - big_a2 * nut**lit_a / (nut**lit_a + 1.686**lit_a)
                 + 0.183 * nut**1.5 + big_c * nut**2.4)
        np.testing.assert_allclose(np.asarray(t.bias), ref_b, rtol=1e-12)


def test_tinker_abundance_anchor_and_evolution(fiducial):
    """n(>1e14 M_sun/h, z=0) lands on the classic sim-calibrated value
    (~2-3e-5 (h/Mpc)^3 for sigma_8 ~ 0.81), BELOW Sheth-Tormen (whose
    high-mass overprediction motivated Tinker08); abundance falls
    steeply with z; the bias-weighted mass fraction exceeds the
    unweighted one (b > 1 at these masses)."""
    h_t = default_halo(mass_fn=1.0)
    h_s = default_halo()

    def n_above(h, z, m_cut=1e14):
        t = mass.build_mass_tables(fiducial, h, z)
        sel = np.asarray(t.ln_m) > np.log(m_cut)
        return float(jnp.sum(t.w_lnm * t.dndlnm * jnp.asarray(sel)))

    n_t0 = n_above(h_t, 0.0)
    assert 2.0e-5 < n_t0 < 3.4e-5
    assert n_t0 < 0.75 * n_above(h_s, 0.0)
    assert n_above(h_t, 1.0) < 0.35 * n_t0
    t = mass.build_mass_tables(fiducial, h_t, 0.0)
    f_int = float(jnp.sum(t.w_lnm * t.f_nu * t.dnu_dlnm))
    fb_int = float(jnp.sum(t.w_lnm * t.f_nu * t.bias * t.dnu_dlnm))
    assert 0.4 < f_int < 0.75 and fb_int > f_int
    # Norms are pinned to 1 (calibrated amplitudes, no renorm).
    assert float(t.f_norm) == 1.0 and float(t.bias_norm) == 1.0


def test_tinker_halo_model_and_grad(fiducial):
    """The full halo model (HOD sector, n_g, P_gg) runs on the Tinker
    tables, and grads flow through the mass_fn=1 branch."""
    import dataclasses

    from chomp_tpu import halo as halo_mod
    from chomp_tpu.hod import default_hod

    h_t = default_halo(mass_fn=1.0)
    m = halo_mod.build_halo_model(fiducial, h_t, default_hod(), 0.0)
    assert np.isfinite(float(m.n_g)) and float(m.n_g) > 0
    p = halo_mod.power_gg(fiducial, h_t, m, jnp.asarray([0.1, 1.0]))
    assert np.isfinite(np.asarray(p)).all() and np.all(np.asarray(p) > 0)

    def n_above(s8):
        c = dataclasses.replace(fiducial, sigma_8=s8)
        t = mass.build_mass_tables(c, h_t, 0.0)
        sel = jnp.asarray(np.asarray(t.ln_m) > np.log(1e14))
        return jnp.sum(t.w_lnm * t.dndlnm * sel)

    g = float(jax.grad(n_above)(fiducial.sigma_8))
    assert np.isfinite(g) and g > 0
