"""Convention-audit switches for the [M]/[L]-confidence upstream choices.

SURVEY.md Appendix C marks several chomp conventions as guesses (the
reference mount was empty): the delta_v fitting form (C.4), the delta_c
form (B.3), the Scranton 1-halo y-exponent heuristic (C.5), and the
peak-height reporting convention (C.1).  Each is a config switch
(HaloParams sentinel / GridSpec field) so that matching a future
readable source is a parameter change, not a rewrite.  These tests
exercise every setting of every switch.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, default_halo, halo, mass, profiles
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec

TINY = GridSpec(n_mass=128, n_mu=8, sigma_panels=8, sigma_n_per_panel=32,
                n_growth=32, n_dist=32)


# ---------------------------------------------------------------------------
# delta_v sentinels (HaloParams.delta_v).
# ---------------------------------------------------------------------------

def test_delta_v_sentinels(fiducial):
    z = 0.5
    bn = float(profiles.halo_delta_v(fiducial, default_halo(delta_v=-1.0), z))
    ns = float(profiles.halo_delta_v(fiducial, default_halo(delta_v=-2.0), z))
    fx = float(profiles.halo_delta_v(fiducial, default_halo(delta_v=-3.0), z))
    lit = float(profiles.halo_delta_v(fiducial, default_halo(delta_v=200.0), z))
    np.testing.assert_allclose(bn, float(background.delta_v(fiducial, z)),
                               rtol=1e-12)
    np.testing.assert_allclose(ns, float(background.delta_v_ns97(fiducial, z)),
                               rtol=1e-12)
    np.testing.assert_allclose(fx, 18.0 * np.pi**2, rtol=1e-12)
    np.testing.assert_allclose(lit, 200.0, rtol=1e-12)
    # All fits agree in the EdS limit Omega_m(z) -> 1 (z -> inf).
    bn_hi = float(background.delta_v(fiducial, 50.0))
    ns_hi = float(background.delta_v_ns97(fiducial, 50.0))
    np.testing.assert_allclose(bn_hi, 18.0 * np.pi**2, rtol=5e-3)
    np.testing.assert_allclose(ns_hi, 18.0 * np.pi**2, rtol=5e-3)


def test_delta_v_sentinel_propagates_to_profiles(fiducial):
    """Different delta_v conventions move r_vir (and hence y) coherently:
    r_v ∝ delta_v^(-1/3)."""
    m = 1e14
    r_bn = float(profiles.virial_radius(fiducial, default_halo(delta_v=-1.0),
                                        m, 0.5))
    r_fx = float(profiles.virial_radius(fiducial, default_halo(delta_v=-3.0),
                                        m, 0.5))
    dv_bn = float(background.delta_v(fiducial, 0.5))
    np.testing.assert_allclose(r_fx / r_bn,
                               (dv_bn / (18.0 * np.pi**2)) ** (1.0 / 3.0),
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# delta_c sentinels (HaloParams.delta_c).
# ---------------------------------------------------------------------------

def test_delta_c_sentinels(fiducial):
    z = 0.5
    for dc_sent, expected in [
        (-1.0, float(background.delta_c(fiducial, z))),
        (-2.0, float(background.delta_c_ks96(fiducial, z))),
        (-3.0, float(background.DELTA_C_EDS)),
        (1.70, 1.70),
    ]:
        t = mass.build_mass_tables(fiducial, default_halo(delta_c=dc_sent),
                                   z, False, TINY)
        np.testing.assert_allclose(float(t.delta_c), expected, rtol=1e-12)
        # f(nu) renormalization holds for every convention.
        np.testing.assert_allclose(
            float(jnp.sum(t.w_lnm * t.f_nu * t.dnu_dlnm)), 1.0, rtol=1e-10)
        # nu_of_m is consistent with the tables' own threshold.
        j = TINY.n_mass // 2
        np.testing.assert_allclose(
            float(mass.nu_of_m(fiducial, t, float(t.m[j]), False, TINY)),
            float(t.nu[j]), rtol=1e-9)


# ---------------------------------------------------------------------------
# Scranton y-exponent switch (GridSpec.scranton_switch).
# ---------------------------------------------------------------------------

def test_scranton_switch_off(fiducial):
    hp = default_halo()
    hod = default_hod()
    m_on = halo.build_halo_model(fiducial, hp, hod, 0.5, False, TINY)
    g_off = TINY.replace(scranton_switch=False)
    m_off = halo.build_halo_model(fiducial, hp, hod, 0.5, False, g_off)
    k = jnp.asarray([1e-3, 0.1, 1.0, 10.0])
    pp_on = np.asarray(halo.one_halo_integrals(fiducial, hp, m_on, k,
                                               False, TINY)[1])
    pp_off = np.asarray(halo.one_halo_integrals(fiducial, hp, m_off, k,
                                                False, g_off)[1])
    # y <= 1, so the plain-y^2 convention can only lower the 1-halo term.
    assert np.all(pp_off <= pp_on * (1 + 1e-12))
    # k -> 0: y -> 1 and the conventions coincide.
    np.testing.assert_allclose(pp_off[0], pp_on[0], rtol=1e-3)
    # At nonlinear k the difference is real (the switch matters).
    assert pp_off[-1] < 0.9 * pp_on[-1]


# ---------------------------------------------------------------------------
# Peak-height reporting convention (GridSpec.nu_convention).
# ---------------------------------------------------------------------------

def test_nu_convention_compat():
    from chomp_tpu.compat.mass_function import MassFunction

    mf_sq = MassFunction(0.5, grid=TINY)
    mf_li = MassFunction(0.5, grid=TINY.replace(nu_convention="linear"))
    m = 1e13
    nu_sq = float(mf_sq.nu(m))
    nu_li = float(mf_li.nu(m))
    np.testing.assert_allclose(nu_li**2, nu_sq, rtol=1e-12)
    # Round trips in both conventions hit the same mass.
    np.testing.assert_allclose(float(mf_li.mass(nu_li)),
                               float(mf_sq.mass(nu_sq)), rtol=1e-9)
    # f/bias accept convention-consistent arguments.
    np.testing.assert_allclose(float(mf_li.f_nu(nu_li)),
                               float(mf_sq.f_nu(nu_sq)), rtol=1e-12)
    np.testing.assert_allclose(float(mf_li.bias_nu(nu_li)),
                               float(mf_sq.bias_nu(nu_sq)), rtol=1e-12)
    np.testing.assert_allclose(mf_li.nu_min**2, mf_sq.nu_min, rtol=1e-10)


def test_halo_dict_delta_c_passthrough():
    """compat halo dicts accept the new delta_c key (config-level parity
    tuning per VERDICT round-1 item 3)."""
    from chomp_tpu.compat.defaults import halo_from_dict

    hp = halo_from_dict({"delta_c": -2.0, "delta_v": -2.0})
    assert float(hp.delta_c) == -2.0
    assert float(hp.delta_v) == -2.0
