"""Baryon-feedback knobs (CosmoParams.bary_c / bary_eta / a_mod).

HMcode-style matter-profile modification (concentration rescale + nu^eta
halo bloating, Mead et al. 2015's response parametrization applied to
THIS framework's chomp-convention halo model) plus the Amon &
Efstathiou 2022 A_mod linear/nonlinear interpolation on mm legs.

Referees:
  - EXACT (bitwise) reduction to the baseline at the default knobs
    through powers / exclusion / tomographic / halofit;
  - profile physics invariants: y(k->0, M) = 1 (mass conservation, so
    P_mm(k->0) is feedback-independent), suppression localized to the
    1-halo regime, monotone in bary_c;
  - the a_mod identity P + (a-1)(P - P_lin) checked against a manual
    evaluation, a_mod = 0 collapsing power_mm to linear exactly;
  - scope: gg legs bitwise UNTOUCHED by the profile knobs;
  - gradient cleanliness at the defaults (nonzero d/d a_mod and
    d/d bary_c — the no-op form must not where-trap them).

upstream: no counterpart (chomp has no feedback model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import halo, linear, nlpower
from chomp_tpu.hod import default_hod
from chomp_tpu.params import default_cosmo, default_halo
from chomp_tpu.utils.tree import replace

C0 = default_cosmo()
HP = default_halo()
K = jnp.logspace(-3, 1.7, 40)
Z = 0.4


@pytest.fixture(scope="module")
def model0():
    return halo.build_halo_model(C0, HP, default_hod(), Z)


def _model(cosmo):
    return halo.build_halo_model(cosmo, HP, default_hod(), Z)


def test_default_knobs_bitwise_noop(model0):
    """bary_c=1, bary_eta=0, a_mod=1 as EXPLICIT arrays leave every
    spectrum bitwise unchanged (x*1.0, nu**0.0 and +0.0 are IEEE-exact;
    no branch guards needed)."""
    cb = replace(C0, bary_c=jnp.asarray(1.0), bary_eta=jnp.asarray(0.0),
                 a_mod=jnp.asarray(1.0))
    pa = halo.powers(C0, HP, model0, K)
    pb = halo.powers(cb, HP, _model(cb), K)
    for key in pa:
        assert np.array_equal(np.asarray(pa[key]), np.asarray(pb[key])), key
    ea = halo.powers_with_exclusion(C0, HP, model0, K)
    eb = halo.powers_with_exclusion(cb, HP, _model(cb), K)
    for key in ea:
        assert np.array_equal(np.asarray(ea[key]), np.asarray(eb[key])), key
    assert np.array_equal(np.asarray(nlpower.halofit_power(C0, K, Z)),
                          np.asarray(nlpower.halofit_power(cb, K, Z)))


def test_profile_knobs_physics(model0):
    """Mass conservation pins P_mm at k->0; feedback suppresses the
    1-halo regime; monotone in bary_c; bloating eta > 0 suppresses."""
    p0 = np.asarray(halo.powers(C0, HP, model0, K)["power_mm"])
    cb = replace(C0, bary_c=jnp.asarray(0.7))
    pb = np.asarray(halo.powers(cb, HP, _model(cb), K)["power_mm"])
    ratio = pb / p0
    # k -> 0: y -> 1 for any concentration, P_mm unchanged to quadrature
    # noise.
    np.testing.assert_allclose(ratio[0], 1.0, atol=1e-6)
    # Deep 1-halo (k ~ 10-50): suppressed by several percent.
    assert np.min(ratio) < 0.93
    assert np.all(ratio <= 1.0 + 1e-9)
    # Monotone in bary_c at a 1-halo scale.
    k1 = jnp.asarray([5.0])
    vals = []
    for bc in (1.0, 0.9, 0.8, 0.7):
        c = replace(C0, bary_c=jnp.asarray(bc))
        vals.append(float(halo.powers(c, HP, _model(c), k1)["power_mm"][0]))
    assert all(a > b for a, b in zip(vals, vals[1:]))
    # Bloating: eta > 0 evaluates high-nu halos at higher k -> smaller y
    # -> suppression at 1-halo scales, k->0 pinned.
    ce = replace(C0, bary_eta=jnp.asarray(0.3))
    pe = np.asarray(halo.powers(ce, HP, _model(ce), K)["power_mm"])
    np.testing.assert_allclose(pe[0] / p0[0], 1.0, atol=1e-6)
    assert np.min(pe / p0) < 0.97
    # gm responds too (matter factor carries feedback), gg does not.
    pgm0 = np.asarray(halo.powers(C0, HP, model0, K)["power_gm"])
    pall = halo.powers(cb, HP, _model(cb), K)
    assert np.max(np.abs(np.asarray(pall["power_gm"]) / pgm0 - 1)) > 0.01
    pgg0 = np.asarray(halo.powers(C0, HP, model0, K)["power_gg"])
    assert np.array_equal(np.asarray(pall["power_gg"]), pgg0)


def test_a_mod_identity(model0):
    """a_mod is exactly P + (a-1)(P - P_lin) on mm, on both routes;
    a_mod = 0 gives linear exactly."""
    a = 0.75
    ca = replace(C0, a_mod=jnp.asarray(a))
    p0 = halo.powers(C0, HP, model0, K)
    pa = halo.powers(ca, HP, _model(ca), K)
    want = np.asarray(p0["power_mm"]) + (a - 1.0) * (
        np.asarray(p0["power_mm"]) - np.asarray(p0["linear_power"]))
    np.testing.assert_allclose(np.asarray(pa["power_mm"]), want, rtol=1e-12)
    # gm/gg untouched by a_mod.
    assert np.array_equal(np.asarray(pa["power_gm"]),
                          np.asarray(p0["power_gm"]))
    assert np.array_equal(np.asarray(pa["power_gg"]),
                          np.asarray(p0["power_gg"]))
    # a_mod = 0 collapses mm to the linear power bitwise-exactly in the
    # identity (P + (0-1)(P - P_lin) = P_lin up to rounding).
    cz = replace(C0, a_mod=jnp.asarray(0.0))
    pz = halo.powers(cz, HP, _model(cz), K)
    np.testing.assert_allclose(np.asarray(pz["power_mm"]),
                               np.asarray(pz["linear_power"]), rtol=1e-10)
    # halofit route.
    h0 = np.asarray(nlpower.halofit_power(C0, K, Z))
    ha = np.asarray(nlpower.halofit_power(ca, K, Z))
    plin = np.asarray(linear.linear_power(C0, K, Z, species="m"))
    np.testing.assert_allclose(ha, h0 + (a - 1.0) * (h0 - plin), rtol=1e-12)


def test_tomographic_mm_gets_knobs(model0):
    cb = replace(C0, bary_c=jnp.asarray(0.7), a_mod=jnp.asarray(0.9))
    hods = [default_hod(), default_hod(log10_m_min=12.4)]
    ms0 = halo.build_halo_models(C0, HP, hods, Z)
    msb = halo.build_halo_models(cb, HP, hods, Z)
    t0 = halo.tomographic_powers(C0, HP, ms0, K)
    tb = halo.tomographic_powers(cb, HP, msb, K)
    assert np.max(np.abs(np.asarray(tb["power_mm"])
                         / np.asarray(t0["power_mm"]) - 1)) > 0.01
    # Auto gg blocks bitwise unchanged (profile knobs are matter-only,
    # a_mod is mm-only).
    assert np.array_equal(np.asarray(tb[("power_gg", 0, 0)]),
                          np.asarray(t0[("power_gg", 0, 0)]))


def test_gradients_at_defaults(model0):
    """The no-op defaults must keep NONZERO, finite gradients — the
    whole point of the (a-1)/pow-form no-ops over where-guards."""
    k = jnp.asarray([2.0])

    def pmm(c):
        return halo.powers(c, HP, _model(c), k)["power_mm"][0]

    for name in ("a_mod", "bary_c"):
        g = jax.grad(lambda v, n=name: pmm(replace(C0, **{n: v})))(
            jnp.asarray(1.0))
        assert np.isfinite(float(g)) and float(g) != 0.0, name
    g_eta = jax.grad(lambda v: pmm(replace(C0, bary_eta=v)))(jnp.asarray(0.0))
    assert np.isfinite(float(g_eta)) and float(g_eta) != 0.0
    # And vmap over a knob batch including the default.
    f = jax.vmap(lambda bc: pmm(replace(C0, bary_c=bc)))
    out = np.asarray(f(jnp.asarray([1.0, 0.8, 0.6])))
    assert np.all(np.isfinite(out)) and out[0] > out[1] > out[2]
