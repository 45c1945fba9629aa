"""Non-fiducial cosmologies vs the generalized oracle.

The golden suite validates only the fiducial point; these tests pin the
w0/wa dark-energy and curvature code paths (and general parameter
shifts) against independent adaptive quadrature — the vmap axis of the
whole framework must be trustworthy away from the fiducial."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, linear
from tests.oracle import oracle

CASES = {
    "wcdm": dict(om=0.30, ob=0.05, h=0.68, s8=0.80, ns=0.97, w0=-0.9, wa=0.0),
    "cpl": dict(om=0.27, ob=0.044, h=0.72, s8=0.83, ns=0.95, w0=-1.1, wa=0.3),
    "open": dict(om=0.28, ob=0.046, h=0.70, s8=0.81, ns=0.96, w0=-1.0,
                 wa=0.0, ol=0.70),
    "shifted": dict(om=0.32, ob=0.05, h=0.65, s8=0.75, ns=1.0),
}


def _cosmo(case):
    from chomp_tpu import default_cosmo

    ol = case.get("ol", 1.0 - case["om"])
    return default_cosmo(
        omega_m0=case["om"], omega_b0=case["ob"], omega_l0=ol,
        h=case["h"], sigma_8=case["s8"], n_s=case["ns"],
        w0=case.get("w0", -1.0), wa=case.get("wa", 0.0))


@pytest.mark.parametrize("name", list(CASES))
def test_background_nonfiducial(name):
    case = CASES[name]
    c = _cosmo(case)
    fns = oracle.cosmo_funcs(**case)
    zs = np.array([0.3, 1.0, 2.5])
    np.testing.assert_allclose(
        background.ez(c, jnp.asarray(zs)),
        np.array([fns["ez"](z) for z in zs]), rtol=1e-12)
    np.testing.assert_allclose(
        background.comoving_distance(c, jnp.asarray(zs)),
        np.array([fns["chi"](z) for z in zs]), rtol=1e-6)
    np.testing.assert_allclose(
        background.growth_factor(c, jnp.asarray(zs)),
        np.array([fns["growth"](z) for z in zs]), rtol=1e-6)


@pytest.mark.parametrize("name", list(CASES))
def test_linear_power_nonfiducial(name):
    case = CASES[name]
    c = _cosmo(case)
    fns = oracle.cosmo_funcs(**case)
    ks = np.array([1e-3, 0.05, 1.0, 30.0])
    np.testing.assert_allclose(
        linear.linear_power(c, jnp.asarray(ks)),
        np.array([fns["pk_lin"](k) for k in ks]), rtol=3e-6)
    np.testing.assert_allclose(
        linear.sigma_m(c, jnp.asarray(1e14)), fns["sigma_m"](1e14), rtol=3e-6)
    # at z > 0 too (growth-scaled)
    np.testing.assert_allclose(
        linear.linear_power(c, jnp.asarray(0.1), z=0.8),
        fns["pk_lin"](0.1, 0.8), rtol=3e-6)


def test_open_universe_distances():
    """Curvature: transverse comoving distance uses sinh for ok > 0."""
    case = CASES["open"]
    c = _cosmo(case)
    chi = background.comoving_distance(c, jnp.asarray(1.5))
    dm = background.transverse_comoving_distance(c, jnp.asarray(1.5))
    ok = 1.0 - case["om"] - case["ol"]
    from chomp_tpu.params import C_OVER_H0
    expected = C_OVER_H0 / np.sqrt(ok) * np.sinh(
        np.sqrt(ok) * float(chi) / C_OVER_H0)
    np.testing.assert_allclose(dm, expected, rtol=1e-10)
    assert float(dm) > float(chi)  # open universe: D_M > chi
