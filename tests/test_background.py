"""Background cosmology vs SURVEY.md Appendix A.1 goldens + scipy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background
from tests import goldens
from tests.oracle import oracle

RTOL = 1e-6  # float64 grid quadrature vs adaptive-quad oracle


def test_comoving_distance_goldens(fiducial):
    # SURVEY.md Appendix A.1
    chi = background.comoving_distance(fiducial, jnp.array([0.5, 1.0]))
    np.testing.assert_allclose(chi[0], goldens.chi_05, rtol=RTOL)
    np.testing.assert_allclose(chi[1], goldens.chi_10, rtol=RTOL)


def test_comoving_distance_vs_oracle(fiducial):
    zs = np.array([0.05, 0.3, 0.77, 1.5, 3.0])
    ours = background.comoving_distance(fiducial, jnp.asarray(zs))
    ref = np.array([oracle.chi(z) for z in zs])
    np.testing.assert_allclose(ours, ref, rtol=RTOL)


def test_growth_golden(fiducial):
    d = background.growth_factor(fiducial, 1.0)
    np.testing.assert_allclose(d, goldens.growth_1, rtol=RTOL)


def test_growth_vs_oracle(fiducial):
    zs = np.array([0.0, 0.25, 1.0, 2.0, 5.0])
    ours = background.growth_factor(fiducial, jnp.asarray(zs))
    ref = np.array([oracle.growth(z) for z in zs])
    np.testing.assert_allclose(ours, ref, rtol=RTOL)
    assert float(ours[0]) == pytest.approx(1.0, rel=1e-12)


def test_delta_c_golden(fiducial):
    np.testing.assert_allclose(
        background.delta_c(fiducial, 0.0), goldens.delta_c0, rtol=RTOL
    )


def test_delta_v_matches_oracle(fiducial):
    for z in (0.0, 1.0):
        np.testing.assert_allclose(
            background.delta_v(fiducial, z), oracle.delta_v_fn(z), rtol=RTOL
        )


def test_e_and_omegas(fiducial):
    z = jnp.asarray([0.0, 1.3])
    np.testing.assert_allclose(
        background.ez(fiducial, z),
        np.array([oracle.ez(0.0), oracle.ez(1.3)]),
        rtol=1e-12,
    )
    om = background.omega_m_z(fiducial, 0.0)
    ol = background.omega_l_z(fiducial, 0.0)
    np.testing.assert_allclose(om + ol, 1.0, rtol=1e-10)


def test_distances_flat_relations(fiducial):
    z = jnp.asarray(0.8)
    chi = background.comoving_distance(fiducial, z)
    np.testing.assert_allclose(
        background.angular_diameter_distance(fiducial, z), chi / 1.8, rtol=1e-12
    )
    np.testing.assert_allclose(
        background.luminosity_distance(fiducial, z), chi * 1.8, rtol=1e-12
    )


def test_growth_convergence_order_doubling(fiducial):
    """Quadrature-order doubling check (SURVEY.md §7: convergence is a
    test-suite property, not runtime adaptivity)."""
    z = jnp.asarray([0.0, 1.0, 3.0])
    d64 = background.growth_factor(fiducial, z, n=64)
    d128 = background.growth_factor(fiducial, z, n=128)
    np.testing.assert_allclose(d64, d128, rtol=1e-10)


def test_jit_and_grad(fiducial):
    import dataclasses

    f = jax.jit(lambda c, z: background.growth_factor(c, z))
    np.testing.assert_allclose(
        f(fiducial, 1.0), background.growth_factor(fiducial, 1.0), rtol=1e-12
    )

    def d_of_om(om):
        c = dataclasses.replace(fiducial, omega_m0=om, omega_l0=1.0 - om)
        return background.growth_factor(c, 1.0)

    g = jax.grad(d_of_om)(jnp.asarray(0.278))
    assert np.isfinite(float(g)) and float(g) != 0.0
    # Check against central difference.
    eps = 1e-5
    fd = (d_of_om(jnp.asarray(0.278 + eps)) - d_of_om(jnp.asarray(0.278 - eps))) / (
        2 * eps
    )
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_vmap_over_cosmologies(fiducial):
    """vmap-consistency: batched == loop of unbatched (SURVEY.md §4b)."""
    import dataclasses

    oms = jnp.asarray([0.25, 0.278, 0.31])
    batch = dataclasses.replace(
        fiducial,
        omega_m0=oms,
        omega_l0=1.0 - oms,
        **{f.name: jnp.broadcast_to(getattr(fiducial, f.name), oms.shape)
           for f in dataclasses.fields(fiducial)
           if f.name not in ("omega_m0", "omega_l0")},
    )
    batched = jax.vmap(lambda c: background.growth_factor(c, 1.0))(batch)
    for i, om in enumerate([0.25, 0.278, 0.31]):
        single = background.growth_factor(
            dataclasses.replace(fiducial, omega_m0=jnp.asarray(om),
                                omega_l0=jnp.asarray(1.0 - om)), 1.0)
        np.testing.assert_allclose(batched[i], single, rtol=1e-12)


def test_growth_ode_matches_integral_for_lcdm(fiducial):
    """For w = -1 the integral formula is exact: the ODE solution must
    agree (independent derivation — ODE + RK4 vs quadrature)."""
    zs = jnp.asarray([0.0, 0.5, 1.0, 2.0])
    d_int = background.growth_factor(fiducial, zs)
    d_ode = background.growth_factor_exact(fiducial, zs, n_steps=2048)
    np.testing.assert_allclose(np.asarray(d_ode), np.asarray(d_int),
                               rtol=3e-5)


def test_growth_ode_cpl_deviation_is_physical(fiducial):
    """For CPL dark energy the integral formula is approximate; the ODE
    deviates by a small but nonzero amount (the physics being added)."""
    import dataclasses

    cpl = dataclasses.replace(fiducial, w0=jnp.asarray(-1.2),
                              wa=jnp.asarray(0.5))
    zs = jnp.asarray([0.5, 1.0])
    d_int = np.asarray(background.growth_factor(cpl, zs))
    d_ode = np.asarray(background.growth_factor_exact(cpl, zs, n_steps=2048))
    rel = np.abs(d_ode / d_int - 1.0)
    assert np.all(rel < 0.05)    # same physics to a few %
    assert np.any(rel > 1e-4)    # ...but genuinely different
    # ODE normalization contract.
    np.testing.assert_allclose(
        background.growth_factor_exact(cpl, jnp.asarray(0.0)), 1.0,
        rtol=1e-10)


def test_z_of_chi_newton_roundtrip(fiducial):
    """Gather-free Newton chi->z inversion: chi(z_of_chi(chi)) == chi to
    roundoff across cosmologies far from the seed (the inversion behind
    the lattice window stage — replaced a jnp.interp dynamic gather)."""
    import dataclasses

    chi = jnp.asarray(np.logspace(0.5, np.log10(6500.0), 64))
    for om in (0.15, 0.278, 0.45):
        c = dataclasses.replace(fiducial, omega_m0=jnp.asarray(om),
                                omega_l0=jnp.asarray(1.0 - om))
        z = background.z_of_chi(c, chi)
        chi_back = background.comoving_distance(c, z)
        np.testing.assert_allclose(np.asarray(chi_back), np.asarray(chi),
                                   rtol=1e-10)
    # CPL dark energy too.
    cpl = dataclasses.replace(fiducial, w0=jnp.asarray(-1.2),
                              wa=jnp.asarray(0.4))
    z = background.z_of_chi(cpl, chi)
    np.testing.assert_allclose(np.asarray(background.comoving_distance(cpl, z)),
                               np.asarray(chi), rtol=1e-10)
