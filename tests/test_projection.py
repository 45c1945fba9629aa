"""dN/dz, windows, Limber C_ell vs Appendix A.5 goldens + oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import projection
from chomp_tpu.params import DEFAULT_GRID
from tests import goldens
from tests.oracle import oracle


def gauss_dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


def test_dndz_normalization():
    d = gauss_dist()
    z = jnp.linspace(0.0, 2.0, 20001)
    p = projection.dndz(d, z)
    np.testing.assert_allclose(np.trapezoid(np.asarray(p), np.asarray(z)),
                               1.0, rtol=1e-6)
    # Matches the oracle's normalized p(z).
    np.testing.assert_allclose(projection.dndz(d, jnp.asarray(0.8)),
                               oracle.fz(0.8), rtol=1e-9)
    # Zero outside support.
    assert float(projection.dndz(d, jnp.asarray(2.5))) == 0.0


def test_dndz_maglim_and_interp():
    d = projection.DNdzMagLim(z_min=jnp.asarray(0.0), z_max=jnp.asarray(3.0),
                              a=jnp.asarray(2.0), z0=jnp.asarray(0.5),
                              b=jnp.asarray(1.5))
    z = jnp.linspace(0.0, 3.0, 10001)
    p = np.asarray(projection.dndz(d, z))
    np.testing.assert_allclose(np.trapezoid(p, np.asarray(z)), 1.0, rtol=1e-6)
    # Tabulated version of the same shape agrees.
    di = projection.DNdzInterpolation(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(3.0),
        z_array=z, n_array=jnp.asarray(p))
    np.testing.assert_allclose(projection.dndz(di, jnp.asarray(1.1)),
                               projection.dndz(d, jnp.asarray(1.1)), rtol=1e-5)


def test_window_galaxy_integrates_to_one(fiducial):
    """∫ W_g dchi = 1 (Appendix B.8 normalization)."""
    win = projection.WindowGalaxy(dist=gauss_dist())
    z = jnp.linspace(1e-4, 2.0, 4001)
    w = win.window_z(fiducial, z)
    from chomp_tpu import background
    chi = background.comoving_distance(fiducial, z)
    total = np.trapezoid(np.asarray(w), np.asarray(chi))
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)


def test_window_kappa_vs_oracle(fiducial):
    win = projection.WindowConvergence(dist=gauss_dist())
    zs = np.array([0.1, 0.3, 0.5, 0.9])
    ours = win.window_z(fiducial, jnp.asarray(zs))
    ref = np.array([oracle.window_kappa_z(z) for z in zs])
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_cl_clustering_goldens(fiducial):
    """Appendix A.5 (errata-corrected) C_ell goldens, linear clustering."""
    win = projection.WindowGalaxy(dist=gauss_dist())
    pt = projection.power_table_linear(fiducial)
    cl = projection.limber_cl(fiducial, win, win, jnp.asarray(goldens.cl_ells), pt)
    np.testing.assert_allclose(cl, np.array(goldens.cl), rtol=2e-5)


def test_cl_lensing_cross_vs_oracle(fiducial):
    """kappa x galaxy Limber cross-spectrum vs oracle (configs[3])."""
    wg = projection.WindowGalaxy(dist=gauss_dist())
    wk = projection.WindowConvergence(dist=gauss_dist())
    ells = np.array([10.0, 100.0, 1000.0])
    pt = projection.power_table_linear(fiducial)
    ours = projection.limber_cl(fiducial, wk, wg, jnp.asarray(ells), pt)
    ref = np.array([oracle.cl_limber_general(
        ell, oracle.window_kappa_z, oracle.window_galaxy_z) for ell in ells])
    np.testing.assert_allclose(ours, ref, rtol=5e-5)


def test_cl_kappa_kappa_positive_and_decreasing(fiducial):
    wk = projection.WindowConvergence(dist=gauss_dist())
    pt = projection.power_table_linear(fiducial)
    ells = jnp.asarray(np.logspace(1, 4, 10))
    cl = np.asarray(projection.limber_cl(fiducial, wk, wk, ells, pt))
    assert np.all(cl > 0)
    assert np.all(np.diff(cl) < 0)


def test_z_bar(fiducial):
    win = projection.WindowGalaxy(dist=gauss_dist())
    zb = projection.z_bar(fiducial, win, win)
    # For the symmetric Gaussian at z0=1, z_bar ~ 1 (small distance tilt).
    assert 0.9 < float(zb) < 1.05


def test_cl_convergence_order_doubling(fiducial):
    win = projection.WindowGalaxy(dist=gauss_dist())
    pt = projection.power_table_linear(fiducial)
    ells = jnp.asarray([10.0, 1000.0])
    a = projection.limber_cl(fiducial, win, win, ells, pt, grid=DEFAULT_GRID)
    b = projection.limber_cl(fiducial, win, win, ells, pt,
                             grid=DEFAULT_GRID.replace(n_z_proj=256))
    np.testing.assert_allclose(a, b, rtol=1e-7)


def test_cl_halo_power_table(fiducial):
    """Limber with the halo-model gg table vs oracle halo C_ell."""
    from chomp_tpu import default_halo, halo
    from chomp_tpu.hod import default_hod

    h = default_halo()
    model = halo.build_halo_model(fiducial, h, default_hod())
    pt = projection.power_table_halo(fiducial, h, model, "power_gg")
    win = projection.WindowGalaxy(dist=gauss_dist())
    ells = np.array([100.0, 1000.0])
    ours = projection.limber_cl(fiducial, win, win, jnp.asarray(ells), pt)

    from scipy.interpolate import CubicSpline
    ks = np.logspace(-5, 4, 600)
    pk = np.asarray(halo.powers(fiducial, h, model, jnp.asarray(ks))["power_gg"])
    spl = CubicSpline(np.log(ks), np.log(pk))
    ref = np.array([oracle.cl_limber(ell, pk_z0=lambda k: np.exp(spl(np.log(k))))
                    for ell in ells])
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_jit_and_grad_cl(fiducial):
    import dataclasses

    win = projection.WindowGalaxy(dist=gauss_dist())

    @jax.jit
    def cl100(om):
        c = dataclasses.replace(fiducial, omega_m0=om, omega_l0=1.0 - om)
        pt = projection.power_table_linear(c)
        return projection.limber_cl(c, win, win, jnp.asarray([100.0]), pt)[0]

    g = jax.grad(cl100)(jnp.asarray(0.278))
    assert np.isfinite(float(g)) and float(g) != 0.0


@pytest.mark.slow
def test_limber_exact_z_linear_anchor(fiducial):
    """Exact-z Limber == separable path for linear power (growth IS
    separable), anchoring the non-separable machinery."""
    from chomp_tpu import default_halo
    from chomp_tpu.hod import default_hod

    win = projection.WindowGalaxy(dist=gauss_dist())
    ells = jnp.asarray([10.0, 100.0, 1000.0])
    pt = projection.power_table_linear(fiducial)
    cl_sep = projection.limber_cl(fiducial, win, win, ells, pt,
                                  grid=DEFAULT_GRID.replace(n_z_proj=64))
    cl_exact = projection.limber_cl_exact_z(
        fiducial, default_halo(), default_hod(), win, win, ells,
        kind="linear_power", n_z=64,
        grid=DEFAULT_GRID.replace(n_mass=64, sigma_panels=8,
                                  sigma_n_per_panel=32))
    np.testing.assert_allclose(np.asarray(cl_exact), np.asarray(cl_sep),
                               rtol=2e-5)


@pytest.mark.slow
def test_limber_exact_z_nonlinear_differs_sensibly(fiducial):
    """For halo P_gg the exact-z treatment deviates from the separable
    approximation by a few percent at nonlinear ell (the physics it
    adds), and converges with n_z."""
    from chomp_tpu import default_halo, halo
    from chomp_tpu.hod import default_hod

    h = default_halo()
    hod = default_hod()
    win = projection.WindowGalaxy(dist=gauss_dist())
    ells = jnp.asarray([100.0, 3000.0, 30000.0])
    small = DEFAULT_GRID.replace(n_mass=128, sigma_panels=8,
                                 sigma_n_per_panel=32, n_growth=32,
                                 n_dist=32)
    cl_exact = np.asarray(projection.limber_cl_exact_z(
        fiducial, h, hod, win, win, ells, kind="power_gg", n_z=16,
        grid=small))
    # Separable pivoted at the kernel's mean z (z_bar ~ 1): within ~1%
    # of exact (residual = genuine structure-evolution physics).
    model1 = halo.build_halo_model(fiducial, h, hod, z=1.0)
    pt1 = projection.power_table_halo(fiducial, h, model1, "power_gg")
    cl_sep1 = np.asarray(projection.limber_cl(fiducial, win, win, ells, pt1))
    rel1 = np.abs(cl_exact / cl_sep1 - 1)
    assert np.all(rel1 < 0.03)
    # Separable pivoted at z=0 freezes the GALAXY BIAS at its z=0 value
    # — a large, real error for a z~1 kernel that the exact path fixes.
    model0 = halo.build_halo_model(fiducial, h, hod, z=0.0)
    pt0 = projection.power_table_halo(fiducial, h, model0, "power_gg")
    cl_sep0 = np.asarray(projection.limber_cl(fiducial, win, win, ells, pt0))
    assert np.abs(cl_exact[0] / cl_sep0[0] - 1) > 0.2
    # n_z convergence.
    cl_exact2 = np.asarray(projection.limber_cl_exact_z(
        fiducial, h, hod, win, win, ells, kind="power_gg", n_z=32,
        grid=small))
    np.testing.assert_allclose(cl_exact, cl_exact2, rtol=2e-3)
