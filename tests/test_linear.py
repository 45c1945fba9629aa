"""Linear power / sigma / nu vs SURVEY.md Appendix A.2-A.3 + scipy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, linear
from chomp_tpu.params import DEFAULT_GRID
from tests import goldens
from tests.oracle import oracle

RTOL = 2e-6


def test_power_norm_golden(fiducial):
    # goldens.norm (Appendix A.2 errata: quad under-convergence fixed)
    np.testing.assert_allclose(
        linear.power_norm(fiducial), goldens.norm, rtol=1e-6
    )


def test_linear_power_goldens(fiducial):
    ks = jnp.asarray(goldens.p_lin_k)
    np.testing.assert_allclose(
        linear.linear_power(fiducial, ks), np.array(goldens.p_lin), rtol=1e-6
    )


def test_linear_power_vs_oracle_dense(fiducial):
    """1e-4 bar across k in [1e-3, 100] h/Mpc (BASELINE.md accuracy row);
    the float64 grid pipeline should do far better."""
    ks = np.logspace(-3, 2, 41)
    ours = np.asarray(linear.linear_power(fiducial, jnp.asarray(ks)))
    ref = np.array([oracle.pk_lin(k) for k in ks])
    np.testing.assert_allclose(ours, ref, rtol=RTOL)


def test_linear_power_at_redshift(fiducial):
    k = jnp.asarray(0.1)
    ours = linear.linear_power(fiducial, k, z=0.7)
    np.testing.assert_allclose(ours, oracle.pk_lin(0.1, 0.7), rtol=RTOL)


def test_sigma_nu_goldens(fiducial):
    ms = jnp.asarray(goldens.sigma_m_masses)
    np.testing.assert_allclose(
        linear.sigma_m(fiducial, ms), np.array(goldens.sigma), rtol=1e-6
    )
    np.testing.assert_allclose(
        linear.nu_m(fiducial, ms), np.array(goldens.nu), rtol=1e-6
    )


def test_sigma8_self_consistency(fiducial):
    np.testing.assert_allclose(
        linear.sigma_r(fiducial, 8.0), fiducial.sigma_8, rtol=1e-10
    )


def test_sigma_deriv_matches_finite_difference(fiducial):
    r = jnp.asarray([0.5, 2.0, 8.0, 30.0])
    s2, ds2 = linear.sigma2_unnorm_r_and_dlnr(fiducial, r)
    eps = 1e-5
    s2_hi = linear.sigma2_unnorm_r(fiducial, r * float(np.exp(eps)))
    s2_lo = linear.sigma2_unnorm_r(fiducial, r * float(np.exp(-eps)))
    fd = (s2_hi - s2_lo) / (2 * eps)
    np.testing.assert_allclose(ds2, fd, rtol=1e-5)


def test_delta_k(fiducial):
    k = jnp.asarray(1.0)
    expected = oracle.pk_lin(1.0) / (2 * np.pi**2)
    np.testing.assert_allclose(linear.delta_k(fiducial, k), expected, rtol=RTOL)


def test_transfer_limits_and_wiggles(fiducial):
    ks = jnp.asarray(np.logspace(-4, 2, 200))
    t_nw = np.asarray(linear.transfer_nowiggle(fiducial, ks))
    t_w = np.asarray(linear.transfer_eh_full(fiducial, ks))
    # T -> 1 as k -> 0 for both variants.
    assert abs(t_nw[0] - 1.0) < 2e-2
    assert abs(t_w[0] - 1.0) < 2e-2
    # The wiggle variant oscillates around the no-wiggle shape within ~15%.
    ratio = t_w / t_nw
    assert np.all(ratio > 0.8) and np.all(ratio < 1.25)
    # Wiggles actually exist: the ratio is non-monotonic in the BAO range.
    band = ratio[(ks > 0.03) & (ks < 0.4)]
    sign_changes = np.sum(np.diff(np.sign(np.diff(band))) != 0)
    assert sign_changes >= 3


def test_sigma_convergence_panel_doubling(fiducial):
    """Order-doubling convergence for the oscillatory sigma quadrature."""
    grid2 = DEFAULT_GRID.replace(sigma_panels=32)
    r = jnp.asarray([0.1, 1.0, 8.0, 50.0])
    a = linear.sigma2_unnorm_r(fiducial, r, grid=DEFAULT_GRID)
    b = linear.sigma2_unnorm_r(fiducial, r, grid=grid2)
    np.testing.assert_allclose(a, b, rtol=1e-7)


def test_mstar_golden(fiducial):
    """M* via root of nu(M)=1 (oracle A.3: log10 M* = 12.52690)."""
    lm = jnp.linspace(10.0, 15.0, 2001)
    nus = linear.nu_m(fiducial, 10.0**lm)
    lm_star = jnp.interp(0.0, jnp.log(nus), lm)
    np.testing.assert_allclose(lm_star, goldens.log10_mstar, atol=2e-4)


def test_growth_scaling_of_sigma(fiducial):
    s0 = linear.sigma_m(fiducial, 1e13, z=0.0)
    s1 = linear.sigma_m(fiducial, 1e13, z=1.0)
    d1 = background.growth_factor(fiducial, 1.0)
    np.testing.assert_allclose(s1 / s0, d1, rtol=1e-10)


def test_with_bao_pipeline_end_to_end(fiducial):
    """BASELINE configs[0]: wiggle EH transfer drives the full pipeline;
    w(theta) shifts from the no-wiggle default by a small, bounded
    amount (BAO feature level)."""
    import jax

    from chomp_tpu import correlation, limber_fft, projection
    from chomp_tpu import default_halo, halo
    from chomp_tpu.hod import default_hod

    h = default_halo()
    hod = default_hod()
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    from chomp_tpu.params import DEFAULT_GRID

    g = DEFAULT_GRID.replace(n_mass=256, lattice_dln=0.02, n_ell=512)
    win = projection.WindowGalaxy(dist=dist)
    ells = correlation.ell_grid(g)[0]
    th = np.array([0.05, 0.5])

    def w_of(with_bao):
        model = halo.build_halo_model(fiducial, h, hod, with_bao=with_bao,
                                      grid=g)
        p = limber_fft.p_lattice_halo(fiducial, h, model, "power_gg",
                                      with_bao=with_bao, grid=g)
        cl = limber_fft.limber_cl_fft(fiducial, win, win, ells, p, g,
                                      growth_pivot=model.mass.growth)
        return np.asarray(correlation.wtheta_from_cl_fused(cl, th, g))

    w_nw = w_of(False)
    w_bao = w_of(True)
    rel = np.abs(w_bao / w_nw - 1)
    assert np.all(np.isfinite(w_bao)) and np.all(w_bao > 0)
    assert np.all(rel < 0.1) and np.any(rel > 1e-4)


@pytest.mark.slow
def test_diagnostics_convergence_report(fiducial):
    from chomp_tpu import projection
    from chomp_tpu import default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec
    from chomp_tpu.utils.diagnostics import convergence_report

    tiny = GridSpec(n_k=64, n_k_table=256, sigma_panels=8,
                    sigma_n_per_panel=32, n_growth=32, n_dist=32, n_mass=256,
                    n_z_proj=32, n_z_lens=32, n_ell=256, n_theta=8,
                    n_z_dndz=64, n_mu=8, lattice_dln=0.02)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    rep = convergence_report(fiducial, default_halo(), default_hod(), dist,
                             grid=tiny)
    assert set(rep) == {"n_mass", "sigma_panels", "n_growth", "n_dist"}
    assert all(v < 1e-2 for v in rep.values())
