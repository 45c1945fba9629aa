"""chomp-compatible object API: mirrors upstream unit_test_suite.py's
layer-by-layer structure (SURVEY.md §4) and exercises the mutator paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu.compat import (
    correlation,
    cosmology,
    covariance,
    halo,
    halo_trispectrum,
    hod,
    kernel,
    mass_function,
)
from tests import goldens


class TestCosmology:
    def test_single_epoch_goldens(self):
        cosmo = cosmology.SingleEpoch(0.0)
        np.testing.assert_allclose(cosmo.comoving_distance(1.0),
                                   goldens.chi_10, rtol=1e-6)
        np.testing.assert_allclose(cosmo.growth_factor(1.0),
                                   goldens.growth_1, rtol=1e-6)
        np.testing.assert_allclose(cosmo.delta_c(), goldens.delta_c0,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            cosmo.linear_power(jnp.asarray(goldens.p_lin_k)),
            np.array(goldens.p_lin), rtol=1e-6)
        np.testing.assert_allclose(
            cosmo.sigma_m(jnp.asarray(goldens.sigma_m_masses)),
            np.array(goldens.sigma), rtol=1e-6)
        np.testing.assert_allclose(
            cosmo.nu(jnp.asarray(goldens.sigma_m_masses)),
            np.array(goldens.nu), rtol=1e-6)

    def test_set_cosmology_mutator(self):
        cosmo = cosmology.SingleEpoch(0.0)
        p0 = float(cosmo.linear_power(jnp.asarray(0.1)))
        cosmo.set_cosmology({"omega_m0": 0.31, "omega_l0": 0.69})
        p1 = float(cosmo.linear_power(jnp.asarray(0.1)))
        assert p0 != p1

    def test_multi_epoch_inverse(self):
        me = cosmology.MultiEpoch(0.0, 3.0)
        chi = me.comoving_distance(1.2)
        np.testing.assert_allclose(me.redshift(chi), 1.2, rtol=1e-6)


class TestMassFunction:
    def test_goldens_and_mutators(self):
        mf = mass_function.MassFunction(0.0)
        np.testing.assert_allclose(mf.tables.f_norm, goldens.f_norm,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.log10(mf.m_star()),
                                   goldens.log10_mstar, atol=2e-5)
        nu13 = float(mf.nu(jnp.asarray(1e13)))
        np.testing.assert_allclose(mf.mass(jnp.asarray(nu13)), 1e13,
                                   rtol=3e-5)
        assert mf.nu_min < 1.0 < mf.nu_max
        # Mutator path (chomp's suite re-runs after set_*).
        mf.set_redshift(1.0)
        assert float(mf.nu(jnp.asarray(1e13))) > nu13


class TestHod:
    def test_zheng_linear_mass_constructor(self):
        z = hod.HODZheng(10.0**12.14, 0.15, 10.0**12.14, 10.0**13.43, 1.0)
        np.testing.assert_allclose(float(z.central_moment(10.0**12.14)),
                                   0.5, rtol=1e-10)


@pytest.fixture(scope="module")
def compat_halo():
    """Module-shared compat Halo (expensive eager build)."""
    return halo.Halo(0.0)


class TestHalo:
    @pytest.fixture(scope="class")
    def h(self, compat_halo):
        return compat_halo

    def test_powers_and_limits(self, h):
        k = jnp.asarray([1e-3, 1.0])
        p_lin = h.linear_power(k)
        p_mm = h.power_mm(k)
        p_gg = h.power_gg(k)
        p_gm = h.power_gm(k)
        assert float(p_mm[1]) > float(p_lin[1])  # nonlinear boost at k=1
        np.testing.assert_allclose(np.asarray(h.power_mg(k)),
                                   np.asarray(p_gm), rtol=0)
        assert h.n_g() > 0
        assert 0.5 < h.bias_avg() < 2.0

    def test_y_and_profile_methods(self, h):
        y = h.y(jnp.log(jnp.asarray(10.0)), 1e13)
        np.testing.assert_allclose(float(y), goldens.y_nfw[2], rtol=3e-5)
        rv = h.virial_radius(1e14)
        np.testing.assert_allclose(h.virial_mass(rv), 1e14, rtol=1e-10)
        assert float(h.concentration(1e12)) > float(h.concentration(1e15))

    def test_set_hod_mutator(self, h):
        ng0 = h.n_g()
        h.set_hod(hod.HODZheng(10.0**12.5, 0.15, 10.0**12.5,
                               10.0**13.43, 1.0))
        assert h.n_g() != ng0
        h.set_hod(hod.HODZheng(10.0**12.14, 0.15, 10.0**12.14,
                               10.0**13.43, 1.0))

    def test_halo_exclusion(self):
        hx = halo.HaloExclusion(0.0)
        k = jnp.asarray([1.0])
        base = halo.Halo(0.0)
        assert float(hx.power_gg(k)[0]) <= float(base.power_gg(k)[0])


class TestKernelAndCorrelation:
    @pytest.fixture(scope="class")
    def stack(self, compat_halo):
        lens_dist = kernel.dNdzGaussian(0.0, 2.0, 1.0, 0.2)
        wg = kernel.WindowFunctionGalaxy(lens_dist)
        kern = kernel.Kernel(1e-8, 10.0, wg, wg)
        return wg, kern, compat_halo

    def test_dndz_classes(self):
        g = kernel.dNdzGaussian(0.0, 2.0, 1.0, 0.2)
        m = kernel.dNdzMagLim(0.0, 3.0, 2.0, 0.5, 1.5)
        i = kernel.dNdzInterpolation(np.linspace(0, 2, 50),
                                     np.exp(-np.linspace(-1, 1, 50) ** 2))
        for d in (g, m, i):
            assert d.normalize() > 0
            assert float(d.dndz(jnp.asarray(d.z_max + 0.5))) == 0.0

    def test_window_and_kernel(self, stack):
        wg, kern, h = stack
        w = wg.window_function(jnp.asarray([1000.0, 2000.0]))
        assert np.all(np.asarray(w) >= 0)
        k_lo = float(kern.kernel(jnp.asarray(np.log(1e-7))))
        k_hi = float(kern.kernel(jnp.asarray(np.log(1e-2))))
        assert abs(k_hi) < abs(k_lo)
        assert 0.9 < kern.z_bar < 1.05

    def test_correlation_object_end_to_end(self, stack, tmp_path):
        wg, kern, h = stack
        corr = correlation.Correlation(0.01, 1.0, bins=10,
                                       input_kernel=kern, input_halo=h,
                                       power_spec="power_gg")
        w = corr.compute_correlation()
        assert w.shape == (10,)
        assert np.all(np.isfinite(w)) and w[0] > w[-1] > 0
        # power_spec string switch (getattr dispatch parity).
        corr.set_power_spectrum("linear_power")
        w_lin = corr.compute_correlation()
        assert not np.allclose(w_lin, w)
        with pytest.raises(AttributeError):
            corr.set_power_spectrum("not_a_spectrum")
        # ASCII writer.
        out = tmp_path / "w.txt"
        corr.write(out)
        assert np.loadtxt(out).shape == (10, 2)

    def test_correlation_matches_functional_route(self, stack):
        """Compat object w(theta) == functional chomp-form route."""
        from chomp_tpu import kernelfn, projection

        wg, kern, h = stack
        corr = correlation.Correlation(0.05, 1.0, bins=4, input_kernel=kern,
                                       input_halo=h, power_spec="linear_power")
        w_obj = corr.compute_correlation()
        pt = projection.power_table_linear(h._epoch.cosmo)
        w_fn = kernelfn.wtheta_chomp_form(h._epoch.cosmo, kern.tables, pt,
                                          jnp.asarray(corr.theta_deg))
        np.testing.assert_allclose(w_obj, np.asarray(w_fn), rtol=1e-6)

    def test_gg_lensing_kernel(self, stack):
        wg, _, _ = stack
        src = kernel.dNdzGaussian(0.5, 3.0, 1.2, 0.3)
        wk = kernel.WindowFunctionConvergence(src)
        kern2 = kernel.GalaxyGalaxyLensingKernel(1e-8, 10.0, wk, wg)
        v = float(kern2.kernel(jnp.asarray(np.log(1e-4))))
        assert np.isfinite(v)


class TestTrispectrumAndCovariance:
    def test_halo_trispectrum_object(self, compat_halo):
        h = compat_halo
        tri = halo_trispectrum.HaloTrispectrum(h)
        t = float(tri.trispectrum_parallelogram(1.0, 1.0))
        assert t > 0

    @pytest.mark.slow
    def test_covariance_object(self, compat_halo):
        h = compat_halo
        dist = kernel.dNdzGaussian(0.0, 2.0, 1.0, 0.2)
        wg = kernel.WindowFunctionGalaxy(dist)
        from chomp_tpu.params import GridSpec

        g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                     sigma_n_per_panel=32, n_growth=32, n_dist=32)
        cov = covariance.Covariance(h, wg, area_deg2=300.0,
                                    n_per_arcmin2=2.0, bins=5, grid=g,
                                    n_k_tri=32, n_z_tri=6)
        total = np.asarray(cov.covariance())
        assert total.shape == (5, 5)
        assert np.all(np.linalg.eigvalsh(0.5 * (total + total.T)) > 0)
        # Mutator rebuild: the Gaussian block responds to sigma_8.
        # (compat_halo is module-shared: always restore.)
        g_before = np.asarray(cov.gaussian_covariance())
        try:
            cov.set_cosmology({"sigma_8": 0.9})
            g_after = np.asarray(cov.gaussian_covariance())
        finally:
            cov.set_cosmology({"sigma_8": 0.811})
        assert np.max(np.abs(g_after / g_before - 1)) > 0.05

    @pytest.mark.slow
    def test_joint_covariance_object(self, compat_halo):
        """Clustering + g-g lensing joint covariance (compat surface over
        covariance.joint_wtheta_gammat_covariance)."""
        h = compat_halo
        lens = kernel.WindowFunctionGalaxy(
            kernel.dNdzGaussian(0.0, 1.2, 0.5, 0.15))
        src = kernel.WindowFunctionGalaxy(
            kernel.dNdzGaussian(0.0, 2.5, 1.2, 0.3))
        from chomp_tpu.params import GridSpec

        g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                     sigma_n_per_panel=32, n_growth=32, n_dist=32)
        jc = covariance.JointCovariance(
            h, lens, src, area_deg2=300.0, n_lens_per_arcmin2=2.0,
            n_src_per_arcmin2=10.0, bins=4, theta_min_deg=0.01, grid=g)
        total = np.asarray(jc.covariance(include_nongaussian=False))
        assert total.shape == (8, 8)
        np.testing.assert_allclose(total, total.T, rtol=1e-8)
        assert np.all(np.linalg.eigvalsh(0.5 * (total + total.T)) > 0)


class TestLensingCorrelation:
    def test_gamma_t_via_j2_kernel(self, compat_halo):
        """Tangential shear through the compat stack: a J2 kernel pairing
        a convergence and a galaxy window drives Correlation."""
        lens_dist = kernel.dNdzGaussian(0.0, 2.0, 1.0, 0.2)
        src_dist = kernel.dNdzGaussian(0.5, 3.0, 1.2, 0.3)
        wg = kernel.WindowFunctionGalaxy(lens_dist)
        wk = kernel.WindowFunctionConvergence(src_dist)
        kern = kernel.GalaxyGalaxyLensingKernel(1e-8, 10.0, wk, wg)
        h = compat_halo
        corr = correlation.GalaxyGalaxyLensingCorrelation(
            0.01, 1.0, bins=6, input_kernel=kern, input_halo=h,
            power_spec="power_gm")
        gt = corr.compute_correlation()
        assert gt.shape == (6,)
        assert np.all(np.isfinite(gt)) and np.all(gt > 0)
        # Tangential shear decreases outward over this range.
        assert gt[0] > gt[-1]


def test_compat_halo_bulk_powers_memo(monkeypatch):
    """One halo evaluation per (mutation epoch, k grid): power_gg +
    power_gm + power_mm on the same k must hit halo.powers ONCE; a
    mutator invalidates; a different k grid re-evaluates (chomp's lazy
    per-epoch spline semantics — VERDICT round-2 missing #4)."""
    import numpy as np

    from chomp_tpu import halo as halo_mod
    from chomp_tpu.compat.halo import Halo
    from chomp_tpu.params import GridSpec

    g = GridSpec(n_k=32, n_k_table=128, sigma_panels=4, sigma_n_per_panel=16,
                 n_growth=16, n_dist=16, n_mass=64, n_z_proj=8, n_z_lens=8,
                 n_ell=32, n_theta=4, n_z_dndz=16, n_mu=8)
    h = Halo(redshift=0.3, grid=g)
    calls = {"n": 0}
    real = halo_mod.powers

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(halo_mod, "powers", counting)
    k = np.logspace(-2, 1, 16)
    p_gg = np.asarray(h.power_gg(k))
    p_gm = np.asarray(h.power_gm(k))
    p_mm = np.asarray(h.power_mm(k))
    assert calls["n"] == 1, calls
    # Same answers as the uncached functional core.
    np.testing.assert_allclose(
        p_gg, np.asarray(real(h._epoch.cosmo, h.halo_params, h.model,
                              k, False, g)["power_gg"]), rtol=1e-12)
    # Mutation invalidates.
    h.set_redshift(0.5)
    h.power_gg(k)
    assert calls["n"] == 2, calls
    assert not np.allclose(p_gg, np.asarray(h.power_gg(k)))
    assert calls["n"] == 2, calls      # repeat still cached
    # New k grid re-evaluates.
    h.power_gg(np.logspace(-2, 1, 17))
    assert calls["n"] == 3, calls
