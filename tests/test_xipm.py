"""Shear-shear xi_+/xi_- (3x2pt extension): J4 machinery + observables.

Capability extension beyond the reference (chomp covers w(theta) and
gamma_t only — SURVEY.md §2 rows 12-13); these tests referee the new
mu = 4 pieces against independent scipy quadrature at the same bar as
the rest of the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import correlation, covariance, projection
from chomp_tpu.params import DEFAULT_GRID


def src_dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


def test_bin_averaged_j4_vs_quad():
    """Closed form (+ small-x series branch) vs adaptive quadrature."""
    from scipy.integrate import quad
    from scipy.special import jv

    edges = np.radians(np.array([0.05, 0.1, 0.4]))
    ells = jnp.asarray([5.0, 120.0, 800.0, 2.0e4])   # x from ~4e-3 to 140
    jb = np.asarray(covariance.bin_averaged_j4(ells, edges))
    for b in range(2):
        lo, hi = edges[b], edges[b + 1]
        for i, ell in enumerate(np.asarray(ells)):
            num, _ = quad(lambda th: jv(4, ell * th) * th, lo, hi,
                          epsrel=1e-12, limit=500)
            ref = 2 * num / (hi**2 - lo**2)
            np.testing.assert_allclose(jb[b, i], ref, rtol=2e-8,
                                       atol=1e-14)


def test_bin_averaged_j4_small_x_series():
    """The series branch is smooth through the x = 2 switch and exact
    at tiny x (the closed form would lose ~all signal to cancellation
    there: the antiderivative's constant is -4, the variable part
    O(x^6))."""
    from scipy.integrate import quad
    from scipy.special import jv

    edges = np.radians(np.array([0.05, 0.1]))
    # x_hi crosses the series/closed-form switch (ell*hi = 2 at
    # ell ~ 1146) — both branches must agree with quadrature there;
    # plus a tiny-x point where the closed form would be pure
    # cancellation noise.
    ells = np.array([1100.0, 1145.0, 1147.0, 1200.0, 1e-2])
    jb = np.asarray(covariance.bin_averaged_j4(jnp.asarray(ells),
                                               edges))[0]
    for i, ell in enumerate(ells):
        num, _ = quad(lambda th: jv(4, ell * th) * th, edges[0],
                      edges[1], epsrel=1e-13, limit=500)
        ref = 2 * num / (edges[1]**2 - edges[0]**2)
        np.testing.assert_allclose(jb[i], ref, rtol=1e-8)


@pytest.mark.slow
def test_xipm_mixed_noise_constant_vs_dense():
    """Closed form (Weber-Schafheitlin smooth part + the 2pi-phase
    delta part) vs a dense 12M-point Simpson of the absolutely
    convergent bin-averaged integrand — overlapping, nested, and
    disjoint annulus pairs."""
    from scipy.integrate import simpson
    from scipy.special import jv

    edges_i = np.radians(np.array([0.1, 0.2, 0.5]))
    edges_j = np.radians(np.array([0.15, 0.3, 0.8]))
    cf = covariance.xipm_mixed_noise_constant(edges_i, edges_j)

    def jbar0(ell, lo, hi):
        x1, x0 = hi * ell, lo * ell
        return 2 * (x1 * jv(1, x1) - x0 * jv(1, x0)) \
            / (ell**2 * (hi * hi - lo * lo))

    def jbar4(ell, lo, hi):
        def f(x):
            xs = np.maximum(x, 1e-30)
            return x * jv(1, x) + 8 * jv(0, x) - 24 * jv(1, xs) / xs
        return 2 * (f(hi * ell) - f(lo * ell)) \
            / (ell**2 * (hi * hi - lo * lo))

    ell = np.linspace(1e-3, 3e6, 12_000_001)
    for ii in range(2):
        for jj in range(2):
            f = ell * jbar0(ell, edges_i[ii], edges_i[ii + 1]) \
                * jbar4(ell, edges_j[jj], edges_j[jj + 1])
            num = simpson(f, x=ell)
            np.testing.assert_allclose(cf[ii, jj], num, rtol=3e-6)


def test_xi_minus_vs_direct_hankel(fiducial, fiducial_model):
    """xi_- through the FFTLog J4 operator vs the trusted-slow direct
    Bessel quadrature of the SAME C_kk table (transform referee — J4
    rings harder than J0/J2, SURVEY.md §7 hard part 3)."""
    from chomp_tpu import default_halo
    from chomp_tpu.fftlog import hankel_direct

    h = default_halo()
    dist = src_dist()
    win_k = projection.WindowConvergence(dist=dist)
    pt = projection.power_table_halo(fiducial, h, fiducial_model,
                                     "power_mm")
    ells_np = correlation.ell_grid(DEFAULT_GRID)[0]
    cl = np.asarray(projection.limber_cl(
        fiducial, win_k, win_k, jnp.asarray(ells_np), pt))

    theta_deg = np.array([0.02, 0.1, 0.5])
    got = np.asarray(correlation.xi_minus(
        fiducial, win_k, win_k, pt, theta_deg))

    # Direct: xi_-(th) = ∫ l dl/(2pi) C(l) J4(l th); log-cubic C
    # interpolation off the grid, zero outside (C decays both ways).
    lncl = np.log(np.maximum(cl, 1e-300))
    lnl = np.log(ells_np)

    def c_of_l(ell):
        out = np.exp(np.interp(np.log(ell), lnl, lncl))
        return np.where((ell > ells_np[0]) & (ell < ells_np[-1]), out, 0.0)

    ref = hankel_direct(lambda l: l * l * c_of_l(l) / (2 * np.pi),
                        np.radians(theta_deg),
                        x_lo=ells_np[0], x_hi=ells_np[-1], mu=4.0)
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_xi_plus_is_j0_of_ckk(fiducial, fiducial_model):
    """xi_+ == the J0 transform of C_kk (shares wtheta's validated
    transform; this pins the wiring, not new numerics)."""
    from chomp_tpu import default_halo

    h = default_halo()
    dist = src_dist()
    win_k = projection.WindowConvergence(dist=dist)
    pt = projection.power_table_halo(fiducial, h, fiducial_model,
                                     "power_mm")
    theta_deg = np.array([0.05, 0.2])
    a = np.asarray(correlation.xi_plus(fiducial, win_k, win_k, pt,
                                       theta_deg))
    b = np.asarray(correlation.wtheta(fiducial, win_k, win_k, pt,
                                      theta_deg))
    np.testing.assert_allclose(a, b, rtol=1e-12)
    assert np.all(a > 0.0)


def test_pipeline_include_shear(fiducial):
    """make_pipeline(include_shear=True): full 3x2pt vector, lattice
    route, jit + vmap == loop."""
    from chomp_tpu import default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline
    from chomp_tpu.params import GridSpec

    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=8,
                    lattice_dln=0.08)
    fn = make_pipeline(default_halo(), default_hod(), src_dist(),
                       grid=tiny, include_shear=True, z_pivot=1.0)
    out = jax.jit(fn)(fiducial)
    for key in ("w_theta", "gamma_t", "xi_plus", "xi_minus"):
        assert key in out and np.all(np.isfinite(np.asarray(out[key])))
    assert np.all(np.asarray(out["xi_plus"]) > 0.0)
    # xi_- < xi_+ at these scales (J4 weighting kills large-scale power).
    assert np.all(np.abs(np.asarray(out["xi_minus"]))
                  < np.asarray(out["xi_plus"]))

    om = jnp.asarray([0.25, 0.31])
    batch = broadcast_cosmo(fiducial, omega_m0=om)
    vm = jax.vmap(fn)(batch)
    for i in range(2):
        single = fn(jax.tree.map(lambda x: x[i], batch))
        np.testing.assert_allclose(np.asarray(vm["xi_minus"])[i],
                                   np.asarray(single["xi_minus"]),
                                   rtol=1e-10)


@pytest.fixture(scope="module")
def cov_setup(fiducial, fiducial_model):
    from chomp_tpu import default_halo
    from chomp_tpu.params import GridSpec

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32)
    dist_src = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.2), sigma_z=jnp.asarray(0.3))
    return default_halo(), fiducial_model, src_dist(), dist_src, g


OMEGA_S = 0.1
N2D = 3.0e7
NS = 4.0e-9     # sigma_eps^2 per component / n2d_src


@pytest.mark.slow
def test_joint_3x2pt_structure(fiducial, cov_setup):
    """(4nb, 4nb) matrix: symmetry, PSD, positive diagonal, and the
    (w, gt) corner equal to the validated 2-probe builder
    (Gaussian-only — identical blocks by construction)."""
    h, model, dist, dist_src, g = cov_setup
    edges = np.logspace(-2, 0, 5)
    cov = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, dist, dist_src, edges, OMEGA_S, N2D, NS,
        grid=g, include_nongaussian=False, n_ell_cov_g=1024))
    nb = len(edges) - 1
    assert cov.shape == (4 * nb, 4 * nb)
    np.testing.assert_allclose(cov, cov.T, rtol=1e-8)
    assert np.all(np.diag(cov) > 0)
    eig = np.linalg.eigvalsh(0.5 * (cov + cov.T))
    assert np.all(eig > 0), f"3x2pt covariance not PSD: {eig}"

    two = np.asarray(covariance.joint_wtheta_gammat_covariance(
        fiducial, h, model, dist, dist_src, edges, OMEGA_S, N2D, NS,
        grid=g, include_nongaussian=False, n_ell_cov_g=1024))
    np.testing.assert_allclose(cov[:2 * nb, :2 * nb], two, rtol=1e-12)


@pytest.mark.slow
def test_joint_3x2pt_shear_blocks_referee(fiducial, cov_setup):
    """The three shear-auto blocks against an independent assembly of
    the EE/BB bookkeeping: Cov(++)/(--) integrate 2[(C+N)^2 + N^2]
    with their same-order noise closures, Cov(+-) integrates
    2[(C+N)^2 - N^2] with NO constant (the exact shot-noise
    cancellation between tangential and cross products)."""
    h, model, dist, dist_src, g = cov_setup
    edges_deg = np.logspace(-2, 0, 4)
    nb = len(edges_deg) - 1
    n_ell = 1024
    cov = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, dist, dist_src, edges_deg, OMEGA_S, N2D, NS,
        grid=g, include_nongaussian=False, n_ell_cov_g=n_ell))
    c_pp = cov[2 * nb:3 * nb, 2 * nb:3 * nb]
    c_pm = cov[2 * nb:3 * nb, 3 * nb:]
    c_mm = cov[3 * nb:, 3 * nb:]

    _, _, cl_kk = covariance.lattice_cl_callables(
        fiducial, h, model, dist, dist_src, grid=g)
    ells_np, w_np = covariance._log_ell_weights(n_ell, 1.0, 1.0e6)
    c = np.asarray(cl_kk(ells_np))
    edges_rad = np.radians(edges_deg)
    b0 = np.asarray(covariance.bin_averaged_j0(jnp.asarray(ells_np),
                                               edges_rad))
    b4 = np.asarray(covariance.bin_averaged_j4(jnp.asarray(ells_np),
                                               edges_rad))
    meas = ells_np**2 * w_np / (2.0 * np.pi) / OMEGA_S
    a = edges_rad[1:] ** 2 - edges_rad[:-1] ** 2
    ovl = covariance.ovl_closure(edges_rad, edges_rad)
    nn = 2.0 * NS * NS

    # EE + BB closures: each block adds nn ovl/(pi Omega a a), nn = 2N^2;
    # the total pure-noise diagonal is 4 N^2/(pi Omega a) — the classic
    # sigma_eps^4/N_pairs with N_pairs = Omega n^2 pi a / 2 per bin.
    ref_pp = (b0 * (meas * 2 * ((c + NS)**2 + NS**2 - nn))) @ b0.T \
        + 2.0 * nn * ovl / (np.pi * OMEGA_S * np.outer(a, a))
    ref_mm = (b4 * (meas * 2 * ((c + NS)**2 + NS**2 - nn))) @ b4.T \
        + 2.0 * nn * ovl / (np.pi * OMEGA_S * np.outer(a, a))
    ref_pm = (b0 * (meas * 2 * ((c + NS)**2 - NS**2))) @ b4.T

    np.testing.assert_allclose(c_pp, ref_pp, rtol=1e-9)
    np.testing.assert_allclose(c_mm, ref_mm, rtol=1e-9)
    np.testing.assert_allclose(c_pm, ref_pm, rtol=1e-9,
                               atol=1e-12 * np.abs(ref_pp).max())


@pytest.mark.slow
def test_joint_3x2pt_gather_free(fiducial, cov_setup):
    """The full 3x2pt matrix stays on the gather-free lattice routes
    (the round-3 TPU-first covariance criterion, extended)."""
    import re

    from chomp_tpu.params import GridSpec

    h, model, dist, dist_src, _ = cov_setup
    g = GridSpec(n_mass=32, n_mu=4, sigma_panels=4, sigma_n_per_panel=16,
                 n_growth=16, n_dist=16)
    edges = covariance.theta_bin_edges_deg(DEFAULT_GRID, n_bins=3)

    def f(c):
        return covariance.joint_3x2pt_covariance(
            c, h, model, dist, dist_src, edges, OMEGA_S, N2D, NS,
            grid=g, n_k_tri=12, n_ell_cov_ng=8, n_ell_cov_g=64,
            u_stride=16)

    txt = str(jax.make_jaxpr(f)(fiducial))
    assert not re.findall(r"\bgather\b", txt), "dynamic gather in jaxpr"


def test_pipeline_curved_shear_matches_flat():
    """geometry='curved' xi_+- (exact d^l_{2,+-2} sums) agrees with the
    flat J0/J4 route at sub-degree bins — the regime where curvature is
    a small correction; also the smoke test for the curved wiring."""
    from chomp_tpu import default_cosmo, default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import make_pipeline
    from chomp_tpu.params import GridSpec

    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08, theta_min_deg=0.05,
                    theta_max_deg=0.5)
    kw = dict(include_shear=True, include_lensing=False, z_pivot=1.0,
              grid=tiny)
    flat = make_pipeline(default_halo(), default_hod(), src_dist(),
                         **kw)(default_cosmo())
    curved = make_pipeline(default_halo(), default_hod(), src_dist(),
                           geometry="curved", **kw)(default_cosmo())
    for key, tol in (("xi_plus", 6e-3), ("xi_minus", 2e-2)):
        a, b = np.asarray(flat[key]), np.asarray(curved[key])
        assert np.all(np.isfinite(b))
        np.testing.assert_allclose(b, a, rtol=tol)
