"""Cluster number counts + covariance (chomp_tpu.clusters).

Referees: an independent scipy quadrature oracle for the counts (z-
evolved Sheth-Tormen pieces from tests/oracle), scipy.special
spherical_jn for the Gegenbauer j_l table, a full-sky closed-form
spectral referee for the exact-radial sample variance, and internal
consistency (Limber vs exact, flat vs curved, joint-SSC positive
semidefiniteness, jit/vmap/grad)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from chomp_tpu import background, clusters
from chomp_tpu.params import (C_OVER_H0, DEFAULT_GRID, default_cosmo,
                              default_halo)

from tests.oracle import oracle


COSMO = default_cosmo()
HALO = default_halo()
SEL = clusters.ClusterSelection(
    ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 5e14, 2e16])),
    sigma_lnm=jnp.asarray(0.25), lnm_bias=jnp.asarray(0.05))
Z_EDGES = (0.2, 0.4, 0.6)
OMEGA_S = 0.4  # sr, ~1300 deg^2


def _oracle_counts(z_lo, z_hi, ln_lo, ln_hi, sigma, bias):
    """Independent scipy counts: z-evolved ST mass function
    (finite-range renormalized at each z, as build_mass_tables does)
    x lognormal selection x comoving volume.  sigma(M) at z=0 goes
    through one high-accuracy spline (it is the only expensive oracle
    piece and is exactly z-separable), everything else is adaptive
    quadrature."""
    from scipy import integrate
    from scipy.interpolate import CubicSpline
    from scipy.special import erfc

    m_min, m_max = DEFAULT_GRID.m_min, DEFAULT_GRID.m_max
    lnm_g = np.linspace(np.log(m_min) - 0.01, np.log(m_max) + 0.01, 320)
    sig0 = np.array([oracle.sigma_m(np.exp(l), 0.0) for l in lnm_g])
    lns_spl = CubicSpline(lnm_g, np.log(sig0))

    def nu_z(lnm, z):
        s = np.exp(lns_spl(lnm)) * oracle.growth(z) / oracle.growth(0.0)
        return (oracle.delta_c(z) / s) ** 2

    def f_norm_z(z):
        lo, hi = nu_z(np.log(m_min), z), nu_z(np.log(m_max), z)
        v, _ = integrate.quad(oracle.f_nu_raw, lo, hi, epsrel=1e-10,
                              limit=400)
        return 1.0 / v

    def dndlnm_z(lnm, z, fn):
        eps = 1e-4
        dnu = (nu_z(lnm + eps, z) - nu_z(lnm - eps, z)) / (2 * eps)
        rho = oracle.RHO_CRIT * oracle.OM
        return (fn * oracle.f_nu_raw(nu_z(lnm, z))
                * (rho / np.exp(lnm)) * dnu)

    def phi(lnm, z):
        mu = lnm + bias
        xlo = (ln_lo - mu) / (np.sqrt(2) * sigma)
        xhi = (ln_hi - mu) / (np.sqrt(2) * sigma)
        return 0.5 * (erfc(xlo) - erfc(xhi))

    def integrand(z):
        fn = f_norm_z(z)
        inner, _ = integrate.quad(
            lambda lnm: dndlnm_z(lnm, z, fn) * phi(lnm, z),
            np.log(m_min), np.log(m_max), epsrel=1e-9, limit=400)
        dvdz = oracle.chi(z) ** 2 * C_OVER_H0 / oracle.ez(z)
        return inner * dvdz

    val, _ = integrate.quad(integrand, z_lo, z_hi, epsrel=1e-8,
                            limit=200)
    return OMEGA_S * val


@pytest.mark.slow
def test_counts_vs_oracle():
    n = clusters.cluster_counts(COSMO, HALO, SEL, Z_EDGES, OMEGA_S,
                                n_z_quad=16)
    edges = np.asarray(SEL.ln_m_obs_edges)
    ref = _oracle_counts(0.2, 0.4, edges[0], edges[1], 0.25, 0.05)
    assert np.isfinite(ref) and ref > 10.0  # a real survey-scale count
    assert abs(float(n[0, 0]) / ref - 1.0) < 2e-4
    ref2 = _oracle_counts(0.4, 0.6, edges[1], edges[2], 0.25, 0.05)
    assert abs(float(n[1, 1]) / ref2 - 1.0) < 2e-4


def test_counts_quadrature_converged():
    n1 = clusters.cluster_counts(COSMO, HALO, SEL, Z_EDGES, OMEGA_S,
                                 n_z_quad=10)
    n2 = clusters.cluster_counts(COSMO, HALO, SEL, Z_EDGES, OMEGA_S,
                                 n_z_quad=20)
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n2),
                               rtol=1e-7, atol=0.0)


def test_selection_edge_telescoping_and_eddington():
    """The inner-edge smearing cancels EXACTLY in the sum over proxy
    bins (the erfc telescopes), and wider scatter pushes counts up the
    steep mass function into the top bin (Eddington bias).  Sub-node-
    spacing sigma (< ~0.06 at n_mass=256) is NOT resolved by the mass
    GL rule — a GridSpec knob, same as every quadrature order here."""
    def counts_at(sig):
        s = clusters.ClusterSelection(
            ln_m_obs_edges=SEL.ln_m_obs_edges,
            sigma_lnm=jnp.asarray(sig), lnm_bias=jnp.asarray(0.0))
        return np.asarray(clusters.cluster_counts(
            COSMO, HALO, s, (0.2, 0.4), OMEGA_S, n_z_quad=16))

    def counts_single(sig):
        s = clusters.ClusterSelection(
            ln_m_obs_edges=SEL.ln_m_obs_edges[jnp.asarray([0, 2])],
            sigma_lnm=jnp.asarray(sig), lnm_bias=jnp.asarray(0.0))
        return np.asarray(clusters.cluster_counts(
            COSMO, HALO, s, (0.2, 0.4), OMEGA_S, n_z_quad=16))

    # Exact telescoping: binned sum == single wide bin at the SAME
    # sigma (the inner-edge erfc cancels identically).
    for sig in (0.05, 0.25):
        np.testing.assert_allclose(counts_at(sig).sum(),
                                   counts_single(sig).sum(), rtol=1e-12)
    # Outer-edge smearing is second order x the mass-function
    # curvature: ~1.7% total shift at sigma = 0.05 (measured), and the
    # top bin gains from the steep slope (Eddington bias).
    n_b = counts_at(0.05)
    n_wide = counts_at(0.3)
    assert n_wide[0, 1] > n_b[0, 1] * 1.1  # Eddington boost, top bin


def test_phi_partition():
    """Bins spanning the full proxy range partition unity."""
    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.asarray([-200.0, 32.0, 34.0, 200.0]),
        sigma_lnm=jnp.asarray(0.3))
    lnm = jnp.linspace(np.log(1e10), np.log(1e15), 64)
    p = np.asarray(sel.phi(lnm, 0.3))
    assert (p >= -1e-15).all()
    np.testing.assert_allclose(p.sum(axis=0), 1.0, rtol=0.0, atol=1e-12)


def test_jl_table_vs_scipy():
    from scipy.special import spherical_jn

    lmax = 48
    x = np.concatenate([np.linspace(1e-3, 30, 40),
                        np.linspace(30, 1500, 60)])
    jl = np.asarray(clusters.spherical_jl_table(jnp.asarray(x), lmax,
                                                n_mu=1400))
    ref = np.stack([spherical_jn(l, x) for l in range(lmax + 1)],
                   axis=-1)
    assert np.max(np.abs(jl - ref)) < 5e-12


def test_ssc_limber_blocks_and_scaling():
    cov = clusters.counts_ssc_covariance(COSMO, HALO, SEL, Z_EDGES,
                                         OMEGA_S, geometry="flat")
    cov = np.asarray(cov)
    n_m = SEL.n_bins
    # Block-diagonal in z (Limber per-shell), symmetric PSD blocks.
    assert np.all(cov[:n_m, n_m:] == 0.0)
    for i in range(2):
        blk = cov[i * n_m:(i + 1) * n_m, i * n_m:(i + 1) * n_m]
        np.testing.assert_allclose(blk, blk.T, rtol=1e-12, atol=0.0)
        assert np.min(np.linalg.eigvalsh(blk)) >= -1e-12 * blk.max()
    # Perfectly-correlated mass bins within a shell-local response:
    # corr close to 1 (same delta_b drives both bins).
    c01 = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    assert 0.99 < c01 <= 1.0 + 1e-12


def test_ssc_flat_vs_curved_small_cap():
    """A small polar cap matches the equal-area flat disc."""
    from chomp_tpu.curved import SphericalCapMask
    from chomp_tpu.mask import DiscMask

    theta_c = np.radians(6.0)
    omega = 2.0 * np.pi * (1.0 - np.cos(theta_c))
    cap = SphericalCapMask(float(theta_c))
    disc = DiscMask(float(np.sqrt(omega / np.pi)))
    c_flat = np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, SEL, (0.4, 0.6), disc, geometry="flat"))
    c_curv = np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, SEL, (0.4, 0.6), cap, geometry="curved"))
    np.testing.assert_allclose(c_curv, c_flat, rtol=0.05)


@pytest.mark.slow
def test_ssc_exact_fullsky_vs_reference():
    """Exact-radial mode on the FULL SKY against an independent numpy
    spectral computation (only the monopole survives; spherical_jn +
    trapezoid k-integral on an independent grid), and the Limber mode
    against both (wide bin: per-shell is good to ~tens of %)."""
    from scipy.special import spherical_jn

    from chomp_tpu.curved import UniformSphereMask
    from chomp_tpu import linear

    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    z_edges = (0.2, 0.5)
    mask = UniformSphereMask()
    cov_ex = float(np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, sel, z_edges, mask, geometry="curved",
        radial="exact", n_z_quad=16, lmax=4))[0, 0])

    # Independent reference: dense-z trapezoid kernel, scipy j_0, own
    # k grid.  Module shell densities feed both routes (the mass sector
    # has its own oracle test above), so this referees geometry,
    # normalization, Bessel table, and quadratures.
    zg = np.linspace(z_edges[0], z_edges[1], 801)
    nb = np.array([np.asarray(clusters.shell_density(
        COSMO, HALO, sel, z)[1])[0] for z in zg[::80]])
    from scipy.interpolate import CubicSpline
    nb_s = CubicSpline(zg[::80], nb)
    chi = np.asarray(background.comoving_distance(COSMO, jnp.asarray(zg)))
    dchidz = C_OVER_H0 / np.asarray(background.ez(COSMO, jnp.asarray(zg)))
    d = np.asarray(background.growth_factor(COSMO, jnp.asarray(zg)))
    f = chi**2 * nb_s(zg) * d * dchidz
    kg = np.concatenate([np.geomspace(3e-4, 6e-3, 40, endpoint=False),
                         np.linspace(6e-3, 0.5, 2400)])
    p0 = np.asarray(linear.linear_power(COSMO, jnp.asarray(kg), 0.0))
    t0 = np.trapezoid(f[None, :] * spherical_jn(
        0, kg[:, None] * chi[None, :]), zg, axis=1)
    ref = 4.0 * np.pi * (2.0 / np.pi) * np.trapezoid(
        kg**2 * p0 * t0**2, kg)
    # 3e-3: the module truncates at k_hi = 0.25 (measured 99.98% of
    # the integral by k = 0.2) and anchors nb(z) at 6 Chebyshev nodes.
    assert abs(cov_ex / ref - 1.0) < 3e-3

    cov_lim = float(np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, sel, z_edges, mask, geometry="curved",
        radial="limber", n_z_quad=16))[0, 0])
    # The FULL sky is per-shell Limber's worst case: only the l = 0
    # mode exists, sampled at k = 0.5/chi, while the true variance is
    # dominated by the RADIAL mode continuum Limber discards (measured
    # ratio 0.245 here).  Finite footprints recover a transverse-q
    # continuum and do far better (the flat-vs-curved test above).
    assert 0.1 < cov_lim / cov_ex < 0.6


@pytest.mark.slow
def test_ssc_exact_cross_zbin_correlation():
    """Neighbouring Delta z = 0.1 bins carry NONZERO sample covariance
    in the exact mode (identically zero in Limber) — and it is
    NEGATIVE here: the bin centroids sit ~250 Mpc/h apart, beyond the
    ~130 Mpc/h zero crossing of xi_lin, so the shared footprint modes
    anti-correlate the bins (measured -8.6% on a 20-degree cap).  The
    exact diagonals also exceed Limber per-shell by ~25% at this bin
    width (narrow bins are exactly where per-shell fails)."""
    from chomp_tpu.curved import SphericalCapMask

    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    cap = SphericalCapMask(float(np.radians(20.0)))
    cov = np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, sel, (0.3, 0.4, 0.5), cap, geometry="curved",
        radial="exact", n_z_quad=10))
    r = cov[0, 1] / np.sqrt(cov[0, 0] * cov[1, 1])
    assert -0.3 < r < -0.02
    # And the full matrix is PSD (Gram construction).
    assert np.min(np.linalg.eigvalsh(cov)) >= -1e-10 * cov.max()
    cov_lim = np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, sel, (0.3, 0.4, 0.5), cap, geometry="curved",
        radial="limber", n_z_quad=10))
    ratio = np.diag(cov) / np.diag(cov_lim)
    assert np.all(ratio > 1.1) and np.all(ratio < 2.0)


def test_counts_covariance_poisson():
    cov = np.asarray(clusters.counts_covariance(
        COSMO, HALO, SEL, Z_EDGES, OMEGA_S, geometry="flat"))
    ssc = np.asarray(clusters.counts_ssc_covariance(
        COSMO, HALO, SEL, Z_EDGES, OMEGA_S, geometry="flat"))
    n = np.asarray(clusters.cluster_counts(COSMO, HALO, SEL, Z_EDGES,
                                           OMEGA_S)).reshape(-1)
    np.testing.assert_allclose(np.diag(cov - ssc), n, rtol=1e-12)


@pytest.mark.slow
def test_joint_counts_probe_ssc_psd():
    """Counts x w(theta) SSC assembles into a jointly PSD matrix with
    the probe-side SSC (consistent normalizations across the counts
    GL-z and probe lattice quadratures)."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import ssc
    from chomp_tpu.hod import default_hod
    from chomp_tpu.projection import DNdzGaussian

    hod = default_hod()
    dist = DNdzGaussian(z_min=0.15, z_max=0.8, z0=0.45, sigma_z=0.08)
    model = halo_mod.build_halo_model(COSMO, HALO, hod, 0.45)
    theta_edges = np.geomspace(0.2, 2.0, 4)
    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    z_edges = (0.3, 0.6)
    cov_nn = clusters.counts_ssc_covariance(COSMO, HALO, sel, z_edges,
                                            OMEGA_S, geometry="flat",
                                            n_z_quad=16)
    cov_nx = clusters.counts_3x2pt_ssc_cross(
        COSMO, HALO, model, sel, z_edges, [dist], [], theta_edges,
        OMEGA_S, geometry="flat", n_z_quad=16)
    cov_xx = ssc.ssc_covariance(COSMO, HALO, model, dist, theta_edges,
                                OMEGA_S)
    joint = np.asarray(clusters.joint_counts_3x2pt_covariance(
        cov_nn, cov_nx, cov_xx))
    np.testing.assert_allclose(joint, joint.T, rtol=1e-10, atol=0.0)
    ev = np.linalg.eigvalsh(joint / np.sqrt(
        np.outer(np.diag(joint), np.diag(joint))))
    # The two sides use different radial quadratures (GL-z vs the
    # strided lattice), so the rank structure is approximate: allow a
    # tiny negative eigenvalue of the correlation matrix.
    assert ev.min() > -5e-2
    # The cross-correlation is substantial (counts and w(theta) share
    # the footprint modes) but bounded by 1.
    corr = joint[0, 1:] / np.sqrt(joint[0, 0] * np.diag(joint)[1:])
    assert np.all(np.abs(corr) < 1.0)
    assert np.max(np.abs(corr)) > 0.3


def test_counts_jit_vmap_grad():
    f = jax.jit(lambda c, s: clusters.cluster_counts(c, HALO, s,
                                                     Z_EDGES, OMEGA_S))
    n0 = f(COSMO, SEL)
    assert np.isfinite(np.asarray(n0)).all()

    import dataclasses
    batch = jax.vmap(lambda om: clusters.cluster_counts(
        dataclasses.replace(COSMO, omega_m0=om,
                            omega_l0=1.0 - om), HALO, SEL,
        Z_EDGES, OMEGA_S))(jnp.asarray([0.25, 0.278, 0.31]))
    assert np.isfinite(np.asarray(batch)).all()
    # More matter -> more clusters, monotone across the batch.
    assert np.all(np.diff(np.asarray(batch).sum(axis=(1, 2))) > 0)

    g = jax.grad(lambda s8: clusters.cluster_counts(
        dataclasses.replace(COSMO, sigma_8=s8), HALO, SEL,
        Z_EDGES, OMEGA_S).sum())(COSMO.sigma_8)
    assert np.isfinite(float(g)) and float(g) > 0.0  # dN/dsigma8 > 0

    gs = jax.grad(lambda sig: clusters.cluster_counts(
        COSMO, HALO, dataclasses.replace(SEL, sigma_lnm=sig),
        Z_EDGES, OMEGA_S).sum())(SEL.sigma_lnm)
    assert np.isfinite(float(gs))


@pytest.mark.slow
def test_counts_cross_flat_vs_curved():
    """The curved-geometry counts x w(theta) cross block reduces to
    the flat one for a small cap (same footprint area, sub-degree
    bins)."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu.curved import SphericalCapMask
    from chomp_tpu.hod import default_hod
    from chomp_tpu.mask import DiscMask
    from chomp_tpu.projection import DNdzGaussian

    theta_c = np.radians(6.0)
    omega = 2.0 * np.pi * (1.0 - np.cos(theta_c))
    cap = SphericalCapMask(float(theta_c))
    disc = DiscMask(float(np.sqrt(omega / np.pi)))
    hod = default_hod()
    dist = DNdzGaussian(z_min=0.15, z_max=0.8, z0=0.45, sigma_z=0.08)
    model = halo_mod.build_halo_model(COSMO, HALO, hod, 0.45)
    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    edges = np.geomspace(0.1, 0.8, 4)
    flat = np.asarray(clusters.counts_3x2pt_ssc_cross(
        COSMO, HALO, model, sel, (0.3, 0.6), [dist], [], edges, disc,
        geometry="flat", n_z_quad=12))
    curv = np.asarray(clusters.counts_3x2pt_ssc_cross(
        COSMO, HALO, model, sel, (0.3, 0.6), [dist], [], edges, cap,
        geometry="curved", n_z_quad=12, ell_max=4096))
    assert flat.shape == curv.shape == (1, 3)
    np.testing.assert_allclose(curv, flat, rtol=0.08)


def test_selection_hod_cluster_sample():
    """Clusters as a tracer: SelectionHOD through the full halo
    machinery — n_g == shell_density, bias average == nb/n, the
    1-halo gg term vanishes (central-only), and the cluster-matter
    1-halo matches a direct mass integral."""
    from chomp_tpu import halo as halo_mod

    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25), lnm_bias=jnp.asarray(0.05))
    z = 0.4
    hod_c = clusters.selection_hod(sel, 0, z)
    m = halo_mod.build_halo_model(COSMO, HALO, hod_c, z)
    n_ref, nb_ref = clusters.shell_density(COSMO, HALO, sel, z)
    # Two exact GL rules (panel-refined GalaxyPack vs the mass-table
    # rule) on the erfc-edged integrand agree at the quadrature level,
    # ~1e-6 for a sigma_lnm = 0.25 edge at n_mass = 256.
    assert abs(float(m.n_g) / float(n_ref[0]) - 1.0) < 1e-5
    b_avg = float(halo_mod.galaxy_bias_avg(m))
    assert abs(b_avg / (float(nb_ref[0]) / float(n_ref[0])) - 1.0) < 1e-5
    assert 1.5 < b_avg < 6.0      # massive clusters are biased tracers

    k = jnp.asarray([0.05, 0.5, 2.0])
    i1_mm, i1_gg, i1_gm = halo_mod.one_halo_integrals(COSMO, HALO, m, k)
    np.testing.assert_allclose(np.asarray(i1_gg), 0.0, atol=1e-300)
    # Direct referee of the cluster-matter 1-halo on the mass tables:
    # (1/(n_c rho)) ∫ dn/dlnM Phi M y dlnM (y-exponent 1: <N> < 1
    # everywhere so the Scranton switch keeps the single-y branch).
    t = m.mass
    y = halo_mod._y_matrix(COSMO, HALO, m, k)
    phi = hod_c.central_moment(t.m)
    ref = np.asarray(jnp.matmul(
        y, t.w_lnm * t.dndlnm * phi * t.m,
        precision=jax.lax.Precision.HIGHEST)) / (
            float(m.n_g) * float(COSMO.rho_bar))
    np.testing.assert_allclose(np.asarray(i1_gm), ref, rtol=1e-5)
    # P_cm total is positive and lensing-grade finite.
    p_cm = np.asarray(halo_mod.power_gm(COSMO, HALO, m, k))
    assert np.all(p_cm > 0) and np.isfinite(p_cm).all()


@pytest.mark.slow
def test_cluster_lensing_pipeline():
    """Stacked cluster weak lensing gamma_t through make_pipeline with
    the cluster sample as the lens: finite, positive, and LARGER than
    the galaxy-lens gamma_t at the same source sample (clusters are
    more biased and more massive); grads flow through the selection."""
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec
    from chomp_tpu.parallel.sweep import make_pipeline

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32,
                 n_theta=6)
    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    hod_c = clusters.selection_hod(sel, 0, 0.4)
    dist_c = clusters.cluster_dndz_table(COSMO, HALO, sel, 0, 0.25,
                                         0.55, grid=g)
    theta = np.geomspace(0.05, 0.5, 6)
    out_c = make_pipeline(HALO, hod_c, dist_c, theta_deg=theta,
                          z_pivot=0.4, grid=g)(COSMO)
    gt_c = np.asarray(out_c["gamma_t"])
    assert np.isfinite(gt_c).all() and np.all(gt_c > 0)
    from chomp_tpu.projection import DNdzGaussian
    dist_g = DNdzGaussian(z_min=0.25, z_max=0.55, z0=0.4, sigma_z=0.07)
    out_g = make_pipeline(HALO, default_hod(), dist_g, theta_deg=theta,
                          z_pivot=0.4, grid=g)(COSMO)
    assert np.all(gt_c > np.asarray(out_g["gamma_t"]))

    import dataclasses

    def gt0(sig):
        h = dataclasses.replace(hod_c, sigma_lnm=sig)
        return make_pipeline(HALO, h, dist_c, theta_deg=theta,
                             z_pivot=0.4, grid=g)(COSMO)["gamma_t"][0]

    gr = float(jax.grad(gt0)(jnp.asarray(0.25)))
    assert np.isfinite(gr)
