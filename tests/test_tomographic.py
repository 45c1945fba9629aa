"""Tomographic 3x2pt: multi-bin data vector + Gaussian covariance.

Validation strategy: exact reduction to the (already MC-refereed)
single-bin builders, direct gaussian_block spot checks of individual
tomographic blocks, structure (symmetry/PSD), and prediction/vector
ordering consistency.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import covariance, default_halo, projection
from chomp_tpu.params import GridSpec

OMEGA_S = 0.2
N2D = 3.0e7
NS = 4.0e-9


def dist_at(z0, sz, z_max=2.5):
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(z_max),
        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sz))


@pytest.fixture(scope="module")
def setup(fiducial, fiducial_model):
    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32)
    lens = [dist_at(0.4, 0.12), dist_at(0.7, 0.12)]
    src = [dist_at(0.8, 0.2), dist_at(1.2, 0.25)]
    return default_halo(), fiducial_model, lens, src, g


def test_single_bin_reduction(fiducial, setup):
    """nL = nS = 1 tomographic covariance == joint_3x2pt_covariance
    (Gaussian-only) to float roundoff — same blocks, same order."""
    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    tomo = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S,
        [N2D], [NS], grid=g, n_ell_cov_g=1024))
    joint = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, lens[0], src[0], edges, OMEGA_S, N2D, NS,
        grid=g, include_nongaussian=False, n_ell_cov_g=1024))
    np.testing.assert_allclose(tomo, joint, rtol=1e-12, atol=0)


@pytest.mark.slow
def test_single_bin_reduction_nongaussian(fiducial, setup):
    """The connected assembly reduces to joint_3x2pt_covariance's ten
    ng blocks at nL = nS = 1 (every channel-pair -> window/tracer/mu
    mapping identical); 'autos' adds cNG to the diagonal probe blocks
    only."""
    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    nb = len(edges) - 1
    kw = dict(n_k_tri=48, u_stride=8)
    tomo = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S,
        [N2D], [NS], grid=g, n_ell_cov_g=1024,
        include_nongaussian=True, n_ell_cov=48, **kw))
    joint = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, lens[0], src[0], edges, OMEGA_S, N2D, NS,
        grid=g, include_nongaussian=True, n_ell_cov_g=1024,
        n_ell_cov_ng=48, **kw))
    np.testing.assert_allclose(tomo, joint, rtol=1e-10, atol=0)

    gauss = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S,
        [N2D], [NS], grid=g, n_ell_cov_g=1024))
    autos = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S,
        [N2D], [NS], grid=g, n_ell_cov_g=1024,
        include_nongaussian="autos", n_ell_cov=48, **kw))
    # Diagonal probe blocks match the full-cNG matrix; off-diagonal
    # blocks stay Gaussian.
    for p in range(4):
        s = slice(p * nb, (p + 1) * nb)
        np.testing.assert_allclose(autos[s, s], tomo[s, s], rtol=1e-10)
    np.testing.assert_allclose(autos[:nb, nb:2 * nb],
                               gauss[:nb, nb:2 * nb], rtol=1e-12)


@pytest.mark.slow
def test_tomographic_structure_and_blocks(fiducial, setup):
    """2 lens x 2 source bins (12 probes): shape/symmetry/PSD, and two
    spot-checked blocks against direct gaussian_block assembly."""
    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    nb = len(edges) - 1
    cov = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S,
        [N2D, 0.7 * N2D], [NS, 1.4 * NS], grid=g, n_ell_cov_g=1024))
    probes = covariance.tomographic_probes(2, 2)
    n_probe = len(probes)
    assert n_probe == 2 + 4 + 3 + 3
    assert cov.shape == (n_probe * nb, n_probe * nb)
    np.testing.assert_allclose(cov, cov.T, rtol=1e-8)
    assert np.all(np.diag(cov) > 0)
    eig = np.linalg.eigvalsh(0.5 * (cov + cov.T))
    assert np.all(eig > -1e-10 * eig.max()), eig[:4]

    names = [p[0] for p in probes]
    cls = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g)

    def block_of(na, nb_):
        ia, ib = names.index(na), names.index(nb_)
        return cov[ia * nb:(ia + 1) * nb, ib * nb:(ib + 1) * nb]

    # gt_01 x gt_10 cross: (g0, E1) x (g1, E0) — all four pairings are
    # distinct spectra, no noise.
    direct = np.asarray(covariance.gaussian_block(
        cls[("gg", 0, 1)], cls[("kk", 0, 1)], cls[("gk", 0, 0)],
        cls[("gk", 1, 1)], edges, edges, OMEGA_S, 2, 2,
        n_ell_cov=1024))
    np.testing.assert_allclose(block_of("gt_01", "gt_10"), direct,
                               rtol=1e-12)

    # xip_01 x xim_01: EE' - BB' channels.  The AC/BD pairings are
    # same-bin (E0 E0, E1 E1), so BOTH channels carry the nn =
    # sn0 sn1 Weber-Schafheitlin constant — cancelling in the E - B
    # assembly exactly as in the single-bin builder.
    def zero(e):
        return jnp.zeros(len(np.asarray(e)))

    direct_pm = np.asarray(
        covariance.gaussian_block(
            cls[("kk", 0, 0)], cls[("kk", 1, 1)], cls[("kk", 0, 1)],
            cls[("kk", 0, 1)], edges, edges, OMEGA_S, 0, 4,
            NS, 1.4 * NS, 0.0, 0.0, n_ell_cov=1024)
        - covariance.gaussian_block(
            zero, zero, zero, zero, edges, edges, OMEGA_S, 0, 4,
            NS, 1.4 * NS, 0.0, 0.0, n_ell_cov=1024))
    np.testing.assert_allclose(block_of("xip_01", "xim_01"), direct_pm,
                               rtol=1e-12)

    # w_0 x w_1 cross: no shared noise (different lens bins).
    direct_ww = np.asarray(covariance.gaussian_block(
        cls[("gg", 0, 1)], cls[("gg", 0, 1)], cls[("gg", 0, 1)],
        cls[("gg", 0, 1)], edges, edges, OMEGA_S, 0, 0,
        n_ell_cov=1024))
    np.testing.assert_allclose(block_of("w_0", "w_1"), direct_ww,
                               rtol=1e-12)


def test_curved_single_bin_reduction(fiducial, setup):
    """nL = nS = 1 curved tomographic covariance ==
    curved_joint_3x2pt_covariance to float roundoff — block-for-block
    the same curved_gaussian_block calls (incl. the nn_quadrature
    channel-difference on the xi+ x xi- cross)."""
    from chomp_tpu.curved import (SphericalCapMask,
                                  curved_joint_3x2pt_covariance,
                                  curved_tomographic_3x2pt_covariance)

    h, model, lens, src, g = setup
    edges = np.array([1.0, 2.0, 4.0, 8.0])
    cap = SphericalCapMask(np.radians(25.0))
    tomo = np.asarray(curved_tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, [N2D], [NS], cap,
        ell_max=1024, grid=g))
    joint = np.asarray(curved_joint_3x2pt_covariance(
        fiducial, h, model, lens[0], src[0], edges, N2D, NS, cap,
        ell_max=1024, grid=g))
    np.testing.assert_allclose(tomo, joint, rtol=1e-12, atol=0)


@pytest.mark.slow
def test_curved_tomographic_structure(fiducial, setup):
    """2 lens x 2 source bins on a 25-deg cap: shape, symmetry, PSD,
    positive diagonal, and the pseudo-EE/BB channel assembly spot-
    checked on the xip_01 x xim_01 cross block."""
    from chomp_tpu import covariance
    from chomp_tpu.curved import (SphericalCapMask, curved_gaussian_block,
                                  curved_tomographic_3x2pt_covariance)

    h, model, lens, src, g = setup
    edges = np.array([1.0, 2.0, 4.0, 8.0])
    nb = len(edges) - 1
    cap = SphericalCapMask(np.radians(25.0))
    cov = np.asarray(curved_tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, [N2D, 0.7 * N2D],
        [NS, 1.4 * NS], cap, ell_max=1024, grid=g))
    probes = covariance.tomographic_probes(2, 2)
    n_probe = len(probes)
    assert cov.shape == (n_probe * nb, n_probe * nb)
    np.testing.assert_allclose(cov, cov.T, rtol=1e-8)
    assert np.all(np.diag(cov) > 0)
    eig = np.linalg.eigvalsh(0.5 * (cov + cov.T))
    assert np.all(eig > -1e-10 * eig.max()), eig[:4]

    names = [p[0] for p in probes]
    cls = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g)
    ia, ib = names.index("xip_01"), names.index("xim_01")
    got = cov[ia * nb:(ia + 1) * nb, ib * nb:(ib + 1) * nb]

    def zero(e):
        return jnp.zeros(len(np.asarray(e)))

    kw = dict(ell_max=1024, nn_quadrature=True)
    direct = np.asarray(
        curved_gaussian_block(
            cls[("kk", 0, 0)], cls[("kk", 1, 1)], cls[("kk", 0, 1)],
            cls[("kk", 0, 1)], edges, edges, cap, "xip", "xim",
            NS, 1.4 * NS, 0.0, 0.0, **kw)
        - curved_gaussian_block(
            zero, zero, zero, zero, edges, edges, cap, "xip", "xim",
            NS, 1.4 * NS, 0.0, 0.0, **kw))
    np.testing.assert_allclose(got, direct, rtol=1e-12)


@pytest.mark.slow
def test_curved_nongaussian_flat_limit(fiducial, setup):
    """curved_nongaussian_covariance (exact sphere bin factors,
    discrete (2l+1)/4pi sums) reduces to the flat engine (Jbar against
    l dl/2pi, ell-integral to 1e5) at sub-degree bins on a uniform sky,
    for every estimator-code correspondence: 0<->J0, 2<->J2,
    "xip"<->J0, "xim"<->J4."""
    from chomp_tpu import covariance
    from chomp_tpu.curved import curved_nongaussian_covariance
    from chomp_tpu.projection import WindowConvergence, WindowGalaxy

    h, model, lens, src, g = setup
    omega = 0.25
    edges = np.array([0.2, 0.4, 0.8])          # sub-degree bins
    win_g, win_k = WindowGalaxy(dist=lens[0]), WindowConvergence(dist=src[0])
    kw = dict(with_bao=False, grid=g, n_k_tri=48, u_stride=8)
    cases = [((win_g,) * 4, ("g",) * 4, 0, 0, 0, 0),
             ((win_g, win_k, win_g, win_k), ("g", "m", "g", "m"),
              2, 2, 2, 2),
             ((win_k,) * 4, ("m",) * 4, 0, 0, "xip", "xip"),
             ((win_k,) * 4, ("m",) * 4, 4, 4, "xim", "xim"),
             ((win_g, win_g, win_k, win_k), ("g", "g", "m", "m"),
              0, 4, 0, "xim")]
    for ws, ts, mf_i, mf_j, mc_i, mc_j in cases:
        flat = np.asarray(covariance.nongaussian_covariance(
            fiducial, h, model, lens[0], edges, omega, windows=ws,
            tracers=ts, mu_i=mf_i, mu_j=mf_j, n_ell_cov=96, **kw))
        curved = np.asarray(curved_nongaussian_covariance(
            fiducial, h, model, lens[0], edges, omega, windows=ws,
            tracers=ts, mu_i=mc_i, mu_j=mc_j, ell_max=8192, **kw))
        scale = np.abs(flat).max()
        np.testing.assert_allclose(curved / scale, flat / scale,
                                   atol=0.03,
                                   err_msg=f"codes {mc_i},{mc_j}")


@pytest.mark.slow
def test_curved_tomographic_ng_reduction(fiducial, setup):
    """The curved tomographic cNG assembly (exact sphere bin factors)
    reduces to curved_joint_3x2pt_covariance(include_nongaussian=True)
    at nL = nS = 1."""
    from chomp_tpu.curved import (SphericalCapMask,
                                  curved_joint_3x2pt_covariance,
                                  curved_tomographic_3x2pt_covariance)

    h, model, lens, src, g = setup
    edges = np.array([1.0, 2.0, 4.0])
    cap = SphericalCapMask(np.radians(25.0))
    kw = dict(ell_max=1024, grid=g)
    ngk = dict(n_k_tri=48, u_stride=8)
    tomo = np.asarray(curved_tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, [N2D], [NS], cap,
        include_nongaussian=True, **kw, **ngk))
    joint = np.asarray(curved_joint_3x2pt_covariance(
        fiducial, h, model, lens[0], src[0], edges, N2D, NS, cap,
        include_nongaussian=True, **kw, **ngk))
    np.testing.assert_allclose(tomo, joint, rtol=1e-10, atol=0)


def test_curved_tomographic_pipeline(fiducial, setup):
    """geometry="curved": shapes, and nL=nS=1 equality with
    make_pipeline(geometry="curved", include_shear=True)."""
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import (make_pipeline,
                                          make_tomographic_pipeline)

    h, model, lens, src, _ = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    hod = default_hod()
    fn = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                   z_pivot=0.6, geometry="curved")
    out = jax.jit(fn)(fiducial)
    assert out["w_theta"].shape == (2, 6)
    assert out["xi_minus"].shape == (3, 6)
    assert np.all(np.isfinite(np.asarray(out["vector"])))

    fn1 = make_tomographic_pipeline(h, hod, lens[:1], lens[:1],
                                    grid=tiny, z_pivot=0.6,
                                    geometry="curved")
    ref = make_pipeline(h, hod, lens[0], grid=tiny, z_pivot=0.6,
                        include_shear=True, geometry="curved")
    a, b = fn1(fiducial), ref(fiducial)
    for key, row in (("w_theta", "w_theta"), ("gamma_t", "gamma_t"),
                     ("xi_plus", "xi_plus"), ("xi_minus", "xi_minus")):
        np.testing.assert_allclose(np.asarray(a[key][0]),
                                   np.asarray(b[row]), rtol=1e-12)


def test_tomographic_pipeline(fiducial, setup):
    """Prediction: shapes, vector ordering == probe order, nL=nS=1
    equality with make_pipeline(include_shear=True), vmap == loop."""
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import (broadcast_cosmo, make_pipeline,
                                          make_tomographic_pipeline)

    h, model, lens, src, _ = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    hod = default_hod()
    fn = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                   z_pivot=0.6)
    out = jax.jit(fn)(fiducial)
    nb = 6
    assert out["w_theta"].shape == (2, nb)
    assert out["gamma_t"].shape == (4, nb)
    assert out["xi_plus"].shape == (3, nb)
    assert out["xi_minus"].shape == (3, nb)
    assert out["vector"].shape == (12 * nb,)
    np.testing.assert_allclose(
        np.asarray(out["vector"][:2 * nb]),
        np.asarray(out["w_theta"]).ravel(), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(out["vector"][6 * nb:9 * nb]),
        np.asarray(out["xi_plus"]).ravel(), rtol=1e-14)

    # single-bin equality with the flagship single-sample pipeline
    fn1 = make_tomographic_pipeline(h, hod, lens[:1], lens[:1],
                                    grid=tiny, z_pivot=0.6)
    ref = make_pipeline(h, hod, lens[0], grid=tiny, z_pivot=0.6,
                        include_shear=True)
    a, b = fn1(fiducial), ref(fiducial)
    np.testing.assert_allclose(np.asarray(a["w_theta"][0]),
                               np.asarray(b["w_theta"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["gamma_t"][0]),
                               np.asarray(b["gamma_t"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["xi_minus"][0]),
                               np.asarray(b["xi_minus"]), rtol=1e-12)

    om = jnp.asarray([0.26, 0.30])
    batch = broadcast_cosmo(fiducial, omega_m0=om)
    vm = jax.vmap(fn)(batch)
    single = fn(jax.tree.map(lambda x: x[1], batch))
    np.testing.assert_allclose(np.asarray(vm["vector"])[1],
                               np.asarray(single["vector"]), rtol=1e-10)


def test_power_gg_cross(fiducial):
    """Cross-sample clustering spectrum: 2-halo part equals the auto
    2-halo for identical HODs (same h_g); near-disjoint occupations
    kill the 1-halo cross (product moment ~ 0); mass-resolution
    convergence of the cross pack."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import default_halo
    from chomp_tpu.hod import default_hod

    h = default_halo()
    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32)
    hod_a = default_hod()
    hod_b = default_hod(log10_m_min=13.2, log10_m_0=13.2,
                        log10_m_1p=14.4)
    ma, mb = halo_mod.build_halo_models(fiducial, h, [hod_a, hod_b],
                                        0.0, False, g)
    k = jnp.asarray([1e-3, 1e-2, 0.1, 1.0, 10.0])
    cross_aa = np.asarray(halo_mod.power_gg_cross(fiducial, h, ma, ma,
                                                  k, grid=g))
    auto_a = np.asarray(halo_mod.power_gg(fiducial, h, ma, k, grid=g))
    # Identical HODs share h_g exactly, so cross - auto is purely the
    # 1-halo convention gap (<N>^2 vs <N(N-1)>) — a k-independent
    # constant while y ~ 1 (k r_vir << 1).  2.3% of the total at
    # k=1e-3 here, so test the CONSTANCY of the difference, not
    # closeness of the totals.
    d01 = cross_aa[:2] - auto_a[:2]
    np.testing.assert_allclose(d01[0], d01[1], rtol=1e-2)
    assert abs(d01[0]) > 0  # the conventions genuinely differ
    assert not np.allclose(cross_aa[-1], auto_a[-1], rtol=1e-3)

    # Symmetry in the sample order.
    c_ab = np.asarray(halo_mod.power_gg_cross(fiducial, h, ma, mb, k,
                                              grid=g))
    c_ba = np.asarray(halo_mod.power_gg_cross(fiducial, h, mb, ma, k,
                                              grid=g))
    np.testing.assert_allclose(c_ab, c_ba, rtol=1e-10)

    # Independent-rule referee for the 1-halo cross: uniform-grid
    # Simpson (8193 nodes, pointwise product-moment switch) vs the
    # panel-GL pack.  pp_cross = c_ab - 2h since the 2h parts are the
    # exact shared h_g contractions.
    from chomp_tpu import linear, profiles
    from chomp_tpu.halo import linear_power, two_halo_integrals
    from chomp_tpu.mass import f_nu_raw

    p_lin = np.asarray(linear_power(fiducial, ma, k, False, g))
    _, hg_a = two_halo_integrals(fiducial, h, ma, k)
    _, hg_b = two_halo_integrals(fiducial, h, mb, k)
    two_h = p_lin * np.asarray(hg_a) * np.asarray(hg_b)

    t = ma.mass
    ln = np.linspace(float(t.ln_m[0]), float(t.ln_m[-1]), 8193)
    m = jnp.asarray(np.exp(ln))
    r = linear.radius_of_mass(fiducial, m)
    s2_un, ds2 = linear.sigma2_unnorm_r_and_dlnr(fiducial, r, False, g)
    norm = linear.power_norm(fiducial, False, g)
    sigma = np.sqrt(norm * np.asarray(s2_un)) * float(t.growth)
    nu = (float(t.delta_c) / sigma) ** 2
    dnu = -nu * np.asarray(ds2) / (3.0 * np.asarray(s2_un))
    f_n = float(t.f_norm) * np.asarray(f_nu_raw(h, jnp.asarray(nu)))
    dndlnm = f_n * (float(fiducial.rho_bar) / np.asarray(m)) * dnu
    na_nb = (np.asarray(hod_a.first_moment(m))
             * np.asarray(hod_b.first_moment(m)))
    y = np.asarray(profiles.y_nfw(fiducial, h, k[:, None], m[None, :],
                                  ma.m_star, t.z))
    y_e = np.where(na_nb[None, :] < 1.0, y, y * y)
    from scipy.integrate import simpson
    pp_ref = simpson(y_e * (dndlnm * na_nb)[None, :], x=ln, axis=1) / (
        float(ma.n_g) * float(mb.n_g))
    np.testing.assert_allclose(np.asarray(c_ab) - two_h, pp_ref,
                               rtol=2e-4)

    # Quadrature convergence: doubling n_mass moves the cross < 1e-6.
    g2 = GridSpec(n_mass=256, n_mu=8, sigma_panels=8,
                  sigma_n_per_panel=32, n_growth=32, n_dist=32)
    ma2, mb2 = halo_mod.build_halo_models(fiducial, h, [hod_a, hod_b],
                                          0.0, False, g2)
    c2 = np.asarray(halo_mod.power_gg_cross(fiducial, h, ma2, mb2, k,
                                            grid=g2))
    np.testing.assert_allclose(c_ab, c2, rtol=5e-5)


def test_per_bin_hods(fiducial, setup):
    """Per-lens-bin HODs through the pipeline and the covariance
    callables: each bin's rows equal the single-HOD pipeline built with
    that bin's HOD; shear rows are HOD-independent; the ("gg", 0, 1)
    callable equals power_gg_cross through the Limber projection."""
    from chomp_tpu import covariance
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import make_pipeline, make_tomographic_pipeline

    h, _model, lens, src, g = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    hod_a = default_hod()
    hod_b = default_hod(log10_m_min=12.6, log10_m_0=12.6,
                        log10_m_1p=13.9, alpha=1.05)
    fn = make_tomographic_pipeline(h, [hod_a, hod_b], lens, src,
                                   grid=tiny, z_pivot=0.6)
    out = jax.jit(fn)(fiducial)
    assert out["n_g"].shape == (2,)

    for i, hod_i in enumerate((hod_a, hod_b)):
        ref = make_pipeline(h, hod_i, lens[i], grid=tiny, z_pivot=0.6)
        b = ref(fiducial)
        np.testing.assert_allclose(np.asarray(out["w_theta"][i]),
                                   np.asarray(b["w_theta"]), rtol=1e-12)
    # gamma_t row (i=1, j=0) uses hod_b's gm spectrum with src window 0.
    ref_b = make_pipeline(h, hod_b, lens[1], grid=tiny, z_pivot=0.6)
    # (different dist for gt's source side — just check finiteness and
    # that the two lens bins' gt rows differ, i.e. the HOD routed)
    gt = np.asarray(out["gamma_t"])
    assert np.all(np.isfinite(gt))
    assert not np.allclose(gt[0], gt[2], rtol=1e-3)

    # Covariance callables: per-bin gg cross == direct Limber of
    # power_gg_cross on the lattice.
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import limber_fft
    from chomp_tpu.projection import WindowGalaxy

    models = halo_mod.build_halo_models(fiducial, h, [hod_a, hod_b],
                                        0.6, False, g)
    cls = covariance.tomographic_lattice_cl_callables(
        fiducial, h, models, lens, src, grid=g)
    ells = np.array([20.0, 100.0, 500.0])
    got = np.asarray(cls[("gg", 0, 1)](ells))
    p_cross = limber_fft.p_lattice_tomographic(
        fiducial, h, models, False, g)[("power_gg", 0, 1)]
    want = np.asarray(limber_fft.limber_cl_fft(
        fiducial, WindowGalaxy(dist=lens[0]), WindowGalaxy(dist=lens[1]),
        ells, p_cross, g, growth_pivot=models[0].mass.growth))
    np.testing.assert_allclose(got, want, rtol=1e-12)


@pytest.mark.slow
def test_per_bin_cng(fiducial, setup):
    """Connected covariance with per-bin HOD models: a list of the SAME
    model object twice adds exactly the single-sample cNG increment
    (every auto block's legs bind one sample); two distinct HODs give a
    finite symmetric matrix whose w0 x w1 cross block equals the direct
    nongaussian_covariance call with per-leg models (A,A,B,B)."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu.hod import default_hod

    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    nb = len(edges) - 1
    kw = dict(n_k_tri=48, u_stride=8, n_ell_cov=48)
    args = (edges, OMEGA_S, [N2D], [NS])

    def cov(m, ng):
        return np.asarray(covariance.tomographic_3x2pt_covariance(
            fiducial, h, m, lens, src[:1], *args, grid=g,
            n_ell_cov_g=1024, include_nongaussian=ng,
            **(kw if ng else {})))

    # Same object twice: the cNG INCREMENT (autos) must equal the
    # single-sample one exactly — every auto block's galaxy legs bind
    # the same sample, so the engine takes the single-sample path.
    inc_list = cov([model, model], "autos") - cov([model, model], False)
    inc_one = cov(model, "autos") - cov(model, False)
    np.testing.assert_allclose(inc_list, inc_one, rtol=1e-12, atol=0)

    # Distinct samples: full cNG matrix, spot-check the w0 x w1 block
    # against the direct per-leg-model engine call.
    hod_b = default_hod(log10_m_min=12.6, log10_m_0=12.6,
                        log10_m_1p=13.9, alpha=1.05)
    models = halo_mod.build_halo_models(fiducial, h,
                                        [default_hod(), hod_b], 0.0,
                                        False, g)
    full = cov(models, True)
    gauss = cov(models, False)
    assert np.all(np.isfinite(full))
    np.testing.assert_allclose(full, full.T, rtol=1e-10)
    w01_inc = (full - gauss)[0:nb, nb:2 * nb]
    wg = [projection.WindowGalaxy(dist=d) for d in lens]
    direct = np.asarray(covariance.nongaussian_covariance(
        fiducial, h, (models[0], models[0], models[1], models[1]),
        lens[0], edges, OMEGA_S,
        windows=(wg[0], wg[0], wg[1], wg[1]),
        tracers=("g", "g", "g", "g"), mu_i=0, mu_j=0, grid=g, **kw))
    np.testing.assert_allclose(w01_inc, direct, rtol=1e-10, atol=0)


@pytest.mark.slow
def test_cng_at_nuisance(fiducial, setup):
    """Connected blocks at the fiducial nuisance vector: zero nuisance
    reduces exactly to nuisance=None; a pure shear-m vector scales each
    cNG auto increment by (1+m) per E leg — (1+m)^4 on the xi+ auto,
    (1+m)^2 on gamma_t, untouched on w — while a photo-z shift moves
    the w-auto increment."""
    from chomp_tpu.parallel.sweep import default_nuisance

    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    nb = len(edges) - 1
    kw = dict(n_k_tri=48, u_stride=8, n_ell_cov=48)
    nu0 = default_nuisance(1, 1)

    def inc(nuis):
        a = np.asarray(covariance.tomographic_3x2pt_covariance(
            fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S,
            [N2D], [NS], grid=g, n_ell_cov_g=1024,
            include_nongaussian="autos", nuisance=nuis, **kw))
        b = np.asarray(covariance.tomographic_3x2pt_covariance(
            fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S,
            [N2D], [NS], grid=g, n_ell_cov_g=1024, nuisance=nuis))
        return a - b

    base = inc(None)
    np.testing.assert_allclose(inc(nu0), base, rtol=1e-12, atol=0)

    m = 0.05
    nu_m = dataclasses.replace(nu0, m=jnp.asarray([m]))
    got = inc(nu_m)
    # probe order: w_0, gt_00, xip_00, xim_00 (nb bins each).
    blk = lambda c, i: c[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb]
    np.testing.assert_allclose(blk(got, 0), blk(base, 0), rtol=1e-12,
                               atol=0)
    np.testing.assert_allclose(blk(got, 1), (1 + m) ** 2 * blk(base, 1),
                               rtol=1e-11, atol=0)
    np.testing.assert_allclose(blk(got, 2), (1 + m) ** 4 * blk(base, 2),
                               rtol=1e-11, atol=0)
    np.testing.assert_allclose(blk(got, 3), (1 + m) ** 4 * blk(base, 3),
                               rtol=1e-11, atol=0)

    nu_dz = dataclasses.replace(nu0, dz_lens=jnp.asarray([0.05]))
    got_dz = inc(nu_dz)
    assert not np.allclose(blk(got_dz, 0), blk(base, 0), rtol=1e-3,
                           atol=0)


def test_nuisance_pipeline(fiducial, setup):
    """with_nuisance: zero nuisance reduces exactly to the plain
    pipeline; shear m scales gt/xi rows exactly; DNdzShifted equals a
    hand-shifted distribution to roundoff; IA moves source-window rows
    only; the NLA window matches its closed formula; grads flow."""
    from chomp_tpu import background, projection
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import (Nuisance3x2pt, default_nuisance,
                                          make_tomographic_pipeline)

    h, _m, lens, src, _g = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    hod = default_hod()
    fn0 = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                    z_pivot=0.6)
    fn = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                   z_pivot=0.6, with_nuisance=True)
    nu0 = default_nuisance(2, 2)
    a, b = fn(fiducial, nu0), fn0(fiducial)
    np.testing.assert_allclose(np.asarray(a["vector"]),
                               np.asarray(b["vector"]), rtol=1e-13)

    # Multiplicative shear calibration: exact row scalings.
    m = jnp.asarray([0.02, -0.03])
    am = fn(fiducial, dataclasses.replace(nu0, m=m))
    np.testing.assert_allclose(np.asarray(am["w_theta"]),
                               np.asarray(b["w_theta"]), rtol=1e-13)
    cal = np.asarray(1.0 + m)
    gt0 = np.asarray(b["gamma_t"]).reshape(2, 2, -1)
    gtm = np.asarray(am["gamma_t"]).reshape(2, 2, -1)
    np.testing.assert_allclose(gtm, gt0 * cal[None, :, None], rtol=1e-13)
    pairs = [(0, 0), (0, 1), (1, 1)]
    for r, (j, k) in enumerate(pairs):
        np.testing.assert_allclose(
            np.asarray(am["xi_plus"][r]),
            np.asarray(b["xi_plus"][r]) * cal[j] * cal[k], rtol=1e-13)

    # Photo-z shift == a hand-shifted distribution (same support
    # translation), to roundoff.
    dz = 0.04
    adz = fn(fiducial, dataclasses.replace(
        nu0, dz_lens=jnp.asarray([dz, 0.0])))
    lens_shift = projection.DNdzGaussian(
        z_min=lens[0].z_min + dz, z_max=lens[0].z_max + dz,
        z0=lens[0].z0 + dz, sigma_z=lens[0].sigma_z)
    fn_ref = make_tomographic_pipeline(h, hod, [lens_shift, lens[1]],
                                       src, grid=tiny, z_pivot=0.6)
    ref = fn_ref(fiducial)
    np.testing.assert_allclose(np.asarray(adz["w_theta"]),
                               np.asarray(ref["w_theta"]), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(adz["gamma_t"]),
                               np.asarray(ref["gamma_t"]), rtol=1e-11)

    # IA enters SOURCE windows only: w rows untouched, gt/xi moved.
    aia = fn(fiducial, dataclasses.replace(nu0, a_ia=jnp.asarray(1.0)))
    np.testing.assert_allclose(np.asarray(aia["w_theta"]),
                               np.asarray(b["w_theta"]), rtol=1e-13)
    assert not np.allclose(np.asarray(aia["gamma_t"]),
                           np.asarray(b["gamma_t"]), rtol=1e-4)
    assert not np.allclose(np.asarray(aia["xi_plus"]),
                           np.asarray(b["xi_plus"]), rtol=1e-4)

    # NLA window closed-formula referee.
    win = projection.WindowConvergenceIA(
        dist=src[0], a_ia=jnp.asarray(0.7), eta_ia=jnp.asarray(1.5),
        z0_ia=jnp.asarray(0.62))
    z = jnp.asarray([0.3, 0.8, 1.3])
    got = np.asarray(win.window_z(fiducial, z, tiny)
                     - projection.WindowConvergence(dist=src[0])
                     .window_z(fiducial, z, tiny))
    d = np.asarray(background.growth_factor(fiducial, z, tiny.n_growth))
    want = (-0.7 * projection.C1_RHOCRIT * fiducial.omega_m0 / d
            * ((1 + np.asarray(z)) / 1.62) ** 1.5
            * np.asarray(projection.dndz(src[0], z, tiny))
            * np.asarray(background.ez(fiducial, z))
            / np.asarray(projection.C_OVER_H0))
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # Gradients flow through every nuisance.
    def loss(nu):
        return jnp.sum(fn(fiducial, nu)["vector"] ** 2)

    g = jax.grad(loss)(dataclasses.replace(
        nu0, a_ia=jnp.asarray(0.5), m=jnp.asarray([0.01, 0.01])))
    assert np.isfinite(float(g.a_ia)) and abs(float(g.a_ia)) > 0
    assert np.all(np.isfinite(np.asarray(g.dz_src)))
    assert np.all(np.abs(np.asarray(g.m)) > 0)
    assert np.all(np.abs(np.asarray(g.dz_lens)) > 0)


def test_nuisance_covariance(fiducial, setup):
    """Covariance at a fiducial nuisance vector: zero nuisance equals
    nuisance=None exactly; shear m scales the C_l callables exactly
    (gk x (1+m_j), kk x (1+m_j)(1+m_k), gg untouched); IA moves kk/gk
    only; the full matrix stays PSD."""
    from chomp_tpu.parallel.sweep import default_nuisance

    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    nu0 = default_nuisance(2, 2)
    base = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024))
    zero = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024, nuisance=nu0))
    np.testing.assert_allclose(zero, base, rtol=1e-13, atol=0)

    m = jnp.asarray([0.03, -0.02])
    nu_m = dataclasses.replace(nu0, m=m)
    cls0 = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g)
    cls_m = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g, nuisance=nu_m)
    ells = np.array([30.0, 300.0])
    cal = np.asarray(1.0 + m)
    np.testing.assert_allclose(np.asarray(cls_m[("gg", 0, 1)](ells)),
                               np.asarray(cls0[("gg", 0, 1)](ells)),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(cls_m[("gk", 1, 0)](ells)),
                               cal[0] * np.asarray(cls0[("gk", 1, 0)](ells)),
                               rtol=1e-13)
    np.testing.assert_allclose(np.asarray(cls_m[("kk", 0, 1)](ells)),
                               cal[0] * cal[1]
                               * np.asarray(cls0[("kk", 0, 1)](ells)),
                               rtol=1e-13)

    nu_ia = dataclasses.replace(nu0, a_ia=jnp.asarray(1.0))
    cls_ia = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g, nuisance=nu_ia)
    np.testing.assert_allclose(np.asarray(cls_ia[("gg", 0, 0)](ells)),
                               np.asarray(cls0[("gg", 0, 0)](ells)),
                               rtol=1e-13)
    kk_ia = np.asarray(cls_ia[("kk", 0, 0)](ells))
    kk_0 = np.asarray(cls0[("kk", 0, 0)](ells))
    # atol=0: the C_ls are ~1e-8, inside allclose's default atol.
    assert not np.allclose(kk_ia, kk_0, rtol=1e-4, atol=0), (kk_ia, kk_0)

    full = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024,
        nuisance=dataclasses.replace(nu_m, a_ia=jnp.asarray(0.8),
                                     dz_src=jnp.asarray([0.02, -0.02]))))
    eig = np.linalg.eigvalsh(0.5 * (full + full.T))
    assert np.all(np.isfinite(full)) and eig[0] > -1e-10 * eig[-1]
    assert not np.allclose(full, base, rtol=1e-3, atol=0)


def test_magnification_covariance(fiducial, setup):
    """include_magnification in the COVARIANCE spectra: alpha = 1
    reduces exactly to the nuisance-only callables; alpha != 1 matches
    the manual per-term assembly (gg: 4 terms, gk: 2 terms, each with
    its own halo spectrum through limber_cl_fft); kk is untouched; the
    full matrix stays PSD; nuisance=None raises."""
    from chomp_tpu import limber_fft
    from chomp_tpu.parallel.sweep import default_nuisance

    h, model, lens, src, g = setup
    ells = np.array([30.0, 300.0])
    nu0 = default_nuisance(2, 2)
    cls0 = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g)
    cls1 = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g, nuisance=nu0,
        include_magnification=True)
    for key in (("gg", 0, 1), ("gk", 1, 0), ("kk", 0, 0)):
        np.testing.assert_allclose(np.asarray(cls1[key](ells)),
                                   np.asarray(cls0[key](ells)),
                                   rtol=1e-12, atol=0)

    alpha = jnp.asarray([1.8, 0.4])
    nu_a = dataclasses.replace(nu0, alpha_lens=alpha)
    cls_a = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, grid=g, nuisance=nu_a,
        include_magnification=True)
    c = 2.0 * (np.asarray(alpha) - 1.0)
    p_lat = limber_fft.p_lattice_halo_all(fiducial, h, model, False, g)
    piv = model.mass.growth
    wg = [projection.WindowGalaxy(dist=d) for d in lens]
    wkl = [projection.WindowConvergence(dist=d) for d in lens]
    wk = [projection.WindowConvergence(dist=d) for d in src]

    def cl(wa, wb, kind):
        return np.asarray(limber_fft.limber_cl_fft(
            fiducial, wa, wb, ells, p_lat[kind], g, growth_pivot=piv))

    want_gg = (cl(wg[0], wg[1], "power_gg")
               + c[1] * cl(wg[0], wkl[1], "power_gm")
               + c[0] * cl(wg[1], wkl[0], "power_gm")
               + c[0] * c[1] * cl(wkl[0], wkl[1], "power_mm"))
    np.testing.assert_allclose(np.asarray(cls_a[("gg", 0, 1)](ells)),
                               want_gg, rtol=1e-11, atol=0)
    want_gk = (cl(wg[1], wk[0], "power_gm")
               + c[1] * cl(wkl[1], wk[0], "power_mm"))
    np.testing.assert_allclose(np.asarray(cls_a[("gk", 1, 0)](ells)),
                               want_gk, rtol=1e-11, atol=0)
    np.testing.assert_allclose(np.asarray(cls_a[("kk", 0, 1)](ells)),
                               np.asarray(cls0[("kk", 0, 1)](ells)),
                               rtol=1e-12, atol=0)

    edges = np.logspace(-1.5, 0, 4)
    base = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024))
    full = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024, nuisance=nu_a,
        include_magnification=True))
    eig = np.linalg.eigvalsh(0.5 * (full + full.T))
    assert np.all(np.isfinite(full)) and eig[0] > -1e-10 * eig[-1]
    # atol=0: raw covariance entries sit inside allclose's default atol.
    assert not np.allclose(full, base, rtol=1e-4, atol=0)

    with pytest.raises(ValueError, match="alpha_lens"):
        covariance.tomographic_lattice_cl_callables(
            fiducial, h, model, lens, src, grid=g,
            include_magnification=True)


def test_magnification_bias(fiducial, setup):
    """include_magnification: alpha=1 reduces exactly to the plain
    nuisance pipeline; for alpha != 1 the w/gt rows match the manual
    three-term assembly w_gg + 2c w_gk + c^2 w_kk (each term its own
    spectrum through limber_wtheta_fft); grads flow through alpha."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import limber_fft, projection
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import (default_nuisance,
                                          make_tomographic_pipeline)

    h, _m, lens, src, _g = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    hod = default_hod()
    fn = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                   z_pivot=0.6, with_nuisance=True,
                                   include_magnification=True)
    fn_plain = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                         z_pivot=0.6, with_nuisance=True)
    nu0 = default_nuisance(2, 2)
    np.testing.assert_allclose(
        np.asarray(fn(fiducial, nu0)["vector"]),
        np.asarray(fn_plain(fiducial, nu0)["vector"]), rtol=1e-13)

    alpha = jnp.asarray([2.3, 0.6])
    nu = dataclasses.replace(nu0, alpha_lens=alpha)
    out = fn(fiducial, nu)
    base = fn_plain(fiducial, nu0)
    # xi rows carry no lens magnification.
    np.testing.assert_allclose(np.asarray(out["xi_plus"]),
                               np.asarray(base["xi_plus"]), rtol=1e-13)

    model = halo_mod.build_halo_model(fiducial, h, hod, 0.6, False,
                                      tiny)
    p_all = limber_fft.p_lattice_halo_all(fiducial, h, model, False,
                                          tiny)
    piv = model.mass.growth
    theta = np.asarray(base["theta_deg"])
    for i in range(2):
        c = 2.0 * (float(alpha[i]) - 1.0)
        wg = projection.WindowGalaxy(dist=lens[i])
        wkl = projection.WindowConvergence(dist=lens[i])

        def wt(wa, wb, kind, mu):
            return np.asarray(limber_fft.limber_wtheta_fft(
                fiducial, wa, wb, theta, p_all[kind], tiny, mu=mu,
                growth_pivot=piv))

        want_w = (wt(wg, wg, "power_gg", 0.0)
                  + 2.0 * c * wt(wg, wkl, "power_gm", 0.0)
                  + c * c * wt(wkl, wkl, "power_mm", 0.0))
        np.testing.assert_allclose(np.asarray(out["w_theta"][i]),
                                   want_w, rtol=1e-11)
        for j in range(2):
            wk = projection.WindowConvergence(dist=src[j])
            want_gt = (wt(wk, wg, "power_gm", 2.0)
                       + c * wt(wk, wkl, "power_mm", 2.0))
            np.testing.assert_allclose(
                np.asarray(out["gamma_t"][i * 2 + j]), want_gt,
                rtol=1e-11)

    g = jax.grad(lambda n: jnp.sum(fn(fiducial, n)["vector"] ** 2))(nu)
    assert np.all(np.abs(np.asarray(g.alpha_lens)) > 0)


def test_fused_rows_equal_per_row(fiducial, setup):
    """_fused_probe_rows (one grouped conv + per-operator fused
    contractions) == the per-row limber_wtheta_fft /
    curved_wtheta_fft calls at float roundoff, flat and curved —
    pins the batched pipelines to the referee-anchored per-row
    routes."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import limber_fft, projection
    from chomp_tpu.curved import curved_wtheta_fft
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import _fused_probe_rows

    h, _m, lens, src, _g = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    theta = np.asarray([0.1, 0.3, 1.0, 3.0])
    model = halo_mod.build_halo_model(fiducial, h, default_hod(), 0.6,
                                      False, tiny)
    p_all = limber_fft.p_lattice_halo_all(fiducial, h, model, False,
                                          tiny)
    piv = model.mass.growth
    wg = projection.WindowGalaxy(dist=lens[0])
    wk = projection.WindowConvergence(dist=src[1])
    rows = [(wg, wg, p_all["power_gg"], [(0.0, None)]),
            (wk, wg, p_all["power_gm"], [(2.0, None)]),
            (wk, wk, p_all["power_mm"], [(0.0, None), (4.0, None)])]
    outs = _fused_probe_rows(fiducial, tiny, piv, theta, rows, "flat")
    for (wa, wb, p, specs), got_list in zip(rows, outs):
        for (mu, _stat), got in zip(specs, got_list):
            want = limber_fft.limber_wtheta_fft(
                fiducial, wa, wb, theta, p, tiny, mu=mu,
                growth_pivot=piv)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want), rtol=1e-12)

    rows_c = [(wg, wg, p_all["power_gg"], [(0.0, None)]),
              (wk, wg, p_all["power_gm"], [(2.0, None)]),
              (wk, wk, p_all["power_mm"],
               [(0.0, "xip"), (4.0, "xim")])]
    outs_c = _fused_probe_rows(fiducial, tiny, piv, theta, rows_c,
                               "curved")
    for (wa, wb, p, specs), got_list in zip(rows_c, outs_c):
        for (mu, stat), got in zip(specs, got_list):
            want = curved_wtheta_fft(fiducial, wa, wb, theta, p, tiny,
                                     mu=mu, growth_pivot=piv, stat=stat)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(want), rtol=1e-12)


def test_tomographic_exact_z(fiducial, setup):
    """exact_z_anchors: nL=nS=1 equality with the exact-z
    make_pipeline (shared Chebyshev anchors), finite 2x2 vector, and
    no separable-bias warning emitted."""
    import warnings

    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import make_pipeline, make_tomographic_pipeline

    h, model, lens, src, _ = setup
    tiny = GridSpec(n_k=64, n_mass=64, n_ell=256, n_theta=6,
                    lattice_dln=0.08)
    hod = default_hod()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        fn = make_tomographic_pipeline(h, hod, lens, src, grid=tiny,
                                       exact_z_anchors=4)
    out = fn(fiducial)
    assert np.all(np.isfinite(np.asarray(out["vector"])))

    fn1 = make_tomographic_pipeline(h, hod, src[1:], src[1:], grid=tiny,
                                    exact_z_anchors=4)
    ref = make_pipeline(h, hod, src[1], grid=tiny, exact_z_anchors=4,
                        include_shear=True)
    a, b = fn1(fiducial), ref(fiducial)
    np.testing.assert_allclose(np.asarray(a["w_theta"][0]),
                               np.asarray(b["w_theta"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["gamma_t"][0]),
                               np.asarray(b["gamma_t"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["xi_plus"][0]),
                               np.asarray(b["xi_plus"]), rtol=1e-12)

    # Curved + exact-z: the remaining route combination.
    fn1c = make_tomographic_pipeline(h, hod, src[1:], src[1:], grid=tiny,
                                     exact_z_anchors=4,
                                     geometry="curved")
    refc = make_pipeline(h, hod, src[1], grid=tiny, exact_z_anchors=4,
                         include_shear=True, geometry="curved")
    ac, bc = fn1c(fiducial), refc(fiducial)
    np.testing.assert_allclose(np.asarray(ac["w_theta"][0]),
                               np.asarray(bc["w_theta"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ac["xi_minus"][0]),
                               np.asarray(bc["xi_minus"]), rtol=1e-12)
