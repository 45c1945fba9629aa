"""Tomographic 3x2pt: multi-bin data vector + Gaussian covariance.

Validation strategy: exact reduction to the (already MC-refereed)
single-bin builders, direct gaussian_block spot checks of individual
tomographic blocks, structure (symmetry/PSD), and prediction/vector
ordering consistency.
"""

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
