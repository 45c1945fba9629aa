"""Tomographic harmonic-space surface (bandpowers.make_bandpower_pipeline
+ tomographic_bandpower_covariance).

Referee strategy: the MASTER primitives themselves are refereed in
test_bandpowers.py (independent Racah 3j algebra, exact identities,
scalar-field MC); here we pin the TOMOGRAPHIC assembly with
  1. wiring identities — pipeline band powers vs a direct F @ C_l
     evaluation on the integer multipoles (bounds the Catmull-Rom
     table error through the real halo-model C_ell), covariance
     blocks vs hand-assembled bandpower_gaussian_block calls;
  2. exact reductions — full-sky Gaussian covariance, exact (1+m)
     calibration scalings, cmb_lensing=None consistency;
  3. structural checks — symmetry, positive diagonals, probe order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import bandpowers as bp
from chomp_tpu import covariance, projection
from chomp_tpu.curved import ProfileCurvedMask, UniformSphereMask
from chomp_tpu.halo import build_halo_model
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec, default_halo

LMAX = 96
EDGES = [4, 16, 32, 56, 90]


def tiny_grid():
    return GridSpec(n_k=64, n_mass=64, n_ell=256, n_mu=8,
                    sigma_panels=8, sigma_n_per_panel=32, n_growth=32,
                    n_dist=32, lattice_dln=0.08)


def mkdist(z0, sz):
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sz))


@pytest.fixture(scope="module")
def fiducial():
    from chomp_tpu import default_cosmo

    return default_cosmo()


@pytest.fixture(scope="module")
def apod_mask():
    th = np.linspace(0.0, 0.8, 81)
    return ProfileCurvedMask(th, np.clip((0.8 - th) / 0.3, 0.0, 1.0),
                             lmax_mask=128)


@pytest.fixture(scope="module")
def setup11(fiducial, apod_mask):
    """1 lens + 1 source bin: pipeline fn, matching callables, grid."""
    g = tiny_grid()
    h = default_halo()
    hod = default_hod()
    lens, src = [mkdist(0.5, 0.15)], [mkdist(1.0, 0.3)]
    fn = bp.make_bandpower_pipeline(h, hod, lens, src, apod_mask, LMAX,
                                    EDGES, grid=g)
    model = build_halo_model(fiducial, h, hod, grid=g)
    cls = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, False, g)
    return fn, cls, g, h, hod, lens, src


def test_pipeline_vs_direct_integer_ells(fiducial, apod_mask, setup11):
    """Band powers from the fused static table operator match the
    direct F @ C_l(integer multipoles) evaluation at the Catmull-Rom
    interpolation level (<2e-4) through the REAL halo-model C_ell —
    and the stacked vector follows harmonic_probes order."""
    fn, cls, g, *_ = setup11
    out = fn(fiducial)
    setup = bp.bandpower_setup(apod_mask, LMAX, EDGES)
    ells = np.arange(LMAX + 1)
    le = np.maximum(ells, 1.0)
    for key, spin, row in ((("gg", 0, 0), "00", out["cl_gg"][0]),
                           (("gk", 0, 0), "02", out["cl_ge"][0]),
                           (("kk", 0, 0), "pp", out["cl_ee"][0])):
        c_int = np.asarray(cls[key](le))
        f = setup["ops"][spin]["F"].copy()
        f[:, :2] = 0.0
        direct = f @ c_int
        np.testing.assert_allclose(np.asarray(row), direct, rtol=2e-4,
                                   err_msg=str(key))
    vec = np.asarray(out["vector"])
    np.testing.assert_array_equal(
        vec, np.concatenate([np.asarray(out["cl_gg"]).ravel(),
                             np.asarray(out["cl_ge"]).ravel(),
                             np.asarray(out["cl_ee"]).ravel()]))


def test_full_sky_gaussian_exact(fiducial, setup11):
    """UniformSphereMask: D = P, the kernel is delta/(2l+1), and the
    builder's gg auto block reduces EXACTLY to the mode-counting
    formula P diag(2 (C+N)^2 / (2l+1)) P^T with C from the same
    lattice callables."""
    _, cls, g, h, hod, lens, src = setup11
    n2d = 1.0e7
    model = build_halo_model(fiducial, h, hod, grid=g)
    cov = bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, [], UniformSphereMask(), LMAX, EDGES,
        n2d, 0.3, grid=g)
    nb = len(EDGES) - 1
    assert cov.shape == (nb, nb)
    setup = bp.bandpower_setup(UniformSphereMask(), LMAX, EDGES,
                               spins=(0,))
    ells = np.arange(LMAX + 1)
    c_tot = np.asarray(jnp.asarray(setup["w_int"])
                       @ cls[("gg", 0, 0)](setup["tbl"])) + 1.0 / n2d
    p, _ = bp.bin_operator(LMAX, EDGES)
    direct = p @ np.diag(2.0 * c_tot**2 / (2.0 * ells + 1.0)) @ p.T
    np.testing.assert_allclose(np.asarray(cov), direct, rtol=1e-9,
                               atol=1e-12 * direct.max())


def test_joint_structure_and_block_wiring(fiducial, apod_mask, setup11):
    """2-probe-type joint matrix: symmetric, positive diagonal, and the
    (gg, ge) cross block equals a hand-assembled
    bandpower_gaussian_block over the same per-ell totals (wiring
    identity, exact)."""
    _, cls, g, h, hod, lens, src = setup11
    n2d, sn = 1.0e7, 0.08
    model = build_halo_model(fiducial, h, hod, grid=g)
    cov = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, src, apod_mask, LMAX, EDGES, n2d, sn,
        grid=g))
    nb = len(EDGES) - 1
    assert cov.shape == (3 * nb, 3 * nb)
    # Diagonal blocks are symmetric only up to matmul ordering (the
    # kernel itself is exactly symmetric); off-diagonals are mirrored.
    np.testing.assert_allclose(
        cov, cov.T, rtol=1e-12, atol=1e-13 * np.max(np.abs(cov)))
    assert np.all(np.diag(cov) > 0)
    # Hand-assemble the (gg, ge) block: pairs (g,g)x(g,E).
    setup = bp.bandpower_setup(apod_mask, LMAX, EDGES)
    kern = bp.pseudo_covariance_kernel(apod_mask, LMAX)
    w = jnp.asarray(setup["w_int"])
    c_gg = w @ cls[("gg", 0, 0)](setup["tbl"]) + 1.0 / n2d
    c_gk = w @ cls[("gk", 0, 0)](setup["tbl"])
    blk = np.asarray(bp.bandpower_gaussian_block(
        setup["ops"]["00"]["D"], setup["ops"]["02"]["D"],
        c_gg, c_gk, c_gk, c_gg, kern))
    np.testing.assert_allclose(cov[:nb, nb:2 * nb], blk, rtol=0, atol=0)


def test_m_calibration_scaling_exact(fiducial, apod_mask):
    """Shear calibration through the nuisance path: cl_ee band powers
    scale EXACTLY by (1+m)^2 (and cl_ge by (1+m)); the covariance EE
    auto block by (1+m)^4."""
    from chomp_tpu.parallel.sweep import default_nuisance

    g = tiny_grid()
    h, hod = default_halo(), default_hod()
    lens, src = [mkdist(0.5, 0.15)], [mkdist(1.0, 0.3)]
    fn = bp.make_bandpower_pipeline(h, hod, lens, src, apod_mask, LMAX,
                                    EDGES, grid=g, with_nuisance=True)
    nu0 = default_nuisance(1, 1)
    mval = 0.04
    num = default_nuisance(1, 1)._replace(m=jnp.asarray([mval])) \
        if hasattr(nu0, "_replace") else None
    if num is None:
        import dataclasses

        num = dataclasses.replace(nu0, m=jnp.asarray([mval]))
    out0, outm = fn(fiducial, nu0), fn(fiducial, num)
    np.testing.assert_allclose(np.asarray(outm["cl_ee"]),
                               (1 + mval) ** 2 * np.asarray(out0["cl_ee"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(outm["cl_ge"]),
                               (1 + mval) * np.asarray(out0["cl_ge"]),
                               rtol=1e-12)
    model = build_halo_model(fiducial, h, hod, grid=g)
    nb = len(EDGES) - 1
    cov0 = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, src, apod_mask, LMAX, EDGES, 1e7,
        0.0, grid=g, nuisance=nu0))
    covm = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, src, apod_mask, LMAX, EDGES, 1e7,
        0.0, grid=g, nuisance=num))
    ee = slice(2 * nb, 3 * nb)
    np.testing.assert_allclose(covm[ee, ee],
                               (1 + mval) ** 4 * cov0[ee, ee],
                               rtol=1e-10)


def test_cmb_lensing_probe_rows(fiducial, apod_mask, setup11):
    """cmb_lensing=True appends the gK probe (spin-0 coupling) to the
    pipeline vector AND the covariance; the non-kappa sub-matrix is
    bitwise the no-kappa result."""
    _, cls, g, h, hod, lens, src = setup11
    fn = bp.make_bandpower_pipeline(h, hod, lens, src, apod_mask, LMAX,
                                    EDGES, grid=g,
                                    include_cmb_lensing=True)
    out = fn(fiducial)
    nb = len(EDGES) - 1
    assert out["cl_gK"].shape == (1, nb)
    assert out["vector"].shape == (4 * nb,)
    assert np.all(np.asarray(out["cl_gK"]) != 0.0)
    model = build_halo_model(fiducial, h, hod, grid=g)
    cov = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, src, apod_mask, LMAX, EDGES, 1e7,
        0.08, grid=g, cmb_lensing=True))
    cov0 = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, src, apod_mask, LMAX, EDGES, 1e7,
        0.08, grid=g))
    assert cov.shape == (4 * nb, 4 * nb)
    np.testing.assert_allclose(cov[:3 * nb, :3 * nb], cov0, rtol=0,
                               atol=0)


@pytest.mark.slow
def test_ssc_sandwich_identity(fiducial, apod_mask, setup11):
    """include_ssc adds EXACTLY the F-window sandwich of
    ssc.projected_ssc over the same legs (wiring identity), and the
    SSC gg-auto diagonal is positive."""
    _, cls, g, h, hod, lens, src = setup11
    from chomp_tpu.ssc import projected_ssc, sigma_b2_fn
    from chomp_tpu.projection import WindowGalaxy

    model = build_halo_model(fiducial, h, hod, grid=g)
    kw = dict(n_k_ssc=48, u_stride=6)
    base = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, [], apod_mask, LMAX, EDGES, 1e7, 0.3,
        grid=g))
    full = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, [], apod_mask, LMAX, EDGES, 1e7, 0.3,
        grid=g, include_ssc=True, ssc_kwargs=kw))
    d_ssc = full - base
    assert np.all(np.diag(d_ssc) > 0)
    setup = bp.bandpower_setup(apod_mask, LMAX, EDGES, spins=(0,))
    wg = WindowGalaxy(dist=lens[0])
    sig = sigma_b2_fn(fiducial, apod_mask, geometry="curved", grid=g)
    s_tbl = projected_ssc(fiducial, h, model, setup["tbl"],
                          setup["tbl"], [wg, wg, wg, wg],
                          ["g", "g", "g", "g"], sig, grid=g, **kw)
    f_eff = np.asarray(setup["f_eff"]["00"])
    direct = f_eff @ np.asarray(s_tbl) @ f_eff.T
    np.testing.assert_allclose(d_ssc, direct, rtol=1e-8,
                               atol=1e-12 * direct.max())


@pytest.mark.slow
def test_cng_sandwich_identity(fiducial, apod_mask, setup11):
    """include_nongaussian adds exactly the F-window sandwich of the
    projected trispectrum at Omega_eff (wiring identity)."""
    _, cls, g, h, hod, lens, src = setup11
    from chomp_tpu.covariance import projected_trispectrum
    from chomp_tpu.projection import WindowGalaxy

    model = build_halo_model(fiducial, h, hod, grid=g)
    kw = dict(n_k_tri=32, u_stride=6)
    base = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, [], apod_mask, LMAX, EDGES, 1e7, 0.3,
        grid=g))
    full = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, h, model, lens, [], apod_mask, LMAX, EDGES, 1e7, 0.3,
        grid=g, include_nongaussian=True, **kw))
    d_ng = full - base
    setup = bp.bandpower_setup(apod_mask, LMAX, EDGES, spins=(0,))
    wg = WindowGalaxy(dist=lens[0])
    t_tbl = projected_trispectrum(fiducial, h, model, lens[0],
                                  setup["tbl"], grid=g,
                                  windows=[wg, wg, wg, wg],
                                  tracers=["g", "g", "g", "g"], **kw)
    f_eff = np.asarray(setup["f_eff"]["00"])
    omega_eff = apod_mask.area2**2 / apod_mask.area4
    direct = f_eff @ np.asarray(t_tbl) @ f_eff.T / omega_eff
    np.testing.assert_allclose(d_ng, direct, rtol=1e-8,
                               atol=1e-14 * np.abs(direct).max())


def test_per_bin_hod_smoke(fiducial, apod_mask):
    """Per-lens-bin HOD lists run through pipeline + covariance (shape
    and finiteness; the cross-1h physics is refereed in test_halo)."""
    from chomp_tpu.halo import build_halo_models
    from chomp_tpu.hod import HODZheng

    g = tiny_grid()
    h = default_hod()
    h2 = HODZheng(log10_m_min=h.log10_m_min + 0.3, sigma=h.sigma,
                  log10_m_0=h.log10_m_0, log10_m_1p=h.log10_m_1p + 0.2,
                  alpha=h.alpha)
    halo_p = default_halo()
    lens = [mkdist(0.4, 0.12), mkdist(0.7, 0.12)]
    src = [mkdist(1.1, 0.3)]
    fn = bp.make_bandpower_pipeline(halo_p, [h, h2], lens, src,
                                    apod_mask, LMAX, EDGES, grid=g)
    out = fn(fiducial)
    nb = len(EDGES) - 1
    assert out["cl_gg"].shape == (2, nb)
    assert np.all(np.isfinite(out["vector"]))
    models = build_halo_models(fiducial, halo_p, [h, h2], grid=g)
    cov = np.asarray(bp.tomographic_bandpower_covariance(
        fiducial, halo_p, models, lens, src, apod_mask, LMAX, EDGES,
        [1e7, 2e7], 0.08, grid=g))
    # 2 lens autos + 2x1 ge + 1 ee = 5 probes.
    assert cov.shape == (5 * nb, 5 * nb)
    assert np.all(np.isfinite(cov)) and np.all(np.diag(cov) > 0)
