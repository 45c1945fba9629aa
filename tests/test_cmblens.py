"""kappa_CMB tracer: window, w_{g kappa_CMB} probes, covariance.

Validation strategy (mirrors the tomographic suite): closed-form /
route-equivalence referees for the window and spectra, EXACT reduction
and bookkeeping identities for the builders (the kappa extension reuses
the MC-refereed gaussian_block / cNG / SSC engines — what is new and
must be tested is the window physics and the probe wiring), and a
closure-vs-quadrature consistency check of the N_L noise split.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, covariance, default_halo, projection
from chomp_tpu.cmblens import CMBLensingSpec, WindowConvergenceCMB
from chomp_tpu.params import C_OVER_H0, GridSpec

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
    src = [dist_at(1.0, 0.25)]
    return default_halo(), fiducial_model, lens, src, g


def test_chi_star_and_window_shape(fiducial):
    """chi(z_*) ~ 3.2 c/H0 for the fiducial flat LCDM; the kernel is
    positive, zero above z_support, and peaks at intermediate z (the
    (1+z) chi (1 - chi/chi_*) shape)."""
    win = CMBLensingSpec().window()
    chi_star = background.comoving_distance(fiducial, 1090.0, 64)
    assert 3.0 < float(chi_star) / C_OVER_H0 < 3.4
    z = jnp.linspace(0.01, 15.0, 200)
    w = np.asarray(win.window_z(fiducial, z))
    assert np.all(w >= 0.0)
    assert np.all(w[z > 12.0] == 0.0)
    # The raw d(chi)-measure kernel RISES toward the source plane
    # ((1+z)(chi_* - chi) ~ (1+z)^{1/2} in matter domination) — it is
    # the growth factor that suppresses the high-z tail of the Limber
    # integrand W^2 D^2 / chi^2.
    zc = np.asarray(z)[np.asarray(z) <= 12.0]
    wc = w[np.asarray(z) <= 12.0]
    chi = np.asarray(background.comoving_distance(fiducial,
                                                  jnp.asarray(zc), 64))
    d = np.asarray(background.growth_factor(fiducial, jnp.asarray(zc),
                                            64))
    integ = (wc * d) ** 2 / chi**2
    assert integ[-1] < 0.35 * integ.max()
    # Dimensional anchor: W = 1.5 Om/c^2 (1+z) chi (1-chi/chi_*)
    z0 = 0.5
    chi0 = background.comoving_distance(fiducial, z0, 64)
    expect = (1.5 * float(fiducial.omega_m0) / C_OVER_H0**2
              * (1 + z0) * float(chi0)
              * (1.0 - float(chi0) / float(chi_star)))
    got = float(win.window_z(fiducial, jnp.asarray(z0)))
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_cl_gk_cmb_lattice_vs_table(fiducial, fiducial_model, setup):
    """C_ell^{g kappa_CMB}: the gather-free lattice route vs the
    GL + cubic-table reference route — the same two-route agreement
    bar as every other spectrum (~1e-3)."""
    from chomp_tpu import limber_fft

    h, model, lens, _src, g = setup
    win_g = projection.WindowGalaxy(dist=lens[0])
    win_kcmb = CMBLensingSpec().window()
    ells = np.geomspace(30.0, 3000.0, 24)
    p_lat = limber_fft.p_lattice_halo_all(fiducial, h, model, False, g)
    cl_fast = np.asarray(limber_fft.limber_cl_fft(
        fiducial, win_g, win_kcmb, ells, p_lat["power_gm"], g,
        growth_pivot=model.mass.growth))
    pt = projection.power_table_halo(fiducial, h, model, "power_gm",
                                     False, g)
    cl_ref = np.asarray(projection.limber_cl(
        fiducial, win_g, win_kcmb, jnp.asarray(ells), pt, g))
    np.testing.assert_allclose(cl_fast, cl_ref, rtol=2e-3)
    assert np.all(cl_ref > 0.0)


def test_kk_cmb_truncation(fiducial, fiducial_model, setup):
    """Quantify the z_support truncation of the C_ell^{kk} auto
    ingredient (module docstring claim): doubling the support
    12 -> 24 moves C_ell^{kk} by 3-6% over ell = 100-1000 (measured —
    it GROWS with ell: high multipoles pick up near-peak-P(k) scales
    from the deep tail; N_L dominates C^{kk} there for any current
    experiment)."""
    from chomp_tpu import limber_fft
    from chomp_tpu.cmblens import CMBLensingSpec

    h, model, _lens, _src, g = setup
    ells = np.array([100.0, 300.0, 1000.0])
    p_lat = limber_fft.p_lattice_halo_all(fiducial, h, model, False, g)
    win12 = CMBLensingSpec(z_support=12.0).window()
    win24 = CMBLensingSpec(z_support=24.0).window()
    cl12 = np.asarray(limber_fft.limber_cl_fft(
        fiducial, win12, win12, ells, p_lat["power_mm"], g,
        growth_pivot=model.mass.growth))
    cl24 = np.asarray(limber_fft.limber_cl_fft(
        fiducial, win24, win24, ells, p_lat["power_mm"], g,
        growth_pivot=model.mass.growth))
    rel = np.abs(cl24 / cl12 - 1.0)
    assert np.all(rel < 0.08), rel
    assert np.all(cl24 >= cl12 * 0.999)


def test_pipeline_w_gk_cmb_routes(fiducial, setup):
    """make_pipeline(include_cmb_lensing=True): the fused fast path
    equals the manual lattice transform exactly; the table route
    agrees at the usual few-1e-3 route-equivalence level; curved
    agrees with flat at sub-degree separations."""
    from chomp_tpu import halo, limber_fft
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import make_pipeline

    h, _model, lens, _src, g = setup
    hod = default_hod()
    theta = np.geomspace(0.05, 0.5, 6)
    out = make_pipeline(h, hod, lens[0], theta_deg=theta, grid=g,
                        include_cmb_lensing=True)(fiducial)
    assert out["w_gk_cmb"].shape == (6,)
    win_g = projection.WindowGalaxy(dist=lens[0])
    win_kcmb = CMBLensingSpec().window()
    # Same grid as the pipeline's internal build (the session fixture
    # model uses DEFAULT_GRID — a 2.7e-5-level mass-table difference).
    model = halo.build_halo_model(fiducial, h, hod, 0.0, False, g)
    p_lat = limber_fft.p_lattice_halo_all(fiducial, h, model, False, g)
    manual = limber_fft.limber_wtheta_fft(
        fiducial, win_g, win_kcmb, theta, p_lat["power_gm"], g, mu=0.0,
        growth_pivot=model.mass.growth)
    np.testing.assert_allclose(np.asarray(out["w_gk_cmb"]),
                               np.asarray(manual), rtol=1e-10)
    out_tab = make_pipeline(h, hod, lens[0], theta_deg=theta, grid=g,
                            method="table",
                            include_cmb_lensing=True)(fiducial)
    np.testing.assert_allclose(np.asarray(out["w_gk_cmb"]),
                               np.asarray(out_tab["w_gk_cmb"]),
                               rtol=8e-3)
    out_cur = make_pipeline(h, hod, lens[0], theta_deg=theta, grid=g,
                            geometry="curved",
                            include_cmb_lensing=True)(fiducial)
    # Sub-degree flat-vs-curved: the documented few-1e-3 flat
    # ell-offset convention artifact (measured 0.77% worst here).
    np.testing.assert_allclose(np.asarray(out_cur["w_gk_cmb"]),
                               np.asarray(out["w_gk_cmb"]), rtol=1.2e-2)


def test_pipeline_w_gk_cmb_exact_z(fiducial, setup):
    """Exact-z anchors cover the kappa_CMB cross (the integrand is
    supported on the galaxy bin, inside the anchor window): finite and
    within the known separable-vs-exact evolution spread."""
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import make_pipeline

    h, hod, g = setup[0], default_hod(), setup[4]
    dist = dist_at(0.4, 0.12)
    theta = np.geomspace(0.05, 0.5, 5)
    sep = make_pipeline(h, hod, dist, theta_deg=theta, grid=g,
                        z_pivot=0.4,
                        include_cmb_lensing=True)(fiducial)
    exz = make_pipeline(h, hod, dist, theta_deg=theta, grid=g,
                        exact_z_anchors=4,
                        include_cmb_lensing=True)(fiducial)
    a, b = np.asarray(sep["w_gk_cmb"]), np.asarray(exz["w_gk_cmb"])
    assert np.all(np.isfinite(b))
    np.testing.assert_allclose(b, a, rtol=0.1)


def test_tomographic_pipeline_cmb_vector_order(fiducial, setup):
    """Tomographic vector gains the wgk_i tail in
    covariance.tomographic_probes(cmb_lensing=True) order, and the
    single-bin row equals make_pipeline's w_gk_cmb."""
    from chomp_tpu.hod import default_hod
    from chomp_tpu.parallel.sweep import (make_pipeline,
                                          make_tomographic_pipeline)

    h, _model, lens, src, g = setup
    hod = default_hod()
    theta = np.geomspace(0.05, 0.5, 5)
    out = make_tomographic_pipeline(
        h, hod, lens, src, theta_deg=theta, grid=g,
        include_cmb_lensing=True)(fiducial)
    assert out["w_gk_cmb"].shape == (2, 5)
    probes = covariance.tomographic_probes(2, 1, cmb_lensing=True)
    assert [p[0] for p in probes[-2:]] == ["wgk_0", "wgk_1"]
    vec = np.asarray(out["vector"])
    np.testing.assert_array_equal(
        vec[-10:], np.asarray(out["w_gk_cmb"]).ravel())
    single = make_pipeline(h, hod, lens[0], theta_deg=theta, grid=g,
                           include_cmb_lensing=True)(fiducial)
    np.testing.assert_allclose(np.asarray(out["w_gk_cmb"][0]),
                               np.asarray(single["w_gk_cmb"]),
                               rtol=1e-10)


@pytest.fixture(scope="module")
def cov_setup(fiducial, setup):
    """Shared covariance matrices for the structural tests."""
    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    ell_tbl = np.geomspace(8.0, 3000.0, 40)
    spec = CMBLensingSpec(nl_ell=ell_tbl,
                          nl=2e-8 * (1.0 + (ell_tbl / 200.0) ** 2))
    base = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024))
    full = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, OMEGA_S, [N2D], [NS],
        grid=g, n_ell_cov_g=1024, cmb_lensing=spec))
    return edges, spec, base, full


def test_tomographic_covariance_cmb_structure(cov_setup):
    """Appending the kappa probes leaves every 3x2pt block unchanged
    (to float reassociation — observed 1-ulp wiggles on ~3% of
    entries); the extended matrix is symmetric and PSD; the kappa
    cross blocks are nonzero."""
    edges, _spec, base, full = cov_setup
    nb = len(edges) - 1
    n_old = base.shape[0]
    assert full.shape[0] == n_old + 2 * nb
    np.testing.assert_allclose(full[:n_old, :n_old], base,
                               rtol=1e-12, atol=0)
    # Diagonal probe blocks are symmetric only to rounding
    # ((B_i g) B_j^T rounds (a g) b vs (b g) a differently — ~1 ulp).
    np.testing.assert_allclose(full, full.T, rtol=1e-12, atol=0)
    ev = np.linalg.eigvalsh(full)
    assert ev.min() > -1e-10 * ev.max()
    # w_i x wgk_i cross (same lens sample) must carry real covariance.
    assert np.any(np.abs(full[:nb, n_old:n_old + nb]) > 0.0)


def test_cmb_block_bookkeeping(fiducial, setup, cov_setup):
    """The (wgk_0, wgk_0) block of the builder equals a hand-assembled
    gaussian_block over the same lattice callables and noise split —
    wiring identity, exact."""
    h, model, lens, src, g = setup
    edges, spec, _base, full = cov_setup
    nb = len(edges) - 1
    n_old = full.shape[0] - 2 * nb
    cls = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, False, g, cmb=spec)
    blk = np.asarray(covariance.gaussian_block(
        cls[("gg", 0, 0)], cls[("KK",)], cls[("gK", 0)], cls[("gK", 0)],
        edges, edges, OMEGA_S, 0, 0,
        1.0 / N2D, spec.nl_inf, 0.0, 0.0, n_ell_cov=1024))
    np.testing.assert_allclose(
        full[n_old:n_old + nb, n_old:n_old + nb], blk,
        rtol=1e-12, atol=0)


def test_nl_closure_vs_quadrature(fiducial, setup):
    """Design referee for the N_L split: a CONSTANT N_L handled as the
    white floor through the analytic Bessel closure vs the same
    constant folded into the C_ell^{kk} callable and integrated by the
    log-ell quadrature.  The off-diagonal (non-overlapping annuli)
    entries agree tightly (the closure term is exactly zero there);
    diagonal entries agree to the quadrature-truncation level the
    closure exists to remove."""
    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 4)
    cls = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, False, g,
        cmb=CMBLensingSpec())
    c = 3e-8
    kk = cls[("KK",)]

    def kk_plus_const(ells_np):
        return kk(ells_np) + c

    args = (cls[("gg", 0, 0)],)
    closure = np.asarray(covariance.gaussian_block(
        args[0], kk, cls[("gK", 0)], cls[("gK", 0)], edges, edges,
        OMEGA_S, 0, 0, 1.0 / N2D, c, 0.0, 0.0, n_ell_cov=4096))
    quad = np.asarray(covariance.gaussian_block(
        args[0], kk_plus_const, cls[("gK", 0)], cls[("gK", 0)], edges,
        edges, OMEGA_S, 0, 0, 1.0 / N2D, 0.0, 0.0, 0.0,
        n_ell_cov=4096))
    off = ~np.eye(len(edges) - 1, dtype=bool)
    scale = np.abs(closure).max()
    np.testing.assert_allclose(quad[off], closure[off],
                               atol=2e-2 * scale, rtol=0.05)
    np.testing.assert_allclose(np.diag(quad), np.diag(closure),
                               rtol=0.05)


def test_nl_spec_interpolation():
    """CMBLensingSpec N_L table handling: log-log interpolation hits
    the nodes exactly, clamps outside, and nl_resid vanishes at the
    high-ell end (the white floor is split off)."""
    ell = np.array([10.0, 100.0, 1000.0])
    nl = np.array([5e-8, 1e-8, 4e-8])
    spec = CMBLensingSpec(nl_ell=ell, nl=nl)
    np.testing.assert_allclose(spec.nl_total(ell), nl, rtol=1e-12)
    np.testing.assert_allclose(spec.nl_total([1.0]), [5e-8], rtol=1e-12)
    np.testing.assert_allclose(spec.nl_total([1e6]), [4e-8], rtol=1e-12)
    assert spec.nl_inf == 4e-8
    np.testing.assert_allclose(spec.nl_resid([5e5]), [0.0], atol=1e-20)
    # Log-log midpoint: geometric interpolation.
    mid = spec.nl_total([np.sqrt(10.0 * 100.0)])
    np.testing.assert_allclose(mid, [np.sqrt(5e-8 * 1e-8)], rtol=1e-12)
    with pytest.raises(ValueError):
        CMBLensingSpec(nl_ell=ell, nl=-nl)
    with pytest.raises(ValueError):
        CMBLensingSpec(nl_ell=ell)


def test_magnification_in_gk_cmb(fiducial, setup):
    """alpha = 1 reduces the magnified gK callable exactly; alpha != 1
    equals the hand-built two-term sum."""
    from chomp_tpu import limber_fft
    from chomp_tpu.parallel.sweep import default_nuisance

    h, model, lens, src, g = setup
    spec = CMBLensingSpec()
    ells = np.geomspace(30.0, 2000.0, 12)
    nu1 = default_nuisance(2, 1)
    cls_plain = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, False, g, cmb=spec)
    cls_a1 = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, False, g, nuisance=nu1,
        include_magnification=True, cmb=spec)
    np.testing.assert_allclose(
        np.asarray(cls_a1[("gK", 0)](ells)),
        np.asarray(cls_plain[("gK", 0)](ells)), rtol=1e-12)
    import dataclasses

    nu2 = dataclasses.replace(nu1, alpha_lens=jnp.asarray([1.8, 1.0]))
    cls_a2 = covariance.tomographic_lattice_cl_callables(
        fiducial, h, model, lens, src, False, g, nuisance=nu2,
        include_magnification=True, cmb=spec)
    win_kcmb = spec.window()
    wk_lens0 = projection.WindowConvergence(
        dist=projection.DNdzShifted(base=lens[0], dz=nu2.dz_lens[0]))
    p_lat = limber_fft.p_lattice_halo_all(fiducial, h, model, False, g)
    extra = limber_fft.limber_cl_fft(
        fiducial, wk_lens0, win_kcmb, ells, p_lat["power_mm"], g,
        growth_pivot=model.mass.growth)
    expect = (np.asarray(cls_plain[("gK", 0)](ells))
              + 2.0 * 0.8 * np.asarray(extra))
    np.testing.assert_allclose(np.asarray(cls_a2[("gK", 0)](ells)),
                               expect, rtol=1e-10)


@pytest.mark.slow
def test_cmb_ssc_and_cng_legs(fiducial, setup):
    """include_ssc=True with kappa probes: the (wgk_0, wgk_0) SSC
    block equals the direct ssc_covariance with windows (g, K, g, K)
    and tracers (g, m, g, m) — leg-wiring identity, exact."""
    from chomp_tpu.ssc import ssc_covariance

    h, model, lens, src, g = setup
    edges = np.logspace(-1.5, 0, 3)
    nb = len(edges) - 1
    spec = CMBLensingSpec()
    full = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S, [N2D],
        [NS], grid=g, n_ell_cov_g=512, cmb_lensing=spec,
        include_ssc="autos"))
    base = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, OMEGA_S, [N2D],
        [NS], grid=g, n_ell_cov_g=512, cmb_lensing=spec))
    win_g = projection.WindowGalaxy(dist=lens[0])
    win_kcmb = spec.window()
    direct = np.asarray(ssc_covariance(
        fiducial, h, model, lens[0], edges, OMEGA_S,
        windows=(win_g, win_kcmb, win_g, win_kcmb),
        tracers=("g", "m", "g", "m"), mu_i=0, mu_j=0, grid=g))
    got = full[-nb:, -nb:] - base[-nb:, -nb:]
    np.testing.assert_allclose(got, direct, rtol=1e-10, atol=0)


@pytest.mark.slow
def test_curved_tomographic_cmb(fiducial, setup):
    """Curved builder with kappa probes: 3x2pt corner unchanged,
    symmetric, PSD, nonzero kappa cross blocks (the wgk probes ride
    the spin-0 Legendre bin-factor family)."""
    from chomp_tpu.curved import (SphericalCapMask,
                                  curved_tomographic_3x2pt_covariance)

    h, model, lens, src, g = setup
    edges = np.logspace(-1.0, 0, 3)
    nb = len(edges) - 1
    mask = SphericalCapMask(np.sqrt(OMEGA_S / np.pi))
    spec = CMBLensingSpec()
    base = np.asarray(curved_tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, [N2D], [NS],
        mask, ell_max=512, grid=g))
    full = np.asarray(curved_tomographic_3x2pt_covariance(
        fiducial, h, model, lens[:1], src[:1], edges, [N2D], [NS],
        mask, ell_max=512, grid=g, cmb_lensing=spec))
    n_old = base.shape[0]
    assert full.shape[0] == n_old + nb
    np.testing.assert_allclose(full[:n_old, :n_old], base,
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(full, full.T, rtol=1e-12, atol=0)
    ev = np.linalg.eigvalsh(full)
    assert ev.min() > -1e-10 * ev.max()
    assert np.any(np.abs(full[:nb, n_old:]) > 0.0)
