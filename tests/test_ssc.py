"""Super-sample covariance: responses vs the quad oracle, sigma_b^2
analytic/harmonic referees, lattice projection vs a dense-z quadrature,
flat/curved block consistency, and the include_ssc joint/tomographic
builder integrations (exact block assembly + single-bin reduction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, covariance, default_halo, halo, linear, ssc
from chomp_tpu.mask import DiscMask, UniformMask
from chomp_tpu.params import DEFAULT_GRID
from chomp_tpu.projection import DNdzGaussian, WindowConvergence, WindowGalaxy
from tests.oracle import oracle


def gauss_dist(z0=0.5, sig=0.1, z_max=1.2):
    return DNdzGaussian(z_min=jnp.asarray(0.05), z_max=jnp.asarray(z_max),
                        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sig))


@pytest.fixture(scope="module")
def model(fiducial_model):
    return fiducial_model


def test_dlnk3p_vs_finite_difference(fiducial):
    """Autodiff log-derivative of k^3 P_lin vs central differences."""
    ks = np.array([1e-3, 1e-2, 0.1, 1.0, 10.0])
    ours = np.asarray(ssc._dln_k3p_dlnk(fiducial, jnp.asarray(ks)))
    eps = 1e-5
    p_hi = np.asarray(linear.linear_power(fiducial, jnp.asarray(
        ks * np.exp(eps)), 0.0))
    p_lo = np.asarray(linear.linear_power(fiducial, jnp.asarray(
        ks * np.exp(-eps)), 0.0))
    ref = 3.0 + (np.log(p_hi) - np.log(p_lo)) / (2 * eps)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_response_one_halo_vs_oracle(fiducial, model):
    """Bias-weighted 1-halo response integrals vs adaptive quad."""
    h = default_halo()
    ks = np.array([1e-2, 0.1, 1.0, 10.0])
    i_mm, i_gg, i_gm = ssc.response_one_halo_integrals(
        fiducial, h, model, jnp.asarray(ks))
    refs = [oracle.ssc_response_one_halo(
        k, m_star_val=float(jnp.exp(model.mass.ln_m_star))) for k in ks]
    np.testing.assert_allclose(np.asarray(i_mm),
                               [r[0] for r in refs], rtol=5e-5)
    np.testing.assert_allclose(np.asarray(i_gg),
                               [r[1] for r in refs], rtol=5e-5)
    np.testing.assert_allclose(np.asarray(i_gm),
                               [r[2] for r in refs], rtol=5e-5)


def test_power_responses_low_k_and_counts(fiducial, model):
    """Low-k limit: the 2-halo response dominates with h_m -> 1, so
    R_mm - I^b_mm -> (68/21 - (1/3) dln k^3 P/dln k) P_lin; and the
    count-response toggle subtracts exactly (1 resp. 2) b_g P_ab."""
    h = default_halo()
    k = jnp.asarray([1e-4])
    r = ssc.power_responses(fiducial, h, model, k, local_counts=False)
    i_mm, _, _ = ssc.response_one_halo_integrals(fiducial, h, model, k)
    p_lin = linear.linear_power(fiducial, k, 0.0)
    pref = 68.0 / 21.0 - ssc._dln_k3p_dlnk(fiducial, k) / 3.0
    np.testing.assert_allclose(np.asarray(r["mm"] - i_mm),
                               np.asarray(pref * p_lin), rtol=2e-4)
    r_loc = ssc.power_responses(fiducial, h, model, k, local_counts=True)
    ps = halo.powers(fiducial, h, model, k)
    b_g = halo.galaxy_bias_avg(model)
    np.testing.assert_allclose(
        np.asarray(r["gg"] - r_loc["gg"]),
        np.asarray(2.0 * b_g * ps["power_gg"]), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(r["gm"] - r_loc["gm"]),
        np.asarray(b_g * ps["power_gm"]), rtol=1e-10)


def test_sigma_b2_full_sky_monopole(fiducial):
    """UniformSphereMask: only the monopole survives — sigma_b^2 =
    P_lin(0.5/chi, z) / (4 pi chi^2) exactly."""
    from chomp_tpu.curved import UniformSphereMask

    chi = jnp.asarray([800.0, 2000.0])
    d = jnp.asarray([0.8, 0.6])   # arbitrary growth values: linear in D^2
    got = ssc.sigma_b2_curved(fiducial, UniformSphereMask(), chi, d)
    ref = (np.asarray(linear.linear_power(fiducial, 0.5 / chi, 0.0))
           * np.asarray(d) ** 2 / (4.0 * np.pi * np.asarray(chi) ** 2))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-8)


def test_sigma_b2_cap_harmonic_referee(fiducial):
    """SphericalCapMask sigma_b^2 (pair-overlap xi route) vs the
    INDEPENDENT harmonic route: g_l = ∫ W P_l dmu has the closed form
    (P_{l-1} - P_{l+1})(cos a)/(2l+1), sigma_b^2 =
    (pi/A2^2) sum_l (2l+1) g_l^2 C_l^delta."""
    from scipy.special import eval_legendre

    from chomp_tpu.curved import SphericalCapMask

    alpha = 0.35
    mask = SphericalCapMask(alpha)
    chi = jnp.asarray([1200.0])
    d = jnp.asarray([0.7])
    got = float(ssc.sigma_b2_curved(fiducial, mask, chi, d)[0])

    lmax = 4096
    ca = np.cos(alpha)
    ell = np.arange(lmax + 1)
    p_all = np.array([eval_legendre(l, ca) for l in range(lmax + 2)])
    g = np.empty(lmax + 1)
    g[0] = 1.0 - ca
    g[1:] = (p_all[:lmax] - p_all[2:lmax + 2]) / (2.0 * ell[1:] + 1.0)
    c_delta = (np.asarray(linear.linear_power(
        fiducial, jnp.asarray((ell + 0.5) / 1200.0), 0.0)) * 0.7**2
        / 1200.0**2)
    a2 = 2.0 * np.pi * (1.0 - ca)
    ref = np.pi / a2**2 * np.sum((2.0 * ell + 1.0) * g**2 * c_delta)
    np.testing.assert_allclose(got, ref, rtol=2e-3)


def test_sigma_b2_flat_disc_quad_referee(fiducial):
    """DiscMask sigma_b^2 vs adaptive quadrature of the Airy integral,
    and the flat disc vs the curved cap of the same radius (small
    footprint: the sphere reduces to the tangent plane)."""
    from scipy.integrate import quad
    from scipy.special import j1 as sp_j1

    from chomp_tpu.curved import SphericalCapMask

    r_mask = 0.1
    mask = DiscMask(r_mask)
    chi = jnp.asarray([1500.0])
    d = jnp.asarray([0.75])
    got = float(ssc.sigma_b2_flat(fiducial, mask, chi, d)[0])

    def integrand(q):
        w2 = (2.0 * np.pi * r_mask**2 * sp_j1(q * r_mask)
              / (q * r_mask)) ** 2
        p = float(linear.linear_power(fiducial, jnp.asarray([q / 1500.0]),
                                      0.0)[0])
        return q * w2 * p

    ref = 0.0
    edges = np.concatenate([[1e-6], np.geomspace(0.3 / r_mask,
                                                 300.0 / r_mask, 25)])
    for lo, hi in zip(edges[:-1], edges[1:]):
        v, _ = quad(integrand, lo, hi, epsrel=1e-9, limit=400)
        ref += v
    ref *= 0.75**2 / (2.0 * np.pi * mask.area2**2 * 1500.0**2)
    np.testing.assert_allclose(got, ref, rtol=2e-3)

    cap = float(ssc.sigma_b2_curved(fiducial, SphericalCapMask(r_mask),
                                    chi, d)[0])
    np.testing.assert_allclose(cap, got, rtol=2e-2)


@pytest.mark.slow
def test_projected_ssc_vs_dense_quad(fiducial, model):
    """Lattice-projected Cov_SSC(l1, l2) vs a dense-z Simpson reference
    built from the same physics callables (windows.window_z, separable
    D^2-scaled responses, sigma_b2_flat) — referees the static node
    selection, edge ramp, and the 2-tap sign-aware response interp."""
    from scipy.integrate import simpson

    h = default_halo()
    dist = gauss_dist()
    win = WindowGalaxy(dist=dist)
    windows = (win,) * 4
    mask = DiscMask(0.2)
    ells = np.geomspace(30.0, 3000.0, 5)
    sfn = ssc.sigma_b2_fn(fiducial, mask, "flat")
    got = np.asarray(ssc.projected_ssc(
        fiducial, h, model, ells, ells, windows, ("g",) * 4, sfn))

    zs = np.linspace(0.05, 1.2, 241)
    chi = np.asarray(background.comoving_distance(fiducial,
                                                  jnp.asarray(zs)))
    w_z = np.asarray(win.window_z(fiducial, jnp.asarray(zs)))
    d_z = np.asarray(background.growth_factor(fiducial, jnp.asarray(zs)))
    dchi_dz = np.asarray(
        background.C_OVER_H0 / background.ez(fiducial, jnp.asarray(zs)))
    sig2 = np.asarray(ssc.sigma_b2_flat(fiducial, mask, jnp.asarray(chi),
                                        jnp.asarray(d_z)))
    piv = float(model.mass.growth)
    # Exact response evaluation at each node's query k (no interp).
    r_nodes = np.empty((len(zs), len(ells)))
    for m, (c, dd) in enumerate(zip(chi, d_z)):
        kq = jnp.asarray((ells + 0.5) / c)
        r = ssc.power_responses(fiducial, h, model, kq)["gg"]
        r_nodes[m] = np.asarray(r) * (dd / piv) ** 2
    integ = (w_z**4 / chi**4 * sig2 * dchi_dz)[:, None, None] \
        * r_nodes[:, :, None] * r_nodes[:, None, :]
    ref = simpson(integ, x=zs, axis=0)
    np.testing.assert_allclose(got, ref, rtol=2e-2)


def test_ssc_covariance_block_psd_sym(fiducial, model):
    """Auto SSC block: symmetric, PSD (positive per-node rank-1 sum),
    positive diagonal; bare-Omega input equals the equal-area disc."""
    h = default_halo()
    dist = gauss_dist()
    edges = np.array([0.1, 0.3, 0.8, 2.0])
    cov = np.asarray(ssc.ssc_covariance(
        fiducial, h, model, dist, edges, DiscMask(0.2)))
    np.testing.assert_allclose(cov, cov.T, rtol=1e-10)
    assert np.all(np.diag(cov) > 0)
    w = np.linalg.eigvalsh(cov)
    assert w.min() > -1e-12 * w.max()
    omega = float(np.pi * 0.2**2)
    cov_o = np.asarray(ssc.ssc_covariance(
        fiducial, h, model, dist, edges, omega))
    # Bare Omega skips the pair-count normalization -> equal up to the
    # D_i edge correction, which INCREASES the disc-mask entries (fewer
    # pairs at the footprint edge): ~2% at 0.1-0.3 deg, ~16% at the
    # 2-deg bin of an 11.5-deg disc (measured).
    np.testing.assert_allclose(cov_o, cov, rtol=0.25)
    assert np.all(cov >= cov_o * (1.0 - 1e-9))


def test_ssc_cross_block_transpose(fiducial, model):
    """Cov[w, gt] block vs the side-swapped block: exact transpose."""
    h = default_halo()
    dist = gauss_dist()
    src = gauss_dist(z0=0.8, sig=0.15, z_max=1.8)
    win_g, win_k = WindowGalaxy(dist=dist), WindowConvergence(dist=src)
    edges = np.array([0.1, 0.3, 0.8])
    kw = dict(with_bao=False, grid=DEFAULT_GRID)
    c_ab = np.asarray(ssc.ssc_covariance(
        fiducial, h, model, dist, edges, 0.1,
        windows=(win_g, win_g, win_g, win_k),
        tracers=("g", "g", "g", "m"), mu_i=0, mu_j=2, **kw))
    c_ba = np.asarray(ssc.ssc_covariance(
        fiducial, h, model, dist, edges, 0.1,
        windows=(win_g, win_k, win_g, win_g),
        tracers=("g", "m", "g", "g"), mu_i=2, mu_j=0, **kw))
    np.testing.assert_allclose(c_ab, c_ba.T, rtol=1e-9, atol=1e-30)


@pytest.mark.slow
def test_curved_ssc_flat_limit(fiducial, model):
    """Curved SSC block on a small cap vs the flat block on the disc of
    the same radius at sub-degree..degree bins."""
    h = default_halo()
    dist = gauss_dist()
    edges = np.array([0.2, 0.5, 1.0, 2.0])
    r_mask = 0.12
    flat = np.asarray(ssc.ssc_covariance(
        fiducial, h, model, dist, edges, DiscMask(r_mask),
        ell_lo=1.0, ell_hi=4096.0))
    from chomp_tpu.curved import SphericalCapMask

    curved = np.asarray(ssc.curved_ssc_covariance(
        fiducial, h, model, dist, edges, SphericalCapMask(r_mask),
        ell_max=4096))
    # Sub-degree bins: tangent-plane limit at ~1-2%.  The 1-2 deg bin
    # on a 6.9-deg-radius footprint carries genuine curvature/edge
    # differences (bin factors, pair-count normalization): 5.8%
    # measured at the [2,2] corner.
    np.testing.assert_allclose(curved[:2, :2], flat[:2, :2], rtol=0.025)
    np.testing.assert_allclose(curved, flat, rtol=0.08)


@pytest.mark.slow
def test_projected_ssc_exact_z_anchors(fiducial, model):
    """Chebyshev-anchored exact-z route: J=6 anchors agree with the
    separable route at the few-% level for a z~0.5 kernel pivoted at
    z=0 (the anchors correct the 1-halo/bias evolution the D^2 scaling
    misses — the difference IS the physics, so only consistency of
    scale is asserted, plus exactness for a pivot-matched model)."""
    h = default_halo()
    dist = gauss_dist()
    win = WindowGalaxy(dist=dist)
    # ell <= 800: the gg response crosses zero at k ~ 2/Mpc, and the
    # crossing MOVES with z — near it the separable/anchored ratio is
    # genuinely unbounded (both tiny), so the consistency band is only
    # meaningful where the response is single-signed along the kernel.
    ells = np.geomspace(50.0, 800.0, 4)
    sfn = ssc.sigma_b2_fn(fiducial, DiscMask(0.2), "flat")
    sep = np.asarray(ssc.projected_ssc(
        fiducial, h, model, ells, ells, (win,) * 4, ("g",) * 4, sfn))
    anc = np.asarray(ssc.projected_ssc(
        fiducial, h, model, ells, ells, (win,) * 4, ("g",) * 4, sfn,
        exact_z_anchors=6))
    ratio = anc / sep
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)
    # The two routes must agree where the anchor polynomial reproduces
    # the separable scaling: a model built at the kernel's mean z makes
    # the D^2 approximation locally exact, so the routes converge there.
    model_mid = halo.build_halo_model(fiducial, h, model.hod, z=0.5)
    sep_m = np.asarray(ssc.projected_ssc(
        fiducial, h, model_mid, ells, ells, (win,) * 4, ("g",) * 4, sfn))
    anc_m = np.asarray(ssc.projected_ssc(
        fiducial, h, model_mid, ells, ells, (win,) * 4, ("g",) * 4, sfn,
        exact_z_anchors=6))
    np.testing.assert_allclose(np.diag(anc_m), np.diag(sep_m), rtol=0.25)


# ---------------------------------------------------------------------------
# Builder integration: include_ssc on the joint + tomographic matrices
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tomo_setup(fiducial, fiducial_model):
    from chomp_tpu.params import GridSpec

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32)
    lens = gauss_dist(0.4, 0.12, z_max=2.5)
    src = gauss_dist(0.8, 0.2, z_max=2.5)
    return default_halo(), fiducial_model, lens, src, g


@pytest.mark.slow
def test_joint_3x2pt_include_ssc_assembly(fiducial, tomo_setup):
    """include_ssc adds exactly the ten ssc_covariance blocks: the
    difference's ww corner equals the directly-built ww SSC block, and
    the addition keeps the matrix symmetric with a larger diagonal."""
    from chomp_tpu.projection import WindowGalaxy

    h, model, lens, src, g = tomo_setup
    edges = np.logspace(-1.5, 0, 4)
    nb = len(edges) - 1
    kw = dict(grid=g, include_nongaussian=False, n_ell_cov_g=1024)
    base = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, 0.2, 3.0e7, 4.0e-9, **kw))
    tot = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, 0.2, 3.0e7, 4.0e-9,
        include_ssc=True, **kw))
    diff = tot - base
    np.testing.assert_allclose(diff, diff.T, rtol=1e-8, atol=0)
    assert np.all(np.diag(diff) > 0)
    win_g = WindowGalaxy(dist=lens)
    ww = np.asarray(ssc.ssc_covariance(
        fiducial, h, model, lens, edges, 0.2, windows=(win_g,) * 4,
        tracers=("g",) * 4, grid=g))
    np.testing.assert_allclose(diff[:nb, :nb], ww, rtol=1e-10, atol=0)


@pytest.mark.slow
def test_tomographic_single_bin_ssc_reduction(fiducial, tomo_setup):
    """nL = nS = 1 tomographic include_ssc=True == the joint 3x2pt
    builder with include_ssc=True (every channel-pair -> window/
    tracer/mu mapping identical), flat and curved."""
    h, model, lens, src, g = tomo_setup
    edges = np.logspace(-1.5, 0, 4)
    kw = dict(grid=g, n_ell_cov_g=1024, include_ssc=True)
    tomo = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, h, model, [lens], [src], edges, 0.2,
        [3.0e7], [4.0e-9], **kw))
    joint = np.asarray(covariance.joint_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, 0.2, 3.0e7, 4.0e-9,
        include_nongaussian=False, **kw))
    np.testing.assert_allclose(tomo, joint, rtol=1e-10, atol=0)

    from chomp_tpu.curved import (SphericalCapMask,
                                  curved_joint_3x2pt_covariance,
                                  curved_tomographic_3x2pt_covariance)

    cap = SphericalCapMask(0.25)
    ckw = dict(grid=g, ell_max=1024, include_ssc=True)
    ctomo = np.asarray(curved_tomographic_3x2pt_covariance(
        fiducial, h, model, [lens], [src], edges,
        [3.0e7], [4.0e-9], cap, **ckw))
    cjoint = np.asarray(curved_joint_3x2pt_covariance(
        fiducial, h, model, lens, src, edges, 3.0e7, 4.0e-9, cap,
        include_nongaussian=False, **ckw))
    np.testing.assert_allclose(ctomo, cjoint, rtol=1e-10, atol=0)
