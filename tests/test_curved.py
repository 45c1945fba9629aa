"""Curved-sky masked covariance (chomp_tpu.curved): Wigner-d
recursions vs exact values, closed-form bin factors vs quadrature and
vs their flat-sky limits, exact uniform-full-sky reduction, and the
cap-vs-flat-disc cross-validation that anchors the curved coupling
kernels to the (MC-validated) flat module.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import covariance
from chomp_tpu.curved import (
    ProfileCurvedMask,
    SphericalCapMask,
    UniformSphereMask,
    _legendre_all,
    _spin2_kappa_prefactor,
    _wigner_d_matrix,
    _xi_matrices_impl,
    curved_gaussian_block,
    curved_gaussian_covariance,
    curved_pair_normalization,
    curved_wtheta_fft,
    legendre_bin_factors,
    legendre_bin_factors_spin2,
)

EDGES_DEG = np.array([0.05, 0.1, 0.2, 0.4])


@pytest.fixture(scope="module")
def pred_setup(fiducial):
    """Shared window + linear-P lattice for the prediction tests."""
    import jax.numpy as jnp

    from chomp_tpu import limber_fft, linear, projection

    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    win = projection.WindowGalaxy(dist=dist)
    from chomp_tpu.params import DEFAULT_GRID as grid

    p = linear.linear_power(
        fiducial, jnp.asarray(np.exp(limber_fft.k_lattice(grid))))
    return fiducial, win, p, grid


def cl_powerlaw(ells):
    e = np.asarray(ells, dtype=float)
    return jnp.asarray(1.0e-6 / (1.0 + (e / 100.0) ** 1.4))


def test_wigner_d_exact_and_orthogonal():
    """Recursion vs sympy's exact Rotation.d at low ell (all four
    (m, n) families used), and ∫ d² dμ = 2/(2ℓ+1) at high ell."""
    from sympy import N as sym_N
    from sympy.physics.quantum.spin import Rotation

    betas = np.array([0.3, 1.2, 2.7])
    for (m, n) in [(0, 0), (2, 0), (2, 2), (2, -2)]:
        mat = _wigner_d_matrix(m, n, 6, np.cos(betas))
        for ell in range(max(abs(m), abs(n)), 7):
            for k, b in enumerate(betas):
                exact = complex(
                    sym_N(Rotation.d(ell, m, n, b).doit())).real
                assert abs(mat[ell, k] - exact) < 1e-12
    x, w = np.polynomial.legendre.leggauss(2400)
    for (m, n) in [(2, 0), (2, 2), (2, -2)]:
        d = _wigner_d_matrix(m, n, 900, x)
        for ell in (5, 211, 888):
            v = np.sum(w * d[ell] ** 2)
            np.testing.assert_allclose(v, 2.0 / (2 * ell + 1),
                                       rtol=1e-9)


def test_bin_factors_closed_form_and_flat_limit():
    """Closed-form bin averages vs direct Gauss-Legendre quadrature
    (1e-9), and the flat-sky limit: P̄_ℓ → J̄₀(ℓ+½), d̄^ℓ_{20} → J̄₂
    for sub-degree bins."""
    edges_rad = np.radians(EDGES_DEG)
    lmax = 3000
    b0 = legendre_bin_factors(lmax, edges_rad)
    b2 = legendre_bin_factors_spin2(lmax, edges_rad)
    # quadrature referee on one bin, a few ells
    xq, wq = np.polynomial.legendre.leggauss(600)
    lo, hi = np.cos(edges_rad[2]), np.cos(edges_rad[1])
    mu_q = 0.5 * (hi - lo) * xq + 0.5 * (hi + lo)
    p = _legendre_all(lmax, mu_q)
    d20 = _wigner_d_matrix(2, 0, lmax, mu_q)
    for ell in (3, 57, 411, 2750):
        q0 = np.sum(0.5 * (hi - lo) * wq * p[ell]) / (hi - lo)
        q2 = np.sum(0.5 * (hi - lo) * wq * d20[ell]) / (hi - lo)
        assert abs(q0 - b0[1, ell]) < 1e-9
        assert abs(q2 - b2[1, ell]) < 1e-9
    ells = np.arange(lmax + 1)
    j0 = np.asarray(covariance.bin_averaged_j0(
        jnp.asarray(ells + 0.5), edges_rad))
    j2 = np.asarray(covariance.bin_averaged_j2(
        jnp.asarray(ells + 0.5), edges_rad))
    sel = (ells > 50) & (ells < 2500)
    assert np.max(np.abs(b0[:, sel] - j0[:, sel])) < 1e-5
    assert np.max(np.abs(b2[:, sel] - j2[:, sel])) < 1e-5


def test_uniform_sphere_exact():
    """W ≡ 1: curved_gaussian_covariance equals the exact full-sky
    Σ_ℓ (2ℓ+1) P̄_i P̄_j [2Ct² - nn]/(16π²) + pair-closure formula to
    float64 roundoff, and the flat-sky formula to sub-percent."""
    n2d = 3.0e7
    lmax = 3000
    got = np.asarray(curved_gaussian_covariance(
        cl_powerlaw, EDGES_DEG, n2d, UniformSphereMask(),
        ell_max=lmax))
    edges_rad = np.radians(EDGES_DEG)
    ells = np.arange(lmax + 1)
    b0 = legendre_bin_factors(lmax, edges_rad)
    ct = np.asarray(cl_powerlaw(ells)) + 1.0 / n2d
    nn = 2.0 / n2d**2
    ref = np.einsum("il,l,jl->ij", b0,
                    (2 * ells + 1.0) * (2 * ct * ct - nn), b0) \
        / (16 * np.pi**2)
    dmu = np.cos(edges_rad[:-1]) - np.cos(edges_rad[1:])
    a_i = 2 * np.pi * dmu
    d_i = a_i * 4 * np.pi
    ref += nn * np.diag(a_i * 4 * np.pi) / np.outer(d_i, d_i)
    np.testing.assert_allclose(got, ref, rtol=1e-9)
    flat = np.asarray(covariance.gaussian_covariance(
        cl_powerlaw, EDGES_DEG, n2d, 4 * np.pi, n_ell_cov=2048,
        ell_lo=0.5, ell_hi=float(lmax)))
    np.testing.assert_allclose(got, flat, rtol=0.02)


def test_curved_pair_normalization_cap():
    """Spherical pair counts: uniform limit D_i = A_i · 4π exactly;
    cap counts decrease toward the footprint scale; ProfileCurvedMask
    with a step profile reproduces the analytic cap."""
    edges_rad = np.radians(np.array([1.0, 3.0, 8.0, 20.0, 45.0]))
    dmu = np.cos(edges_rad[:-1]) - np.cos(edges_rad[1:])
    a_i = 2 * np.pi * dmu
    d_u = curved_pair_normalization(UniformSphereMask(), edges_rad)
    np.testing.assert_allclose(d_u, a_i * 4 * np.pi, rtol=1e-6)
    cap = SphericalCapMask(np.radians(30.0))
    d_c = curved_pair_normalization(cap, edges_rad)
    frac = d_c / (a_i * cap.area2)
    assert np.all(np.diff(frac) < 0) and frac[0] > 0.9 and frac[-1] < 0.6
    th_nodes = np.linspace(0.0, np.radians(30.0), 4000)
    pm = ProfileCurvedMask(th_nodes, np.ones_like(th_nodes),
                           lmax_mask=512)
    assert abs(pm.area2 / cap.area2 - 1.0) < 1e-3
    assert abs(pm.area4 / cap.area4 - 1.0) < 1e-3
    d_p = curved_pair_normalization(pm, edges_rad)
    np.testing.assert_allclose(d_p, d_c, rtol=2e-2)


def test_xi_row_sum_parseval():
    """Scalar kernel row-sum identity Σ_ℓ' (2ℓ'+1) Ξ⁰_{ℓℓ'} = A₄/4π.

    A binary (hard-edged) cap has C^{W²}_L ~ L⁻³, so the weighted row
    (2ℓ'+1) Ξ_{ℓℓ'} carries an L⁻² tail and the truncated sum
    approaches the target only like 1/ell_split (measured: deficit
    0.67% / 0.32% / 0.16% at split 160/320/640).  Assert both the
    absolute level at split 320 and the first-order convergence rate —
    that validates the identity rather than tuning one tolerance."""
    cap = SphericalCapMask(0.6)
    target = cap.area4 / (4.0 * np.pi)

    def deficit(split):
        xi0 = _xi_matrices_impl(cap, split, ("0",))["0"]
        rows = (2.0 * np.arange(split + 1) + 1.0)[None, :] * xi0
        # low rows: the coupling kernel is fully inside the truncation
        return np.max(np.abs(rows[:40].sum(axis=1) / target - 1.0))

    d160, d320 = deficit(160), deficit(320)
    assert d320 < 5e-3
    assert 0.3 < d320 / d160 < 0.7          # ~1/split tail


@pytest.mark.slow
def test_kernel_flat_limits():
    """The decisive kernel correspondence on a small cap (α = 0.1):
    Ξ⁰ ∝ K₀, Ξ² ∝ K₂, and the even-parity spin kernel Ξᴾ ∝ ½(K₀+K₄)
    — the flat module's MC-validated gamma_t kernel — all with the
    SAME proportionality constant (the flat/curved measure factor)."""
    from chomp_tpu.mask import DiscMask, _coupling_matrix_impl

    alpha = 0.1
    cap = SphericalCapMask(alpha)
    split = 240
    mats = _xi_matrices_impl(cap, split, ("0", "2", "P"))
    disc = DiscMask(alpha)
    lsel = np.arange(24, split + 1, 24)
    lnq = tuple(np.log(lsel + 0.5))
    k0 = _coupling_matrix_impl(disc, lnq, 480)
    k2 = _coupling_matrix_impl(disc, lnq, 480, moment=2)
    k4 = _coupling_matrix_impl(disc, lnq, 480, moment=4)
    r00 = mats["0"][np.ix_(lsel, lsel)] / k0
    c = np.mean(r00)
    assert np.std(r00) / c < 0.01
    r2 = mats["2"][np.ix_(lsel, lsel)] / k2 / c
    rp = mats["P"][np.ix_(lsel, lsel)] / (0.5 * (k0 + k4)) / c
    assert abs(np.mean(r2) - 1.0) < 0.03 and np.std(r2) < 0.06
    assert abs(np.mean(rp) - 1.0) < 0.03 and np.std(rp) < 0.06


@pytest.mark.slow
def test_cap_vs_flat_disc_end_to_end():
    """Small cap (α = 0.1 rad) vs the flat DiscMask treatment — w
    block AND gamma_t auto block within ~2% on the diagonal (the flat
    module is itself MC-validated, so this anchors the whole curved
    chain: pair counts, delta limit, coupled corrections, spin
    kernels)."""
    from chomp_tpu.mask import DiscMask

    alpha = 0.1
    cap = SphericalCapMask(alpha)
    disc = DiscMask(alpha)
    edges = np.degrees(np.array([0.01, 0.02, 0.04, 0.07]))
    lmax = 2000

    def cl2(e):
        e = np.asarray(e, dtype=float)
        return jnp.asarray(1.0 / (1.0 + (e / 120.0) ** 2.2))

    kw_flat = dict(n_ell_cov=1536, ell_lo=0.5, ell_hi=float(lmax),
                   mask=disc)
    cov_c = np.asarray(curved_gaussian_covariance(
        cl2, edges, 1e8, cap, ell_max=lmax))
    cov_f = np.asarray(covariance.gaussian_block(
        cl2, cl2, cl2, cl2, edges, edges, 0.0, 0, 0,
        1e-8, 1e-8, 1e-8, 1e-8, **kw_flat))
    np.testing.assert_allclose(np.diag(cov_c), np.diag(cov_f),
                               rtol=0.02)
    np.testing.assert_allclose(cov_c[0, 1], cov_f[0, 1], rtol=0.05)
    cov_cg = np.asarray(curved_gaussian_block(
        cl2, cl2, cl2, cl2, edges, edges, cap, 2, 2,
        0.0, 1e-8, 0.0, 0.0, ell_max=lmax))
    cov_fg = np.asarray(covariance.gaussian_block(
        cl2, cl2, cl2, cl2, edges, edges, 0.0, 2, 2,
        0.0, 1e-8, 0.0, 0.0, **kw_flat))
    np.testing.assert_allclose(np.diag(cov_cg), np.diag(cov_fg),
                               rtol=0.02)
    # mixed w x gamma_t block: same anchor
    cov_cm = np.asarray(curved_gaussian_block(
        cl2, cl2, cl2, cl2, edges, edges, cap, 0, 2,
        0.0, 0.0, 0.0, 0.0, ell_max=lmax))
    cov_fm = np.asarray(covariance.gaussian_block(
        cl2, cl2, cl2, cl2, edges, edges, 0.0, 0, 2,
        0.0, 0.0, 0.0, 0.0, **kw_flat))
    np.testing.assert_allclose(np.diag(cov_cm), np.diag(cov_fm),
                               rtol=0.03)


def test_wide_cap_structure():
    """Wide cap (α = 30°), degree-scale bins: masked > uniform-fsky
    variance growing toward the footprint scale; joint [w, γt] blocks
    symmetric and the full 2-block matrix PSD; traced C_ℓ inputs jit
    cleanly (static geometry, traced spectra)."""
    import jax

    cap = SphericalCapMask(np.radians(30.0))
    edges = np.array([0.5, 1.5, 4.0, 10.0, 25.0])
    lmax = 600

    def cl2(e):
        e = np.asarray(e, dtype=float)
        return jnp.asarray(1.0e-5 / (1.0 + (e / 40.0) ** 1.8))

    cov_m = np.asarray(curved_gaussian_covariance(
        cl2, edges, 1e7, cap, ell_max=lmax))
    ev = np.linalg.eigvalsh(0.5 * (cov_m + cov_m.T))
    assert np.all(ev > 0)
    # uniform comparison at the same effective area: masked diagonal
    # exceeds it increasingly toward cap-scale bins (noise-only).
    zero = lambda e: jnp.zeros(len(np.asarray(e)))
    n_m = np.diag(np.asarray(curved_gaussian_covariance(
        zero, edges, 1e7, cap, ell_max=lmax)))
    ofs = cap.area2
    n_u = np.diag(np.asarray(covariance.gaussian_covariance(
        zero, edges, 1e7, ofs, n_ell_cov=1024, ell_lo=0.5,
        ell_hi=float(lmax))))
    assert np.all(n_m > 0.99 * n_u)
    assert (n_m / n_u)[-1] > (n_m / n_u)[0]
    # jit with a traced spectrum vector
    ells = np.arange(lmax + 1)

    @jax.jit
    def f(amp):
        return curved_gaussian_block(
            lambda e: amp * cl2(e), lambda e: amp * cl2(e),
            lambda e: amp * cl2(e), lambda e: amp * cl2(e),
            edges, edges, cap, 0, 0, ell_max=lmax)

    c1 = np.asarray(f(1.0))
    c2 = np.asarray(f(2.0))
    np.testing.assert_allclose(c2, 4.0 * c1, rtol=1e-9)


# ---------------------------------------------------------------------------
# Curved-sky observable predictions
# ---------------------------------------------------------------------------

def test_curved_operator_exact_vs_direct(pred_setup):
    """The fused operator path (scatter-composed Catmull-Rom + taper +
    κ prefactor) equals a direct dense multipole sum over the SAME
    interpolated integer-ℓ C's to float64 roundoff — for both spin
    kernels."""
    import jax.numpy as jnp

    from chomp_tpu import limber_fft

    cosmo, win, p, grid = pred_setup
    theta = np.array([0.1, 0.5, 2.0])
    lmax = 4000
    ells_int = np.arange(lmax + 1, dtype=float)
    cl = np.asarray(limber_fft.limber_cl_fft(
        cosmo, win, win, ells_int, p, grid))      # applies its own +0.5
    wl = (2.0 * ells_int + 1.0) / (4.0 * np.pi)
    l_t = 0.85 * lmax
    tap = np.where(ells_int <= l_t, 1.0, 0.5 * (1.0 + np.cos(
        np.pi * (ells_int - l_t) / (lmax - l_t))))
    x = np.cos(np.radians(theta))
    direct0 = (wl * tap * cl) @ _legendre_all(lmax, x)
    op0 = np.asarray(curved_wtheta_fft(cosmo, win, win, theta, p, grid,
                                       mu=0.0, lmax=lmax))
    np.testing.assert_allclose(op0, direct0, rtol=1e-12)
    direct2 = (wl * tap * cl * _spin2_kappa_prefactor(lmax)) \
        @ _wigner_d_matrix(2, 0, lmax, x)
    op2 = np.asarray(curved_wtheta_fft(cosmo, win, win, theta, p, grid,
                                       mu=2.0, lmax=lmax))
    np.testing.assert_allclose(op2, direct2, rtol=1e-12)


def test_curved_flat_limit_and_convention(pred_setup):
    """At sub-degree θ the exact curved sums match the ν-ALIGNED flat
    transform (flat route with ell_offset=0: C(k=ν/χ) paired with
    J(νθ)) to ≤1e-4 — while the flat DEFAULT (C(ℓ+½) paired with
    J(ℓθ)) differs by the documented few×1e-3 half-step convention
    artifact.  The curved route referees the flat convention."""
    from chomp_tpu import limber_fft

    cosmo, win, p, grid = pred_setup
    th = np.array([0.05, 0.1, 0.2, 0.5])
    for mu in (0.0, 2.0):
        wf0 = np.asarray(limber_fft.limber_wtheta_fft(
            cosmo, win, win, tuple(th.tolist()), p, grid, mu=mu,
            ell_offset=0.0))
        wf5 = np.asarray(limber_fft.limber_wtheta_fft(
            cosmo, win, win, tuple(th.tolist()), p, grid, mu=mu))
        wc = np.asarray(curved_wtheta_fft(cosmo, win, win, th, p, grid,
                                          mu=mu))
        rel_aligned = np.max(np.abs(wc / wf0 - 1.0))
        rel_default = np.max(np.abs(wc / wf5 - 1.0))
        assert rel_aligned < 1e-4, (mu, rel_aligned)
        assert 5e-4 < rel_default < 6e-3, (mu, rel_default)


def test_curved_bin_average_and_stability(pred_setup):
    """bin_average=True equals the μ-weighted quadrature average of the
    point operator over each bin (same lmax/taper), and the auto-lmax
    point values are stable under lmax doubling at ≤2e-4."""
    cosmo, win, p, grid = pred_setup
    edges = np.array([0.2, 0.4, 0.8, 1.6])
    lmax = 12000
    xq, wq = np.polynomial.legendre.leggauss(48)
    for mu in (0.0, 2.0):
        wb = np.asarray(curved_wtheta_fft(cosmo, win, win, edges, p,
                                          grid, mu=mu, bin_average=True,
                                          lmax=lmax))
        mu_e = np.cos(np.radians(edges))
        ref = np.empty(len(edges) - 1)
        for i in range(len(edges) - 1):
            lo, hi = mu_e[i + 1], mu_e[i]
            mu_q = 0.5 * (hi - lo) * xq + 0.5 * (hi + lo)
            th_q = np.degrees(np.arccos(mu_q))
            wp = np.asarray(curved_wtheta_fft(
                cosmo, win, win, th_q, p, grid, mu=mu, lmax=lmax))
            ref[i] = np.sum(0.5 * wq * wp)
        np.testing.assert_allclose(wb, ref, rtol=2e-6)
        th = np.array([0.1, 0.5, 2.0])
        lm_auto = int(max(2048, 64.0 / np.radians(th.min())))
        w1 = np.asarray(curved_wtheta_fft(cosmo, win, win, th, p, grid,
                                          mu=mu))
        w2 = np.asarray(curved_wtheta_fft(cosmo, win, win, th, p, grid,
                                          mu=mu, lmax=2 * lm_auto,
                                          taper_frac=0.08))
        assert np.max(np.abs(w2 / w1 - 1.0)) < 2e-4, mu


def test_curved_pipeline_geometry(fiducial):
    """make_pipeline(geometry='curved') runs end-to-end (separable AND
    exact-z anchor routes) on wide bins and matches the flat pipeline
    at the flat-sky-approximation level."""
    import jax.numpy as jnp

    from chomp_tpu.params import GridSpec, default_halo
    from chomp_tpu.parallel.sweep import make_pipeline
    from chomp_tpu.hod import default_hod
    from chomp_tpu import projection

    grid = GridSpec(n_mass=64, n_ell=64, n_theta=8,
                    theta_min_deg=0.1, theta_max_deg=2.0)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.2), z_max=jnp.asarray(1.2),
        z0=jnp.asarray(0.6), sigma_z=jnp.asarray(0.15))
    hod = default_hod()
    kw = dict(z_pivot=0.6, grid=grid)
    flat = make_pipeline(default_halo(), hod, dist, **kw)(fiducial)
    curv = make_pipeline(default_halo(), hod, dist, geometry="curved",
                         **kw)(fiducial)
    for key in ("w_theta", "gamma_t"):
        f = np.asarray(flat[key])
        c = np.asarray(curv[key])
        assert np.all(np.isfinite(c))
        np.testing.assert_allclose(c, f, rtol=2e-2, err_msg=key)
    curv_ez = make_pipeline(default_halo(), hod, dist, geometry="curved",
                            exact_z_anchors=4, **kw)(fiducial)
    assert np.all(np.isfinite(np.asarray(curv_ez["w_theta"])))
    assert np.all(np.isfinite(np.asarray(curv_ez["gamma_t"])))
    with pytest.raises(ValueError, match="geometry"):
        make_pipeline(default_halo(), hod, dist, method="table",
                      geometry="curved", **kw)


# ---------------------------------------------------------------------------
# PixelSphereMask: general (non-azimuthal) curved footprints
# ---------------------------------------------------------------------------

def _cap_weight_map(n_ring, n_phi, radius_rad, center=(0.0, 0.0)):
    """Binary cap indicator on the iso-latitude grid (any center)."""
    th = (np.arange(n_ring) + 0.5) * np.pi / n_ring
    ph = np.arange(n_phi) * 2 * np.pi / n_phi
    ct0, st0 = np.cos(center[0]), np.sin(center[0])
    mu = ct0 * np.cos(th)[:, None] \
        + st0 * np.sin(th)[:, None] * np.cos(ph[None, :] - center[1])
    return (mu >= np.cos(radius_rad)).astype(float)


def test_pixel_sphere_uniform_exact():
    """W == 1: the ratio estimator cancels pixelization discreteness
    exactly, reproducing UniformSphereMask's xi == 1 at every node and
    the full-sky areas at midpoint-rule accuracy."""
    from chomp_tpu.curved import PixelSphereMask

    m = PixelSphereMask(np.ones((64, 128)))
    mu_g = np.linspace(-1.0, 1.0, 201)
    np.testing.assert_allclose(m.xi_w2(mu_g), 1.0, rtol=2e-4)
    np.testing.assert_allclose(m.area2, 4.0 * np.pi, rtol=1e-3)
    np.testing.assert_allclose(m.area4, 4.0 * np.pi, rtol=1e-3)
    th_g = np.linspace(0.01, np.pi - 0.01, 100)
    np.testing.assert_allclose(m.pair_function(th_g), 4.0 * np.pi,
                               rtol=2e-4)


@pytest.mark.parametrize("center", [(0.0, 0.0), (1.2, 0.7)])
def test_pixel_sphere_vs_analytic_cap(center):
    """A pixelized spherical cap — grid-aligned (polar, worst case:
    the boundary quantizes to whole rings) and generically rotated —
    matches the analytic SphericalCapMask at its own EFFECTIVE radius
    (arccos-inverted from A2) to the pixelization level: pair function
    within 4% of A2 everywhere, pair normalization within 2.5%."""
    from chomp_tpu.curved import PixelSphereMask, SphericalCapMask

    rad = np.radians(25.0)
    m = PixelSphereMask(_cap_weight_map(256, 512, rad, center))
    r_eff = np.arccos(1.0 - m.area2 / (2.0 * np.pi))
    # the effective radius stays within half a ring of the request
    assert abs(r_eff - rad) < np.pi / 256
    ref = SphericalCapMask(r_eff)
    assert m.area4 == pytest.approx(m.area2)        # binary map
    th_g = np.radians(np.linspace(0.3, 48.0, 100))
    dev = (m.pair_function(th_g) - ref.pair_function(th_g)) / ref.area2
    assert np.max(np.abs(dev)) < 0.04
    # exact zero-lag anchors
    np.testing.assert_allclose(m.xi_w2(1.0), m.area4 / (4.0 * np.pi),
                               rtol=1e-12)
    edges = np.radians([1.0, 2.0, 4.0, 8.0])
    d_pix = curved_pair_normalization(m, edges)
    d_ref = curved_pair_normalization(ref, edges)
    np.testing.assert_allclose(d_pix, d_ref, rtol=2.5e-2)


def test_pixel_sphere_cap_covariance():
    """curved_gaussian_covariance driven by the pixelized cap matches
    the analytic-cap result within the measured pixelization accuracy
    (5% in units of the diagonal) — for the grid-aligned AND the
    rotated (genuinely non-azimuthal on the grid) placement."""
    from chomp_tpu.curved import (PixelSphereMask, SphericalCapMask,
                                  curved_gaussian_covariance)

    rad = np.radians(25.0)
    edges_deg = np.array([0.5, 1.0, 2.0, 4.0])
    n2d = 1.0e7

    def cl(e):
        e = np.asarray(e, dtype=float)
        return 1.0e-6 / (1.0 + (e / 80.0) ** 1.3)

    for center in ((0.0, 0.0), (1.2, 0.7)):
        m = PixelSphereMask(_cap_weight_map(256, 512, rad, center))
        r_eff = np.arccos(1.0 - m.area2 / (2.0 * np.pi))
        ref = SphericalCapMask(r_eff)
        ca = np.asarray(curved_gaussian_covariance(
            cl, edges_deg, n2d, ref, ell_max=512))
        cp = np.asarray(curved_gaussian_covariance(
            cl, edges_deg, n2d, m, ell_max=512))
        scale = np.sqrt(np.outer(np.diag(ca), np.diag(ca)))
        assert np.max(np.abs(cp - ca) / scale) < 0.05, center
        np.testing.assert_allclose(cp, cp.T, rtol=1e-10)


def test_pixel_sphere_two_caps():
    """A genuinely non-azimuthal footprint (two disjoint caps): areas
    add, the pair function of W^2 vanishes in the separation gap
    (2*rad < theta < sep - 2*rad) and reappears around the center
    separation — structure no azimuthally symmetric profile can
    represent."""
    from chomp_tpu.curved import PixelSphereMask, SphericalCapMask

    rad = np.radians(12.0)
    sep = 2.2                      # center separation, rad
    w = _cap_weight_map(256, 512, rad) \
        + _cap_weight_map(256, 512, rad, center=(sep, 1.0))
    assert w.max() == 1.0          # disjoint
    m = PixelSphereMask(w)
    one_cap = SphericalCapMask(rad).area2
    np.testing.assert_allclose(m.area2, 2.0 * one_cap, rtol=2e-2)
    gap = np.linspace(2.0 * rad + 0.1, sep - 2.0 * rad - 0.1, 20)
    assert np.all(m.pair_function2(gap) < 1e-3 * m.area2)
    bump = m.pair_function2(np.linspace(sep - 0.05, sep + 0.05, 11))
    assert np.all(bump > 0.01 * m.area2)


# ---------------------------------------------------------------------------
# Spherical-harmonic Monte Carlo referee (non-azimuthal mask)
# ---------------------------------------------------------------------------

# Shared with test_bandpowers.py (MASTER coupling referees).
from tests.sht_referee import (_sht_lambda_tables, _sht_pseudo_power,
                               _sht_synth)


def _two_cap_indicator(th, ph, rad, center2):
    def mu_to(center):
        ct0, st0 = np.cos(center[0]), np.sin(center[0])
        return (ct0 * np.cos(th)[:, None] + st0 * np.sin(th)[:, None]
                * np.cos(ph[None, :] - center[1]))
    return ((mu_to((0.0, 0.0)) >= np.cos(rad))
            | (mu_to(center2) >= np.cos(rad))).astype(float)


def test_curved_block_mc_referee_nonazimuthal():
    """End-to-end sphere Monte Carlo for a genuinely NON-azimuthal
    footprint (two disjoint 25° caps): Gaussian a_ℓm realizations
    synthesized on a GL×FFT grid, masked, pseudo-powers analyzed, the
    pair-normalized estimator w_hat_i = 2π Σ t_ℓ P̃_ℓ / D_i accumulated
    over 1024 realizations — against curved_gaussian_block driven by a
    PixelSphereMask of the same footprint (full coupling,
    ell_split=lmax).  Asserts: SHT round trip exact; diagonal within
    [0.8, 1.3] of MC (NKA is measured ~+3..14% conservative here, MC
    noise ~5%); correlation structure within 0.16 absolute; the naive
    full-sky prediction is wrong by >5x (discrimination)."""
    from chomp_tpu.curved import (PixelSphereMask, UniformSphereMask,
                                  curved_gaussian_block)

    lmax, n_lat, n_phi = 96, 128, 256
    xg, wq = np.polynomial.legendre.leggauss(n_lat)
    th_g = np.arccos(xg)
    ph_g = np.arange(n_phi) * 2 * np.pi / n_phi
    lams = _sht_lambda_tables(lmax, xg)

    # SHT round trip (unmasked pseudo-power == Σ_m fac |a|² exactly)
    rng = np.random.default_rng(1)
    a_re = [rng.standard_normal((2, lmax + 1 - m)) for m in range(lmax + 1)]
    a_im = [rng.standard_normal((2, lmax + 1 - m)) for m in range(lmax + 1)]
    a_im[0][:] = 0.0
    ps = _sht_pseudo_power(lams, _sht_synth(lams, a_re, a_im, n_phi),
                           wq, n_phi)
    ps_direct = np.zeros((2, lmax + 1))
    for m in range(lmax + 1):
        ps_direct[:, m:] += ((1.0 if m == 0 else 2.0)
                             * (a_re[m] ** 2 + a_im[m] ** 2))
    np.testing.assert_allclose(ps, ps_direct, rtol=1e-10)

    rad = np.radians(25.0)
    center2 = (2.2, 1.0)
    w_gl = _two_cap_indicator(th_g, ph_g, rad, center2)
    th_pix = (np.arange(256) + 0.5) * np.pi / 256
    ph_pix = np.arange(512) * 2 * np.pi / 512
    pixmask = PixelSphereMask(_two_cap_indicator(th_pix, ph_pix, rad,
                                                 center2))

    edges_deg = np.array([2.0, 4.0, 8.0, 16.0])
    edges = np.radians(edges_deg)
    dmu = np.cos(edges[:-1]) - np.cos(edges[1:])
    t_l = legendre_bin_factors(lmax, edges) * dmu[:, None]
    d_i = curved_pair_normalization(pixmask, edges)

    ells = np.arange(lmax + 1, dtype=float)
    cl_vec = 1.0e-6 / (1.0 + (ells / 20.0) ** 2.0)
    rng = np.random.default_rng(7)
    n_real, chunk = 1024, 128
    w_hats = []
    for _ in range(n_real // chunk):
        a_re = [rng.standard_normal((chunk, lmax + 1 - m))
                for m in range(lmax + 1)]
        a_im = [rng.standard_normal((chunk, lmax + 1 - m))
                for m in range(lmax + 1)]
        for m in range(lmax + 1):
            sig = np.sqrt(cl_vec[m:] / (1.0 if m == 0 else 2.0))
            a_re[m] *= sig
            a_im[m] *= sig
        a_im[0][:] = 0.0
        maps = _sht_synth(lams, a_re, a_im, n_phi)
        ps = _sht_pseudo_power(lams, maps * w_gl[None, :, :], wq, n_phi)
        w_hats.append((2.0 * np.pi * ps @ t_l.T) / d_i[None, :])
    cov_mc = np.cov(np.concatenate(w_hats).T)

    def cl_fn(e):
        e = np.asarray(e, dtype=float)
        return 1.0e-6 / (1.0 + (e / 20.0) ** 2.0)

    cov_pred = np.asarray(curved_gaussian_block(
        cl_fn, cl_fn, cl_fn, cl_fn, edges_deg, edges_deg, pixmask,
        ell_max=lmax, ell_split=lmax))
    ratio = np.diag(cov_pred) / np.diag(cov_mc)
    assert np.all((ratio > 0.8) & (ratio < 1.3)), ratio
    nrm = np.sqrt(np.outer(np.diag(cov_mc), np.diag(cov_mc)))
    assert np.max(np.abs(cov_pred / nrm - cov_mc / nrm)) < 0.25
    off = np.abs(cov_pred / np.sqrt(np.outer(np.diag(cov_pred),
                                             np.diag(cov_pred)))
                 - cov_mc / nrm)
    assert np.max(off[~np.eye(3, dtype=bool)]) < 0.16, off

    cov_full = np.asarray(curved_gaussian_block(
        cl_fn, cl_fn, cl_fn, cl_fn, edges_deg, edges_deg,
        UniformSphereMask(), ell_max=lmax))
    assert np.all(np.diag(cov_full) / np.diag(cov_mc) < 0.2)


# ---------------------------------------------------------------------------
# Curved joint (w_gg, gamma_t) covariance
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_curved_joint_covariance(fiducial):
    """curved_joint_wtheta_gammat_covariance (lattice C_ell's + curved
    geometry): matches the flat joint builder with a same-radius
    DiscMask at sub-footprint bins to the flat-sky-approximation level
    (6%), and the UniformSphereMask case matches the flat uniform
    builder at 4pi; symmetric and PSD throughout."""
    import jax.numpy as jnp

    from chomp_tpu import covariance, projection
    from chomp_tpu.curved import (SphericalCapMask, UniformSphereMask,
                                  curved_joint_wtheta_gammat_covariance)
    from chomp_tpu.mask import DiscMask
    from chomp_tpu.params import GridSpec, default_halo
    from chomp_tpu.halo import build_halo_model
    from chomp_tpu.hod import default_hod

    g = GridSpec(n_mass=48, n_mu=8, sigma_panels=6, sigma_n_per_panel=24,
                 n_growth=24, n_dist=24)
    halo_p = default_halo()
    model = build_halo_model(fiducial, halo_p, default_hod(), 0.0,
                             False, g)
    dist_l = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(0.7), sigma_z=jnp.asarray(0.2))
    dist_s = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.1), sigma_z=jnp.asarray(0.3))
    edges = np.array([1.0, 2.0, 4.0, 8.0])
    n2d, sn = 3.0e7, 1.0e-9
    radius = np.radians(15.0)

    flat = np.asarray(covariance.joint_wtheta_gammat_covariance(
        fiducial, halo_p, model, dist_l, dist_s, edges, 0.0, n2d, sn,
        grid=g, include_nongaussian=False, n_ell_cov_g=2048,
        mask=DiscMask(radius)))
    curv = np.asarray(curved_joint_wtheta_gammat_covariance(
        fiducial, halo_p, model, dist_l, dist_s, edges, n2d, sn,
        SphericalCapMask(radius), ell_max=2048, grid=g))
    assert curv.shape == flat.shape == (6, 6)
    np.testing.assert_allclose(curv, curv.T, rtol=1e-8)
    ev = np.linalg.eigvalsh(0.5 * (curv + curv.T))
    assert np.all(ev > 0), ev
    scale = np.sqrt(np.outer(np.diag(flat), np.diag(flat)))
    assert np.max(np.abs(curv - flat) / scale) < 0.06

    flat_u = np.asarray(covariance.joint_wtheta_gammat_covariance(
        fiducial, halo_p, model, dist_l, dist_s, edges,
        4.0 * np.pi, n2d, sn, grid=g, include_nongaussian=False,
        n_ell_cov_g=2048))
    curv_u = np.asarray(curved_joint_wtheta_gammat_covariance(
        fiducial, halo_p, model, dist_l, dist_s, edges, n2d, sn,
        UniformSphereMask(), ell_max=2048, grid=g))
    scale_u = np.sqrt(np.outer(np.diag(flat_u), np.diag(flat_u)))
    assert np.max(np.abs(curv_u - flat_u) / scale_u) < 0.05


# ---------------------------------------------------------------------------
# Spin-2 sphere Monte Carlo referee (gamma_t blocks, incl. non-azimuthal)
# ---------------------------------------------------------------------------

def _sht_dmn_tables(n, lmax, x):
    """General Wigner-d tables d^ℓ_{m,n}(x) for fixed n ∈ {±2}, listed
    per m ≥ 0 as (lmax+1-ℓmin, nx) arrays (closed-form ℓmin seeds +
    the same upward recursion as curved._wigner_d_matrix; sympy- and
    orthogonality-validated in the referee)."""
    from math import lgamma

    x = np.asarray(x, float)
    ch = np.sqrt((1.0 + x) / 2.0)
    sh = np.sqrt((1.0 - x) / 2.0)
    out = []
    for m in range(lmax + 1):
        lmin = max(m, abs(n))
        rows = np.zeros((lmax + 1 - lmin, x.size))
        if lmin == m and m >= abs(n):
            lognorm = 0.5 * (lgamma(2 * m + 1) - lgamma(m + n + 1)
                             - lgamma(m - n + 1))
            seed = np.exp(lognorm) * ch ** (m + n) * (-sh) ** (m - n)
        elif n == 2:          # m < 2: seed d²_{m,2} = (-1)^m d²_{2,m}
            lognorm = 0.5 * (lgamma(5) - lgamma(2 + m + 1)
                             - lgamma(2 - m + 1))
            seed = ((-1.0) ** (m - 2) * np.exp(lognorm)
                    * ch ** (2 + m) * (-sh) ** (2 - m))
        else:                 # n == -2, m < 2: d²_{m,-2} = d²_{2,-m}
            k = -m
            lognorm = 0.5 * (lgamma(5) - lgamma(2 + k + 1)
                             - lgamma(2 - k + 1))
            seed = np.exp(lognorm) * ch ** (2 + k) * (-sh) ** (2 - k)
        rows[0] = seed
        prev = np.zeros_like(x)
        for li in range(lmin, lmax):
            ell = float(li)
            a = ell * np.sqrt(((ell + 1) ** 2 - m * m)
                              * ((ell + 1) ** 2 - n * n))
            b = (2 * ell + 1) * (ell * (ell + 1) * x - m * n)
            c = (ell + 1) * np.sqrt(max(ell * ell - m * m, 0.0)
                                    * max(ell * ell - n * n, 0.0))
            nxt = (b * rows[li - lmin] - c * prev) / a
            prev = rows[li - lmin]
            rows[li - lmin + 1] = nxt
        out.append(rows)
    return out


class _Spin2Sht:
    """Minimal batched scalar + spin-2 SHT on a GL×FFT grid with
    COMPLEX per-m coefficient batches (reality handled via the
    a_{ℓ,-m} = (-1)^m a*_{ℓm} convention): the machinery of the
    spin-2 masked-covariance referee."""

    def __init__(self, lmax, n_lat, n_phi):
        self.lmax, self.n_lat, self.n_phi = lmax, n_lat, n_phi
        self.xg, self.wq = np.polynomial.legendre.leggauss(n_lat)
        self.nl = np.sqrt((2.0 * np.arange(lmax + 1) + 1.0)
                          / (4.0 * np.pi))
        self.lams = _sht_lambda_tables(lmax, self.xg)
        self.d_p2 = _sht_dmn_tables(2, lmax, self.xg)
        self.d_m2 = _sht_dmn_tables(-2, lmax, self.xg)

    def synth_scalar(self, a):
        n_real = a[0].shape[0]
        spec = np.zeros((n_real, self.n_lat, self.n_phi), dtype=complex)
        for m in range(self.lmax + 1):
            spec[:, :, m % self.n_phi] += a[m] @ self.lams[m]
            if m > 0:
                spec[:, :, (-m) % self.n_phi] += (np.conj(a[m])
                                                  @ self.lams[m])
        return np.real(np.fft.ifft(spec, axis=2)) * self.n_phi

    def analyze_scalar(self, maps, w):
        f = np.fft.fft(maps * w[None, :, :], axis=2) \
            * (2.0 * np.pi / self.n_phi)
        return [(f[:, :, m % self.n_phi] * self.wq[None, :])
                @ self.lams[m].T for m in range(self.lmax + 1)]

    def synth_spin2(self, a_e):
        """γ₊ maps from E-mode batches (B = 0): γ₊ = -Σ a^E N d_{m,2}
        e^{imφ}; negative m via d_{-m,2} = (-1)^m d_{m,-2} and scalar
        reality of a^E."""
        n_real = a_e[0].shape[0]
        spec = np.zeros((n_real, self.n_lat, self.n_phi), dtype=complex)
        for m in range(self.lmax + 1):
            nlv = self.nl[max(m, 2):]
            spec[:, :, m % self.n_phi] += -(a_e[m] * nlv[None, :]) \
                @ self.d_p2[m]
            if m > 0:
                spec[:, :, (-m) % self.n_phi] += \
                    -(np.conj(a_e[m]) * nlv[None, :]) @ self.d_m2[m]
        return np.fft.ifft(spec, axis=2) * self.n_phi

    def analyze_spin2(self, maps_gp, w):
        """Masked pseudo (ẽ, b̃) for m ≥ 0: ẽ = (A₊+A₋)/2 with
        A±_{ℓm} = -∫ W γ± N d_{m,±2} e^{-imφ}."""
        wp = np.fft.fft(maps_gp * w[None, :, :], axis=2) \
            * (2.0 * np.pi / self.n_phi)
        wm = np.fft.fft(np.conj(maps_gp) * w[None, :, :], axis=2) \
            * (2.0 * np.pi / self.n_phi)
        e_t, b_t = [], []
        for m in range(self.lmax + 1):
            nlv = self.nl[max(m, 2):]
            fp = wp[:, :, m % self.n_phi] * self.wq[None, :]
            fm = wm[:, :, m % self.n_phi] * self.wq[None, :]
            a_p = -(fp @ self.d_p2[m].T) * nlv[None, :]
            a_m = -(fm @ self.d_m2[m].T) * nlv[None, :]
            e_t.append(0.5 * (a_p + a_m))
            b_t.append((a_p - a_m) / 2.0j)
        return e_t, b_t


def _spin2_mc_covariance(sht, w_gl, c_gg, c_ee, c_ge, t0, t2, d_i,
                         n_real, chunk, seed):
    """MC covariance of the stacked [w_hat, gt_hat] harmonic pair
    estimators for correlated (g, E) Gaussian skies under mask w_gl."""
    lmax = sht.lmax
    rng = np.random.default_rng(seed)
    nb = t0.shape[0]
    est = np.empty((n_real, 2 * nb))
    for s in range(0, n_real, chunk):
        ag, a_e = [], []
        for m in range(lmax + 1):
            nl0, nl2 = lmax + 1 - m, lmax + 1 - max(m, 2)
            z1 = (rng.standard_normal((chunk, nl0))
                  + 1j * rng.standard_normal((chunk, nl0))) / np.sqrt(2)
            z2 = (rng.standard_normal((chunk, nl2))
                  + 1j * rng.standard_normal((chunk, nl2))) / np.sqrt(2)
            if m == 0:
                z1 = z1.real * np.sqrt(2) + 0j
                z2 = z2.real * np.sqrt(2) + 0j
            sl0, sl2 = slice(m, None), slice(max(m, 2), None)
            ag.append(z1 * np.sqrt(c_gg[sl0]))
            alpha = np.where(c_gg[sl2] > 0,
                             c_ge[sl2] / np.sqrt(c_gg[sl2]), 0.0)
            beta = np.sqrt(np.maximum(c_ee[sl2] - alpha**2, 0.0))
            a_e.append(z1[:, (max(m, 2) - m):] * alpha + z2 * beta)
        g_t = sht.analyze_scalar(sht.synth_scalar(ag), w_gl)
        e_t, _ = sht.analyze_spin2(sht.synth_spin2(a_e), w_gl)
        ps_gg = np.zeros((chunk, lmax + 1))
        ps_ge = np.zeros((chunk, lmax + 1))
        for m in range(lmax + 1):
            fac = 1.0 if m == 0 else 2.0
            ps_gg[:, m:] += fac * np.abs(g_t[m]) ** 2
            ps_ge[:, max(m, 2):] += fac * np.real(
                np.conj(g_t[m][:, (max(m, 2) - m):]) * e_t[m])
        est[s:s + chunk, :nb] = (2 * np.pi * ps_gg @ t0.T) / d_i[None, :]
        est[s:s + chunk, nb:] = (2 * np.pi * ps_ge @ t2.T) / d_i[None, :]
    return est


@pytest.mark.slow
def test_curved_spin2_mc_referee():
    """Spin-2 sphere MC referee for the masked gamma_t covariance: a
    full spin-2 SHT (general-m Wigner-d tables, sympy-checked seeds +
    orthogonality; E/B round trip exact to 4e-12), correlated (g, E)
    skies, masked pseudo-spectra, the joint [w, gt] pair-normalized
    estimators — against curved_gaussian_block's Xi0/Xi2/XiP kernels
    on (a) a 25° cap (measured an/mc diagonal ratios
    [1.13 1.13 1.09 | 1.02 1.04 1.19]) and (b) a genuinely
    NON-azimuthal two-cap footprint via PixelSphereMask (measured
    [1.02 1.02 1.00 | 1.05 1.11 1.24]) — the gt auto block on the
    SPHERE is only ~5-25% conservative even at footprint-scale bins,
    vs the flat module's documented ~1.6x.  Cross-correlation
    structure matches within 0.08 absolute."""
    from chomp_tpu.curved import (PixelSphereMask, SphericalCapMask,
                                  curved_gaussian_block)

    lmax, n_lat, n_phi = 96, 128, 256
    sht = _Spin2Sht(lmax, n_lat, n_phi)

    # d-table validation: sympy seeds (low ell, all m classes) +
    # orthogonality rows at high ell for a generic m.
    from sympy import N as sym_N
    from sympy.physics.quantum.spin import Rotation

    betas = np.array([0.7, 2.1])
    xs = np.cos(betas)
    for n in (2, -2):
        tabs = _sht_dmn_tables(n, 4, xs)
        for m in (0, 1, 3):
            lmin = max(m, 2)
            for ell in (lmin, 4):
                for k, b in enumerate(betas):
                    exact = complex(sym_N(
                        Rotation.d(ell, m, n, b).doit())).real
                    assert abs(tabs[m][ell - lmin, k] - exact) < 1e-11
    for m in (0, 5, 37):
        rows = sht.d_p2[m]
        lmin = max(m, 2)
        for ell in (max(lmin, 40), 90):
            v = np.sum(sht.wq * rows[ell - lmin] ** 2)
            np.testing.assert_allclose(v, 2.0 / (2 * ell + 1),
                                       rtol=1e-9)

    # E/B round trip (unmasked)
    rng = np.random.default_rng(3)
    a_e = []
    for m in range(lmax + 1):
        nl2 = lmax + 1 - max(m, 2)
        z = (rng.standard_normal((2, nl2))
             + 1j * rng.standard_normal((2, nl2)))
        a_e.append(z.real + 0j if m == 0 else z)
    e_t, b_t = sht.analyze_spin2(sht.synth_spin2(a_e),
                                 np.ones((n_lat, n_phi)))
    assert max(np.max(np.abs(e_t[m] - a_e[m]))
               for m in range(lmax + 1)) < 1e-10
    assert max(np.max(np.abs(b_t[m])) for m in range(lmax + 1)) < 1e-10

    ells = np.arange(lmax + 1, dtype=float)
    c_gg = 1.0e-6 / (1.0 + (ells / 20.0) ** 2.2)
    c_ee = 0.6e-6 / (1.0 + (ells / 15.0) ** 2.0)
    c_ge = 0.6 * np.sqrt(c_gg * c_ee)
    c_gg[:2] = c_gg[2]
    c_ee[:2] = 0.0
    c_ge[:2] = 0.0

    rad = np.radians(25.0)
    edges_deg = np.array([2.0, 4.0, 8.0, 16.0])
    edges = np.radians(edges_deg)
    dmu = np.cos(edges[:-1]) - np.cos(edges[1:])
    t0 = legendre_bin_factors(lmax, edges) * dmu[:, None]
    t2 = legendre_bin_factors_spin2(lmax, edges) * dmu[:, None]
    nb = len(edges) - 1
    th_g = np.arccos(sht.xg)
    ph_g = np.arange(n_phi) * 2 * np.pi / n_phi

    def j_vec(v):
        return lambda e: jnp.asarray(v[np.asarray(e, int)])

    def blocks(mask):
        kw = dict(ell_max=lmax, ell_split=lmax)
        c_ww = np.asarray(curved_gaussian_block(
            j_vec(c_gg), j_vec(c_gg), j_vec(c_gg), j_vec(c_gg),
            edges_deg, edges_deg, mask, 0, 0, **kw))
        c_wg = np.asarray(curved_gaussian_block(
            j_vec(c_gg), j_vec(c_ge), j_vec(c_ge), j_vec(c_gg),
            edges_deg, edges_deg, mask, 0, 2, **kw))
        c_gt = np.asarray(curved_gaussian_block(
            j_vec(c_gg), j_vec(c_ee), j_vec(c_ge), j_vec(c_ge),
            edges_deg, edges_deg, mask, 2, 2, **kw))
        return np.block([[c_ww, c_wg], [c_wg.T, c_gt]])

    def check(cov_mc, cov_an, lo_w, hi_w, lo_g, hi_g):
        ratio = np.diag(cov_an) / np.diag(cov_mc)
        assert np.all((ratio[:nb] > lo_w) & (ratio[:nb] < hi_w)), ratio
        assert np.all((ratio[nb:] > lo_g) & (ratio[nb:] < hi_g)), ratio
        for i in range(nb):
            r_mc = cov_mc[i, nb + i] / np.sqrt(
                cov_mc[i, i] * cov_mc[nb + i, nb + i])
            r_an = cov_an[i, nb + i] / np.sqrt(
                cov_an[i, i] * cov_an[nb + i, nb + i])
            assert abs(r_mc - r_an) < 0.08, (i, r_mc, r_an)

    # (a) 25-degree cap
    cap = SphericalCapMask(rad)
    w_cap = ((np.cos(th_g)[:, None] >= np.cos(rad))
             * np.ones((1, n_phi))).astype(float)
    d_cap = curved_pair_normalization(cap, edges)
    est = _spin2_mc_covariance(sht, w_cap, c_gg, c_ee, c_ge, t0, t2,
                               d_cap, 1024, 64, seed=11)
    check(np.cov(est.T), blocks(cap), 0.9, 1.3, 0.85, 1.35)
    # masked-mean anchor: the pair-normalized gt estimator stays within
    # ~8% of the unmasked multipole prediction (the residual is the
    # pseudo-E mixing bias of the harmonic estimator, not a convention
    # error — signs and magnitudes must match).
    gt_pred = (legendre_bin_factors_spin2(lmax, edges)
               * (((2 * ells + 1.0) / (4 * np.pi)) * c_ge)[None, :]
               ).sum(axis=1)
    gt_mean = est[:, nb:].mean(axis=0)
    assert np.all(np.abs(gt_mean / gt_pred - 1.0) < 0.08), (
        gt_mean, gt_pred)

    # (b) two-cap non-azimuthal footprint
    def cap_mu(th, ph, center):
        ct0, st0 = np.cos(center[0]), np.sin(center[0])
        return (ct0 * np.cos(th)[:, None] + st0 * np.sin(th)[:, None]
                * np.cos(ph[None, :] - center[1]))

    center2 = (2.2, 1.0)
    w_two = ((cap_mu(th_g, ph_g, (0.0, 0.0)) >= np.cos(rad))
             | (cap_mu(th_g, ph_g, center2) >= np.cos(rad))).astype(float)
    th_pix = (np.arange(256) + 0.5) * np.pi / 256
    ph_pix = np.arange(512) * 2 * np.pi / 512
    pixmask = PixelSphereMask(
        ((cap_mu(th_pix, ph_pix, (0.0, 0.0)) >= np.cos(rad))
         | (cap_mu(th_pix, ph_pix, center2) >= np.cos(rad))
         ).astype(float))
    d_two = curved_pair_normalization(pixmask, edges)
    est2 = _spin2_mc_covariance(sht, w_two, c_gg, c_ee, c_ge, t0, t2,
                                d_two, 1024, 64, seed=23)
    check(np.cov(est2.T), blocks(pixmask), 0.85, 1.2, 0.85, 1.45)


# ---------------------------------------------------------------------------
# Shear-shear xi_+/xi_- on the sphere (3x2pt extension)
# ---------------------------------------------------------------------------

def test_wigner_bin_factors_machinery():
    """The quadrature-accumulation bin factors reproduce the CLOSED-FORM
    (0,0)/(2,0) families, and the (2,+-2) families hit their flat J0/J4
    limits at sub-degree bins."""
    from chomp_tpu.curved import wigner_bin_factors

    edges_rad = np.radians(EDGES_DEG)
    lmax = 3000
    b00 = wigner_bin_factors(0, 0, lmax, edges_rad)
    b20 = wigner_bin_factors(2, 0, lmax, edges_rad)
    np.testing.assert_allclose(
        b00, legendre_bin_factors(lmax, edges_rad), rtol=0, atol=1e-9)
    np.testing.assert_allclose(
        b20, legendre_bin_factors_spin2(lmax, edges_rad), rtol=0,
        atol=1e-9)
    ells = np.arange(lmax + 1)
    b22 = wigner_bin_factors(2, 2, lmax, edges_rad)
    b2m2 = wigner_bin_factors(2, -2, lmax, edges_rad)
    j0 = np.asarray(covariance.bin_averaged_j0(
        jnp.asarray(ells + 0.5), edges_rad))
    j4 = np.asarray(covariance.bin_averaged_j4(
        jnp.asarray(ells + 0.5), edges_rad))
    sel = (ells > 50) & (ells < 2500)
    # the spin-2 families carry a larger O((l theta)^-2-type)
    # curvature correction than P_l/d20 (3.2e-5 measured at l ~ 50)
    assert np.max(np.abs(b22[:, sel] - j0[:, sel])) < 5e-5
    assert np.max(np.abs(b2m2[:, sel] - j4[:, sel])) < 5e-5


def test_uniform_sphere_xipm_exact():
    """W ≡ 1: the xi_+- channel blocks reduce to the exact full-sky
    sums (d-orthogonality makes Q and M kernels δ_{ll'}/(2l+1)), and
    the (+,-) EE-BB assembly cancels the pure-noise part exactly."""
    from chomp_tpu.curved import curved_gaussian_block

    lmax = 2000
    ns = 2.0e-8
    edges_rad = np.radians(EDGES_DEG)
    ells = np.arange(lmax + 1)
    mask = UniformSphereMask()
    kw = dict(ell_max=lmax, ell_split=0)     # delta limit IS exact here

    def zero(e):
        return jnp.zeros(len(np.asarray(e)))

    c_pp_ee = np.asarray(curved_gaussian_block(
        cl_powerlaw, cl_powerlaw, cl_powerlaw, cl_powerlaw, EDGES_DEG,
        EDGES_DEG, mask, "xip", "xip", ns, ns, ns, ns, **kw))
    from chomp_tpu.curved import wigner_bin_factors

    b22 = wigner_bin_factors(2, 2, lmax, edges_rad)
    ct = np.asarray(cl_powerlaw(ells)) + ns
    nn = 2 * ns * ns
    ref = np.einsum("il,l,jl->ij", b22,
                    (2 * ells + 1.0) * (2 * ct * ct - nn), b22) \
        / (16 * np.pi**2)
    dmu = np.cos(edges_rad[:-1]) - np.cos(edges_rad[1:])
    a_i = 2 * np.pi * dmu
    d_i = a_i * 4 * np.pi
    ref += nn * np.diag(a_i * 4 * np.pi) / np.outer(d_i, d_i)
    np.testing.assert_allclose(c_pp_ee, ref, rtol=1e-9)

    # (+,-) assembly: EE(keep-nn) - BB(keep-nn) == signal-only formula.
    pm = np.asarray(
        curved_gaussian_block(cl_powerlaw, cl_powerlaw, cl_powerlaw,
                              cl_powerlaw, EDGES_DEG, EDGES_DEG, mask,
                              "xip", "xim", ns, ns, ns, ns,
                              nn_quadrature=True, **kw)
        - curved_gaussian_block(zero, zero, zero, zero, EDGES_DEG,
                                EDGES_DEG, mask, "xip", "xim",
                                ns, ns, ns, ns, nn_quadrature=True,
                                **kw))
    b2m2 = wigner_bin_factors(2, -2, lmax, edges_rad)
    c = np.asarray(cl_powerlaw(ells))
    ref_pm = np.einsum("il,l,jl->ij", b22,
                       (2 * ells + 1.0) * 2 * (c * c + 2 * c * ns),
                       b2m2) / (16 * np.pi**2)
    np.testing.assert_allclose(pm, ref_pm, rtol=1e-9, atol=0)


@pytest.mark.slow
def test_curved_xipm_mc_referee():
    """Sphere MC referee for the masked xi_+/xi_- covariance: the
    spin-2 SHT machinery of test_curved_spin2_mc_referee, estimators
    xi_hat_+- = (2pi/D_i) sum_l t^{2,+-2}_l (P~EE +- P~BB) (the exact
    harmonic form of the pair estimators), against the pseudo-E/B
    channel kernels (Q = Xi+ + Xi-, M = Xi+ - Xi-) on a 25-degree cap.
    Measured an/mc diagonal ratios recorded in the assertions."""
    from chomp_tpu.curved import (SphericalCapMask, curved_gaussian_block,
                                  wigner_bin_factors)

    lmax, n_lat, n_phi = 96, 128, 256
    sht = _Spin2Sht(lmax, n_lat, n_phi)
    ells = np.arange(lmax + 1, dtype=float)
    c_ee = 0.6e-6 / (1.0 + (ells / 15.0) ** 2.0)
    c_ee[:2] = 0.0

    rad = np.radians(25.0)
    edges_deg = np.array([2.0, 4.0, 8.0, 16.0])
    edges = np.radians(edges_deg)
    dmu = np.cos(edges[:-1]) - np.cos(edges[1:])
    tp = wigner_bin_factors(2, 2, lmax, edges) * dmu[:, None]
    tm = wigner_bin_factors(2, -2, lmax, edges) * dmu[:, None]
    nb = len(edges) - 1
    th_g = np.arccos(sht.xg)
    cap = SphericalCapMask(rad)
    w_cap = ((np.cos(th_g)[:, None] >= np.cos(rad))
             * np.ones((1, n_phi))).astype(float)
    d_cap = curved_pair_normalization(cap, edges)

    n_real, chunk = 1024, 64
    rng = np.random.default_rng(41)
    est = np.empty((n_real, 2 * nb))
    for s in range(0, n_real, chunk):
        a_e = []
        for m in range(lmax + 1):
            nl2 = lmax + 1 - max(m, 2)
            z = (rng.standard_normal((chunk, nl2))
                 + 1j * rng.standard_normal((chunk, nl2))) / np.sqrt(2)
            if m == 0:
                z = z.real * np.sqrt(2) + 0j
            a_e.append(z * np.sqrt(c_ee[max(m, 2):]))
        e_t, b_t = sht.analyze_spin2(sht.synth_spin2(a_e), w_cap)
        ps_ee = np.zeros((chunk, lmax + 1))
        ps_bb = np.zeros((chunk, lmax + 1))
        for m in range(lmax + 1):
            fac = 1.0 if m == 0 else 2.0
            ps_ee[:, max(m, 2):] += fac * np.abs(e_t[m]) ** 2
            ps_bb[:, max(m, 2):] += fac * np.abs(b_t[m]) ** 2
        est[s:s + chunk, :nb] = (2 * np.pi * (ps_ee + ps_bb)
                                 @ tp.T) / d_cap[None, :]
        est[s:s + chunk, nb:] = (2 * np.pi * (ps_ee - ps_bb)
                                 @ tm.T) / d_cap[None, :]
    cov_mc = np.cov(est.T)

    # Mean anchor (xi_+ is positive and well-measured): within the
    # pseudo-E/B mixing bias of the harmonic estimator, like gt.
    xp_pred = (wigner_bin_factors(2, 2, lmax, edges)
               * (((2 * ells + 1.0) / (4 * np.pi)) * c_ee)[None, :]
               ).sum(axis=1)
    xp_mean = est[:, :nb].mean(axis=0)
    # The pseudo-E/B mixing bias of the harmonic estimator grows
    # toward footprint-scale bins (measured +4.6/+6.3/+19.5% on the
    # 25-degree cap at 2-4/4-8/8-16 degree bins; same effect as the
    # documented ~5-8% gt bias).
    assert np.all(np.abs(xp_mean / xp_pred - 1.0)
                  < np.array([0.1, 0.1, 0.3])), (xp_mean, xp_pred)

    def j_vec(v):
        return lambda e: jnp.asarray(v[np.asarray(e, int)])

    kw = dict(ell_max=lmax, ell_split=lmax)
    c4 = (j_vec(c_ee),) * 4
    c_pp = np.asarray(curved_gaussian_block(
        *c4, edges_deg, edges_deg, cap, "xip", "xip", **kw))
    c_pm = np.asarray(curved_gaussian_block(
        *c4, edges_deg, edges_deg, cap, "xip", "xim", **kw))
    c_mm = np.asarray(curved_gaussian_block(
        *c4, edges_deg, edges_deg, cap, "xim", "xim", **kw))
    cov_an = np.block([[c_pp, c_pm], [c_pm.T, c_mm]])

    ratio = np.diag(cov_an) / np.diag(cov_mc)
    print("xi+ an/mc:", np.round(ratio[:nb], 3))
    print("xi- an/mc:", np.round(ratio[nb:], 3))
    # Measured on the 25-degree cap at 2-4/4-8/8-16 degree bins:
    # xi+ auto [1.37, 1.61, 2.04] — CONSERVATIVE, growing toward the
    # footprint scale exactly like the flat module's xi+ block (the
    # channel-diagonal NKA cannot suppress the <gamma gamma> pairing's
    # field-phase coherence); xi- auto [1.05, 1.13, 1.33] — the same
    # 5-30% conservatism class as the gt auto block.  Safe direction,
    # bounded here.
    assert np.all((ratio[:nb] > 1.0) & (ratio[:nb] < 2.5)), ratio
    assert np.all((ratio[nb:] > 0.9) & (ratio[nb:] < 1.5)), ratio
    for i in range(nb):
        r_mc = cov_mc[i, nb + i] / np.sqrt(
            cov_mc[i, i] * cov_mc[nb + i, nb + i])
        r_an = cov_an[i, nb + i] / np.sqrt(
            cov_an[i, i] * cov_an[nb + i, nb + i])
        print(f"pm corr {i}: mc={r_mc:.3f} an={r_an:.3f}")
        assert abs(r_mc - r_an) < 0.15, (i, r_mc, r_an)


@pytest.mark.slow
def test_curved_joint_3x2pt(fiducial, fiducial_model):
    """curved_joint_3x2pt_covariance: (4nb, 4nb), symmetric, PSD, the
    (w, gt) corner equal to the validated 2-probe curved builder, and
    the 3x2pt matrix vs the FLAT 3x2pt builder with a same-radius
    DiscMask at sub-footprint bins (loose: the builders differ exactly
    where the MC referees measured the spin-2 auto conservatisms)."""
    import jax.numpy as jnp

    from chomp_tpu import covariance, projection
    from chomp_tpu.curved import (SphericalCapMask,
                                  curved_joint_3x2pt_covariance,
                                  curved_joint_wtheta_gammat_covariance)
    from chomp_tpu.params import GridSpec, default_halo
    from chomp_tpu.hod import default_hod

    g = GridSpec(n_mass=128, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32)
    h = default_halo()
    model = fiducial_model
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(0.6), sigma_z=jnp.asarray(0.15))
    dist_src = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.3))
    edges = np.array([1.0, 2.0, 4.0, 8.0])
    nb = len(edges) - 1
    cap = SphericalCapMask(np.radians(25.0))
    n2d, ns = 3.0e7, 4.0e-9

    cov = np.asarray(curved_joint_3x2pt_covariance(
        fiducial, h, model, dist, dist_src, edges, n2d, ns, cap,
        ell_max=2048, grid=g))
    assert cov.shape == (4 * nb, 4 * nb)
    np.testing.assert_allclose(cov, cov.T, rtol=1e-8)
    assert np.all(np.diag(cov) > 0)
    eig = np.linalg.eigvalsh(0.5 * (cov + cov.T))
    assert np.all(eig > 0), eig

    two = np.asarray(curved_joint_wtheta_gammat_covariance(
        fiducial, h, model, dist, dist_src, edges, n2d, ns, cap,
        ell_max=2048, grid=g))
    np.testing.assert_allclose(cov[:2 * nb, :2 * nb], two, rtol=1e-10)


def test_bmode_null_uniform():
    """Full sky: zero leakage mean, zero signal variance, exact noise
    closure (the B channel of an E-only sky is empty)."""
    from chomp_tpu.curved import UniformSphereMask, curved_bmode_null

    ns = 2.0e-8
    edges_deg = np.array([1.0, 2.0, 4.0])
    mean, bias, cov = curved_bmode_null(
        cl_powerlaw, edges_deg, UniformSphereMask(), shape_noise=ns,
        ell_max=1024)
    mean, bias, cov = map(np.asarray, (mean, bias, cov))
    # Xi^-(W) vanishes by d-orthogonality on the full sky.
    assert np.all(np.abs(mean) < 1e-20)
    # Noise floor of the HARMONIC-truncated statistic: N times the
    # bin average of the truncated completeness sum sum (2l+1) d22/4pi
    # — a delta at theta=0; bins away from zero see the truncation
    # ringing (which is NOT small for a sharp lmax cutoff — tens of N
    # here; exactly zero for the untruncated pair estimator).  Check
    # the closed form directly and its linearity in N.
    from chomp_tpu.curved import wigner_bin_factors

    edges = np.radians(edges_deg)
    dmu = np.cos(edges[:-1]) - np.cos(edges[1:])
    b22 = wigner_bin_factors(2, 2, 1024, edges)
    ells = np.arange(1025)
    ref_bias = ns * (b22 * (2 * ells + 1)).sum(axis=1) / (4 * np.pi)
    np.testing.assert_allclose(bias, ref_bias, rtol=1e-8)
    # Covariance = the pure pair closure only.
    edges = np.radians(edges_deg)
    d_i = curved_pair_normalization(UniformSphereMask(), edges)
    lo, hi = edges[:-1], edges[1:]
    expect = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            l, h = max(lo[i], lo[j]), min(hi[i], hi[j])
            if h > l:
                expect[i, j] = 2 * ns * ns * curved_pair_normalization(
                    UniformSphereMask(), np.array([l, h]),
                    squared=True)[0] / (d_i[i] * d_i[j])
    np.testing.assert_allclose(cov, expect, rtol=1e-12)


@pytest.mark.slow
def test_bmode_null_mc_referee():
    """Sphere MC referee for the B-mode null test on a 25-degree cap:
    the E->B leakage MEAN is exact (no NKA in a pseudo-spectrum mean)
    and must match the MC within its errors; the covariance is
    channel-diagonal NKA (measured bands asserted)."""
    from chomp_tpu.curved import (SphericalCapMask, curved_bmode_null,
                                  wigner_bin_factors)

    lmax, n_lat, n_phi = 96, 128, 256
    sht = _Spin2Sht(lmax, n_lat, n_phi)
    ells = np.arange(lmax + 1, dtype=float)
    c_ee = 0.6e-6 / (1.0 + (ells / 15.0) ** 2.0)
    c_ee[:2] = 0.0

    rad = np.radians(25.0)
    edges_deg = np.array([2.0, 4.0, 8.0, 16.0])
    edges = np.radians(edges_deg)
    dmu = np.cos(edges[:-1]) - np.cos(edges[1:])
    tp = wigner_bin_factors(2, 2, lmax, edges) * dmu[:, None]
    nb = len(edges) - 1
    th_g = np.arccos(sht.xg)
    cap = SphericalCapMask(rad)
    w_cap = ((np.cos(th_g)[:, None] >= np.cos(rad))
             * np.ones((1, n_phi))).astype(float)
    d_cap = curved_pair_normalization(cap, edges)

    n_real, chunk = 1024, 64
    rng = np.random.default_rng(57)
    est = np.empty((n_real, nb))
    for s in range(0, n_real, chunk):
        a_e = []
        for m in range(lmax + 1):
            nl2 = lmax + 1 - max(m, 2)
            z = (rng.standard_normal((chunk, nl2))
                 + 1j * rng.standard_normal((chunk, nl2))) / np.sqrt(2)
            if m == 0:
                z = z.real * np.sqrt(2) + 0j
            a_e.append(z * np.sqrt(c_ee[max(m, 2):]))
        _, b_t = sht.analyze_spin2(sht.synth_spin2(a_e), w_cap)
        ps_bb = np.zeros((chunk, lmax + 1))
        for m in range(lmax + 1):
            fac = 1.0 if m == 0 else 2.0
            ps_bb[:, max(m, 2):] += fac * np.abs(b_t[m]) ** 2
        est[s:s + chunk] = (2 * np.pi * ps_bb @ tp.T) / d_cap[None, :]
    cov_mc = np.cov(est.T)
    mean_mc = est.mean(axis=0)
    err = np.sqrt(np.diag(cov_mc) / n_real)

    def j_vec(v):
        return lambda e: jnp.asarray(v[np.asarray(e, int)])

    mean_an, bias, cov_an = curved_bmode_null(
        j_vec(c_ee), edges_deg, cap, shape_noise=0.0, ell_max=lmax,
        ell_split=lmax)
    mean_an, cov_an = np.asarray(mean_an), np.asarray(cov_an)
    # Exact mean: within 5 sigma_MC + 2% (quadrature truncation).
    assert np.all(np.abs(mean_mc - mean_an)
                  < 5 * err + 0.02 * np.abs(mean_an)), (
        mean_mc, mean_an, err)
    assert np.all(mean_an > 0)    # leakage is positive on the cap
    ratio = np.diag(cov_an) / np.diag(cov_mc)
    print("bmode cov an/mc:", np.round(ratio, 3))
    # Effective-leaked-field model with the Q kernel: measured
    # [1.13, 1.33, 1.56] — conservative (the Xi+ variant is unsafe at
    # [0.71, 0.78, 0.84]; the first-order channel-diagonal NKA was
    # 4.5x over).
    assert np.all((ratio > 1.0) & (ratio < 1.8)), ratio
