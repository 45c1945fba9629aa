"""Non-Limber exact low-ell projection (chomp_tpu.nonlimber): the
Mellin kernel vs regulated quadrature, the FFTLog spherical-Bessel
transfer vs dense Simpson, the exact C_ell vs a brute double
quadrature, the known narrow-bin Limber failure, kappa-leg behavior,
and the make_pipeline(nonlimber_ell_switch=...) integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, default_halo, halo, nonlimber
from chomp_tpu.hod import default_hod
from chomp_tpu.limber_fft import (_lattice_key, _lattices_from_key,
                                  p_lattice_halo_all)
from chomp_tpu.params import DEFAULT_GRID, GridSpec
from chomp_tpu.projection import (DNdzGaussian, WindowConvergence,
                                  WindowGalaxy)


def narrow_dist(z0=0.5, sig=0.05, z_max=2.0):
    return DNdzGaussian(z_min=jnp.asarray(0.01), z_max=jnp.asarray(z_max),
                        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sig))


@pytest.fixture(scope="module")
def p_gg(fiducial, fiducial_model):
    return np.asarray(p_lattice_halo_all(
        fiducial, default_halo(), fiducial_model, False,
        DEFAULT_GRID)["power_gg"])


@pytest.fixture(scope="module")
def p_gm(fiducial, fiducial_model):
    return np.asarray(p_lattice_halo_all(
        fiducial, default_halo(), fiducial_model, False,
        DEFAULT_GRID)["power_gm"])


def test_mellin_jl_vs_quadrature():
    """I_ell(s) = int x^{s-1} j_ell(x) dx against an Abel-regulated
    scipy quadrature (e^{-eps x}, Richardson in eps)."""
    from scipy.integrate import quad
    from scipy.special import spherical_jn

    for ell in (2, 7):
        for s in (0.8, 1.0 + 0.7j, 1.0 + 3.0j):
            vals = []
            for eps in (0.01, 0.005):
                re = quad(lambda x: np.real(
                    x**(s - 1) * np.exp(-eps * x) * spherical_jn(ell, x)),
                    0, 2000, limit=2000)[0]
                im = quad(lambda x: np.imag(
                    x**(s - 1) * np.exp(-eps * x) * spherical_jn(ell, x)),
                    0, 2000, limit=2000)[0]
                vals.append(re + 1j * im)
            v = vals[1] + (vals[1] - vals[0])
            a = complex(nonlimber.mellin_jl(ell, s))
            assert abs(v / a - 1.0) < 2e-3, (ell, s, v, a)


def test_transfer_vs_dense_simpson(fiducial):
    """F_ell(k) = int dchi W D j_ell(k chi): the FFTLog-with-analytic-
    Mellin route is machine-accurate wherever F is above the spectral
    floor (checked at the C_ell-dominant (ell, k) points)."""
    from scipy.integrate import simpson
    from scipy.special import spherical_jn

    g = DEFAULT_GRID
    win = WindowGalaxy(dist=narrow_dist())
    lkey = _lattice_key(g)
    ells = (2.0, 10.0, 40.0)
    kern, i_lo, n_use, npad = nonlimber._nl_static(lkey, ells, "d",
                                                   3e-5, 4.0)
    f = nonlimber._leg_f(fiducial, win, g, 1.0)
    fl = np.asarray(nonlimber._transfer(jnp.asarray(f), kern, i_lo,
                                        n_use, npad, lkey))
    ln_k, _ = _lattices_from_key(lkey)
    k_sub = np.exp(ln_k[i_lo:i_lo + n_use])

    chi_d = np.linspace(1.0, 4000.0, 40000)
    z_d = np.asarray(background.z_of_chi(fiducial, chi_d))
    wv = (np.asarray(win.window_z(fiducial, z_d))
          * np.asarray(background.growth_factor(fiducial, z_d)))
    # (ell, k) points where F carries the C_ell integrand.
    for il, ell, ks in ((0, 2, (0.002, 0.005, 0.01)),
                        (1, 10, (0.005, 0.01, 0.02)),
                        (2, 40, (0.02, 0.03, 0.05))):
        for kt in ks:
            idx = int(np.argmin(np.abs(k_sub - kt)))
            ref = simpson(wv * spherical_jn(ell, k_sub[idx] * chi_d),
                          x=chi_d)
            np.testing.assert_allclose(fl[il, idx], ref, rtol=1e-8,
                                       err_msg=f"ell={ell} k={kt}")


def test_narrow_bin_limber_failure(fiducial, p_gg, fiducial_model):
    """The known N5K-class result for a sigma_z = 0.05 bin: Limber is
    ~2x low at ell = 2, ~7% low at ell = 10, percent-accurate by
    ell ~ 20, and the exact/Limber ratio -> 1 as ell^-2."""
    win = WindowGalaxy(dist=narrow_dist())
    ells = np.array([2.0, 10.0, 20.0, 150.0, 300.0])
    ex, li = nonlimber.nonlimber_cl_pair(
        fiducial, win, win, jnp.asarray(p_gg), ells, DEFAULT_GRID,
        ("d", "d"), fiducial_model.mass.growth)
    r = np.asarray(ex) / np.asarray(li)
    assert 1.7 < r[0] < 2.4
    assert 1.03 < r[1] < 1.12
    assert abs(r[2] - 1.0) < 0.03
    assert abs(r[3] - 1.0) < 0.005
    assert abs(r[4] - 1.0) < abs(r[3] - 1.0)  # still shrinking


@pytest.mark.slow
def test_cl_exact_vs_brute_double_quadrature(fiducial, fiducial_model):
    """C_ell^exact referee: dense Simpson in chi for F(k) at every
    lattice-k node, then the same k quadrature — independent of the
    FFTLog/Mellin machinery (only the window samples are shared)."""
    from scipy.integrate import simpson
    from scipy.special import spherical_jn

    g = DEFAULT_GRID
    win = WindowGalaxy(dist=narrow_dist())
    p_gg = p_lattice_halo_all(fiducial, default_halo(), fiducial_model,
                              False, g)["power_gg"]
    lkey = _lattice_key(g)
    ells = (2.0, 10.0)
    ex, _ = nonlimber.nonlimber_cl_pair(
        fiducial, win, win, p_gg, np.asarray(ells), g, ("d", "d"),
        fiducial_model.mass.growth)

    _, i_lo, n_use, _ = nonlimber._nl_static(lkey, ells, "d", 3e-5, 4.0)
    ln_k, _ = _lattices_from_key(lkey)
    k_sub = np.exp(ln_k[i_lo:i_lo + n_use])
    chi_d = np.linspace(1.0, 4000.0, 20000)
    z_d = np.asarray(background.z_of_chi(fiducial, chi_d))
    wv = (np.asarray(win.window_z(fiducial, z_d))
          * np.asarray(background.growth_factor(fiducial, z_d))
          / float(fiducial_model.mass.growth))
    p_sub = np.asarray(p_gg)[i_lo:i_lo + n_use]
    for il, ell in enumerate(ells):
        fb = np.array([simpson(wv * spherical_jn(int(ell), kk * chi_d),
                               x=chi_d) for kk in k_sub])
        ref = (2.0 / np.pi) * simpson(k_sub**2 * p_sub * fb**2, x=k_sub)
        np.testing.assert_allclose(float(ex[il]), ref, rtol=2e-3,
                                   err_msg=f"ell={ell}")


def test_kappa_leg_flat(fiducial, p_gm, fiducial_model):
    """g x kappa with the flat-route kappa kernel: the (ell+1/2)^2-
    normalized exact transfer converges to plain Limber at high ell
    (broad lensing kernel: sub-percent by ell ~ 20 even with a narrow
    g leg setting the chi range)."""
    lens = narrow_dist()
    src = DNdzGaussian(z_min=jnp.asarray(0.3), z_max=jnp.asarray(3.0),
                       z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.25))
    win_g = WindowGalaxy(dist=lens)
    win_k = WindowConvergence(dist=src)
    ells = np.array([2.0, 10.0, 40.0, 150.0])
    ex, li = nonlimber.nonlimber_cl_pair(
        fiducial, win_g, win_k, jnp.asarray(p_gm), ells, DEFAULT_GRID,
        ("d", "k_flat"), fiducial_model.mass.growth)
    r = np.asarray(ex) / np.asarray(li)
    # The narrow g leg drives a low-ell excess, diluted by the broad
    # kappa kernel relative to the gg case (measured: 1.19 at ell=2).
    assert r[0] > 1.08
    assert abs(r[2] - 1.0) < 0.03
    assert abs(r[3] - 1.0) < 0.01


def test_correction_operator_flat_curved_agree():
    """The flat Hankel-sum and curved multipole-sum correction
    operators agree bin-by-bin at sub-degree theta (same dC input)."""
    theta = (0.2, 0.5, 1.0)
    sw, nn = 60, 16
    op_f = nonlimber.correction_operator(theta, 0.0, sw, nn, "flat")
    op_c = nonlimber.correction_operator(theta, 0.0, sw, nn, "curved")
    d = np.exp(-np.linspace(0.0, 3.0, nn))  # smooth positive mock dC
    wf, wc = op_f @ d, op_c @ d
    # Each operator matches ITS route's transform convention; the
    # residual is the irreducible low-ell flat-sky measure difference
    # (ell dell vs (2ell+1)/2 sums — 25% per mode at ell = 2, diluted
    # to ~3% here by this ell <~ 10-dominated mock; measured).
    np.testing.assert_allclose(wf, wc, rtol=0.05)
    # A broad dC spreading to the switch tightens the agreement.
    wf2, wc2 = op_f @ np.ones(nn), op_c @ np.ones(nn)
    assert abs(wf2[0] / wc2[0] - 1.0) < 0.02


def test_pipeline_nonlimber_integration(fiducial):
    """make_pipeline(nonlimber_ell_switch=40): runs under jit, changes
    w(theta) at multi-degree separations by the expected (small,
    finite) amount, leaves it essentially unchanged at arcminutes,
    vmap == loop, and gradients stay finite."""
    from chomp_tpu.parallel.sweep import make_pipeline

    g = GridSpec(n_mass=64, n_mu=8, sigma_panels=4, sigma_n_per_panel=24,
                 n_growth=24, n_dist=24)
    theta = np.array([0.05, 0.5, 2.0, 6.0])
    kw = dict(theta_deg=theta, grid=g, include_lensing=True)
    dist = narrow_dist()
    base = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                                 **kw))(fiducial)
    corr_fn = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                                    nonlimber_ell_switch=40, **kw))
    corr = corr_fn(fiducial)
    dw = np.asarray(corr["w_theta"] - base["w_theta"])
    w0 = np.asarray(base["w_theta"])
    assert np.all(np.isfinite(dw))
    # ell <= 40 barely reaches 3 arcmin: relative change tiny there.
    assert abs(dw[0] / w0[0]) < 2e-3
    # Multi-degree bins see a nonzero, modest correction.  w(6 deg)
    # sits near its zero crossing (w0 ~ -8e-5 here), so normalize by
    # the 2-deg bin instead of the ill-conditioned same-bin ratio
    # (measured: dw/|w(2deg)| ~ 0.03, dw/|w(6deg)| ~ 0.34).
    assert 0.0 < abs(dw[-1]) < 0.3 * abs(w0[-2])
    # The pipeline wiring applies exactly the standalone correction.
    model = halo.build_halo_model(fiducial, default_halo(),
                                  default_hod(), 0.0, False, g)
    p = p_lattice_halo_all(fiducial, default_halo(), model, False, g)
    win = WindowGalaxy(dist=dist)
    ref = np.asarray(nonlimber.wtheta_nonlimber_correction(
        fiducial, win, win, p["power_gg"], theta, 0.0, 40, g,
        ("d", "d"), model.mass.growth))
    np.testing.assert_allclose(dw, ref, rtol=5e-7, atol=0)
    dg = np.asarray(corr["gamma_t"] - base["gamma_t"])
    assert np.all(np.isfinite(dg))
    assert abs(dg[0] / np.asarray(base["gamma_t"])[0]) < 5e-3

    # vmap == loop on a 2-batch.
    import chex

    batch = jax.tree.map(lambda a: jnp.stack([a, a * 1.02]), fiducial)
    vm = jax.vmap(corr_fn)(batch)
    lo = [corr_fn(jax.tree.map(lambda a: a[i], batch)) for i in range(2)]
    chex.assert_trees_all_close(
        vm, jax.tree.map(lambda *xs: jnp.stack(xs), *lo),
        rtol=1e-10)

    grad = jax.grad(lambda c: jnp.sum(corr_fn(c)["w_theta"]))(fiducial)
    assert np.isfinite(float(grad.omega_m0))


def test_pipeline_nonlimber_curved(fiducial):
    """geometry='curved' + nonlimber: the corrected curved w equals the
    corrected flat w to the curvature difference (small at <= 1 deg),
    and the gamma_t correction uses the E-convention consistently
    (finite, small at arcminutes)."""
    from chomp_tpu.parallel.sweep import make_pipeline

    g = GridSpec(n_mass=64, n_mu=8, sigma_panels=4, sigma_n_per_panel=24,
                 n_growth=24, n_dist=24)
    theta = np.array([0.2, 1.0, 4.0])
    dist = narrow_dist()
    kw = dict(theta_deg=theta, grid=g, include_lensing=True,
              nonlimber_ell_switch=40)
    flat = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                                 **kw))(fiducial)
    curv = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                                 geometry="curved", **kw))(fiducial)
    wf, wcv = np.asarray(flat["w_theta"]), np.asarray(curv["w_theta"])
    np.testing.assert_allclose(wcv[0], wf[0], rtol=5e-3)
    assert np.all(np.isfinite(np.asarray(curv["gamma_t"])))


def test_growth_rate(fiducial):
    """f(z) = dlnD/dlna: the analytic form vs (a) central-difference of
    the repo's own growth_factor (must be exact to quadrature error)
    and (b) the Omega_m(z)^0.55 LCDM approximation (~2e-3)."""
    z = np.array([0.0, 0.5, 1.0, 2.0])
    f = np.asarray(background.growth_rate(fiducial, z, 64))
    # (a) numerical dlnD/dlna at fixed cosmology.
    eps = 1e-4
    a = 1.0 / (1.0 + z)
    d_hi = np.asarray(background.growth_factor(
        fiducial, 1.0 / (a * (1.0 + eps)) - 1.0, 64))
    d_lo = np.asarray(background.growth_factor(
        fiducial, 1.0 / (a * (1.0 - eps)) - 1.0, 64))
    f_num = (np.log(d_hi) - np.log(d_lo)) / (2.0 * np.log1p(eps))
    # Analytic dI/da vs derivative-of-the-quadrature: agrees at the
    # n=64 GL consistency level (measured 5e-5), not machine eps.
    np.testing.assert_allclose(f, f_num, rtol=2e-4)
    # (b) the standard LCDM fitting form (measured 7e-3 at z=0).
    om = float(fiducial.omega_m0)
    e2 = np.asarray(background.e2z(fiducial, z))
    om_z = om * (1.0 + z) ** 3 / e2
    np.testing.assert_allclose(f, om_z**0.55, rtol=1.5e-2)


def test_rsd_transfer_vs_dense_simpson(fiducial):
    """The d_rsd (-j_ell'') FFTLog transfer against dense Simpson with
    j'' from the Bessel ODE j'' = -2 j'/x + (ell(ell+1)/x^2 - 1) j —
    a DIFFERENT identity than the downward recurrence the Mellin rows
    use, so the referee is independent."""
    from scipy.integrate import simpson
    from scipy.special import spherical_jn

    g = DEFAULT_GRID
    win = WindowGalaxy(dist=narrow_dist())
    lkey = _lattice_key(g)
    ells = (2.0, 10.0)
    kern, i_lo, n_use, npad = nonlimber._nl_static(lkey, ells, "d_rsd",
                                                   3e-5, 4.0)
    from chomp_tpu.limber_fft import _lattice_z, _window_on_lattice

    chi_lat, z_lat, z_mid = _lattice_z(fiducial, g)
    f_cz = (np.asarray(background.growth_factor(fiducial, z_lat, g.n_growth))
            * np.asarray(background.growth_rate(fiducial, z_lat, g.n_growth)))
    w_lat = np.asarray(_window_on_lattice(fiducial, win, z_lat, chi_lat,
                                          g, z_mid))
    fl = np.asarray(nonlimber._transfer(jnp.asarray(w_lat * f_cz), kern,
                                        i_lo, n_use, npad, lkey))
    ln_k, _ = _lattices_from_key(lkey)
    k_sub = np.exp(ln_k[i_lo:i_lo + n_use])

    chi_d = np.linspace(1.0, 4000.0, 40000)
    z_d = np.asarray(background.z_of_chi(fiducial, chi_d))
    wv = (np.asarray(win.window_z(fiducial, z_d))
          * np.asarray(background.growth_factor(fiducial, z_d))
          * np.asarray(background.growth_rate(fiducial, z_d)))
    for il, ell, ks in ((0, 2, (0.002, 0.005)), (1, 10, (0.005, 0.02))):
        for kt in ks:
            idx = int(np.argmin(np.abs(k_sub - kt)))
            x = k_sub[idx] * chi_d
            j = spherical_jn(ell, x)
            jp = spherical_jn(ell, x, derivative=True)
            jpp = -2.0 * jp / x + (ell * (ell + 1.0) / x**2 - 1.0) * j
            ref = simpson(wv * (-jpp), x=chi_d)
            np.testing.assert_allclose(fl[il, idx], ref, rtol=1e-7,
                                       err_msg=f"ell={ell} k={kt}")


def test_rsd_gg_magnitude(fiducial, fiducial_model):
    """Kaiser RSD on a sigma_z = 0.05 bin at z=0.5 with the default
    HOD (effective bias h_g ~ 0.94, so beta = f/b ~ 0.78): RSD
    DOMINATES C_gg at the lowest multipoles — measured ratio to the
    exact density C_gg: 1.56 at ell=2, 0.48 at ell=10, 0.056 at
    ell=40, smooth and positive (Kaiser enhancement), decaying with
    ell.  The density transfer vanishes as (k chi)^2 for ell=2 at low
    k while -j_ell'' tends to a constant — the classic narrow-bin
    low-ell RSD dominance."""
    win = WindowGalaxy(dist=narrow_dist())
    piv = fiducial_model.mass.growth
    d_rsd = np.asarray(nonlimber.rsd_delta_cl_nodes(
        fiducial, default_halo(), fiducial_model, win, win, 40,
        DEFAULT_GRID, "d", piv))
    p_gg = p_lattice_halo_all(fiducial, default_halo(), fiducial_model,
                              False, DEFAULT_GRID)["power_gg"]
    nodes = nonlimber.ell_nodes(40)
    ex, _ = nonlimber.nonlimber_cl_pair(fiducial, win, win, p_gg, nodes,
                                        DEFAULT_GRID, ("d", "d"), piv)
    r = d_rsd / np.asarray(ex)
    i2 = int(np.argmin(np.abs(nodes - 2.0)))
    i10 = int(np.argmin(np.abs(nodes - 10.0)))
    i40 = len(nodes) - 1
    assert 1.0 < r[i2] < 2.2
    assert 0.3 < r[i10] < 0.7
    assert r[i40] < 0.3 * r[i10]      # decaying with ell
    assert np.all(np.diff(r) < 0.0)   # monotone in ell
    assert np.all(d_rsd > 0.0)        # Kaiser enhancement on the auto


def test_pipeline_nonlimber_rsd(fiducial):
    """nonlimber_rsd=True: runs under jit, strictly increases the
    multi-degree w correction relative to rsd=False (Kaiser adds
    power at low ell), grads finite; rejected without ell_switch."""
    from chomp_tpu.parallel.sweep import make_pipeline

    g = GridSpec(n_mass=64, n_mu=8, sigma_panels=4, sigma_n_per_panel=24,
                 n_growth=24, n_dist=24)
    theta = np.array([0.5, 2.0, 6.0])
    dist = narrow_dist()
    kw = dict(theta_deg=theta, grid=g, include_lensing=True)
    base = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                                 **kw))(fiducial)
    nl = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                               nonlimber_ell_switch=40, **kw))(fiducial)
    rsd_fn = jax.jit(make_pipeline(default_halo(), default_hod(), dist,
                                   nonlimber_ell_switch=40,
                                   nonlimber_rsd=True, **kw))
    rsd = rsd_fn(fiducial)
    dw_nl = np.asarray(nl["w_theta"] - base["w_theta"])
    dw_rsd = np.asarray(rsd["w_theta"] - base["w_theta"])
    assert np.all(np.isfinite(dw_rsd))
    # RSD adds positive low-ell power on top of the non-Limber repair.
    assert dw_rsd[-1] > dw_nl[-1]
    dg = np.asarray(rsd["gamma_t"] - nl["gamma_t"])
    assert np.all(np.isfinite(dg)) and np.any(dg != 0.0)

    grad = jax.grad(lambda c: jnp.sum(rsd_fn(c)["w_theta"]))(fiducial)
    assert np.isfinite(float(grad.omega_m0))

    with pytest.raises(ValueError, match="nonlimber_rsd"):
        make_pipeline(default_halo(), default_hod(), dist,
                      nonlimber_rsd=True, **kw)


def test_tomographic_nonlimber_reduction(fiducial):
    """make_tomographic_pipeline(nonlimber_ell_switch, nonlimber_rsd)
    at nL=nS=1 equals make_pipeline with the same switches (w + gt;
    xi rows keep plain Limber on both), and the switch actually
    changes the tomographic rows."""
    from chomp_tpu.parallel.sweep import (make_pipeline,
                                          make_tomographic_pipeline)

    g = GridSpec(n_mass=64, n_mu=8, sigma_panels=4, sigma_n_per_panel=24,
                 n_growth=24, n_dist=24, n_theta=6)
    dist = narrow_dist()
    kw = dict(grid=g, nonlimber_ell_switch=40, nonlimber_rsd=True)
    fn1 = make_tomographic_pipeline(default_halo(), default_hod(),
                                    [dist], [dist], **kw)
    ref = make_pipeline(default_halo(), default_hod(), dist,
                        include_shear=True, **kw)
    a = jax.jit(fn1)(fiducial)
    b = jax.jit(ref)(fiducial)
    np.testing.assert_allclose(np.asarray(a["w_theta"][0]),
                               np.asarray(b["w_theta"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["gamma_t"][0]),
                               np.asarray(b["gamma_t"]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["xi_plus"][0]),
                               np.asarray(b["xi_plus"]), rtol=1e-12)

    fn0 = make_tomographic_pipeline(default_halo(), default_hod(),
                                    [dist], [dist], grid=g)
    c = jax.jit(fn0)(fiducial)
    dw = np.asarray(a["w_theta"] - c["w_theta"])
    assert np.any(dw != 0.0) and np.all(np.isfinite(dw))

    with pytest.raises(ValueError, match="nonlimber_rsd"):
        make_tomographic_pipeline(default_halo(), default_hod(),
                                  [dist], [dist], grid=g,
                                  nonlimber_rsd=True)


def test_tomographic_nonlimber_nuisance(fiducial):
    """Nuisance mode: the non-Limber correction rides INSIDE the
    (1+m_j) shear calibration — gt at m=0.03 is exactly 1.03x gt at
    m=0, correction included."""
    import dataclasses

    from chomp_tpu.parallel.sweep import (default_nuisance,
                                          make_tomographic_pipeline)

    g = GridSpec(n_mass=64, n_mu=8, sigma_panels=4, sigma_n_per_panel=24,
                 n_growth=24, n_dist=24, n_theta=6)
    dist = narrow_dist()
    fn = jax.jit(make_tomographic_pipeline(
        default_halo(), default_hod(), [dist], [dist], grid=g,
        with_nuisance=True, nonlimber_ell_switch=40))
    nu0 = default_nuisance(1, 1)
    nu = dataclasses.replace(nu0, m=jnp.asarray([0.03]))
    a0, a = fn(fiducial, nu0), fn(fiducial, nu)
    np.testing.assert_allclose(np.asarray(a["gamma_t"]),
                               1.03 * np.asarray(a0["gamma_t"]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a["w_theta"]),
                               np.asarray(a0["w_theta"]), rtol=1e-12)


def test_table_route_rejected():
    from chomp_tpu.parallel.sweep import make_pipeline

    with pytest.raises(ValueError, match="nonlimber"):
        make_pipeline(default_halo(), default_hod(), narrow_dist(),
                      method="table", nonlimber_ell_switch=40)
