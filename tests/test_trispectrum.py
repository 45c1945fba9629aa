"""Trispectrum: PT kernels vs direct recursion, halo terms vs oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import default_halo, halo, trispectrum
from chomp_tpu.hod import default_hod
from tests.oracle import oracle


# --- direct PT recursion in numpy (independent of the jax closed forms) ---

def _alpha(k1, k2):
    k12 = k1 + k2
    return np.dot(k12, k1) / np.dot(k1, k1)


def _beta(k1, k2):
    k12 = k1 + k2
    return (np.dot(k12, k12) * np.dot(k1, k2)
            / (2.0 * np.dot(k1, k1) * np.dot(k2, k2)))


def _f2_vec(q1, q2):
    a = _alpha(q1, q2) + _alpha(q2, q1)
    b = _beta(q1, q2)
    return 5.0 / 14.0 * a + 2.0 / 7.0 * b


def _g2_vec(q1, q2):
    a = _alpha(q1, q2) + _alpha(q2, q1)
    b = _beta(q1, q2)
    return 3.0 / 14.0 * a + 4.0 / 7.0 * b


def _f3_unsym(q1, q2, q3):
    # Bernardeau et al. 2002 recursion, n=3: prefactor 1/((2n+3)(n-1))=1/18.
    term_m1 = 1.0 * (7.0 * _alpha(q1, q2 + q3) * _f2_vec(q2, q3)
                     + 2.0 * _beta(q1, q2 + q3) * _g2_vec(q2, q3))
    term_m2 = _g2_vec(q1, q2) * (7.0 * _alpha(q1 + q2, q3)
                                 + 2.0 * _beta(q1 + q2, q3))
    return (term_m1 + term_m2) / 18.0


def _f3_sym(q1, q2, q3):
    import itertools

    return np.mean([_f3_unsym(*p) for p in itertools.permutations([q1, q2, q3])])


def test_f2_scalar_matches_vector_form():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q1 = rng.normal(size=3)
        q2 = rng.normal(size=3)
        ref = _f2_vec(q1, q2)
        ours = trispectrum.f2_scalar(np.dot(q1, q1), np.dot(q2, q2),
                                     np.dot(q1, q2))
        np.testing.assert_allclose(float(ours), ref, rtol=1e-12)


def test_k13_kernel_vs_direct_f3_integration():
    """6 <F3(q,-q,k)>_mu from the closed form vs direct recursion
    (eps-regularized q2 = -(1+1e-5) q; G2(q,-q)=0 kills the pole)."""
    from scipy.integrate import quad

    k = np.array([0.0, 0.0, 1.0])
    for r in (0.3, 0.9, 1.5, 4.0):
        def integrand(mu):
            s = np.sqrt(1.0 - mu * mu)
            q = r * np.array([s, 0.0, mu])
            return 6.0 * _f3_sym(q, -(1.0 + 1e-5) * q, k)

        ref, _ = quad(integrand, -1.0, 1.0, epsrel=1e-9, limit=200)
        ref *= 0.5
        ours = float(trispectrum.k13_kernel(jnp.asarray(r)))
        np.testing.assert_allclose(ours, ref, rtol=2e-4, err_msg=f"r={r}")


def test_k13_r1_continuity():
    vals = trispectrum.k13_kernel(jnp.asarray([0.999, 0.99995, 1.0, 1.00005, 1.001]))
    assert np.all(np.isfinite(np.asarray(vals)))
    # 6<F3> at r=1: B(1)/(504) = (12-158+100-42)/504 = -88/504.
    np.testing.assert_allclose(vals[2], -88.0 / 504.0, rtol=1e-3)
    assert abs(float(vals[0]) - float(vals[4])) < 0.01


@pytest.fixture(scope="module")
def model(fiducial_model):
    return fiducial_model


def test_t1h_vs_oracle_quad(fiducial, model):
    """1-halo term against direct scipy quadrature."""
    from scipy import integrate

    h = default_halo()
    m_star_val = float(jnp.exp(model.mass.ln_m_star))
    rho_bar = oracle.RHO_CRIT * oracle.OM

    def t1h_ref(k1, k2):
        def integrand(lnm):
            m = np.exp(lnm)
            y1 = oracle.y_nfw_mstar(k1, m, m_star_val)
            y2 = oracle.y_nfw_mstar(k2, m, m_star_val)
            return (oracle._dndlnm_spl(lnm) * (m / rho_bar) ** 4
                    * y1**2 * y2**2)

        v, _ = integrate.quad(integrand, oracle.LN_M_MIN, oracle.LN_M_MAX,
                              epsrel=1e-9, limit=400)
        return v

    for k1, k2 in ((0.1, 0.1), (1.0, 0.3), (5.0, 5.0)):
        ours = float(trispectrum.trispectrum_parallelogram(
            fiducial, h, model, jnp.asarray(k1), jnp.asarray(k2),
            terms=("1h",)))
        np.testing.assert_allclose(ours, t1h_ref(k1, k2), rtol=2e-5,
                                   err_msg=f"k=({k1},{k2})")


def test_4h_fraction_declines_with_k(fiducial, model):
    """The tree-PT (4h) share of T̄ is largest at low k and dies off at
    high k (1h/2h super-shot-noise terms take over); at low k the 4h
    piece equals T̄_PT times I_1^1 factors ~ 1."""
    h = default_halo()

    def frac_4h(k):
        k = jnp.asarray(k)
        t_all = float(trispectrum.trispectrum_parallelogram(
            fiducial, h, model, k, k))
        t_4h = float(trispectrum.trispectrum_parallelogram(
            fiducial, h, model, k, k, terms=("4h",)))
        return t_4h / t_all

    f_low, f_mid, f_high = frac_4h(0.02), frac_4h(0.3), frac_4h(5.0)
    assert f_low > f_mid > f_high
    assert f_low > 0.3
    # I_1^1 -> 1 at low k, so the 4h term ~ T_PT itself.
    k = jnp.asarray(0.02)
    t_4h = float(trispectrum.trispectrum_parallelogram(
        fiducial, h, model, k, k, terms=("4h",)))
    t_pt = float(trispectrum.t_pt_parallelogram(fiducial, k, k))
    np.testing.assert_allclose(t_4h, t_pt, rtol=5e-3)


def test_high_k_1h_dominance(fiducial, model):
    h = default_halo()
    k = jnp.asarray(20.0)
    t1h = float(trispectrum.trispectrum_parallelogram(
        fiducial, h, model, k, k, terms=("1h",)))
    t_all = float(trispectrum.trispectrum_parallelogram(
        fiducial, h, model, k, k))
    assert t1h / t_all > 0.8


def test_equal_k_positive_and_symmetric(fiducial, model):
    h = default_halo()
    k1 = jnp.asarray([0.1, 1.0])
    k2 = jnp.asarray([0.5, 0.2])
    t12 = trispectrum.trispectrum_parallelogram(fiducial, h, model, k1, k2)
    t21 = trispectrum.trispectrum_parallelogram(fiducial, h, model, k2, k1)
    np.testing.assert_allclose(np.asarray(t12), np.asarray(t21), rtol=1e-10)
    t_eq = trispectrum.trispectrum_parallelogram(
        fiducial, h, model, jnp.asarray([1.0]), jnp.asarray([1.0]))
    assert float(t_eq[0]) > 0.0


def test_i_integrals_vs_quad(fiducial, model):
    """The I_mu^beta building blocks against direct scipy quadrature
    (pins the compositional pieces of T2h/T3h/T4h, not just T1h)."""
    from scipy import integrate

    h = default_halo()
    m_star_val = float(jnp.exp(model.mass.ln_m_star))
    rho_bar = oracle.RHO_CRIT * oracle.OM
    k1, k2 = 0.8, 2.5
    t = model.mass
    y1 = trispectrum.y_nfw(fiducial, h, jnp.asarray(k1), t.m,
                           model.m_star, t.z)
    y2 = trispectrum.y_nfw(fiducial, h, jnp.asarray(k2), t.m,
                           model.m_star, t.z)

    def i_ref(mu_exp, beta, kfac):
        def integrand(lnm):
            m = np.exp(lnm)
            val = (oracle._dndlnm_spl(lnm) * (m / rho_bar) ** mu_exp)
            if beta:
                val = val * oracle._bias_n_spl(lnm)
            for kk in kfac:
                val = val * oracle.y_nfw_mstar(kk, m, m_star_val)
            return val

        v, _ = integrate.quad(integrand, oracle.LN_M_MIN, oracle.LN_M_MAX,
                              epsrel=1e-9, limit=400)
        return v

    ours_i11 = float(trispectrum._i_mu_beta(fiducial, h, model, [y1], 1, 1))
    np.testing.assert_allclose(ours_i11, i_ref(1, 1, [k1]), rtol=3e-5)
    ours_i21 = float(trispectrum._i_mu_beta(fiducial, h, model, [y1, y2], 2, 1))
    np.testing.assert_allclose(ours_i21, i_ref(2, 1, [k1, k2]), rtol=3e-5)
    ours_i31 = float(trispectrum._i_mu_beta(fiducial, h, model,
                                            [y1, y2, y2], 3, 1))
    np.testing.assert_allclose(ours_i31, i_ref(3, 1, [k1, k2, k2]), rtol=3e-5)


def test_b_pt_avg_vs_quad(fiducial):
    """<B_PT(k1,k2,-S)>_mu against direct angle quadrature."""
    from scipy import integrate

    k1, k2 = 0.3, 0.7

    def b_ref():
        def integrand(mu):
            s2 = k1**2 + k2**2 + 2 * k1 * k2 * mu
            s = np.sqrt(s2)
            p1 = oracle.pk_lin(k1)
            p2 = oracle.pk_lin(k2)
            ps = oracle.pk_lin(s)

            def f2(a2, b2, ab):
                return (5.0 / 7.0 + 0.5 * ab * (1 / a2 + 1 / b2)
                        + 2.0 / 7.0 * ab * ab / (a2 * b2))

            k1k2 = k1 * k2 * mu
            return (2 * f2(k1**2, k2**2, k1k2) * p1 * p2
                    + 2 * f2(k2**2, s2, -(k2**2 + k1k2)) * p2 * ps
                    + 2 * f2(s2, k1**2, -(k1**2 + k1k2)) * ps * p1)

        v, _ = integrate.quad(integrand, -1, 1, epsrel=1e-10, limit=200)
        return 0.5 * v

    ours = float(trispectrum.b_pt_avg(fiducial, jnp.asarray(k1),
                                      jnp.asarray(k2)))
    np.testing.assert_allclose(ours, b_ref(), rtol=1e-5)


@pytest.mark.slow
def test_mixed_tracer_terms_vs_quad(fiducial, model):
    """Independent scipy referee for the MIXED-tracer engine (the
    cross-probe covariance blocks): the 1h term and the four-leg 2h_31
    sum for tracers (g,m,g,m) / (g,g,g,m), with Zheng HOD factorial
    moments and n_g computed from closed forms + adaptive quadrature —
    none of the engine's code paths."""
    from scipy import integrate
    from scipy.special import erf as sp_erf

    h = default_halo()
    hod = default_hod()
    m_star_val = float(jnp.exp(model.mass.ln_m_star))
    rho_bar = oracle.RHO_CRIT * oracle.OM

    # Zheng moments in pure numpy (default_hod parameters).
    l_mmin, sig = 12.14, 0.15
    l_m0, l_m1p, alpha = 12.14, 13.43, 1.0

    def n_cen(m):
        return 0.5 * (1 + sp_erf((np.log10(m) - l_mmin) / sig))

    def n_sat(m):
        frac = max(m - 10.0**l_m0, 0.0) / 10.0**l_m1p
        return n_cen(m) * frac**alpha if frac > 0 else 0.0

    def falling(m, p):
        nc, ns = n_cen(m), n_sat(m)
        return p * nc * ns ** (p - 1) + ns**p if p > 1 else nc + ns

    n_g_ref, _ = integrate.quad(
        lambda lnm: oracle._dndlnm_spl(lnm) * falling(np.exp(lnm), 1),
        oracle.LN_M_MIN, oracle.LN_M_MAX, epsrel=1e-9, limit=400)

    def u_ref(kfacs, n_gal, n_mat, beta):
        def integrand(lnm):
            m = np.exp(lnm)
            val = oracle._dndlnm_spl(lnm)
            if n_gal:
                val = val * falling(m, n_gal) / n_g_ref**n_gal
            if n_mat:
                val = val * (m / rho_bar) ** n_mat
            if beta:
                val = val * oracle._bias_n_spl(lnm)
            for kk in kfacs:
                val = val * oracle.y_nfw_mstar(kk, m, m_star_val)
            return val

        v, _ = integrate.quad(integrand, oracle.LN_M_MIN, oracle.LN_M_MAX,
                              epsrel=1e-9, limit=400)
        return v

    k1, k2 = 0.8, 2.5
    # 1h, tracers (g, m, g, m): <(N)_2>/n_g^2 (M/rho)^2 y(k1)^2 y(k2)^2.
    ours_1h = float(trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, model, jnp.asarray(k1), jnp.asarray(k2),
        ("g", "m", "g", "m"), terms=("1h",)))
    ref_1h = u_ref([k1, k1, k2, k2], 2, 2, 0)
    np.testing.assert_allclose(ours_1h, ref_1h, rtol=5e-4)

    # 2h_31, tracers (g, g, g, m): explicit four-leg sum.
    p1 = oracle.pk_lin(k1)
    p2 = oracle.pk_lin(k2)
    ref_2h31 = (
        2.0 * p1 * u_ref([k1], 1, 0, 1) * u_ref([k1, k2, k2], 2, 1, 1)
        + p2 * u_ref([k2], 1, 0, 1) * u_ref([k1, k1, k2], 2, 1, 1)
        + p2 * u_ref([k2], 0, 1, 1) * u_ref([k1, k1, k2], 3, 0, 1))
    # Isolate 2h_31 from the engine's 2h total by subtracting the
    # (independently referee'd elsewhere) 2h_22 piece computed from
    # quad U's and the angle average.
    def ps_avg_ref():
        def integrand(mu):
            s = np.sqrt(k1**2 + k2**2 + 2 * k1 * k2 * mu)
            return oracle.pk_lin(s)

        v, _ = integrate.quad(integrand, -1, 1, epsrel=1e-10, limit=200)
        return 0.5 * v

    ref_2h22 = ps_avg_ref() * (
        u_ref([k1, k2], 2, 0, 1) * u_ref([k1, k2], 1, 1, 1)
        + u_ref([k1, k2], 1, 1, 1) * u_ref([k1, k2], 2, 0, 1))
    ours_2h = float(trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, model, jnp.asarray(k1), jnp.asarray(k2),
        ("g", "g", "g", "m"), terms=("2h",)))
    np.testing.assert_allclose(ours_2h, ref_2h31 + ref_2h22, rtol=1e-3)


def test_multi_sample_legs(fiducial, model):
    """Per-leg models (the multi-sample trispectrum behind per-bin-HOD
    tomographic cNG): a 4-tuple of the SAME model object reproduces the
    single-model engine bit-for-bit (same quadrature packs); two
    DISTINCT Zheng samples sharing mass tables referee against scipy
    quadrature of the independent-occupation U integrals (1h and the
    four-leg 2h sum, none of the engine's code paths); the 4h term's
    leg bookkeeping factorizes into single-leg U's."""
    from scipy import integrate
    from scipy.special import erf as sp_erf

    h = default_halo()
    hod_b = default_hod(log10_m_min=12.6, sigma=0.25, log10_m_0=12.3,
                        log10_m_1p=13.8, alpha=1.15)
    model_b = halo.build_halo_model(fiducial, h, hod_b,
                                    mass_tables=model.mass)
    k1, k2 = jnp.asarray(0.8), jnp.asarray(2.5)

    # Identity: 4 copies of the same object == the single-model call.
    same = trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, (model, model, model, model), k1, k2,
        ("g", "g", "g", "m"))
    single = trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, model, k1, k2, ("g", "g", "g", "m"))
    np.testing.assert_allclose(float(same), float(single), rtol=0,
                               atol=0)

    # scipy referee for legs (A@k1, A@-k1, B@k2, B@-k2), all galaxies.
    m_star_val = float(jnp.exp(model.mass.ln_m_star))
    rho_bar = oracle.RHO_CRIT * oracle.OM

    def falling_fn(l_mmin, sig, l_m0, l_m1p, alpha):
        def n_cen(m):
            return 0.5 * (1 + sp_erf((np.log10(m) - l_mmin) / sig))

        def n_sat(m):
            frac = max(m - 10.0**l_m0, 0.0) / 10.0**l_m1p
            return n_cen(m) * frac**alpha if frac > 0 else 0.0

        def falling(m, p):
            nc, ns = n_cen(m), n_sat(m)
            return p * nc * ns ** (p - 1) + ns**p if p > 1 else nc + ns

        return falling

    fall_a = falling_fn(12.14, 0.15, 12.14, 13.43, 1.0)
    fall_b = falling_fn(12.6, 0.25, 12.3, 13.8, 1.15)

    def n_g_ref(fall):
        v, _ = integrate.quad(
            lambda lnm: oracle._dndlnm_spl(lnm) * fall(np.exp(lnm), 1),
            oracle.LN_M_MIN, oracle.LN_M_MAX, epsrel=1e-9, limit=400)
        return v

    n_a, n_b = n_g_ref(fall_a), n_g_ref(fall_b)

    def u_ref(kfacs, p_a, p_b, beta):
        def integrand(lnm):
            m = np.exp(lnm)
            val = oracle._dndlnm_spl(lnm)
            if p_a:
                val = val * fall_a(m, p_a) / n_a**p_a
            if p_b:
                val = val * fall_b(m, p_b) / n_b**p_b
            if beta:
                val = val * oracle._bias_n_spl(lnm)
            for kk in kfacs:
                val = val * oracle.y_nfw_mstar(kk, m, m_star_val)
            return val

        v, _ = integrate.quad(integrand, oracle.LN_M_MIN, oracle.LN_M_MAX,
                              epsrel=1e-9, limit=400)
        return v

    kf1, kf2 = float(k1), float(k2)
    leg_models = (model, model, model_b, model_b)

    # 1h: independent-occupation product moment on the union pack.
    ours_1h = float(trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, leg_models, k1, k2, ("g", "g", "g", "g"),
        terms=("1h",)))
    ref_1h = u_ref([kf1, kf1, kf2, kf2], 2, 2, 0)
    np.testing.assert_allclose(ours_1h, ref_1h, rtol=5e-4)

    # 2h: explicit four-leg 31 sum + 22 pairings from quad U's.
    p1, p2 = oracle.pk_lin(kf1), oracle.pk_lin(kf2)
    ref_2h31 = (2.0 * p1 * u_ref([kf1], 1, 0, 1)
                * u_ref([kf1, kf2, kf2], 1, 2, 1)
                + 2.0 * p2 * u_ref([kf2], 0, 1, 1)
                * u_ref([kf1, kf1, kf2], 2, 1, 1))

    def ps_avg_ref():
        def integrand(mu):
            s = np.sqrt(kf1**2 + kf2**2 + 2 * kf1 * kf2 * mu)
            return oracle.pk_lin(s)

        v, _ = integrate.quad(integrand, -1, 1, epsrel=1e-10, limit=200)
        return 0.5 * v

    ref_2h22 = 2.0 * ps_avg_ref() * u_ref([kf1, kf2], 1, 1, 1) ** 2
    ours_2h = float(trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, leg_models, k1, k2, ("g", "g", "g", "g"),
        terms=("2h",)))
    np.testing.assert_allclose(ours_2h, ref_2h31 + ref_2h22, rtol=1e-3)

    # 4h bookkeeping: U_A^1(k1)^2 U_B^1(k2)^2 T_PT.
    ours_4h = float(trispectrum.trispectrum_parallelogram_tracers(
        fiducial, h, leg_models, k1, k2, ("g", "g", "g", "g"),
        terms=("4h",)))
    t_pt = float(trispectrum.t_pt_parallelogram(fiducial, k1, k2))
    ref_4h = (u_ref([kf1], 1, 0, 1) ** 2 * u_ref([kf2], 0, 1, 1) ** 2
              * t_pt)
    np.testing.assert_allclose(ours_4h, ref_4h, rtol=1e-3)
