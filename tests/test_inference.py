"""inference.py: likelihood / Fisher / MAP / HMC library surface.

Referee strategy: closed-form identities on a LINEAR-GAUSSIAN toy
model (where chi^2, the Fisher matrix, and the MAP point are exact
algebra), a long-run HMC moment check on a correlated Gaussian target,
and exact wiring identities against the real pipeline (make_theory_fn
must reproduce the hand-built dataclasses.replace construction
bitwise).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import default_halo, inference, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec


def _toy(seed=0, n_data=7, n_par=3):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n_data, n_par))
    b = rng.normal(size=n_data)
    m = rng.normal(size=(n_data, n_data))
    cov = m @ m.T + n_data * np.eye(n_data)
    theory = lambda p: jnp.asarray(a) @ p + jnp.asarray(b)
    return a, b, cov, theory


def test_gaussian_likelihood_chi2_exact():
    """chi2 via the Cholesky solve equals r C^-1 r by direct algebra."""
    a, b, cov, theory = _toy()
    data = b + 0.3
    like = inference.GaussianLikelihood(theory, data, cov)
    p = jnp.asarray([0.2, -0.5, 1.1])
    r = np.asarray(theory(p)) - data
    expect = r @ np.linalg.solve(cov, r)
    np.testing.assert_allclose(float(like.chi2(p)), expect, rtol=1e-12)
    np.testing.assert_allclose(float(like.log_like(p)), -0.5 * expect,
                               rtol=1e-12)


def test_fisher_matrix_linear_exact():
    """For a linear model the Fisher matrix is exactly A^T C^-1 A —
    including through the GaussianLikelihood prior-curvature path."""
    a, b, cov, theory = _toy(seed=1)
    expect = a.T @ np.linalg.solve(cov, a)
    got = np.asarray(inference.fisher_matrix(theory, cov,
                                             jnp.zeros(a.shape[1])))
    np.testing.assert_allclose(got, expect, rtol=1e-10)
    sig = np.array([0.5, np.inf, 2.0])
    like = inference.GaussianLikelihood(theory, b, cov, prior_sigma=sig)
    got2 = np.asarray(like.fisher(jnp.zeros(a.shape[1])))
    np.testing.assert_allclose(
        got2, expect + np.diag([1 / 0.25, 0.0, 1 / 4.0]), rtol=1e-10)


def test_neg_log_post_priors_and_box():
    """Gaussian prior adds 0.5 ((p-mu)/sigma)^2; the box adds the 1e6
    barrier per violated bound; both leave the interior chi2 term
    untouched."""
    a, b, cov, theory = _toy(seed=2)
    like = inference.GaussianLikelihood(
        theory, b, cov, prior_mean=[0.1, 0.0, 0.0],
        prior_sigma=[0.2, np.inf, np.inf],
        lower=[-1.0, -1.0, -1.0], upper=[1.0, 1.0, 1.0])
    p = jnp.asarray([0.3, 0.0, 0.0])
    expect = 0.5 * float(like.chi2(p)) + 0.5 * ((0.3 - 0.1) / 0.2) ** 2
    np.testing.assert_allclose(float(like.neg_log_post(p)), expect,
                               rtol=1e-12)
    p_out = jnp.asarray([0.3, -1.5, 2.0])
    assert float(like.neg_log_post(p_out)) > 2e6


def test_map_fit_recovers_gls():
    """MAP of the linear-Gaussian likelihood = generalized least
    squares, a closed form."""
    a, b, cov, theory = _toy(seed=3)
    rng = np.random.default_rng(7)
    p_true = rng.normal(size=a.shape[1])
    data = np.asarray(theory(jnp.asarray(p_true)))
    like = inference.GaussianLikelihood(theory, data, cov)
    p_best, info = inference.map_fit(like.neg_log_post,
                                     jnp.zeros(a.shape[1]),
                                     n_steps=1500, learning_rate=0.05)
    np.testing.assert_allclose(np.asarray(p_best), p_true, atol=2e-3)
    assert float(info["u"][-1]) < float(info["u"][0])


def test_hmc_gaussian_moments():
    """HMC on a correlated 3-D Gaussian: acceptance healthy, sample
    mean/cov match the target within the MC error of an autocorrelated
    chain (loose 25%/35% bands at 4000 draws)."""
    cov = np.array([[1.0, 0.6, 0.2], [0.6, 2.0, -0.3], [0.2, -0.3, 0.5]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray([1.0, -2.0, 0.5])

    def u(p):
        d = p - mu
        return 0.5 * d @ prec @ d

    qs, acc = inference.hmc(u, prec, jnp.zeros(3),
                            jax.random.PRNGKey(0), n_steps=4000,
                            n_leap=6, eps=0.7)
    qs = np.asarray(qs)[500:]
    assert float(np.asarray(acc).mean()) > 0.6
    np.testing.assert_allclose(qs.mean(axis=0), np.asarray(mu),
                               atol=0.25)
    np.testing.assert_allclose(np.cov(qs.T), cov, atol=0.35 * cov.max())


def test_hmc_multichain_vmap():
    """(n_chains, dim) initial points run vmapped: per-chain shapes,
    and each chain explores (not stuck at its start)."""
    prec = jnp.eye(2)
    u = lambda p: 0.5 * p @ p
    p0 = jnp.asarray([[0.0, 0.0], [2.0, -2.0], [-1.0, 1.0]])
    qs, acc = inference.hmc(u, prec, p0, jax.random.PRNGKey(1),
                            n_steps=200, n_leap=4, eps=0.8)
    assert qs.shape == (3, 200, 2) and acc.shape == (3, 200)
    assert float(np.asarray(acc).mean()) > 0.6
    spread = np.asarray(qs).std(axis=1)
    assert np.all(spread > 0.3), spread


@pytest.fixture(scope="module")
def tiny_pipe(fiducial):
    from chomp_tpu.parallel.sweep import (default_nuisance,
                                          make_tomographic_pipeline)

    g = GridSpec(n_k=64, n_mass=64, n_ell=256, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32,
                 lattice_dln=0.08)
    mk = lambda z0, sz: projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sz))
    lens, src = [mk(0.5, 0.15)], [mk(1.0, 0.3)]
    pipe = make_tomographic_pipeline(
        default_halo(), default_hod(), lens, src,
        theta_deg=np.geomspace(0.1, 1.0, 5), z_pivot=0.5, grid=g,
        with_nuisance=True)
    return pipe, default_nuisance(1, 1)


def test_make_theory_fn_wiring(fiducial, tiny_pipe):
    """theory_fn(p) equals the hand-built dataclasses.replace
    construction bitwise; p0 is the fiducial point; flatness is
    enforced; nuisance leaves land whole."""
    pipe, nu0 = tiny_pipe
    theory, p0 = inference.make_theory_fn(
        pipe, fiducial, cosmo_names=("omega_m0", "sigma_8"),
        nuisance0=nu0, nuisance_names=("a_ia", "m"))
    np.testing.assert_allclose(
        np.asarray(p0),
        [fiducial.omega_m0, fiducial.sigma_8, 0.0, 0.0], atol=0)
    p = jnp.asarray([0.29, 0.85, 0.4, 0.02])
    got = theory(p)
    c = dataclasses.replace(fiducial, omega_m0=0.29, omega_l0=1 - 0.29,
                            sigma_8=0.85)
    nu = dataclasses.replace(nu0, a_ia=jnp.asarray(0.4).reshape(()),
                             m=jnp.asarray([0.02]))
    expect = pipe(c, nu)["vector"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
    # Fiducial evaluation is finite and grad flows to every slot.
    g = np.asarray(jax.jacfwd(theory)(p0))
    assert np.all(np.isfinite(g))
    assert np.all(np.max(np.abs(g), axis=0) > 0.0)


def test_make_theory_fn_no_flat_and_errors(fiducial, tiny_pipe):
    """flat=False leaves omega_l0 at the fiducial value; unknown field
    names raise."""
    pipe, nu0 = tiny_pipe
    theory, p0 = inference.make_theory_fn(
        pipe, fiducial, cosmo_names=("sigma_8",), nuisance0=nu0,
        nuisance_names=(), flat=False)
    assert p0.shape == (1,)
    assert np.all(np.isfinite(np.asarray(theory(p0))))
    with pytest.raises(AttributeError):
        inference.make_theory_fn(pipe, fiducial,
                                 cosmo_names=("not_a_field",))


@pytest.mark.slow
def test_pipeline_fisher_vs_hmc(fiducial, tiny_pipe):
    """End to end: Fisher forecast through the real (tiny-grid)
    pipeline vs a short HMC chain on the synthetic posterior — the
    same consistency bar as examples/hmc_example.py, now through the
    library surface."""
    from chomp_tpu import covariance, halo

    pipe, nu0 = tiny_pipe
    g = GridSpec(n_k=64, n_mass=64, n_ell=256, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32,
                 lattice_dln=0.08)
    mk = lambda z0, sz: projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sz))
    edges = np.geomspace(0.07, 1.35, 6)
    theta_mid = np.sqrt(edges[:-1] * edges[1:])
    pipe2 = __import__("chomp_tpu.parallel.sweep", fromlist=["x"]) \
        .make_tomographic_pipeline(
            default_halo(), default_hod(), [mk(0.5, 0.15)], [mk(1.0, 0.3)],
            theta_deg=theta_mid, z_pivot=0.5, grid=g)
    theory, p0 = inference.make_theory_fn(
        pipe2, fiducial, cosmo_names=("omega_m0", "sigma_8"))
    model = halo.build_halo_model(fiducial, default_halo(),
                                  default_hod(), 0.5, False, g)
    cov = np.asarray(covariance.tomographic_3x2pt_covariance(
        fiducial, default_halo(), model, [mk(0.5, 0.15)], [mk(1.0, 0.3)],
        edges, 0.3, [3e7], [0.26**2 / 7e7], grid=g))
    like = inference.GaussianLikelihood(
        theory, np.asarray(theory(p0)), cov,
        lower=[0.18, 0.55], upper=[0.45, 1.05])
    f = like.fisher(p0)
    qs, acc = inference.hmc(like.neg_log_post, f, p0,
                            jax.random.PRNGKey(0), n_steps=120,
                            n_leap=5, eps=0.6)
    qs = np.asarray(qs)[40:]
    assert float(np.asarray(acc).mean()) > 0.5
    sd = qs.std(axis=0)
    fisher_sd = np.sqrt(np.diag(np.linalg.inv(np.asarray(f))))
    assert np.all(sd / fisher_sd > 0.3) and np.all(sd / fisher_sd < 3.0), (
        sd, fisher_sd)
    assert np.all(np.abs(qs.mean(axis=0) - np.asarray(p0)) < 5 * sd)


def test_poisson_likelihood_exact():
    """Score zero at truth, analytic Fisher for a linear model, and
    the large-count Gaussian limit."""
    t = jnp.asarray([40.0, 400.0, 4000.0])

    def lam(p):
        return p[0] * t

    data = np.asarray(lam(jnp.asarray([1.3])))
    like = inference.PoissonLikelihood(lam, data)
    # Score vanishes at the truth (data == expectation).
    g = jax.grad(like.neg_log_post)(jnp.asarray([1.3]))
    assert abs(float(g[0])) < 1e-9
    # F = sum t_i^2 / lam_i = sum t_i / A.
    f = float(like.fisher(jnp.asarray([1.3]))[0, 0])
    assert abs(f - float(jnp.sum(t) / 1.3)) < 1e-8
    # Large-count limit: curvature of -ln L matches the Gaussian
    # likelihood with C = diag(lam) at the 3% level for N >= 40.
    h = jax.hessian(like.neg_log_post)(jnp.asarray([1.3]))
    glike = inference.GaussianLikelihood(lam, data,
                                         np.diag(data))
    hg = jax.hessian(glike.neg_log_post)(jnp.asarray([1.3]))
    assert abs(float(h[0, 0]) / float(hg[0, 0]) - 1.0) < 0.03
    # MAP recovers the injected amplitude.
    p_fit, _ = inference.map_fit(like.neg_log_post,
                                 jnp.asarray([0.9]), n_steps=400,
                                 learning_rate=3e-2)
    assert abs(float(p_fit[0]) - 1.3) < 1e-3


def test_composite_likelihood_sums():
    t = jnp.asarray([50.0, 500.0])

    def lam(p):
        return p[0] * t

    def gvec(p):
        return jnp.asarray([p[0] * 2.0, p[0] * 3.0])

    data_p = np.asarray(lam(jnp.asarray([1.0])))
    data_g = np.asarray(gvec(jnp.asarray([1.0])))
    lp = inference.PoissonLikelihood(lam, data_p)
    lg = inference.GaussianLikelihood(gvec, data_g, np.eye(2) * 0.1)
    comp = inference.CompositeLikelihood([lp, lg])
    p = jnp.asarray([1.07])
    assert np.isclose(float(comp.neg_log_post(p)),
                      float(lp.neg_log_post(p))
                      + float(lg.neg_log_post(p)))
    f = np.asarray(comp.fisher(jnp.asarray([1.0])))
    f_sum = (np.asarray(lp.fisher(jnp.asarray([1.0])))
             + np.asarray(lg.fisher(jnp.asarray([1.0]))))
    np.testing.assert_allclose(f, f_sum, rtol=1e-12)
    g = jax.grad(comp.neg_log_post)(jnp.asarray([1.0]))
    assert abs(float(g[0])) < 1e-9


def test_moped_lossless_fisher():
    """MOPED compressed vector: Cov(y) = I and the compressed Fisher
    equals the full Fisher exactly (linear model)."""
    rng = np.random.default_rng(3)
    n_d, n_p = 40, 3
    jac = rng.normal(size=(n_d, n_p))
    a = rng.normal(size=(n_d, n_d))
    cov = a @ a.T + n_d * np.eye(n_d)
    t0 = rng.normal(size=n_d)

    def theory(p):
        return jnp.asarray(t0) + jnp.asarray(jac) @ p

    p0 = jnp.zeros(n_p)
    b, compress = inference.moped_compression(theory, cov, p0)
    b = np.asarray(b)
    np.testing.assert_allclose(b @ cov @ b.T, np.eye(n_p), atol=1e-10)
    f_full = np.asarray(inference.fisher_matrix(theory, cov, p0))
    f_comp = np.asarray(inference.fisher_matrix(
        lambda p: compress(theory(p)), np.eye(n_p), p0))
    np.testing.assert_allclose(f_comp, f_full, rtol=1e-10)


# ---------------------------------------------------------------------------
# Analytic template marginalization + scale cuts
# ---------------------------------------------------------------------------


def test_template_marginalization_woodbury_identity():
    """Finite-sigma template route == explicitly inflated covariance
    C + T^T diag(s^2) T (Sherman-Morrison-Woodbury, exact identity)."""
    a, b, cov, theory = _toy(seed=5)
    rng = np.random.default_rng(7)
    t = rng.normal(size=(2, b.size))
    sig = np.array([0.7, 2.3])
    data = b + rng.normal(size=b.size)
    lk_t = inference.GaussianLikelihood(theory, data, cov, templates=t,
                                        template_sigma=sig)
    cov_inf = inference.marginalized_covariance(cov, t, sig)
    lk_i = inference.GaussianLikelihood(theory, data, cov_inf)
    for seed in (0, 1):
        p = jnp.asarray(np.random.default_rng(seed).normal(size=3))
        np.testing.assert_allclose(float(lk_t.chi2(p)),
                                   float(lk_i.chi2(p)), rtol=1e-10)
    # fisher through the same metric
    np.testing.assert_allclose(np.asarray(lk_t.fisher(jnp.zeros(3))),
                               np.asarray(lk_i.fisher(jnp.zeros(3))),
                               rtol=1e-9)


def test_template_marginalization_brute_force():
    """chi2_marg differences equal -2 Delta ln integral over the
    template amplitude of exp(-chi2(alpha)/2) (dense numeric grid)."""
    a, b, cov, theory = _toy(seed=11, n_data=5)
    rng = np.random.default_rng(2)
    t = rng.normal(size=5)
    sig = 1.7
    data = b + 0.4 * t + rng.normal(size=5) * 0.2
    lk = inference.GaussianLikelihood(theory, data, cov,
                                      templates=t[None, :],
                                      template_sigma=[sig])
    cinv = np.linalg.inv(cov)

    def neg2ln_marg(p):
        r0 = np.asarray(theory(jnp.asarray(p))) - data
        al = np.linspace(-40, 40, 20001)
        chi2 = np.array([(r0 + x * t) @ cinv @ (r0 + x * t)
                         + x * x / sig**2 for x in al])
        c0 = chi2.min()
        return c0 - 2.0 * np.log(np.trapezoid(
            np.exp(-(chi2 - c0) / 2), al))

    p1 = np.array([0.1, -0.2, 0.5])
    p2 = np.array([1.0, 0.3, -0.7])
    d_analytic = float(lk.chi2(jnp.asarray(p2)) - lk.chi2(jnp.asarray(p1)))
    d_brute = neg2ln_marg(p2) - neg2ln_marg(p1)
    np.testing.assert_allclose(d_analytic, d_brute, rtol=1e-6)


def test_template_improper_prior_invariance():
    """With a flat (sigma=inf) template prior, chi2 is EXACTLY
    invariant under data -> data + alpha * template, and a parameter
    direction aligned with the template carries zero Fisher info."""
    a, b, cov, theory = _toy(seed=9)
    t = np.asarray(a[:, 0])          # template == response of p[0]
    data = b + 0.25
    lk0 = inference.GaussianLikelihood(theory, data, cov,
                                       templates=t[None, :])
    lk1 = inference.GaussianLikelihood(theory, data + 17.3 * t, cov,
                                       templates=t[None, :])
    p = jnp.asarray([0.4, -1.0, 0.2])
    np.testing.assert_allclose(float(lk0.chi2(p)), float(lk1.chi2(p)),
                               rtol=1e-8, atol=1e-8)
    f = np.asarray(lk0.fisher(p))
    # p[0]'s response IS the template: its marginal info must vanish.
    assert abs(f[0, 0]) < 1e-7 * abs(np.asarray(
        inference.fisher_matrix(theory, cov, p))[0, 0])


def test_point_mass_templates_layout():
    """1/theta^2 lands exactly on the gt blocks of the tomographic
    data-vector order; zeros elsewhere; 'lens' mode applies beta."""
    from chomp_tpu.covariance import tomographic_probes

    n_lens, n_src = 2, 3
    theta = np.array([0.5, 1.0, 2.0])
    nb = theta.size
    t = inference.point_mass_templates(n_lens, n_src, theta)
    probes = tomographic_probes(n_lens, n_src)
    assert t.shape == (n_lens * n_src, len(probes) * nb)
    for i in range(n_lens):
        for j in range(n_src):
            row = t[i * n_src + j]
            blk = [q for q, (nm, _, _) in enumerate(probes)
                   if nm == f"gt_{i}{j}"][0]
            np.testing.assert_allclose(row[blk * nb:(blk + 1) * nb],
                                       1.0 / theta**2)
            mask = np.ones(row.size, bool)
            mask[blk * nb:(blk + 1) * nb] = False
            assert np.all(row[mask] == 0.0)
    beta = np.arange(6, dtype=float).reshape(2, 3) + 1
    tl = inference.point_mass_templates(n_lens, n_src, theta,
                                        mode="lens", beta=beta)
    assert tl.shape == (n_lens, len(probes) * nb)
    blk01 = [q for q, (nm, _, _) in enumerate(probes)
             if nm == "gt_01"][0]
    np.testing.assert_allclose(tl[0, blk01 * nb:(blk01 + 1) * nb],
                               beta[0, 1] / theta**2)
    # counts tail + cmb rows just pad with zeros
    tc = inference.point_mass_templates(n_lens, n_src, theta,
                                        cmb_lensing=True, n_counts=4)
    assert tc.shape[1] == (len(tomographic_probes(
        n_lens, n_src, cmb_lensing=True))) * nb + 4
    assert np.all(tc[:, -4:] == 0.0)


def test_theta_cut_mask_and_apply():
    """Family + per-name cuts; cut likelihood == manual sub-block;
    all-zero templates dropped."""
    n_lens, n_src = 1, 2
    theta = np.array([0.3, 1.0, 3.0, 9.0])
    keep = inference.theta_cut_mask(
        n_lens, n_src, theta,
        {"w": (0.5, np.inf), "gt": (0.9, 5.0), "xim_01": (2.5, np.inf),
         "xip": (0.0, np.inf), "xim": (0.0, np.inf)})
    from chomp_tpu.covariance import tomographic_probes
    probes = tomographic_probes(n_lens, n_src)
    names = [p[0] for p in probes]
    nb = theta.size
    expect = {"w_0": [False, True, True, True],
              "gt_00": [False, True, True, False],
              "gt_01": [False, True, True, False],
              "xim_01": [False, False, True, True]}
    for nm, pat in expect.items():
        q = names.index(nm)
        np.testing.assert_array_equal(keep[q * nb:(q + 1) * nb], pat)
    # xip rows untouched
    q = names.index("xip_00")
    assert keep[q * nb:(q + 1) * nb].all()

    rng = np.random.default_rng(0)
    n_d = len(names) * nb
    jac = rng.normal(size=(n_d, 2))
    t0 = rng.normal(size=n_d)
    theory = lambda p: jnp.asarray(t0) + jnp.asarray(jac) @ p
    m = rng.normal(size=(n_d, n_d))
    cov = m @ m.T + n_d * np.eye(n_d)
    data = t0 + rng.normal(size=n_d)
    tpl = inference.point_mass_templates(n_lens, n_src, theta)
    # one template entirely inside the cut region -> must be dropped
    dead = np.zeros((1, n_d))
    q = names.index("w_0")
    dead[0, q * nb] = 1.0           # only the first w point (cut away)
    fn2, d2, c2, t2 = inference.apply_scale_cuts(
        keep, theory, data, cov, templates=np.vstack([tpl, dead]))
    assert t2.shape[0] == tpl.shape[0]
    lk_cut = inference.GaussianLikelihood(fn2, d2, c2, templates=t2)
    # manual reference
    kk = np.asarray(keep, bool)
    manual = inference.GaussianLikelihood(
        lambda p: theory(p)[jnp.asarray(np.nonzero(kk)[0])],
        data[kk], cov[np.ix_(kk, kk)], templates=tpl[:, kk])
    p = jnp.asarray([0.3, -0.8])
    np.testing.assert_allclose(float(lk_cut.chi2(p)),
                               float(manual.chi2(p)), rtol=1e-12)


def test_template_sigma_zero_raises():
    """sigma_alpha = 0 (a pinned, inert template) must NOT be silently
    mapped to the improper flat prior (advisor round-3)."""
    a, b, cov, theory = _toy(seed=5)
    t = np.random.default_rng(1).normal(size=(2, b.size))
    with pytest.raises(ValueError, match="template_sigma == 0"):
        inference.GaussianLikelihood(theory, b, cov, templates=t,
                                     template_sigma=[1.0, 0.0])


def test_marginalized_covariance_sigma_length_check():
    a, b, cov, theory = _toy(seed=5)
    t = np.random.default_rng(1).normal(size=(2, b.size))
    with pytest.raises(ValueError, match="sigmas length"):
        inference.marginalized_covariance(cov, t, [0.5, 0.5, 0.5])
    # scalar broadcast stays allowed
    c1 = inference.marginalized_covariance(cov, t, 0.5)
    c2 = inference.marginalized_covariance(cov, t, [0.5, 0.5])
    np.testing.assert_allclose(c1, c2, rtol=1e-14)


def test_apply_scale_cuts_template_sigma_sync():
    """Cutting with template_sigma keeps the prior vector aligned with
    the surviving template rows (advisor round-3)."""
    rng = np.random.default_rng(3)
    n_d = 8
    jac = rng.normal(size=(n_d, 2))
    theory = lambda p: jnp.asarray(jac) @ p
    m = rng.normal(size=(n_d, n_d))
    cov = m @ m.T + n_d * np.eye(n_d)
    data = rng.normal(size=n_d)
    keep = np.ones(n_d, bool)
    keep[:3] = False
    # template 0 lives only in the cut region -> dropped with its sigma
    t = np.zeros((2, n_d))
    t[0, 1] = 1.0
    t[1, 5] = 1.0
    sig = np.array([0.7, 1.9])
    fn2, d2, c2, t2, s2 = inference.apply_scale_cuts(
        keep, theory, data, cov, templates=t, template_sigma=sig)
    assert t2.shape == (1, keep.sum()) and s2.shape == (1,)
    assert s2[0] == sig[1]
    # consumable downstream without a length mismatch
    inference.GaussianLikelihood(fn2, d2, c2, templates=t2,
                                 template_sigma=s2)
    with pytest.raises(ValueError, match="without templates"):
        inference.apply_scale_cuts(keep, theory, data, cov,
                                   template_sigma=sig)


# ---------------------------------------------------------------------------
# Adaptive HMC + chain diagnostics
# ---------------------------------------------------------------------------


def test_effective_sample_size_referee():
    """ESS on synthetic chains: iid -> ~N_total; AR(1) with known
    autocorrelation -> N (1-phi)/(1+phi), both within MC tolerance."""
    rng = np.random.default_rng(0)
    n, m = 4000, 4
    iid = rng.normal(size=(m, n, 1))
    ess = inference.effective_sample_size(iid)
    assert abs(ess[0] / (m * n) - 1.0) < 0.15
    phi = 0.7
    eps = rng.normal(size=(m, n))
    ar = np.empty((m, n))
    ar[:, 0] = eps[:, 0] / np.sqrt(1 - phi**2)
    for t in range(1, n):
        ar[:, t] = phi * ar[:, t - 1] + eps[:, t]
    ess_ar = inference.effective_sample_size(ar[:, :, None])
    expect = m * n * (1 - phi) / (1 + phi)
    assert abs(ess_ar[0] / expect - 1.0) < 0.25


def test_split_rhat_referee():
    rng = np.random.default_rng(1)
    good = rng.normal(size=(4, 2000, 2))
    r = inference.split_rhat(good)
    assert np.all(r < 1.01)
    # Disjoint chain means -> large R-hat; within-chain drift (first
    # half vs second half) is caught by the SPLIT statistic.
    bad = good.copy()
    bad[0, :, 0] += 5.0
    assert inference.split_rhat(bad)[0] > 1.5
    drift = good.copy()
    drift[:, 1000:, 1] += 4.0
    assert inference.split_rhat(drift)[1] > 1.5


def test_adaptive_hmc_gaussian_recovery():
    """Correlated-Gaussian posterior: the tuned sampler recovers the
    mean and covariance within MC error, converges (R-hat), and the
    dense-mass variant handles strong correlation."""
    cov = np.array([[1.0, 0.85, 0.0],
                    [0.85, 1.0, 0.3],
                    [0.0, 0.3, 2.0]])
    prec = jnp.asarray(np.linalg.inv(cov))
    mean = jnp.asarray([1.0, -2.0, 0.5])

    def nlp(p):
        d = p - mean
        return 0.5 * d @ prec @ d

    out = inference.adaptive_hmc(nlp, jnp.zeros(3),
                                 jax.random.PRNGKey(0), n_warmup=400,
                                 n_samples=800, n_chains=4, n_leap=12,
                                 dense_mass=True)
    s = np.asarray(out["samples"]).reshape(-1, 3)
    r = inference.split_rhat(out["samples"])
    assert np.all(r < 1.02), r
    ess = inference.effective_sample_size(out["samples"])
    se = np.sqrt(np.diag(cov) / ess)
    assert np.all(np.abs(s.mean(axis=0) - np.asarray(mean))
                  < 5.0 * se), (s.mean(axis=0), se)
    np.testing.assert_allclose(np.cov(s.T), cov, atol=0.25)
    # tuned step size lands in a sane range and acceptance near target
    assert 0.05 < out["step_size"] < 5.0
    assert 0.6 < float(np.mean(out["accept"])) < 0.99
    # dense mass approximates the true covariance direction: the
    # estimated metric must decorrelate the 0-1 pair
    mass = out["mass"]
    mass_cov = np.linalg.inv(mass)
    rho = mass_cov[0, 1] / np.sqrt(mass_cov[0, 0] * mass_cov[1, 1])
    assert abs(rho - 0.85) < 0.25


def test_adaptive_hmc_diag_mass_scaling():
    """Diagonal metric absorbs per-dimension scale differences: the
    estimated mass_diag tracks 1/var over two decades."""
    var = np.array([1.0, 100.0])

    def nlp(p):
        return 0.5 * jnp.sum(p * p / jnp.asarray(var))

    out = inference.adaptive_hmc(nlp, jnp.zeros(2),
                                 jax.random.PRNGKey(3), n_warmup=500,
                                 n_samples=600, n_chains=4, n_leap=12)
    md = out["mass_diag"]
    ratio = (md[0] / md[1]) / (var[1] / var[0])
    assert 0.3 < ratio < 3.0, md
    s = np.asarray(out["samples"]).reshape(-1, 2)
    np.testing.assert_allclose(s.var(axis=0), var, rtol=0.3)


def test_adaptive_hmc_nonfinite_init_recovery():
    """ADVICE r4: chains whose jittered start lands outside a prior
    barrier (non-finite neg_log_post) are re-seeded at p0 with a
    warning instead of silently freezing; a non-finite p0 raises."""
    def nlp(p):
        # hard barrier: support is p[0] > -0.1
        return jnp.where(p[0] > -0.1, 0.5 * jnp.sum(p * p), jnp.inf)

    with pytest.warns(UserWarning, match="re-initialized at p0"):
        out = inference.adaptive_hmc(
            nlp, jnp.zeros(2), jax.random.PRNGKey(3), n_warmup=100,
            n_samples=100, n_chains=8, n_leap=8, init_jitter=0.5)
    # every chain moves (no frozen all-reject chains)
    s = np.asarray(out["samples"])            # (chains, draws, dim)
    per_chain_var = s.var(axis=1).sum(axis=1)
    assert np.all(per_chain_var > 1e-4), per_chain_var

    with pytest.raises(ValueError, match="non-finite"):
        inference.adaptive_hmc(nlp, jnp.asarray([-5.0, 0.0]),
                               jax.random.PRNGKey(0), n_warmup=10,
                               n_samples=10, n_chains=2)


def test_external_loglike_contract():
    """external_loglike: numpy in/float out, ln-P sign, -inf on
    non-finite, vectorized batch form, bare-callable support."""
    cov = np.diag([0.5, 2.0])
    prec = jnp.asarray(np.linalg.inv(cov))

    def theory(p):
        return p

    like = inference.GaussianLikelihood(theory, jnp.zeros(2),
                                        jnp.asarray(cov))
    lp = inference.external_loglike(like)
    p = np.array([0.3, -0.4])
    expect = -0.5 * float(p @ np.linalg.inv(cov) @ p)
    assert isinstance(lp(p), float)
    np.testing.assert_allclose(lp(p), expect, rtol=1e-12)

    # bare neg-log-post callable; NaN -> -inf
    def nlp(q):
        return jnp.where(q[0] > 0, 0.5 * jnp.sum(q * q), jnp.nan)

    lp2 = inference.external_loglike(nlp)
    assert lp2(np.array([-1.0, 0.0])) == -np.inf
    np.testing.assert_allclose(lp2(np.array([1.0, 0.0])), -0.5)

    # vectorized form: (n_walkers, n_dim) -> (n_walkers,)
    lpv = inference.external_loglike(like, vectorized=True)
    ps = np.array([[0.3, -0.4], [0.0, 0.0]])
    out = lpv(ps)
    assert out.shape == (2,)
    np.testing.assert_allclose(out[0], expect, rtol=1e-12)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-12)


def test_ensemble_sample_gaussian():
    """The stretch-move fallback sampler recovers a 2-D Gaussian's
    moments through the pure-numpy external contract."""
    cov = np.array([[1.0, 0.6], [0.6, 1.0]])
    prec = np.linalg.inv(cov)

    def log_prob(p):
        return float(-0.5 * p @ prec @ p)

    rng = np.random.default_rng(0)
    p0 = 0.1 * rng.normal(size=(12, 2))
    chain, acc = inference.ensemble_sample(log_prob, p0, 1500, seed=1)
    assert 0.2 < acc < 0.9, acc
    flat = chain[500:].reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.15)
    np.testing.assert_allclose(np.cov(flat.T), cov, atol=0.25)

    with pytest.raises(ValueError, match="walkers"):
        inference.ensemble_sample(log_prob, p0[:3], 10)
