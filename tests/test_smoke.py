"""<10-min smoke tier (VERDICT round-4 item 9): every public surface
touched ONCE on tiny grids — shapes, finiteness, and basic sanity only
(the accuracy referees live in the per-module suites).  This is the dev
loop: ``pytest -m smoke``.

Tiny-grid outputs are NOT accurate; nothing here asserts physics beyond
positivity/monotonicity where it is grid-independent.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from chomp_tpu import (background, bao, correlation, covariance, halo,
                       linear, projection)
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec, default_cosmo, default_halo
from chomp_tpu.utils.tree import replace

pytestmark = pytest.mark.smoke

TINY = GridSpec(n_k=128, n_k_table=1024, sigma_panels=8,
                sigma_n_per_panel=32, n_growth=32, n_dist=32,
                n_mass=64, n_z_proj=32, n_z_lens=32, n_ell=256,
                n_theta=16)

C0 = default_cosmo()
HP = default_halo()


@pytest.fixture(scope="module")
def model():
    return halo.build_halo_model(C0, HP, default_hod(), grid=TINY)


@pytest.fixture(scope="module")
def dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


def _finite(x):
    return bool(np.all(np.isfinite(np.asarray(x))))


def test_background_linear_bao():
    z = jnp.asarray([0.0, 0.5, 1.0])
    chi = background.comoving_distance(C0, z, n=TINY.n_dist)
    assert _finite(chi) and float(chi[0]) == 0.0
    assert np.all(np.diff(np.asarray(chi)) > 0)
    k = jnp.asarray(np.logspace(-3, 1, 32))
    p = linear.linear_power(C0, k)
    assert _finite(p) and np.all(np.asarray(p) > 0)
    rd = bao.r_drag(C0)
    assert 90.0 < float(rd) < 110.0
    v = bao.bao_vector(C0, jnp.asarray([0.38, 0.61]))
    assert _finite(v)


def test_halo_model_powers(model):
    k = jnp.asarray(np.logspace(-2, 1, 16))
    p = halo.powers(C0, HP, model, k, grid=TINY)
    for key in ("power_mm", "power_gg", "power_gm"):
        assert _finite(p[key]) and np.all(np.asarray(p[key]) > 0)
    assert float(model.n_g) > 0
    assert _finite(halo.galaxy_bias_avg(model))


def test_mass_fn_sentinels():
    hp_t = replace(HP, mass_fn=1)          # Tinker08/10 family
    m_t = halo.build_halo_model(C0, hp_t, default_hod(), grid=TINY)
    assert float(m_t.n_g) > 0


def test_flagship_pipeline_flat(dist):
    from chomp_tpu.parallel.sweep import make_pipeline

    fn = make_pipeline(HP, default_hod(), dist, grid=TINY, z_pivot=1.0,
                       include_shear=True)
    out = jax.jit(fn)(C0)
    for key in ("w_theta", "gamma_t", "xi_plus", "xi_minus"):
        assert _finite(out[key]), key


def test_pipeline_exact_z_and_nonlimber(dist):
    from chomp_tpu.parallel.sweep import make_pipeline

    fn = make_pipeline(HP, default_hod(), dist, grid=TINY,
                       exact_z_anchors=4, nonlimber_ell_switch=20,
                       nonlimber_rsd=True)
    out = jax.jit(fn)(C0)
    assert _finite(out["w_theta"]) and _finite(out["gamma_t"])


def test_pipeline_curved_halofit_neutrino_baryons(dist):
    from chomp_tpu.parallel.sweep import make_pipeline

    fn = make_pipeline(HP, default_hod(), dist, grid=TINY, z_pivot=1.0,
                       geometry="curved", matter_power="halofit")
    c_nu = replace(C0, m_nu=jnp.asarray(0.1), bary_c=jnp.asarray(2.0),
                   a_mod=jnp.asarray(0.9))
    out = jax.jit(fn)(c_nu)
    assert _finite(out["w_theta"]) and _finite(out["gamma_t"])


def test_tomographic_pipeline_and_nuisance(dist):
    from chomp_tpu.parallel.sweep import (default_nuisance,
                                          make_tomographic_pipeline)

    d2 = projection.DNdzGaussian(
        z_min=jnp.asarray(0.2), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.2), sigma_z=jnp.asarray(0.3))
    fn = make_tomographic_pipeline(HP, default_hod(), [dist], [d2],
                                   z_pivot=0.8, grid=TINY,
                                   with_nuisance=True,
                                   include_cmb_lensing=True)
    nuis = default_nuisance(1, 1)
    out = jax.jit(fn)(C0, nuis)
    assert _finite(out["vector"])


def test_joint_covariance(model, dist):
    d_src = projection.DNdzGaussian(
        z_min=jnp.asarray(0.3), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(1.2), sigma_z=jnp.asarray(0.3))
    edges = covariance.theta_bin_edges_deg(TINY, n_bins=4)
    cov = covariance.joint_wtheta_gammat_covariance(
        C0, HP, model, dist, d_src, edges, 0.1, 3.0e7, 1.0e-9,
        grid=TINY, n_k_tri=32, n_z_tri=8, n_ell_cov_ng=24,
        n_ell_cov_g=512)
    cov = np.asarray(cov)
    assert _finite(cov) and np.all(np.diag(cov) > 0)
    np.testing.assert_allclose(cov, cov.T, atol=1e-12 * np.abs(cov).max())


def test_masks_ssc(model, dist):
    from chomp_tpu import ssc
    from chomp_tpu.mask import DiscMask

    edges = covariance.theta_bin_edges_deg(TINY, n_bins=4)
    m = DiscMask(float(np.sqrt(0.1 / np.pi)))
    block = ssc.ssc_covariance(C0, HP, model, dist, edges, m, grid=TINY,
                               n_ell_cov=24, n_k_ssc=48)
    assert _finite(block) and np.all(np.diag(np.asarray(block)) >= 0)


def test_curved_mask_and_bandpowers(model, dist):
    from chomp_tpu import bandpowers as bp
    from chomp_tpu.curved import ProfileCurvedMask

    th = np.linspace(0.0, 0.6, 31)
    mask = ProfileCurvedMask(th, np.clip((0.6 - th) / 0.2, 0.0, 1.0),
                             lmax_mask=64)
    edges = [4, 16, 32, 64]
    fn = bp.make_bandpower_pipeline(HP, default_hod(), [dist], [dist],
                                    mask, 64, edges, n_tbl=24, grid=TINY)
    out = jax.jit(fn)(C0)
    assert _finite(out["vector"])
    cov = bp.tomographic_bandpower_covariance(
        C0, HP, model, [dist], [dist], mask, 64, edges, [3.0e7],
        [1.0e-9], n_tbl=24, grid=TINY)
    assert _finite(cov) and np.all(np.diag(np.asarray(cov)) > 0)


def test_sht_roundtrip_small():
    from chomp_tpu.sht import SHT

    lmax = 16
    sh = SHT(lmax, n_lat=24, n_phi=48, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    # alm indexed [m, l], real field: m=0 row real, l >= m support.
    alm = (rng.normal(size=(lmax + 1, lmax + 1))
           + 1j * rng.normal(size=(lmax + 1, lmax + 1)))
    alm[0] = alm[0].real
    for m in range(lmax + 1):
        alm[m, :m] = 0.0
    maps = sh.synthesize(jnp.asarray(alm))
    alm2 = sh.analyze(maps)
    np.testing.assert_allclose(np.asarray(alm2), alm, atol=1e-10)


def test_healpix_roundtrip():
    from chomp_tpu import healpix

    nside = 4
    p = np.arange(12 * nside * nside)
    th, ph = healpix.pix2ang_ring(nside, p)
    p2 = healpix.ang2pix_ring(nside, th, ph)
    np.testing.assert_array_equal(np.asarray(p2), p)
    r = healpix.nest2ring(nside, p)
    assert np.array_equal(np.sort(np.asarray(r)), p)


def test_clusters(dist):
    from chomp_tpu import clusters

    sel = clusters.ClusterSelection(
        ln_m_obs_edges=jnp.log(jnp.asarray([2e14, 2e16])),
        sigma_lnm=jnp.asarray(0.25))
    z_edges = (0.2, 0.5, 0.8)
    n = clusters.cluster_counts(C0, HP, sel, z_edges, 1.5, n_z_quad=6,
                                grid=TINY)
    assert _finite(n) and np.all(np.asarray(n) > 0)
    cov = clusters.counts_covariance(C0, HP, sel, z_edges, 1.5,
                                     n_z_quad=6, grid=TINY)
    assert _finite(cov) and np.all(np.diag(np.asarray(cov)) > 0)


def test_rsd_family(model):
    from chomp_tpu import rsd

    k = jnp.asarray(np.logspace(-2, 0, 12))
    p_ell = rsd.multipoles(C0, HP, model, k, sigma_v=4.0, grid=TINY)
    assert _finite(p_ell)
    k_edges = jnp.asarray(np.linspace(0.02, 0.2, 7))
    cov = rsd.multipole_covariance(C0, HP, model, k_edges, 1.0e9,
                                   sigma_v=4.0, grid=TINY)
    assert _finite(cov)
    s = jnp.asarray(np.linspace(40.0, 120.0, 6))
    xi = rsd.xi_multipoles(C0, HP, model, s, sigma_v=4.0, grid=TINY)
    assert _finite(xi)
    rp = np.geomspace(1.0, 20.0, 5)
    wp = rsd.wp_rp(C0, HP, model, rp, sigma_v=4.0, grid=TINY)
    assert _finite(wp)


def test_compat_surface():
    from chomp_tpu.compat import cosmology

    cos = cosmology.SingleEpoch(0.0)
    assert float(cos.comoving_distance(0.5)) > 0
    assert 0.9 < cos.growth_factor(0.0) <= 1.0


def test_correlation_ops():
    ells, _ln0, _dln = correlation.ell_grid(TINY)
    cl = 1.0 / (1.0 + jnp.asarray(ells)) ** 1.5
    th = correlation.theta_bins_deg(TINY)
    w = correlation.wtheta_from_cl(cl, th, grid=TINY)
    assert _finite(w)


def test_inference_stack():
    from chomp_tpu import inference

    a = jnp.asarray([[2.0, 0.3], [-0.5, 1.0], [0.1, 0.7]])

    def theory(p):
        return a @ p

    cov = jnp.eye(3) * 0.01
    like = inference.GaussianLikelihood(theory, theory(jnp.ones(2)), cov)
    f = inference.fisher_matrix(theory, cov, jnp.ones(2))
    assert _finite(f) and np.all(np.linalg.eigvalsh(np.asarray(f)) > 0)
    p_best, _info = inference.map_fit(like.neg_log_post, jnp.zeros(2),
                                      n_steps=1500, learning_rate=3e-2)
    np.testing.assert_allclose(np.asarray(p_best), 1.0, atol=1e-2)


def test_emulator_tiny():
    from chomp_tpu import emulator

    def fnt(p):
        return jnp.stack([p[0] + p[1], p[0] * p[1], p[0] - p[1]])

    emu, rep = emulator.train_emulator(
        fnt, np.array([[-1.0, 1.0], [-1.0, 1.0]]), jax.random.PRNGKey(0),
        n_train=64, n_val=8, n_pca=None, hidden=(16,), n_epochs=100,
        batch_size=32)
    assert _finite(emu(jnp.asarray([0.3, -0.2])))


def test_parallel_spectral_mesh(dist):
    from chomp_tpu.parallel import spectral

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                             ("data", "model"))
    fn = spectral.make_spectral_pipeline(HP, default_hod(), dist, mesh,
                                         grid=TINY)
    batch_c = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (2,) + jnp.shape(x)), C0)
    out = fn(batch_c)                    # (2, n_theta) w(theta)
    assert np.shape(out)[0] == 2 and _finite(out)


def test_io_roundtrip(tmp_path, model):
    from chomp_tpu.utils import io

    f = tmp_path / "m.npz"
    io.save_pytree(str(f), model)
    m2 = io.load_pytree(str(f), model)
    np.testing.assert_array_equal(np.asarray(m2.n_g), np.asarray(model.n_g))
