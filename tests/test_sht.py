"""sht.py: the TPU-native spherical harmonic transforms + the MASTER
data route (bandpowers.decouple / map_bandpowers).

Referee strategy:
  1. Exactness identities: scalar and spin-2 E/B round trips on
     band-limited inputs (GL analysis is exact), pseudo-C_l of an
     unmasked sky = input spectrum, table orthonormality.
  2. Equality against the independently written numpy MC referees
     (tests/sht_referee.py, tests/test_curved._Spin2Sht — themselves
     round-trip/sympy/orthogonality-validated) on the same grid.
  3. End-to-end MASTER closure: Gaussian skies through mask ->
     map_bandpowers -> mean matches the EXACT bandpower window F C
     within MC error, with white-noise debias exact in the mean.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import bandpowers as bp
from chomp_tpu.curved import ProfileCurvedMask, SphericalCapMask
from chomp_tpu.sht import SHT, gl_mask_map
from tests.sht_referee import (_sht_lambda_tables, _sht_pseudo_power,
                               _sht_synth)

LMAX, N_LAT, N_PHI = 24, 40, 64


@pytest.fixture(scope="module")
def sht():
    return SHT(LMAX, N_LAT, N_PHI, spin2=True, dtype=jnp.float64)


def rand_alm(rng, lmax, lmin=0, cl=None):
    """[m, l] complex alm with the real-field m=0 convention; optional
    Gaussian spectrum cl (m=0 var C_l, m>0 var C_l/2 per component)."""
    a = np.zeros((lmax + 1, lmax + 1), dtype=complex)
    for m in range(lmax + 1):
        lo = max(m, lmin)
        sig = np.ones(lmax + 1 - lo) if cl is None else np.sqrt(
            np.maximum(cl[lo:], 0.0))
        if m == 0:
            a[m, lo:] = rng.normal(size=lmax + 1 - lo) * sig
        else:
            a[m, lo:] = (rng.normal(size=lmax + 1 - lo)
                         + 1j * rng.normal(size=lmax + 1 - lo)) \
                * sig / np.sqrt(2.0)
    return a


def test_scalar_round_trip_and_pseudo_cl(sht):
    rng = np.random.default_rng(0)
    a0 = rand_alm(rng, LMAX)
    maps = sht.synthesize(a0)
    a1 = np.asarray(sht.analyze(maps))
    np.testing.assert_allclose(a1, a0, atol=5e-12)
    cl = np.asarray(sht.pseudo_cl(jnp.asarray(a0)))
    fac = np.where(np.arange(LMAX + 1) == 0, 1.0, 2.0)
    direct = (fac[:, None] * np.abs(a0) ** 2).sum(0) \
        / (2.0 * np.arange(LMAX + 1) + 1.0)
    np.testing.assert_allclose(cl, direct, rtol=1e-12)


def test_spin2_round_trip(sht):
    rng = np.random.default_rng(1)
    e0 = rand_alm(rng, LMAX, lmin=2)
    b0 = rand_alm(rng, LMAX, lmin=2)
    q, u = sht.synthesize_spin2(e0, b0)
    e1, b1 = sht.analyze_spin2(q, u)
    np.testing.assert_allclose(np.asarray(e1), e0, atol=5e-12)
    np.testing.assert_allclose(np.asarray(b1), b0, atol=5e-12)
    # B=0 convenience path.
    q0, u0 = sht.synthesize_spin2(e0)
    e2, b2 = sht.analyze_spin2(q0, u0)
    np.testing.assert_allclose(np.asarray(e2), e0, atol=5e-12)
    np.testing.assert_allclose(np.asarray(b2), 0.0, atol=5e-12)


def test_orthonormality(sht):
    """GL-weighted Gram of the lambda tables is the identity on each
    m block (the discrete orthonormality the exact analysis rests on),
    and likewise for the N_l d_{m,2} spin tables."""
    lam = np.asarray(sht._lam)
    gram = np.einsum("mlx,x,mkx->mlk", lam, sht.w_quad, lam) * 2 * np.pi
    for m in range(LMAX + 1):
        expect = np.zeros((LMAX + 1, LMAX + 1))
        expect[m:, m:] = np.eye(LMAX + 1 - m)
        np.testing.assert_allclose(gram[m], expect, atol=2e-13)
    dp = np.asarray(sht._dp)
    gram2 = np.einsum("mlx,x,mkx->mlk", dp, sht.w_quad, dp) * 2 * np.pi
    for m in range(LMAX + 1):
        lo = max(m, 2)
        expect = np.zeros((LMAX + 1, LMAX + 1))
        expect[lo:, lo:] = np.eye(LMAX + 1 - lo)
        np.testing.assert_allclose(gram2[m], expect, atol=2e-13)


def test_matches_numpy_referees(sht):
    """Synthesis and masked pseudo-power equal the independently
    written numpy referee implementations on the same grid."""
    rng = np.random.default_rng(2)
    a0 = rand_alm(rng, LMAX)
    lams = _sht_lambda_tables(LMAX, sht.x)
    a_re = [a0[m, m:].real[None, :] for m in range(LMAX + 1)]
    a_im = [a0[m, m:].imag[None, :] for m in range(LMAX + 1)]
    maps_ref = _sht_synth(lams, a_re, a_im, N_PHI)[0]
    maps = np.asarray(sht.synthesize(a0))
    np.testing.assert_allclose(maps, maps_ref, atol=1e-12)
    w = np.asarray(gl_mask_map(sht, SphericalCapMask(0.7)))
    ps_ref = _sht_pseudo_power(lams, (maps_ref * w)[None], sht.w_quad,
                               N_PHI)[0] / (2 * np.arange(LMAX + 1) + 1.0)
    cl = np.asarray(sht.pseudo_cl(sht.analyze(maps * w)))
    np.testing.assert_allclose(cl, ps_ref, atol=1e-14)


def test_batched_and_jittable(sht):
    rng = np.random.default_rng(3)
    a = np.stack([rand_alm(rng, LMAX) for _ in range(3)])
    maps = sht.synthesize(a)
    assert maps.shape == (3, N_LAT, N_PHI)
    a_loop = np.stack([np.asarray(sht.synthesize(a[i]))
                       for i in range(3)])
    # Batched vs loop differ only by float reassociation of the fused
    # contractions: bound absolutely at the map scale.
    scale = np.max(np.abs(a_loop))
    np.testing.assert_allclose(np.asarray(maps), a_loop, rtol=0,
                               atol=1e-12 * scale)
    f = jax.jit(lambda m: sht.pseudo_cl(sht.analyze(m)))
    ref = np.asarray(sht.pseudo_cl(sht.analyze(maps)))
    np.testing.assert_allclose(np.asarray(f(maps)), ref, rtol=0,
                               atol=1e-12 * np.max(ref))


def test_pytree_argument(sht):
    """SHT is a registered pytree: passing it as a jit ARGUMENT (the
    axon-safe pattern — tables as device buffers, not program
    constants) gives identical results, and tree round-trips."""
    leaves, treedef = jax.tree_util.tree_flatten(sht)
    sht2 = jax.tree_util.tree_unflatten(treedef, leaves)
    rng = np.random.default_rng(7)
    a0 = rand_alm(rng, LMAX)
    maps = sht.synthesize(a0)
    f = jax.jit(lambda s, m: s.pseudo_cl(s.analyze(m)))
    np.testing.assert_allclose(np.asarray(f(sht, maps)),
                               np.asarray(sht2.pseudo_cl(
                                   sht2.analyze(maps))), rtol=1e-12)
    np.testing.assert_allclose(sht2.theta, sht.theta, rtol=0, atol=0)


def test_constructor_guards():
    with pytest.raises(ValueError):
        SHT(16, n_phi=20)            # aliases m
    with pytest.raises(ValueError):
        SHT(16, n_lat=10)            # under-resolved GL
    s = SHT(8, spin2=False, dtype=jnp.float64)
    with pytest.raises(ValueError):
        s.analyze_spin2(np.zeros((9, 18)), np.zeros((9, 18)))


@pytest.fixture(scope="module")
def master_setup():
    th = np.linspace(0.0, 0.9, 91)
    mask = ProfileCurvedMask(th, np.clip((0.9 - th) / 0.35, 0.0, 1.0),
                             lmax_mask=96)
    lmax, edges = 32, [2, 8, 14, 22, 30]
    setup = bp.bandpower_setup(mask, lmax, edges)
    sht = SHT(lmax, 56, 80, spin2=True, dtype=jnp.float64)
    w = gl_mask_map(sht, mask)
    return mask, setup, sht, w


def test_map_bandpowers_scalar_closure(master_setup):
    """Gaussian skies -> map_bandpowers: the MC mean of the decoupled
    band powers matches the EXACT window prediction F C within MC
    error, and the white-noise debias is exact in the mean."""
    mask, setup, sht, w = master_setup
    lmax = setup["lmax"]
    ells = np.arange(lmax + 1)
    cl_true = 1.0 / (ells + 4.0) ** 2
    rng = np.random.default_rng(11)
    n_real = 384
    a = np.stack([rand_alm(rng, lmax, cl=cl_true)
                  for _ in range(n_real)])
    maps = np.asarray(sht.synthesize(a))
    # White noise at per-steradian level P: pixel variance P/Omega_pix
    # on the GL grid (Omega_pix = w_quad * dphi).
    level = 2.0e-4
    om_pix = sht.w_quad[:, None] * (2.0 * np.pi / sht.n_phi)
    noise = rng.normal(size=maps.shape) * np.sqrt(level / om_pix)
    # Axis 0 of scalar_maps is the FIELD index; realizations ride the
    # remaining batch axes of each field's maps.
    out = bp.map_bandpowers(sht, w, setup,
                            scalar_maps=(maps + noise)[None],
                            noise_levels={"scalar": [level]})
    b_hat = np.asarray(out[("s", 0, 0)])          # (n_real, n_band)
    exp = np.asarray(setup["ops"]["00"]["F"]) @ cl_true
    err = b_hat.std(axis=0) / np.sqrt(n_real)
    assert np.all(np.abs(b_hat.mean(axis=0) - exp) < 4.0 * err), (
        (b_hat.mean(axis=0) - exp) / err)
    np.testing.assert_allclose(b_hat.mean(axis=0), exp, rtol=0.12)


def test_map_bandpowers_spin2_closure(master_setup):
    """E-only Gaussian shear skies: decoupled pseudo-EE band powers
    match F_pp C^EE in the MC mean (the BB-null estimator model)."""
    mask, setup, sht, w = master_setup
    lmax = setup["lmax"]
    ells = np.arange(lmax + 1)
    cl_ee = np.where(ells >= 2, 1.0 / (ells + 4.0) ** 2, 0.0)
    rng = np.random.default_rng(12)
    n_real = 384
    e = np.stack([rand_alm(rng, lmax, lmin=2, cl=cl_ee)
                  for _ in range(n_real)])
    q, u = sht.synthesize_spin2(jnp.asarray(e))
    # qu_maps is (n_fields, 2, *batch, n_lat, n_phi).
    qu = np.stack([np.asarray(q), np.asarray(u)], axis=0)[None]
    out = bp.map_bandpowers(sht, w, setup, qu_maps=qu)
    b_hat = np.asarray(out[("ee", 0, 0)])
    exp = np.asarray(setup["ops"]["pp"]["F"]) @ cl_ee
    err = b_hat.std(axis=0) / np.sqrt(n_real)
    assert np.all(np.abs(b_hat.mean(axis=0) - exp) < 4.0 * err), (
        (b_hat.mean(axis=0) - exp) / err)
    np.testing.assert_allclose(b_hat.mean(axis=0), exp, rtol=0.15)


def test_spin2_bandpower_covariance_mc(master_setup):
    """Spin-2 MC referee for the EE bandpower covariance on the
    apodized cap: E-only Gaussian skies through the jax SHT, decoupled
    pseudo-EE band powers, MC covariance vs bandpower_gaussian_block
    under BOTH kernel modes (spin-0 and the spin-aware Xi^{22+}).
    Asserts the NKA band for both and that the spin-aware kernel is
    not worse on the diagonal (in the summed |log-ratio| sense)."""
    mask, setup, sht, w = master_setup
    lmax = setup["lmax"]
    ells = np.arange(lmax + 1)
    cl_ee = np.where(ells >= 2, 1.0 / (ells + 4.0) ** 2, 0.0)
    rng = np.random.default_rng(21)
    n_real = 768
    e = np.stack([rand_alm(rng, lmax, lmin=2, cl=cl_ee)
                  for _ in range(n_real)])
    q, u = sht.synthesize_spin2(jnp.asarray(e))
    e_t, _ = sht.analyze_spin2(np.asarray(q) * w, np.asarray(u) * w)
    cl_hat = np.asarray(sht.pseudo_cl(e_t))
    d = setup["ops"]["pp"]["D"]
    b_hat = cl_hat @ np.asarray(d).T
    cov_mc = np.cov(b_hat.T)
    k0 = bp.pseudo_covariance_kernel(mask, lmax)
    k2 = bp.pseudo_covariance_kernels_spin(mask, lmax)[2]
    cl_j = jnp.asarray(cl_ee)
    blk0 = np.asarray(bp.bandpower_gaussian_block(
        d, d, cl_j, cl_j, cl_j, cl_j, k0))
    blk2 = np.asarray(bp.bandpower_gaussian_block(
        d, d, cl_j, cl_j, cl_j, cl_j, k2))
    r0 = np.diag(blk0) / np.diag(cov_mc)
    r2 = np.diag(blk2) / np.diag(cov_mc)
    # Measured (768 skies): spin-0 [4.93, 1.63, 1.14, 1.04] vs
    # spin-aware [3.41, 1.34, 1.07, 1.01] — the Xi^{22+} kernel is
    # closer on EVERY band.  Band 1 ([2, 8)) sits entirely inside the
    # mask coupling width (~pi/0.55 rad ~ l=6): NKA over-predicts
    # there on any kernel — the safe direction, same class as the
    # theta-space footprint-scale conservatism.
    assert np.all((r2[1:] > 0.6) & (r2[1:] < 1.7)), (r0, r2)
    assert r2[0] > 1.0, r2                     # conservative, not low
    assert np.sum(np.abs(np.log(r2))) <= np.sum(np.abs(np.log(r0))) \
        + 0.05, (r0, r2)


def test_kernel_mode_spin_wiring(master_setup):
    """kernel_mode='spin' == 'spin0' bitwise on a scalar-only probe
    set (no spin-2 legs anywhere), and the full 3-probe joint matrix
    differs ONLY in spin-2-paired blocks while staying symmetric."""
    from chomp_tpu import covariance, projection
    from chomp_tpu.halo import build_halo_model
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec, default_halo
    from chomp_tpu import default_cosmo

    mask, setup, sht, w = master_setup
    lmax, edges = setup["lmax"], list(setup["edges"])
    g = GridSpec(n_k=64, n_mass=64, n_ell=256, n_mu=8, sigma_panels=8,
                 sigma_n_per_panel=32, n_growth=32, n_dist=32,
                 lattice_dln=0.08)
    cosmo = default_cosmo()
    h, hod = default_halo(), default_hod()
    mk = lambda z0, sz: projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.5),
        z0=jnp.asarray(z0), sigma_z=jnp.asarray(sz))
    lens, src = [mk(0.5, 0.15)], [mk(1.0, 0.3)]
    model = build_halo_model(cosmo, h, hod, grid=g)
    c_a = np.asarray(bp.tomographic_bandpower_covariance(
        cosmo, h, model, lens, [], mask, lmax, edges, 1e7, 0.3, grid=g,
        kernel_mode="spin0"))
    c_b = np.asarray(bp.tomographic_bandpower_covariance(
        cosmo, h, model, lens, [], mask, lmax, edges, 1e7, 0.3, grid=g,
        kernel_mode="spin"))
    np.testing.assert_allclose(c_a, c_b, rtol=0, atol=0)
    cov = np.asarray(bp.tomographic_bandpower_covariance(
        cosmo, h, model, lens, src, mask, lmax, edges, 1e7, 0.08,
        grid=g, kernel_mode="spin"))
    cov0 = np.asarray(bp.tomographic_bandpower_covariance(
        cosmo, h, model, lens, src, mask, lmax, edges, 1e7, 0.08,
        grid=g, kernel_mode="spin0"))
    nb = len(edges) - 1
    np.testing.assert_allclose(cov, cov.T, rtol=1e-12,
                               atol=1e-13 * np.max(np.abs(cov)))
    # gg x gg block: all scalar -> bitwise equal across modes.
    np.testing.assert_allclose(cov[:nb, :nb], cov0[:nb, :nb], rtol=0,
                               atol=0)
    # EE auto block: both pairings are 2x2 pairs -> must differ.
    ee = slice(2 * nb, 3 * nb)
    assert np.max(np.abs(cov[ee, ee] - cov0[ee, ee])) > 0
    with pytest.raises(ValueError):
        bp.tomographic_bandpower_covariance(
            cosmo, h, model, lens, [], mask, lmax, edges, 1e7, 0.3,
            grid=g, kernel_mode="bogus")


def test_decouple_matches_operator(master_setup):
    """decouple == D @ (C~ - N~) by hand, and slices longer inputs."""
    mask, setup, sht, w = master_setup
    lmax = setup["lmax"]
    rng = np.random.default_rng(4)
    cl_hat = rng.random(lmax + 9)                 # longer than lmax+1
    got = np.asarray(bp.decouple(setup, "00", cl_hat, 3.0e-4))
    nl = bp.white_noise_pseudo_cl(3.0e-4, mask, lmax)
    expect = np.asarray(setup["ops"]["00"]["D"]) @ (cl_hat[:lmax + 1]
                                                    - nl)
    np.testing.assert_allclose(got, expect, rtol=1e-12)
