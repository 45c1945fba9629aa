"""Massive-neutrino sector (chomp_tpu.neutrino; EH99 fitting formulas).

Referees:
  - an INDEPENDENT numpy transcription of Eisenstein & Hu 1999
    (astro-ph/9710252) eqs. 1-24 (catches jnp-side transcription bugs);
  - the analytic small-scale asymptotes of the growth ratios
    (D_cb/D_1 -> D_1^{-p_cb}, D_cbnu/D_1 -> f_cb D_1^{-p_cb});
  - the classic ~ -8 f_nu total-power suppression rule at high k;
  - EXACT (bitwise) reduction to the EH98 baseline at m_nu = 0 through
    linear, halo-model and halofit layers;
  - gradient/vmap cleanliness (the jnp.where guards).

upstream: no counterpart (chomp has no neutrino sector).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import background, halo, linear, neutrino, nlpower
from chomp_tpu.hod import default_hod
from chomp_tpu.params import default_cosmo, default_halo
from chomp_tpu.utils.tree import replace

C0 = default_cosmo()
CNU = replace(C0, m_nu=jnp.asarray(0.3))
K = jnp.logspace(-4, 2, 61)


# ---------------------------------------------------------------------------
# Independent numpy transcription of EH99 (written from the paper, not
# from chomp_tpu.neutrino).
# ---------------------------------------------------------------------------

def _eh99_numpy(k_h, cosmo, z, d1_of_z):
    """(shape_ratio, g_cb, g_m) — EH99 eqs. 1-24 in plain numpy."""
    om, ob, h, tcmb = (float(cosmo.omega_m0), float(cosmo.omega_b0),
                       float(cosmo.h), float(cosmo.t_cmb))
    m_nu, n_nu = float(cosmo.m_nu), float(cosmo.n_nu)
    omh2, obh2 = om * h * h, ob * h * h
    theta = tcmb / 2.7
    onu = m_nu / (93.14 * h * h)
    fnu = onu / om
    fb = ob / om
    k = np.asarray(k_h) * h  # 1/Mpc

    z_eq = 2.50e4 * omh2 / theta**4
    b1 = 0.313 * omh2**-0.419 * (1.0 + 0.607 * omh2**0.674)
    b2 = 0.238 * omh2**0.223
    z_d = (1291.0 * omh2**0.251 / (1.0 + 0.659 * omh2**0.828)
           * (1.0 + b1 * obh2**b2))
    y_d = (1.0 + z_eq) / (1.0 + z_d)
    s = 44.5 * np.log(9.83 / omh2) / np.sqrt(1.0 + 10.0 * obh2**0.75)

    def p_of(f):
        return (5.0 - np.sqrt(1.0 + 24.0 * f)) / 4.0

    def t_sup(fnu_):
        fc_ = 1.0 - fnu_ - fb
        fcb_ = fc_ + fb
        fnub_ = fnu_ + fb
        pc_, pcb_ = p_of(fc_), p_of(fcb_)
        alpha = (fc_ / fcb_ * (5.0 - 2.0 * (pc_ + pcb_)) / (5.0 - 4.0 * pcb_)
                 * (1.0 + y_d) ** (pcb_ - pc_)
                 * (1.0 - 0.553 * fnub_ + 0.126 * fnub_**3)
                 / (1.0 - 0.193 * np.sqrt(fnu_ * n_nu)
                    + 0.169 * fnu_ * n_nu**0.2)
                 * (1.0 + 0.5 * (pc_ - pcb_)
                    * (1.0 + 1.0 / ((3.0 - 4.0 * pc_) * (7.0 - 4.0 * pcb_)))
                    / (1.0 + y_d)))
        sqa = np.sqrt(alpha)
        gam = omh2 * (sqa + (1.0 - sqa) / (1.0 + (0.43 * k * s) ** 4))
        q_eff = k * theta * theta / gam
        beta_c = 1.0 / (1.0 - 0.949 * fnub_)
        ell = np.log(np.e + 1.84 * beta_c * sqa * q_eff)
        c = 14.4 + 325.0 / (1.0 + 60.5 * q_eff**1.11)
        return ell / (ell + c * q_eff * q_eff)

    q = k * theta * theta / omh2
    q_nu = 3.92 * q * np.sqrt(n_nu) / fnu
    bump = 1.0 + (1.24 * fnu**0.64 * n_nu ** (0.3 + 0.6 * fnu)
                  / (q_nu**-1.6 + q_nu**0.8))
    shape = t_sup(fnu) * bump / t_sup(0.0)

    fcb = 1.0 - fnu
    pcb = p_of(fcb)
    y_fs = (17.2 * fnu * (1.0 + 0.488 * fnu ** (-7.0 / 6.0))
            * (n_nu * q / fnu) ** 2)
    d1 = (1.0 + z_eq) * d1_of_z(z)
    core = (d1 / (1.0 + y_fs)) ** 0.7
    g_cb = (1.0 + core) ** (pcb / 0.7) * d1 ** (1.0 - pcb) / d1
    g_m = ((fcb ** (0.7 / pcb) + core) ** (pcb / 0.7)
           * d1 ** (1.0 - pcb) / d1)
    return shape, g_cb, g_m


def test_numpy_referee():
    """jnp implementation == independent numpy transcription."""
    def d_un(z):
        a = 1.0 / (1.0 + z)
        return float(background._growth_unnorm(C0, jnp.asarray(a), 64))

    for z in (0.0, 0.7):
        shape_np, gcb_np, gm_np = _eh99_numpy(np.asarray(K), CNU, z, d_un)
        shape = np.asarray(neutrino.shape_ratio(CNU, K))
        g_cb, g_m = map(np.asarray, neutrino.growth_ratios(CNU, K, z))
        np.testing.assert_allclose(shape, shape_np, rtol=1e-12)
        np.testing.assert_allclose(g_cb, gcb_np, rtol=1e-12)
        np.testing.assert_allclose(g_m, gm_np, rtol=1e-12)


def test_asymptotes_and_physics():
    fnu = float(CNU.f_nu)
    fcb = 1.0 - fnu
    pcb = (5.0 - np.sqrt(1.0 + 24.0 * fcb)) / 4.0
    d1 = float(neutrino._d1_eh99(CNU, 0.0, 64))
    g_cb, g_m = neutrino.growth_ratios(CNU, jnp.asarray([1e4]), 0.0)
    # Small-scale closed forms.
    np.testing.assert_allclose(float(g_cb[0]), d1**-pcb, rtol=1e-4)
    np.testing.assert_allclose(float(g_m[0]), fcb * d1**-pcb, rtol=1e-4)
    # Large scales: no suppression (bump tail is the slowest term, q^1.6).
    s_lo = float(neutrino.suppression(CNU, jnp.asarray(1e-5), 0.0, "m"))
    assert abs(s_lo - 1.0) < 0.01
    # The -8 f_nu rule at high k (power, z=0) within the fit's accuracy.
    s_hi = float(neutrino.suppression(CNU, jnp.asarray(30.0), 0.0, "m"))
    supp = 1.0 - s_hi**2
    assert 6.0 * fnu < supp < 12.0 * fnu
    # cb always above total matter; both <= ~1 at small scales.
    s_m = np.asarray(neutrino.suppression(CNU, K, 0.0, "m"))
    s_cb = np.asarray(neutrino.suppression(CNU, K, 0.0, "cb"))
    assert np.all(s_cb >= s_m)
    # Monotone in m_nu at a small scale.
    vals = [float(neutrino.suppression(replace(C0, m_nu=jnp.asarray(mn)),
                                       jnp.asarray(10.0), 0.0, "m"))
            for mn in (0.06, 0.15, 0.3, 0.6)]
    assert all(a > b for a, b in zip(vals, vals[1:]))
    # More suppression at z=0 than z=2 (free streaming keeps acting).
    s_z2 = float(neutrino.suppression(CNU, jnp.asarray(10.0), 2.0, "m"))
    s_z0 = float(neutrino.suppression(CNU, jnp.asarray(10.0), 0.0, "m"))
    assert s_z0 < s_z2


def test_mnu_zero_reduction_bitwise():
    """m_nu = 0 (the default) leaves every layer bitwise unchanged."""
    c00 = replace(C0, m_nu=jnp.asarray(0.0))  # explicit-array zero
    k = jnp.logspace(-3, 1.5, 32)
    assert np.array_equal(np.asarray(linear.linear_power(C0, k, 0.4)),
                          np.asarray(linear.linear_power(c00, k, 0.4)))
    hp = default_halo()
    m_a = halo.build_halo_model(C0, hp, default_hod(), 0.4)
    m_b = halo.build_halo_model(c00, hp, default_hod(), 0.4)
    pa = halo.powers(C0, hp, m_a, k)
    pb = halo.powers(c00, hp, m_b, k)
    for key in pa:
        assert np.array_equal(np.asarray(pa[key]), np.asarray(pb[key])), key
    assert np.array_equal(np.asarray(nlpower.halofit_power(C0, k, 0.4)),
                          np.asarray(nlpower.halofit_power(c00, k, 0.4)))


def test_sigma8_closure_and_species():
    """sigma_8 normalizes TOTAL matter at z=0 even at m_nu > 0; the cb
    spectrum sits above total matter at small scales."""
    np.testing.assert_allclose(float(linear.sigma_r(CNU, 8.0, 0.0)),
                               float(CNU.sigma_8), rtol=1e-12)
    k = jnp.logspace(-1, 2, 16)
    p_m = linear.linear_power(CNU, k, 0.0, species="m")
    p_cb = linear.linear_power(CNU, k, 0.0, species="cb")
    assert np.all(np.asarray(p_cb) >= np.asarray(p_m))


def test_halo_rescale_consistency():
    """powers() matter-leg rescale: P_gm^2 / (P_mm P_gg) is m_nu-
    invariant (the r factors cancel), and the 2-halo limit of P_mm
    equals the species="m" linear power."""
    hp = default_halo()
    k = jnp.logspace(-3, 1.0, 24)
    m0 = halo.build_halo_model(C0, hp, default_hod(), 0.4)
    mn = halo.build_halo_model(CNU, hp, default_hod(), 0.4)
    p0 = halo.powers(C0, hp, m0, k)
    pn = halo.powers(CNU, hp, mn, k)
    # r cancels in the gm^2/(mm gg) combination => equals the cb-sector
    # combination; compare nu-run vs the same combination built with the
    # rescales stripped (divide them back out).
    r = np.asarray(neutrino.m_over_cb(CNU, k, mn.mass.z, 64))
    comb_nu = np.asarray(pn["power_gm"])**2 / (
        np.asarray(pn["power_mm"]) * np.asarray(pn["power_gg"]))
    comb_cb = (np.asarray(pn["power_gm"]) / r)**2 / (
        (np.asarray(pn["power_mm"]) / r**2) * np.asarray(pn["power_gg"]))
    np.testing.assert_allclose(comb_nu, comb_cb, rtol=1e-12)
    # Large-scale limit of the 2-HALO part: P_mm minus the (rescaled)
    # 1-halo white-noise floor -> linear species="m" (h_m -> 1 exactly
    # by the finite-range bias renormalization).
    pp_mm, _, _ = halo.one_halo_integrals(CNU, hp, mn, k[:3])
    p_lin_m = np.asarray(linear.linear_power(CNU, k[:3], mn.mass.z,
                                             species="m"))
    two_halo = np.asarray(pn["power_mm"][:3]) - r[:3]**2 * np.asarray(pp_mm)
    np.testing.assert_allclose(two_halo, p_lin_m, rtol=2e-3)
    # And the dict's linear_power entry IS the total-matter linear power.
    np.testing.assert_allclose(
        np.asarray(pn["linear_power"]),
        np.asarray(linear.linear_power(CNU, k, mn.mass.z, species="m")),
        rtol=1e-12)


def test_gradients_and_vmap():
    k = jnp.asarray(5.0)
    # d/d(other params) at m_nu = 0 must be clean (where-guard trap).
    g = jax.grad(lambda om: linear.linear_power(
        replace(C0, omega_m0=om), k, 0.0))(jnp.asarray(0.278))
    assert np.isfinite(float(g))
    # d/dm_nu finite at m_nu > 0, zero by construction at m_nu = 0.
    f = lambda mn: linear.linear_power(replace(C0, m_nu=mn), k, 0.0)
    assert np.isfinite(float(jax.grad(f)(jnp.asarray(0.1))))
    assert float(jax.grad(f)(jnp.asarray(0.0))) == 0.0
    # vmap over a batch including m_nu = 0.
    out = jax.vmap(f)(jnp.asarray([0.0, 0.06, 0.3]))
    assert np.all(np.isfinite(np.asarray(out)))
    # Batch entry 0 equals the unbatched default bitwise.
    assert float(out[0]) == float(linear.linear_power(C0, k, 0.0))


@pytest.mark.slow
def test_pipeline_with_neutrinos():
    """make_pipeline runs at m_nu > 0; m_nu = 0 batch entry matches the
    baseline pipeline bitwise."""
    from chomp_tpu import projection
    from chomp_tpu.parallel import broadcast_cosmo, make_pipeline
    from chomp_tpu.params import GridSpec

    grid = GridSpec(n_k=64, n_k_table=256, sigma_panels=4,
                    sigma_n_per_panel=16, n_growth=16, n_dist=16,
                    n_mass=64, n_z_proj=16, n_z_lens=16, n_ell=64,
                    n_theta=8, n_z_dndz=32, n_mu=8, lattice_dln=0.064)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(0.5), sigma_z=jnp.asarray(0.1))
    fn = make_pipeline(default_halo(), default_hod(), dist, grid=grid)
    base = fn(C0)
    b = np.asarray(base["w_theta"] if isinstance(base, dict) else base)
    # Unbatched explicit-array zero: bitwise identical (the no-op claim).
    zero = fn(replace(C0, m_nu=jnp.asarray(0.0)))
    z = np.asarray(zero["w_theta"] if isinstance(zero, dict) else zero)
    assert np.array_equal(z, b)
    # Vmapped batch: entry 0 agrees to fusion-reorder noise only (vmap
    # compiles a DIFFERENT program — bitwise equality is not a property
    # of XLA across batched/unbatched compiles), entry 1 genuinely moves.
    batch = broadcast_cosmo(C0, m_nu=jnp.asarray([0.0, 0.3]))
    out = jax.vmap(fn)(batch)
    w = np.asarray(out["w_theta"] if isinstance(out, dict) else out)
    assert np.all(np.isfinite(w))
    np.testing.assert_allclose(w[0], b, rtol=1e-10)
    assert np.max(np.abs(w[1] / b - 1.0)) > 1e-3


@pytest.mark.slow
def test_mnu_inference_and_exact_z():
    """m_nu is a first-class sampled parameter (Fisher through the
    pipeline is finite and informative), and the exact-z anchor route
    (which carries the full k-dependent suppression evolution through
    per-anchor halo builds) runs at m_nu > 0 and differs from the
    pivot-frozen separable route."""
    from chomp_tpu import inference, projection
    from chomp_tpu.parallel import make_pipeline
    from chomp_tpu.params import GridSpec

    grid = GridSpec(n_k=64, n_k_table=256, sigma_panels=4,
                    sigma_n_per_panel=16, n_growth=16, n_dist=16,
                    n_mass=64, n_z_proj=16, n_z_lens=16, n_ell=64,
                    n_theta=8, n_z_dndz=32, n_mu=8, lattice_dln=0.064)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(0.5), sigma_z=jnp.asarray(0.1))
    fid = replace(C0, m_nu=jnp.asarray(0.1))
    with pytest.warns(UserWarning):
        fn = make_pipeline(default_halo(), default_hod(), dist, grid=grid)
        fn_ex = make_pipeline(default_halo(), default_hod(), dist,
                              grid=grid, exact_z_anchors=4)
    pick = lambda o: (o["w_theta"] if isinstance(o, dict) else o)
    theory, p0 = inference.make_theory_fn(
        lambda c: pick(fn(c)), fid,
        cosmo_names=("omega_m0", "sigma_8", "m_nu"))
    d0 = np.asarray(theory(p0))
    F = np.asarray(inference.fisher_matrix(
        theory, np.diag((0.05 * d0) ** 2), p0))
    assert np.all(np.isfinite(F))
    assert F[2, 2] > 0.0  # m_nu is constrained
    # marginalized sigma(m_nu) is finite (F invertible)
    sig = np.sqrt(np.diag(np.linalg.inv(F)))
    assert np.all(np.isfinite(sig)) and np.all(sig > 0)
    # Exact-z route at m_nu > 0: finite, and the z-evolving suppression
    # makes it differ from the pivot-frozen separable route.
    w_sep = np.asarray(pick(fn(fid)))
    w_ex = np.asarray(pick(fn_ex(fid)))
    assert np.all(np.isfinite(w_ex))
    assert np.max(np.abs(w_ex / w_sep - 1.0)) > 1e-3
