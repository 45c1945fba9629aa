"""BAO observables (chomp_tpu.bao) + the factored sound horizon.

Referees: an independent numpy transcription of EH98 eqs. 2-6, the
D_V definition identity, low-z limits, internal consistency with the
transfer's wiggle positions (the refactor must not move them), and
grad/vmap cleanliness.

upstream: no counterpart (chomp has no BAO likelihood surface).
"""

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, bao, linear
from chomp_tpu.params import C_OVER_H0, default_cosmo
from chomp_tpu.utils.tree import replace

C0 = default_cosmo()


def test_sound_horizon_numpy_referee():
    om, ob, h, tcmb = (float(C0.omega_m0), float(C0.omega_b0),
                       float(C0.h), float(C0.t_cmb))
    omh2, obh2 = om * h * h, ob * h * h
    theta = tcmb / 2.7
    z_eq = 2.50e4 * omh2 / theta**4
    k_eq = 7.46e-2 * omh2 / theta**2
    b1 = 0.313 * omh2**-0.419 * (1 + 0.607 * omh2**0.674)
    b2 = 0.238 * omh2**0.223
    z_d = (1291.0 * omh2**0.251 / (1 + 0.659 * omh2**0.828)
           * (1 + b1 * obh2**b2))
    r = lambda z: 31.5 * obh2 / theta**4 * (1e3 / z)
    s = (2.0 / (3.0 * k_eq) * np.sqrt(6.0 / r(z_eq))
         * np.log((np.sqrt(1 + r(z_d)) + np.sqrt(r(z_d) + r(z_eq)))
                  / (1 + np.sqrt(r(z_eq)))))
    np.testing.assert_allclose(float(linear.sound_horizon_drag(C0)), s,
                               rtol=1e-14)
    # Sane magnitude (Planck-ish cosmology: ~147 Mpc).
    assert 130.0 < s < 170.0
    np.testing.assert_allclose(float(bao.r_drag(C0)), s * float(C0.h),
                               rtol=1e-14)


def test_transfer_unchanged_by_refactor():
    """The with_bao transfer still positions its wiggles at the same s
    (golden-free spot check vs the committed linear-power goldens is in
    test_linear; here just finiteness + BAO presence)."""
    k = jnp.logspace(-2, 0, 256)
    t_w = np.asarray(linear.transfer_eh_full(C0, k))
    t_nw = np.asarray(linear.transfer_nowiggle(C0, k))
    assert np.all(np.isfinite(t_w))
    osc = t_w / t_nw - 1.0
    assert np.max(osc) > 0.005 and np.min(osc) < -0.005  # wiggles exist


def test_bao_vector_identities():
    z = jnp.asarray([0.15, 0.51, 0.85, 1.48, 2.33])
    v = np.asarray(bao.bao_vector(C0, z))
    dm, dh, dv = v
    rd = float(bao.r_drag(C0))
    # D_V identity.
    np.testing.assert_allclose(
        dv, (np.asarray(z) * dm**2 * dh * rd**3) ** (1.0 / 3.0) / rd,
        rtol=1e-12)
    # Low-z: D_M -> (c/H0) z, D_H -> c/H0.
    z0 = 1e-4
    v0 = np.asarray(bao.bao_vector(C0, jnp.asarray([z0])))
    np.testing.assert_allclose(v0[0, 0], float(C_OVER_H0) * z0 / rd,
                               rtol=1e-3)
    np.testing.assert_allclose(v0[1, 0], float(C_OVER_H0) / rd, rtol=1e-3)
    # Monotone D_M, decreasing D_H.
    assert np.all(np.diff(dm) > 0) and np.all(np.diff(dh) < 0)
    # Curvature/CPL path traced and finite.
    c_open = replace(C0, omega_l0=jnp.asarray(0.65), w0=jnp.asarray(-0.9),
                     wa=jnp.asarray(0.2))
    vo = np.asarray(bao.bao_vector(c_open, z))
    assert np.all(np.isfinite(vo)) and not np.allclose(vo, v)


def test_grad_vmap():
    z = jnp.asarray([0.51, 1.48])
    g = jax.grad(lambda om: bao.bao_vector(
        replace(C0, omega_m0=om, omega_l0=1.0 - om), z)[2, 0])(
        jnp.asarray(0.278))
    # Sign is parameter-dependent (D_V and r_d BOTH shrink with omega_m);
    # require a finite, nonzero sensitivity only.
    assert np.isfinite(float(g)) and float(g) != 0.0
    out = jax.vmap(lambda om: bao.bao_vector(
        replace(C0, omega_m0=om, omega_l0=1.0 - om), z))(
        jnp.asarray([0.25, 0.278, 0.31]))
    assert np.all(np.isfinite(np.asarray(out)))


def test_damped_power_template():
    """Limits: sigma -> 0 reduces to the full wiggle spectrum;
    sigma -> large leaves only the no-wiggle shape; mu anisotropy
    interpolates between sigma_perp (mu=0) and sigma_par (mu=1); the
    isotropic case equals the angle-average Sigma^2; traced gradients
    flow through the damping scales."""
    from chomp_tpu import bao, linear

    c = default_cosmo()
    k = jnp.asarray(np.logspace(-2, 0, 40))
    p_w = np.asarray(linear.linear_power(c, k, 0.0, True))
    p_nw = np.asarray(linear.linear_power(c, k, 0.0, False))
    t0 = np.asarray(bao.damped_power_template(c, k, sigma_par=0.0,
                                              sigma_perp=0.0))
    np.testing.assert_allclose(t0, p_w, rtol=1e-12)
    t_inf = np.asarray(bao.damped_power_template(c, k, sigma_par=300.0,
                                                 sigma_perp=300.0))
    np.testing.assert_allclose(t_inf[k > 0.05], p_nw[k > 0.05],
                               rtol=1e-6)
    t_mu = np.asarray(bao.damped_power_template(
        c, k, mu=jnp.asarray([0.0, 1.0]), sigma_par=12.0,
        sigma_perp=4.0))
    ref_perp = p_nw + (p_w - p_nw) * np.exp(
        -0.5 * np.asarray(k) ** 2 * 16.0)
    ref_par = p_nw + (p_w - p_nw) * np.exp(
        -0.5 * np.asarray(k) ** 2 * 144.0)
    np.testing.assert_allclose(t_mu[:, 0], ref_perp, rtol=1e-10)
    np.testing.assert_allclose(t_mu[:, 1], ref_par, rtol=1e-10)
    iso = np.asarray(bao.damped_power_template(c, k, sigma_par=12.0,
                                               sigma_perp=4.0))
    s2 = (144.0 + 2 * 16.0) / 3.0
    ref_iso = p_nw + (p_w - p_nw) * np.exp(-0.5 * np.asarray(k)**2 * s2)
    np.testing.assert_allclose(iso, ref_iso, rtol=1e-10)

    g = jax.grad(lambda s: jnp.sum(bao.damped_power_template(
        c, k, sigma_par=s, sigma_perp=4.0)))(10.0)
    assert np.isfinite(float(g)) and float(g) != 0.0
