"""Massive-neutrino linear power: EH99 suppression + free-streaming growth.

Capability extension beyond chomp (upstream:cosmology.py has no neutrino
sector; SURVEY.md §2 row 2 covers EH98 only): every modern survey
analysis samples the summed neutrino mass, so the framework carries
``CosmoParams.m_nu`` (Σm_ν in eV, a TRACED leaf — vmap/grad/HMC over it
like any other parameter) and applies the Eisenstein & Hu 1999
(ApJ 511, 5; astro-ph/9710252) mixed dark matter fitting formulas as a
multiplicative correction on the framework's EH98 baseline:

    P_X(k, z) = P_EH98(k, z) * S_X(k, z)^2,
    S_X(k, z) = [T_sup(k; f_ν) B(k) / T_sup(k; f_ν=0)] * D_X(k, z)/D_1(z)

for species X ∈ {"cb" (CDM+baryon — the field halos, galaxies and the
mass function live in), "m" (total matter — what lensing sees)}.  The
shape ratio isolates the EH99 neutrino effect (so it composes with
either EH98 variant, no-wiggle or full BAO — the ν damping of the
wiggles themselves is neglected, a sub-percent effect at f_ν ≲ 0.05);
the growth ratio D_X(k, z)/D_1(z) is EH99's scale-dependent
free-streaming suppression (their eqs. 11-14), built on the framework's
EXACT integral growth rather than the paper's Ω_m(z)-fit approximation.

Species conventions (documented approximations, all exact at m_ν = 0):
  - ``omega_m0`` remains TOTAL matter (cb+ν) — the expansion history,
    lensing prefactors (Ω_m in the convergence window) and ρ̄ (hence
    halo mass definitions M(R)) are unchanged.  σ(M), ν(M), the mass
    function and halo bias switch to the cb spectrum (the modern
    standard — Costanzi et al. 2013; neutrinos do not participate in
    collapse).
  - ``sigma_8`` normalizes the TOTAL-matter spectrum at z=0 (the
    convention samplers expect).
  - halo-model spectra: built in the cb sector, matter legs rescaled by
    r(k, z) = D_cbν/D_cb per leg at the output (P_mm × r², P_gm × r,
    P_gg unchanged) — exact in the 2-halo regime, and the correct
    small-scale limit P_mm → f_cb² P_cb (neutrinos never cluster in
    halos).  halofit runs its σ_G/k_σ machinery on the cb spectrum with
    the same r² output rescale.
  - connected (trispectrum/SSC) covariance legs keep the total-matter
    spectrum: an O(f_ν) effect on covariance CORRECTION terms — noted,
    not modeled.

Accuracy: EH99 quote better than a few % in the suppression regime for
f_ν ≲ 0.1; the tests referee an independent numpy transcription plus
the analytic asymptotes (small-scale growth ratio → f_cb D_1^{-p_cb},
the ≈ −(8–10) f_ν total power suppression, monotonicity, exact f_ν = 0
reduction bitwise).

Gradient note: the m_ν = 0 reduction uses a ``jnp.where`` guard with a
safe interior value, so gradients w.r.t. every OTHER parameter are
clean at m_ν = 0; ∂/∂m_ν AT exactly m_ν = 0 is zero by construction
(sample m_ν > 0, as physical priors do).
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import background
from chomp_tpu.params import CosmoParams

__all__ = ["f_nu_of", "shape_ratio", "growth_ratios", "suppression",
           "m_over_cb"]

#: Ω_ν h² = Σm_ν [eV] / 93.14 (standard thermal relic conversion).
NU_MASS_TO_OMEGA_H2 = 1.0 / 93.14

_E = 2.718281828459045


def f_nu_of(cosmo: CosmoParams):
    """Neutrino mass fraction f_ν = Ω_ν/Ω_m (0 when m_nu = 0)."""
    onu = jnp.asarray(getattr(cosmo, "m_nu", 0.0)) * NU_MASS_TO_OMEGA_H2 / (
        cosmo.h ** 2)
    return onu / cosmo.omega_m0


def _safe_fractions(cosmo: CosmoParams):
    """(active, f_nu_safe, f_b, n_nu): where-guarded fractions.

    ``f_nu_safe`` equals f_ν where m_ν > 0 and a benign 0.01 elsewhere,
    so the EH99 expressions (which divide by f_ν and raise f_cb to
    0.7/p_cb powers) never produce NaN/Inf in the untaken branch — the
    classic jnp.where gradient trap."""
    fnu = f_nu_of(cosmo)
    active = fnu > 0.0
    fnu_s = jnp.where(active, fnu, 0.01)
    fb = cosmo.omega_b0 / cosmo.omega_m0
    n_nu = jnp.asarray(getattr(cosmo, "n_nu", 3.0))
    return active, fnu_s, fb, n_nu


def _p_of_f(f):
    """EH99 eq. 11: p = (5 - sqrt(1 + 24 f))/4 (growth exponent)."""
    return (5.0 - jnp.sqrt(1.0 + 24.0 * f)) / 4.0


def _z_eq(cosmo: CosmoParams):
    theta = cosmo.t_cmb / 2.7
    return 2.50e4 * cosmo.omega_m0 * cosmo.h ** 2 / theta ** 4


def _alpha_nu(cosmo: CosmoParams, fnu, fb, n_nu):
    """EH99 eq. 15 small-scale suppression amplitude α_ν(f_ν, f_b)."""
    omh2 = cosmo.omega_m0 * cosmo.h ** 2
    obh2 = cosmo.omega_b0 * cosmo.h ** 2
    fc = 1.0 - fnu - fb
    fcb = fc + fb
    fnub = fnu + fb
    pc = _p_of_f(fc)
    pcb = _p_of_f(fcb)
    # Drag epoch (EH98 eq. 4 fit, shared by EH99 eq. 2).
    b1 = 0.313 * omh2 ** -0.419 * (1.0 + 0.607 * omh2 ** 0.674)
    b2 = 0.238 * omh2 ** 0.223
    z_d = (1291.0 * omh2 ** 0.251 / (1.0 + 0.659 * omh2 ** 0.828)
           * (1.0 + b1 * obh2 ** b2))
    y_d = (1.0 + _z_eq(cosmo)) / (1.0 + z_d)
    alpha = (fc / fcb
             * (5.0 - 2.0 * (pc + pcb)) / (5.0 - 4.0 * pcb)
             * (1.0 + y_d) ** (pcb - pc)
             * (1.0 - 0.553 * fnub + 0.126 * fnub ** 3)
             / (1.0 - 0.193 * jnp.sqrt(jnp.maximum(fnu * n_nu, 1e-30))
                + 0.169 * fnu * n_nu ** 0.2)
             * (1.0 + 0.5 * (pc - pcb)
                * (1.0 + 1.0 / ((3.0 - 4.0 * pc) * (7.0 - 4.0 * pcb)))
                / (1.0 + y_d)))
    return alpha, pcb


def _t_sup(cosmo: CosmoParams, k_h, fnu, fb, n_nu):
    """EH99 eqs. 16-21: suppressed master shape T_sup(k) (no ν bump).

    ``k_h`` in h/Mpc (API convention); internal k in 1/Mpc, sound
    horizon s in Mpc, matching the framework's EH98 conventions
    (SURVEY.md Appendix C.6)."""
    k = jnp.asarray(k_h) * cosmo.h  # 1/Mpc
    omh2 = cosmo.omega_m0 * cosmo.h ** 2
    obh2 = cosmo.omega_b0 * cosmo.h ** 2
    theta = cosmo.t_cmb / 2.7
    fnub = fnu + fb
    s = 44.5 * jnp.log(9.83 / omh2) / jnp.sqrt(1.0 + 10.0 * obh2 ** 0.75)
    alpha, _pcb = _alpha_nu(cosmo, fnu, fb, n_nu)
    sqa = jnp.sqrt(alpha)
    gamma_eff = omh2 * (sqa + (1.0 - sqa) / (1.0 + (0.43 * k * s) ** 4))
    q_eff = k * theta * theta / gamma_eff
    beta_c = 1.0 / (1.0 - 0.949 * fnub)
    ell = jnp.log(_E + 1.84 * beta_c * sqa * q_eff)
    c = 14.4 + 325.0 / (1.0 + 60.5 * q_eff ** 1.11)
    return ell / (ell + c * q_eff * q_eff)


def shape_ratio(cosmo: CosmoParams, k_h):
    """[T_sup(f_ν) B(k)] / T_sup(f_ν = 0): the z-independent part of the
    EH99 correction.  Exactly 1.0 where m_ν = 0."""
    active, fnu, fb, n_nu = _safe_fractions(cosmo)
    k = jnp.asarray(k_h) * cosmo.h
    theta = cosmo.t_cmb / 2.7
    omh2 = cosmo.omega_m0 * cosmo.h ** 2
    q = k * theta * theta / omh2
    # EH99 eqs. 22-23: the ν-induced bump near the free-streaming scale.
    q_nu = 3.92 * q * jnp.sqrt(n_nu) / fnu
    bump = 1.0 + (1.24 * fnu ** 0.64 * n_nu ** (0.3 + 0.6 * fnu)
                  / (q_nu ** -1.6 + q_nu ** 0.8))
    ratio = (_t_sup(cosmo, k_h, fnu, fb, n_nu) * bump
             / _t_sup(cosmo, k_h, jnp.zeros_like(fnu), fb, n_nu))
    return jnp.where(active, ratio, 1.0)


def _d1_eh99(cosmo: CosmoParams, z, n_growth: int):
    """EH99's growth variable D_1(z) = (1+z_eq) · D_un(a): the exact
    integral growth normalized to a/a_eq at early times (D_un(a) → a as
    a → 0 for any (w0, wa, Ω_k), see background._growth_unnorm)."""
    a = 1.0 / (1.0 + jnp.asarray(z))
    return (1.0 + _z_eq(cosmo)) * background._growth_unnorm(cosmo, a, n_growth)


def growth_ratios(cosmo: CosmoParams, k_h, z, n_growth: int = 64):
    """(D_cb/D_1, D_cbν/D_1) at (k, z) — EH99 eqs. 12-14.  Both exactly
    1.0 where m_ν = 0; both → D_1^{-p_cb}·(1 or f_cb) as k → ∞."""
    active, fnu, fb, n_nu = _safe_fractions(cosmo)
    fcb = 1.0 - fnu
    pcb = _p_of_f(fcb)
    theta = cosmo.t_cmb / 2.7
    omh2 = cosmo.omega_m0 * cosmo.h ** 2
    q = jnp.asarray(k_h) * cosmo.h * theta * theta / omh2
    y_fs = (17.2 * fnu * (1.0 + 0.488 * fnu ** (-7.0 / 6.0))
            * (n_nu * q / fnu) ** 2)
    d1 = _d1_eh99(cosmo, z, n_growth)
    core = (d1 / (1.0 + y_fs)) ** 0.7
    d_cb = (1.0 + core) ** (pcb / 0.7) * d1 ** (1.0 - pcb)
    d_cbnu = ((fcb ** (0.7 / pcb) + core) ** (pcb / 0.7)
              * d1 ** (1.0 - pcb))
    one = jnp.ones_like(core)
    return (jnp.where(active, d_cb / d1, one),
            jnp.where(active, d_cbnu / d1, one))


def suppression(cosmo: CosmoParams, k_h, z, species: str = "m",
                n_growth: int = 64):
    """S_X(k, z): multiply the EH98 transfer by this (and the power by
    its square).  ``species``: "m" (total matter) or "cb" (CDM+baryon).
    Identically 1.0 where m_ν = 0 (bitwise-safe on the default path)."""
    if species not in ("m", "cb"):
        raise ValueError(f"species must be 'm' or 'cb', got {species!r}")
    g_cb, g_m = growth_ratios(cosmo, k_h, z, n_growth)
    g = g_m if species == "m" else g_cb
    return shape_ratio(cosmo, k_h) * g


def m_over_cb(cosmo: CosmoParams, k_h, z, n_growth: int = 64):
    """r(k, z) = D_cbν/D_cb: the per-matter-leg output rescale taking a
    cb-sector spectrum to the total-matter one (halo.powers applies
    P_mm × r², P_gm × r).  Identically 1.0 where m_ν = 0."""
    g_cb, g_m = growth_ratios(cosmo, k_h, z, n_growth)
    return g_m / g_cb
