"""NFW halo profiles: concentration, virial radius, Fourier transform.

TPU-native replacement for the NFW internals of the reference's
``halo.py`` (upstream:halo.py ``Halo.y``, ``Halo.concentration``,
``Halo.virial_radius``; SURVEY.md §2 row 6, Appendix B.6):

  y(k, M) = [sin x (Si((1+c)x) - Si(x)) - sin(c x)/((1+c) x)
             + cos x (Ci((1+c)x) - Ci(x))] / mu(c),
  x = k r_s,  mu(c) = ln(1+c) - c/(1+c),

with c(M) = c0/(1+z) (M/M*)^beta and r_v = (3M/(4 pi rho_bar Delta_v))^(1/3)
(Delta_v w.r.t. MEAN density — Appendix A.6/C.4 convention;
``halo.delta_v = -1`` selects the cosmology's Bryan-Norman fit).

Everything is elementwise over broadcastable (k, M) — callers build the
(n_k, n_M) mesh once and the whole y-matrix is a single fused VPU
computation through the JAX-native Si/Ci (chomp_tpu.special).

Oracle targets: Appendix A.6 / tests/goldens.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import background
from chomp_tpu.params import CosmoParams, HaloParams
from chomp_tpu.special import aux_fg, aux_fm, aux_g, si_ci  # noqa: F401


def concentration(halo: HaloParams, m, m_star, z=0.0):
    """c(M) = c0/(1+z) (M/M*)^beta (chomp ``Halo.concentration``)."""
    return halo.c0 / (1.0 + jnp.asarray(z)) * (jnp.asarray(m) / m_star) ** halo.beta


def halo_delta_v(cosmo: CosmoParams, halo: HaloParams, z=0.0):
    """Virial overdensity: halo_dict value if > 0, else one of the fit
    conventions by sentinel (HaloParams docstring; chomp's ``delta_v=-1``
    "use the cosmology's fit" mode, with the fit form made switchable
    because the upstream formula is [M]-confidence — SURVEY.md C.4):
    -1 Bryan-Norman, -2 Nakamura-Suto, -3 fixed 18 pi^2."""
    dv = jnp.asarray(halo.delta_v)
    fit = jnp.where(
        dv > -1.5, background.delta_v(cosmo, z),
        jnp.where(dv > -2.5, background.delta_v_ns97(cosmo, z),
                  18.0 * jnp.pi**2))
    return jnp.where(dv > 0.0, dv, fit)


def virial_radius(cosmo: CosmoParams, halo: HaloParams, m, z=0.0):
    """r_v = (3M/(4 pi rho_bar Delta_v))^(1/3), Mpc/h (chomp
    ``Halo.virial_radius``)."""
    dv = halo_delta_v(cosmo, halo, z)
    return (3.0 * jnp.asarray(m) / (4.0 * jnp.pi * cosmo.rho_bar * dv)) ** (1.0 / 3.0)


def virial_mass(cosmo: CosmoParams, halo: HaloParams, r, z=0.0):
    """Inverse of :func:`virial_radius` (chomp ``Halo.virial_mass``)."""
    dv = halo_delta_v(cosmo, halo, z)
    return 4.0 * jnp.pi / 3.0 * cosmo.rho_bar * dv * jnp.asarray(r) ** 3


def y_nfw(cosmo: CosmoParams, halo: HaloParams, k, m, m_star, z=0.0,
          c_scale=None, k_scale=None):
    """Normalized NFW Fourier transform y(k, M), truncated at r_vir
    (Appendix B.6 closed form; y -> 1 as k -> 0).

    ``k`` and ``m`` broadcast elementwise — pass ``k[:, None]`` and
    ``m[None, :]`` for the (n_k, n_M) matrix.

    Numerics: the textbook form sin(x)(Si((1+c)x) - Si(x)) + ... loses
    ~x*eps relative accuracy at large x (both Si -> pi/2 — catastrophic
    in float32, where it cost 4% in P(k) at high k).  The exact
    auxiliary-function identity used here,

      y mu(c) = g(x) + sin(c x) (f - 1/.)((1+c)x) - cos(c x) g((1+c)x),

    is cancellation-free at every scale (verified to agree with the
    textbook form to ~1e-14 in float64 and to track float64 to ~1e-6 in
    float32).

    ``c_scale``/``k_scale`` (default None = untouched path): baryon-
    feedback hooks for the MATTER profile (CosmoParams.bary_c /
    bary_eta) — c(M) is multiplied by ``c_scale`` (same mass inside the
    unchanged r_vir, redistributed) and the profile is evaluated at
    ``k_scale * k`` (HMcode-style nu^eta halo bloating)."""
    k = jnp.asarray(k)
    m = jnp.asarray(m)
    if k_scale is not None:
        k = k * k_scale
    c = concentration(halo, m, m_star, z)
    if c_scale is not None:
        c = c * c_scale
    rv = virial_radius(cosmo, halo, m, z)
    rs = rv / c
    x = k * rs
    b = (1.0 + c) * x
    g_a = aux_g(x)
    g_b = aux_g(b)
    fm_b = aux_fm(b)
    mu = jnp.log(1.0 + c) - c / (1.0 + c)
    cx = c * x
    return (g_a + jnp.sin(cx) * fm_b - jnp.cos(cx) * g_b) / mu
