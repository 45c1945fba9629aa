"""Background cosmology: E(z), distances, growth, characteristic densities.

TPU-native replacement for the background half of the reference's
``cosmology.SingleEpoch`` / ``MultiEpoch`` (upstream:cosmology.py;
SURVEY.md §2 rows 2-3, §3.2, Appendix B.1): chomp's per-quantity adaptive
Romberg quadratures become fixed-order Gauss-Legendre contractions with
array-valued limits, so chi(z)/D(z) evaluate for whole z *arrays* (and,
via vmap, whole cosmology batches) in one fused XLA computation.

Conventions (SURVEY.md Appendix B/C, oracle Appendix A.1):
  - distances in Mpc/h, c/H0 = 2997.92458 Mpc/h;
  - growth D(a) = (5 om/2) E(a) ∫_0^a da'/(a' E(a'))^3, D(z=0) = 1;
  - delta_c = 0.15 (12 pi)^(2/3) Omega_m(z)^0.0055  (NFW97 fit);
  - delta_v = Bryan-Norman 1998 fit w.r.t. MEAN density (App. A.6/C.4);
  - dark energy via CPL (w0, wa) in E(z); the growth integral keeps the
    standard LCDM-form integrand with the generalized E(a), matching the
    reference's approach (SURVEY.md §2 "w0/wa support in E(z) [M]").
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu.grids import gl_integrate
from chomp_tpu.params import C_OVER_H0, CosmoParams


def e2z(cosmo: CosmoParams, z):
    """E^2(z) = H^2(z)/H0^2."""
    zp1 = 1.0 + jnp.asarray(z)
    de = cosmo.omega_l0 * zp1 ** (3.0 * (1.0 + cosmo.w0 + cosmo.wa)) * jnp.exp(
        -3.0 * cosmo.wa * (1.0 - 1.0 / zp1)
    )
    return cosmo.omega_m0 * zp1**3 + cosmo.omega_k0 * zp1**2 + de


def ez(cosmo: CosmoParams, z):
    return jnp.sqrt(e2z(cosmo, z))


def omega_m_z(cosmo: CosmoParams, z):
    """Omega_m(z)."""
    zp1 = 1.0 + jnp.asarray(z)
    return cosmo.omega_m0 * zp1**3 / e2z(cosmo, z)


def omega_l_z(cosmo: CosmoParams, z):
    zp1 = 1.0 + jnp.asarray(z)
    de = cosmo.omega_l0 * zp1 ** (3.0 * (1.0 + cosmo.w0 + cosmo.wa)) * jnp.exp(
        -3.0 * cosmo.wa * (1.0 - 1.0 / zp1)
    )
    return de / e2z(cosmo, z)


def comoving_distance(cosmo: CosmoParams, z, n: int = 64):
    """Line-of-sight comoving distance chi(z) in Mpc/h.

    chomp: ``SingleEpoch.comoving_distance`` via Romberg of 1/E
    (SURVEY.md §3.2 quadrature 1); here GL over [0, z] with per-element
    node placement (z may be any array).
    """
    return C_OVER_H0 * gl_integrate(lambda zp: 1.0 / ez(cosmo, zp), 0.0, z, n)


def z_of_chi(cosmo: CosmoParams, chi, n: int = 64, n_iter: int = 8,
             z_seed=None):
    """Gather-free chi -> z inversion by Newton iteration.

    ``jnp.interp`` against a chi(z) table is a dynamic gather — measured
    at ~0.3 ms/cosmology on TPU v5e for the flagship window lattice (the
    single most expensive op in the whole pipeline).  Instead: Newton on
    f(z) = chi(z) - chi with f'(z) = (c/H0)/E(z), seeded from a STATIC
    fiducial inverse (``z_seed``; callers with static query points
    precompute it in numpy) or from the flat-matter-ish closed form.
    chi(z) is monotone and smooth, the seed is within ~20% of the root
    across wide parameter priors, and Newton is quadratic: 8 iterations
    reach float64 roundoff even in the steep z ~ 20 tail for cosmologies
    far from the seed (measured; 4 suffice below z ~ 10).  Cost: n_iter
    vectorized GL-``n`` chi evaluations — pure VPU math, no gathers.
    """
    chi = jnp.asarray(chi)
    if z_seed is None:
        # Crude but monotone seed: invert the small-z expansion
        # chi ~ (c/H0) z and the EdS large-z form; blend smoothly.
        x = chi / C_OVER_H0
        # EdS: chi = 2c/H0/sqrt(om) (1 - 1/sqrt(1+z)).
        eds = 1.0 / jnp.maximum(1.0 - 0.5 * jnp.sqrt(cosmo.omega_m0) * x,
                                1e-3) ** 2 - 1.0
        z = jnp.where(x < 0.3, x * (1.0 + 0.75 * cosmo.omega_m0 * x), eds)
    else:
        z = jnp.asarray(z_seed)
    for _ in range(n_iter):
        f = comoving_distance(cosmo, z, n) - chi
        z = jnp.clip(z - f * ez(cosmo, z) / C_OVER_H0, 0.0, 25.0)
    return z


def transverse_comoving_distance(cosmo: CosmoParams, z, n: int = 64):
    """Comoving transverse distance f_K(chi): handles open/closed via a
    series-safe sinn (flat fiducial reduces to chi exactly)."""
    chi = comoving_distance(cosmo, z, n)
    ok = cosmo.omega_k0
    x = chi / C_OVER_H0
    # sinn(sqrt(|ok|) x)/sqrt(|ok|), Taylor-blended near ok=0.
    s = jnp.sqrt(jnp.abs(ok) + 1e-30)
    open_ = jnp.sinh(s * x) / s
    closed = jnp.sin(s * x) / s
    curved = jnp.where(ok > 0.0, open_, closed)
    return C_OVER_H0 * jnp.where(jnp.abs(ok) < 1e-8, x, curved)


def angular_diameter_distance(cosmo: CosmoParams, z, n: int = 64):
    return transverse_comoving_distance(cosmo, z, n) / (1.0 + jnp.asarray(z))


def luminosity_distance(cosmo: CosmoParams, z, n: int = 64):
    return transverse_comoving_distance(cosmo, z, n) * (1.0 + jnp.asarray(z))


def _growth_unnorm(cosmo: CosmoParams, a, n: int):
    """Un-normalized D(a) = 2.5 om E(a) ∫_0^a da'/(a' E(a'))^3.

    The integrand ~ a'^{3/2} near 0; substituting a' = a u^2 renders it
    ~ u^4 (smooth), restoring spectral GL convergence.
    """
    a = jnp.asarray(a)

    def integrand(u):
        ap = a[..., None] * u * u if a.ndim else a * u * u
        z = 1.0 / ap - 1.0
        e3 = e2z(cosmo, z) * ez(cosmo, z)
        # da' = 2 a u du ; 1/(a'^3 E^3) * da' = 2/(a^2 u^5 E^3) du
        aa = a[..., None] if a.ndim else a
        return 2.0 / (aa * aa * u**5 * e3)

    integral = gl_integrate(integrand, 0.0, jnp.ones_like(a), n)
    z_of_a = 1.0 / a - 1.0
    return 2.5 * cosmo.omega_m0 * ez(cosmo, z_of_a) * integral


def growth_factor(cosmo: CosmoParams, z, n: int = 64):
    """Linear growth D(z), normalized so D(z=0)=1 (chomp
    ``SingleEpoch.growth_factor``; oracle A.1: D(1)=0.61975078)."""
    a = 1.0 / (1.0 + jnp.asarray(z))
    return _growth_unnorm(cosmo, a, n) / _growth_unnorm(cosmo, jnp.asarray(1.0), n)


def growth_rate(cosmo: CosmoParams, z, n: int = 64):
    """Linear growth rate f(z) = dlnD/dlna, differentiating the
    integral form of :func:`growth_factor` analytically:

      D_un(a) = 2.5 Om E(a) I(a),  I(a) = ∫_0^a da'/(a' E)^3
      f = (1/2) dlnE^2/dlna + a I'(a)/I(a)
        = (1/2) dlnE^2/dlna + 2.5 Om / (a^2 E^2 D_un(a)).

    (a I' = 1/(a^2 E^3); the last form reuses D_un = 2.5 Om E I.)
    Matches Omega_m(z)^0.55 to ~2e-3 for LCDM; exact for the integral-
    form growth, i.e. consistent with what the separable pipelines use.
    Capability extension beyond chomp (no upstream counterpart) — the
    RSD kernel of the non-Limber module consumes it."""
    z = jnp.asarray(z)
    a = 1.0 / (1.0 + z)
    d_un = _growth_unnorm(cosmo, a, n)
    return (0.5 * _dln_e2_dlna(cosmo, a)
            + 2.5 * cosmo.omega_m0 / (a * a * e2z(cosmo, z) * d_un))


#: EdS spherical-collapse threshold (3/20)(12 pi)^(2/3).
DELTA_C_EDS = 0.15 * (12.0 * jnp.pi) ** (2.0 / 3.0)


def delta_c(cosmo: CosmoParams, z=0.0):
    """Spherical-collapse threshold, NFW97 fit (chomp form, SURVEY.md
    App. B.3): 0.15 (12 pi)^(2/3) Omega_m(z)^0.0055."""
    return DELTA_C_EDS * omega_m_z(cosmo, z) ** 0.0055


def delta_c_ks96(cosmo: CosmoParams, z=0.0):
    """Kitayama-Suto 1996 threshold fit (alternative convention —
    selected by ``HaloParams.delta_c = -2``):
    (3/20)(12 pi)^(2/3) (1 + 0.0123 log10 Omega_m(z))."""
    return DELTA_C_EDS * (
        1.0 + 0.0123 * jnp.log10(omega_m_z(cosmo, z)))


def delta_v(cosmo: CosmoParams, z=0.0):
    """Virial overdensity w.r.t. the MEAN matter density: Bryan-Norman
    1998 fit (SURVEY.md App. A.6 convention; chomp ``delta_v=-1`` selects
    the cosmology's own value)."""
    om = omega_m_z(cosmo, z)
    x = om - 1.0
    return (18.0 * jnp.pi**2 + 82.0 * x - 39.0 * x * x) / om


def delta_v_ns97(cosmo: CosmoParams, z=0.0):
    """Nakamura-Suto 1997 virial-overdensity fit w.r.t. MEAN density
    (alternative convention — selected by ``HaloParams.delta_v = -2``):
    18 pi^2 (1 + 0.4093 x^0.9052), x = 1/Omega_m(z) - 1."""
    x = jnp.maximum(1.0 / omega_m_z(cosmo, z) - 1.0, 1e-12)
    return 18.0 * jnp.pi**2 * (1.0 + 0.4093 * x**0.9052)


def _dln_e2_dlna(cosmo: CosmoParams, a):
    """d ln(E^2) / d ln a, analytic (CPL dark energy + curvature)."""
    zp1 = 1.0 / a
    de = cosmo.omega_l0 * zp1 ** (3.0 * (1.0 + cosmo.w0 + cosmo.wa)) * jnp.exp(
        -3.0 * cosmo.wa * (1.0 - a))
    e2 = cosmo.omega_m0 * zp1**3 + cosmo.omega_k0 * zp1**2 + de
    d_e2 = (-3.0 * cosmo.omega_m0 * zp1**3
            - 2.0 * cosmo.omega_k0 * zp1**2
            + de * (-3.0 * (1.0 + cosmo.w0 + cosmo.wa) + 3.0 * cosmo.wa * a))
    return d_e2 / e2


def growth_factor_exact(cosmo: CosmoParams, z, n_steps: int = 512,
                        a_init: float = 1e-3):
    """Linear growth from the exact ODE (capability upgrade over the
    reference's integral formula, which is exact only for w = -1):

      d2D/dN^2 + [2 + dlnE/dN] dD/dN = (3/2) Omega_m(a) D,   N = ln a,

    integrated by fixed-step RK4 under ``lax.scan`` from matter
    domination (D ∝ a at a_init), normalized to D(z=0) = 1.  For LCDM it
    agrees with :func:`growth_factor` to ~1e-5; for CPL dark energy the
    difference IS the integral formula's approximation error (sub-%
    for moderate w0/wa).  Evaluation at arbitrary z via interpolation of
    the dense ln a trajectory."""
    import jax

    n0 = jnp.log(a_init)
    h = (0.0 - n0) / n_steps

    def rhs(n, state):
        d, dp = state
        a = jnp.exp(n)
        om_a = cosmo.omega_m0 / (a**3 * e2z(cosmo, 1.0 / a - 1.0))
        damp = 2.0 + 0.5 * _dln_e2_dlna(cosmo, a)
        return jnp.stack([dp, 1.5 * om_a * d - damp * dp])

    def step(state, i):
        n = n0 + i * h
        k1 = rhs(n, state)
        k2 = rhs(n + 0.5 * h, state + 0.5 * h * k1)
        k3 = rhs(n + 0.5 * h, state + 0.5 * h * k2)
        k4 = rhs(n + h, state + h * k3)
        new = state + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return new, new[0]

    init = jnp.stack([jnp.asarray(a_init, dtype=jnp.result_type(cosmo.omega_m0)),
                      jnp.asarray(a_init, dtype=jnp.result_type(cosmo.omega_m0))])
    _, d_traj = jax.lax.scan(step, init, jnp.arange(n_steps))
    n_grid = n0 + h * (jnp.arange(n_steps) + 1.0)
    d0 = d_traj[-1]
    n_query = -jnp.log1p(jnp.asarray(z))
    return jnp.interp(n_query, n_grid, d_traj) / d0
