"""Linear matter power: EH98 transfer functions, sigma(R), sigma(M), nu(M).

TPU-native replacement for the power-spectrum half of the reference's
``cosmology.SingleEpoch`` (upstream:cosmology.py; SURVEY.md §2 row 2,
§3.2, Appendix B.2-B.3):

  - Eisenstein & Hu 1998 transfer function, both the zero-baryon
    "no-wiggle" shape fit (chomp's default, ``with_bao=False``) and the
    full wiggle form (``with_bao=True``) — BASELINE.json configs[0] wants
    the wiggle variant on a 1024-pt log-k grid.
  - P(k, z) = norm * k^n_s * T(k)^2 * D(z)^2, normalized so that
    sigma(R = 8 Mpc/h, z=0) = sigma_8 via a ln-k quadrature (chomp
    "quadrature 3"; here a composite Gauss-Legendre contraction whose
    nodes are static constants in the compiled program).
  - sigma(M) through the top-hat window, and chomp's SQUARED peak height
    nu(M) = (delta_c / sigma)^2 (SURVEY.md Appendix C.1 — the critical
    convention gotcha).

Oracle targets: SURVEY.md Appendix A.1-A.3.
"""

from __future__ import annotations

import jax.numpy as jnp

from chomp_tpu import background
from chomp_tpu.grids import gl_composite
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec

_E = 2.718281828459045


# ---------------------------------------------------------------------------
# Transfer functions (k in h/Mpc everywhere at the API surface).
# ---------------------------------------------------------------------------

def transfer_nowiggle(cosmo: CosmoParams, k):
    """EH98 zero-baryon shape fit (chomp default; SURVEY.md App. B.2)."""
    k = jnp.asarray(k)
    omh2 = cosmo.omega_m0 * cosmo.h**2
    obh2 = cosmo.omega_b0 * cosmo.h**2
    theta = cosmo.t_cmb / 2.7
    # Sound horizon in Mpc (NOT Mpc/h) — the k*h*s product below accounts
    # for it (SURVEY.md Appendix C.6).
    s = 44.5 * jnp.log(9.83 / omh2) / jnp.sqrt(1.0 + 10.0 * obh2**0.75)
    fb = cosmo.omega_b0 / cosmo.omega_m0
    alpha_g = (
        1.0
        - 0.328 * jnp.log(431.0 * omh2) * fb
        + 0.38 * jnp.log(22.3 * omh2) * fb * fb
    )
    ks = k * cosmo.h * s
    gamma_eff = cosmo.omega_m0 * cosmo.h * (
        alpha_g + (1.0 - alpha_g) / (1.0 + (0.43 * ks) ** 4)
    )
    q = k * theta * theta / gamma_eff
    l0 = jnp.log(2.0 * _E + 1.8 * q)
    c0 = 14.2 + 731.0 / (1.0 + 62.5 * q)
    return l0 / (l0 + c0 * q * q)


def sound_horizon_drag(cosmo: CosmoParams):
    """Comoving sound horizon at the drag epoch, in Mpc (NOT Mpc/h):
    Eisenstein & Hu 1998 eqs. 2-6 (z_eq, the z_d fit, R(z), and the
    closed-form integral of c_s/H through matter-radiation equality).
    This is EXACTLY the ``s`` that positions the BAO wiggles in
    transfer_eh_full, so distance ratios built on it (chomp_tpu.bao)
    are self-consistent with this framework's own P(k) template.
    Accuracy vs a Boltzmann r_d: ~1-2% (the EH98 fit's own quote)."""
    h = cosmo.h
    omh2 = cosmo.omega_m0 * h * h
    obh2 = cosmo.omega_b0 * h * h
    theta = cosmo.t_cmb / 2.7
    th4 = theta**4
    z_eq = 2.50e4 * omh2 / th4
    k_eq = 7.46e-2 * omh2 / (theta * theta)  # 1/Mpc
    b1d = 0.313 * omh2**-0.419 * (1.0 + 0.607 * omh2**0.674)
    b2d = 0.238 * omh2**0.223
    z_d = (1291.0 * omh2**0.251 / (1.0 + 0.659 * omh2**0.828)
           * (1.0 + b1d * obh2**b2d))
    r_d = 31.5 * obh2 / th4 * (1.0e3 / z_d)
    r_eq = 31.5 * obh2 / th4 * (1.0e3 / z_eq)
    return (2.0 / (3.0 * k_eq) * jnp.sqrt(6.0 / r_eq)
            * jnp.log((jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_d + r_eq))
                      / (1.0 + jnp.sqrt(r_eq))))


def _t0_tilde(q, alpha, beta):
    c = 14.2 / alpha + 386.0 / (1.0 + 69.9 * q**1.08)
    l = jnp.log(_E + 1.8 * beta * q)
    return l / (l + c * q * q)


def transfer_eh_full(cosmo: CosmoParams, k):
    """Full EH98 transfer with BAO wiggles (chomp ``with_bao=True``).

    Eisenstein & Hu 1998 (astro-ph/9709112) §2 fitting formulas: CDM part
    T_c (eqs 9-12, 17-20) + baryon part T_b (eqs 13-15, 21-24), combined
    via eq 16.  Internal k in 1/Mpc; API k in h/Mpc.
    """
    k_h = jnp.asarray(k)
    k = k_h * cosmo.h  # 1/Mpc
    om = cosmo.omega_m0
    ob = cosmo.omega_b0
    oc = om - ob
    h = cosmo.h
    omh2 = om * h * h
    obh2 = ob * h * h
    theta = cosmo.t_cmb / 2.7
    th4 = theta**4

    z_eq = 2.50e4 * omh2 / th4
    k_eq = 7.46e-2 * omh2 / (theta * theta)  # 1/Mpc

    b1d = 0.313 * omh2**-0.419 * (1.0 + 0.607 * omh2**0.674)
    b2d = 0.238 * omh2**0.223
    z_d = (
        1291.0
        * omh2**0.251
        / (1.0 + 0.659 * omh2**0.828)
        * (1.0 + b1d * obh2**b2d)
    )

    def r_of_z(z):
        return 31.5 * obh2 / th4 * (1.0e3 / z)

    r_d = r_of_z(z_d)
    r_eq = r_of_z(z_eq)
    s = (
        2.0
        / (3.0 * k_eq)
        * jnp.sqrt(6.0 / r_eq)
        * jnp.log(
            (jnp.sqrt(1.0 + r_d) + jnp.sqrt(r_d + r_eq)) / (1.0 + jnp.sqrt(r_eq))
        )
    )
    k_silk = 1.6 * obh2**0.52 * omh2**0.73 * (1.0 + (10.4 * omh2) ** -0.95)

    q = k / (13.41 * k_eq)
    ks = k * s

    a1 = (46.9 * omh2) ** 0.670 * (1.0 + (32.1 * omh2) ** -0.532)
    a2 = (12.0 * omh2) ** 0.424 * (1.0 + (45.0 * omh2) ** -0.582)
    alpha_c = a1 ** (-ob / om) * a2 ** (-((ob / om) ** 3))
    b1 = 0.944 / (1.0 + (458.0 * omh2) ** -0.708)
    b2 = (0.395 * omh2) ** -0.0266
    beta_c = 1.0 / (1.0 + b1 * ((oc / om) ** b2 - 1.0))

    f = 1.0 / (1.0 + (ks / 5.4) ** 4)
    t_c = f * _t0_tilde(q, 1.0, beta_c) + (1.0 - f) * _t0_tilde(q, alpha_c, beta_c)

    y = (1.0 + z_eq) / (1.0 + z_d)
    sq = jnp.sqrt(1.0 + y)
    g_y = y * (-6.0 * sq + (2.0 + 3.0 * y) * jnp.log((sq + 1.0) / (sq - 1.0)))
    alpha_b = 2.07 * k_eq * s * (1.0 + r_d) ** -0.75 * g_y
    beta_b = 0.5 + ob / om + (3.0 - 2.0 * ob / om) * jnp.sqrt((17.2 * omh2) ** 2 + 1.0)
    beta_node = 8.41 * omh2**0.435
    s_tilde = s / (1.0 + (beta_node / ks) ** 3) ** (1.0 / 3.0)
    x = k * s_tilde
    j0 = jnp.where(jnp.abs(x) < 1e-6, 1.0 - x * x / 6.0, jnp.sin(x) / x)
    t_b = (
        _t0_tilde(q, 1.0, 1.0) / (1.0 + (ks / 5.2) ** 2)
        + alpha_b / (1.0 + (beta_b / ks) ** 3) * jnp.exp(-((k / k_silk) ** 1.4))
    ) * j0

    return ob / om * t_b + oc / om * t_c


def transfer(cosmo: CosmoParams, k, with_bao: bool = False):
    """Transfer-function dispatch (``with_bao`` is jit-static, mirroring
    chomp's ``SingleEpoch(..., with_bao)`` constructor flag)."""
    if with_bao:
        return transfer_eh_full(cosmo, k)
    return transfer_nowiggle(cosmo, k)


# ---------------------------------------------------------------------------
# Top-hat window and sigma quadratures.
# ---------------------------------------------------------------------------

def w_tophat(x):
    """W(x) = 3 (sin x - x cos x)/x^3, series-blended near 0 (float32-safe
    against catastrophic cancellation; SURVEY.md §7 hard part 1)."""
    x = jnp.asarray(x)
    x2 = x * x
    series = 1.0 - x2 / 10.0 + x2 * x2 / 280.0 - x2 * x2 * x2 / 15120.0
    xs = jnp.where(jnp.abs(x) < 0.5, 1.0, x)  # avoid 0/0 in unused branch
    closed = 3.0 * (jnp.sin(xs) - xs * jnp.cos(xs)) / xs**3
    return jnp.where(jnp.abs(x) < 0.5, series, closed)


def dw_tophat(x):
    """dW/dx = 3 ((x^2-3) sin x + 3 x cos x)/x^4, series-blended."""
    x = jnp.asarray(x)
    x2 = x * x
    series = -x / 5.0 + x * x2 / 70.0 - x * x2 * x2 / 2520.0
    xs = jnp.where(jnp.abs(x) < 0.5, 1.0, x)
    closed = 3.0 * ((xs * xs - 3.0) * jnp.sin(xs) + 3.0 * xs * jnp.cos(xs)) / xs**4
    return jnp.where(jnp.abs(x) < 0.5, series, closed)


def _sigma_nodes(grid: GridSpec):
    import numpy as np

    ln_k, w = gl_composite(
        float(np.log(grid.sigma_k_min)),
        float(np.log(grid.sigma_k_max)),
        grid.sigma_panels,
        grid.sigma_n_per_panel,
    )
    return jnp.asarray(ln_k), jnp.asarray(w)


def _delta2_unnorm(cosmo: CosmoParams, k, with_bao: bool,
                   nu_z=0.0, species: str = "m", n_growth: int = 64):
    """k^3 * k^n_s * T^2(k) S_X^2(k, z) / (2 pi^2) — unnormalized
    Delta^2(k).  S_X is the EH99 massive-neutrino suppression for
    species X (chomp_tpu.neutrino) — identically 1.0 at m_nu = 0, so
    the default path is bitwise the EH98 baseline."""
    from chomp_tpu import neutrino

    t = transfer(cosmo, k, with_bao)
    s = neutrino.suppression(cosmo, k, nu_z, species, n_growth)
    return k**3 * k**cosmo.n_s * t * t * s * s / (2.0 * jnp.pi**2)


def sigma2_unnorm_r(cosmo: CosmoParams, r, with_bao: bool = False,
                    grid: GridSpec = DEFAULT_GRID,
                    nu_z=0.0, species: str = "m"):
    """Unnormalized sigma^2(R) = ∫ dln k Delta^2_un(k) W^2(kR).

    ``nu_z``/``species``: epoch and sector of the EH99 neutrino
    suppression INSIDE the integrand (the mass sector passes its build
    redshift and "cb"; the sigma_8 normalization uses z=0, "m").  The
    separable D(z) growth stays OUTSIDE, applied by the callers, exactly
    as before — at m_nu = 0 nothing changes bitwise."""
    ln_k, w = _sigma_nodes(grid)
    k = jnp.exp(ln_k)
    d2 = _delta2_unnorm(cosmo, k, with_bao, nu_z, species,
                        grid.n_growth)  # (nq,)
    r = jnp.asarray(r)
    win = w_tophat(k * r[..., None])
    return jnp.sum(d2 * win * win * w, axis=-1)


def sigma2_unnorm_r_and_dlnr(cosmo: CosmoParams, r, with_bao: bool = False,
                             grid: GridSpec = DEFAULT_GRID,
                             nu_z=0.0, species: str = "m"):
    """(sigma^2_un(R), d sigma^2_un/d lnR) sharing one node set.

    The derivative feeds dn/dM analytically (dnu/dlnM), replacing chomp's
    spline-derivative of the nu(M) spline (SURVEY.md §2 MassFunction row).
    The EH99 suppression is k-only at fixed z, so both integrals carry
    the same factor on Delta^2_un.
    """
    ln_k, w = _sigma_nodes(grid)
    k = jnp.exp(ln_k)
    d2 = _delta2_unnorm(cosmo, k, with_bao, nu_z, species, grid.n_growth)
    r = jnp.asarray(r)
    x = k * r[..., None]
    win = w_tophat(x)
    s2 = jnp.sum(d2 * win * win * w, axis=-1)
    ds2 = jnp.sum(d2 * 2.0 * win * dw_tophat(x) * x * w, axis=-1)
    return s2, ds2


def power_norm(cosmo: CosmoParams, with_bao: bool = False,
               grid: GridSpec = DEFAULT_GRID):
    """P(k) normalization: sigma_8^2 / sigma^2_un(8 Mpc/h)  (chomp's
    sigma_8 normalization quadrature; oracle A.2: 3.68994667e+06)."""
    s2 = sigma2_unnorm_r(cosmo, jnp.asarray(8.0), with_bao, grid)
    return cosmo.sigma_8**2 / s2


def linear_power(cosmo: CosmoParams, k, z=0.0, with_bao: bool = False,
                 grid: GridSpec = DEFAULT_GRID, species: str = "m"):
    """Linear P_X(k, z) in (Mpc/h)^3 (chomp ``SingleEpoch.linear_power``;
    oracle A.2).  ``species``: "m" (total matter, default — what the
    sigma_8 normalization refers to at z=0) or "cb" (CDM+baryon — the
    halo/galaxy sector at m_nu > 0; identical at m_nu = 0)."""
    k = jnp.asarray(k)
    norm = power_norm(cosmo, with_bao, grid)
    t = transfer(cosmo, k, with_bao)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    from chomp_tpu import neutrino

    s = neutrino.suppression(cosmo, k, z, species, grid.n_growth)
    return norm * k**cosmo.n_s * t * t * s * s * d * d


def delta_k(cosmo: CosmoParams, k, z=0.0, with_bao: bool = False,
            grid: GridSpec = DEFAULT_GRID):
    """Dimensionless Delta^2(k, z) = k^3 P(k, z)/(2 pi^2) (chomp
    ``SingleEpoch.delta_k``)."""
    k = jnp.asarray(k)
    return k**3 * linear_power(cosmo, k, z, with_bao, grid) / (2.0 * jnp.pi**2)


def radius_of_mass(cosmo: CosmoParams, m):
    """Lagrangian top-hat radius R(M) = (3M / 4 pi rho_bar)^(1/3), Mpc/h."""
    return (3.0 * jnp.asarray(m) / (4.0 * jnp.pi * cosmo.rho_bar)) ** (1.0 / 3.0)


def sigma_r(cosmo: CosmoParams, r, z=0.0, with_bao: bool = False,
            grid: GridSpec = DEFAULT_GRID, species: str = "m"):
    """sigma(R, z) (chomp ``SingleEpoch.sigma_r``; oracle A.3).  At
    m_nu > 0 the EH99 suppression for ``species`` is evaluated at z
    inside the integrand (scale-dependent growth); the separable D(z)
    then carries only the scale-free part, matching the mass sector."""
    norm = power_norm(cosmo, with_bao, grid)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    return jnp.sqrt(norm * sigma2_unnorm_r(
        cosmo, jnp.asarray(r), with_bao, grid, nu_z=z, species=species)) * d


def sigma_m(cosmo: CosmoParams, m, z=0.0, with_bao: bool = False,
            grid: GridSpec = DEFAULT_GRID, species: str = "m"):
    """sigma(M, z) (chomp ``SingleEpoch.sigma_m``)."""
    return sigma_r(cosmo, radius_of_mass(cosmo, m), z, with_bao, grid,
                   species)


def nu_m(cosmo: CosmoParams, m, z=0.0, with_bao: bool = False,
         grid: GridSpec = DEFAULT_GRID):
    """chomp's SQUARED peak height nu(M, z) = (delta_c(z)/sigma(M, z))^2
    (SURVEY.md Appendix C.1; oracle A.3)."""
    dc = background.delta_c(cosmo, z)
    s = sigma_m(cosmo, m, z, with_bao, grid)
    return (dc / s) ** 2
