"""Halo-model nonlinear power spectra: 1-halo + 2-halo, mm/gm/gg.

TPU-native replacement for the reference's ``halo.Halo`` /
``halo.HaloExclusion`` (upstream:halo.py; SURVEY.md §2 rows 6-7, §3.4,
Appendix B.7).  chomp lazily builds ``_pp_mm``/``_h_m``-style splines by
running a Romberg mass integral per k grid point; here every spectrum at
every k is one (n_k x n_M) tensor contraction against the MassTables GL
rule, with the NFW y(k, M) matrix computed in-line — the whole assembly
is a handful of fused einsums that XLA maps onto the TPU's MXU/VPU, and
arbitrary k vectors are evaluated EXACTLY (no spline error).

Mass-integral convention (Appendix C: integrals in nu-space against
f(nu) dnu via the lnM-space GL rule):

  h_m(k)   = ∫ f(nu) b(nu) y(k, M) dnu                      (-> 1 as k->0)
  h_g(k)   = (1/n_g) ∫ dn/dlnM <N> b y dlnM
  pp_mm(k) = ∫ f(nu) (M/rho_bar) y^2 dnu
  pp_gg(k) = (1/n_g^2) ∫ dn/dlnM <N(N-1)> y^p dlnM
  pp_gm(k) = (1/(n_g rho_bar)) ∫ dn/dlnM M <N> y^p' dlnM
  P_xy(k)  = pp_xy(k) + P_lin(k) h_x(k) h_y(k)

with the Scranton central/satellite heuristic (Appendix C.5 [M]):
p = 1 where <N(N-1)> < 1 (pairs are central-satellite, one galaxy sits
at the center), else 2; the gm version mirrors it with <N> < 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from chomp_tpu import linear, profiles
from chomp_tpu.mass import MassTables, build_mass_tables, m_star
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec, HaloParams
from chomp_tpu.utils.tree import pytree_dataclass


@pytree_dataclass
class GalaxyPack:
    """Panel-refined GL quadrature for all HOD-weighted mass integrals.

    HOD moments are only piecewise-smooth (satellite onsets, central
    steps) and the Scranton 1-halo y-exponent switches at the masses
    where <N> / <N(N-1)> cross 1.  Fixed full-range GL nodes lose ~1e-6
    against these kinks; this pack places panel EDGES at every such mark
    (traced, sorted at trace time), restoring spectral convergence while
    staying one static-shape fused computation."""

    ln_m: jnp.ndarray       # (nG,) nodes, sorted, panel-concatenated
    w_lnm: jnp.ndarray      # (nG,)
    m: jnp.ndarray
    dndlnm: jnp.ndarray
    bias: jnp.ndarray
    n_first: jnp.ndarray
    n_second: jnp.ndarray
    nu: jnp.ndarray         # (nG,) squared peak height (baryon bloating)


@pytree_dataclass
class HaloModel:
    """Bound state for halo-model spectra at one redshift (functional
    analog of a constructed chomp ``Halo`` object).  The HOD pytree rides
    inside, so different HOD classes compile separate specializations."""

    mass: MassTables
    hod: object
    gal: GalaxyPack
    n_g: jnp.ndarray        # mean galaxy density, (h/Mpc)^3
    m_star: jnp.ndarray
    n_first: jnp.ndarray    # <N>(M_j) at the mass-table nodes (API use)
    n_second: jnp.ndarray   # <N(N-1)>(M_j)
    ln_m_sw1: jnp.ndarray   # lnM where <N> crosses 1 (gm y-exponent switch)
    ln_m_sw2: jnp.ndarray   # lnM where <N(N-1)> crosses 1 (gg switch)


def _switch_lnm(moment_fn, tables: MassTables):
    """lnM where a monotone HOD moment crosses 1: interpolation seed off
    the table + 4 Newton steps on the closed form (differentiable; exact
    to machine precision).  Clamped into the mass range — an empty panel
    (zero width) if the moment never reaches 1."""
    import jax

    vals = moment_fn(tables.m)
    lnv = jnp.log(jnp.maximum(vals, 1e-300))
    seed = jnp.interp(0.0, lnv, tables.ln_m)

    def g(lnm):
        return jnp.log(jnp.maximum(moment_fn(jnp.exp(lnm)), 1e-300))

    for _ in range(4):
        val, dv = jax.value_and_grad(g)(seed)
        # Per-step clamp: a moment that never reaches 1 (e.g. the
        # identically-zero second moment of a central-only selection
        # sample, clusters.SelectionHOD) has dv -> 0 and would step to
        # lnM ~ 1e32, sending exp(lnM) -> inf through later iterations
        # (NaN grads).  +-20 e-folds per step is far beyond any real
        # crossing correction and keeps the iterate finite.
        seed = seed - jnp.clip(
            val / jnp.where(jnp.abs(dv) > 1e-30, dv, 1e-30),
            -20.0, 20.0)
    return jnp.clip(seed, tables.ln_m[0], tables.ln_m[-1])


def build_halo_model(
    cosmo: CosmoParams,
    halo: HaloParams,
    hod,
    z=0.0,
    with_bao: bool = False,
    grid: GridSpec = DEFAULT_GRID,
    mass_tables: MassTables | None = None,
) -> HaloModel:
    """Assemble mass tables + HOD moments + n_g (chomp ``Halo.__init__``
    + ``_initialize_splines`` head; n_g as in Appendix B.7)."""
    from chomp_tpu.mass import node_pack

    t = mass_tables if mass_tables is not None else build_mass_tables(
        cosmo, halo, z, with_bao, grid)
    n_first = hod.first_moment(t.m)
    n_second = hod.second_moment(t.m)
    if grid.scranton_switch:
        sw1 = _switch_lnm(hod.first_moment, t)
        sw2 = _switch_lnm(hod.second_moment, t)
    else:
        # Plain y^2 convention: park both switches at the lower mass
        # bound so no node takes the y^1 branch (GridSpec docstring).
        sw1 = t.ln_m[0] * jnp.ones(())
        sw2 = t.ln_m[0] * jnp.ones(())

    # Panel-refined galaxy quadrature: edges at every non-smooth mark.
    bps = tuple(hod.breakpoints()) if hasattr(hod, "breakpoints") else ()
    marks = jnp.sort(jnp.stack(
        [jnp.clip(b, t.ln_m[0], t.ln_m[-1]) for b in (*bps, sw1, sw2)]))
    n_panels = marks.shape[0] + 1
    n_per = max(grid.n_mass // n_panels, 64)
    edges = [t.ln_m[0]] + [marks[i] for i in range(n_panels - 1)] + [t.ln_m[-1]]
    packs = [node_pack(cosmo, halo, t, lo, hi, n_per, with_bao, grid)
             for lo, hi in zip(edges[:-1], edges[1:])]
    cat = lambda attr: jnp.concatenate([getattr(p, attr) for p in packs])
    ln_g = cat("ln_m")
    m_g = jnp.exp(ln_g)
    gal = GalaxyPack(ln_m=ln_g, w_lnm=cat("w_lnm"), m=m_g,
                     dndlnm=cat("dndlnm"), bias=cat("bias"),
                     n_first=hod.first_moment(m_g),
                     n_second=hod.second_moment(m_g),
                     nu=cat("nu"))

    n_g = jnp.sum(gal.w_lnm * gal.dndlnm * gal.n_first)
    return HaloModel(mass=t, hod=hod, gal=gal, n_g=n_g, m_star=m_star(t),
                     n_first=n_first, n_second=n_second,
                     ln_m_sw1=sw1, ln_m_sw2=sw2)


def _y_matrix(cosmo: CosmoParams, halo: HaloParams, model: HaloModel, k):
    """y(k_i, M_j) for a k vector: one fused VPU computation."""
    k = jnp.atleast_1d(jnp.asarray(k))
    return profiles.y_nfw(cosmo, halo, k[:, None], model.mass.m[None, :],
                          model.m_star, model.mass.z)


def _y_gal(cosmo, halo, model: HaloModel, k):
    """y(k_i, M_j) at the galaxy-pack nodes."""
    k = jnp.atleast_1d(jnp.asarray(k))
    return profiles.y_nfw(cosmo, halo, k[:, None], model.gal.m[None, :],
                          model.m_star, model.mass.z)


def _bary_scales(cosmo: CosmoParams, nu_sq):
    """(c_scale, k_scale) feedback hooks for the MATTER profile at nodes
    with squared peak height ``nu_sq`` (CosmoParams.bary_c / bary_eta
    docstring).  At the defaults (1.0, 0.0) both multiplications are
    IEEE-exact no-ops (x*1.0 == x; nu**0.0 == 1.0), so the baseline
    stays bitwise and d/d(bary_eta) is clean at 0 (the log nu factor is
    finite: nu > 0 everywhere on the mass tables)."""
    c_scale = jnp.asarray(getattr(cosmo, "bary_c", 1.0))
    eta = jnp.asarray(getattr(cosmo, "bary_eta", 0.0))
    k_scale = jnp.sqrt(nu_sq)[None, :] ** eta
    return c_scale, k_scale


def _y_matter(cosmo: CosmoParams, halo: HaloParams, model: HaloModel, k):
    """Matter-profile y(k_i, M_j) at the mass-table nodes, with the
    baryon-feedback knobs applied (identical to _y_matrix at the
    defaults, bitwise)."""
    k = jnp.atleast_1d(jnp.asarray(k))
    c_s, k_s = _bary_scales(cosmo, model.mass.nu)
    return profiles.y_nfw(cosmo, halo, k[:, None], model.mass.m[None, :],
                          model.m_star, model.mass.z,
                          c_scale=c_s, k_scale=k_s)


def _y_gal_matter(cosmo, halo, model: HaloModel, k):
    """Matter-profile y at the GALAXY-pack nodes (the matter factor of
    the 1-halo gm integrand), feedback-aware."""
    k = jnp.atleast_1d(jnp.asarray(k))
    c_s, k_s = _bary_scales(cosmo, model.gal.nu)
    return profiles.y_nfw(cosmo, halo, k[:, None], model.gal.m[None, :],
                          model.m_star, model.mass.z,
                          c_scale=c_s, k_scale=k_s)


def two_halo_integrals(cosmo: CosmoParams, halo: HaloParams, model: HaloModel, k):
    """(h_m(k), h_g(k)) bias-weighted halo integrals (chomp ``_h_m`` /
    ``_h_g`` spline contents, computed exactly at the requested k)."""
    t = model.mass
    y = _y_matter(cosmo, halo, model, k)
    f_dnu = t.f_nu * t.dnu_dlnm
    h_m = jnp.matmul(y, t.w_lnm * f_dnu * t.bias,
                     precision=jax.lax.Precision.HIGHEST)
    g = model.gal
    y_g = _y_gal(cosmo, halo, model, k)
    h_g = jnp.matmul(y_g, g.w_lnm * g.dndlnm * g.n_first * g.bias,
                     precision=jax.lax.Precision.HIGHEST) / model.n_g
    return h_m, h_g


def one_halo_integrals(cosmo: CosmoParams, halo: HaloParams, model: HaloModel, k,
                       with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """(pp_mm, pp_gg, pp_gm)(k) — the 1-halo terms (chomp ``_pp_mm`` /
    ``_pp_gg`` / ``_pp_gm``).

    The Scranton y-exponent heuristic (Appendix C.5) makes the gg/gm
    integrands DISCONTINUOUS where <N(N-1)> (resp. <N>) crosses 1; the
    galaxy pack has panel edges exactly at those Newton-solved masses, so
    the per-node exponent select below never straddles a kink and the
    quadrature stays spectral."""
    t = model.mass
    y = _y_matter(cosmo, halo, model, k)
    f_dnu = t.f_nu * t.dnu_dlnm
    pp_mm = jnp.matmul(y * y, t.w_lnm * f_dnu * t.m / cosmo.rho_bar,
                       precision=jax.lax.Precision.HIGHEST)

    g = model.gal
    y_g = _y_gal(cosmo, halo, model, k)
    y_gg = jnp.where(g.ln_m[None, :] < model.ln_m_sw2, y_g, y_g * y_g)
    pp_gg = jnp.matmul(y_gg, g.w_lnm * g.dndlnm * g.n_second,
                       precision=jax.lax.Precision.HIGHEST) / model.n_g**2
    # gm 1-halo: the MATTER factor carries baryon feedback, the galaxy
    # (satellite-position) factor stays NFW.  p=1 regime (<N> < 1, one
    # central at r=0): the single y IS the matter profile; p=2: one
    # satellite factor x one matter factor.  Bitwise the old
    # where(y, y*y) at the feedback defaults.
    y_gm_m = _y_gal_matter(cosmo, halo, model, k)
    y_gm = jnp.where(g.ln_m[None, :] < model.ln_m_sw1, y_gm_m, y_gm_m * y_g)
    pp_gm = jnp.matmul(y_gm, g.w_lnm * g.dndlnm * g.m * g.n_first,
                       precision=jax.lax.Precision.HIGHEST) / (
        model.n_g * cosmo.rho_bar)
    return pp_mm, pp_gg, pp_gm


def linear_power(cosmo: CosmoParams, model: HaloModel, k,
                 with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """P_lin(k) of the HALO SECTOR at the model's redshift (chomp
    ``Halo.linear_power``).  At m_nu > 0 this is the CDM+baryon spectrum
    (the field the 2-halo integrals, bias and mass function live in —
    chomp_tpu.neutrino); identical to total matter at m_nu = 0.  The
    ``powers()`` dict rescales its matter legs back to total matter."""
    return linear.linear_power(cosmo, k, model.mass.z, with_bao, grid,
                               species="cb")


def _nu_matter_rescale(cosmo: CosmoParams, model: HaloModel, k,
                       grid: GridSpec):
    """r(k, z) = D_cbnu/D_cb: one factor per TOTAL-MATTER leg on
    cb-sector spectra (P_mm r^2, P_gm r; identically 1 at m_nu = 0).
    Correct 2-halo limit (linear cb -> m conversion) and the correct
    small-scale limit P_mm -> f_cb^2 P_cb (neutrinos do not cluster in
    halos)."""
    from chomp_tpu import neutrino

    return neutrino.m_over_cb(cosmo, k, model.mass.z, grid.n_growth)


def _a_mod_mm(cosmo: CosmoParams, p_mm, p_lin_m):
    """Amon & Efstathiou 2022 interpolation on the TOTAL-MATTER power:
    P -> P + (a_mod - 1)(P - P_lin).  The (a_mod - 1) form is bitwise
    exact at a_mod = 1 (x + 0.0 == x) with a clean, NONZERO gradient
    d/d a_mod = P - P_lin there (a jnp.where guard would zero it).
    mm legs only (CosmoParams.a_mod docstring)."""
    a = jnp.asarray(getattr(cosmo, "a_mod", 1.0))
    return p_mm + (a - 1.0) * (p_mm - p_lin_m)


def powers(cosmo: CosmoParams, halo: HaloParams, model: HaloModel, k,
           with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """All halo-model spectra at once (shared y-matrix): dict with keys
    ``linear_power, power_mm, power_gm, power_mg, power_gg``."""
    k = jnp.atleast_1d(jnp.asarray(k))
    p_lin = linear_power(cosmo, model, k, with_bao, grid)
    h_m, h_g = two_halo_integrals(cosmo, halo, model, k)
    pp_mm, pp_gg, pp_gm = one_halo_integrals(cosmo, halo, model, k,
                                             with_bao, grid)
    p_mm = pp_mm + p_lin * h_m * h_m
    p_gg = pp_gg + p_lin * h_g * h_g
    p_gm = pp_gm + p_lin * h_m * h_g
    r = _nu_matter_rescale(cosmo, model, k, grid)
    p_lin_m = p_lin * r * r
    return {
        "linear_power": p_lin_m,
        "power_mm": _a_mod_mm(cosmo, p_mm * r * r, p_lin_m),
        "power_gm": p_gm * r,
        "power_mg": p_gm * r,
        "power_gg": p_gg,
    }


def power_mm(cosmo, halo, model, k, with_bao=False, grid=DEFAULT_GRID):
    """chomp ``Halo.power_mm``."""
    return powers(cosmo, halo, model, k, with_bao, grid)["power_mm"]


def power_gg(cosmo, halo, model, k, with_bao=False, grid=DEFAULT_GRID):
    """chomp ``Halo.power_gg``."""
    return powers(cosmo, halo, model, k, with_bao, grid)["power_gg"]


def power_gm(cosmo, halo, model, k, with_bao=False, grid=DEFAULT_GRID):
    """chomp ``Halo.power_gm`` (== ``power_mg``)."""
    return powers(cosmo, halo, model, k, with_bao, grid)["power_gm"]


power_mg = power_gm


def build_halo_models(cosmo: CosmoParams, halo: HaloParams, hods,
                      z=0.0, with_bao: bool = False,
                      grid: GridSpec = DEFAULT_GRID):
    """Halo models for SEVERAL galaxy samples (HODs) sharing ONE mass-
    table build — the multi-sample analog of build_halo_model (the mass
    function / sigma(R) / growth stage is HOD-independent and dominates
    the build; per-sample work is the HOD moments + panel packs)."""
    t = build_mass_tables(cosmo, halo, z, with_bao, grid)
    return [build_halo_model(cosmo, halo, h, z, with_bao, grid,
                             mass_tables=t) for h in hods]


def _cross_gal_pack(cosmo, halo, model_a: HaloModel, model_b: HaloModel,
                    with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """(ln_m, w_lnm, m, dndlnm, sw) quadrature pack for the CROSS-sample
    1-halo integral of two galaxy samples: panel edges at BOTH HODs'
    breakpoints and at the Newton-solved mass where the product moment
    <N_A><N_B> crosses 1 (the Scranton criterion applied to the
    independent-occupation cross moment — see power_gg_cross)."""
    from chomp_tpu.mass import node_pack

    t = model_a.mass
    hod_a, hod_b = model_a.hod, model_b.hod

    def prod_moment(m):
        return hod_a.first_moment(m) * hod_b.first_moment(m)

    if grid.scranton_switch:
        sw = _switch_lnm(prod_moment, t)
    else:
        sw = t.ln_m[0] * jnp.ones(())
    bps_a = tuple(hod_a.breakpoints()) if hasattr(hod_a, "breakpoints") else ()
    bps_b = tuple(hod_b.breakpoints()) if hasattr(hod_b, "breakpoints") else ()
    marks = jnp.sort(jnp.stack(
        [jnp.clip(b, t.ln_m[0], t.ln_m[-1]) for b in (*bps_a, *bps_b, sw)]))
    n_panels = marks.shape[0] + 1
    n_per = max(grid.n_mass // n_panels, 64)
    edges = [t.ln_m[0]] + [marks[i] for i in range(n_panels - 1)] + [t.ln_m[-1]]
    packs = [node_pack(cosmo, halo, t, lo, hi, n_per, with_bao, grid)
             for lo, hi in zip(edges[:-1], edges[1:])]
    cat = lambda attr: jnp.concatenate([getattr(p, attr) for p in packs])
    ln_g = cat("ln_m")
    return ln_g, cat("w_lnm"), jnp.exp(ln_g), cat("dndlnm"), sw


def union_gal_pack(cosmo, halo, models, with_bao: bool = False,
                   grid: GridSpec = DEFAULT_GRID):
    """(ln_m, w_lnm, m, dndlnm, bias) GL quadrature pack with panel
    edges at EVERY sample's HOD breakpoints — the shared rule for mass
    integrals mixing occupation moments of several galaxy samples
    (e.g. cross-sample trispectrum legs, where each galaxy leg carries
    its own <(N_s)_p>/n_{g,s}^p factor and the integrand kinks at each
    HOD's onset masses).  No Scranton edges: the trispectrum U
    integrals carry one y factor per leg, never a y-exponent switch.
    All models must share mass tables (halo.build_halo_models)."""
    from chomp_tpu.mass import node_pack

    t = models[0].mass
    bps = []
    for mdl in models:
        if hasattr(mdl.hod, "breakpoints"):
            bps.extend(mdl.hod.breakpoints())
    if bps:
        marks = jnp.sort(jnp.stack(
            [jnp.clip(b, t.ln_m[0], t.ln_m[-1]) for b in bps]))
        inner = [marks[i] for i in range(marks.shape[0])]
    else:
        inner = []
    n_panels = len(inner) + 1
    n_per = max(grid.n_mass // n_panels, 64)
    edges = [t.ln_m[0], *inner, t.ln_m[-1]]
    packs = [node_pack(cosmo, halo, t, lo, hi, n_per, with_bao, grid)
             for lo, hi in zip(edges[:-1], edges[1:])]
    cat = lambda attr: jnp.concatenate([getattr(p, attr) for p in packs])
    ln_g = cat("ln_m")
    return ln_g, cat("w_lnm"), jnp.exp(ln_g), cat("dndlnm"), cat("bias")


def power_gg_cross(cosmo: CosmoParams, halo: HaloParams,
                   model_a: HaloModel, model_b: HaloModel, k,
                   with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """P_gg(k) between two DIFFERENT galaxy samples (HODs) sharing one
    mass function — capability extension beyond chomp (upstream Halo
    binds a single HOD; SURVEY.md §2 row 6), needed for cross-bin
    clustering blocks in multi-sample tomography.

    2-halo: P_lin h_g^A h_g^B.  1-halo: halo occupations of distinct
    samples are taken independent, so <N_A N_B> = <N_A><N_B>, with the
    Scranton y-exponent convention applied to that product moment (y^1
    below the mass where <N_A><N_B> = 1 — one of the pair can sit at
    the halo center — else y^2; follows grid.scranton_switch, like the
    auto convention).  NOTE power_gg_cross(A, A) differs from
    power_gg(A) in the 1-halo term by construction: the auto pair count
    in one sample is <N(N-1)>, the cross pair count between independent
    samples is <N_A><N_B> — these coincide only for deterministic
    occupations.  Both models must share mass tables
    (build_halo_models / build_halo_model(mass_tables=))."""
    k = jnp.atleast_1d(jnp.asarray(k))
    t = model_a.mass
    p_lin = linear_power(cosmo, model_a, k, with_bao, grid)
    _, h_a = two_halo_integrals(cosmo, halo, model_a, k)
    _, h_b = two_halo_integrals(cosmo, halo, model_b, k)
    ln_g, w_g, m_g, dndlnm, sw = _cross_gal_pack(cosmo, halo, model_a,
                                                 model_b, with_bao, grid)
    y_g = profiles.y_nfw(cosmo, halo, k[:, None], m_g[None, :],
                         model_a.m_star, t.z)
    y_gg = jnp.where(ln_g[None, :] < sw, y_g, y_g * y_g)
    na = model_a.hod.first_moment(m_g)
    nb = model_b.hod.first_moment(m_g)
    pp = jnp.matmul(y_gg, w_g * dndlnm * na * nb,
                    precision=jax.lax.Precision.HIGHEST) / (
        model_a.n_g * model_b.n_g)
    return pp + p_lin * h_a * h_b


def tomographic_powers(cosmo: CosmoParams, halo: HaloParams, models, k,
                       with_bao: bool = False,
                       grid: GridSpec = DEFAULT_GRID):
    """All spectra for a LIST of galaxy samples sharing one mass
    function: dict with "power_mm", ("power_gg", i, j) for i <= j
    (autos via powers(), crosses via power_gg_cross), and
    ("power_gm", i).  The shared pieces (P_lin, h_m, pp_mm, the
    y(k, M) matrices at the mass-table nodes) appear once per
    expression and are deduplicated by XLA CSE under jit."""
    k = jnp.atleast_1d(jnp.asarray(k))
    p_lin = linear_power(cosmo, models[0], k, with_bao, grid)
    h_m, _ = two_halo_integrals(cosmo, halo, models[0], k)
    pp_mm, _, _ = one_halo_integrals(cosmo, halo, models[0], k,
                                     with_bao, grid)
    r = _nu_matter_rescale(cosmo, models[0], k, grid)
    out = {"power_mm": _a_mod_mm(cosmo, (pp_mm + p_lin * h_m * h_m) * r * r,
                                 p_lin * r * r)}
    for i, mi in enumerate(models):
        ps = powers(cosmo, halo, mi, k, with_bao, grid)
        out[("power_gg", i, i)] = ps["power_gg"]
        out[("power_gm", i)] = ps["power_gm"]
        for j in range(i + 1, len(models)):
            out[("power_gg", i, j)] = power_gg_cross(
                cosmo, halo, mi, models[j], k, with_bao, grid)
    return out


def galaxy_bias_avg(model: HaloModel):
    """Mean galaxy bias <b_g> = (1/n_g) ∫ dn/dlnM <N> b dlnM — the k->0
    limit of h_g (chomp's bias-average diagnostic)."""
    g = model.gal
    return jnp.sum(g.w_lnm * g.dndlnm * g.n_first * g.bias) / model.n_g


# ---------------------------------------------------------------------------
# Halo exclusion (chomp ``HaloExclusion(Halo)`` — [L] confidence in
# SURVEY.md §2 row 7; the exact upstream recipe was unverifiable, so this
# implements the standard first-order treatment with full documentation).
# ---------------------------------------------------------------------------

def powers_with_exclusion(cosmo: CosmoParams, halo: HaloParams,
                          model: HaloModel, k,
                          with_bao: bool = False,
                          grid: GridSpec = DEFAULT_GRID,
                          sharpness: float = 4.0):
    """Halo-model spectra with 2-halo halo-exclusion correction.

    Zheng 2004 / Tinker et al. 2005-style first-order exclusion: at scale
    r = 2 pi/k, halo pairs with r_vir,1 + r_vir,2 > r cannot both
    contribute to the 2-halo term.  Implemented as a smooth (sigmoid,
    ``sharpness`` in ln-space — differentiable) truncation of each 2-halo
    mass integral at virial radius r_vir(M) < pi/k, i.e. M < M_vir(pi/k).
    Reduces to the unexcluded spectra as k -> 0.
    """
    k = jnp.atleast_1d(jnp.asarray(k))
    t = model.mass
    p_lin = linear_power(cosmo, model, k, with_bao, grid)
    y = _y_matter(cosmo, halo, model, k)
    r_v = profiles.virial_radius(cosmo, halo, t.m, t.z)  # (nM,)
    # Smooth mask(k, M): 1 where r_vir << pi/k, 0 where r_vir >> pi/k.
    lnarg = jnp.log(r_v[None, :] * k[:, None] / jnp.pi)
    mask = 1.0 / (1.0 + jnp.exp(sharpness * lnarg))
    f_dnu = t.f_nu * t.dnu_dlnm
    h_m = jnp.matmul(y * mask, t.w_lnm * f_dnu * t.bias,
                     precision=jax.lax.Precision.HIGHEST)
    g = model.gal
    y_g = _y_gal(cosmo, halo, model, k)
    r_v_g = profiles.virial_radius(cosmo, halo, g.m, t.z)
    mask_g = 1.0 / (1.0 + jnp.exp(
        sharpness * jnp.log(r_v_g[None, :] * k[:, None] / jnp.pi)))
    h_g = jnp.matmul(y_g * mask_g, g.w_lnm * g.dndlnm * g.n_first * g.bias,
                     precision=jax.lax.Precision.HIGHEST) / model.n_g
    pp_mm, pp_gg, pp_gm = one_halo_integrals(cosmo, halo, model, k,
                                             with_bao, grid)
    r = _nu_matter_rescale(cosmo, model, k, grid)
    p_lin_m = p_lin * r * r
    return {
        "linear_power": p_lin_m,
        "power_mm": _a_mod_mm(cosmo, (pp_mm + p_lin * h_m * h_m) * r * r,
                              p_lin_m),
        "power_gm": (pp_gm + p_lin * h_m * h_g) * r,
        "power_mg": (pp_gm + p_lin * h_m * h_g) * r,
        "power_gg": pp_gg + p_lin * h_g * h_g,
    }
