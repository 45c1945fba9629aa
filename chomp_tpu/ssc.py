"""Super-sample covariance (SSC): the response of every 3x2pt probe to
survey-scale background modes.

Capability extension beyond chomp (upstream:covariance.py stops at the
Gaussian + connected-trispectrum terms over a uniform survey area,
SURVEY.md §2 row 13): for a real footprint the dominant non-Gaussian
covariance of a 3x2pt analysis is usually NOT the small-scale connected
trispectrum but the coupling to density modes LARGER than the survey —
the super-sample / halo-sample-variance term (Takada & Hu 2013,
PRD 87 123504; Krause & Eifler 2017; Lacasa 2018).  In the same
separable approximation used throughout the covariance stack it is a
rank-1-per-chi-node object,

    Cov_SSC[C_A(l1), C_B(l2)] = ∫ dchi  W_A1 W_A2 W_B1 W_B2 / chi^4
        x  (dP_A/ddelta_b)(k1, z) (dP_B/ddelta_b)(k2, z) sigma_b^2(chi),
    k_i = (l_i + 1/2)/chi,

with two physics ingredients this module provides:

1. **Power-spectrum responses** dP_ab/ddelta_b in the halo model
   (power_responses).  For tracer legs a, b in {m, g}:

     dP_ab/ddelta_b = (68/21 - (1/3) dln k^3 P_lin/dln k) h_a h_b P_lin
                      + I^b_ab(k)  -  (delta_a,g + delta_b,g) b_g P_ab

   where h_m/h_g are the bias-weighted 2-halo integrals
   (halo.two_halo_integrals: h_m = I_1^1 of Takada & Hu), I^b_ab is the
   BIAS-WEIGHTED 1-halo integral (response of the 1-halo term through
   the modulated halo abundance dn/dM -> (1 + b(M) delta_b) dn/dM),
   68/21 is the tree-level growth response of P_lin and
   -(1/3) dln k^3 P_lin/dln k the dilation response (comoving scales
   shrink inside an overdense patch).  The last term is the
   NUMBER-COUNT response: a w(theta)/gamma_t estimator normalized by
   the OBSERVED n_g picks up dln n_g/ddelta_b = b_g (the n-weighted
   mean bias, halo.galaxy_bias_avg) per galaxy leg — without it the
   SSC of galaxy probes is overestimated severalfold (Lacasa 2018).
   Toggled by ``local_counts`` (default True — the estimator this
   framework's w(theta) models divides by the observed pair counts).

2. **The background-mode variance** sigma_b^2(chi): the variance of
   the linear density field averaged over the survey footprint at the
   shell distance chi, computed from the SAME mask objects the masked
   Gaussian covariance uses (mask.PixelMask/DiscMask flat;
   curved.SphericalCapMask/ProfileCurvedMask/PixelSphereMask/
   UniformSphereMask on the sphere):

     flat:    sigma_b^2(chi) = (1/A2^2) ∫ q dq/2pi |W2~(q)|^2
                                 P_lin(q/chi, z) / chi^2
     curved:  sigma_b^2(chi) = (4 pi/A2^2) sum_l  c_l
                                 P_lin((l+1/2)/chi, z) / chi^2,
              xi_W2(mu) = sum_l c_l P_l(mu)

   (the window is the WEIGHT-SQUARED map W^2, normalized by
   A2 = ∫ W^2 — exact for binary masks, and the consistent choice for
   a W-weighted estimator whose pairs carry W(x)W(y)).  Both are
   static-geometry contractions against ANALYTIC EH98 evaluations at
   the query wavenumbers — zero dynamic gathers, same design rule as
   the rest of the covariance stack (NUMERICS.md; CLAUDE.md).

P_lin(k, z) = D^2(z) P_lin(k, 0) exactly in this framework
(scale-independent growth, linear.linear_power), so every z-dependence
in sigma_b^2 is one analytic growth factor per node.

Redshift treatment of the responses mirrors the cNG engine
(covariance._projected_trispectrum_lattice): separable default
(response table at the model pivot scaled by D^2(z)/D_piv^2 per leg
pair) with ``exact_z_anchors`` upgrading to Chebyshev-anchored exact
evolution at ~J halo builds.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, halo, linear
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec, HaloParams

__all__ = [
    "response_one_halo_integrals", "power_responses",
    "power_response_parts",
    "sigma_b2_flat", "sigma_b2_curved", "sigma_b2_fn",
    "projected_ssc", "ssc_covariance", "curved_ssc_covariance",
]


# ---------------------------------------------------------------------------
# Halo-model power-spectrum responses
# ---------------------------------------------------------------------------

def response_one_halo_integrals(cosmo: CosmoParams, halo_p: HaloParams,
                                model, k, with_bao: bool = False,
                                grid: GridSpec = DEFAULT_GRID):
    """Bias-weighted 1-halo integrals (I^b_mm, I^b_gg, I^b_gm)(k) — the
    response of each 1-halo term to a background mode through the
    modulated halo abundance dn/dM (1 + b(M) delta_b):

      I^b_mm = ∫ f(nu) b(nu) (M/rho_bar) y^2 dnu     (Takada & Hu I_1^2)
      I^b_gg = (1/n_g^2) ∫ dn/dlnM b <N(N-1)> y^p dlnM
      I^b_gm = (1/(n_g rho_bar)) ∫ dn/dlnM b M <N> y^p' dlnM

    with the same Scranton y-exponent switches as
    halo.one_halo_integrals (the response inherits the 1-halo term's
    convention exactly)."""
    t = model.mass
    y = halo._y_matrix(cosmo, halo_p, model, k)
    f_dnu = t.f_nu * t.dnu_dlnm
    hp = jax.lax.Precision.HIGHEST
    i_mm = jnp.matmul(y * y, t.w_lnm * f_dnu * t.bias * t.m / cosmo.rho_bar,
                      precision=hp)
    g = model.gal
    y_g = halo._y_gal(cosmo, halo_p, model, k)
    y_gg = jnp.where(g.ln_m[None, :] < model.ln_m_sw2, y_g, y_g * y_g)
    i_gg = jnp.matmul(y_gg, g.w_lnm * g.dndlnm * g.bias * g.n_second,
                      precision=hp) / model.n_g**2
    y_gm = jnp.where(g.ln_m[None, :] < model.ln_m_sw1, y_g, y_g * y_g)
    i_gm = jnp.matmul(y_gm, g.w_lnm * g.dndlnm * g.bias * g.m * g.n_first,
                      precision=hp) / (model.n_g * cosmo.rho_bar)
    return i_mm, i_gg, i_gm


def _dln_k3p_dlnk(cosmo: CosmoParams, k, with_bao: bool = False):
    """dln(k^3 P_lin)/dln k = 3 + n_s + 2 dln T/dln k — analytic EH98
    log-derivative via autodiff (z-independent: growth is
    scale-independent)."""
    lnk = jnp.log(jnp.atleast_1d(jnp.asarray(k)))

    def ln_t(u):
        return jnp.log(linear.transfer(cosmo, jnp.exp(u), with_bao))

    dlnt = jax.vmap(jax.grad(ln_t))(lnk)
    return 3.0 + cosmo.n_s + 2.0 * dlnt


def power_response_parts(cosmo: CosmoParams, halo_p: HaloParams, model,
                         k, with_bao: bool = False,
                         grid: GridSpec = DEFAULT_GRID,
                         local_counts: bool = True):
    """The response split R_ab = pos_ab - cnt_ab with BOTH parts
    positive and log-smooth — the form the lattice projection
    interpolates.  pos = (68/21 - (1/3) dln k^3 P/dln k) h_a h_b P_lin
    + I^b_ab (the dilation prefactor stays in [1.90, 3.24]: dln k^3
    P_lin/dln k runs 4 -> 0 across the EH98 spectrum, so pos never
    crosses zero), cnt = the number-count response (delta_a,g +
    delta_b,g) b_g P_ab (positive; zero when ``local_counts`` is
    False or for mm).  Log-magnitude interpolation of the COMBINED
    response is catastrophically wrong near its zero crossing at
    k ~ 2/Mpc (measured: 5-8% block errors at ell ~ 3000); each part
    alone interpolates at the 1e-4 level on the n_k_ssc table."""
    k = jnp.atleast_1d(jnp.asarray(k))
    p_lin = halo.linear_power(cosmo, model, k, with_bao, grid)
    h_m, h_g = halo.two_halo_integrals(cosmo, halo_p, model, k)
    i_mm, i_gg, i_gm = response_one_halo_integrals(
        cosmo, halo_p, model, k, with_bao, grid)
    pref = (68.0 / 21.0
            - _dln_k3p_dlnk(cosmo, k, with_bao) / 3.0)
    pos = {"mm": pref * h_m * h_m * p_lin + i_mm,
           "gm": pref * h_m * h_g * p_lin + i_gm,
           "gg": pref * h_g * h_g * p_lin + i_gg}
    zero = jnp.zeros_like(k)
    if local_counts:
        ps = halo.powers(cosmo, halo_p, model, k, with_bao, grid)
        b_g = halo.galaxy_bias_avg(model)
        cnt = {"mm": zero, "gm": b_g * ps["power_gm"],
               "gg": 2.0 * b_g * ps["power_gg"]}
    else:
        cnt = {"mm": zero, "gm": zero, "gg": zero}
    return pos, cnt


def power_responses(cosmo: CosmoParams, halo_p: HaloParams, model, k,
                    with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
                    local_counts: bool = True):
    """dP_ab/ddelta_b(k) for ab in {mm, gm, gg} at the model's redshift
    (dict keyed "mm"/"gm"/"gg").  See the module docstring for the
    assembled formula; shares one y-matrix evaluation across all
    integrals (same pattern as halo.powers)."""
    pos, cnt = power_response_parts(cosmo, halo_p, model, k, with_bao,
                                    grid, local_counts)
    return {ab: pos[ab] - cnt[ab] for ab in ("mm", "gm", "gg")}


# ---------------------------------------------------------------------------
# sigma_b^2(chi): background-mode variance in the footprint
# ---------------------------------------------------------------------------

def _flat_q_grid(mask, n_q: int):
    """Static linear q grid resolving the mask-power oscillations
    (period ~pi x coupling_width for a hard-edged footprint): trapezoid
    up to 60x the coupling width, where the |W2~|^2 ~ q^-3 envelope has
    killed the integrand (tail < 1e-3 of the total, measured on the
    analytic disc)."""
    cw = float(mask.coupling_width)
    q = np.linspace(cw * 1e-4, 60.0 * cw, n_q)
    wq = np.full(n_q, q[1] - q[0])
    wq[0] *= 0.5
    wq[-1] *= 0.5
    return q, wq * mask.wtilde2_sq(q) * q / (2.0 * np.pi * mask.area2**2)


def sigma_b2_flat(cosmo: CosmoParams, mask, chi, growth,
                  with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
                  n_q: int = 3072):
    """sigma_b^2 at comoving distances ``chi`` (traced vector) for a
    flat-sky mask (mask.DiscMask / PixelMask / UniformMask — the last
    mapped to an equal-area disc: SSC needs a footprint SHAPE, and the
    disc is the standard compact choice).  ``growth`` = D(z(chi)) at
    the nodes (P_lin(k, z) = D^2 P_lin(k, 0) exactly here)."""
    from chomp_tpu.mask import DiscMask, UniformMask

    if isinstance(mask, UniformMask):
        mask = DiscMask(float(np.sqrt(mask.omega_s_sr / np.pi)))
    q, w_eff = _flat_q_grid(mask, n_q)
    chi = jnp.atleast_1d(jnp.asarray(chi))
    kq = jnp.asarray(q)[None, :] / chi[:, None]          # (m, nq)
    p0 = linear.linear_power(cosmo, kq, 0.0, with_bao, grid)
    s = jnp.matmul(p0, jnp.asarray(w_eff),
                   precision=jax.lax.Precision.HIGHEST)
    return s * growth**2 / chi**2


@lru_cache(maxsize=32)
def _mask_cl_coeffs(mask, lmax: int):
    """Legendre coefficients c_l of xi_W2(mu) = sum_l c_l P_l(mu) by
    Gauss-Legendre quadrature (numpy, cached per mask): the per-l mask
    power is sum_m |(W^2)_lm|^2 = 4 pi c_l.  Tiny negative c_l are
    quadrature/band-limit noise around zero (the exact values are
    non-negative) and are clipped."""
    from chomp_tpu.curved import _legendre_all

    x, wq = np.polynomial.legendre.leggauss(max(2 * lmax, 512))
    xi = np.asarray(mask.xi_w2(x), dtype=float)
    p = _legendre_all(lmax, x)
    c = (np.arange(lmax + 1) + 0.5) * (p @ (wq * xi))
    return np.maximum(c, 0.0)


def sigma_b2_curved(cosmo: CosmoParams, mask, chi, growth,
                    with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
                    lmax: int | None = None):
    """sigma_b^2 at distances ``chi`` for a curved-sky mask (any object
    with xi_w2/area2 — curved.SphericalCapMask, ProfileCurvedMask,
    PixelSphereMask, UniformSphereMask).  Limber per-l shell power
    C_l^delta = P_lin((l+1/2)/chi, z)/chi^2 summed against the mask's
    per-l power; UniformSphereMask reduces to the exact full-sky
    C_0/(4 pi) (only the monopole survives)."""
    if lmax is None:
        lmax = int(min(max(256.0, 24.0 * max(mask.coupling_ell, 1.0)),
                       3072.0))
    c_l = _mask_cl_coeffs(mask, lmax)
    ell = np.arange(lmax + 1, dtype=float)
    chi = jnp.atleast_1d(jnp.asarray(chi))
    kq = jnp.asarray(ell + 0.5)[None, :] / chi[:, None]   # (m, nl)
    p0 = linear.linear_power(cosmo, kq, 0.0, with_bao, grid)
    w_eff = 4.0 * np.pi * c_l / mask.area2**2
    s = jnp.matmul(p0, jnp.asarray(w_eff),
                   precision=jax.lax.Precision.HIGHEST)
    return s * growth**2 / chi**2


def sigma_b2_fn(cosmo: CosmoParams, mask, geometry: str = "flat",
                with_bao: bool = False, grid: GridSpec = DEFAULT_GRID):
    """(chi, growth) -> sigma_b^2 closure dispatching on geometry, with
    the float-Omega_s conveniences of the covariance builders: a bare
    solid angle becomes an equal-area disc (flat) / polar cap
    (curved)."""
    if isinstance(mask, (int, float)):
        omega = float(mask)
        if geometry == "curved":
            from chomp_tpu.curved import SphericalCapMask
            mask = SphericalCapMask(
                float(np.arccos(np.clip(1.0 - omega / (2.0 * np.pi),
                                        -1.0, 1.0))))
        else:
            from chomp_tpu.mask import DiscMask
            mask = DiscMask(float(np.sqrt(omega / np.pi)))
    if geometry == "curved":
        return lambda chi, g: sigma_b2_curved(cosmo, mask, chi, g,
                                              with_bao, grid)
    return lambda chi, g: sigma_b2_flat(cosmo, mask, chi, g,
                                        with_bao, grid)


# ---------------------------------------------------------------------------
# Lattice-projected SSC blocks (gather-free, same design as
# covariance._projected_trispectrum_lattice)
# ---------------------------------------------------------------------------

def _pair_kind(ta: str, tb: str) -> str:
    return ("mm", "gm", "gg")[(ta == "g") + (tb == "g")]


def _ln_floor(x):
    """ln(max(x, tiny)) — the dtype-aware floor that keeps the dense
    log-magnitude interpolation NaN-free on a part table that touches
    zero (the mm counts part is identically zero)."""
    return jnp.log(jnp.maximum(x, jnp.finfo(jnp.result_type(x)).tiny))


def projected_ssc(cosmo: CosmoParams, halo_p: HaloParams, model,
                  ells_i, ells_j, windows, tracers, sigma_fn,
                  with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
                  n_k_ssc: int = 128, u_stride: int = 4,
                  exact_z_anchors: int | None = None,
                  local_counts: bool = True):
    """Cov_SSC(l1, l2) between probe pair A = (windows[0] x windows[1],
    tracers[0:2]) at multipoles ``ells_i`` and pair B = (windows[2] x
    windows[3], tracers[2:4]) at ``ells_j`` (concrete numpy grids).

    The chi integral runs on the same static strided ln-chi lattice
    nodes as the cNG projection, so every response query
    ln k = ln(l + 1/2) - ln chi_m is a STATIC 2-tap weight row against
    a response table on the static ln-k grid — the per-node SSC
    integrand is rank-1 in (l1, l2), and the whole block is three
    einsums (no dynamic gathers).  The gg/gm responses CROSS ZERO near
    k ~ 2/Mpc (the counts term overtakes), so the table is kept as the
    two positive log-smooth parts of power_response_parts, each
    log-magnitude interpolated, and subtracted at the query points.

    ``model`` may be a single HaloModel or a (model_A, model_B) pair
    (per-side galaxy samples, e.g. different lens-bin HODs).
    ``sigma_fn(chi, growth) -> sigma_b^2`` comes from sigma_b2_fn.
    Separable default scales each side's pivot response by
    D^2(z)/D_piv^2; ``exact_z_anchors`` = J upgrades to Chebyshev-
    anchored exact evolution (J extra halo builds per distinct side)."""
    import functools

    from chomp_tpu import limber_fft
    from chomp_tpu.covariance import (_tri_lattice_indices,
                                      _tri_model_at, _tri_query_weights)

    ells_np_i = np.asarray(ells_i, dtype=np.float64)
    ells_np_j = np.asarray(ells_j, dtype=np.float64)
    model_a, model_b = model if isinstance(model, tuple) else (model, model)
    kind_i = _pair_kind(tracers[0], tracers[1])
    kind_j = _pair_kind(tracers[2], tracers[3])

    # Static response-table k grid + per-side 2-tap query weights.
    ln_k_np = np.linspace(np.log(grid.k_table_min),
                          np.log(grid.k_table_max), n_k_ssc)
    kk = jnp.asarray(np.exp(ln_k_np))
    dln = ln_k_np[1] - ln_k_np[0]
    (u_lo, u_hi, u_step), wu = _tri_lattice_indices(windows, grid, u_stride)
    _, ln_chi_full = limber_fft._lattices(grid)
    u_nodes_np = ln_chi_full[u_lo:u_hi:u_step]
    w_i = jnp.asarray(_tri_query_weights(ells_np_i, u_nodes_np,
                                         ln_k_np[0], dln, n_k_ssc))
    w_j = jnp.asarray(_tri_query_weights(ells_np_j, u_nodes_np,
                                         ln_k_np[0], dln, n_k_ssc))

    # Node geometry + window products (full lattice, then static slice).
    chi_f, z_f, z_mid_f = limber_fft._lattice_z(cosmo, grid)
    w_lat = [limber_fft._window_on_lattice(cosmo, w_, z_f, chi_f, grid,
                                           z_mid_f) for w_ in windows]

    def _sel(x):
        return jax.lax.slice_in_dim(x, u_lo, u_hi, stride=u_step)

    chi, z = _sel(chi_f), _sel(z_f)
    w_pair_i = _sel(w_lat[0]) * _sel(w_lat[1])
    w_pair_j = _sel(w_lat[2]) * _sel(w_lat[3])
    # Shared physical z cutoff + fractional-cell edge ramp — identical
    # to the cNG projection (see _projected_trispectrum_lattice for the
    # 1/chi^4-divergence and stride-monotonicity rationale).
    sups = [w_.support() for w_ in windows]
    z_cut_lo = functools.reduce(jnp.maximum,
                                [jnp.asarray(s[0]) for s in sups],
                                jnp.asarray(1e-3))
    z_cut_hi = jnp.maximum(functools.reduce(
        jnp.minimum, [jnp.asarray(s[1]) for s in sups]), z_cut_lo)
    du = grid.lattice_dln * u_step
    u_nodes = jnp.asarray(u_nodes_np)
    u_cut_lo = jnp.log(background.comoving_distance(cosmo, z_cut_lo,
                                                    grid.n_dist))
    u_cut_hi = jnp.log(background.comoving_distance(cosmo, z_cut_hi,
                                                    grid.n_dist))
    ramp = (jnp.clip((u_nodes - u_cut_lo) / du + 0.5, 0.0, 1.0)
            * jnp.clip((u_cut_hi - u_nodes) / du + 0.5, 0.0, 1.0))
    d_u = background.growth_factor(cosmo, z, grid.n_growth)
    sigma2 = sigma_fn(chi, d_u)
    # d chi = chi du; the two 1/chi^2 Limber weights give 1/chi^4.
    base_wgt = (w_pair_i * w_pair_j / chi**4 * chi * jnp.asarray(wu)
                * ramp * sigma2)

    hp = jax.lax.Precision.HIGHEST

    def _part_query(w_side, part_tab):
        """2-tap log-magnitude query of ONE positive part table
        ((n_k,) separable or (m, n_k) anchor-mixed); the response at
        the query points is pos - cnt AFTER each part interpolates —
        see power_response_parts for why the combined response must
        not be interpolated."""
        ln_tab = _ln_floor(part_tab)
        if ln_tab.ndim == 1:
            ln_q = jnp.einsum("mai,i->ma", w_side, ln_tab, precision=hp)
        else:
            ln_q = jnp.einsum("mai,mi->ma", w_side, ln_tab, precision=hp)
        return jnp.exp(ln_q)

    def _resp_query(w_side, pos_tab, cnt_tab):
        return _part_query(w_side, pos_tab) - _part_query(w_side, cnt_tab)

    if exact_z_anchors:
        from chomp_tpu.limber_fft import _barycentric_rows, _cheb_nodes

        try:
            z_lo_c = max(max(float(np.asarray(w_.support()[0]))
                             for w_ in windows), 1e-3)
            z_hi_c = max(min(float(np.asarray(w_.support()[1]))
                             for w_ in windows), z_lo_c + 0.05)
        except Exception as exc:
            raise ValueError(
                "exact_z_anchors needs concrete window supports for "
                "the static Chebyshev anchor span") from exc
        z_nodes, w_bary = _cheb_nodes(z_lo_c, z_hi_c, exact_z_anchors)
        lag = _barycentric_rows(jnp.clip(z, z_lo_c, z_hi_c), z_nodes,
                                w_bary)                    # (m, J)

        def anchor_tables(mdl, kind):
            def r_at(z_jj):
                m_j = _tri_model_at(cosmo, halo_p, mdl, z_jj,
                                    with_bao, grid)
                d_j = m_j.mass.growth
                pos, cnt = power_response_parts(cosmo, halo_p, m_j, kk,
                                                with_bao, grid,
                                                local_counts)
                return pos[kind] / d_j**2, cnt[kind] / d_j**2

            return jax.lax.map(r_at, jnp.asarray(z_nodes))  # 2x (J, n_k)

        tabs_a = anchor_tables(model_a, kind_i)
        if model_b is model_a and kind_j == kind_i:
            tabs_b = tabs_a
        else:
            tabs_b = anchor_tables(model_b, kind_j)

        def mix(tabs):
            # Barycentric-mix each positive part separately; Chebyshev
            # interpolation of a positive log-smooth table stays
            # positive (the _ln_floor guards the rare undershoot).
            return tuple(jnp.einsum("mj,ji->mi", lag, t, precision=hp)
                         * (d_u**2)[:, None] for t in tabs)

        r_q_i = _resp_query(w_i, *mix(tabs_a))
        r_q_j = _resp_query(w_j, *mix(tabs_b))
        return jnp.einsum("m,ma,mb->ab", base_wgt, r_q_i, r_q_j,
                          precision=hp)

    # Separable default: pivot response tables, D^2 scaling per side.
    parts_a = power_response_parts(cosmo, halo_p, model_a, kk, with_bao,
                                   grid, local_counts)
    pos_a, cnt_a = parts_a[0][kind_i], parts_a[1][kind_i]
    if model_b is model_a and kind_j == kind_i:
        pos_b, cnt_b = pos_a, cnt_a
    else:
        parts_b = power_response_parts(cosmo, halo_p, model_b, kk,
                                       with_bao, grid, local_counts)
        pos_b, cnt_b = parts_b[0][kind_j], parts_b[1][kind_j]
    piv = (model_a.mass.growth, model_b.mass.growth)
    scale = (d_u / piv[0]) ** 2 * (d_u / piv[1]) ** 2
    r_q_i = _resp_query(w_i, pos_a, cnt_a)
    r_q_j = _resp_query(w_j, pos_b, cnt_b)
    return jnp.einsum("m,ma,mb->ab", base_wgt * scale, r_q_i, r_q_j,
                      precision=hp)


# ---------------------------------------------------------------------------
# Real-space covariance blocks
# ---------------------------------------------------------------------------

def _pair_norm_factor(mask, edges_rad, geometry: str):
    """Per-side estimator-normalization factor Omega_bin * A2 / D_i for
    a pair-count-normalized estimator on a footprint (-> 1 for a
    uniform mask / bare-Omega input, and for bins well inside the
    footprint) — the SSC analog of the cNG engine's
    area4 * ann / (D_i D_j) weighting."""
    if isinstance(mask, (int, float)):
        return np.ones(len(edges_rad) - 1)
    if geometry == "curved":
        from chomp_tpu.curved import curved_pair_normalization
        omega_bin = 2.0 * np.pi * (np.cos(edges_rad[:-1])
                                   - np.cos(edges_rad[1:]))
        d_i = curved_pair_normalization(mask, edges_rad)
    else:
        from chomp_tpu.mask import UniformMask, pair_normalization
        if isinstance(mask, UniformMask):
            return np.ones(len(edges_rad) - 1)
        omega_bin = np.pi * (edges_rad[1:] ** 2 - edges_rad[:-1] ** 2)
        d_i = pair_normalization(mask, edges_rad)
    return omega_bin * mask.area2 / np.maximum(d_i, 1e-300)


def ssc_covariance(cosmo: CosmoParams, halo_p: HaloParams, model, dist,
                   theta_edges_deg, mask, windows=None, tracers=None,
                   mu_i: int = 0, mu_j: int = 0,
                   theta_edges_deg_j=None, with_bao: bool = False,
                   grid: GridSpec = DEFAULT_GRID, n_ell_cov: int = 96,
                   ell_lo: float = 1.0, ell_hi: float = 1.0e5,
                   n_k_ssc: int = 128, u_stride: int = 4,
                   exact_z_anchors: int | None = None,
                   local_counts: bool = True):
    """Flat-sky super-sample covariance block for binned real-space
    statistics — same block interface as
    covariance.nongaussian_covariance (windows/tracers select the
    probe pair on each side, mu_i/mu_j the Bessel orders).  ``mask``
    is a mask.* object or a bare survey solid angle in sr (mapped to an
    equal-area disc — SSC needs a footprint shape)."""
    from chomp_tpu.covariance import _log_ell_weights, bin_averaged_bessel
    from chomp_tpu.projection import WindowGalaxy

    if windows is None:
        windows = (WindowGalaxy(dist=dist),) * 4
    if tracers is None:
        tracers = ("g",) * 4
    ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
    edges_i = np.radians(np.asarray(theta_edges_deg))
    edges_j = np.radians(np.asarray(
        theta_edges_deg if theta_edges_deg_j is None else theta_edges_deg_j))
    ells = jnp.asarray(ells_np)
    meas = ells**2 * jnp.asarray(w_np) / (2.0 * jnp.pi)
    b_i = bin_averaged_bessel(ells, edges_i, mu_i) * meas[None, :]
    b_j = bin_averaged_bessel(ells, edges_j, mu_j) * meas[None, :]
    sfn = sigma_b2_fn(cosmo, mask, "flat", with_bao, grid)
    cov_ll = projected_ssc(cosmo, halo_p, model, ells_np, ells_np,
                           windows, tracers, sfn, with_bao, grid,
                           n_k_ssc, u_stride, exact_z_anchors,
                           local_counts)
    hp = jax.lax.Precision.HIGHEST
    core = jnp.matmul(jnp.matmul(b_i, cov_ll, precision=hp), b_j.T,
                      precision=hp)
    f_i = _pair_norm_factor(mask, edges_i, "flat")
    f_j = _pair_norm_factor(mask, edges_j, "flat")
    return core * jnp.asarray(np.outer(f_i, f_j))


def curved_ssc_covariance(cosmo: CosmoParams, halo_p: HaloParams, model,
                          dist, theta_edges_deg, mask, windows=None,
                          tracers=None, mu_i=0, mu_j=0,
                          theta_edges_deg_j=None, ell_max: int = 2048,
                          n_ell_tbl: int = 96, with_bao: bool = False,
                          grid: GridSpec = DEFAULT_GRID,
                          n_k_ssc: int = 128, u_stride: int = 4,
                          exact_z_anchors: int | None = None,
                          local_counts: bool = True):
    """Curved-sky SSC block with exact sphere bin factors — the SSC
    analog of curved.curved_nongaussian_covariance: Cov(l, l') built on
    a uniform-ln-l table by the gather-free lattice projection with the
    CURVED sigma_b^2 (per-l mask power), mapped onto integer multipoles
    by a static Catmull-Rom matrix and summed against Legendre/Wigner
    bin factors ((mu) codes {0, 2, "xip", "xim"}).  ``mask`` is any
    curved.* mask or a bare solid angle (mapped to a polar cap)."""
    from chomp_tpu.curved import _curved_bin_factors
    from chomp_tpu.grids import catmull_rom_weights_np
    from chomp_tpu.projection import WindowGalaxy

    if windows is None:
        windows = (WindowGalaxy(dist=dist),) * 4
    if tracers is None:
        tracers = ("g",) * 4
    edges_i = np.radians(np.asarray(theta_edges_deg, dtype=float))
    edges_j = np.radians(np.asarray(
        theta_edges_deg if theta_edges_deg_j is None
        else theta_edges_deg_j, dtype=float))
    ln_tbl = np.linspace(0.0, np.log(ell_max), n_ell_tbl)
    sfn = sigma_b2_fn(cosmo, mask, "curved", with_bao, grid)
    cov_tbl = projected_ssc(cosmo, halo_p, model, np.exp(ln_tbl),
                            np.exp(ln_tbl), windows, tracers, sfn,
                            with_bao, grid, n_k_ssc, u_stride,
                            exact_z_anchors, local_counts)
    ells = np.arange(ell_max + 1)
    pos = np.log(np.maximum(ells, 1.0)) / (ln_tbl[1] - ln_tbl[0])
    w_int = catmull_rom_weights_np(n_ell_tbl, pos)    # (lmax+1, n_tbl)
    meas = (2.0 * ells + 1.0) / (4.0 * np.pi)
    meas[0] = 0.0
    b_i = _curved_bin_factors(mu_i, ell_max, edges_i)
    b_j = _curved_bin_factors(mu_j, ell_max, edges_j)
    m_i = jnp.asarray((b_i * meas[None, :]) @ w_int)
    m_j = jnp.asarray((b_j * meas[None, :]) @ w_int)
    hp = jax.lax.Precision.HIGHEST
    core = jnp.matmul(jnp.matmul(m_i, cov_tbl, precision=hp), m_j.T,
                      precision=hp)
    f_i = _pair_norm_factor(mask, edges_i, "curved")
    f_j = _pair_norm_factor(mask, edges_j, "curved")
    return core * jnp.asarray(np.outer(f_i, f_j))
