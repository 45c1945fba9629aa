"""Halo-model trispectrum T(k1, k2) for power-spectrum covariances.

TPU-native replacement for the reference's ``halo_trispectrum.py``
(upstream:halo_trispectrum.py; SURVEY.md §2 row 8 [M]: "T(k1,k2) 1h..4h
terms + PT kernels (F2/F3) for non-Gaussian covariance, Morrison &
Schneider 2013").  The exact upstream equations were unverifiable (empty
reference mount), so this module implements the standard Cooray-Hu 2001
halo-model decomposition of the ANGLE-AVERAGED PARALLELOGRAM trispectrum
T̄(k1,k2) = <T(q1=k1, q2=-k1, q3=k2, q4=-k2)>_mu — the configuration
entering the P(k)/w(theta) covariance — with every tree-level PT piece
derived from first principles (Wick enumeration of <d2 d2 d1 d1> and
<d3 d1 d1 d1>; the derivation is reproduced in _t_pt_parallelogram's
docstring and cross-validated numerically in the tests).

Halo decomposition, with I_mu^beta(k_1..k_mu) = ∫ dlnM dn/dlnM
(M/rho_bar)^mu b^beta(M) prod_i y(k_i, M):

  T1h    = I_4^0(k1,k1,k2,k2)
  T2h_31 = 2 [ P(k1) I_1^1(k1) I_3^1(k1,k2,k2)
             + P(k2) I_1^1(k2) I_3^1(k2,k1,k1) ]
  T2h_22 = 2 <P(S)>_mu [I_2^1(k1,k2)]^2 ,  S = |k1+k2|
  T3h    = 4 I_2^1(k1,k2) I_1^1(k1) I_1^1(k2) <B_PT(k1,k2,-S)>_mu
  T4h    = [I_1^1(k1)]^2 [I_1^1(k2)]^2  T̄_PT(k1,k2)

All mu-averages use one static GL rule; the P13 closed-form kernel gives
the angle-averaged F3 star terms exactly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import linear
from chomp_tpu.grids import gauss_legendre
from chomp_tpu.halo import HaloModel
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec, HaloParams
from chomp_tpu.profiles import y_nfw


# ---------------------------------------------------------------------------
# PT kernels.
# ---------------------------------------------------------------------------

def f2_scalar(a2, b2, ab):
    """F2 kernel from |a|^2, |b|^2, a.b (standard symmetrized form):
    F2 = 5/7 + (a.b/2)(1/a^2 + 1/b^2) + (2/7)(a.b)^2/(a^2 b^2)."""
    return (5.0 / 7.0
            + 0.5 * ab * (1.0 / a2 + 1.0 / b2)
            + (2.0 / 7.0) * ab * ab / (a2 * b2))


def k13_kernel(r):
    """6 <F3(q, -q, k)>_Omega as a function of r = q/k.

    From the standard 1-loop P13 bracket B(r) (Makino-Sasaki-Suto form),
      P13(k) = k^3 P(k)/(252 * 4 pi^2) ∫ dr P(k r) B(r),
      B(r)   = 12/r^2 - 158 + 100 r^2 - 42 r^4
               + (3/r^3)(r^2-1)^3 (7 r^2 + 2) ln|(1+r)/(1-r)|,
    matched against P13 = 6 P(k) ∫ d^3q/(2 pi)^3 F3(q,-q,k) P(q):
      6 <F3(q,-q,k)>_Omega = B(r) / (504 r^2).

    Cross-validated in tests against direct numerical integration of the
    symmetrized F3 recursion.  The r ~ 1 0*inf is handled by nudging r
    off 1 (the kernel is C^1 there; error O(1e-4))."""
    r = jnp.asarray(r)
    r_safe = jnp.where(jnp.abs(r - 1.0) < 2e-4, 1.0 + 2e-4, r)
    r2 = r_safe * r_safe
    # log1p forms keep the 12/r^2 <-> log cancellation accurate at small r.
    log_term = jnp.where(
        r_safe < 1.0,
        jnp.log1p(r_safe) - jnp.log1p(-jnp.minimum(r_safe, 1.0 - 1e-12)),
        jnp.log1p(r_safe) - jnp.log(jnp.maximum(r_safe - 1.0, 1e-12)),
    )
    bracket = (12.0 / r2 - 158.0 + 100.0 * r2 - 42.0 * r2 * r2
               + 3.0 / (r2 * r_safe) * (r2 - 1.0) ** 3 * (7.0 * r2 + 2.0)
               * log_term)
    return bracket / (504.0 * r2)


def _mu_nodes(grid: GridSpec):
    x, w = gauss_legendre(grid.n_mu)
    return jnp.asarray(x), jnp.asarray(w)


def t_pt_parallelogram(cosmo: CosmoParams, k1, k2, with_bao: bool = False,
                       grid: GridSpec = DEFAULT_GRID, z=0.0):
    """Angle-averaged tree-level PT trispectrum T̄_PT(k1, k2) at
    redshift ``z`` (all linear P factors carry D^2(z)).

    Derivation (Wick enumeration, parallelogram q3=-q1, q4=-q2, P(0)=0
    terms dropped, mu = cos(angle between k1, k2), S(mu) = |k1+k2|,
    folding the |k1-k2| terms into the symmetric mu-average):

      star (d3 d1 d1 d1, 4 placements x 3! contractions):
        12 P1^2 P2 <F3(k1,-k1,k2)> + 12 P2^2 P1 <F3(k2,-k2,k1)>
        = 2 P1^2 P2 K13(k1/k2) + 2 P2^2 P1 K13(k2/k1)

      snake (d2 d2 d1 d1, 6 pair choices x 2 assignments, 2x2 F2-leg
      symmetry factors):
        < P(S) [ 16 F2(-k1,S)F2(-k2,S) P1 P2
                 + 8 F2(-k1,S)^2 P1^2 + 8 F2(-k2,S)^2 P2^2 ] >_mu

    with the scalar F2 arguments a.b = -(k1^2 + k1 k2 mu) etc.  Note
    F2(-k_i, S) stays finite as S -> 0 because (-k_i).S ∝ S^2.
    """
    k1 = jnp.asarray(k1)
    k2 = jnp.asarray(k2)
    p1 = linear.linear_power(cosmo, k1, z, with_bao, grid)
    p2 = linear.linear_power(cosmo, k2, z, with_bao, grid)

    star = (2.0 * p1 * p1 * p2 * k13_kernel(k1 / k2)
            + 2.0 * p2 * p2 * p1 * k13_kernel(k2 / k1))

    mu, w_mu = _mu_nodes(grid)
    k1e = k1[..., None]
    k2e = k2[..., None]
    s2 = k1e**2 + k2e**2 + 2.0 * k1e * k2e * mu
    s2 = jnp.maximum(s2, 1e-20)
    s = jnp.sqrt(s2)
    ps = linear.linear_power(cosmo, s, z, with_bao, grid)
    # a = -k1, b = S = k1 + k2:  a.b = -(k1^2 + k1 k2 mu)
    ab1 = -(k1e**2 + k1e * k2e * mu)
    ab2 = -(k2e**2 + k1e * k2e * mu)
    f2_1 = f2_scalar(k1e**2, s2, ab1)
    f2_2 = f2_scalar(k2e**2, s2, ab2)
    snake_integrand = ps * (16.0 * f2_1 * f2_2 * p1[..., None] * p2[..., None]
                            + 8.0 * f2_1 * f2_1 * p1[..., None] ** 2
                            + 8.0 * f2_2 * f2_2 * p2[..., None] ** 2)
    snake = 0.5 * jnp.sum(snake_integrand * w_mu, axis=-1)  # <.> = (1/2)∫dmu
    return star + snake


def b_pt_avg(cosmo: CosmoParams, k1, k2, with_bao: bool = False,
             grid: GridSpec = DEFAULT_GRID, z=0.0):
    """<B_PT(k1, k2, -S)>_mu at redshift ``z``, with
    B_PT(q1,q2,q3) = 2F2(q1,q2)P1P2 + cyc."""
    k1 = jnp.asarray(k1)
    k2 = jnp.asarray(k2)
    p1 = linear.linear_power(cosmo, k1, z, with_bao, grid)
    p2 = linear.linear_power(cosmo, k2, z, with_bao, grid)
    mu, w_mu = _mu_nodes(grid)
    k1e = k1[..., None]
    k2e = k2[..., None]
    k1k2 = k1e * k2e * mu
    s2 = jnp.maximum(k1e**2 + k2e**2 + 2.0 * k1k2, 1e-20)
    s = jnp.sqrt(s2)
    ps = linear.linear_power(cosmo, s, z, with_bao, grid)
    # F2(k1,k2): a.b = k1 k2 mu
    f12 = f2_scalar(k1e**2, k2e**2, k1k2)
    # F2(k2,-S): a.b = -(k2^2 + k1 k2 mu)
    f2s = f2_scalar(k2e**2, s2, -(k2e**2 + k1k2))
    # F2(-S,k1): a.b = -(k1^2 + k1 k2 mu)
    fs1 = f2_scalar(s2, k1e**2, -(k1e**2 + k1k2))
    b = (2.0 * f12 * p1[..., None] * p2[..., None]
         + 2.0 * f2s * p2[..., None] * ps
         + 2.0 * fs1 * ps * p1[..., None])
    return 0.5 * jnp.sum(b * w_mu, axis=-1)


# ---------------------------------------------------------------------------
# Halo-model assembly.
# ---------------------------------------------------------------------------

def _i_mu_beta(cosmo: CosmoParams, halo: HaloParams, model: HaloModel,
               y_list, mu_exp: int, beta: int):
    """I_mu^beta = ∫ dlnM dn/dlnM (M/rho_bar)^mu b^beta prod(y_i);
    ``y_list``: list of (nk..., nM) y-factors sharing the mass axis."""
    t = model.mass
    weight = t.w_lnm * t.dndlnm * (t.m / cosmo.rho_bar) ** mu_exp
    if beta:
        weight = weight * t.bias
    prod = weight
    for y in y_list:
        prod = prod * y
    return jnp.sum(prod, axis=-1)


def trispectrum_parallelogram_tracers(cosmo: CosmoParams, halo: HaloParams,
                                      model: HaloModel, k1, k2,
                                      tracers=("m", "m", "m", "m"),
                                      with_bao: bool = False,
                                      grid: GridSpec = DEFAULT_GRID,
                                      terms=("1h", "2h", "3h", "4h")):
    """Mixed-tracer parallelogram trispectrum T̄^{abcd}(k1, k2).

    Legs 0/1 carry (k1, -k1) with tracers[0]/tracers[1]; legs 2/3 carry
    (k2, -k2) with tracers[2]/tracers[3].  Each tracer is ``"m"`` (matter,
    leg factor M/rho_bar) or ``"g"`` (HOD galaxies; p same-halo galaxy
    legs contribute the factorial moment <(N)_p>/n_g^p).  This is the
    trispectrum family behind the cross-probe (clustering x g-g lensing)
    covariance blocks of the Morrison & Schneider 2013 program that
    chomp's covariance.py serves (upstream:covariance.py /
    upstream:halo_trispectrum.py; SURVEY.md §2 rows 8 & 13):

      gg x gg : ("g","g","g","g")     gg x gt : ("g","g","g","m")
      gt x gt : ("g","m","g","m")     mm x mm : ("m","m","m","m")

    Halo decomposition (Cooray-Hu 2001 generalized to distinct legs; the
    same Wick enumeration as :func:`t_pt_parallelogram`, with the
    uniform-tracer degeneracy factors 2/2/4 expanded into explicit sums
    over leg choices):

      1h    = U^0(0123)
      2h_31 = sum_i P(k_i) U^1(i) U^1(rest)
      2h_22 = <P(S)>_mu [ U^1(02) U^1(13) + U^1(03) U^1(12) ]
      3h    = <B_PT>_mu sum_{(i,j) in opposite pairs} U^1(ij) U^1(k) U^1(l)
      4h    = U^1(0) U^1(1) U^1(2) U^1(3) T̄_PT(k1, k2)

    where "opposite pairs" are the four (leg-at-k1, leg-at-k2) choices —
    same-k pairs carry P(0) = 0 and drop.  For uniform tracers this
    reduces EXACTLY to the classic 2/2/4 coefficients (tested).

    ``model`` is ONE HaloModel (every "g" leg = the same galaxy sample)
    OR a sequence of FOUR per-leg HaloModels sharing mass tables
    (halo.build_halo_models) — the multi-sample trispectrum behind
    per-bin-HOD tomographic cNG blocks.  Same-halo galaxy legs from
    distinct samples take the independent-occupation product moment
    <(N_A)_p (N_B)_q> = <(N_A)_p><(N_B)_q> (the convention of
    halo.power_gg_cross), integrated on the breakpoint-union pack
    (halo.union_gal_pack).  Entries at "m" legs are ignored; a
    4-sequence of identical models reproduces the single-model result
    exactly (same quadrature packs, tested)."""
    from chomp_tpu.halo import union_gal_pack

    k1 = jnp.asarray(k1)
    k2 = jnp.asarray(k2)
    if isinstance(model, (list, tuple)):
        if len(model) != 4:
            raise ValueError(f"per-leg models: need 4, got {len(model)}")
        leg_models = list(model)
        model = leg_models[0]
    else:
        leg_models = [model] * 4
    # Distinct galaxy samples by object identity (trace-time Python).
    samples: list = []
    leg_sample: list = [None] * 4
    for i in range(4):
        if tracers[i] != "g":
            continue
        for s, m_s in enumerate(samples):
            if leg_models[i] is m_s:
                leg_sample[i] = s
                break
        else:
            leg_sample[i] = len(samples)
            samples.append(leg_models[i])
    t = model.mass
    zm = t.z  # all P factors at the model's redshift (halo U's already are)
    p1 = linear.linear_power(cosmo, k1, zm, with_bao, grid)
    p2 = linear.linear_power(cosmo, k2, zm, with_bao, grid)

    # Quadrature packs, (w_lnm, dndlnm, bias, m) per key: "t" for
    # pure-matter integrals (mass-table rule), a sample index for
    # single-sample galaxy integrals (that sample's kink-refined pack),
    # "u" for mixed-sample integrals (breakpoint-union pack, built
    # lazily at most once).
    _packs: dict = {"t": (t.w_lnm, t.dndlnm, t.bias, t.m)}

    def _pack(key):
        if key not in _packs:
            if key == "u":
                _, w_u, m_u, dn_u, b_u = union_gal_pack(
                    cosmo, halo, samples, with_bao, grid)
                _packs["u"] = (w_u, dn_u, b_u, m_u)
            else:
                g_s = samples[key].gal
                _packs[key] = (g_s.w_lnm, g_s.dndlnm, g_s.bias, g_s.m)
        return _packs[key]

    # y(k, M) built lazily per (pack, k-group) — the y matrices are the
    # dominant eager cost and uniform-tracer calls only ever touch two
    # pack keys.
    _y_cache: dict = {}

    def _y(pack_key, i):
        key = (pack_key, 0 if i < 2 else 2)    # legs 0/1 share k1, 2/3 k2
        if key not in _y_cache:
            m_nodes = _pack(pack_key)[3]
            kk = k1 if i < 2 else k2
            _y_cache[key] = y_nfw(cosmo, halo, kk[..., None], m_nodes,
                                  model.m_star, t.z)
        return _y_cache[key]

    _u_cache: dict = {}

    def u(leg_idx, beta):
        """U^beta over the given legs: ∫ dlnM dn/dlnM b^beta
        prod_s <(N_s)_{p_s}>/n_{g,s}^{p_s} (M/rho_bar)^q
        prod_i y(k_i, M).  Memoized on the (sorted legs, beta) key —
        the 2h/3h/4h assembly reuses the single-leg integrals many
        times."""
        key = (tuple(sorted(leg_idx)), beta)
        if key in _u_cache:
            return _u_cache[key]
        gal_legs = [i for i in leg_idx if tracers[i] == "g"]
        n_mat = len(leg_idx) - len(gal_legs)
        if gal_legs:
            counts: dict = {}
            for i in gal_legs:
                counts[leg_sample[i]] = counts.get(leg_sample[i], 0) + 1
            pack_key = (next(iter(counts)) if len(counts) == 1 else "u")
            w_lnm, dndlnm, bias, m_nodes = _pack(pack_key)
            w = w_lnm * dndlnm
            for s, p in counts.items():
                w = w * (samples[s].hod.nth_moment(m_nodes, p)
                         / samples[s].n_g ** p)
            if n_mat:
                w = w * (m_nodes / cosmo.rho_bar) ** n_mat
            if beta:
                w = w * bias
            prod = w
            for i in leg_idx:
                prod = prod * _y(pack_key, i)
        else:
            w = t.w_lnm * t.dndlnm * (t.m / cosmo.rho_bar) ** n_mat
            if beta:
                w = w * t.bias
            prod = w
            for i in leg_idx:
                prod = prod * _y("t", i)
        out = jnp.sum(prod, axis=-1)
        _u_cache[key] = out
        return out

    p_of = {0: p1, 1: p1, 2: p2, 3: p2}
    opposite_pairs = ((0, 2), (0, 3), (1, 2), (1, 3))

    total = jnp.zeros(jnp.broadcast_shapes(k1.shape, k2.shape))
    if "1h" in terms:
        total = total + u((0, 1, 2, 3), 0)
    if "2h" in terms:
        t2h_31 = sum(
            p_of[i] * u((i,), 1)
            * u(tuple(j for j in range(4) if j != i), 1)
            for i in range(4))
        mu, w_mu = _mu_nodes(grid)
        s2 = jnp.maximum(k1[..., None] ** 2 + k2[..., None] ** 2
                         + 2.0 * k1[..., None] * k2[..., None] * mu, 1e-20)
        ps_avg = 0.5 * jnp.sum(
            linear.linear_power(cosmo, jnp.sqrt(s2), zm, with_bao, grid)
            * w_mu, axis=-1)
        t2h_22 = ps_avg * (u((0, 2), 1) * u((1, 3), 1)
                           + u((0, 3), 1) * u((1, 2), 1))
        total = total + t2h_31 + t2h_22
    if "3h" in terms:
        b_avg = b_pt_avg(cosmo, k1, k2, with_bao, grid, z=zm)
        t3h = sum(
            u(pair, 1)
            * u((tuple(j for j in range(4) if j not in pair)[0],), 1)
            * u((tuple(j for j in range(4) if j not in pair)[1],), 1)
            for pair in opposite_pairs)
        total = total + b_avg * t3h
    if "4h" in terms:
        total = total + (u((0,), 1) * u((1,), 1) * u((2,), 1) * u((3,), 1)
                         * t_pt_parallelogram(cosmo, k1, k2, with_bao, grid,
                                              z=zm))
    return total


def trispectrum_parallelogram(cosmo: CosmoParams, halo: HaloParams,
                              model: HaloModel, k1, k2,
                              with_bao: bool = False,
                              grid: GridSpec = DEFAULT_GRID,
                              terms=("1h", "2h", "3h", "4h")):
    """T̄(k1, k2): angle-averaged parallelogram MATTER trispectrum
    (chomp ``halo_trispectrum.HaloTrispectrum`` equivalent).  ``k1``/
    ``k2`` broadcast; returns their broadcast shape."""
    return trispectrum_parallelogram_tracers(
        cosmo, halo, model, k1, k2, ("m", "m", "m", "m"), with_bao, grid,
        terms)


def trispectrum_parallelogram_galaxy(cosmo: CosmoParams, halo: HaloParams,
                                     model: HaloModel, k1, k2,
                                     with_bao: bool = False,
                                     grid: GridSpec = DEFAULT_GRID,
                                     terms=("1h", "2h", "3h", "4h")):
    """Galaxy-field T̄_gg(k1, k2): same decomposition as
    :func:`trispectrum_parallelogram` with I -> J (HOD factorial-moment
    weights / n_g powers) — the trispectrum entering the w_gg(theta)
    covariance (chomp covariance.py's use case)."""
    return trispectrum_parallelogram_tracers(
        cosmo, halo, model, k1, k2, ("g", "g", "g", "g"), with_bao, grid,
        terms)
