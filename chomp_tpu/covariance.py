"""Covariance of w(theta) / gamma_t bins: Gaussian + shot + trispectrum.

TPU-native replacement for the reference's ``covariance.py``
(upstream:covariance.py; SURVEY.md §2 row 13 [M]: "Gaussian + shot-noise
+ trispectrum covariance of w(theta) bins for a survey area", Morrison &
Schneider 2013 — which pairs galaxy clustering w_gg with galaxy-galaxy
lensing gamma_t).  For bin-averaged estimators over annuli
[theta_i^-, theta_i^+] in a survey of solid angle Omega_s:

Generic Gaussian block for two 2-pt estimators w^(ab), w^(cd)
(a..d tracer fields; mu = 0 for J0/w, 2 for J2/gamma_t):

  Cov_G[i,j] = (1/Omega_s) ∫ l dl/(2 pi) Jbar^mu_i(l) Jbar^mu'_j(l)
                 [ Ct_ac Ct_bd + Ct_ad Ct_bc ],   Ct = C_l + N

with noise N_gg = 1/n2d (shot), N_kk = shape noise, N_gk = 0.  The pure
noise x noise constant is excluded from the quadrature and added back
analytically through the Bessel closure
∫ l Jbar^mu_i Jbar^mu_j dl = 2 delta_ij/(th+^2 - th-^2) (any mu).

  Cov_NG[i,j] = (1/Omega_s) ∬ (l dl/2pi)(l' dl'/2pi)
                  Jbar^mu_i(l) Jbar^mu'_j(l') T^{abcd}_proj(l, l')
  T^{abcd}_proj(l,l') = ∫ dchi W_a W_b W_c W_d/chi^6 (D/D_pivot)^6
                  T̄^{abcd}((l+1/2)/chi, (l'+1/2)/chi)

with the bin-averaged Bessel factors (both closed-form)
  Jbar^0_i(l) = 2 [ x J1(x) ]_{x-}^{x+} / (l^2 (th+^2 - th-^2))
  Jbar^2_i(l) = 2 [ -x J1(x) - 2 J0(x) ]_{x-}^{x+} / (l^2 (th+^2-th-^2)),
(x = l theta; the J2 antiderivative is ∫ x J2 dx = -x J1 - 2 J0), the
mixed-tracer angle-averaged parallelogram trispectrum T̄^{abcd} from
chomp_tpu.trispectrum, and the same separable-growth approximation the
rest of the pipeline uses (exact for the tree-PT 4h term; leading order
for 1h-3h, mirroring chomp's separable P(k) treatment; ``exact_z=True``
rebuilds the halo model per projection node instead).

Everything is dense linear algebra:  Cov_G = B diag(g) B^T and
Cov_NG = (1/Omega_s) B T_proj B'^T with B[i, l] = Jbar_i(l) — two matmuls
on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, linear, trispectrum
from chomp_tpu.grids import gl_fixed
from chomp_tpu.halo import HaloModel
from chomp_tpu.params import C_OVER_H0, DEFAULT_GRID, CosmoParams, GridSpec, HaloParams
from chomp_tpu.special import j0, j1


def theta_bin_edges_deg(grid: GridSpec = DEFAULT_GRID, n_bins: int = 16):
    """Log-spaced bin edges over the default theta range."""
    return np.logspace(np.log10(grid.theta_min_deg),
                       np.log10(grid.theta_max_deg), n_bins + 1)


def bin_averaged_j0(ells, edges_rad):
    """Jbar_i(l): (n_bins, n_ell)."""
    ells = jnp.asarray(ells)
    lo = jnp.asarray(edges_rad[:-1])[:, None]
    hi = jnp.asarray(edges_rad[1:])[:, None]
    x_hi = hi * ells[None, :]
    x_lo = lo * ells[None, :]
    num = 2.0 * (x_hi * j1(x_hi) - x_lo * j1(x_lo))
    return num / (ells[None, :] ** 2 * (hi * hi - lo * lo))


def bin_averaged_j2(ells, edges_rad):
    """Jbar^2_i(l) for gamma_t bin averages: (n_bins, n_ell).

    (2/(th+^2 - th-^2)) ∫ theta J2(l theta) dtheta, closed form via the
    antiderivative ∫ x J2(x) dx = -x J1(x) - 2 J0(x) (from
    J2 = 2 J1/x - J0 with ∫ J1 = -J0 and ∫ x J0 = x J1)."""
    ells = jnp.asarray(ells)
    lo = jnp.asarray(edges_rad[:-1])[:, None]
    hi = jnp.asarray(edges_rad[1:])[:, None]
    x_hi = hi * ells[None, :]
    x_lo = lo * ells[None, :]

    def anti(x):
        return -x * j1(x) - 2.0 * j0(x)

    # anti(x) = -2 + x^4/32 - ...: the closed-form difference cancels
    # catastrophically at small x (both values ~ -2).  Below x = 1 use
    # the exact series of ∫_0^x t J2(t) dt = sum_m (-1)^m x^(2m+4)
    # / (2^(2m+2) m! (m+2)! (2m+4)) instead (rel. error < 1e-9 at x=1).
    def anti_series(x):
        x2 = x * x
        return x2 * x2 * (1.0 / 32.0 + x2 * (
            -1.0 / 576.0 + x2 * (1.0 / 24576.0 + x2 * (
                -1.0 / 1843200.0 + x2 / 212336640.0))))

    small = x_hi < 1.0
    num = 2.0 * jnp.where(small, anti_series(x_hi) - anti_series(x_lo),
                          anti(x_hi) - anti(x_lo))
    return num / (ells[None, :] ** 2 * (hi * hi - lo * lo))


def bin_averaged_j4(ells, edges_rad):
    """Jbar^4_i(l) for xi_minus bin averages: (n_bins, n_ell).

    Closed form via the antiderivative
        ∫ x J4(x) dx = x J1(x) + 8 J0(x) - 24 J1(x)/x
    (from x J4 = 6 J3 - x J2 [recurrence J2+J4 = 6 J3/x],
    ∫ J3 = -J0 - 2 J2, ∫ x J2 = -x J1 - 2 J0, then J2 = 2 J1/x - J0).
    The constant term is -4 + O(x^6): below x = 2 the endpoint
    difference cancels catastrophically, so the exact series of
    ∫_0^x t J4(t) dt = sum_m (-1)^m x^(2m+6) / (2^(2m+4) m! (m+4)!
    (2m+6)) is used instead (6 terms: rel. error < 4e-9 at x = 2)."""
    ells = jnp.asarray(ells)
    lo = jnp.asarray(edges_rad[:-1])[:, None]
    hi = jnp.asarray(edges_rad[1:])[:, None]
    x_hi = hi * ells[None, :]
    x_lo = lo * ells[None, :]

    def anti(x):
        x_safe = jnp.maximum(x, 1e-30)
        return x * j1(x) + 8.0 * j0(x) - 24.0 * j1(x_safe) / x_safe

    def anti_series(x):
        x2 = x * x
        x6 = x2 * x2 * x2
        return x6 * (1.0 / 2304.0 + x2 * (
            -1.0 / 61440.0 + x2 * (1.0 / 3686400.0 + x2 * (
                -1.0 / 371589120.0 + x2 * (
                    1.0 / 55490592768.0 - x2 / 11415747624960.0)))))

    small = x_hi < 2.0
    num = 2.0 * jnp.where(small, anti_series(x_hi) - anti_series(x_lo),
                          anti(x_hi) - anti(x_lo))
    return num / (ells[None, :] ** 2 * (hi * hi - lo * lo))


def bin_averaged_bessel(ells, edges_rad, mu: int):
    """Dispatch Jbar^mu (mu = 0 for w(theta)/xi_plus, 2 for gamma_t,
    4 for xi_minus)."""
    if mu == 0:
        return bin_averaged_j0(ells, edges_rad)
    if mu == 2:
        return bin_averaged_j2(ells, edges_rad)
    if mu == 4:
        return bin_averaged_j4(ells, edges_rad)
    raise ValueError(f"unsupported Bessel order mu={mu}")


def xipm_mixed_noise_constant(edges_i_rad, edges_j_rad):
    """Exact ∫_0^∞ l dl Jbar^0_i(l) Jbar^4_j(l) — (nbi, nbj) numpy.

    The xi_plus x xi_minus pure-noise term: the equal-order Bessel
    closure (a delta) does not apply across orders, but the mixed
    integral has a Weber-Schafheitlin closed form,

        G(a, b) = ∫_0^∞ l J0(l a) J4(l b) dl
                = δ(a-b)/a + (4/b^2) (1 - 3 r^2) Θ(b-a),  r = a/b

    — the smooth part is Weber-Schafheitlin (the 2F1(3, -1; 1; r^2)
    hypergeometric terminates), and the SAME delta as the equal-order
    closure survives because J4's asymptotic phase is shifted from
    J0's by exactly 2π: l J0(la) J4(lb) ~ (1/π√(ab)) [cos(l(a-b)) +
    cos(l(a+b) - π/2)], and the first term integrates to π δ(a-b).
    The bare integral is Abel-regularized; the BIN-AVERAGED version
    below is absolutely convergent and is verified against a dense
    12M-point quadrature in tests/test_xipm.py.  Averaging over the
    two annuli (t = theta^2, s = theta'^2, A = hi^2 - lo^2):

        const_ij = (4/(A_i A_j)) ∫_i th dth ∫_j th' dth' G(th, th')

    with the inner t-antiderivative F(t; s) = 2t/s - 3t^2/s^2
    (F(s; s) = -1) and the outer s-antiderivative
    P(t, s) = 2t ln s + 3t^2/s for the smooth part, plus the
    equal-order annulus-overlap closure 2 (th_ovl+^2 - th_ovl-^2)_+ /
    (A_i A_j) from the delta.  All static numpy — the constant enters
    gaussian_block as pref * nn * const / (2 pi), exactly parallel to
    the same-order closure."""
    edges_i = np.asarray(edges_i_rad, dtype=float)
    edges_j = np.asarray(edges_j_rad, dtype=float)
    t_lo = edges_i[:-1] ** 2
    t_hi = edges_i[1:] ** 2
    s_lo = edges_j[:-1] ** 2
    s_hi = edges_j[1:] ** 2
    a_i = t_hi - t_lo
    a_j = s_hi - s_lo

    def p_anti(t, s):
        return 2.0 * t * np.log(s) + 3.0 * t * t / s

    out = np.zeros((len(a_i), len(a_j)))
    for ii in range(len(a_i)):
        tl, th = t_lo[ii], t_hi[ii]
        for jj in range(len(a_j)):
            sl, sh = s_lo[jj], s_hi[jj]
            acc = 0.0
            # Region t_lo <= s <= t_hi: inner = F(s; s) - F(t_lo; s)
            #                                 = -1 - F(t_lo; s).
            lo1, hi1 = max(sl, tl), min(sh, th)
            if hi1 > lo1:
                acc -= (hi1 - lo1) + (p_anti(tl, hi1) - p_anti(tl, lo1))
            # Region s >= t_hi: inner = F(t_hi; s) - F(t_lo; s).
            lo2, hi2 = max(sl, th), sh
            if hi2 > lo2:
                acc += (p_anti(th, hi2) - p_anti(th, lo2)
                        - (p_anti(tl, hi2) - p_anti(tl, lo2)))
            out[ii, jj] = 2.0 * acc / (a_i[ii] * a_j[jj])
    # The delta part: identical to the equal-order overlap closure.
    out += 2.0 * ovl_closure(edges_i, edges_j) / np.outer(a_i, a_j)
    return out


def _log_ell_weights(n: int, lo: float, hi: float):
    """Trapezoid rule in ln l on a dense log grid (numpy)."""
    lnl = np.linspace(np.log(lo), np.log(hi), n)
    w = np.full(n, lnl[1] - lnl[0])
    w[0] *= 0.5
    w[-1] *= 0.5
    return np.exp(lnl), w


def gaussian_covariance(cl_fn, theta_edges_deg, n2d, omega_s_sr,
                        n_ell_cov: int = 4096, ell_lo: float = 1.0,
                        ell_hi: float = 1.0e6):
    """Gaussian + shot-noise covariance (chomp Covariance's Gaussian
    part).  ``cl_fn(ells) -> C_l`` (any tracer spectrum)."""
    ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
    ells = jnp.asarray(ells_np)
    w = jnp.asarray(w_np)
    edges_rad = np.radians(np.asarray(theta_edges_deg))
    b = bin_averaged_j0(ells, edges_rad)                  # (nb, nl)
    # cl_fn receives the STATIC numpy ells: lattice-route callables
    # (limber_fft.limber_cl_fft) need concrete values for their static
    # interpolation weights; jnp-based callables accept numpy fine.
    cl = jnp.asarray(cl_fn(ells_np))
    import jax

    g = (2.0 / omega_s_sr) * ells**2 * w / (2.0 * jnp.pi) * (
        cl * cl + 2.0 * cl / n2d)
    # Jbar rows oscillate in sign: full-precision contraction (CLAUDE.md
    # bf16-matmul rule) so f32-TPU use stays accurate.
    cov = jnp.matmul(b * g[None, :], b.T,
                     precision=jax.lax.Precision.HIGHEST)
    # Pure shot-noise delta, integrated analytically over the bins.
    lo = jnp.asarray(edges_rad[:-1])
    hi = jnp.asarray(edges_rad[1:])
    diag = (2.0 / omega_s_sr) / (jnp.pi * n2d**2 * (hi * hi - lo * lo))
    return cov + jnp.diag(diag)


# MC-calibrated residual factors for the remaining coupled-region
# spin-2 "wedge" overprediction, f(x) = c0 - a x^2 with
# x = theta_center / sqrt(A2/pi) (disc-exact footprint scale).
# Fitted over 6 (radius, spectrum) disc configurations x 5 bins with
# the S4 field-phase damping and sqrt(R_bar)-weighted delta active
# (tools/calibrate_spin2_wedge.py; residuals within +-14% "gt",
# +-16% "xip" on the calibration set; held-out validation in
# tests/test_mask_covariance.py).  w_gg needs no factor (its residual
# is MC-noise-compatible and conservative).
_WEDGE_FIT = {"gt": (0.897, 0.180), "xip": (0.957, 0.093)}


def spin2_wedge_factors(mask, theta_edges_deg, probe: str):
    """Per-bin multiplicative factors f_i = c0 - a x_i^2 (clipped to
    [0.5, 1]) for the residual beyond-NKA overprediction of spin-2
    auto blocks at footprint-scale bins (``_WEDGE_FIT``).  ``probe``:
    "gt" or "xip"."""
    if probe not in _WEDGE_FIT:
        raise ValueError(f"spin2_wedge_factors: probe must be one of "
                         f"{sorted(_WEDGE_FIT)}, got {probe!r}")
    c0, a = _WEDGE_FIT[probe]
    edges = np.radians(np.asarray(theta_edges_deg, dtype=float))
    centers = 0.5 * (edges[:-1] + edges[1:])
    r_eff = np.sqrt(mask.area2 / np.pi)
    xs = centers / r_eff
    return np.clip(c0 - a * xs**2, 0.5, 1.0)


def _weighted_bin_bessel(mask, edges_rad, mu, ells_np, n_gl: int = 64):
    """sqrt(R̄₂₂/A₄)-weighted bin-averaged Bessel factors — the EXACT
    short-kernel (delta-limit) replacement for bin_averaged_bessel on
    a masked survey (beyond-NKA branch of gaussian_block):

        bw_i(l) = (2/(hi²-lo²)) ∫_bin θ sqrt(R̄₂₂(θ)/A₄) J_mu(lθ) dθ,

    from factorizing the exact 4-point Σ w(y)²w(y+r)w(y+r') ≈
    sqrt(R̄₂₂(r)) sqrt(R̄₂₂(r')) in the short-correlation limit.
    Reduces to the closed-form Jbar when R̄₂₂ ≈ A₄ across the bin
    (small bins); footprint-scale bins are DAMPED by the declining
    pair function — measured 1.6-2x overprediction of the unweighted
    delta formula at high q (tools/calibrate_spin2_wedge.py study).
    Static numpy (survey geometry)."""
    from numpy.polynomial.legendre import leggauss
    from scipy.special import jv

    pf = getattr(mask, "pair_function2", mask.pair_function)
    edges = np.asarray(edges_rad, dtype=float)
    xg, wg = leggauss(n_gl)
    out = np.empty((len(edges) - 1, len(ells_np)))
    for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        th = 0.5 * (hi - lo) * xg + 0.5 * (hi + lo)
        wq = 0.5 * (hi - lo) * wg * th * np.sqrt(
            np.maximum(pf(th), 0.0) / mask.area4)
        out[i] = (2.0 / (hi * hi - lo * lo)) * (
            jv(mu, np.asarray(ells_np)[None, :] * th[:, None])
            * wq[:, None]).sum(axis=0)
    return out


def gaussian_block(cl_ac, cl_bd, cl_ad, cl_bc, theta_edges_deg_i,
                   theta_edges_deg_j, omega_s_sr, mu_i: int = 0,
                   mu_j: int = 0, noise_ac: float = 0.0,
                   noise_bd: float = 0.0, noise_ad: float = 0.0,
                   noise_bc: float = 0.0, n_ell_cov: int = 4096,
                   ell_lo: float = 1.0, ell_hi: float = 1.0e6,
                   mask=None, beyond_nka: bool = False,
                   field_spins=None, wedge_probe: str | None = None):
    """Generic Gaussian covariance block Cov[w^(ab)_i, w^(cd)_j] (module
    docstring): (1/Omega_s) ∫ l dl/2pi Jbar^{mu_i}_i Jbar^{mu_j}_j
    [Ct_ac Ct_bd + Ct_ad Ct_bc].

    ``cl_xy(ells) -> C_l`` callables for the four tracer pairings;
    ``noise_xy`` the corresponding white-noise levels (1/n2d for gg,
    shape noise for kk, usually 0 for gk).  The pure noise x noise
    constant is integrated analytically via the Bessel completeness
    ∫ l J_mu(l th) J_mu(l th') dl = delta(th - th')/th, which for
    bin-averaged factors of the SAME order gives, for ANY two binnings,

        ∫ l dl Jbar^mu_i Jbar^mu_j = 2 (th_ovl+^2 - th_ovl-^2)_+ /
                                     (A_i A_j),   A = th+^2 - th-^2

    (the overlap of the two annuli; reduces to 2 delta_ij / A_i for
    identical edges).  For mu_i != mu_j the closure does not apply and
    the constant is dropped — exact whenever at least one pairing factor
    in each product is noiseless (the gg x gt cross block:
    N_ad = N_bc = 0).

    Noise levels are STATIC survey constants: jnp scalars are coerced to
    Python floats at entry (the nn branch below is Python control flow —
    a traced noise under jit would raise TracerBoolConversionError).

    ``mask`` (optional, chomp_tpu.mask surface — DiscMask etc.):
    survey-footprint treatment at the fsky/pair-count level for ANY
    (mu_i, mu_j) block: 1/Omega_s is replaced per (i, j) by
    A4 A_i A_j / (D_i D_j) (effective area Omega_eff = A2^2/A4 plus the
    exact pair-count bin normalization D_i, which carries the
    footprint-edge correction), and the pure-noise closure uses the
    masked pair counts over the annulus overlap.  ``omega_s_sr`` is
    then ignored.  The J0 auto-block additionally has the full low-ell
    mode-coupling treatment in mask.masked_gaussian_covariance; the
    spin-2 coupling matrix (E/B mixing) is not modeled — at the fsky
    level this is the standard approximation.

    ``beyond_nka=True`` (round 5, needs ``mask``) activates the three
    MC-validated refinements of the NKA treatment at footprint-scale
    bins (study: tools/calibrate_spin2_wedge.py):

      1. the delta-limit (high-q) regime uses sqrt(R̄₂₂)-weighted
         bin-averaged Bessel factors (:func:`_weighted_bin_bessel`) —
         the exact short-kernel limit; the flat A4 normalization
         overpredicts footprint-scale bins up to 2x there (measured:
         mc/an 0.50-0.84 -> 1.04-1.09 on the high-q disc referee);
      2. ``field_spins`` = ((s_ac, s_bd), (s_ad, s_bc)) damps Wick
         pairings whose correlators carry FIELD-phase spins the
         estimator does not compensate by S_s(q)
         (mask.field_phase_suppression) in the coupled region — the
         xi_+ auto block's <γγ><γ*γ*> pairing, ((4, 4), (0, 0)), is
         the standard case (measured 2-2.4x -> within ~20%);
      3. ``wedge_probe`` ("gt" | "xip") applies the MC-calibrated
         residual factor (:func:`spin2_wedge_factors`) for the
         remaining coupled-region overlap-anisotropy overprediction
         the first two do not model (gt: up to 1.45x -> +-14%).

    The default (False) is the bitwise-stable NKA path; the joint
    builders expose ``beyond_nka`` as one knob and set
    field_spins/wedge_probe per block."""
    if beyond_nka and mask is None:
        raise ValueError("gaussian_block: beyond_nka=True needs a "
                         "mask (the refinements are survey-geometry "
                         "corrections)")
    noise_ac = float(noise_ac)
    noise_bd = float(noise_bd)
    noise_ad = float(noise_ad)
    noise_bc = float(noise_bc)
    ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
    ells = jnp.asarray(ells_np)
    w = jnp.asarray(w_np)
    edges_i = np.radians(np.asarray(theta_edges_deg_i))
    edges_j = np.radians(np.asarray(theta_edges_deg_j))
    b_i = bin_averaged_bessel(ells, edges_i, mu_i)        # (nbi, nl)
    b_j = bin_averaged_bessel(ells, edges_j, mu_j)        # (nbj, nl)
    # Static numpy ells into the callables (see gaussian_covariance).
    ct_ac = jnp.asarray(cl_ac(ells_np)) + noise_ac
    ct_bd = jnp.asarray(cl_bd(ells_np)) + noise_bd
    ct_ad = jnp.asarray(cl_ad(ells_np)) + noise_ad
    ct_bc = jnp.asarray(cl_bc(ells_np)) + noise_bc
    import jax

    nn = noise_ac * noise_bd + noise_ad * noise_bc
    if nn != 0.0 and mu_i != mu_j and {mu_i, mu_j} != {0, 4}:
        raise ValueError(
            "gaussian_block: a pure noise x noise term is present "
            f"(nn={nn}) but mu_i={mu_i} != mu_j={mu_j}, where neither "
            "the equal-order Bessel closure nor the {0, 4} "
            "Weber-Schafheitlin constant applies — this block (e.g. "
            "w x gamma_t with the SAME sample as lens and source) is "
            "not supported; split the noisy pairing out explicitly.")
    integrand = (ct_ac * ct_bd + ct_ad * ct_bc - nn)
    hp = jax.lax.Precision.HIGHEST
    if mask is None:
        pref = jnp.asarray(1.0 / omega_s_sr)
    else:
        from chomp_tpu.mask import pair_normalization

        ann_i = np.pi * (edges_i[1:] ** 2 - edges_i[:-1] ** 2)
        ann_j = np.pi * (edges_j[1:] ** 2 - edges_j[:-1] ** 2)
        d_i = pair_normalization(mask, edges_i)
        d_j = pair_normalization(mask, edges_j)
        pref0_np = np.outer(ann_i, ann_j) / np.outer(d_i, d_j)
        pref = jnp.asarray(mask.area4 * pref0_np)
    g = ells**2 * w / (2.0 * jnp.pi) * integrand
    if mask is not None and beyond_nka:
        # Beyond-NKA delta region (round 5): the exact short-kernel
        # factorization replaces the flat A4 pair-count normalization
        # by sqrt(R̄₂₂)-weighted bin-averaged Bessels — the unweighted
        # formula overpredicts footprint-scale bins 1.6-2x at high q
        # (measured; _weighted_bin_bessel docstring).
        bw_i = jnp.asarray(_weighted_bin_bessel(mask, edges_i, mu_i,
                                                ells_np))
        bw_j = jnp.asarray(_weighted_bin_bessel(mask, edges_j, mu_j,
                                                ells_np))
        cov = pref * jnp.matmul(bw_i * g[None, :], bw_j.T,
                                precision=hp)
    else:
        cov = pref * jnp.matmul(b_i * g[None, :], b_j.T,
                                precision=hp)
    if mask is not None and mask.coupling_width > 0.0:
        # Full low-ell mode coupling for EVERY (mu_i, mu_j) block:
        # replace the delta-limit piece below q* (where the log grid
        # resolves the mask kernel's ~1/R width) with the coupled
        # double integral.  Spin-2 estimator phases survive as
        # azimuthal moments of the kernel (φ = relative azimuth of q
        # and q'): the mixed w x γt block couples through
        # K₂ = <|W̃₂|² cos 2φ>, the γt x γt block through ½(K₀+K₄)
        # (the Re[] projection of the complex tangential estimator) —
        # both reduce to K₀ (and hence the delta limit) at q ≫ 1/R.
        # MC-validated (tests/test_mask_covariance.py joint spin-2 +
        # xi_pm referees): w-block and cross entries at MC accuracy;
        # with the DEFAULT (plain-NKA) settings the spin-2 AUTO blocks
        # retain measured CONSERVATIVE overpredictions at
        # footprint-scale bins — γt ~1.6x (partial-annulus wedge
        # coupling), ξ+ up to ~2.4x (the <γγ><γ*γ*> Wick pairing
        # carries an e^{4iφ_k} FIELD-phase coherence the
        # estimator-phase moments cannot suppress), ξ− within 15%
        # ((K0+K8)/2 measured 0.88-1.0 vs MC).  ``beyond_nka=True``
        # (round 5, docstring) closes most of that gap: held-out MC
        # validation lands γt within ~20% and ξ+ within ~25%
        # (tests below).  The CURVED route
        # (curved.curved_gaussian_block / the curved joint builder)
        # remains the alternative for footprint-scale spin-2 bins:
        # its Wigner-d kernels carry the exact sphere bin geometry and
        # are only ~5-25% conservative there, spin-2-SHT-MC-validated
        # (tests/test_curved.py::test_curved_spin2_mc_referee).
        from chomp_tpu.mask import _coupling_matrix

        dln = float(np.log(ells_np[1] / ells_np[0]))
        q_star = mask.coupling_width / (4.0 * dln)
        n_low = min(int(np.searchsorted(ells_np, q_star)), n_ell_cov)
        if n_low >= 2:
            n_phi = max(96, int(np.pi / (4.0 * dln)))
            lnq_key = tuple(np.log(ells_np[:n_low]))
            # General estimator-phase rule: an estimator with phase
            # e^{i s φ} (s = 0 for w/xi_plus, 2 for γt, 4 for xi_minus
            # — for these four, s equals the Bessel order) contributes
            # its Re[] projection ½(e^{isφ} + e^{-isφ}); the product of
            # two such projections averages to the moment pair
            # ½(K_{|s_i - s_j|} + K_{s_i + s_j}).  Reduces to the
            # MC-validated special cases: (0,0) → K₀, (0,2) → K₂,
            # (2,2) → ½(K₀+K₄); extends to (0,4) → K₄,
            # (2,4) → ½(K₂+K₆), (4,4) → ½(K₀+K₈).
            d_m = abs(mu_i - mu_j)
            s_m = mu_i + mu_j
            if d_m == s_m:
                k_np = _coupling_matrix(mask, lnq_key, n_phi,
                                        moment=d_m)
            else:
                k_np = 0.5 * (
                    _coupling_matrix(mask, lnq_key, n_phi, moment=d_m)
                    + _coupling_matrix(mask, lnq_key, n_phi,
                                       moment=s_m))
            k_jnp = jnp.asarray(k_np)
            wq = jnp.asarray(ells_np**2 * w_np)

            def m_of(b, vec):
                return b[:, :n_low] * (vec[:n_low] * wq[:n_low])[None, :]

            def quad(vec_l, vec_r):
                return jnp.matmul(
                    jnp.matmul(m_of(b_i, vec_l), k_jnp, precision=hp),
                    m_of(b_j, vec_r).T, precision=hp)

            ones = jnp.ones_like(ct_ac)
            if beyond_nka and field_spins is not None:
                # Field-phase decoherence (round 5): Wick pairings
                # whose correlators carry spin phases the ESTIMATOR
                # phase does not compensate lose coherence over the
                # coupled kernel — damp each correlator by
                # S_s(q) (mask.field_phase_suppression).  The standard
                # case is the xi_+ auto block's <γγ><γ*γ*> pairing,
                # field_spins = ((4, 4), (0, 0)): measured 2-2.4x NKA
                # overprediction without the damping
                # (tools/calibrate_spin2_wedge.py).
                from chomp_tpu.mask import field_phase_suppression

                e_low = np.asarray(ells_np[:n_low])
                s_cache = {0: jnp.ones(n_low)}
                for s in set(int(x) for x in np.ravel(field_spins)):
                    if s != 0:
                        s_cache[s] = jnp.asarray(
                            field_phase_suppression(mask, e_low, s))
                (s_ac, s_bd), (s_ad, s_bc) = field_spins
                v_ac = ct_ac[:n_low] * s_cache[int(s_ac)]
                v_bd = ct_bd[:n_low] * s_cache[int(s_bd)]
                v_ad = ct_ad[:n_low] * s_cache[int(s_ad)]
                v_bc = ct_bc[:n_low] * s_cache[int(s_bc)]
            else:
                v_ac, v_bd = ct_ac, ct_bd
                v_ad, v_bc = ct_ad, ct_bc
            # Symmetrized (q, q') spectrum assignment: the kernel is
            # near-diagonal, so ordering only matters at the already-
            # neglected narrow-kernel order — but the unsymmetrized
            # form breaks auto-block symmetry at the ~5e-8 level.
            coupled = (0.5 * (quad(v_ac, v_bd) + quad(v_bd, v_ac)
                              + quad(v_ad, v_bc) + quad(v_bc, v_ad))
                       - nn * quad(ones, ones)) / (2.0 * jnp.pi) ** 2
            g_low = (ells[:n_low] ** 2 * w[:n_low] / (2.0 * jnp.pi)
                     * integrand[:n_low])
            dl_i = bw_i if beyond_nka else b_i
            dl_j = bw_j if beyond_nka else b_j
            delta_low = mask.area4 * jnp.matmul(
                dl_i[:, :n_low] * g_low[None, :], dl_j[:, :n_low].T,
                precision=hp)
            cov = cov + jnp.asarray(pref0_np) * (coupled - delta_low)
    if beyond_nka and wedge_probe is not None and mask is not None:
        # MC-calibrated residual factor (spin2_wedge_factors) applied
        # as a congruence outer(sqrt f) scaling of the quadrature part
        # (the exact noise closures below stay untouched).
        f_i = np.sqrt(spin2_wedge_factors(
            mask, theta_edges_deg_i, wedge_probe))
        f_j = np.sqrt(spin2_wedge_factors(
            mask, theta_edges_deg_j, wedge_probe))
        cov = cov * jnp.asarray(np.outer(f_i, f_j))
    if nn != 0.0 and mu_i == mu_j:
        # General annulus-overlap closure (docstring): numpy, static.
        lo_i, hi_i = edges_i[:-1], edges_i[1:]
        lo_j, hi_j = edges_j[:-1], edges_j[1:]
        a_i = hi_i**2 - lo_i**2
        a_j = hi_j**2 - lo_j**2
        if mask is None:
            cov = cov + jnp.asarray(
                nn * ovl_closure(edges_i, edges_j)
                / (np.pi * omega_s_sr * a_i[:, None] * a_j[None, :]))
        else:
            # Masked pair counts over the annulus overlaps: the exact
            # noise closure 2 N^2 D2_ovl / (D_i D_j) (nn carries the
            # pairing 2; binary masks: D2 = D).
            from chomp_tpu.mask import pair_normalization

            d2_ovl = np.zeros((len(a_i), len(a_j)))
            for ii in range(len(a_i)):
                for jj in range(len(a_j)):
                    lo = max(lo_i[ii], lo_j[jj])
                    hi = min(hi_i[ii], hi_j[jj])
                    if hi > lo:
                        d2_ovl[ii, jj] = pair_normalization(
                            mask, np.array([lo, hi]), squared=True)[0]
            cov = cov + jnp.asarray(nn * d2_ovl
                                    / np.outer(d_i, d_j))
    if nn != 0.0 and mu_i != mu_j:
        # The {0, 4} xi_plus x xi_minus pure-noise term: exact
        # Weber-Schafheitlin constant (xipm_mixed_noise_constant
        # docstring) — the quadrature grid cannot carry it (the nn
        # integrand decays only ~1/l with undersampled oscillations at
        # high l, so it is excluded above and added in closed form
        # here, exactly parallel to the same-order overlap closure).
        if mu_i == 0:
            const = xipm_mixed_noise_constant(edges_i, edges_j)
        else:
            const = xipm_mixed_noise_constant(edges_j, edges_i).T
        if mask is None:
            cov = cov + jnp.asarray(
                nn * const / (2.0 * np.pi * omega_s_sr))
        else:
            # fsky/pair-count (NKA-level) masked treatment: the same
            # per-(i, j) prefactor as the signal part.  (The mixed
            # constant is not an annulus-overlap count, so the exact
            # pair-count noise closure of the equal-order branch has
            # no analog here.)
            cov = cov + pref * jnp.asarray(nn * const / (2.0 * np.pi))
    return cov


def ovl_closure(edges_i, edges_j):
    """(theta_ovl+^2 - theta_ovl-^2)_+ of every annulus pair (numpy)."""
    lo_i, hi_i = edges_i[:-1], edges_i[1:]
    lo_j, hi_j = edges_j[:-1], edges_j[1:]
    return np.maximum(
        np.minimum(hi_i[:, None], hi_j[None, :]) ** 2
        - np.maximum(lo_i[:, None], lo_j[None, :]) ** 2, 0.0)


def _tri_model_at(cosmo, halo_p, model, z_m, with_bao, grid):
    """Rebuild projected_trispectrum's ``model`` argument at redshift
    ``z_m``: a single HaloModel rebuilds directly; a per-leg sequence
    (trispectrum_parallelogram_tracers' multi-sample form) rebuilds
    each DISTINCT sample once on ONE shared mass-table build and
    preserves the leg -> sample identity mapping."""
    from chomp_tpu import halo as halo_mod

    if not isinstance(model, (list, tuple)):
        return halo_mod.build_halo_model(cosmo, halo_p, model.hod, z_m,
                                         with_bao, grid)
    from chomp_tpu.mass import build_mass_tables

    t = build_mass_tables(cosmo, halo_p, z_m, with_bao, grid)
    rebuilt: list = []
    out = []
    for m in model:
        for m_old, m_new in rebuilt:
            if m is m_old:
                out.append(m_new)
                break
        else:
            m_new = halo_mod.build_halo_model(
                cosmo, halo_p, m.hod, z_m, with_bao, grid, mass_tables=t)
            rebuilt.append((m, m_new))
            out.append(m_new)
    return tuple(out)


def projected_trispectrum(cosmo: CosmoParams, halo_p: HaloParams,
                          model: HaloModel, dist, ells_cov,
                          galaxy: bool = True, with_bao: bool = False,
                          grid: GridSpec = DEFAULT_GRID,
                          n_k_tri: int = 96, n_z_tri: int = 24,
                          exact_z: bool = False, windows=None, tracers=None,
                          method: str | None = None, u_stride: int = 4,
                          exact_z_anchors: int | None = None):
    """T^{abcd}_proj(l, l') on a coarse ell grid: T̄ built on an
    (n_k_tri)^2 log-k grid, evaluated in (ln k, ln k') at each projection
    node, contracted over chi.

    ``windows``/``tracers``: 4-tuples assigning each trispectrum leg its
    radial window and tracer field (module docstring) — the cross-probe
    blocks of the Morrison & Schneider 2013 program.  Default (None):
    four copies of the galaxy window built from ``dist`` with tracers set
    by the legacy ``galaxy`` flag (the w_gg auto-covariance).
    ``model`` may also be a 4-sequence of PER-LEG HaloModels sharing
    mass tables (multi-sample tomographic blocks — see
    trispectrum_parallelogram_tracers); the exact-z routes rebuild each
    distinct sample per node on one shared mass-table build.

    ``method="lattice"`` (default, TPU-first): the chi projection runs on
    a strided slice of the static ln-chi lattice (limber_fft), so every
    T̄ query position ln k = ln(l+1/2) - u is STATIC — the sign-aware
    log-bilinear interpolation becomes a precomputed 2-tap weight tensor
    and the whole projection is three dense einsums on the MXU, with
    ZERO dynamic gathers (VERDICT round-2 item 1; the table route's
    per-node jnp-indexed bilinear was the banned TPU anti-pattern).
    ``u_stride`` sets the trapezoid spacing u_stride*grid.lattice_dln.
    ``method="table"``: the original Gauss-Legendre-in-z route with
    dynamically gathered bilinear lookups — kept as the referee path
    (route equivalence is tested).

    ``exact_z=False`` (default): one T̄ table at the model's pivot
    redshift, scaled by the separable D^6(z) (exact for the tree-PT 4h
    term, leading order for 1h-3h — mirroring chomp's separable P
    treatment).  ``exact_z=True``: the FULL halo model and T̄ table are
    rebuilt at every projection node — no growth approximation anywhere;
    ~n_nodes x the cost.  ``exact_z_anchors`` (lattice route only):
    exact evolution via a J-anchor Chebyshev expansion of T̄/D⁶ — the
    gather-free exact-z path at ~J halo builds (mirrors
    limber_fft.limber_cl_fft_exact_z; agreement with exact_z=True
    tested)."""
    from chomp_tpu.projection import WindowGalaxy

    import jax

    if exact_z and exact_z_anchors:
        raise ValueError("pass either exact_z=True (per-node rebuilds) "
                         "or exact_z_anchors=J (Chebyshev), not both")
    if exact_z_anchors and method == "table":
        raise ValueError("exact_z_anchors is a lattice-route feature; "
                         "the table route uses exact_z=True instead")
    traced_ells = isinstance(ells_cov, jax.core.Tracer)
    if method is None:
        # Lattice (gather-free) for the separable default; the table/GL
        # route for exact_z, where per-node halo rebuilds dominate and
        # the dense-lattice node count (~200 at u_stride=4) would
        # multiply that cost ~30x for no accuracy gain.  Both accept an
        # explicit override.  TRACED ells also fall back to the table
        # route: the lattice's static query weights need concrete ell
        # values (callers jitting over an ells argument keep working,
        # at the pre-round-3 behavior).
        method = ("table" if ((exact_z or traced_ells)
                              and not exact_z_anchors) else "lattice")
    elif method == "lattice" and traced_ells:
        raise ValueError(
            "projected_trispectrum(method='lattice') needs CONCRETE "
            "(numpy) ells — its interpolation weights are built at "
            "trace time.  Pass static ells, or method='table' to "
            "trace over the ell argument.")
    if method == "lattice":
        return _projected_trispectrum_lattice(
            cosmo, halo_p, model, dist, ells_cov, galaxy, with_bao, grid,
            n_k_tri, exact_z, windows, tracers, u_stride,
            exact_z_anchors)
    if method != "table":
        raise ValueError(f"method must be 'lattice' or 'table', got "
                         f"{method!r}")
    ells_cov = jnp.asarray(ells_cov)
    if tracers is None:
        tracers = ("g",) * 4 if galaxy else ("m",) * 4
    # T̄ table(s).
    k_lo, k_hi = grid.k_table_min, grid.k_table_max
    ln_k = jnp.asarray(np.linspace(np.log(k_lo), np.log(k_hi), n_k_tri))
    kk = jnp.exp(ln_k)
    k1g, k2g = jnp.meshgrid(kk, kk, indexing="ij")

    def tri_fn(cosmo_, halo_, model_, k1_, k2_, bao_, grid_):
        return trispectrum.trispectrum_parallelogram_tracers(
            cosmo_, halo_, model_, k1_, k2_, tracers, bao_, grid_)

    tbar = tri_fn(cosmo, halo_p, model, k1g.ravel(), k2g.ravel(),
                  with_bao, grid).reshape(n_k_tri, n_k_tri)
    dln = ln_k[1] - ln_k[0]

    def _sign_lnabs(t):
        """(sign, ln|t|) tables: bilinear in ln|T̄| with a separately
        interpolated sign preserves regions where the negative K13/P13
        star term dominates (plain ln(max(T,0)) would clamp them to 0).
        Floor at the dtype's smallest normal (1e-300 underflows to 0 in
        float32, and a single -inf entry would poison downstream
        arithmetic): a t==0 node (exact f32 cancellation on the sign-
        change curve) stays finite."""
        tiny = jnp.finfo(jnp.result_type(t)).tiny
        return jnp.where(t < 0.0, -1.0, 1.0), jnp.log(
            jnp.maximum(jnp.abs(t), tiny))

    def _bilinear(tbl, lnk1, lnk2):
        def idx(lnk):
            t = jnp.clip((lnk - ln_k[0]) / dln, 0.0, tbl.shape[0] - 1.001)
            i = jnp.floor(t).astype(jnp.int32)
            return i, t - i

        i, fi = idx(lnk1)
        j, fj = idx(lnk2)
        return ((1 - fi) * (1 - fj) * tbl[i, j] + fi * (1 - fj) * tbl[i + 1, j]
                + (1 - fi) * fj * tbl[i, j + 1] + fi * fj * tbl[i + 1, j + 1])

    sgn_tbar, ln_tbar = _sign_lnabs(tbar)

    def tbar_interp(lnk1, lnk2):
        """Sign-aware log-bilinear in (ln k, ln k') of T̄."""
        mag = jnp.exp(_bilinear(ln_tbar, lnk1, lnk2))
        return jnp.where(_bilinear(sgn_tbar, lnk1, lnk2) >= 0.0, mag, -mag)

    # Projection over z: integration range where ALL leg windows overlap.
    if windows is None:
        windows = (WindowGalaxy(dist=dist),) * 4
        z_lo = jnp.maximum(dist.z_min, 1e-3)
        z_hi = dist.z_max
    else:
        # Traced-safe support intersection (supports are pytree leaves —
        # a Python float() here would crash under jit/vmap over window
        # parameters).
        import functools

        sups = [w_.support() for w_ in windows]
        z_lo = functools.reduce(jnp.maximum,
                                [jnp.asarray(s[0]) for s in sups],
                                jnp.asarray(1e-3))
        # Disjoint supports (no common z): clamp to an empty span so the
        # block is ~0 instead of a sign-flipped reversed integral.
        z_hi = jnp.maximum(functools.reduce(
            jnp.minimum, [jnp.asarray(s[1]) for s in sups]), z_lo)
    z_nodes, z_w = gl_fixed(0.0, 1.0, n_z_tri)
    z_nodes = jnp.asarray(z_nodes)
    z_w = jnp.asarray(z_w)
    z = z_lo + (z_hi - z_lo) * z_nodes
    wz = z_w * (z_hi - z_lo)
    chi = background.comoving_distance(cosmo, z, grid.n_dist)
    model0 = model[0] if isinstance(model, (list, tuple)) else model
    d = (background.growth_factor(cosmo, z, grid.n_growth)
         / model0.mass.growth)
    w_prod = windows[0].window_z(cosmo, z, grid)
    for w_ in windows[1:]:
        w_prod = w_prod * w_.window_z(cosmo, z, grid)
    weight = w_prod / chi**6 * d**6 * (C_OVER_H0 / background.ez(cosmo, z)) * wz

    lnk1 = jnp.log((ells_cov[:, None] + 0.5) / chi[None, :])  # (nl, nz)
    out = jnp.zeros((ells_cov.shape[0], ells_cov.shape[0]))

    import jax

    if exact_z:
        # No D^6 factor — the per-z tables carry the full evolution.
        weight_exact = (w_prod / chi**6
                        * (C_OVER_H0 / background.ez(cosmo, z)) * wz)

        def body(carry, idx):
            model_z = _tri_model_at(cosmo, halo_p, model, z[idx],
                                    with_bao, grid)
            tb = tri_fn(cosmo, halo_p, model_z, k1g.ravel(), k2g.ravel(),
                        with_bao, grid).reshape(n_k_tri, n_k_tri)
            sgn_tb, ln_tb = _sign_lnabs(tb)
            lnk_z = lnk1[:, idx]
            mag = jnp.exp(_bilinear(ln_tb, lnk_z[:, None], lnk_z[None, :]))
            t_ab = jnp.where(
                _bilinear(sgn_tb, lnk_z[:, None], lnk_z[None, :]) >= 0.0,
                mag, -mag)
            return carry + weight_exact[idx] * t_ab, None

        out, _ = jax.lax.scan(body, out, jnp.arange(n_z_tri))
        return out

    # Contract over z: T_proj[a,b] = sum_z weight_z T̄(k_a(z), k_b(z)).
    def body(carry, idx):
        lnk_z = lnk1[:, idx]
        t_ab = tbar_interp(lnk_z[:, None], lnk_z[None, :])
        return carry + weight[idx] * t_ab, None

    out, _ = jax.lax.scan(body, out, jnp.arange(n_z_tri))
    return out


def _tri_lattice_indices(windows, grid: GridSpec, u_stride: int):
    """Static strided chi-lattice indices covering the windows' support.

    Uses CONCRETE window supports (padded x[1/2, 2] in chi through the
    static fiducial chi(z) map — actual per-cosmology distances differ
    by far less, and the windows themselves vanish outside their true
    support, so padding is safe).  Falls back to the full lattice when a
    support is traced.  Returns (idx, trapezoid u-weights), both numpy."""
    from chomp_tpu import limber_fft

    _, ln_chi = limber_fft._lattices(grid)
    n_chi = len(ln_chi)
    lo_idx, hi_idx = 0, n_chi
    try:
        z_lo = max(max(float(np.asarray(w.support()[0])) for w in windows),
                   1e-3)
        z_hi = max(min(float(np.asarray(w.support()[1])) for w in windows),
                   z_lo)
        chi_lo = max(0.5 * float(limber_fft.fiducial_chi_np(z_lo)),
                     np.exp(ln_chi[0]))
        chi_hi = min(2.0 * float(limber_fft.fiducial_chi_np(z_hi)),
                     np.exp(ln_chi[-1]))
        lo_idx = int(np.searchsorted(ln_chi, np.log(chi_lo)))
        hi_idx = min(int(np.searchsorted(ln_chi, np.log(chi_hi))) + 1, n_chi)
        hi_idx = max(hi_idx, lo_idx + 2)
    except Exception:
        pass  # traced support: integrate the whole lattice
    n_sel = len(range(lo_idx, hi_idx, u_stride))
    # Plain trapezoid: for a smooth integrand decaying to ~0 at both ends
    # (the padded support), equal-weight trapezoid is superconvergent
    # (Euler-Maclaurin boundary terms vanish); the accuracy limit is the
    # W^4 window's width in u (~0.08 for a sigma_z=0.2 kernel), so the
    # spacing u_stride*lattice_dln must stay below it — measured:
    # stride 4 (du=0.032) is within 4e-4 of the doubly-refined table
    # route; stride 16 (du=0.128) aliases the window at the % level.
    # Returned as slice BOUNDS: traced arrays are sliced with
    # lax.slice_in_dim (emits the static XLA slice primitive) — both
    # x[np_index_array] and even x[::stride] basic indexing lower to
    # gather in jnp, the op this whole route exists to avoid.
    du = grid.lattice_dln * u_stride
    wu = np.full(n_sel, du)
    wu[0] *= 0.5
    wu[-1] *= 0.5
    return (lo_idx, hi_idx, u_stride), wu


def _tri_query_weights(ells_np, u_nodes, ln_k0: float, dln: float,
                       n_k_tri: int):
    """Static 2-tap linear interpolation tensor W[m, a, i]: row (m, a)
    interpolates a length-n_k_tri table at fractional position
    (ln(ell_a + 1/2) - u_m - ln_k0)/dln, clipped exactly like the table
    route's ``_bilinear`` (numpy, trace-time)."""
    s_ell = np.log(np.asarray(ells_np, dtype=np.float64) + 0.5)
    t = (s_ell[None, :] - np.asarray(u_nodes)[:, None] - ln_k0) / dln
    t = np.clip(t, 0.0, n_k_tri - 1.001)
    i = np.floor(t).astype(int)
    f = t - i
    n_m, n_a = t.shape
    w = np.zeros((n_m, n_a, n_k_tri))
    mm, aa = np.meshgrid(np.arange(n_m), np.arange(n_a), indexing="ij")
    w[mm, aa, i] = 1.0 - f
    w[mm, aa, i + 1] = f
    return w


def _projected_trispectrum_lattice(cosmo, halo_p, model, dist, ells_cov,
                                   galaxy, with_bao, grid: GridSpec,
                                   n_k_tri: int, exact_z: bool, windows,
                                   tracers, u_stride: int,
                                   exact_z_anchors: int | None = None):
    """Gather-free T^{abcd}_proj (projected_trispectrum method="lattice").

    The chi integral runs on static strided ln-chi lattice nodes u_m, so
    every T̄ query ln k = ln(l+1/2) - u_m is static: the sign-aware
    log-bilinear table lookup of the table route becomes, EXACTLY
    (same 2-tap weights, same clipping),

        lnT_q[m,a,b] = W[m,a,:] ln|T̄| W[m,b,:]^T     (two einsums)
        T_proj[a,b]  = sum_m wgt_m sign_q exp(lnT_q)  (one contraction)

    — dense static-weight linear algebra end to end (no jnp indexing
    anywhere; verified by the jaxpr-has-no-gather test)."""
    import jax

    from chomp_tpu import limber_fft
    from chomp_tpu.projection import WindowGalaxy

    ells_np = np.asarray(ells_cov, dtype=np.float64)  # must be concrete
    if tracers is None:
        tracers = ("g",) * 4 if galaxy else ("m",) * 4
    if windows is None:
        windows = (WindowGalaxy(dist=dist),) * 4

    # T̄ query table grid (static).
    k_lo, k_hi = grid.k_table_min, grid.k_table_max
    ln_k_np = np.linspace(np.log(k_lo), np.log(k_hi), n_k_tri)
    kk = jnp.asarray(np.exp(ln_k_np))
    k1g, k2g = jnp.meshgrid(kk, kk, indexing="ij")
    dln = ln_k_np[1] - ln_k_np[0]

    def tri_table(model_):
        t = trispectrum.trispectrum_parallelogram_tracers(
            cosmo, halo_p, model_, k1g.ravel(), k2g.ravel(), tracers,
            with_bao, grid).reshape(n_k_tri, n_k_tri)
        sgn = jnp.where(t < 0.0, -1.0, 1.0)
        # Dtype-aware floor: 1e-300 underflows to 0 in float32 and the
        # dense einsums would propagate a single ln(0) = -inf into NaN
        # across the whole T_proj matrix (0 * -inf).
        return sgn, jnp.log(jnp.maximum(jnp.abs(t),
                                        jnp.finfo(jnp.result_type(t)).tiny))

    # Static projection nodes + static query weights.
    (u_lo, u_hi, u_step), wu = _tri_lattice_indices(windows, grid, u_stride)
    _, ln_chi_full = limber_fft._lattices(grid)
    w_q = _tri_query_weights(ells_np, ln_chi_full[u_lo:u_hi:u_step],
                             ln_k_np[0], dln, n_k_tri)    # (m, a, i)

    # Geometry + windows on the full lattice (the cumulative lensing
    # window needs all nodes), then static strided slicing.
    chi_f, z_f, z_mid_f = limber_fft._lattice_z(cosmo, grid)
    w_prod_f = limber_fft._window_on_lattice(cosmo, windows[0], z_f, chi_f,
                                             grid, z_mid_f)
    for w_ in windows[1:]:
        w_prod_f = w_prod_f * limber_fft._window_on_lattice(
            cosmo, w_, z_f, chi_f, grid, z_mid_f)
    def _sel(x):
        return jax.lax.slice_in_dim(x, u_lo, u_hi, stride=u_step)

    chi = _sel(chi_f)
    z = _sel(z_f)
    w_prod = _sel(w_prod_f)
    # Same integration range as the table route: z in
    # [max(supports, 1e-3), min(supports)] (traced comparison, not a
    # gather).  This is NOT redundant with the windows' own support
    # zeroing: W_galaxy is finite down to z=0 when dist.z_min=0, and the
    # 1/chi^6 projection weight diverges there — the 1e-3 floor is a
    # physical cutoff both routes must share (measured: a window with
    # non-negligible p(z~0) is otherwise cutoff-dominated, factor-6
    # route differences).
    import functools

    sups = [w_.support() for w_ in windows]
    z_cut_lo = functools.reduce(jnp.maximum,
                                [jnp.asarray(s[0]) for s in sups],
                                jnp.asarray(1e-3))
    z_cut_hi = jnp.maximum(functools.reduce(
        jnp.minimum, [jnp.asarray(s[1]) for s in sups]), z_cut_lo)
    # Fractional-cell edge weights, not a binary node mask: each node's
    # weight is scaled by the overlap of its trapezoid cell
    # [u - du/2, u + du/2] with [u(z_cut_lo), u(z_cut_hi)] — a binary
    # mask costs O(du * f_edge) and is non-monotone in the stride when
    # the edge integrand is non-negligible (measured on a dist with
    # p(z~0) ~ 4e-3); the ramp restores O(du^2).
    du = grid.lattice_dln * u_step
    u_nodes = jnp.asarray(ln_chi_full[u_lo:u_hi:u_step])
    u_cut_lo = jnp.log(background.comoving_distance(cosmo, z_cut_lo,
                                                    grid.n_dist))
    u_cut_hi = jnp.log(background.comoving_distance(cosmo, z_cut_hi,
                                                    grid.n_dist))
    ramp = (jnp.clip((u_nodes - u_cut_lo) / du + 0.5, 0.0, 1.0)
            * jnp.clip((u_cut_hi - u_nodes) / du + 0.5, 0.0, 1.0))
    # d chi = chi du on the log lattice.
    base_wgt = w_prod / chi**6 * chi * jnp.asarray(wu) * ramp

    hp = jax.lax.Precision.HIGHEST
    w_jnp = jnp.asarray(w_q)

    if exact_z:
        def body(carry, xs):
            z_m, wgt_m, w_m = xs
            model_z = _tri_model_at(cosmo, halo_p, model, z_m,
                                    with_bao, grid)
            sgn_tb, ln_tb = tri_table(model_z)
            ln_q = jnp.matmul(jnp.matmul(w_m, ln_tb, precision=hp),
                              w_m.T, precision=hp)
            sg_q = jnp.matmul(jnp.matmul(w_m, sgn_tb, precision=hp),
                              w_m.T, precision=hp)
            mag = jnp.exp(ln_q)
            return carry + wgt_m * jnp.where(sg_q >= 0.0, mag, -mag), None

        out0 = jnp.zeros((len(ells_np), len(ells_np)))
        out, _ = jax.lax.scan(body, out0, (z, base_wgt, w_jnp))
        return out

    if exact_z_anchors:
        # EXACT redshift evolution, gather-free, at ~J halo builds
        # instead of one per lattice node: expand the slowly-varying
        # T̃(k, k', z) = T̄/D⁶ over J static Chebyshev anchors
        # (mirroring limber_fft.limber_cl_fft_exact_z's treatment of
        # P/D²), combine the anchor tables per node with barycentric
        # Lagrange rows, and run the same static-weight einsums on the
        # per-node tables.  Needs CONCRETE window supports for the
        # static anchor span (like the lattice node range).
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

        def t_at(z_j):
            model_j = _tri_model_at(cosmo, halo_p, model, z_j,
                                    with_bao, grid)
            t = trispectrum.trispectrum_parallelogram_tracers(
                cosmo, halo_p, model_j, k1g.ravel(), k2g.ravel(),
                tracers, with_bao, grid).reshape(n_k_tri, n_k_tri)
            g_j = (model_j[0] if isinstance(model_j, tuple)
                   else model_j).mass.growth
            return t / g_j**6

        # lax.map (sequential anchors): each anchor's halo build carries
        # large y matrices; batching them across anchors spills HBM
        # (same finding as limber_fft.exact_z_anchor_spectra).
        t_j = jax.lax.map(t_at, jnp.asarray(z_nodes))     # (J, nk, nk)
        d_u = background.growth_factor(cosmo, z, grid.n_growth)
        lag = _barycentric_rows(jnp.clip(z, z_lo_c, z_hi_c), z_nodes,
                                w_bary)                    # (m, J)
        t_m = (jnp.einsum("mj,jab->mab", lag, t_j, precision=hp)
               * (d_u**6)[:, None, None])                  # (m, nk, nk)
        sgn_m = jnp.where(t_m < 0.0, -1.0, 1.0)
        ln_m = jnp.log(jnp.maximum(jnp.abs(t_m),
                                   jnp.finfo(jnp.result_type(t_m)).tiny))
        ln_q = jnp.einsum("mai,mij,mbj->mab", w_jnp, ln_m, w_jnp,
                          precision=hp)
        sg_q = jnp.einsum("mai,mij,mbj->mab", w_jnp, sgn_m, w_jnp,
                          precision=hp)
        mag = jnp.exp(ln_q)
        return jnp.einsum("m,mab->ab", base_wgt,
                          jnp.where(sg_q >= 0.0, mag, -mag), precision=hp)

    model0 = model[0] if isinstance(model, (list, tuple)) else model
    d = (background.growth_factor(cosmo, z, grid.n_growth)
         / model0.mass.growth)
    weight = base_wgt * d**6
    sgn_tbar, ln_tbar = tri_table(model)
    ln_q = jnp.einsum("mai,ij,mbj->mab", w_jnp, ln_tbar, w_jnp,
                      precision=hp)
    sg_q = jnp.einsum("mai,ij,mbj->mab", w_jnp, sgn_tbar, w_jnp,
                      precision=hp)
    mag = jnp.exp(ln_q)
    t_q = jnp.where(sg_q >= 0.0, mag, -mag)
    return jnp.einsum("m,mab->ab", weight, t_q, precision=hp)


def nongaussian_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                           model: HaloModel, dist, theta_edges_deg,
                           omega_s_sr, galaxy: bool = True,
                           with_bao: bool = False,
                           grid: GridSpec = DEFAULT_GRID,
                           n_ell_cov: int = 96,
                           ell_lo: float = 1.0, ell_hi: float = 1.0e5,
                           exact_z: bool = False, windows=None,
                           tracers=None, mu_i: int = 0, mu_j: int = 0,
                           theta_edges_deg_j=None,
                           n_k_tri: int = 96, n_z_tri: int = 24,
                           method: str | None = None, u_stride: int = 4,
                           mask=None, exact_z_anchors: int | None = None):
    """Non-Gaussian (connected trispectrum) covariance block.

    Defaults reproduce the w_gg auto-block; ``windows``/``tracers`` +
    ``mu_i``/``mu_j`` (and optionally distinct j-side bin edges) select
    any cross-probe block, e.g. gg x gt: tracers ("g","g","g","m"),
    windows (W_g, W_g, W_g, W_kappa), mu_j = 2.  ``method``: see
    :func:`projected_trispectrum` ("lattice" = gather-free default).

    The exact connected term is a PSD operator, but its discretization
    (T̄ on an n_ell_cov log grid + 2-tap interpolation) is only
    approximately so: auto-block diagonal entries can come out
    slightly NEGATIVE where the cNG is ≲1e-3 of the Gaussian diagonal
    (measured at multi-degree bins) — quadrature noise around zero,
    not a sign of a wrong block.  Every joint/tomographic builder
    accepts ``psd_guard="clip"`` (:func:`psd_clip`) to project the
    ASSEMBLED matrix back onto the PSD cone before returning it."""
    ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
    w = jnp.asarray(w_np)
    edges_i = np.radians(np.asarray(theta_edges_deg))
    edges_j = np.radians(np.asarray(
        theta_edges_deg if theta_edges_deg_j is None else theta_edges_deg_j))
    ells = jnp.asarray(ells_np)
    b_i = bin_averaged_bessel(ells, edges_i, mu_i)        # (nbi, nl)
    b_j = bin_averaged_bessel(ells, edges_j, mu_j)        # (nbj, nl)
    t_proj = projected_trispectrum(cosmo, halo_p, model, dist, ells_np,
                                   galaxy, with_bao, grid,
                                   n_k_tri=n_k_tri, n_z_tri=n_z_tri,
                                   exact_z=exact_z, windows=windows,
                                   tracers=tracers, method=method,
                                   u_stride=u_stride,
                                   exact_z_anchors=exact_z_anchors)
    meas = ells**2 * w / (2.0 * jnp.pi)                   # l dl/(2 pi)
    import jax

    hp = jax.lax.Precision.HIGHEST
    core = jnp.matmul(
        jnp.matmul(b_i * meas[None, :], t_proj, precision=hp),
        (b_j * meas[None, :]).T, precision=hp)
    if mask is None:
        return core / omega_s_sr
    from chomp_tpu.mask import pair_normalization

    ann_i = np.pi * (edges_i[1:] ** 2 - edges_i[:-1] ** 2)
    ann_j = np.pi * (edges_j[1:] ** 2 - edges_j[:-1] ** 2)
    d_i = pair_normalization(mask, edges_i)
    d_j = pair_normalization(mask, edges_j)
    return core * jnp.asarray(mask.area4 * np.outer(ann_i, ann_j)
                              / np.outer(d_i, d_j))


def psd_clip(cov, floor_rel: float = 0.0):
    """Project a (nearly) symmetric covariance onto the PSD cone by
    eigenvalue clipping (VERDICT round-4 item 4).

    The exact connected (trispectrum) term is a PSD operator, but its
    discretization — T̄ on a log-ell grid + 2-tap interpolation — is
    only approximately so: assembled joint matrices can carry tiny
    NEGATIVE eigenvalues (~1e-3 of the Gaussian diagonal at
    multi-degree bins, :func:`nongaussian_covariance` docs), and a
    downstream Cholesky then fails for a matrix the library returned
    without complaint.  This symmetrizes, clips eigenvalues at
    ``floor_rel * max(eigenvalue)`` (0 = exact PSD boundary), and
    reassembles.

    Grad-safe by construction: the correction is wrapped in
    ``stop_gradient``, so gradients flow through the RAW matrix
    unchanged (eigh's degenerate-eigenvalue NaN-gradient hazard never
    enters).  Where the input is already PSD the correction is ~1 ulp.
    jit/vmap-able."""
    import jax

    sym = 0.5 * (cov + cov.T)
    lam, v = jnp.linalg.eigh(sym)
    floor = floor_rel * jnp.max(jnp.abs(lam))
    lam_c = jnp.maximum(lam, floor)
    fixed = (v * lam_c[None, :]) @ v.T
    fixed = 0.5 * (fixed + fixed.T)
    return cov + jax.lax.stop_gradient(fixed - cov)


def _apply_psd_guard(cov, psd_guard):
    """Shared builder hook: ``psd_guard`` None = return as-is (the
    historical bitwise path), "clip" = :func:`psd_clip`."""
    if psd_guard is None:
        return cov
    if psd_guard == "clip":
        return psd_clip(cov)
    raise ValueError(f"psd_guard must be None or 'clip', got "
                     f"{psd_guard!r}")


def lattice_cl_callables(cosmo, halo_p, model, dist_lens, dist_src,
                         with_bao: bool = False,
                         grid: GridSpec = DEFAULT_GRID):
    """(cl_gg, cl_gk, cl_kk) closures over static numpy ℓ grids, fed by
    ONE halo evaluation on the gather-free log-convolution lattice
    (limber_fft.limber_cl_fft — the flagship fast path; y-matrices
    shared across mm/gm/gg).  The building block of the TPU-first joint
    covariance, shared by the flat (joint_wtheta_gammat_covariance) and
    curved (curved.curved_joint_wtheta_gammat_covariance) assemblies."""
    from chomp_tpu import limber_fft
    from chomp_tpu.projection import WindowConvergence, WindowGalaxy

    win_g = WindowGalaxy(dist=dist_lens)
    win_k = WindowConvergence(dist=dist_src)
    p_lat = limber_fft.p_lattice_halo_all(cosmo, halo_p, model,
                                          with_bao, grid)
    piv = model.mass.growth

    def cl_gg(ells_np):
        return limber_fft.limber_cl_fft(cosmo, win_g, win_g, ells_np,
                                        p_lat["power_gg"], grid,
                                        growth_pivot=piv)

    def cl_gk(ells_np):
        return limber_fft.limber_cl_fft(cosmo, win_g, win_k, ells_np,
                                        p_lat["power_gm"], grid,
                                        growth_pivot=piv)

    def cl_kk(ells_np):
        return limber_fft.limber_cl_fft(cosmo, win_k, win_k, ells_np,
                                        p_lat["power_mm"], grid,
                                        growth_pivot=piv)

    return cl_gg, cl_gk, cl_kk


def joint_wtheta_gammat_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                                   model, dist_lens, dist_src,
                                   theta_edges_deg, omega_s_sr,
                                   n2d_lens, shape_noise,
                                   with_bao: bool = False,
                                   grid: GridSpec = DEFAULT_GRID,
                                   include_nongaussian: bool = True,
                                   exact_z: bool = False,
                                   n_k_tri: int = 96, n_z_tri: int = 24,
                                   n_ell_cov_ng: int = 96,
                                   n_ell_cov_g: int = 4096,
                                   cl_method: str = "lattice",
                                   tri_method: str | None = None,
                                   u_stride: int = 4, mask=None,
                                   exact_z_anchors: int | None = None,
                                   include_ssc: bool = False,
                                   ssc_kwargs: dict | None = None,
                                   psd_guard: str | None = None,
                                   beyond_nka: bool = False):
    """Joint covariance of the stacked data vector [w_gg bins, gamma_t
    bins] — the full Morrison & Schneider 2013 clustering + g-g lensing
    program (upstream:covariance.py; SURVEY.md §2 row 13).

    ``include_ssc`` adds the super-sample term to every block
    (ssc.ssc_covariance — responses x footprint sigma_b^2; the
    footprint is ``mask`` if given, else an equal-area disc at
    ``omega_s_sr``); ``ssc_kwargs`` forward (n_k_ssc, local_counts,
    ...).  For wide footprints SSC usually DOMINATES the connected
    term — see the ssc module docstring.

    ``n2d_lens``: lens galaxies per steradian (shot noise N_gg = 1/n2d).
    ``shape_noise``: the white shear-noise level N_kk = sigma_eps^2 /
    n2d_src (sigma_eps per component; caller computes).  Returns a
    (2 nb, 2 nb) matrix ordered [ww, w-gt; gt-w, gt-gt].

    ``cl_method="lattice"`` (default) feeds every Gaussian block its
    C_ell's through the gather-free log-convolution lattice
    (limber_fft.limber_cl_fft — the flagship fast path; the ell grids
    here are static numpy, so the lattice interpolation weights fold in
    at trace time).  ``tri_method="lattice"`` runs the trispectrum
    projection as static-weight einsums (projected_trispectrum).  With
    both set (default) the ENTIRE joint matrix contains zero dynamic
    gathers — VERDICT round-2 item 1; "table" on either knob restores
    the original gathered referee route.

    ``mask`` (chomp_tpu.mask surface): footprint treatment at the
    fsky/pair-count level for EVERY block (see gaussian_block);
    ``omega_s_sr`` is then ignored.  ``beyond_nka=True`` (needs mask)
    activates the round-5 footprint-scale refinements — weighted
    delta factors everywhere plus the "gt" wedge residual on the γt
    auto block (gaussian_block docstring)."""
    from chomp_tpu import projection
    from chomp_tpu.projection import WindowConvergence, WindowGalaxy

    from chomp_tpu import halo as halo_mod
    from chomp_tpu.grids import loggrid

    win_g = WindowGalaxy(dist=dist_lens)
    win_k = WindowConvergence(dist=dist_src)
    if cl_method == "lattice":
        cl_gg, cl_gk, cl_kk = lattice_cl_callables(
            cosmo, halo_p, model, dist_lens, dist_src, with_bao, grid)
    elif cl_method == "table":
        ln_k_np, dln = loggrid(grid.k_table_min, grid.k_table_max,
                               grid.n_k_table)
        ln_k = jnp.asarray(ln_k_np)
        p_all = halo_mod.powers(cosmo, halo_p, model, jnp.exp(ln_k),
                                with_bao, grid)

        def _table(kind):
            return projection.PowerTable(
                ln_k0=ln_k[0], dln=jnp.asarray(dln),
                ln_p=jnp.log(jnp.maximum(p_all[kind], 1e-300)),
                growth_pivot=model.mass.growth)

        pt_gg = _table("power_gg")
        pt_gm = _table("power_gm")
        pt_mm = _table("power_mm")

        def cl_gg(ells):
            return projection.limber_cl(cosmo, win_g, win_g, ells, pt_gg,
                                        grid)

        def cl_gk(ells):
            return projection.limber_cl(cosmo, win_g, win_k, ells, pt_gm,
                                        grid)

        def cl_kk(ells):
            return projection.limber_cl(cosmo, win_k, win_k, ells, pt_mm,
                                        grid)
    else:
        raise ValueError(f"cl_method must be 'lattice' or 'table', got "
                         f"{cl_method!r}")

    edges = theta_edges_deg
    n_g = 1.0 / n2d_lens
    # Gaussian blocks: [C~_ac C~_bd + C~_ad C~_bc] with (ab)/(cd) the
    # estimator tracer pairs — ww: (gg)x(gg); w-gt: (gg)x(gk);
    # gt-gt: (gk)x(gk).
    bnk = dict(n_ell_cov=n_ell_cov_g, mask=mask, beyond_nka=beyond_nka)
    cov_ww = gaussian_block(cl_gg, cl_gg, cl_gg, cl_gg, edges, edges,
                            omega_s_sr, 0, 0, n_g, n_g, n_g, n_g, **bnk)
    cov_wg = gaussian_block(cl_gg, cl_gk, cl_gk, cl_gg, edges, edges,
                            omega_s_sr, 0, 2, n_g, 0.0, 0.0, n_g, **bnk)
    cov_gg = gaussian_block(cl_gg, cl_kk, cl_gk, cl_gk, edges, edges,
                            omega_s_sr, 2, 2, n_g, shape_noise, 0.0, 0.0,
                            wedge_probe=("gt" if beyond_nka else None),
                            **bnk)
    if include_nongaussian:
        common = dict(with_bao=with_bao, grid=grid, exact_z=exact_z,
                      n_ell_cov=n_ell_cov_ng, n_k_tri=n_k_tri,
                      n_z_tri=n_z_tri, method=tri_method,
                      u_stride=u_stride, mask=mask,
                      exact_z_anchors=exact_z_anchors)
        cov_ww = cov_ww + nongaussian_covariance(
            cosmo, halo_p, model, dist_lens, edges, omega_s_sr,
            windows=(win_g,) * 4, tracers=("g", "g", "g", "g"),
            mu_i=0, mu_j=0, **common)
        cov_wg = cov_wg + nongaussian_covariance(
            cosmo, halo_p, model, dist_lens, edges, omega_s_sr,
            windows=(win_g, win_g, win_g, win_k),
            tracers=("g", "g", "g", "m"), mu_i=0, mu_j=2, **common)
        cov_gg = cov_gg + nongaussian_covariance(
            cosmo, halo_p, model, dist_lens, edges, omega_s_sr,
            windows=(win_g, win_k, win_g, win_k),
            tracers=("g", "m", "g", "m"), mu_i=2, mu_j=2, **common)
    if include_ssc:
        from chomp_tpu.ssc import ssc_covariance

        skw = dict(with_bao=with_bao, grid=grid, u_stride=u_stride,
                   exact_z_anchors=exact_z_anchors, **(ssc_kwargs or {}))
        fp = mask if mask is not None else omega_s_sr
        cov_ww = cov_ww + ssc_covariance(
            cosmo, halo_p, model, dist_lens, edges, fp,
            windows=(win_g,) * 4, tracers=("g",) * 4,
            mu_i=0, mu_j=0, **skw)
        cov_wg = cov_wg + ssc_covariance(
            cosmo, halo_p, model, dist_lens, edges, fp,
            windows=(win_g, win_g, win_g, win_k),
            tracers=("g", "g", "g", "m"), mu_i=0, mu_j=2, **skw)
        cov_gg = cov_gg + ssc_covariance(
            cosmo, halo_p, model, dist_lens, edges, fp,
            windows=(win_g, win_k, win_g, win_k),
            tracers=("g", "m", "g", "m"), mu_i=2, mu_j=2, **skw)
    top = jnp.concatenate([cov_ww, cov_wg], axis=1)
    bot = jnp.concatenate([cov_wg.T, cov_gg], axis=1)
    return _apply_psd_guard(jnp.concatenate([top, bot], axis=0),
                            psd_guard)


def joint_3x2pt_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                           model, dist_lens, dist_src,
                           theta_edges_deg, omega_s_sr,
                           n2d_lens, shape_noise,
                           with_bao: bool = False,
                           grid: GridSpec = DEFAULT_GRID,
                           include_nongaussian: bool = True,
                           exact_z: bool = False,
                           n_k_tri: int = 96, n_z_tri: int = 24,
                           n_ell_cov_ng: int = 96,
                           n_ell_cov_g: int = 4096,
                           cl_method: str = "lattice",
                           tri_method: str | None = None,
                           u_stride: int = 4, mask=None,
                           exact_z_anchors: int | None = None,
                           include_ssc: bool = False,
                           ssc_kwargs: dict | None = None,
                           psd_guard: str | None = None,
                           beyond_nka: bool = False):
    """Joint covariance of the FULL 3x2pt data vector
    [w_gg, gamma_t, xi_+, xi_-] — (4 nb, 4 nb).

    ``include_ssc`` adds the super-sample term to every block
    (ssc.ssc_covariance; footprint = ``mask`` if given, else an
    equal-area disc at ``omega_s_sr``; ``ssc_kwargs`` forward).

    Extends joint_wtheta_gammat_covariance (the Morrison & Schneider
    2013 clustering + g-g lensing program, SURVEY.md §2 row 13) with
    the shear-shear rows — a capability extension beyond chomp
    (correlation.xi_plus docstring) built from the same TPU-first
    blocks: lattice C_ell callables, closed-form Jbar factors
    (J0/J2/J4), analytic noise closures.

    Shear field model: E-mode signal (C_EE = C_kk), C_BB = 0, with
    white noise ``shape_noise`` = sigma_eps^2 / n2d_src PER COMPONENT
    in BOTH E and B.  xi_+- = EE +- BB estimator combinations, so each
    shear-auto block is an EE block plus/minus a pure-noise BB block:
    the BB piece ADDS noise to Cov[xi+, xi+] and Cov[xi-, xi-] and
    exactly CANCELS the pure-noise constant in Cov[xi+, xi-] (the
    tangential/cross products decorrelate — the classic result that
    the xi_+ x xi_- shot-noise covariance vanishes; here it falls out
    of the EE - BB assembly, each side carrying the {0,4}
    Weber-Schafheitlin constant).

    gamma_t and xi_+- correlate only through the E-mode (B never
    pairs with g or E), so every cross block is a single
    gaussian_block call.  ``mask`` applies the footprint treatment to
    every block with the generalized moment rule
    ½(K_{|mu_i-mu_j|} + K_{mu_i+mu_j}) (see gaussian_block).
    ``beyond_nka=True`` (needs mask) activates the round-5
    footprint-scale refinements per block: weighted delta factors,
    the ξ+ auto <γγ><γ*γ*> field-phase damping, and the MC-calibrated
    "gt"/"xip" wedge residuals (gaussian_block docstring)."""
    from chomp_tpu.projection import WindowConvergence, WindowGalaxy

    win_g = WindowGalaxy(dist=dist_lens)
    win_k = WindowConvergence(dist=dist_src)
    if cl_method != "lattice":
        raise ValueError("joint_3x2pt_covariance is lattice-only (the "
                         "table referee route lives in "
                         "joint_wtheta_gammat_covariance)")
    cl_gg, cl_gk, cl_kk = lattice_cl_callables(
        cosmo, halo_p, model, dist_lens, dist_src, with_bao, grid)

    def cl_zero(ells_np):
        return jnp.zeros(len(np.asarray(ells_np)))

    edges = theta_edges_deg
    n_g = 1.0 / n2d_lens
    ns = float(shape_noise)
    gk = dict(n_ell_cov=n_ell_cov_g, mask=mask, beyond_nka=beyond_nka)

    def blk(ac, bd, ad, bc, mi, mj, nac, nbd, nad, nbc, **extra):
        return gaussian_block(ac, bd, ad, bc, edges, edges, omega_s_sr,
                              mi, mj, nac, nbd, nad, nbc, **gk, **extra)

    # Row-major unique blocks; probe order (w, gt, xp, xm).
    c_ww = blk(cl_gg, cl_gg, cl_gg, cl_gg, 0, 0, n_g, n_g, n_g, n_g)
    c_wg = blk(cl_gg, cl_gk, cl_gk, cl_gg, 0, 2, n_g, 0.0, 0.0, n_g)
    c_wp = blk(cl_gk, cl_gk, cl_gk, cl_gk, 0, 0, 0.0, 0.0, 0.0, 0.0)
    c_wm = blk(cl_gk, cl_gk, cl_gk, cl_gk, 0, 4, 0.0, 0.0, 0.0, 0.0)
    c_gg = blk(cl_gg, cl_kk, cl_gk, cl_gk, 2, 2, n_g, ns, 0.0, 0.0,
               wedge_probe=("gt" if beyond_nka else None))
    c_gp = blk(cl_gk, cl_kk, cl_gk, cl_kk, 2, 0, 0.0, ns, 0.0, ns)
    c_gm = blk(cl_gk, cl_kk, cl_gk, cl_kk, 2, 4, 0.0, ns, 0.0, ns)
    bb = dict(nac=ns, nbd=ns, nad=ns, nbc=ns)

    def shear_auto(mi, mj, sign, **extra):
        ee = blk(cl_kk, cl_kk, cl_kk, cl_kk, mi, mj, ns, ns, ns, ns,
                 **extra)
        bbn = blk(cl_zero, cl_zero, cl_zero, cl_zero, mi, mj, **bb)
        return ee + sign * bbn

    c_pp = shear_auto(0, 0, +1.0,
                      **({"field_spins": ((4, 4), (0, 0)),
                          "wedge_probe": "xip"} if beyond_nka else {}))
    c_pm = shear_auto(0, 4, -1.0)
    c_mm = shear_auto(4, 4, +1.0)

    # Connected + super-sample additions share one (windows, tracers,
    # mu_i, mu_j) table over the 10 unique probe-pair blocks.
    g4, k4, m4 = (win_g,) * 4, (win_k,) * 4, ("m",) * 4
    gk2 = (win_g, win_g, win_k, win_k)
    combos = {
        "ww": (g4, ("g",) * 4, 0, 0),
        "wg": ((win_g, win_g, win_g, win_k), ("g", "g", "g", "m"), 0, 2),
        "wp": (gk2, ("g", "g", "m", "m"), 0, 0),
        "wm": (gk2, ("g", "g", "m", "m"), 0, 4),
        "gg": ((win_g, win_k, win_g, win_k), ("g", "m", "g", "m"), 2, 2),
        "gp": ((win_g, win_k, win_k, win_k), ("g", "m", "m", "m"), 2, 0),
        "gm": ((win_g, win_k, win_k, win_k), ("g", "m", "m", "m"), 2, 4),
        "pp": (k4, m4, 0, 0),
        "pm": (k4, m4, 0, 4),
        "mm": (k4, m4, 4, 4),
    }
    adders = []
    if include_nongaussian:
        common = dict(with_bao=with_bao, grid=grid, exact_z=exact_z,
                      n_ell_cov=n_ell_cov_ng, n_k_tri=n_k_tri,
                      n_z_tri=n_z_tri, method=tri_method,
                      u_stride=u_stride, mask=mask,
                      exact_z_anchors=exact_z_anchors)
        adders.append(lambda ws, ts, mi, mj: nongaussian_covariance(
            cosmo, halo_p, model, dist_lens, edges, omega_s_sr,
            windows=ws, tracers=ts, mu_i=mi, mu_j=mj, **common))
    if include_ssc:
        from chomp_tpu.ssc import ssc_covariance

        skw = dict(with_bao=with_bao, grid=grid, u_stride=u_stride,
                   exact_z_anchors=exact_z_anchors, **(ssc_kwargs or {}))
        fp = mask if mask is not None else omega_s_sr
        adders.append(lambda ws, ts, mi, mj: ssc_covariance(
            cosmo, halo_p, model, dist_lens, edges, fp,
            windows=ws, tracers=ts, mu_i=mi, mu_j=mj, **skw))
    blocks = {"ww": c_ww, "wg": c_wg, "wp": c_wp, "wm": c_wm,
              "gg": c_gg, "gp": c_gp, "gm": c_gm, "pp": c_pp,
              "pm": c_pm, "mm": c_mm}
    for add in adders:
        for key, (ws, ts, mi, mj) in combos.items():
            blocks[key] = blocks[key] + add(ws, ts, mi, mj)
    c_ww, c_wg, c_wp, c_wm = (blocks[k] for k in ("ww", "wg", "wp", "wm"))
    c_gg, c_gp, c_gm = (blocks[k] for k in ("gg", "gp", "gm"))
    c_pp, c_pm, c_mm = (blocks[k] for k in ("pp", "pm", "mm"))

    rows = [
        jnp.concatenate([c_ww, c_wg, c_wp, c_wm], axis=1),
        jnp.concatenate([c_wg.T, c_gg, c_gp, c_gm], axis=1),
        jnp.concatenate([c_wp.T, c_gp.T, c_pp, c_pm], axis=1),
        jnp.concatenate([c_wm.T, c_gm.T, c_pm.T, c_mm], axis=1),
    ]
    return _apply_psd_guard(jnp.concatenate(rows, axis=0), psd_guard)


def tomographic_lattice_cl_callables(cosmo, halo_p, model, lens_dists,
                                     src_dists, with_bao: bool = False,
                                     grid: GridSpec = DEFAULT_GRID,
                                     nuisance=None,
                                     include_magnification: bool = False,
                                     cmb=None,
                                     matter_power: str = "halo"):
    """All tomographic C_ℓ callables from ONE halo evaluation on the
    gather-free lattice: a dict keyed ("gg", i, j) (lens pairs, i ≤ j),
    ("gk", i, j) (lens i x source j), ("kk", j, k) (source pairs,
    j ≤ k).

    ``cmb`` (a cmblens.CMBLensingSpec) adds the kappa_CMB pairings:
    ("gK", i) = lens i x kappa_CMB (bin i's P_gm; magnification adds
    c_i x mm through the lens convergence window, mirroring gk),
    ("kK", j) = source j x kappa_CMB (P_mm; scaled by (1+m_j), IA term
    riding the source window), and ("KK",) = the kappa_CMB auto P_mm
    spectrum PLUS the decaying part of the reconstruction noise
    (cmb.nl_resid — static numpy, folded in at trace time; the white
    floor nl_inf is the _tomographic_pair_fn noise constant).

    ``model`` is either ONE HaloModel (every lens bin shares the HOD —
    the single-sample tomography setup) or a LIST of per-lens-bin
    models sharing mass tables (halo.build_halo_models): then each bin
    pair gets its own spectra, with cross-bin clustering through
    halo.power_gg_cross (independent-occupation cross 1-halo).

    ``nuisance`` (a parallel.sweep.Nuisance3x2pt): evaluate the C_ℓs
    at a FIDUCIAL systematics vector — photo-z-shifted windows, the
    NLA IA term in every source window, and the multiplicative shear
    calibration scaling the spectra exactly as it scales the data
    (gk × (1+m_j), kk × (1+m_j)(1+m_k)); the standard
    covariance-at-fiducial-nuisance treatment.

    ``include_magnification=True`` (needs ``nuisance``) carries lens
    magnification bias into the covariance spectra with the SAME
    per-term structure as the prediction (make_tomographic_pipeline's
    δ_obs,i = δ_g,i + c_i κ_i with c_i = 2(α_i - 1), each term with
    its own halo spectrum):

      C^obs_gg(i,j) = C^{g_i g_j}_gg + c_j C^{g_i κ_j}_gm
                      + c_i C^{g_j κ_i}_gm + c_i c_j C^{κ_i κ_j}_mm
      C^obs_gk(i,j) = [C^{g_i κ_j}_gm + c_i C^{κ_i κ_j}_mm] (1+m_j)

    where κ_i is the CONVERGENCE window of (photo-z-shifted) lens bin
    i and the g_i×κ cross terms use bin i's P_gm in per-bin-HOD mode.
    α_i = 1 reduces exactly to the unmagnified callables.

    ``matter_power``: "halo" (default) | "halofit" | "linear" — swaps
    the power_mm lattice row feeding every mm pairing (kk, kK, KK,
    magnification mm terms), matching the prediction pipelines'
    option.  The covariance lattice route is separable by
    construction, so the swapped spectrum is the model-pivot shape
    scaled by D^2 — ample for a covariance (a ~percent-shape effect on
    an already-approximate NKA/Gaussian block)."""
    from chomp_tpu import limber_fft
    from chomp_tpu.projection import (DNdzShifted, WindowConvergence,
                                      WindowConvergenceIA, WindowGalaxy)

    if include_magnification and nuisance is None:
        raise ValueError("include_magnification needs nuisance= (the "
                         "slopes live in Nuisance3x2pt.alpha_lens)")
    if nuisance is None:
        wins_g = [WindowGalaxy(dist=d) for d in lens_dists]
        wins_k = [WindowConvergence(dist=d) for d in src_dists]
        cal = None
        wk_lens = None
    else:
        nu = nuisance
        lens_cur = [DNdzShifted(base=d, dz=nu.dz_lens[i])
                    for i, d in enumerate(lens_dists)]
        wins_g = [WindowGalaxy(dist=d) for d in lens_cur]
        wins_k = [WindowConvergenceIA(
            dist=DNdzShifted(base=d, dz=nu.dz_src[j]), a_ia=nu.a_ia,
            eta_ia=nu.eta_ia, z0_ia=nu.z0_ia)
            for j, d in enumerate(src_dists)]
        cal = 1.0 + nu.m
        wk_lens = ([WindowConvergence(dist=d) for d in lens_cur]
                   if include_magnification else None)
    if isinstance(model, (list, tuple)):
        if len(model) != len(lens_dists):
            raise ValueError(
                f"per-bin models: got {len(model)} models for "
                f"{len(lens_dists)} lens bins")
        p_lat = limber_fft.p_lattice_tomographic(cosmo, halo_p,
                                                 list(model), with_bao,
                                                 grid)
        piv = model[0].mass.growth
        key_gg = lambda i, j: ("power_gg", i, j)
        key_gm = lambda i: ("power_gm", i)
    else:
        p_lat = limber_fft.p_lattice_halo_all(cosmo, halo_p, model,
                                              with_bao, grid)
        piv = model.mass.growth
        key_gg = lambda i, j: "power_gg"
        key_gm = lambda i: "power_gm"
    if matter_power != "halo":
        from chomp_tpu.parallel.sweep import _mm_override

        m0 = model[0] if isinstance(model, (list, tuple)) else model
        p_lat = dict(p_lat)
        p_lat["power_mm"] = _mm_override(cosmo, m0.mass.z, matter_power,
                                         with_bao, grid)

    def make(win_a, win_b, kind):
        def cl(ells_np):
            return limber_fft.limber_cl_fft(cosmo, win_a, win_b,
                                            ells_np, p_lat[kind], grid,
                                            growth_pivot=piv)
        return cl

    def scaled(fn, factor):
        if factor is None:
            return fn

        def cl(ells_np):
            return factor * fn(ells_np)

        return cl

    def summed(terms):
        """Σ coeff_t × fn_t(ℓ) — one callable per observed spectrum;
        the shared lattice convolutions deduplicate under jit (CSE)."""
        def cl(ells_np):
            acc = None
            for coeff, f in terms:
                v = coeff * f(ells_np)
                acc = v if acc is None else acc + v
            return acc

        return cl

    c_mag = (2.0 * (nuisance.alpha_lens - 1.0) if wk_lens is not None
             else None)
    out = {}
    for i in range(len(wins_g)):
        for j in range(i, len(wins_g)):
            base = make(wins_g[i], wins_g[j], key_gg(i, j))
            if c_mag is None:
                out[("gg", i, j)] = base
            else:
                out[("gg", i, j)] = summed([
                    (1.0, base),
                    (c_mag[j], make(wins_g[i], wk_lens[j], key_gm(i))),
                    (c_mag[i], make(wins_g[j], wk_lens[i], key_gm(j))),
                    (c_mag[i] * c_mag[j],
                     make(wk_lens[i], wk_lens[j], "power_mm")),
                ])
        for j in range(len(wins_k)):
            base = make(wins_g[i], wins_k[j], key_gm(i))
            if c_mag is not None:
                base = summed([
                    (1.0, base),
                    (c_mag[i], make(wk_lens[i], wins_k[j], "power_mm")),
                ])
            out[("gk", i, j)] = scaled(
                base, None if cal is None else cal[j])
    for j in range(len(wins_k)):
        for k in range(j, len(wins_k)):
            out[("kk", j, k)] = scaled(
                make(wins_k[j], wins_k[k], "power_mm"),
                None if cal is None else cal[j] * cal[k])
    if cmb is not None:
        win_kcmb = cmb.window()
        for i in range(len(wins_g)):
            base = make(wins_g[i], win_kcmb, key_gm(i))
            if c_mag is not None:
                base = summed([
                    (1.0, base),
                    (c_mag[i], make(wk_lens[i], win_kcmb, "power_mm")),
                ])
            out[("gK", i)] = base
        for j in range(len(wins_k)):
            out[("kK", j)] = scaled(
                make(wins_k[j], win_kcmb, "power_mm"),
                None if cal is None else cal[j])
        kk_base = make(win_kcmb, win_kcmb, "power_mm")

        def cl_kk_cmb(ells_np):
            return kk_base(ells_np) + jnp.asarray(cmb.nl_resid(ells_np))

        out[("KK",)] = cl_kk_cmb
    return out


def tomographic_probes(n_lens: int, n_src: int,
                       cmb_lensing: bool = False):
    """The canonical tomographic 3x2pt probe list, in data-vector
    order: w_i (lens autos), gamma_t_{ij} (every lens x source), then
    xi_+^{jk} and xi_-^{jk} (source pairs, j <= k).  Each entry is
    (name, mu, channels) with channels a list of ((tracer_a, tracer_b),
    sign) over the E/B decomposition; tracers are ("g", i) / ("E", j) /
    ("B", j).

    ``cmb_lensing=True`` appends the kappa_CMB cross-correlations
    wgk_i = w_{g_i kappa_CMB}(theta) (mu = 0, tracer ("K", 0)) — the
    5x2pt-plus-kappa data vector (chomp_tpu.cmblens)."""
    probes = []
    for i in range(n_lens):
        probes.append((f"w_{i}", 0, [((("g", i), ("g", i)), 1.0)]))
    for i in range(n_lens):
        for j in range(n_src):
            probes.append((f"gt_{i}{j}", 2,
                           [((("g", i), ("E", j)), 1.0)]))
    for j in range(n_src):
        for k in range(j, n_src):
            probes.append((f"xip_{j}{k}", 0,
                           [((("E", j), ("E", k)), 1.0),
                            ((("B", j), ("B", k)), 1.0)]))
    for j in range(n_src):
        for k in range(j, n_src):
            probes.append((f"xim_{j}{k}", 4,
                           [((("E", j), ("E", k)), 1.0),
                            ((("B", j), ("B", k)), -1.0)]))
    if cmb_lensing:
        for i in range(n_lens):
            probes.append((f"wgk_{i}", 0,
                           [((("g", i), ("K", 0)), 1.0)]))
    return probes


def _tomographic_noise_lists(n2d_lens_list, shape_noise_list, n_lens,
                             n_src):
    """Concrete per-bin noise levels (scalars broadcast to every bin)."""
    n2d = [float(x) for x in np.atleast_1d(n2d_lens_list)]
    sn = [float(x) for x in np.atleast_1d(shape_noise_list)]
    if len(n2d) == 1:
        n2d = n2d * n_lens
    if len(sn) == 1:
        sn = sn * n_src
    return n2d, sn


def _tomographic_pair_fn(cls, n2d, sn, cl_zero, nl_inf: float = 0.0):
    """(C_ℓ callable, noise level) for any tracer pair over the
    tomographic_probes tracer alphabet ("g", i) / ("E", j) / ("B", j)
    / ("K", 0) (kappa_CMB), given the callables dict from
    tomographic_lattice_cl_callables and per-bin noise lists.  Shared
    by the flat and curved tomographic builders — the E/B channel
    bookkeeping (and the exact xi_+ x xi_- noise cancellation it
    encodes) is geometry-independent.  ``nl_inf``: the WHITE floor of
    the kappa reconstruction noise (cmblens.CMBLensingSpec.nl_inf);
    the decaying residual lives inside the ("KK",) callable."""
    def pair(t1, t2):
        k1, i1 = t1
        k2, i2 = t2
        if "B" in (k1, k2):
            if t1 == t2:
                return cl_zero, sn[i1]
            return cl_zero, 0.0
        if "K" in (k1, k2):
            if (k1, k2) == ("K", "K"):
                return cls[("KK",)], nl_inf
            kind, idx = (k2, i2) if k1 == "K" else (k1, i1)
            if kind == "g":
                return cls[("gK", idx)], 0.0
            return cls[("kK", idx)], 0.0       # ("E", j) x kappa_CMB
        if (k1, k2) == ("g", "g"):
            lo, hi = min(i1, i2), max(i1, i2)
            return cls[("gg", lo, hi)], (1.0 / n2d[i1] if i1 == i2
                                         else 0.0)
        if (k1, k2) == ("g", "E"):
            return cls[("gk", i1, i2)], 0.0
        if (k1, k2) == ("E", "g"):
            return cls[("gk", i2, i1)], 0.0
        lo, hi = min(i1, i2), max(i1, i2)      # ("E", "E")
        return cls[("kk", lo, hi)], (sn[i1] if i1 == i2 else 0.0)

    return pair


def _tomographic_ng_block_fn(cosmo, halo_p, model, lens_dists, src_dists,
                             edges, omega_s_sr, with_bao, grid, mask,
                             ng_kwargs, curved_mask=None, nuisance=None,
                             engine: str = "cng", cmb=None):
    """(probe_entry_a, probe_entry_b) -> connected (cNG) block, or None
    if no channel pair contributes.  B tracers carry no connected piece
    (the B field is zero in the E-only shear model), so each block is
    the nongaussian_covariance of its non-B channel pair with the
    tracer legs mapped g -> lens window i, E -> convergence window j.

    ``engine="ssc"`` swaps the block engine for the super-sample term
    (ssc.ssc_covariance / ssc.curved_ssc_covariance) — the channel,
    leg-window, per-bin-model, and nuisance treatment is IDENTICAL;
    the per-SIDE halo model is the side's g-leg bin (matter-only sides
    use the shared mass sector, which every bin's model carries), and
    ``ng_kwargs`` then holds the ssc engine kwargs (n_k_ssc, ...).
    The flat footprint is ``mask`` if given, else omega_s_sr's
    equal-area disc.

    ``curved_mask`` switches the engine to
    curved.curved_nongaussian_covariance (exact sphere bin factors with
    the probes' curved estimator codes, Ω_eff from the mask;
    ``ng_kwargs`` should then carry the ell_max).

    Per-bin HOD ``model`` lists: each "g" leg binds its lens bin's
    halo model and the engine runs the multi-sample trispectrum
    (trispectrum_parallelogram_tracers' per-leg form — independent-
    occupation cross moments on the breakpoint-union pack); "E" legs
    use the shared matter sector.

    ``nuisance`` evaluates the blocks at the fiducial systematics
    vector, mirroring the Gaussian treatment: photo-z-shifted windows,
    the NLA IA term in every E-leg window (NLA rides the matter field,
    so the window-level treatment is exact within Limber), and one
    (1+m_j) factor per E leg.  Requires CONCRETE nuisance values (the
    lattice projection sizes its static stride from the window
    supports).  Lens magnification stays Gaussian-only (its cNG terms
    are doubly sub-leading)."""
    from chomp_tpu.projection import (DNdzShifted, WindowConvergence,
                                      WindowConvergenceIA, WindowGalaxy)

    per_bin = isinstance(model, (list, tuple))
    if nuisance is None:
        wins_g = [WindowGalaxy(dist=d) for d in lens_dists]
        wins_k = [WindowConvergence(dist=d) for d in src_dists]
        cal = None
    else:
        nu = nuisance
        wins_g = [WindowGalaxy(dist=DNdzShifted(base=d,
                                                dz=nu.dz_lens[i]))
                  for i, d in enumerate(lens_dists)]
        wins_k = [WindowConvergenceIA(
            dist=DNdzShifted(base=d, dz=nu.dz_src[j]), a_ia=nu.a_ia,
            eta_ia=nu.eta_ia, z0_ia=nu.z0_ia)
            for j, d in enumerate(src_dists)]
        cal = 1.0 + nu.m

    def leg(t):
        kind, i = t
        if kind == "g":
            return (wins_g[i], "g", (model[i] if per_bin else model),
                    1.0)
        if kind == "K":
            # kappa_CMB legs project the matter field through the
            # single-plane window (cmblens); no calibration factor.
            return (cmb.window(), "m", (model[0] if per_bin else model),
                    1.0)
        # E legs project the kappa field; matter sector is shared.
        return (wins_k[i], "m", (model[0] if per_bin else model),
                1.0 if cal is None else cal[i])

    def _side_model(ts_pair, ms_pair):
        # The side's galaxy sample sets its response/trispectrum bin;
        # matter-only sides carry no HOD dependence in the kinds used.
        return ms_pair[0] if ts_pair[0] == "g" else ms_pair[1]

    if engine == "ssc":
        from chomp_tpu.ssc import curved_ssc_covariance, ssc_covariance

        if curved_mask is not None:
            from chomp_tpu.curved import _curved_probe_code

            def block(ws, ts, ms, entry_a, entry_b):
                m_pair = ((_side_model(ts[:2], ms[:2]),
                           _side_model(ts[2:], ms[2:]))
                          if per_bin else model)
                return curved_ssc_covariance(
                    cosmo, halo_p, m_pair, lens_dists[0], edges,
                    curved_mask, windows=ws, tracers=ts,
                    mu_i=_curved_probe_code(entry_a[1], entry_a[2]),
                    mu_j=_curved_probe_code(entry_b[1], entry_b[2]),
                    with_bao=with_bao, grid=grid, **ng_kwargs)
        else:
            fp = mask if mask is not None else omega_s_sr

            def block(ws, ts, ms, entry_a, entry_b):
                m_pair = ((_side_model(ts[:2], ms[:2]),
                           _side_model(ts[2:], ms[2:]))
                          if per_bin else model)
                return ssc_covariance(
                    cosmo, halo_p, m_pair, lens_dists[0], edges, fp,
                    windows=ws, tracers=ts, mu_i=entry_a[1],
                    mu_j=entry_b[1], with_bao=with_bao, grid=grid,
                    **ng_kwargs)
    elif curved_mask is not None:
        from chomp_tpu.curved import (_curved_probe_code,
                                      curved_nongaussian_covariance)

        def block(ws, ts, ms, entry_a, entry_b):
            return curved_nongaussian_covariance(
                cosmo, halo_p, ms, lens_dists[0], edges, curved_mask,
                windows=ws, tracers=ts,
                mu_i=_curved_probe_code(entry_a[1], entry_a[2]),
                mu_j=_curved_probe_code(entry_b[1], entry_b[2]),
                with_bao=with_bao, grid=grid, **ng_kwargs)
    else:
        def block(ws, ts, ms, entry_a, entry_b):
            return nongaussian_covariance(
                cosmo, halo_p, ms, lens_dists[0], edges, omega_s_sr,
                windows=ws, tracers=ts, mu_i=entry_a[1], mu_j=entry_b[1],
                with_bao=with_bao, grid=grid, mask=mask, **ng_kwargs)

    def ng(entry_a, entry_b):
        ch_a, ch_b = entry_a[2], entry_b[2]
        acc = None
        for (a, b), s_a in ch_a:
            if "B" in (a[0], b[0]):
                continue
            for (c, d), s_b in ch_b:
                if "B" in (c[0], d[0]):
                    continue
                ws, ts, ms, fs = zip(*(leg(t) for t in (a, b, c, d)))
                f_cal = fs[0] * fs[1] * fs[2] * fs[3]
                blk = s_a * s_b * f_cal * block(
                    ws, ts, ms if per_bin else model, entry_a, entry_b)
                acc = blk if acc is None else acc + blk
        return acc

    return ng


def tomographic_3x2pt_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                                 model, lens_dists, src_dists,
                                 theta_edges_deg, omega_s_sr,
                                 n2d_lens_list, shape_noise_list,
                                 with_bao: bool = False,
                                 grid: GridSpec = DEFAULT_GRID,
                                 n_ell_cov_g: int = 4096, mask=None,
                                 include_nongaussian=False,
                                 nuisance=None,
                                 include_magnification: bool = False,
                                 include_ssc=False,
                                 ssc_kwargs: dict | None = None,
                                 cmb_lensing=None,
                                 matter_power: str = "halo",
                                 psd_guard: str | None = None,
                                 beyond_nka: bool = False,
                                 **ng_kwargs):
    """Gaussian (+ optionally connected) covariance of the FULL
    TOMOGRAPHIC 3x2pt data vector — (n_probe nb, n_probe nb) over the
    probe order of tomographic_probes (w autos, all gamma_t pairs,
    xi_+- source pairs).  Capability extension beyond chomp
    (single-sample only).

    ``cmb_lensing`` (True or a cmblens.CMBLensingSpec) extends the
    data vector with the w_{g_i kappa_CMB}(theta) probes (appended
    after xi_-; matching make_tomographic_pipeline's
    include_cmb_lensing vector order) and every cross block against
    the 3x2pt probes.  The spec's N_L table enters as C^{kk}_total =
    C^{kk} + N_L with the white floor through the exact noise closure
    (cmblens module docstring).  cNG/SSC blocks treat kappa_CMB as a
    matter leg through its single-plane window.

    ``include_ssc`` (False / "autos" / True, same semantics as
    ``include_nongaussian``) adds the super-sample term through the
    SAME channel/leg/per-bin-model/nuisance machinery
    (_tomographic_ng_block_fn with the ssc engine; footprint = ``mask``
    if given else omega_s_sr's equal-area disc; ``ssc_kwargs``
    forward to ssc.ssc_covariance).  Unlike the cNG, SSC couples bins
    STRONGLY across probes (every probe responds to the same
    background modes), so "autos" is a much cruder approximation here
    — prefer True.

    Every block assembles from gaussian_block over the probes' E/B
    channel decompositions: tracer pairs carry C_ℓ from ONE lattice
    halo evaluation (tomographic_lattice_cl_callables), per-bin shot
    noise 1/n2d_lens_list[i], and per-source-bin shape noise (per
    component) in BOTH E and B channels — the B channels make the
    xi_+ x xi_- shot-noise cancellations exact across every bin
    combination, exactly as in joint_3x2pt_covariance.

    ``include_nongaussian``: False (default) = Gaussian only; "autos"
    = add the connected (trispectrum) term to the diagonal probe
    blocks only (the dominant cNG effect at a fraction of the cost);
    True = every block (n_probe(n_probe+1)/2 trispectrum projections
    — the distinct T̄ k-tables number only 6 tracer combos and
    deduplicate under jit via CSE).  ``ng_kwargs`` forward to
    nongaussian_covariance (n_ell_cov, n_k_tri, u_stride,
    exact_z_anchors, ...).  ``mask`` applies the footprint treatment
    to every block (Gaussian and connected).  ``nuisance`` evaluates
    EVERY block at a fiducial systematics vector — the Gaussian C_ℓs
    through tomographic_lattice_cl_callables and the cNG blocks
    through nuisance-shifted windows, IA-augmented E legs, and one
    (1+m_j) factor per E leg (_tomographic_ng_block_fn; needs concrete
    nuisance values).  ``include_magnification`` (needs
    ``nuisance``) carries the lens magnification terms into the gg/gk
    spectra with per-term halo spectra, exactly as in the
    prediction — see tomographic_lattice_cl_callables."""
    n_lens, n_src = len(lens_dists), len(src_dists)
    cmb = None
    if cmb_lensing is not None and cmb_lensing is not False:
        from chomp_tpu.cmblens import as_cmb_spec

        cmb = as_cmb_spec(cmb_lensing)
    cls = tomographic_lattice_cl_callables(cosmo, halo_p, model,
                                           lens_dists, src_dists,
                                           with_bao, grid, nuisance,
                                           include_magnification,
                                           cmb=cmb,
                                           matter_power=matter_power)
    n2d, sn = _tomographic_noise_lists(n2d_lens_list, shape_noise_list,
                                       n_lens, n_src)
    edges = theta_edges_deg
    nb = len(np.asarray(edges)) - 1

    def cl_zero(ells_np):
        return jnp.zeros(len(np.asarray(ells_np)))

    pair = _tomographic_pair_fn(cls, n2d, sn, cl_zero,
                                nl_inf=(cmb.nl_inf if cmb else 0.0))
    probes = tomographic_probes(n_lens, n_src,
                                cmb_lensing=cmb is not None)
    ng = (_tomographic_ng_block_fn(cosmo, halo_p, model, lens_dists,
                                   src_dists, edges, omega_s_sr,
                                   with_bao, grid, mask, ng_kwargs,
                                   nuisance=nuisance, cmb=cmb)
          if include_nongaussian else None)
    sscf = (_tomographic_ng_block_fn(cosmo, halo_p, model, lens_dists,
                                     src_dists, edges, omega_s_sr,
                                     with_bao, grid, mask,
                                     ssc_kwargs or {},
                                     nuisance=nuisance, engine="ssc",
                                     cmb=cmb)
            if include_ssc else None)
    n_probe = len(probes)
    blocks = [[None] * n_probe for _ in range(n_probe)]
    for pa in range(n_probe):
        _, mu_a, ch_a = probes[pa]
        for pb in range(pa, n_probe):
            _, mu_b, ch_b = probes[pb]
            acc = None
            for (a, b), s_a in ch_a:
                for (c, d), s_b in ch_b:
                    cl_ac, n_ac = pair(a, c)
                    cl_bd, n_bd = pair(b, d)
                    cl_ad, n_ad = pair(a, d)
                    cl_bc, n_bc = pair(b, c)
                    # All-zero channel blocks (e.g. any single-B
                    # pairing against a non-B tracer) skip statically.
                    if (cl_ac is cl_zero and cl_bd is cl_zero
                            and cl_ad is cl_zero and cl_bc is cl_zero
                            and n_ac * n_bd + n_ad * n_bc == 0.0):
                        continue
                    extra = {}
                    if beyond_nka:
                        extra["beyond_nka"] = True
                        kinds = {a[0], b[0], c[0], d[0]}
                        if mu_a == mu_b == 2:
                            extra["wedge_probe"] = "gt"
                        elif mu_a == mu_b == 0 and kinds == {"E"}:
                            # xi_+ x xi_+ EE channel: the <γγ><γ*γ*>
                            # pairing carries the uncompensated
                            # e^{4iφ} field phase
                            extra["field_spins"] = ((4, 4), (0, 0))
                            extra["wedge_probe"] = "xip"
                    blk = gaussian_block(
                        cl_ac, cl_bd, cl_ad, cl_bc, edges, edges,
                        omega_s_sr, mu_a, mu_b, n_ac, n_bd, n_ad,
                        n_bc, n_ell_cov=n_ell_cov_g, mask=mask,
                        **extra)
                    blk = s_a * s_b * blk
                    acc = blk if acc is None else acc + blk
            if acc is None:
                acc = jnp.zeros((nb, nb))
            if ng is not None and (include_nongaussian != "autos"
                                   or pb == pa):
                c_ng = ng(probes[pa], probes[pb])
                if c_ng is not None:
                    acc = acc + c_ng
            if sscf is not None and (include_ssc != "autos"
                                     or pb == pa):
                c_s = sscf(probes[pa], probes[pb])
                if c_s is not None:
                    acc = acc + c_s
            blocks[pa][pb] = acc
            if pb != pa:
                blocks[pb][pa] = acc.T
    return _apply_psd_guard(
        jnp.concatenate([jnp.concatenate(row, axis=1)
                         for row in blocks], axis=0), psd_guard)


def wtheta_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                      model: HaloModel, dist, cl_fn, theta_edges_deg,
                      omega_s_sr, n2d, galaxy: bool = True,
                      with_bao: bool = False,
                      grid: GridSpec = DEFAULT_GRID,
                      n_k_tri: int = 96, n_z_tri: int = 24):
    """Total covariance: Gaussian + shot noise + trispectrum (chomp
    ``Covariance`` object equivalent)."""
    cov_g = gaussian_covariance(cl_fn, theta_edges_deg, n2d, omega_s_sr)
    cov_ng = nongaussian_covariance(cosmo, halo_p, model, dist,
                                    theta_edges_deg, omega_s_sr, galaxy,
                                    with_bao, grid, n_k_tri=n_k_tri,
                                    n_z_tri=n_z_tri)
    return cov_g + cov_ng
