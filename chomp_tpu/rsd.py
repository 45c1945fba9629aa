"""Redshift-space galaxy power-spectrum multipoles + Gaussian covariance.

Capability extension beyond chomp (upstream has only projected real-
space statistics; SURVEY.md §2 rows 9-13 are all w(theta)/gamma_t):
the spectroscopic full-shape observable P_ell(k) for ell = 0, 2, 4,
built on the SAME halo-model spectra as the photometric pipelines, so
a joint photo+spectro analysis shares one halo build and one parameter
vector.

Model — the standard dispersion ("Kaiser x FoG") mapping on the halo
model's nonlinear spectra:

    P_s(k, mu) = [P_gg(k) + 2 f mu^2 P_gm(k) + f^2 mu^4 P_mm(k)]
                 * D_FoG(k mu sigma_v),
    D_FoG(x)   = 1 / (1 + x^2 / 2)          (Lorentzian damping)

with f = dlnD/dlna the linear growth rate (background.growth_rate,
analytic from the exact integral growth) and sigma_v a TRACED
finger-of-god dispersion nuisance in (Mpc/h) (sigma_v = 0 makes
D_FoG = 1 bitwise).  P_gg/P_gm/P_mm come from halo.powers, so the
neutrino sector (cb-sector galaxies, total-matter rescale on matter
legs) and the baryon-feedback knobs flow through automatically; the
scale dependence of f itself at m_nu > 0 is neglected (sub-dominant to
the suppression already carried by the spectra — documented).

Multipoles are static Gauss-Legendre contractions over mu in [0, 1]
(the integrand is even):  P_ell = (2 ell + 1) ∫_0^1 dmu L_ell(mu) P_s
— zero gathers, one (n_ell, n_mu) x (n_mu, n_k) matmul.

Covariance — Gaussian mode counting in a volume V (FKP/Grieb et al.
2016 form), diagonal in k-bins:

    Cov[P_l(k), P_l'(k)] = (2l+1)(2l'+1) / N_k
                           * ∫_0^1 dmu L_l L_l' [P_s(k, mu) + 1/n]^2,
    N_k = V k^2 dk / (4 pi^2)   (independent complex modes per shell)

which reduces to the classic (P + 1/n)^2 / N_k FKP variance at l = 0
for a mu-independent spectrum (tested), with 1/n = 1/model.n_g the
Poisson shot noise.  Not modeled (documented): window convolution of
the multipoles, Alcock-Paczynski distortion (a fixed fiducial
geometry is assumed per sample), and non-Gaussian covariance terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, halo
from chomp_tpu.grids import gauss_legendre
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec, HaloParams

__all__ = ["power_rsd_mu", "multipoles", "multipole_covariance",
           "ap_parameters", "multipoles_ap", "f_sigma8",
           "legendre_coupling", "window_convolved_multipoles",
           "windowed_multipole_covariance", "xi_multipoles",
           "xi_multipole_covariance", "wp_rp", "wp_covariance"]


def f_sigma8(cosmo: CosmoParams, z, grid: GridSpec = DEFAULT_GRID):
    """The compressed growth observable f(z) sigma_8(z) every RSD
    analysis publishes: the scale-free growth rate times the z=0
    total-matter sigma_8 carried by D(z).  Likelihood-ready alongside
    chomp_tpu.bao — traced through every CosmoParams leaf."""
    z = jnp.asarray(z)
    f = background.growth_rate(cosmo, z, grid.n_growth)
    d = background.growth_factor(cosmo, z, grid.n_growth)
    return f * cosmo.sigma_8 * d


def _legendre(ell: int, mu):
    """L_ell(mu) for the even multipoles used here (closed forms)."""
    if ell == 0:
        return jnp.ones_like(mu)
    if ell == 2:
        return 0.5 * (3.0 * mu * mu - 1.0)
    if ell == 4:
        m2 = mu * mu
        return 0.125 * (35.0 * m2 * m2 - 30.0 * m2 + 3.0)
    raise ValueError(f"only even ell in (0, 2, 4) supported, got {ell}")


def _fog(x):
    """Lorentzian finger-of-god damping 1/(1 + x^2/2); exactly 1.0 at
    sigma_v = 0 (x*0 = 0, 1/(1+0) = 1 — bitwise no-op default)."""
    return 1.0 / (1.0 + 0.5 * x * x)


def power_rsd_mu(cosmo: CosmoParams, halo_p: HaloParams, model, k, mu,
                 sigma_v=0.0, with_bao: bool = False,
                 grid: GridSpec = DEFAULT_GRID, powers=None):
    """P_s(k_i, mu_j): the dispersion-model redshift-space galaxy power
    (module docstring).  ``powers``: optionally pass a precomputed
    halo.powers dict (shared across multipoles + covariance)."""
    k = jnp.atleast_1d(jnp.asarray(k))
    mu = jnp.atleast_1d(jnp.asarray(mu))
    ps = halo.powers(cosmo, halo_p, model, k, with_bao, grid) \
        if powers is None else powers
    f = background.growth_rate(cosmo, model.mass.z, grid.n_growth)
    m2 = mu * mu                                      # (n_mu,)
    kaiser = (ps["power_gg"][:, None]
              + 2.0 * f * ps["power_gm"][:, None] * m2[None, :]
              + f * f * ps["power_mm"][:, None] * (m2 * m2)[None, :])
    x = k[:, None] * mu[None, :] * jnp.asarray(sigma_v)
    return kaiser * _fog(x)                           # (n_k, n_mu)


def _mu_rule(n_mu: int):
    x, w = gauss_legendre(n_mu)
    # Map [-1, 1] -> [0, 1].
    return jnp.asarray(0.5 * (x + 1.0)), jnp.asarray(0.5 * w)


def multipoles(cosmo: CosmoParams, halo_p: HaloParams, model, k,
               ells=(0, 2, 4), sigma_v=0.0, n_mu: int = 16,
               with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
               powers=None):
    """P_ell(k) for the requested even multipoles: (len(ells), n_k).

    The mu integrand is a degree-8 polynomial in mu times the rational
    FoG factor; n_mu = 16 GL nodes are referee-exact to ~1e-12 for
    k sigma_v ≲ 10 (tested against adaptive quadrature)."""
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, k, mu, sigma_v, with_bao,
                       grid, powers)                  # (n_k, n_mu)
    rows = jnp.stack([(2.0 * ell + 1.0) * _legendre(ell, mu) * w
                      for ell in ells])               # (n_ell, n_mu)
    return jnp.matmul(rows, p_s.T, precision=jax.lax.Precision.HIGHEST)


def ap_parameters(cosmo: CosmoParams, fid: CosmoParams, z, n: int = 64):
    """Alcock-Paczynski scaling factors (alpha_perp, alpha_par) at z:
    the observed coordinates were laid down with the FIDUCIAL cosmology,
    so transverse/radial separations rescale by

        alpha_perp = D_M(z) / D_M^fid(z),   alpha_par = D_H(z) / D_H^fid(z)

    (pure geometric convention — the template-fit convention divides
    each by r_d/r_d^fid; do that at the likelihood level if fitting
    compressed alphas).  Both exactly 1 at cosmo == fid."""
    z = jnp.asarray(z)
    a_perp = (background.transverse_comoving_distance(cosmo, z, n)
              / background.transverse_comoving_distance(fid, z, n))
    a_par = background.ez(fid, z) / background.ez(cosmo, z)
    return a_perp, a_par


def multipoles_ap(cosmo: CosmoParams, halo_p: HaloParams, model, k_obs,
                  fid: CosmoParams, ells=(0, 2, 4), sigma_v=0.0,
                  n_mu: int = 16, with_bao: bool = False,
                  grid: GridSpec = DEFAULT_GRID):
    """P_ell at OBSERVED wavenumbers ``k_obs`` (defined with the
    fiducial cosmology ``fid``) including the Alcock-Paczynski
    distortion:

        k_true mu_true = k' mu' / alpha_par,
        k_true sqrt(1-mu_true^2) = k' sqrt(1-mu'^2) / alpha_perp,
        P_obs(k', mu') = P_s(k_true, mu_true) / (alpha_perp^2 alpha_par)

    The halo-model spectra evaluate EXACTLY at any k (no spline), so
    the warped (n_k, n_mu) grid is one direct halo contraction — the
    TPU-native alternative to the usual interpolate-a-table approach.
    At cosmo == fid this reduces to :func:`multipoles` (alphas == 1;
    tested to float roundoff)."""
    k_obs = jnp.atleast_1d(jnp.asarray(k_obs))
    mu, w = _mu_rule(n_mu)
    a_perp, a_par = ap_parameters(cosmo, fid, model.mass.z, grid.n_dist)
    kpar = k_obs[:, None] * mu[None, :] / a_par          # (n_k, n_mu)
    kper = k_obs[:, None] * jnp.sqrt(1.0 - mu * mu)[None, :] / a_perp
    k_true = jnp.sqrt(kpar**2 + kper**2)
    mu_true = kpar / k_true
    ps = halo.powers(cosmo, halo_p, model, k_true.ravel(), with_bao, grid)
    f = background.growth_rate(cosmo, model.mass.z, grid.n_growth)
    m2 = (mu_true * mu_true).ravel()
    kaiser = (ps["power_gg"] + 2.0 * f * ps["power_gm"] * m2
              + f * f * ps["power_mm"] * m2 * m2)
    x = k_true.ravel() * mu_true.ravel() * jnp.asarray(sigma_v)
    p_s = (kaiser * _fog(x)).reshape(k_obs.shape[0], n_mu) / (
        a_perp * a_perp * a_par)
    rows = jnp.stack([(2.0 * ell + 1.0) * _legendre(ell, mu) * w
                      for ell in ells])
    return jnp.matmul(rows, p_s.T, precision=jax.lax.Precision.HIGHEST)


def multipole_covariance(cosmo: CosmoParams, halo_p: HaloParams, model,
                         k_edges, volume, ells=(0, 2, 4), sigma_v=0.0,
                         n_mu: int = 16, with_bao: bool = False,
                         grid: GridSpec = DEFAULT_GRID, n_bar=None):
    r"""Gaussian multipole covariance for k bins ``k_edges`` (h/Mpc) in a
    survey volume ``volume`` ((Mpc/h)^3): (n_ell n_k, n_ell n_k),
    ordered ell-major [P_ell0(k0..), P_ell2(k0..), ...], diagonal in k.

    The spectrum is evaluated at the bin centers (narrow-bin
    approximation — the standard choice; bin-averaging the mode count
    k^2 dk is exact).  ``n_bar``: galaxy density for the shot noise,
    default model.n_g."""
    k_edges = jnp.asarray(k_edges)
    k_mid = 0.5 * (k_edges[1:] + k_edges[:-1])
    # Independent complex modes per shell: V * (k^3_hi - k^3_lo)/3 / (4 pi^2)
    # (the exact integral of V k^2 dk / (4 pi^2) over the bin).
    n_k = volume * (k_edges[1:] ** 3 - k_edges[:-1] ** 3) / (
        3.0 * 4.0 * jnp.pi ** 2)
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, k_mid, mu, sigma_v,
                       with_bao, grid)                # (n_bin, n_mu)
    nb = model.n_g if n_bar is None else jnp.asarray(n_bar)
    tot2 = (p_s + 1.0 / nb) ** 2                      # (n_bin, n_mu)
    legs = jnp.stack([_legendre(ell, mu) for ell in ells])  # (n_ell, n_mu)
    # I[a, b, i] = (2 la + 1)(2 lb + 1)/N_i ∫ dmu L_a L_b tot2(k_i, mu)
    pref = jnp.asarray([(2.0 * ell + 1.0) for ell in ells])
    integ = jnp.einsum("am,bm,im,m->abi", legs, legs, tot2, w,
                       precision=jax.lax.Precision.HIGHEST)
    blocks = pref[:, None, None] * pref[None, :, None] * integ / n_k[None, None, :]
    n_ell, n_bin = len(ells), k_mid.shape[0]
    cov = jnp.zeros((n_ell, n_bin, n_ell, n_bin))
    idx = jnp.arange(n_bin)
    cov = cov.at[:, idx, :, idx].set(jnp.moveaxis(blocks, 2, 0))
    return cov.reshape(n_ell * n_bin, n_ell * n_bin)


# ---------------------------------------------------------------------------
# Survey-window convolution (Wilson et al. 2017 configuration-space route)
# ---------------------------------------------------------------------------

def legendre_coupling(ells_out, ells_p, ells_q):
    """C[L, l1, l2] = (2L+1)/2 ∫_{-1}^{1} L_L L_l1 L_l2 dmu — the exact
    Legendre triple-product couplings of the configuration-space window
    convolution xi'_L = Σ C[L, l1, l2] xi_l1 Q_l2 (Wilson et al. 2017
    eq. 2.18's coefficient table, computed here by exact Gauss-Legendre
    quadrature of the polynomial integrand instead of hardcoding the
    rationals — the order-32 rule is exact to degree 63 >= L+l1+l2).
    Returns a float64 numpy array (build-time constant)."""
    from numpy.polynomial.legendre import leggauss

    x, w = leggauss(32)
    leg = {}
    for ell in set(ells_out) | set(ells_p) | set(ells_q):
        c = np.zeros(ell + 1)
        c[ell] = 1.0
        leg[ell] = np.polynomial.legendre.legval(x, c)
    out = np.empty((len(ells_out), len(ells_p), len(ells_q)))
    for i, L in enumerate(ells_out):
        for j, l1 in enumerate(ells_p):
            for m, l2 in enumerate(ells_q):
                out[i, j, m] = (2.0 * L + 1.0) / 2.0 * np.sum(
                    w * leg[L] * leg[l1] * leg[l2])
    return out


def _sph_hankel_ops(n: int, ln_k0: float, dln: float, ells,
                    taper: float = 0.08):
    """Forward/backward spherical-Bessel FFTLog operators per multipole.

    Forward:  xi_l(s) = (-1)^{l/2}/(2 pi^2) ∫ dk k^2 P_l(k) j_l(ks)
            = (-1)^{l/2} sqrt(pi/2)/(2 pi^2) s^{-1/2}
              ∫ dk/k [k^{5/2} P_l] J_{l+1/2}(ks)
    Backward: P_l(k) = 4 pi (-1)^{l/2} ∫ ds s^2 xi_l(s) j_l(ks)
            = (-1)^{l/2} (2 pi)^{3/2} k^{-1/2}
              ∫ ds/s [s^{5/2} xi_l] J_{l+1/2}(ks)

    Both ride fftlog.hankel_operator (mu = l + 1/2); every l shares the
    SAME low-ringing s grid (y0 pinned by the l=0 operator) so the
    coupling products multiply pointwise.  Returns
    (k, s, fwd[l] (n, n), k_back, bwd[l] (n, n)) float64 numpy."""
    from chomp_tpu import fftlog

    k = np.exp(ln_k0 + dln * np.arange(n))
    s_grid = None
    fwd = {}
    for ell in ells:
        # First multipole takes the Hamilton low-ring snap; the rest pin
        # EXACTLY to its grid (lowring=False) so the coupling products
        # multiply pointwise — the residual sawtooth is below the taper
        # floor (fftlog.hankel_operator docstring).
        y, h = fftlog.hankel_operator(
            n, ln_k0, dln, mu=ell + 0.5, q=1.0,
            y0_target=None if s_grid is None else s_grid[0],
            taper_lo=taper, taper_hi=taper, lowring=s_grid is None)
        if s_grid is None:
            s_grid = y
        sign = (-1.0) ** (ell // 2)
        # H gives G(y) = ∫ a(k) J_mu(ky) dk/k for a on the k lattice.
        # xi_l(s) = sign sqrt(pi/2)/(2 pi^2) s^{-1/2} G[k^{5/2} P_l](s)
        pre = sign * np.sqrt(np.pi / 2.0) / (2.0 * np.pi**2)
        fwd[ell] = (pre / np.sqrt(s_grid))[:, None] * h * (k**2.5)[None, :]
    # Backward operators: input lattice = s grid.
    ln_s0 = float(np.log(s_grid[0]))
    dln_s = float(np.log(s_grid[1]) - np.log(s_grid[0]))
    k_back = None
    bwd = {}
    for ell in ells:
        yb, hb = fftlog.hankel_operator(
            n, ln_s0, dln_s, mu=ell + 0.5, q=1.0,
            y0_target=k[0] if k_back is None else k_back[0],
            taper_lo=taper, taper_hi=taper, lowring=k_back is None)
        if k_back is None:
            k_back = yb
        sign = (-1.0) ** (ell // 2)
        pre = sign * (2.0 * np.pi) ** 1.5
        bwd[ell] = (pre / np.sqrt(k_back))[:, None] * hb * (s_grid**2.5)[None, :]
    return k, s_grid, fwd, k_back, bwd


def _catmull_rom_rows(x_src, x_query):
    """Static (n_query, n_src) cubic interpolation matrix in ln x
    (build-time numpy; the same static-weight trick as limber_fft —
    NO runtime gathers)."""
    lx = np.log(x_src)
    lq = np.log(np.asarray(x_query, dtype=np.float64))
    d = lx[1] - lx[0]
    t = (lq - lx[0]) / d
    i1 = np.clip(np.floor(t).astype(int), 1, len(lx) - 3)
    u = t - i1
    w0 = -0.5 * u * (1 - u) ** 2
    w1 = 1.0 + u * u * (1.5 * u - 2.5)
    w2 = u * (0.5 + u * (2.0 - 1.5 * u))
    w3 = 0.5 * u * u * (u - 1.0)
    rows = np.zeros((lq.size, lx.size))
    for j, (i, a, b, c, e) in enumerate(zip(i1, w0, w1, w2, w3)):
        rows[j, i - 1:i + 3] = (a, b, c, e)
    return rows


def window_convolved_multipoles(cosmo: CosmoParams, halo_p: HaloParams,
                                model, k_obs, window_q, ells=(0, 2, 4),
                                sigma_v=0.0, n_mu: int = 16,
                                n_fft: int = 512, k_lo: float = 2e-4,
                                k_hi: float = 60.0,
                                with_bao: bool = False,
                                grid: GridSpec = DEFAULT_GRID):
    """Survey-window-convolved multipoles at observed ``k_obs``.

    The Wilson et al. 2017 configuration-space route, gather-free:

      1. P_ell on a static log-k lattice (direct halo evaluation);
      2. xi_ell(s) by spherical-Bessel FFTLog (one (n, n) matmul per
         ell, shared low-ringing s grid);
      3. xi'_L(s) = Σ C[L, l1, l2] xi_l1(s) Q_l2(s) with the exact
         Legendre couplings and the window's configuration-space
         multipoles Q_l2;
      4. P'_L(k) by the inverse transform + a static cubic
         interpolation matrix onto ``k_obs``.

    ``window_q``: callable s_Mpc_over_h -> (n_q_ell, n_s) array of the
    normalized window multipoles [Q_0, Q_2, Q_4, ...] (Q_0(0) = 1), OR
    a plain (n_q_ell, n_s)-shaped constructor evaluated at BUILD time
    on the static s grid (numpy in, numpy out — the window is survey
    geometry, not a traced parameter).  An unwindowed survey is
    window_q = lambda s: np.stack([np.ones_like(s)]) — then the result
    reduces to :func:`multipoles` at interior k to FFTLog round-trip
    accuracy (~1e-3 with default tapers; tested).

    Truncation: the coupling sum runs over the given ``ells`` for the
    theory side and over the rows ``window_q`` provides; higher-order
    leakage (e.g. Q_6 into P'_4) is dropped — the standard truncation.
    """
    k_obs = np.asarray(k_obs, dtype=np.float64)
    ells = tuple(ells)
    ln_k0 = float(np.log(k_lo))
    dln = float(np.log(k_hi / k_lo) / (n_fft - 1))
    k_lat, s_grid, fwd, k_back, bwd = _sph_hankel_ops(
        n_fft, ln_k0, dln, ells)
    q_arr = np.asarray(window_q(s_grid), dtype=np.float64)
    if q_arr.ndim == 1:
        q_arr = q_arr[None, :]
    q_ells = tuple(2 * i for i in range(q_arr.shape[0]))
    coup = legendre_coupling(ells, ells, q_ells)      # (L, l1, l2)
    interp = _catmull_rom_rows(k_back, k_obs)         # (n_obs, n_fft)
    hp = jax.lax.Precision.HIGHEST

    p_ell = multipoles(cosmo, halo_p, model, jnp.asarray(k_lat),
                       ells=ells, sigma_v=sigma_v, n_mu=n_mu,
                       with_bao=with_bao, grid=grid)  # (n_ell, n_fft)
    xi = jnp.stack([jnp.matmul(jnp.asarray(fwd[ell]), p_ell[i],
                               precision=hp)
                    for i, ell in enumerate(ells)])   # (n_ell, n_s)
    # Couple with the window: xi'_L(s) = Σ_{l1 l2} C xi_l1 Q_l2.
    xiq = jnp.einsum("Lab,as,bs->Ls", jnp.asarray(coup), xi,
                     jnp.asarray(q_arr), precision=hp)
    p_conv = jnp.stack([jnp.matmul(jnp.asarray(bwd[ell]), xiq[i],
                                   precision=hp)
                        for i, ell in enumerate(ells)])
    return jnp.matmul(p_conv, jnp.asarray(interp).T, precision=hp)


def _window_coupling_operator(n_fft, ln_k0, dln, ells, window_q):
    """Static float64 window-convolution operator on the log-k lattice:
    M[L, l1] (n_fft, n_fft) with P'_L(k_back) = Σ_l1 M[L,l1] P_l1(k_lat)
    — the Wilson route of :func:`window_convolved_multipoles` folded
    into ONE matrix per multipole pair at build time:
    M[L,l1] = bwd[L] · diag(G[L,l1](s)) · fwd[l1],
    G[L,l1](s) = Σ_l2 C[L,l1,l2] Q_l2(s).  Returns (k_lat, k_back, M)
    with M shaped (n_L, n_l1, n_fft, n_fft)."""
    ells = tuple(ells)
    k_lat, s_grid, fwd, k_back, bwd = _sph_hankel_ops(
        n_fft, ln_k0, dln, ells)
    q_arr = np.asarray(window_q(s_grid), dtype=np.float64)
    if q_arr.ndim == 1:
        q_arr = q_arr[None, :]
    q_ells = tuple(2 * i for i in range(q_arr.shape[0]))
    coup = legendre_coupling(ells, ells, q_ells)      # (L, l1, l2)
    g = np.einsum("abq,qs->abs", coup, q_arr)         # (L, l1, n_s)
    m = np.empty((len(ells), len(ells), n_fft, n_fft))
    for i, big_l in enumerate(ells):
        for j, l1 in enumerate(ells):
            m[i, j] = bwd[big_l] @ (g[i, j][:, None] * fwd[l1])
    return k_lat, k_back, m


def windowed_multipole_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                                  model, k_edges, window_q, volume,
                                  ells=(0, 2, 4), sigma_v=0.0,
                                  n_mu: int = 16, n_fft: int = 768,
                                  k_lo: float = 2e-4, k_hi: float = 60.0,
                                  with_bao: bool = False,
                                  grid: GridSpec = DEFAULT_GRID,
                                  n_bar=None):
    """Gaussian covariance of the SURVEY-WINDOW-CONVOLVED multipoles in
    k bins ``k_edges`` — the consistent partner of
    :func:`window_convolved_multipoles` (an analysis that convolves the
    prediction but keeps the unwindowed FKP covariance double-counts
    the window: the convolution correlates neighbouring k bins and
    redistributes the per-bin mode counts).

    Model: the windowed estimator is the Wilson et al. convolution of
    the ideal per-mode estimator, so its covariance is the pushforward
    C' = R C_lat R^T of the fine-lattice Gaussian covariance
    (ell-coupled FKP integrand ``blocks(k_i)`` / N_i per log-lattice
    cell, exactly :func:`multipole_covariance`'s per-bin algebra at
    cell granularity) through the static operator
    R = [mode-count-weighted bin average onto ``k_edges``] ∘ M, with
    M[L,l1] the build-time window-coupling matrix
    (:func:`_window_coupling_operator`).  All static-weight matmuls —
    zero gathers; jit/vmap/grad-able in (cosmo, sigma_v).

    Accuracy: with the identity window (Q = [1]) this reduces to
    :func:`multipole_covariance` up to (a) the FFTLog round-trip taper
    (~1e-3 relative on M) and (b) lattice-cell discretization of the
    bin average, O(1/4 / cells-per-bin) on the diagonal — keep
    ``n_fft`` high enough that each k bin spans ≳10 cells (tested at
    ~2% with the defaults).  A real window additionally requires the
    lattice to resolve the window width Δk ~ 2π/L_survey.  The window
    enters the SIGNAL part of the variance through the convolved
    spectrum; the shot-noise plateau keeps the unwindowed 1/n̄ (the
    window's effect on the noise is a normalization absorbed in the
    estimator convention — the same truncation as the prediction
    route).  Returns (n_ell n_bins, n_ell n_bins), ell-major, matching
    :func:`multipole_covariance` ordering."""
    k_edges = np.asarray(k_edges, dtype=np.float64)
    ells = tuple(ells)
    ln_k0 = float(np.log(k_lo))
    dln = float(np.log(k_hi / k_lo) / (n_fft - 1))
    k_lat, k_back, m_op = _window_coupling_operator(
        n_fft, ln_k0, dln, ells, window_q)
    # Mode counts per lattice cell (geometric cell edges) and per
    # observed bin cell-overlap weights, both on the BACK grid for the
    # binning and the LAT grid for the source variance.
    def cell_edges(k):
        mid = np.sqrt(k[1:] * k[:-1])
        return np.concatenate([[k[0] ** 2 / mid[0]], mid,
                               [k[-1] ** 2 / mid[-1]]])

    e_lat = cell_edges(k_lat)
    n_lat = volume * (e_lat[1:] ** 3 - e_lat[:-1] ** 3) / (12.0 * np.pi ** 2)
    e_back = cell_edges(k_back)
    # Overlap |cell ∩ bin| in mode measure -> bin-average weights.
    lo = np.maximum(e_back[:-1][None, :], k_edges[:-1][:, None])
    hi = np.minimum(e_back[1:][None, :], k_edges[1:][:, None])
    ov = np.clip(hi ** 3 - lo ** 3, 0.0, None)        # (n_bins, n_fft)
    row_mass = ov.sum(axis=1)
    if np.any(row_mass <= 0.0):
        bad = np.nonzero(row_mass <= 0.0)[0]
        raise ValueError(
            f"k_edges bins {bad.tolist()} have no overlap with the "
            f"FFTLog back grid [{e_back[0]:.4g}, {e_back[-1]:.4g}] "
            f"h/Mpc — a zero-mass bin row would be NaN and poison the "
            f"whole covariance; shrink k_edges or widen (k_lo, k_hi, "
            f"n_fft)")
    b_rows = ov / row_mass[:, None]
    # R[L, X, l1, i] = Σ_j B[X, j] M[L, l1, j, i]
    r_op = np.einsum("Xj,ABji->AXBi", b_rows, m_op)
    hp = jax.lax.Precision.HIGHEST

    # Per-cell FKP integrand blocks[a, b, i] (multipole_covariance's
    # algebra on the lattice).
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, jnp.asarray(k_lat), mu,
                       sigma_v, with_bao, grid)       # (n_fft, n_mu)
    nb = model.n_g if n_bar is None else jnp.asarray(n_bar)
    tot2 = (p_s + 1.0 / nb) ** 2
    legs = jnp.stack([_legendre(ell, mu) for ell in ells])
    pref = jnp.asarray([(2.0 * ell + 1.0) for ell in ells])
    integ = jnp.einsum("am,bm,im,m->abi", legs, legs, tot2, w,
                       precision=hp)
    blocks = (pref[:, None, None] * pref[None, :, None] * integ
              / jnp.asarray(n_lat)[None, None, :])    # (a, b, i)
    cov = jnp.einsum("AXai,abi,BYbi->AXBY", jnp.asarray(r_op), blocks,
                     jnp.asarray(r_op), precision=hp)
    n_l, n_b = len(ells), k_edges.size - 1
    return cov.reshape(n_l * n_b, n_l * n_b)


# ---------------------------------------------------------------------------
# Configuration-space multipoles xi_ell(s) + Gaussian covariance
# ---------------------------------------------------------------------------
#
# The standard BOSS/DESI configuration-space full-shape observable:
# xi_ell(s) = i^ell/(2 pi^2) \int k^2 dk P_ell(k) j_ell(k s) and the
# Grieb et al. (2016)-style Gaussian covariance of its s-bin averages.
# Capability extension beyond chomp (upstream:covariance.py has only
# projected w(theta) statistics) sharing the halo build and the FFTLog
# machinery above.


def _xi_antiderivative(ell: int, x):
    r"""X_ell(x) = \int_0^x t^2 j_ell(t) dt in CLOSED FORM for the even
    multipoles — exact bin-averaged spherical-Bessel factors at any
    argument (no oscillatory quadrature anywhere):

        X_0 = x^2 j_1,
        X_2 = -x^2 j_1 - 3 x j_0 + 3 Si(x),
        X_4 =  x^2 j_1 + 10 x j_0 - (105/2) j_1 + (15/2) Si(x),

    derived from d/dx [x^2 j_1] = x^2 j_0, the recurrences
    j_{l+1} = ((2l+1)/x) j_l - j_{l-1}, and \int x j_1 dx = Si - x j_0
    (each verified against cumulative quadrature in
    tests/test_rsd.py::test_xi_antiderivative_closed_forms).  Build-time
    float64 numpy; x = 0 is safe (all terms -> 0)."""
    from scipy.special import sici, spherical_jn

    x = np.asarray(x, dtype=np.float64)
    j0 = spherical_jn(0, x)
    j1 = spherical_jn(1, x)
    si = sici(x)[0]
    if ell == 0:
        return x * x * j1
    if ell == 2:
        return -x * x * j1 - 3.0 * x * j0 + 3.0 * si
    if ell == 4:
        return x * x * j1 + 10.0 * x * j0 - 52.5 * j1 + 7.5 * si
    raise ValueError(f"only even ell in (0, 2, 4) supported, got {ell}")


def _binned_sph_bessel(ell: int, k, s_edges):
    r"""\bar j_ell[X, i] = \int_bin s^2 j_ell(k_i s) ds / \int_bin s^2 ds
    over the ``s_edges`` bins, exactly via the closed-form
    antiderivative.  (n_bins, n_k) float64 numpy."""
    k = np.asarray(k, dtype=np.float64)
    s_edges = np.asarray(s_edges, dtype=np.float64)
    w_bin = (s_edges[1:] ** 3 - s_edges[:-1] ** 3) / 3.0  # (n_bins,)
    x = k[None, :] * s_edges[:, None]                     # (n_e, n_k)
    big_x = _xi_antiderivative(ell, x)
    return (big_x[1:] - big_x[:-1]) / (k[None, :] ** 3
                                       * w_bin[:, None])


def xi_multipoles(cosmo: CosmoParams, halo_p: HaloParams, model, s_obs,
                  ells=(0, 2, 4), sigma_v=0.0, n_mu: int = 16,
                  n_fft: int = 512, k_lo: float = 2e-4,
                  k_hi: float = 60.0, with_bao: bool = False,
                  grid: GridSpec = DEFAULT_GRID, window_q=None,
                  fid: CosmoParams | None = None):
    """Configuration-space multipoles xi_ell(s) at separations
    ``s_obs`` (Mpc/h): (n_ell, n_s).

    The dispersion-model P_ell on the static log-k lattice (direct
    halo evaluation — the same spectra as :func:`multipoles`) is
    transformed by the spherical-Bessel FFTLog operators of
    :func:`_sph_hankel_ops` (one (n, n) static matmul per multipole)
    and landed on ``s_obs`` by a static Catmull-Rom matrix — zero
    runtime gathers; jit/vmap/grad-able in (cosmo, sigma_v).

    ``window_q``: optional survey-window multipoles (same protocol as
    :func:`window_convolved_multipoles`) — in configuration space the
    window acts POINTWISE, xi'_L(s) = Sum C[L,l1,l2] xi_l1(s) Q_l2(s)
    (Wilson et al. 2017 eq. 2.18), so the windowed prediction costs
    one extra static einsum.  ``fid``: when given, includes the
    Alcock-Paczynski distortion by sourcing P_ell from
    :func:`multipoles_ap` at the fiducial geometry (the observed-
    coordinate xi is the transform of the observed-coordinate P).

    Accuracy: FFTLog round-trip ~1e-3 of xi_0(s) at BAO scales with
    the default tapers/range (refereed against a dense direct
    quadrature in tests/test_rsd.py); use s well inside
    [1/k_hi, 1/k_lo]."""
    s_obs = np.asarray(s_obs, dtype=np.float64)
    ells = tuple(ells)
    ln_k0 = float(np.log(k_lo))
    dln = float(np.log(k_hi / k_lo) / (n_fft - 1))
    k_lat, s_grid, fwd, _kb, _bwd = _sph_hankel_ops(n_fft, ln_k0, dln,
                                                    ells)
    interp = _catmull_rom_rows(s_grid, s_obs)         # (n_s, n_fft)
    hp = jax.lax.Precision.HIGHEST
    if fid is None:
        p_ell = multipoles(cosmo, halo_p, model, jnp.asarray(k_lat),
                           ells=ells, sigma_v=sigma_v, n_mu=n_mu,
                           with_bao=with_bao, grid=grid)
    else:
        p_ell = multipoles_ap(cosmo, halo_p, model, jnp.asarray(k_lat),
                              fid, ells=ells, sigma_v=sigma_v,
                              n_mu=n_mu, with_bao=with_bao, grid=grid)
    xi = jnp.stack([jnp.matmul(jnp.asarray(fwd[ell]), p_ell[i],
                               precision=hp)
                    for i, ell in enumerate(ells)])   # (n_ell, n_s_grid)
    if window_q is not None:
        q_arr = np.asarray(window_q(s_grid), dtype=np.float64)
        if q_arr.ndim == 1:
            q_arr = q_arr[None, :]
        q_ells = tuple(2 * i for i in range(q_arr.shape[0]))
        coup = legendre_coupling(ells, ells, q_ells)
        xi = jnp.einsum("Lab,as,bs->Ls", jnp.asarray(coup), xi,
                        jnp.asarray(q_arr), precision=hp)
    return jnp.matmul(xi, jnp.asarray(interp).T, precision=hp)


def _xi_cov_geometry(ells, s_edges, n_k: int, k_lo: float, k_cut: float,
                     phase_per_node: float = 2.0, n_sub_min: int = 6,
                     n_sub_max: int = 96):
    r"""Build-time geometry for :func:`xi_multipole_covariance`: the
    smooth-sigma^2 lattice k_lat (n_k log nodes on [k_lo, k_cut]), a
    phase-adaptive dense Gauss-Legendre k rule (nodes kd, weights wd
    with the k^2 dk measure folded in), the static Catmull-Rom matrix
    R (n_dense, n_k) mapping lattice values onto the dense nodes, and
    the EXACT bin-averaged Bessel factors bj[a, X, n] on the dense
    nodes.  The per-cell GL order tracks the fastest oscillation
    phase 2 k s_max per cell, so the j_l j_l' product is integrated
    to quadrature accuracy everywhere (float64 numpy)."""
    from numpy.polynomial.legendre import leggauss

    s_edges = np.asarray(s_edges, dtype=np.float64)
    lnk = np.linspace(np.log(k_lo), np.log(k_cut), n_k)
    k_lat = np.exp(lnk)
    s_sum_max = 2.0 * s_edges[-1]
    # The per-cell GL order must resolve the fastest j_l j_l'
    # oscillation phase 2 k s_max; if the n_sub_max clamp binds, the
    # top cells are silently under-integrated (the cluster-SSC
    # aliasing class, NUMERICS.md) — refuse quietly degrading.
    worst = s_sum_max * (k_lat[-1] - k_lat[-2])
    worst_p = int(np.ceil(worst / phase_per_node)) + 4
    if worst_p > n_sub_max:
        import warnings
        warnings.warn(
            f"_xi_cov_geometry: the per-cell GL order clamp binds "
            f"(need {worst_p} nodes for phase {worst:.0f} rad, clamp "
            f"n_sub_max={n_sub_max}); the j_l j_l' product in the top "
            f"k cells is under-integrated.  Raise n_k (finer cells) "
            f"or n_sub_max.", stacklevel=3)
    nodes, weights = [], []
    for i in range(n_k - 1):
        a, b = k_lat[i], k_lat[i + 1]
        phase = s_sum_max * (b - a)
        p = int(np.clip(np.ceil(phase / phase_per_node) + 4,
                        n_sub_min, n_sub_max))
        x, w = leggauss(p)
        kk = 0.5 * (b - a) * x + 0.5 * (b + a)
        nodes.append(kk)
        weights.append(0.5 * (b - a) * w * kk * kk)   # k^2 dk measure
    kd = np.concatenate(nodes)
    wd = np.concatenate(weights)
    r_rows = _catmull_rom_rows(k_lat, kd)             # (n_dense, n_k)
    bj = np.stack([_binned_sph_bessel(ell, kd, s_edges)
                   for ell in ells])                  # (n_ell, nb, n_dense)
    return k_lat, kd, wd, r_rows, bj


def xi_multipole_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                            model, s_edges, volume, ells=(0, 2, 4),
                            sigma_v=0.0, n_mu: int = 16,
                            n_k: int = 192, k_lo: float = 1e-3,
                            k_cut: float = 4.0, with_bao: bool = False,
                            grid: GridSpec = DEFAULT_GRID, n_bar=None):
    r"""Gaussian covariance of the s-bin-averaged configuration-space
    multipoles (Grieb et al. 2016 configuration-space recipe):

        Cov[xibar_l(X), xibar_l'(Y)]
          = i^{l+l'} (2l+1)(2l'+1) / (pi^2 V)
            * \int k^2 dk  \bar j_l^X(k) \bar j_l'^Y(k)
              \int_0^1 dmu L_l L_l' [ P_s^2 + 2 P_s / n ]
          + delta_ll' delta_XY (2l+1) / (2 pi V n^2 W_X)

    where \bar j^X is the EXACT s-bin average of j_l (closed-form
    antiderivatives, :func:`_xi_antiderivative`) and the second line
    is the pure shot-noise plateau done ANALYTICALLY via Bessel
    completeness \int k^2 j_l(ks) j_l(ks') dk = pi/(2 s^2) d(s - s')
    — the same exact-noise-closure hybrid as the curved-sky Gaussian
    blocks: the k integral of the remaining SMOOTHLY-DECAYING part
    (P^2 + 2P/n) truncates at ``k_cut`` with an error set by P(k_cut)
    / (1/n), not by the non-convergent white tail.

    TPU-first dataflow: sigma^2's smooth k dependence is evaluated by
    ONE halo contraction on the ``n_k`` log lattice, pushed onto a
    phase-adaptive dense GL rule by a static Catmull-Rom matrix, and
    contracted against precomputed exact Bessel-bin factors — static
    matmuls only, zero gathers, jit/vmap/grad-able in
    (cosmo, sigma_v).  Reduction check: the pure-shot diagonal equals
    the Poisson pair-count variance 1/(2 pi V n^2 W_X) exactly.

    Returns (n_ell n_bins, n_ell n_bins), ell-major, matching
    :func:`multipole_covariance` ordering."""
    s_edges = np.asarray(s_edges, dtype=np.float64)
    ells = tuple(ells)
    k_lat, _kd, wd, r_rows, bj = _xi_cov_geometry(ells, s_edges, n_k,
                                                  k_lo, k_cut)
    hp = jax.lax.Precision.HIGHEST
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, jnp.asarray(k_lat), mu,
                       sigma_v, with_bao, grid)       # (n_k, n_mu)
    nb = model.n_g if n_bar is None else jnp.asarray(n_bar)
    smooth = p_s * p_s + 2.0 * p_s / nb               # sigma^2 - white
    legs = jnp.stack([_legendre(ell, mu) for ell in ells])
    integ = jnp.einsum("am,bm,qm,m->abq", legs, legs, smooth, w,
                       precision=hp)                  # (a, b, n_k)
    dense = jnp.einsum("abq,nq->abn", integ, jnp.asarray(r_rows),
                       precision=hp)                  # (a, b, n_dense)
    sign = np.array([(-1.0) ** (ell // 2) for ell in ells])
    pref = np.array([2.0 * ell + 1.0 for ell in ells])
    fac = (sign * pref)[:, None] * (sign * pref)[None, :] / (
        np.pi ** 2 * float(volume))
    cov = jnp.einsum("axn,n,abn,byn->axby", jnp.asarray(bj),
                     jnp.asarray(wd), dense, jnp.asarray(bj),
                     precision=hp) * jnp.asarray(fac)[:, None, :, None]
    # Exact white (pure-shot) closure on the diagonal.
    w_bin = (s_edges[1:] ** 3 - s_edges[:-1] ** 3) / 3.0
    white = (pref[:, None] / (2.0 * np.pi * float(volume) * w_bin)
             / nb ** 2)                               # (n_ell, n_bins)
    n_l, n_b = len(ells), s_edges.size - 1
    eye_l = jnp.asarray(np.eye(n_l))
    eye_b = jnp.asarray(np.eye(n_b))
    cov = cov + (white[:, :, None, None] * eye_l[:, None, :, None]
                 * eye_b[None, :, None, :])
    return cov.reshape(n_l * n_b, n_l * n_b)


def _windowed_xi_geometry(ells, s_edges, k_back, k_lo_xi, k_cut,
                          phase_per_node: float = 2.0,
                          n_sub_min: int = 6, n_sub_max: int = 96):
    """Build-time geometry for :func:`windowed_xi_multipole_covariance`:
    a phase-adaptive dense GL k rule over the BACK-grid cells inside
    [k_lo_xi, k_cut] (per-cell order tracks the 2 k s_max oscillation,
    as :func:`_xi_cov_geometry`), the Catmull-Rom matrix from the full
    log-uniform back grid onto the dense nodes, and the exact
    bin-averaged Bessel factors there."""
    from numpy.polynomial.legendre import leggauss

    s_edges = np.asarray(s_edges, dtype=np.float64)
    i0 = int(np.searchsorted(k_back, k_lo_xi))
    i1 = min(int(np.searchsorted(k_back, k_cut)) + 1, len(k_back))
    cells = k_back[i0:i1]
    if cells.size < 8:
        raise ValueError(
            f"windowed xi covariance: only {cells.size} back-grid "
            f"cells inside [{k_lo_xi}, {k_cut}] — raise n_fft or "
            f"widen (k_lo, k_hi)")
    s_sum_max = 2.0 * s_edges[-1]
    worst = s_sum_max * (cells[-1] - cells[-2])
    if int(np.ceil(worst / phase_per_node)) + 4 > n_sub_max:
        import warnings
        warnings.warn(
            f"_windowed_xi_geometry: the per-cell GL order clamp "
            f"binds (phase {worst:.0f} rad vs n_sub_max={n_sub_max}) "
            f"— raise n_fft or n_sub_max.", stacklevel=3)
    nodes, weights = [], []
    for a, b in zip(cells[:-1], cells[1:]):
        phase = s_sum_max * (b - a)
        p = int(np.clip(np.ceil(phase / phase_per_node) + 4,
                        n_sub_min, n_sub_max))
        x, w = leggauss(p)
        kk = 0.5 * (b - a) * x + 0.5 * (b + a)
        nodes.append(kk)
        weights.append(0.5 * (b - a) * w * kk * kk)   # k^2 dk measure
    kd = np.concatenate(nodes)
    wd = np.concatenate(weights)
    cr = _catmull_rom_rows(k_back, kd)                # (n_dense, n_back)
    bj = np.stack([_binned_sph_bessel(ell, kd, s_edges)
                   for ell in ells])                  # (n_ell, nb, n_d)
    return kd, wd, cr, bj


def windowed_xi_multipole_covariance(cosmo: CosmoParams,
                                     halo_p: HaloParams, model,
                                     s_edges, window_q, volume,
                                     ells=(0, 2, 4), sigma_v=0.0,
                                     n_mu: int = 16, n_fft: int = 768,
                                     k_lo: float = 2e-4,
                                     k_hi: float = 60.0,
                                     k_lo_xi: float = 1e-3,
                                     k_cut: float = 4.0,
                                     with_bao: bool = False,
                                     grid: GridSpec = DEFAULT_GRID,
                                     n_bar=None):
    r"""Gaussian covariance of the s-bin-averaged configuration-space
    multipoles with the SURVEY WINDOW composed through the transform
    (VERDICT round-4 item 6) — the consistent partner of
    ``xi_multipoles(window_q=...)``: the window convolution correlates
    neighbouring k modes and couples multipoles, so a windowed
    prediction with the unwindowed :func:`xi_multipole_covariance`
    double-counts the window.

    Construction: the covariance is the pushforward H C_lat H^T of the
    per-lattice-cell FKP blocks (exactly
    :func:`windowed_multipole_covariance`'s algebra) through

        H[L, X; l1, i] = (-1)^{L/2} / (2\pi^2)
            \int k^2 dk  \bar j_L^X(k)  M[L, l1](k, k_lat_i),

    i.e. the window-coupling operator M (the same Wilson-convolution
    matrix as the prediction route) composed with the EXACT s-bin
    Hankel on a phase-adaptive dense GL rule riding the FFTLog back
    grid (:func:`_windowed_xi_geometry` — closed-form bin-averaged
    Bessel antiderivatives, Catmull-Rom back-grid interpolation; zero
    gathers, jit/vmap/grad-able in (cosmo, sigma_v)).

    The SMOOTH part of the variance (P^2 + 2 P/n̄) rides the window;
    the pure-shot plateau keeps the exact unwindowed Bessel-
    completeness closure of :func:`xi_multipole_covariance` (white
    noise is unconvolved in the Wilson estimator convention — the same
    normalization absorption as the prediction route).  Identity
    window (Q = [1]): reduces to :func:`xi_multipole_covariance` up to
    the FFTLog round-trip taper (~1e-3 on M) and quadrature
    (tested ~2%).  Returns (n_ell n_bins, n_ell n_bins), ell-major."""
    s_edges = np.asarray(s_edges, dtype=np.float64)
    ells = tuple(ells)
    ln_k0 = float(np.log(k_lo))
    dln = float(np.log(k_hi / k_lo) / (n_fft - 1))
    k_lat, k_back, m_op = _window_coupling_operator(n_fft, ln_k0, dln,
                                                    ells, window_q)
    kd, wd, cr, bj = _windowed_xi_geometry(ells, s_edges, k_back,
                                           k_lo_xi, k_cut)
    sign = np.array([(-1.0) ** (ell // 2) for ell in ells])
    # H[A, X, a, i]: dense-rule Hankel of the A-row of M.
    t_axj = np.einsum("AXd,dj->AXj", bj * wd[None, None, :], cr)
    h = np.einsum("AXj,Aaji->AXai", t_axj, m_op) \
        * (sign / (2.0 * np.pi ** 2))[:, None, None, None]

    # Per-cell FKP mode counts on the source lattice.
    def cell_edges(k):
        mid = np.sqrt(k[1:] * k[:-1])
        return np.concatenate([[k[0] ** 2 / mid[0]], mid,
                               [k[-1] ** 2 / mid[-1]]])

    e_lat = cell_edges(k_lat)
    n_lat = (float(volume) * (e_lat[1:] ** 3 - e_lat[:-1] ** 3)
             / (12.0 * np.pi ** 2))
    hp = jax.lax.Precision.HIGHEST
    mu, w = _mu_rule(n_mu)
    p_s = power_rsd_mu(cosmo, halo_p, model, jnp.asarray(k_lat), mu,
                       sigma_v, with_bao, grid)       # (n_fft, n_mu)
    nb_ = model.n_g if n_bar is None else jnp.asarray(n_bar)
    smooth = p_s * p_s + 2.0 * p_s / nb_              # no white part
    legs = jnp.stack([_legendre(ell, mu) for ell in ells])
    pref = np.array([2.0 * ell + 1.0 for ell in ells])
    integ = jnp.einsum("am,bm,im,m->abi", legs, legs, smooth, w,
                       precision=hp)
    blocks = (jnp.asarray(pref)[:, None, None]
              * jnp.asarray(pref)[None, :, None] * integ
              / jnp.asarray(n_lat)[None, None, :])
    # 2/V overall (Gaussian pairing x 1/N_modes structure carries the
    # volume through n_lat; the factor 2 is the Wick pairing count —
    # matching windowed_multipole_covariance's algebra where both live
    # in blocks/N_i with N_i already per-volume).
    cov = jnp.einsum("AXai,abi,BYbi->AXBY", jnp.asarray(h), blocks,
                     jnp.asarray(h), precision=hp)
    # Exact white (pure-shot) closure on the diagonal (unwindowed).
    w_bin = (s_edges[1:] ** 3 - s_edges[:-1] ** 3) / 3.0
    white = (pref[:, None] / (2.0 * np.pi * float(volume) * w_bin)
             / nb_ ** 2)
    n_l, n_b = len(ells), s_edges.size - 1
    eye_l = jnp.asarray(np.eye(n_l))
    eye_b = jnp.asarray(np.eye(n_b))
    cov = cov + (white[:, :, None, None] * eye_l[:, None, :, None]
                 * eye_b[None, :, None, :])
    return cov.reshape(n_l * n_b, n_l * n_b)


# ---------------------------------------------------------------------------
# Projected correlation function wp(rp)
# ---------------------------------------------------------------------------


def _legendre_np(ell: int, mu):
    mu = np.asarray(mu, dtype=np.float64)
    if ell == 0:
        return np.ones_like(mu)
    if ell == 2:
        return 0.5 * (3.0 * mu * mu - 1.0)
    if ell == 4:
        m2 = mu * mu
        return 0.125 * (35.0 * m2 * m2 - 30.0 * m2 + 3.0)
    raise ValueError(f"only even ell in (0, 2, 4) supported, got {ell}")


def _wp_operator(s_grid, rp, ells, pi_max: float, n_pi: int):
    """Static operator W[r, l, j]: wp(rp_r) = sum_lj W xi_l(s_grid_j)
    — the line-of-sight quadrature wp = 2 \\int_0^pi_max dpi
    xi_s(rp, pi) with xi_s = sum_l xi_l(s) L_l(pi/s) folded into ONE
    (n_rp, n_ell, n_s_grid) float64 matrix at build time (GL in pi;
    the integrand is smooth in pi at fixed rp, so ~48 nodes are
    quadrature-exact; Catmull-Rom rows in ln s land every (rp, pi)
    node on the FFTLog s grid)."""
    from numpy.polynomial.legendre import leggauss

    rp = np.asarray(rp, dtype=np.float64)
    x, w = leggauss(n_pi)
    pi_n = 0.5 * pi_max * (x + 1.0)                  # (n_pi,)
    w_n = pi_max * w                                 # 2 * dpi weights
    s_rq = np.sqrt(rp[:, None] ** 2 + pi_n[None, :] ** 2)  # (n_rp, n_pi)
    mu_rq = pi_n[None, :] / s_rq
    rows = _catmull_rom_rows(s_grid, s_rq.ravel())   # (n_rp*n_pi, n_s)
    rows = rows.reshape(rp.size, n_pi, s_grid.size)
    out = np.empty((rp.size, len(ells), s_grid.size))
    for i, ell in enumerate(ells):
        leg = _legendre_np(ell, mu_rq)               # (n_rp, n_pi)
        out[:, i, :] = np.einsum("rq,q,rqj->rj", leg, w_n, rows)
    return out


def wp_rp(cosmo: CosmoParams, halo_p: HaloParams, model, rp,
          pi_max: float = 100.0, ells=(0, 2, 4), sigma_v=0.0,
          n_mu: int = 16, n_pi: int = 48, n_fft: int = 512,
          k_lo: float = 2e-4, k_hi: float = 60.0,
          with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
          redshift_space: bool = True, powers=None):
    """Projected correlation function wp(rp) (Mpc/h) — THE classic
    HOD-fitting observable (Zehavi et al. style):

        wp(rp) = 2 \\int_0^{pi_max} dpi  xi_s(rp, pi),

    with the finite line-of-sight depth ``pi_max`` of the estimator
    kept EXACTLY (at finite pi_max redshift-space distortions do NOT
    cancel — the standard Kaiser residual correction, e.g. van den
    Bosch et al. 2013 — so the default integrates the dispersion-model
    xi_s via its multipoles; ``redshift_space=False`` integrates the
    real-space xi_gg instead, the infinite-pi_max limit convention).

    TPU dataflow: xi_ell on the FFTLog s grid (one static matmul per
    ell, as :func:`xi_multipoles`) contracted with the precomputed
    line-of-sight operator of :func:`_wp_operator` — zero runtime
    gathers; jit/vmap/grad-able in (cosmo, sigma_v).  Returns
    (n_rp,)."""
    rp = np.asarray(rp, dtype=np.float64)
    ells = tuple(ells) if redshift_space else (0,)
    ln_k0 = float(np.log(k_lo))
    dln = float(np.log(k_hi / k_lo) / (n_fft - 1))
    k_lat, s_grid, fwd, _kb, _bwd = _sph_hankel_ops(n_fft, ln_k0, dln,
                                                    ells)
    w_op = _wp_operator(s_grid, rp, ells, pi_max, n_pi)
    hp = jax.lax.Precision.HIGHEST
    if redshift_space:
        p_ell = multipoles(cosmo, halo_p, model, jnp.asarray(k_lat),
                           ells=ells, sigma_v=sigma_v, n_mu=n_mu,
                           with_bao=with_bao, grid=grid, powers=powers)
    else:
        ps = (halo.powers(cosmo, halo_p, model, jnp.asarray(k_lat),
                          with_bao, grid) if powers is None else powers)
        p_ell = ps["power_gg"][None, :]
    xi = jnp.stack([jnp.matmul(jnp.asarray(fwd[ell]), p_ell[i],
                               precision=hp)
                    for i, ell in enumerate(ells)])   # (n_ell, n_s)
    return jnp.einsum("rlj,lj->r", jnp.asarray(w_op), xi, precision=hp)


def wp_covariance(cosmo: CosmoParams, halo_p: HaloParams, model, rp,
                  volume, pi_max: float = 100.0, ells=(0, 2, 4),
                  sigma_v=0.0, n_mu: int = 16, n_pi: int = 48,
                  n_k: int = 192, k_lo: float = 1e-3,
                  k_cut: float = 4.0, n_s_fine: int = 160,
                  with_bao: bool = False,
                  grid: GridSpec = DEFAULT_GRID, n_bar=None,
                  redshift_space: bool = True):
    """Gaussian covariance of wp(rp) at the POINT separations ``rp``:
    the pushforward W Cov_xi W^T of the fine-s-binned multipole
    covariance (:func:`xi_multipole_covariance` — which carries the
    exact Bessel-bin factors and the analytic pure-shot closure)
    through the same line-of-sight operator as :func:`wp_rp`, with
    xi_l taken piecewise from ``n_s_fine`` LOG-uniform fine bins
    spanning [min(rp)/2, sqrt(max(rp)^2 + pi_max^2)] (the s^2-measure
    centroids of geometric bins are exactly log-uniform, so the
    static Catmull-Rom interpolation applies; convergence is at the
    percent level for the default n_s_fine — check against a doubled
    value for your geometry).  All static matmuls; jit/vmap/grad-able.
    Returns (n_rp, n_rp)."""
    rp = np.asarray(rp, dtype=np.float64)
    ells = tuple(ells) if redshift_space else (0,)
    s_lo = max(0.5 * rp.min(), 1e-2)
    s_hi = np.sqrt(rp.max() ** 2 + pi_max ** 2) * 1.02
    s_edges = np.geomspace(s_lo, s_hi, n_s_fine + 1)
    cov_xi = xi_multipole_covariance(
        cosmo, halo_p, model, s_edges, volume, ells=ells,
        sigma_v=sigma_v, n_mu=n_mu, n_k=n_k, k_lo=k_lo, k_cut=k_cut,
        with_bao=with_bao, grid=grid, n_bar=n_bar)
    # Bin centroids in the s^2 measure (what the bin average weights).
    cent = (0.75 * (s_edges[1:] ** 4 - s_edges[:-1] ** 4)
            / (s_edges[1:] ** 3 - s_edges[:-1] ** 3))
    w_op = _wp_operator(cent, rp, ells, pi_max, n_pi)  # (n_rp, l, n_f)
    w_flat = jnp.asarray(w_op.reshape(rp.size, -1))
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(w_flat, cov_xi, precision=hp),
                      w_flat.T, precision=hp)
