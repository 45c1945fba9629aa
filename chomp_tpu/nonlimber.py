"""Exact (non-Limber) low-multipole C_ell corrections.

Capability extension beyond chomp (upstream:kernel.py / correlation.py
project EVERYTHING through the Limber approximation, SURVEY.md §2 rows
11-12): for a NARROW lens bin (sigma_z ~ 0.05) the Limber C_gg is wrong
by a factor ~2 at ell = 2 and by ~8% at ell = 10 (measured in
tests/test_nonlimber.py) — the dominant theory systematic of wide-angle
clustering, and the subject of the LSST-DESC "N5K" non-Limber challenge
(Leonard et al. 2023).  This module computes the exact curved-sky
projection

    C_ell^AB = (2/pi) ∫ k^2 dk  P_AB(k)  F_ell^A(k) F_ell^B(k),
    F_ell(k) = ∫ dchi  f(chi) j_ell(k chi),      f = W(chi) D~(chi)

in the same separable approximation as the lattice fast path (P_AB at
the model pivot, every leg scaled by D~ = D/D_pivot), and returns the
smooth DIFFERENCE to the matching Limber evaluation,

    dC_ell = C_ell^exact - C_ell^Limber,

as an additive correction for the pipelines: the base observable keeps
the gather-free Limber lattice route at every ell, and dC_ell (tapered
to zero at ``ell_switch``) repairs the low-ell tail.

TPU-first design (FFTLog with ANALYTIC Mellin kernels — Assassi,
Simonovic & Zaldarriaga 2017; Fang, Eifler & Krause 2020 "FFTLog and
beyond"):

- The spherical-Bessel transform F_ell(k) never evaluates j_ell at
  runtime.  f(chi) is sampled on the SAME static uniform-ln-chi lattice
  as the Limber convolution (limber_fft._lattice_z +
  _window_on_lattice: Newton chi->z inversion, cumulative-Simpson
  lensing windows — zero dynamic gathers), decomposed in log-Fourier
  modes by one rfft, multiplied by the static complex kernel

      I_ell(s) = ∫_0^inf x^{s-1} j_ell(x) dx
               = 2^{s-2} sqrt(pi) Gamma((ell+s)/2) / Gamma((ell-s+3)/2)

  at s = q + 1 + i eta_m (verified against regulated quadrature in
  tests/test_nonlimber.py), and transformed back by one irfft — the
  oscillation of j_ell(k chi) is integrated ANALYTICALLY per power-law
  component, so no grid ever needs to resolve it.
- A constant phase in the static kernel lands the output F_ell exactly
  ON the existing k-lattice nodes, so the SAME p_lattice row the
  pipeline already computed (full 1h+2h halo spectrum at the pivot)
  feeds both the exact k-quadrature and the Limber leg
  (limber_fft.limber_cl_fft) — the correction is exactly the
  pipeline's own Limber-projection error, at zero extra halo cost.
- dC_ell is smooth in ell, so it is evaluated at ~20 real-valued nodes
  uniform in ln(ell + 1/2) (I_ell is analytic in ell) and carried onto
  the integer multipoles by a static Catmull-Rom matrix composed into
  the observable-space correction operator (J_mu Hankel sums for the
  flat route, Legendre / Wigner-d multipole sums for the curved route)
  — runtime cost: one rfft + ~20 kernel rows + one (n_theta, n_nodes)
  matmul per probe.

Leg kinds:

- ``"d"`` (density): kernel I_ell(s), unit prefactor.
- ``"k_flat"`` (lensing convergence, flat-route correction): kernel
  I_ell(s-2) — from j_ell(x)/x^2, the exact chi-integral of the
  convergence transfer Delta_ell^kappa(k) = ell(ell+1) ∫ dchi W_kappa
  j_ell(k chi)/(k chi)^2 — with exact prefactor (ell+1/2)^2 instead of
  ell(ell+1): the flat route deliberately keeps the Limber ordering
  ell(ell+1) -> (ell+1/2)^2 so dC contains ONLY the projection-geometry
  error (the spin/curvature prefactor is geometry="curved" physics;
  including it here would double-count what the curved route's f_ell
  already applies).
- ``"k_E"`` (lensing E-mode, curved route): exact prefactor
  sqrt((ell+2)!/(ell-2)!), Limber leg multiplied by the same f_ell =
  sqrt((ell+2)!/(ell-2)!)/(ell(ell+1)) the curved prediction operator
  applies (curved._spin2_kappa_prefactor), so dC corrects the curved
  gamma_t spectrum C^{gE} consistently.

Redshift-space distortions on the galaxy leg (the j_ell'' kernel) are
the next-order effect at these multipoles and are provided by the
``"d_rsd"`` companion kernel (see rsd_* below) as an OPT-IN addition.

References: upstream has no counterpart (pure-Limber).  Assassi et al.
2017 (JCAP 1711:054), Fang et al. 2020 (JCAP 2005:010), Leonard et al.
2023 (N5K; OJAp 6).  Everything here is implemented from the equations
above — no code consulted.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec

#: FFTLog bias q: f(chi) = W D~ is compactly supported, so no tilt is
#: needed; q = 0 keeps s = 1 + i eta inside the kernel's convergence
#: strip -ell < Re s < 2 for every ell >= 1 (and Re(s-2) = -1 > -ell
#: for the kappa kernels at ell >= 2).
_Q = 0.0
#: Low-pass fraction of the log-Fourier modes (anti-ringing c-window,
#: Fang et al. 2020 eq. 2.12-style cosine rolloff).
_CWIN = 0.25


def mellin_jl(ell, s):
    """I_ell(s) = ∫_0^inf x^{s-1} j_ell(x) dx (numpy, complex s;
    2^{s-2} sqrt(pi) Gamma((ell+s)/2) / Gamma((ell-s+3)/2), valid for
    -ell < Re s < 2; verified vs regulated quadrature in the tests)."""
    from scipy.special import loggamma

    ell = np.asarray(ell, dtype=float)
    s = np.asarray(s, dtype=complex)
    return np.exp((s - 2.0) * np.log(2.0) + 0.5 * np.log(np.pi)
                  + loggamma((ell + s) / 2.0)
                  - loggamma((ell - s + 3.0) / 2.0))


def _exact_prefactor(kind: str, ells: np.ndarray) -> np.ndarray:
    ells = np.asarray(ells, dtype=float)
    if kind in ("d", "d_rsd"):
        return np.ones_like(ells)
    if kind == "k_flat":
        return (ells + 0.5) ** 2
    if kind == "k_E":
        return np.sqrt((ells + 2.0) * (ells + 1.0) * ells * (ells - 1.0))
    raise ValueError(f"unknown nonlimber leg kind {kind!r}")


def _limber_prefactor(kind: str, ells: np.ndarray) -> np.ndarray:
    ells = np.asarray(ells, dtype=float)
    if kind in ("d", "k_flat"):
        return np.ones_like(ells)
    if kind == "k_E":
        return np.sqrt((ells + 2.0) * (ells - 1.0)
                       / (ells * (ells + 1.0)))
    raise ValueError(f"unknown nonlimber leg kind {kind!r}")


def ell_nodes(ell_switch: int, n_nodes: int = 20) -> np.ndarray:
    """Real-valued multipole nodes, uniform in ln(ell + 1/2) from 2 to
    ``ell_switch`` (dC_ell is smooth there; I_ell is analytic in ell)."""
    x = np.linspace(np.log(2.5), np.log(ell_switch + 0.5), n_nodes)
    return np.exp(x) - 0.5


@lru_cache(maxsize=None)
def _nl_static(lattice_key, ells_key, kind: str, k_lo_cut: float,
               k_hi_cut: float):
    """Static FFTLog machinery for one leg kind at the node multipoles.

    Returns (kern, i_lo, n_use, npad) — ``kern`` (L, M) complex128:
    per-node-ell kernel rows folding I_ell, the exact-leg prefactor,
    the anti-ringing low-pass, the output phase that lands F on the
    k-lattice starting at index ``i_lo``, and the 1/npad rfft
    normalization; F_ell(k_n) k_n^{q+1} = npad*irfft(conj(c*kern))[n]
    for c = rfft(f_padded)/1 (unnormalized rfft)."""
    from chomp_tpu.limber_fft import _lattices_from_key

    ln_k, ln_chi = _lattices_from_key(lattice_key)
    dln = lattice_key[0]
    n_chi = len(ln_chi)
    npad = 1
    while npad < 2 * n_chi:
        npad *= 2
    eta = 2.0 * np.pi * np.arange(npad // 2 + 1) / (npad * dln)
    s = _Q + 1.0 + 1j * eta
    ells = np.asarray(ells_key, dtype=float)
    if kind == "d":
        i_l = mellin_jl(ells[:, None], s[None, :])
    elif kind == "d_rsd":
        # Kernel -j_ell''(x): from the Bessel ODE + downward recurrence,
        # j'' = ((ell+1)(ell+2)/x^2 - 1) j_ell - (2/x) j_{ell-1}, so the
        # Mellin rows combine three shifted I's (Fang et al. 2020 §2.2;
        # Re(s-2) = -1 > -ell and Re(s-1) = 0 > -(ell-1) for ell >= 2).
        le = ells[:, None]
        sv = s[None, :]
        i_l = -((le + 1.0) * (le + 2.0) * mellin_jl(le, sv - 2.0)
                - mellin_jl(le, sv)
                - 2.0 * mellin_jl(le - 1.0, sv - 1.0))
    else:
        i_l = mellin_jl(ells[:, None], s[None, :] - 2.0)
    i_l = i_l * _exact_prefactor(kind, ells)[:, None]
    # Anti-ringing low-pass on the top _CWIN fraction of modes.
    x = np.arange(eta.size) / max(eta.size - 1, 1)
    wlp = np.ones_like(x)
    hi = x > 1.0 - _CWIN
    wlp[hi] = 0.5 * (1.0 + np.cos(np.pi * (x[hi] - (1.0 - _CWIN))
                                  / _CWIN))
    # Output window on the k lattice: [i_lo, i_lo + n_use).
    i_lo = int(np.searchsorted(ln_k, np.log(k_lo_cut)))
    i_hi = int(np.searchsorted(ln_k, np.log(k_hi_cut)))
    n_use = min(i_hi - i_lo, npad)
    v0 = ln_k[i_lo]
    # F(k) k^{q+1} = Re sum_m c_m I(s_m) e^{-i eta_m (ln k + ln chi_0)};
    # at ln k_n = v0 + n dln the n-dependence is e^{-2 pi i m n / npad},
    # i.e. npad * irfft of the CONJUGATED one-sided coefficients.
    phase = np.exp(-1j * eta * (v0 + ln_chi[0]))
    kern = np.conj(i_l * (wlp * phase)[None, :] / npad)
    return kern, i_lo, n_use, npad


def _transfer(f_lattice, kern, i_lo: int, n_use: int, npad: int,
              lattice_key):
    """F_ell at the k-lattice subset from window samples f (traced).

    ``f_lattice``: (..., n_chi) samples of W(chi) D~(chi) at the static
    lattice nodes.  Returns (..., L, n_use)."""
    from chomp_tpu.limber_fft import _lattices_from_key

    ln_k, ln_chi = _lattices_from_key(lattice_key)
    n_chi = len(ln_chi)
    pad = [(0, 0)] * (f_lattice.ndim - 1) + [(0, npad - n_chi)]
    c = jnp.fft.rfft(jnp.pad(f_lattice, pad), axis=-1)
    # kern already carries conj(I phi wlp)/npad; conjugating c makes
    # b the Hermitian half-spectrum whose irfft is the two-sided sum
    # 2 Re[c I phi e^{-i eta n dln}] (DC/Nyquist handled by irfft).
    b = jnp.conj(c)[..., None, :] * jnp.asarray(kern)
    big = jnp.fft.irfft(b, n=npad, axis=-1) * npad
    k_sub = np.exp(ln_k[i_lo:i_lo + n_use])
    return big[..., :n_use] * jnp.asarray(k_sub ** (-(_Q + 1.0)))


def _leg_f(cosmo, win, grid, growth_pivot):
    """W(chi) D~(chi) on the static lattice nodes (gather-free)."""
    from chomp_tpu import background
    from chomp_tpu.limber_fft import _lattice_z, _window_on_lattice

    chi, z, z_mid = _lattice_z(cosmo, grid)
    d = background.growth_factor(cosmo, z, grid.n_growth) / growth_pivot
    w = _window_on_lattice(cosmo, win, z, chi, grid, z_mid)
    return w * d


def nonlimber_cl_pair(cosmo: CosmoParams, win_a, win_b, p_kind_lattice,
                      ells, grid: GridSpec = DEFAULT_GRID,
                      kinds=("d", "d"), growth_pivot=1.0,
                      k_lo_cut: float = 3e-5, k_hi_cut: float = 4.0,
                      ell_offset: float = 0.5):
    """(C_ell^exact, C_ell^Limber) at static ``ells`` (ints or floats).

    ``p_kind_lattice``: the pivot-epoch halo spectrum on the k lattice
    (limber_fft.k_lattice nodes) — the SAME row the pipelines compute;
    both legs consume it, so the difference isolates pure projection
    error.  ``kinds``: per-leg ("d" | "k_flat" | "k_E"); the Limber leg
    gets the matching per-ell prefactor (see module docstring)."""
    from chomp_tpu.limber_fft import _lattice_key, limber_cl_fft

    lkey = _lattice_key(grid)
    ells_key = tuple(np.asarray(ells, dtype=float).tolist())
    ells_np = np.asarray(ells_key)
    hp = jax.lax.Precision.HIGHEST

    f_a = _leg_f(cosmo, win_a, grid, growth_pivot)
    kern_a, i_lo, n_use, npad = _nl_static(lkey, ells_key, kinds[0],
                                           k_lo_cut, k_hi_cut)
    fa = _transfer(f_a, kern_a, i_lo, n_use, npad, lkey)
    if win_b is win_a and kinds[1] == kinds[0]:
        fb = fa
    else:
        f_b = _leg_f(cosmo, win_b, grid, growth_pivot)
        kern_b, _, _, _ = _nl_static(lkey, ells_key, kinds[1],
                                     k_lo_cut, k_hi_cut)
        fb = _transfer(f_b, kern_b, i_lo, n_use, npad, lkey)

    from chomp_tpu.limber_fft import _lattices_from_key

    ln_k, _ = _lattices_from_key(lkey)
    k_sub = np.exp(ln_k[i_lo:i_lo + n_use])
    w_quad = (2.0 / np.pi) * k_sub**3 * lkey[0]
    w_quad[0] *= 0.5
    w_quad[-1] *= 0.5
    p_sub = p_kind_lattice[..., i_lo:i_lo + n_use]
    cl_ex = jnp.einsum("...ln,...ln,...n->...l", fa, fb,
                       p_sub * jnp.asarray(w_quad), precision=hp)

    cl_li = limber_cl_fft(cosmo, win_a, win_b, ells_np, p_kind_lattice,
                          grid, ell_offset=ell_offset,
                          growth_pivot=growth_pivot)
    pref = (_limber_prefactor(kinds[0], ells_np)
            * _limber_prefactor(kinds[1], ells_np))
    return cl_ex, cl_li * jnp.asarray(pref)


def delta_cl_nodes(cosmo: CosmoParams, win_a, win_b, p_kind_lattice,
                   ell_switch: int, grid: GridSpec = DEFAULT_GRID,
                   kinds=("d", "d"), growth_pivot=1.0,
                   n_nodes: int = 20, **kw):
    """dC_ell = exact - Limber at the ell_nodes(ell_switch, n_nodes)
    multipoles (traced; the static correction operators consume it)."""
    nodes = ell_nodes(ell_switch, n_nodes)
    ex, li = nonlimber_cl_pair(cosmo, win_a, win_b, p_kind_lattice,
                               nodes, grid, kinds, growth_pivot, **kw)
    return ex - li


def rsd_delta_cl_nodes(cosmo: CosmoParams, halo_p, model, win_g,
                       win_other, ell_switch: int,
                       grid: GridSpec = DEFAULT_GRID,
                       kind_other: str = "d", growth_pivot=1.0,
                       n_nodes: int = 20, with_bao: bool = False,
                       k_lo_cut: float = 3e-5, k_hi_cut: float = 4.0):
    """Linear redshift-space-distortion contribution to C_ell at the
    ell nodes — purely ADDITIVE (the Limber projection of the RSD term
    is zero at leading order, and chomp's pipelines carry none), so
    this goes through the same correction operators as dC.

    Kaiser transfer per galaxy leg: Delta^g = h_g(k) j_ell(k chi) +
    f(z) [-j_ell''(k chi)] under the window, with f = dlnD/dlna
    (background.growth_rate).  Contributions on the LINEAR 2-halo
    spectrum P_lin h_a h_b (the 1-halo term carries no coherent
    velocity field at these scales):

      gg:      (2/pi) ∫ k^2 dk P_lin [ 2 h_g F_d F_r + F_r^2 ]
      g-other: (2/pi) ∫ k^2 dk P_lin  h_other F_other F_r

    with F_r = ∫ dchi W_g f D~ (-j_ell''), F_d the unit-bias density
    transfer, and h_* = halo.two_halo_integrals at the static lattice-k
    quadrature nodes.  ``kind_other``: "d" (the same g window, i.e. the
    gg case — pass win_other=win_g), or "k_flat"/"k_E" for gamma_t
    (the other leg is matter: h_other = h_m).

    For a sigma_z ~ 0.05 lens bin at z=0.5 (default HOD, beta = f/b ~
    0.78) RSD DOMINATES the low multipoles: measured ratio to the
    exact density C_gg 1.56 at ell=2, 0.48 at ell=10, 0.06 at ell=40
    (tests/test_nonlimber.py::test_rsd_gg_magnitude) — any low-ell
    analysis of narrow bins that omits it is order-unity wrong, which
    is why it ships with the non-Limber repair."""
    from chomp_tpu import background, halo, linear
    from chomp_tpu.limber_fft import (_lattice_key, _lattice_z,
                                      _lattices_from_key,
                                      _window_on_lattice)

    lkey = _lattice_key(grid)
    nodes = ell_nodes(ell_switch, n_nodes)
    ells_key = tuple(nodes.tolist())
    hp = jax.lax.Precision.HIGHEST

    chi, z, z_mid = _lattice_z(cosmo, grid)
    d = background.growth_factor(cosmo, z, grid.n_growth) / growth_pivot
    w_g = _window_on_lattice(cosmo, win_g, z, chi, grid, z_mid)
    f_of_z = background.growth_rate(cosmo, z, grid.n_growth)

    kern_r, i_lo, n_use, npad = _nl_static(lkey, ells_key, "d_rsd",
                                           k_lo_cut, k_hi_cut)
    f_r = _transfer(w_g * f_of_z * d, kern_r, i_lo, n_use, npad, lkey)

    ln_k, _ = _lattices_from_key(lkey)
    k_sub = np.exp(ln_k[i_lo:i_lo + n_use])
    w_quad = (2.0 / np.pi) * k_sub**3 * lkey[0]
    w_quad[0] *= 0.5
    w_quad[-1] *= 0.5
    # Pivot-epoch linear power (legs carry D/D_pivot, so P at the pivot
    # reproduces P_lin(k) D(z1) D(z2) exactly — same convention as the
    # halo lattice rows).
    p_lin = (linear.linear_power(cosmo, jnp.asarray(k_sub), 0.0,
                                 with_bao, grid) * growth_pivot**2)
    h_m, h_g = halo.two_halo_integrals(cosmo, halo_p, model,
                                       jnp.asarray(k_sub))

    if kind_other == "d":
        kern_d, _, _, _ = _nl_static(lkey, ells_key, "d",
                                     k_lo_cut, k_hi_cut)
        f_d = _transfer(w_g * d, kern_d, i_lo, n_use, npad, lkey)
        integ = (2.0 * h_g * f_d + f_r) * f_r
    else:
        kern_o, _, _, _ = _nl_static(lkey, ells_key, kind_other,
                                     k_lo_cut, k_hi_cut)
        w_o = _window_on_lattice(cosmo, win_other, z, chi, grid, z_mid)
        f_o = _transfer(w_o * d, kern_o, i_lo, n_use, npad, lkey)
        integ = h_m * f_o * f_r
    return jnp.einsum("ln,n->l", integ, p_lin * jnp.asarray(w_quad),
                      precision=hp)


@lru_cache(maxsize=None)
def correction_operator(theta_key, mu: float, ell_switch: int,
                        n_nodes: int = 20, geometry: str = "flat",
                        taper_frac: float = 0.3,
                        bin_average: bool = False):
    """Static (n_theta, n_nodes) matrix carrying dC at the ell nodes
    into observable space (numpy, offline).

    Composition: Catmull-Rom from the uniform-ln(ell+1/2) nodes onto
    the integer multipoles 2..ell_switch, a cosine taper over the top
    ``taper_frac`` of the range (dC itself decays ~ell^-2; the taper
    removes the residual step at the switch), then

      flat:   dw(theta) = sum_ell  ell J_mu(ell theta) / (2 pi) dC(ell)
              (unit-spaced trapezoid over the continuous-ell Hankel —
              the same transform convention as the flat lattice route;
              the ell < 2 sliver it omits is O(ell^2 theta^2) tiny),
      curved: dw(theta) = sum_ell (2 ell + 1)/(4 pi) X_ell dC_ell with
              X = P_ell(cos theta) (mu=0) or d^ell_20 (mu=2; dC is
              already the E-spectrum difference — no extra f_ell).

    ``theta_key``: theta points in DEGREES (tuple, hashable), or bin
    edges with ``bin_average=True`` (curved only)."""
    theta = np.asarray(theta_key, dtype=float)
    theta_rad = np.radians(theta)
    ints = np.arange(2, ell_switch + 1, dtype=float)
    # Catmull-Rom node interpolation in x = ln(ell + 1/2).
    x_nodes = np.linspace(np.log(2.5), np.log(ell_switch + 0.5), n_nodes)
    dx = x_nodes[1] - x_nodes[0]
    from chomp_tpu.grids import catmull_rom_weights_np

    cr = catmull_rom_weights_np(n_nodes,
                                (np.log(ints + 0.5) - x_nodes[0]) / dx)
    tap = np.ones_like(ints)
    l_t = (1.0 - taper_frac) * ell_switch
    hi = ints > l_t
    tap[hi] = 0.5 * (1.0 + np.cos(np.pi * (ints[hi] - l_t)
                                  / (ell_switch - l_t)))
    if geometry == "flat":
        if bin_average:
            raise NotImplementedError(
                "bin_average correction is curved-route only (the flat"
                " pipelines predict at theta points)")
        from scipy.special import jv

        geo = (ints[None, :] * jv(mu, ints[None, :] * theta_rad[:, None])
               / (2.0 * np.pi))
    elif geometry == "curved":
        from chomp_tpu.curved import (_legendre_all, _wigner_d_matrix,
                                      legendre_bin_factors,
                                      legendre_bin_factors_spin2)

        if bin_average:
            bf = (legendre_bin_factors if mu == 0
                  else legendre_bin_factors_spin2)
            b = bf(ell_switch, theta_rad)[:, 2:]
        elif mu == 0:
            b = _legendre_all(ell_switch, np.cos(theta_rad)).T[:, 2:]
        else:
            b = _wigner_d_matrix(2, 0, ell_switch,
                                 np.cos(theta_rad)).T[:, 2:]
        geo = b * ((2.0 * ints + 1.0) / (4.0 * np.pi))[None, :]
    else:
        raise ValueError(f"geometry must be flat|curved, got {geometry!r}")
    return np.ascontiguousarray((geo * tap[None, :]) @ cr)


def wtheta_nonlimber_correction(cosmo: CosmoParams, win_a, win_b,
                                p_kind_lattice, theta_deg, mu: float,
                                ell_switch: int,
                                grid: GridSpec = DEFAULT_GRID,
                                kinds=("d", "d"), growth_pivot=1.0,
                                geometry: str = "flat",
                                n_nodes: int = 20, **kw):
    """Additive dw(theta) (or d gamma_t) non-Limber correction for the
    pipelines: delta_cl_nodes contracted with the static
    correction_operator.  ``mu``: 0 (w) or 2 (gamma_t)."""
    d = delta_cl_nodes(cosmo, win_a, win_b, p_kind_lattice, ell_switch,
                       grid, kinds, growth_pivot, n_nodes, **kw)
    theta_key = tuple(np.asarray(theta_deg, dtype=float).tolist())
    op = correction_operator(theta_key, float(mu), int(ell_switch),
                             n_nodes, geometry)
    return jnp.matmul(jnp.asarray(op), d,
                      precision=jax.lax.Precision.HIGHEST)
