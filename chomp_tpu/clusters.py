"""Cluster number counts, their covariance, and the counts x 3x2pt
super-sample cross-covariance — the "3x2pt + N" joint data vector.

Capability extension beyond chomp (upstream has no cluster-abundance
observable at all; SURVEY.md §2 rows 4/13 stop at the mass function and
two-point covariances).  Everything here rides machinery the suite has
already certified: the Sheth-Tormen mass sector (chomp_tpu.mass), the
background volumes (chomp_tpu.background), and the SSC engine's
footprint variance + halo-model responses (chomp_tpu.ssc).

Observable
----------
Counts of clusters selected on an OBSERVED mass proxy (richness, SZ Y,
X-ray L — anything with a lognormal scatter about true mass) in
tomographic redshift bins:

    N_{i,a} = Omega_s ∫_{z_i} dz  (dV/dz/dOmega)  ∫ dlnM  (dn/dlnM)(M,z)
              Phi_a(M, z),
    dV/dz/dOmega = S_k(chi)^2 (c/H0)/E(z)            [(Mpc/h)^3 / sr]

with the lognormal selection (Lima & Hu 2005 convention)

    Phi_a(M, z) = (1/2)[ erfc(x_lo) - erfc(x_hi) ],
    x_edge = (lnM_obs_edge - lnM - lnM_bias(z)) / (sqrt(2) sigma_lnM(z)),

evaluated with the saturation-safe erfc (NUMERICS.md §7 — the same
one-ulp f32 floor that poisoned HOD occupations would otherwise create
spurious high-mass counts).  The lnM integral runs on the mass tables'
own Gauss-Legendre rule (exact for the framework's finite mass range);
the z integral on static per-bin GL nodes.  Fully traced: jit / vmap /
grad through (cosmology, selection nuisance parameters) both work —
counts Fisher forecasts and joint count+clustering MCMC come for free.

Covariance
----------
    Cov = Poisson + sample variance (super-sample):

1. Poisson: diag(N) — clusters are a Poisson draw of the selected halo
   field.
2. Sample variance: the selected-halo density responds to the mean
   background mode of the footprint with the bias-weighted response
   (dn/ddelta_b = b(M) dn + dn (growth of the field itself is already
   in b for counts — counts respond with EXACTLY the mean selected
   bias, unlike power spectra):

     deltaN_{i,a} = Omega_s ∫ dchi  S_k^2 (n b)_{i,a}(chi) delta_bW(chi),
     (n b)_a(z)   = ∫ dlnM (dn/dlnM) b(M, z) Phi_a(M, z),

   with delta_bW the footprint-averaged linear density.  Two radial
   treatments:

   - ``radial="limber"`` (default; Hu & Kravtsov 2003 per-shell limit):
     <delta_bW(chi) delta_bW(chi')> = delta_D(chi - chi')
     sigma_b^2(chi) with the SAME ssc.sigma_b2_fn footprint variance
     the 3x2pt SSC blocks use (flat or curved mask objects, or a bare
     solid angle).  Exact in the wide-bin limit; z-bins decorrelate.
   - ``radial="exact"`` (curved masks): the full spectral sum

       Cov = sum_l 4 pi c_l (2/pi) ∫ k^2 dk P_lin(k,0) T_{al}(k) T_{bl}(k),
       T_{al}(k) = ∫ dchi  S_k^2 (n b)_a D(z) j_l(k chi),

     with 4 pi c_l = sum_m |W_lm|^2 from the mask's own xi_w2 Legendre
     coefficients (ssc._mask_cl_coeffs).  This carries the CROSS-z-bin
     count correlations the Limber limit zeroes (neighbouring
     Delta z ~ 0.1 bins correlate at the tens-of-percent level) and is
     the referee for the Limber mode.  TPU-first j_l: the Gegenbauer
     integral j_l(x) = ((-i)^l / 2) ∫ dmu P_l(mu) e^{i x mu} evaluated
     as ONE static (L, n_mu) Legendre table matmul against the
     elementwise phase matrix — all multipoles at all arguments in one
     MXU contraction, zero dynamic gathers, no recurrences to
     stabilize (validated against scipy.special.spherical_jn in
     tests/test_clusters.py).

Counts x 3x2pt cross-covariance
-------------------------------
Counts and every two-point probe respond to the same background modes:

    Cov(N_{i,a}, C_A(l)) = Omega_s ∫ dchi  S_k^2 (n b)_{i,a}(chi)
        [W_A1 W_A2 / chi^2](chi)  (dP_A/ddelta_b)((l+1/2)/chi, z)
        sigma_b^2(chi),

with the SAME ssc.power_response_parts responses (growth + dilation +
bias-weighted 1-halo + number-count terms) evaluated analytically at
the traced Limber wavenumbers (no tables, no gathers), projected to
theta bins by the covariance stack's own bin factors
(bin_averaged_bessel flat / Legendre & Wigner factors curved).
``counts_3x2pt_ssc_cross`` assembles the full (n_counts, n_probe * nb)
cross matrix over the tomographic_probes data-vector order, and
``joint_counts_3x2pt_covariance`` stacks [[NN, NX], [XN, DD]] with any
DD builder output.

Conventions and limits (documented, tested):
- Binary-footprint normalization: the counts weight map is W (each
  cluster counted once); the stack's mask objects expose the W^2
  ingredients (area2, xi_w2).  For binary masks W^2 = W so everything
  is exact; for apodized weight maps the counts-side variance uses the
  W^2 statistics as the natural approximation (the 3x2pt side is exact
  either way).
- No cross Poisson term between counts and clustering: the cluster
  sample is assumed distinct from the lens galaxies (the shot-noise
  cross term for overlapping samples is not modeled).
- The Limber cross blocks use the separable response scaling
  (D^2(z)/D_piv^2), matching the 3x2pt SSC default.

References: Lima & Hu 2005 (PRD 72 043006, lognormal MOR counts);
Hu & Kravtsov 2003 (ApJ 584, 702, sample variance of counts);
Takada & Hu 2013; Lacasa 2018 (counts x C_l super-sample correlation).
Implemented from the equations above — no external code consulted.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import background, mass, special
from chomp_tpu.params import (C_OVER_H0, DEFAULT_GRID, CosmoParams,
                              GridSpec, HaloParams)
from chomp_tpu.utils.tree import pytree_dataclass

__all__ = [
    "ClusterSelection", "shell_density", "cluster_counts",
    "counts_ssc_covariance", "counts_covariance",
    "counts_probe_ssc_cl", "counts_3x2pt_ssc_cross",
    "joint_counts_3x2pt_covariance", "spherical_jl_table",
    "SelectionHOD", "selection_hod", "cluster_dndz_table",
]

_HP = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Selection function (lognormal mass-observable relation)
# ---------------------------------------------------------------------------

@pytree_dataclass
class ClusterSelection:
    """Lognormal mass-observable relation + observed-mass bin edges.

    ln M_obs | M ~ Normal(lnM + lnm_bias(z), sigma_lnm(z)^2) with the
    standard log-evolutions

        sigma_lnm(z) = sigma_lnm + sigma_lnm_z * ln(1 + z),
        lnm_bias(z)  = lnm_bias  + lnm_bias_z  * ln(1 + z).

    All fields are traced leaves — selection parameters are nuisance
    parameters (differentiate / sample them through the counts).
    ``ln_m_obs_edges``: (n_bins + 1,) increasing edges in ln(M_sun/h);
    use a wide top edge (e.g. ln 1e16) for a threshold sample.
    """

    ln_m_obs_edges: jnp.ndarray
    sigma_lnm: jnp.ndarray = 0.25
    sigma_lnm_z: jnp.ndarray = 0.0
    lnm_bias: jnp.ndarray = 0.0
    lnm_bias_z: jnp.ndarray = 0.0

    @property
    def n_bins(self) -> int:
        return int(self.ln_m_obs_edges.shape[-1]) - 1

    def phi(self, ln_m, z):
        """Selection probability per observed-mass bin: (n_bins, n_m)
        for ``ln_m`` (n_m,) true masses at scalar redshift ``z``."""
        ln_m = jnp.asarray(ln_m)
        lz = jnp.log1p(jnp.asarray(z))
        sig = self.sigma_lnm + self.sigma_lnm_z * lz
        mu = ln_m + self.lnm_bias + self.lnm_bias_z * lz
        x = ((self.ln_m_obs_edges[:, None] - mu[None, :])
             / (jnp.sqrt(2.0) * sig))
        c = special.erfc(x)                       # decreasing in edge
        return 0.5 * (c[:-1] - c[1:])


# ---------------------------------------------------------------------------
# Shell densities and counts
# ---------------------------------------------------------------------------

def shell_density(cosmo: CosmoParams, halo_p: HaloParams,
                  sel: ClusterSelection, z, with_bao: bool = False,
                  grid: GridSpec = DEFAULT_GRID):
    """(n_a, (nb)_a) at scalar redshift ``z``: comoving number density
    and bias-weighted density of selected clusters per observed-mass
    bin, in (h/Mpc)^3.  One mass-table build per call (the sigma(M)
    contraction inside is z-independent, so a vmap over z batches only
    the cheap growth/threshold arithmetic)."""
    t = mass.build_mass_tables(cosmo, halo_p, z, with_bao, grid)
    phi = sel.phi(t.ln_m, z)                        # (n_bins, n_mass)
    base = t.w_lnm * t.dndlnm
    n = jnp.matmul(phi, base, precision=_HP)
    nb = jnp.matmul(phi, base * t.bias, precision=_HP)
    return n, nb


@lru_cache(maxsize=None)
def _zbin_gl(z_edges_key, n_quad: int):
    """Static per-z-bin GL nodes/weights: 2x (n_zbin, n_quad) numpy."""
    from chomp_tpu.grids import gl_fixed

    edges = np.asarray(z_edges_key, dtype=float)
    zs, ws = [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        z, w = gl_fixed(float(lo), float(hi), n_quad)
        zs.append(z)
        ws.append(w)
    return np.stack(zs), np.stack(ws)


def _zbin_key(z_edges):
    return tuple(np.asarray(z_edges, dtype=float).tolist())


def _shells(cosmo, halo_p, sel, z_nodes, with_bao, grid):
    """vmapped shell quantities at the flattened (n_zbin * n_quad,)
    nodes: n, nb (nodes, n_mbin), plus chi_t (transverse), dchi/dz,
    growth at the nodes."""
    z_flat = jnp.asarray(z_nodes.reshape(-1))
    n, nb = jax.vmap(lambda zz: shell_density(cosmo, halo_p, sel, zz,
                                              with_bao, grid))(z_flat)
    chi_t = background.transverse_comoving_distance(cosmo, z_flat,
                                                    grid.n_dist)
    dchi_dz = C_OVER_H0 / background.ez(cosmo, z_flat)
    d = background.growth_factor(cosmo, z_flat, grid.n_growth)
    return n, nb, chi_t, dchi_dz, d


def cluster_counts(cosmo: CosmoParams, halo_p: HaloParams,
                   sel: ClusterSelection, z_edges, omega_s_sr: float,
                   n_z_quad: int = 12, with_bao: bool = False,
                   grid: GridSpec = DEFAULT_GRID):
    """Expected counts N (n_zbin, n_mbin) over a footprint of solid
    angle ``omega_s_sr`` (pure traced function of cosmo + sel)."""
    z_nodes, z_w = _zbin_gl(_zbin_key(z_edges), n_z_quad)
    n, _, chi_t, dchi_dz, _ = _shells(cosmo, halo_p, sel,
                                      z_nodes, with_bao, grid)
    nzb = z_nodes.shape[0]
    vol = (chi_t**2 * dchi_dz).reshape(nzb, n_z_quad)
    integ = n.reshape(nzb, n_z_quad, -1) * vol[:, :, None]
    return omega_s_sr * jnp.einsum("iq,iqa->ia", jnp.asarray(z_w),
                                   integ, precision=_HP)


# ---------------------------------------------------------------------------
# Spherical Bessel table (exact radial mode)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=16)
def _gegenbauer_static(lmax: int, n_mu: int):
    """Static (L, n_mu) real/imag Legendre rows folding the GL weights
    and the (-i)^l prefactor of j_l = ((-i)^l/2) ∫ P_l(mu) e^{ix mu}:
    j_l(x) = rows_re @ cos(x mu) + rows_im @ sin(x mu)."""
    from chomp_tpu.curved import _legendre_all
    from chomp_tpu.grids import gauss_legendre

    x, w = gauss_legendre(n_mu)
    p = _legendre_all(lmax, x) * (0.5 * w)[None, :]     # (L+1, n_mu)
    ell = np.arange(lmax + 1)
    # (-i)^l e^{ixmu} real part: l % 4 == 0 -> +cos, 1 -> +sin,
    # 2 -> -cos, 3 -> -sin.
    sign = np.where(ell % 4 >= 2, -1.0, 1.0)
    use_sin = (ell % 2 == 1)
    rows_c = np.where(~use_sin, sign, 0.0)[:, None] * p
    rows_s = np.where(use_sin, sign, 0.0)[:, None] * p
    return np.ascontiguousarray(rows_c), np.ascontiguousarray(rows_s), x


def spherical_jl_table(x, lmax: int, n_mu: int | None = None):
    """j_l(x) for every l <= lmax at traced arguments ``x`` (any
    shape), as TWO static-table matmuls (Gegenbauer/Legendre integral
    — see module docstring).  Returns (..., lmax+1).

    ``n_mu`` must exceed ~max(x)/2 to resolve the phase oscillation;
    the default sizes it for the caller-declared static ``x_max`` via
    the covariance entry points (they pass n_mu explicitly)."""
    if n_mu is None:
        n_mu = 4096
    rows_c, rows_s, mu = _gegenbauer_static(lmax, n_mu)
    x = jnp.asarray(x)
    ph = x[..., None] * jnp.asarray(mu)
    return (jnp.matmul(jnp.cos(ph), jnp.asarray(rows_c.T), precision=_HP)
            + jnp.matmul(jnp.sin(ph), jnp.asarray(rows_s.T),
                         precision=_HP))


@lru_cache(maxsize=None)
def _ssc_k_grid(k_lo: float, k_hi: float, n_log: int, n_lin: int):
    """Hybrid log+linear k grid with trapezoid weights: log spacing
    resolves the P(k) shape at low k, linear spacing resolves the
    radial-window oscillation of T_l(k) (period ~ pi/chi_max) at the
    top.  Returns (k, w) with w the dk trapezoid weights."""
    k_sw = min(10.0 * k_lo, k_hi / 4.0)
    kl = np.exp(np.linspace(np.log(k_lo), np.log(k_sw), n_log,
                            endpoint=False))
    km = np.linspace(k_sw, k_hi, n_lin)
    k = np.concatenate([kl, km])
    w = np.empty_like(k)
    w[1:-1] = 0.5 * (k[2:] - k[:-2])
    w[0] = 0.5 * (k[1] - k[0])
    w[-1] = 0.5 * (k[-1] - k[-2])
    return k, w


# ---------------------------------------------------------------------------
# Counts covariance
# ---------------------------------------------------------------------------

def _counts_mask(mask, geometry: str):
    """Resolve a bare solid angle to the geometry's compact footprint
    (same conveniences as ssc.sigma_b2_fn) and return (mask, omega)."""
    if isinstance(mask, (int, float)):
        omega = float(mask)
        if geometry == "curved":
            from chomp_tpu.curved import SphericalCapMask

            return SphericalCapMask(float(np.arccos(np.clip(
                1.0 - omega / (2.0 * np.pi), -1.0, 1.0)))), omega
        from chomp_tpu.mask import DiscMask

        return DiscMask(float(np.sqrt(omega / np.pi))), omega
    return mask, float(mask.area2)


def counts_ssc_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                          sel: ClusterSelection, z_edges, mask,
                          geometry: str = "flat",
                          radial: str = "limber",
                          n_z_quad: int = 12, with_bao: bool = False,
                          grid: GridSpec = DEFAULT_GRID,
                          lmax: int | None = None,
                          k_hi: float = 0.25, n_k_log: int = 96,
                          n_k_lin: int = 320,
                          n_mu_bessel: int | None = None):
    """Sample-variance block of the counts covariance, flattened over
    the (z-bin major, mass-bin minor) data-vector order:
    (n_z * n_m, n_z * n_m).

    ``radial="limber"``: per-shell footprint variance (any flat or
    curved mask, or a bare solid angle) — block-diagonal in z.
    ``radial="exact"`` (curved masks / bare omega): the full spectral
    sum with cross-z-bin correlations (module docstring); ``lmax``
    defaults to the same mask-coupling-scaled cut as sigma_b2_curved,
    and the j_l Gegenbauer order ``n_mu_bessel`` is sized from the
    static k_hi x chi upper bound at trace time."""
    from chomp_tpu import linear
    from chomp_tpu.ssc import _mask_cl_coeffs, sigma_b2_fn

    z_nodes, z_w = _zbin_gl(_zbin_key(z_edges), n_z_quad)
    nzb = z_nodes.shape[0]
    mask, omega_s = _counts_mask(mask, geometry)
    n, nb, chi_t, dchi_dz, d = _shells(cosmo, halo_p, sel, z_nodes,
                                       with_bao, grid)
    n_m = nb.shape[-1]
    # Per-node kernel F (nodes, n_m): Omega chi_t^2 (nb), with the GL
    # z weights and dchi/dz folded in (so sums over nodes are ∫ dchi).
    w_flat = jnp.asarray(z_w.reshape(-1))
    f_ker = (omega_s * chi_t**2 * dchi_dz * w_flat)[:, None] * nb

    if radial == "limber":
        chi_r = background.comoving_distance(
            cosmo, jnp.asarray(z_nodes.reshape(-1)), grid.n_dist)
        s2 = sigma_b2_fn(cosmo, mask, geometry, with_bao, grid)(chi_r, d)
        # Cov = sum over shells of F F' sigma_b^2 / dchi (the delta_D
        # eats one radial integral): within each z bin only.
        blocks = []
        fz = f_ker.reshape(nzb, n_z_quad, n_m)
        s2z = (s2 / (dchi_dz * w_flat)).reshape(nzb, n_z_quad)
        for i in range(nzb):
            blocks.append(jnp.einsum("qa,qb,q->ab", fz[i], fz[i],
                                     s2z[i], precision=_HP))
        out = jnp.zeros((nzb * n_m, nzb * n_m))
        for i, blk in enumerate(blocks):
            out = out.at[i * n_m:(i + 1) * n_m,
                         i * n_m:(i + 1) * n_m].set(blk)
        return out

    if radial != "exact":
        raise ValueError(f"radial must be 'limber'|'exact', got {radial!r}")
    if geometry != "curved":
        raise ValueError(
            "radial='exact' needs the curved-sky spectral sum — pass a "
            "curved mask (or bare omega with geometry='curved'); the "
            "Limber mode covers flat footprints")
    from chomp_tpu.grids import gl_composite
    from chomp_tpu.limber_fft import (_barycentric_rows, _cheb_nodes,
                                      fiducial_chi_np)

    if lmax is None:
        lmax = int(min(max(64.0, 8.0 * max(mask.coupling_ell, 1.0)),
                       512.0))
    c_l = _mask_cl_coeffs(mask, lmax)
    edges_np = np.asarray(z_edges, dtype=float)
    chi_top = float(fiducial_chi_np(float(edges_np[-1]))) * 1.4
    # Radial/k resolution: T_l(k) oscillates as j_l(k chi) — the
    # radial rule needs GL-8 panels spanning <~5 rad of k_hi*chi phase
    # each, and the k trapezoid ~6 points per pi/chi_max period of T^2
    # (the measured 2.56x lesson: the coarse counts GL-z rule and the
    # ssc-table k grid alias the oscillation — referee'd against the
    # dense scipy computation in tests/test_clusters.py).  k_hi = 0.25
    # captures the integral to ~3e-4 (the radial top-hat's 1/k^2 tail:
    # measured cumulative 99.85% by k=0.1, 99.98% by k=0.2).
    n_lin_eff = max(n_k_lin,
                    int(float(k_hi) * chi_top * 6.0 / np.pi) + 1)
    k_np, wk_np = _ssc_k_grid(3e-4, float(k_hi), n_k_log, n_lin_eff)
    if n_mu_bessel is None:
        # GL order ~0.7 x_max resolves the e^{ix mu} phase with margin
        # (convergence asserted by order-doubling in the tests).
        n_mu_bessel = int(min(max(512, 0.7 * float(k_hi) * chi_top),
                              8192))
    k_vec = jnp.asarray(k_np)
    p0 = linear.linear_power(cosmo, k_vec, 0.0, with_bao, grid)
    wk = jnp.asarray((2.0 / np.pi) * k_np**2 * wk_np)

    # nb(z) is smooth: build mass tables only at Chebyshev anchors per
    # bin and carry them onto the dense radial nodes barycentrically.
    n_cheb = max(6, min(10, n_z_quad))
    t_bins = []
    for i in range(nzb):
        z_lo, z_hi = float(edges_np[i]), float(edges_np[i + 1])
        dchi_fid = (float(fiducial_chi_np(z_hi))
                    - float(fiducial_chi_np(z_lo))) * 1.3
        panels = max(6, int(float(k_hi) * dchi_fid / 5.0) + 1)
        zr_np, wr_np = gl_composite(z_lo, z_hi, panels, 8)
        z_anch, w_bary = _cheb_nodes(z_lo, z_hi, n_cheb)
        nb_anch = jax.lax.map(
            lambda zz: shell_density(cosmo, halo_p, sel, zz, with_bao,
                                     grid)[1], jnp.asarray(z_anch))
        lag = _barycentric_rows(jnp.asarray(zr_np), z_anch, w_bary)
        nb_r = jnp.einsum("qj,ja->qa", lag, nb_anch, precision=_HP)
        zr = jnp.asarray(zr_np)
        chi_tr = background.transverse_comoving_distance(cosmo, zr,
                                                         grid.n_dist)
        chi_rr = background.comoving_distance(cosmo, zr, grid.n_dist)
        d_r = background.growth_factor(cosmo, zr, grid.n_growth)
        dchi_dz_r = C_OVER_H0 / background.ez(cosmo, zr)
        # The mask power 4 pi c_l carries the FULL footprint geometry
        # (counts = ∫ W chi^2 n dchi dOmega, no 1/A normalization), so
        # no omega_s here.
        f_r = (chi_tr**2 * dchi_dz_r * jnp.asarray(wr_np)
               * d_r)[:, None] * nb_r                    # (n_r, n_m)

        def _step(acc, qs):
            f_q, chi_q = qs
            jl_q = spherical_jl_table(chi_q * k_vec, lmax,
                                      n_mu_bessel)       # (nk, L+1)
            return acc + f_q[:, None, None] * jl_q[None, :, :], None

        t0 = jnp.zeros((n_m, len(k_np), lmax + 1))
        t_i, _ = jax.lax.scan(_step, t0, (f_r, chi_rr))
        t_bins.append(t_i)
    t_flat = jnp.concatenate(t_bins, axis=0)       # (nzb * n_m, nk, L+1)
    return jnp.einsum("xkl,ykl,k,l->xy", t_flat, t_flat, p0 * wk,
                      jnp.asarray(4.0 * np.pi * c_l), precision=_HP)


def counts_covariance(cosmo: CosmoParams, halo_p: HaloParams,
                      sel: ClusterSelection, z_edges, mask,
                      geometry: str = "flat", radial: str = "limber",
                      n_z_quad: int = 12, with_bao: bool = False,
                      grid: GridSpec = DEFAULT_GRID, **ssc_kw):
    """Poisson + sample-variance counts covariance, flattened over
    (z-bin major, mass-bin minor)."""
    _, omega_s = _counts_mask(mask, geometry)
    n = cluster_counts(cosmo, halo_p, sel, z_edges, omega_s, n_z_quad,
                       with_bao, grid)
    cov = counts_ssc_covariance(cosmo, halo_p, sel, z_edges, mask,
                                geometry, radial, n_z_quad, with_bao,
                                grid, **ssc_kw)
    return cov + jnp.diag(n.reshape(-1))


# ---------------------------------------------------------------------------
# Counts x two-point probes (SSC cross blocks)
# ---------------------------------------------------------------------------

def counts_probe_ssc_cl(cosmo: CosmoParams, halo_p: HaloParams, model,
                        sel: ClusterSelection, z_edges, win_a, win_b,
                        kind: str, ells_np, mask,
                        geometry: str = "flat", n_z_quad: int = 12,
                        with_bao: bool = False,
                        grid: GridSpec = DEFAULT_GRID,
                        local_counts: bool = True):
    """Cov(N_{i,a}, C_AB(l)) on the concrete multipole grid ``ells_np``:
    (n_z * n_m, n_ell).  ``kind``: the probe pair's response kind
    ("gg" | "gm" | "mm"); ``model`` the probe side's halo model (its
    g-leg bin in per-bin-HOD mode).  Responses are evaluated
    ANALYTICALLY at the traced Limber wavenumbers (l+1/2)/chi of the
    counts z nodes — no response table, no gathers — with the separable
    D^2(z)/D_piv^2 scaling of the 3x2pt SSC default."""
    from chomp_tpu.ssc import power_response_parts, sigma_b2_fn

    ells_np = np.asarray(ells_np, dtype=float)
    mask, omega_s = _counts_mask(mask, geometry)
    z_nodes, z_w = _zbin_gl(_zbin_key(z_edges), n_z_quad)
    nzb = z_nodes.shape[0]
    z_flat = jnp.asarray(z_nodes.reshape(-1))
    _, nb, chi_t, dchi_dz, d = _shells(cosmo, halo_p, sel, z_nodes,
                                       with_bao, grid)
    n_m = nb.shape[-1]
    chi = background.comoving_distance(cosmo, z_flat, grid.n_dist)
    s2 = sigma_b2_fn(cosmo, mask, geometry, with_bao, grid)(chi, d)
    wa = win_a.window_z(cosmo, z_flat, grid)
    wb = win_b.window_z(cosmo, z_flat, grid)
    # dchi = dchi/dz dz; windows are d(chi)-measure densities.
    w_flat = jnp.asarray(z_w.reshape(-1)) * dchi_dz
    kq = jnp.asarray(ells_np + 0.5)[None, :] / chi[:, None]  # (q, nl)
    pos, cnt = power_response_parts(cosmo, halo_p, model,
                                    kq.reshape(-1), with_bao, grid,
                                    local_counts)
    resp = (pos[kind] - cnt[kind]).reshape(kq.shape)
    piv = model.mass.growth
    node_w = (omega_s * chi_t**2 * wa * wb / chi**2 * s2 * w_flat
              * (d / piv) ** 2)
    fz = (node_w[:, None] * nb).reshape(nzb, n_z_quad, n_m)
    rz = resp.reshape(nzb, n_z_quad, len(ells_np))
    return jnp.einsum("iqa,iql->ial", fz, rz,
                      precision=_HP).reshape(nzb * n_m, len(ells_np))


def counts_3x2pt_ssc_cross(cosmo: CosmoParams, halo_p: HaloParams,
                           model, sel: ClusterSelection, z_edges,
                           lens_dists, src_dists, theta_edges_deg,
                           mask, geometry: str = "flat",
                           n_z_quad: int = 12, n_ell_cov: int = 96,
                           ell_lo: float = 1.0, ell_hi: float = 1.0e5,
                           ell_max: int = 2048, n_ell_tbl: int = 96,
                           with_bao: bool = False,
                           grid: GridSpec = DEFAULT_GRID,
                           local_counts: bool = True,
                           cmb_lensing=None):
    """The full counts x 3x2pt SSC cross matrix (n_z * n_m,
    n_probe * nb) over the tomographic_probes data-vector order
    (w_i, gt_ij, xip_jk, xim_jk [, wgk_i]), theta-binned with the same
    bin factors as the 3x2pt covariance builders.

    ``model``: single HaloModel or per-lens-bin list (each g leg binds
    its bin's model, matter legs use the shared mass sector).  B
    channels carry no response (zero block), so xi_pm blocks are pure
    E x E.  kappa_CMB legs ride the single-plane window as matter."""
    from chomp_tpu.covariance import (_log_ell_weights,
                                      bin_averaged_bessel,
                                      tomographic_probes)
    from chomp_tpu.projection import WindowConvergence, WindowGalaxy

    per_bin = isinstance(model, (list, tuple))
    n_lens, n_src = len(lens_dists), len(src_dists)
    wins_g = [WindowGalaxy(dist=dd) for dd in lens_dists]
    wins_k = [WindowConvergence(dist=dd) for dd in src_dists]
    cmb = None
    if cmb_lensing is not None and cmb_lensing is not False:
        from chomp_tpu.cmblens import as_cmb_spec

        cmb = as_cmb_spec(cmb_lensing)
    probes = tomographic_probes(n_lens, n_src, cmb_lensing=cmb is not None)
    edges = np.radians(np.asarray(theta_edges_deg, dtype=float))
    nb_th = len(edges) - 1
    # Probe-side estimator normalization near the footprint edge — the
    # same Omega_bin A2 / D_i factor the SSC auto blocks carry
    # (ssc._pair_norm_factor; = 1 for bare-omega inputs).
    from chomp_tpu.ssc import _pair_norm_factor

    f_norm = jnp.asarray(_pair_norm_factor(
        mask if not isinstance(mask, (int, float)) else float(mask),
        edges, geometry))

    if geometry == "curved":
        from chomp_tpu.curved import _curved_bin_factors, _curved_probe_code
        from chomp_tpu.grids import catmull_rom_weights_np

        ln_tbl = np.linspace(0.0, np.log(ell_max), n_ell_tbl)
        ells_np = np.exp(ln_tbl)
        ints = np.arange(ell_max + 1)
        pos_cr = np.log(np.maximum(ints, 1.0)) / (ln_tbl[1] - ln_tbl[0])
        w_int = catmull_rom_weights_np(n_ell_tbl, pos_cr)
        meas = (2.0 * ints + 1.0) / (4.0 * np.pi)
        meas[0] = 0.0

        def bin_op(mu, channels):
            code = _curved_probe_code(mu, channels)
            b = _curved_bin_factors(code, ell_max, edges)
            return jnp.asarray((b * meas[None, :]) @ w_int)
    else:
        ells_np, w_np = _log_ell_weights(n_ell_cov, ell_lo, ell_hi)
        meas = ells_np**2 * w_np / (2.0 * np.pi)

        def bin_op(mu, channels):
            b = bin_averaged_bessel(jnp.asarray(ells_np), edges, mu)
            return b * jnp.asarray(meas)[None, :]

    def leg(t):
        k_, i_ = t
        if k_ == "g":
            return wins_g[i_], "g", (model[i_] if per_bin else model)
        if k_ == "K":
            return cmb.window(), "m", (model[0] if per_bin else model)
        return wins_k[i_], "m", (model[0] if per_bin else model)

    kind_of = {0: "mm", 1: "gm", 2: "gg"}
    cols = []
    for name, mu, channels in probes:
        acc = None
        op = bin_op(mu, channels)
        for (ta, tb), sgn in channels:
            if "B" in (ta[0], tb[0]):
                continue
            wa_, ka_, ma_ = leg(ta)
            wb_, kb_, mb_ = leg(tb)
            kind = kind_of[(ka_ == "g") + (kb_ == "g")]
            m_side = ma_ if ka_ == "g" else mb_
            c_nl = counts_probe_ssc_cl(cosmo, halo_p, m_side, sel,
                                       z_edges, wa_, wb_, kind,
                                       ells_np, mask, geometry,
                                       n_z_quad, with_bao, grid,
                                       local_counts)
            blk = sgn * jnp.matmul(c_nl, op.T, precision=_HP)
            acc = blk if acc is None else acc + blk
        if acc is None:
            nz = len(np.asarray(z_edges)) - 1
            acc = jnp.zeros((nz * sel.n_bins, nb_th))
        cols.append(acc * f_norm[None, :])
    return jnp.concatenate(cols, axis=1)


# ---------------------------------------------------------------------------
# Clusters as a tracer sample: cluster clustering + cluster lensing
# ---------------------------------------------------------------------------

@pytree_dataclass
class SelectionHOD:
    """The selected-cluster sample expressed in the HOD protocol —
    CENTRAL-ONLY Bernoulli occupation equal to the lognormal selection
    probability, frozen at one effective redshift:

        <N>(M)      = Phi_a(M; z_eff)  in [0, 1],
        <N(N-1)>(M) = 0                (a halo hosts at most one
                                        cluster of itself).

    Plugging this into halo.build_halo_model makes the ENTIRE galaxy
    machinery compute cluster statistics: n_g = the selected comoving
    cluster density (== shell_density), power_gm = the cluster-matter
    cross spectrum whose projection is the stacked weak-lensing
    gamma_t — the mass-calibration observable of cluster cosmology —
    and power_gg = cluster clustering (1-halo identically zero; halo
    exclusion not modeled, as everywhere in this framework).  Pair it
    with HaloParams.mass_fn = 1 (Tinker08/10) for the modern counts +
    lensing stack.  All fields traced (selection nuisance
    differentiable).  Smooth in lnM — no quadrature breakpoints."""

    ln_m_obs_lo: jnp.ndarray
    ln_m_obs_hi: jnp.ndarray
    sigma_lnm: jnp.ndarray
    lnm_bias: jnp.ndarray

    def central_moment(self, m):
        mu = jnp.log(m) + self.lnm_bias
        s = jnp.sqrt(2.0) * self.sigma_lnm
        return 0.5 * (special.erfc((self.ln_m_obs_lo - mu) / s)
                      - special.erfc((self.ln_m_obs_hi - mu) / s))

    def satellite_moment(self, m):
        return jnp.zeros_like(jnp.asarray(m))

    def first_moment(self, m):
        return self.central_moment(m)

    def second_moment(self, m):
        return jnp.zeros_like(jnp.asarray(m))

    def nth_moment(self, m, n: int):
        if n == 1:
            return self.first_moment(m)
        return jnp.zeros_like(jnp.asarray(m))

    def breakpoints(self):
        return ()


def selection_hod(sel: ClusterSelection, bin_index: int, z_eff):
    """SelectionHOD for proxy bin ``bin_index`` of ``sel`` with the
    z-evolving scatter/bias frozen at ``z_eff`` (use the counts bin's
    mean redshift; the halo model itself is a fixed-epoch object, so
    this matches the pipelines' separable convention — exact-z anchor
    routes rebuild the model per anchor but keep this frozen selection,
    a second-order effect for sigma_lnm_z ~ 0.1)."""
    lz = jnp.log1p(jnp.asarray(z_eff))
    return SelectionHOD(
        ln_m_obs_lo=sel.ln_m_obs_edges[bin_index],
        ln_m_obs_hi=sel.ln_m_obs_edges[bin_index + 1],
        sigma_lnm=sel.sigma_lnm + sel.sigma_lnm_z * lz,
        lnm_bias=sel.lnm_bias + sel.lnm_bias_z * lz)


def cluster_dndz_table(cosmo: CosmoParams, halo_p: HaloParams,
                       sel: ClusterSelection, bin_index: int, z_lo,
                       z_hi, n_z: int = 33, with_bao: bool = False,
                       grid: GridSpec = DEFAULT_GRID):
    """The selected clusters' redshift distribution as a
    projection.DNdzInterpolation: p(z) ∝ chi_t^2 (dchi/dz) n_a(z)
    inside [z_lo, z_hi] — the lens-sample input for cluster-lensing /
    cluster-clustering pipelines (make_pipeline with a SelectionHOD).
    Evaluated CONCRETELY at the call's cosmology (dN/dz shapes are
    conventionally frozen at the fiducial; pass the table through
    nuisance photo-z shifts if needed)."""
    from chomp_tpu.projection import DNdzInterpolation

    zg = np.linspace(float(z_lo), float(z_hi), n_z)
    n, _, chi_t, dchi_dz, _ = _shells(cosmo, halo_p, sel,
                                      zg.reshape(1, -1), with_bao, grid)
    p = np.asarray(chi_t**2 * dchi_dz) * np.asarray(n[:, bin_index])
    return DNdzInterpolation(z_min=jnp.asarray(float(z_lo)),
                             z_max=jnp.asarray(float(z_hi)),
                             z_array=jnp.asarray(zg),
                             n_array=jnp.asarray(p / p.max()))


def joint_counts_3x2pt_covariance(cov_nn, cov_nx, cov_dd,
                                  psd_guard: str | None = None):
    """Stack the joint [[NN, NX], [NX^T, DD]] covariance from the
    counts block, the cross block, and any 3x2pt covariance (the
    tomographic builders' output — Gaussian + cNG + SSC as
    configured).  Shapes must agree: (n_N, n_N), (n_N, n_D),
    (n_D, n_D).  ``psd_guard="clip"`` projects the assembled matrix
    onto the PSD cone (covariance.psd_clip) — the mixed-quadrature
    off-diagonal blocks can push tiny eigenvalues negative."""
    from chomp_tpu.covariance import _apply_psd_guard

    top = jnp.concatenate([cov_nn, cov_nx], axis=1)
    bot = jnp.concatenate([cov_nx.T, cov_dd], axis=1)
    return _apply_psd_guard(jnp.concatenate([top, bot], axis=0),
                            psd_guard)
