"""Curved-sky survey-mask Gaussian covariance for w(theta) / gamma_t.

Extends the flat-sky masked covariance (chomp_tpu.mask, SURVEY.md §2
row 13 "for a survey area" — depth beyond chomp, which assumed a
uniform flat Omega_s everywhere) to the SPHERE: wide footprints
(cap radius tens of degrees, fsky up to ~0.5) where the flat-sky
coupling matrix and the flat annulus geometry are no longer valid.

Estimator and derivation.  For the pair-normalized estimator over
annulus bins Theta_i on the sphere,

    w_hat_i = F_i / D_i,
    F_i = ∫∫ W(x)W(y) f(x)f(y) Theta_i(x·y) dΩ_x dΩ_y,
    D_i = ∫∫ W(x)W(y) Theta_i(x·y) = 2π ∫_bin R̄(θ) sinθ dθ,

expanding Theta_i(μ) = Σ_ℓ ((2ℓ+1)/2) t^i_ℓ P_ℓ(μ) with
t^i_ℓ = ∫_bin P_ℓ dμ and using the addition theorem gives
F_i = 2π Σ_ℓ t^i_ℓ P̃_ℓ with P̃_ℓ = Σ_m |ã_ℓm|² the pseudo-power of
the masked field.  The narrow-kernel (NKA) Gaussian covariance of
pseudo-powers is the standard mode-coupling result

    Cov[P̃_ℓ, P̃_ℓ'] ≈ 2 Ct_ℓ Ct_ℓ' (2ℓ+1)(2ℓ'+1) Ξ_{ℓℓ'},
    Ξ_{ℓℓ'} = (1/4π) Σ_L (2L+1) C^{W²}_L (3j(ℓ ℓ' L; 0 0 0))²,

with C^{W²}_L the angular power of the W² map.  Spin-2 (gamma_t) legs
replace the scalar 3j by the spin families: 3j(ℓℓ'L;2,-2,0)·3j(000)
for a single spin-2 leg pair (the w x gamma_t block) and the
even-parity (E-mode) square ½(1+(-1)^{ℓ+ℓ'+L})(3j(2,-2,0))² for the
gamma_t auto block — the iNKA kernels whose flat-sky limits are the
K₂ = <|W̃₂|²cos2φ> and ½(K₀+K₄) = <|W̃₂|²cos²2φ> kernels of
chomp_tpu.covariance.gaussian_block(mask=...) (tested against it on a
small cap, which is in turn MC-validated).

No 3j recursions: every coupling matrix is a Gauss-Legendre matmul.
The identity ∫ d^ℓ_{m1 n1} d^ℓ'_{m2 n2} d^L_{m3 n3} dμ =
2·3j(m-row)·3j(n-row) collapses the L sums against
ξ_{W²}(μ) = Σ_L ((2L+1)/4π) C^{W²}_L P_L(μ) — the correlation
function of the W² map, known in closed form from the mask pair
function — into single quadratures over products of Wigner-d
functions:

    Xi0_{ℓℓ'} = ½ ∫ P_ℓ P_ℓ'               ξ_{W²}(μ) dμ
    Xi2_{ℓℓ'} = ½ ∫ d^ℓ_{20} d^ℓ'_{20}     ξ_{W²}(μ) dμ
    XiP_{ℓℓ'} = ¼ ∫ (d^ℓ_{22} d^ℓ'_{22} + d^ℓ_{2-2} d^ℓ'_{2-2}) ξ dμ

(the parity projection is redundant for Xi2: 3j(000) vanishes for odd
ℓ+ℓ'+L).  Uniform full sky: ξ_{W²} ≡ 1 and d-orthogonality gives
Ξ = δ_{ℓℓ'}/(2ℓ+1) exactly; the high-ℓ delta limit follows the exact
row sum Σ_ℓ' (2ℓ'+1) Ξ_{ℓℓ'} = ξ_{W²}(1) = A₄/4π, i.e. the fsky-level
prefactor A₄ A_i A_j / (D_i D_j) with the exact pair counts — the
same structure as the flat module, so curved_gaussian_block mirrors
gaussian_block: delta-limit everywhere + a dense coupled correction
for ℓ ≤ ell_split.  The pure noise x noise closure
2 N² D₂_ovl / (D_i D_j) is pair-count exact on any geometry and is
reused unchanged.

Bin factors are closed-form: t^i_ℓ = [P_{ℓ+1} - P_{ℓ-1}]/(2ℓ+1) at
the bin endpoints (spin-0) and, for the curved J2 analog
d^ℓ_{20} = P²_ℓ/√((ℓ-1)ℓ(ℓ+1)(ℓ+2)) (gamma_t(θ) =
Σ_ℓ ((2ℓ+1)/4π) C^{gE}_ℓ d^ℓ_{20}(cosθ), flat limit J₂(ℓθ)),

    ∫_a^b d^ℓ_{20} dμ = [ℓ(P_{ℓ-1} - μ P_ℓ) + 2 μ P_ℓ
                         - 2 (P_{ℓ+1} - P_{ℓ-1})/(2ℓ+1)]_a^b
                        / √((ℓ-1)ℓ(ℓ+1)(ℓ+2))

from P²_ℓ = (1-μ²) P_ℓ'' and Legendre's equation.

Masks: SphericalCapMask (analytic reference), ProfileCurvedMask
(azimuthally symmetric radial profiles), PixelSphereMask (ANY
footprint from an iso-latitude pixel weight map — ring-pair FFT pair
counts with an exact discreteness-cancelling ratio estimator),
UniformSphereMask (degenerate full sky).

All geometry (masks, Ξ, bin factors) is static numpy built once and
cached; the cosmology-dependent C_ℓ vectors contract against them in
dense HIGHEST-precision matmuls — the TPU-first pattern of the rest
of the covariance stack (zero gathers in the traced graph).

This module also provides curved-sky OBSERVABLE predictions
(curved_wtheta_fft / curved_wtheta_from_anchors /
curved_lattice_operator; make_pipeline(geometry="curved")): the exact
multipole sums w(θ) = Σ (2ℓ+1)/4π C_ℓ P_ℓ and
γt = Σ (2ℓ+1)/4π C^{gE}_ℓ d^ℓ_{20} fused offline into one static
operator against the lattice convolution — same runtime cost as the
flat FFTLog route, exact sphere geometry.  The curved sum also
referees the flat-transform convention: it matches the ν-aligned flat
transform (ell_offset=0) to ≤1e-4 at sub-degree θ, pinning the flat
default's C(ℓ+½)+J(ℓθ) pairing as a few×1e-3 half-step artifact
(tests/test_curved.py::test_curved_flat_limit_and_convention).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SphericalCapMask",
    "ProfileCurvedMask",
    "PixelSphereMask",
    "UniformSphereMask",
    "legendre_bin_factors",
    "legendre_bin_factors_spin2",
    "wigner_bin_factors",
    "curved_pair_normalization",
    "curved_gaussian_block",
    "curved_gaussian_covariance",
    "curved_joint_wtheta_gammat_covariance",
    "curved_joint_3x2pt_covariance",
    "curved_tomographic_3x2pt_covariance",
    "curved_nongaussian_covariance",
    "curved_bmode_null",
    "curved_lattice_operator",
    "curved_wtheta_fft",
    "curved_wtheta_from_anchors",
]


# ---------------------------------------------------------------------------
# Wigner-d evaluation (fixed (m, n), all ℓ, vectorized over μ nodes)
# ---------------------------------------------------------------------------

def _wigner_d_matrix(m: int, n: int, lmax: int, mu):
    """d^ℓ_{mn}(μ) for ℓ = 0..lmax on nodes ``mu`` — (lmax+1, n_mu).

    Three-term upward recursion in ℓ (stable for the small |m|, |n| ≤ 2
    used here; float64):

      ℓ √((ℓ+1)²-m²) √((ℓ+1)²-n²) d^{ℓ+1}
        = (2ℓ+1) [ℓ(ℓ+1)μ - mn] d^ℓ - (ℓ+1) √(ℓ²-m²) √(ℓ²-n²) d^{ℓ-1}

    seeded at ℓ = max(|m|,|n|) with the closed ℓ=2 forms; rows below
    the seed are zero.  Validated against sympy's exact Rotation.d and
    the orthogonality ∫ d d dμ = 2δ/(2ℓ+1) (tests/test_curved.py).
    """
    mu = np.asarray(mu, dtype=float)
    if (m, n) == (0, 0):
        return _legendre_all(lmax, mu)     # a(ℓ=0) = 0 in the general
    out = np.zeros((lmax + 1, mu.size))    # recursion; Bonnet instead
    lmin = max(abs(m), abs(n))
    if lmax < lmin:
        return out
    if (m, n) == (2, 0):
        seed = np.sqrt(6.0) / 4.0 * (1.0 - mu**2)
    elif (m, n) == (2, 2):
        seed = (1.0 + mu) ** 2 / 4.0
    elif (m, n) == (2, -2):
        seed = (1.0 - mu) ** 2 / 4.0
    else:  # pragma: no cover - only the four cases above are used
        raise NotImplementedError((m, n))
    out[lmin] = seed
    prev = np.zeros_like(mu)
    for ell_i in range(lmin, lmax):
        # float coefficients: (ℓ²-m²)(ℓ²-n²) overflows int64 at
        # ℓ ≳ 55000 (object-dtype np.sqrt error), and ℓ reaches 1e5+
        # in the curved prediction operators.
        ell = float(ell_i)
        a = ell * np.sqrt(((ell + 1.0) ** 2 - m * m)
                          * ((ell + 1.0) ** 2 - n * n))
        b = (2 * ell + 1.0) * (ell * (ell + 1.0) * mu - m * n)
        c = (ell + 1.0) * np.sqrt(max(ell * ell - m * m, 0.0)
                                  * max(ell * ell - n * n, 0.0))
        nxt = (b * out[ell_i] - c * prev) / a
        prev = out[ell_i]
        out[ell_i + 1] = nxt
    return out


def _legendre_all(lmax: int, mu):
    """P_ℓ(μ) for ℓ = 0..lmax — (lmax+1, n_mu) Bonnet recursion."""
    mu = np.asarray(mu, dtype=float)
    p = np.zeros((lmax + 1, mu.size))
    p[0] = 1.0
    if lmax >= 1:
        p[1] = mu
    for ell in range(1, lmax):
        p[ell + 1] = ((2 * ell + 1) * mu * p[ell] - ell * p[ell - 1]) \
            / (ell + 1)
    return p


# ---------------------------------------------------------------------------
# Closed-form bin factors
# ---------------------------------------------------------------------------

def _legendre_endpoints(lmax: int, mu):
    """P_ℓ(μ) at a few endpoint values, ℓ = 0..lmax+1 — (lmax+2, n)."""
    return _legendre_all(lmax + 1, mu)


def legendre_bin_factors(lmax: int, theta_edges_rad):
    """Bin-averaged Legendre P̄^i_ℓ = ∫_bin P_ℓ dμ / Δμ_i — (nb, lmax+1).

    Closed form ∫_a^b P_ℓ dμ = [P_{ℓ+1} - P_{ℓ-1}]_a^b / (2ℓ+1)
    (ℓ = 0 row: 1).  The curved analog of covariance.bin_averaged_j0;
    flat limit P̄_ℓ(bin) → J̄₀ for θ ≪ 1 (tested)."""
    edges = np.asarray(theta_edges_rad, dtype=float)
    mu_e = np.cos(edges)                       # decreasing in θ
    p = _legendre_endpoints(lmax, mu_e)        # (lmax+2, ne)
    ell = np.arange(lmax + 1)
    # ∫ P_ℓ dμ antiderivative at each edge: (lmax+1, ne)
    anti = np.empty((lmax + 1, mu_e.size))
    anti[0] = mu_e
    anti[1:] = (p[2:lmax + 2] - p[0:lmax]) / (2.0 * ell[1:, None] + 1.0)
    dmu = mu_e[:-1] - mu_e[1:]                 # Δμ_i > 0
    val = anti[:, :-1] - anti[:, 1:]           # ∫_{μ_hi}^{μ_lo} = bin
    return (val / dmu[None, :]).T              # (nb, lmax+1)


def legendre_bin_factors_spin2(lmax: int, theta_edges_rad):
    """Bin-averaged tangential kernel d̄^i_ℓ = ∫_bin d^ℓ_{20} dμ / Δμ_i
    — (nb, lmax+1), rows ℓ < 2 zero.  Closed form (module docstring);
    the curved analog of covariance.bin_averaged_j2 (flat limit J̄₂,
    tested)."""
    edges = np.asarray(theta_edges_rad, dtype=float)
    mu_e = np.cos(edges)
    p = _legendre_endpoints(lmax, mu_e)        # rows 0..lmax+1
    ell = np.arange(2, lmax + 1, dtype=float)
    pl = p[2:lmax + 1]                         # P_ℓ
    plm1 = p[1:lmax]                           # P_{ℓ-1}
    plp1 = p[3:lmax + 2]                       # P_{ℓ+1}
    # antiderivative of P²_ℓ: (1-μ²)P'_ℓ + 2μP_ℓ - 2∫P_ℓ,
    # with (1-μ²)P'_ℓ = ℓ(P_{ℓ-1} - μ P_ℓ).
    anti = (ell[:, None] * (plm1 - mu_e[None, :] * pl)
            + 2.0 * mu_e[None, :] * pl
            - 2.0 * (plp1 - plm1) / (2.0 * ell[:, None] + 1.0))
    norm = np.sqrt((ell - 1.0) * ell * (ell + 1.0) * (ell + 2.0))
    anti = anti / norm[:, None]
    dmu = mu_e[:-1] - mu_e[1:]
    val = anti[:, :-1] - anti[:, 1:]
    out = np.zeros((mu_e.size - 1, lmax + 1))
    out[:, 2:] = (val / dmu[None, :]).T
    return out


@lru_cache(maxsize=32)
def _wigner_bin_factors_cached(m: int, n: int, lmax: int, edges_key,
                               nodes_per_osc: float = 3.0):
    """Bin-averaged Wigner-d factors t̄^i_ℓ = ∫_bin d^ℓ_{mn} dμ / Δμ_i
    — (nb, lmax+1) — for the ξ_+/ξ_- families (m, n) = (2, ±2), where
    no convenient endpoint closed form exists (unlike P_ℓ / d^ℓ_{20}
    above).  Per-bin Gauss-Legendre quadrature in μ, accumulated DURING
    the ℓ recursion in chunks so memory stays O(total nodes), not
    O(lmax × nodes): d^ℓ_{mn}(μ) is a degree-ℓ polynomial oscillating
    with period ~2π/ℓ in θ, so the node count scales with
    ℓ_max Δθ_bin.  Validated against the closed-form (0,0)/(2,0)
    factors and the flat J0/J4 limits (tests/test_curved.py)."""
    edges = np.asarray(edges_key, dtype=float)
    nb = len(edges) - 1
    # GL nodes per bin, scaled to the top-ℓ oscillation count.
    nodes, wts, bins = [], [], []
    for b in range(nb):
        dth = edges[b + 1] - edges[b]
        n_nodes = int(min(8192, max(48, nodes_per_osc * lmax * dth
                                    / np.pi)))
        t, wq = np.polynomial.legendre.leggauss(n_nodes)
        th = edges[b] + 0.5 * dth * (t + 1.0)
        # ∫ dμ = ∫ sinθ dθ; normalize by Δμ_b.
        dmu = np.cos(edges[b]) - np.cos(edges[b + 1])
        nodes.append(np.cos(th))
        wts.append(0.5 * dth * wq * np.sin(th) / dmu)
        bins.append(np.full(n_nodes, b))
    mu = np.concatenate(nodes)
    w_all = np.concatenate(wts)
    bin_id = np.concatenate(bins)
    # Recursion keeping two rows; at each ℓ one (nodes,) @ (nodes, nb)
    # contraction accumulates every bin's weighted sum.
    sel = np.zeros((mu.size, nb))
    sel[np.arange(mu.size), bin_id] = 1.0
    selw = sel * w_all[:, None]                   # (nodes, nb)
    out = np.zeros((nb, lmax + 1))
    lmin = max(abs(m), abs(n))
    if lmax < lmin:
        return out
    if (m, n) == (2, 2):
        cur = (1.0 + mu) ** 2 / 4.0
    elif (m, n) == (2, -2):
        cur = (1.0 - mu) ** 2 / 4.0
    elif (m, n) == (2, 0):
        cur = np.sqrt(6.0) / 4.0 * (1.0 - mu**2)
    elif (m, n) == (0, 0):
        cur = np.ones_like(mu)
        out[:, 0] = selw.sum(axis=0)
        if lmax >= 1:
            cur, prev = mu.copy(), cur
            out[:, 1] = mu @ selw
            for ell_i in range(1, lmax):
                nxt = ((2 * ell_i + 1) * mu * cur - ell_i * prev) \
                    / (ell_i + 1)
                prev, cur = cur, nxt
                out[:, ell_i + 1] = cur @ selw
        return out
    else:  # pragma: no cover
        raise NotImplementedError((m, n))
    prev = np.zeros_like(mu)
    out[:, lmin] = cur @ selw
    for ell_i in range(lmin, lmax):
        ell = float(ell_i)
        a = ell * np.sqrt(((ell + 1.0) ** 2 - m * m)
                          * ((ell + 1.0) ** 2 - n * n))
        b_ = (2 * ell + 1.0) * (ell * (ell + 1.0) * mu - m * n)
        c = (ell + 1.0) * np.sqrt(max(ell * ell - m * m, 0.0)
                                  * max(ell * ell - n * n, 0.0))
        nxt = (b_ * cur - c * prev) / a
        prev, cur = cur, nxt
        out[:, ell_i + 1] = cur @ selw
    return out


def wigner_bin_factors(m: int, n: int, lmax: int, theta_edges_rad):
    """Public wrapper over the cached quadrature bin factors."""
    key = tuple(np.asarray(theta_edges_rad, dtype=float).tolist())
    return _wigner_bin_factors_cached(m, n, lmax, key)


# ---------------------------------------------------------------------------
# Curved masks
# ---------------------------------------------------------------------------

def _cap_overlap(alpha: float, theta):
    """Solid angle of the overlap of two spherical caps of radius
    ``alpha`` whose centers are separated by ``theta`` (vectorized):
    Ω(θ) = 2 ∫₀^α φ_half(u) sin u du with φ_half the azimuthal
    half-width of cap 2 at colatitude u from cap 1's center.  Exact to
    quadrature; Ω(0) = 2π(1-cos α), Ω(θ ≥ 2α) = 0."""
    theta = np.atleast_1d(np.asarray(theta, dtype=float))
    n_u = 512
    # Gauss-Legendre in u over [0, alpha]
    x, wq = np.polynomial.legendre.leggauss(n_u)
    u = 0.5 * alpha * (x + 1.0)
    wu = 0.5 * alpha * wq
    cu, su = np.cos(u), np.sin(u)
    ct, st = np.cos(theta), np.sin(theta)
    with np.errstate(divide="ignore", invalid="ignore"):
        carg = (np.cos(alpha) - cu[None, :] * ct[:, None]) \
            / np.maximum(su[None, :] * st[:, None], 1e-300)
    phi_half = np.arccos(np.clip(carg, -1.0, 1.0))
    # θ = 0 column: φ_half = π wherever u ≤ α (carg -> -inf clipped).
    omega = 2.0 * np.sum(phi_half * (su * wu)[None, :], axis=1)
    return np.where(theta >= 2.0 * alpha, 0.0, omega)


@dataclasses.dataclass(frozen=True)
class SphericalCapMask:
    """Binary polar cap of angular radius ``radius_rad`` — the curved
    analog of mask.DiscMask (every ingredient from the exact spherical
    cap-overlap integral).  Small radius reproduces the flat disc
    treatment (tested)."""

    radius_rad: float

    @property
    def area2(self) -> float:
        """A₂ = ∫ W² dΩ (binary: the cap solid angle)."""
        return float(2.0 * np.pi * (1.0 - np.cos(self.radius_rad)))

    @property
    def area4(self) -> float:
        return self.area2

    def pair_function(self, theta):
        """R̄(θ) = ∫ W(x̂)W(ŷ) azimuth-avg at separation θ: the
        two-cap overlap solid angle."""
        return _cap_overlap(self.radius_rad, theta)

    pair_function2 = pair_function      # binary: W² = W

    def xi_w2(self, mu):
        """ξ_{W²}(μ) = R̄₂(θ)/(4π), θ = arccos μ — the correlation
        function of the W² map entering every coupling kernel."""
        theta = np.arccos(np.clip(np.asarray(mu, dtype=float), -1.0, 1.0))
        return _cap_overlap(self.radius_rad, theta) / (4.0 * np.pi)

    @property
    def coupling_ell(self) -> float:
        """Characteristic multipole width of the coupling kernel."""
        return np.pi / self.radius_rad


@dataclasses.dataclass(frozen=True)
class UniformSphereMask:
    """W ≡ 1 over the full sphere — the degenerate no-mask case;
    curved_gaussian_block then reduces to the exact full-sky
    Σ_ℓ (2ℓ+1) P̄_i P̄_j 2Ct²/(16π²) formula (tested)."""

    @property
    def area2(self) -> float:
        return float(4.0 * np.pi)

    @property
    def area4(self) -> float:
        return float(4.0 * np.pi)

    def pair_function(self, theta):
        return np.full_like(np.atleast_1d(np.asarray(theta, float)),
                            4.0 * np.pi)

    pair_function2 = pair_function

    def xi_w2(self, mu):
        return np.ones_like(np.atleast_1d(np.asarray(mu, float)))

    @property
    def coupling_ell(self) -> float:
        return 0.0


class ProfileCurvedMask:
    """Azimuthally symmetric curved mask from a radial weight profile
    W(θ) in [0, 1] given on ``theta_nodes_rad`` (linearly interpolated,
    0 beyond the last node) — tapered caps, ring footprints, etc.

    Ingredients via the Legendre route: g_L = ∫ V P_L dμ for
    V ∈ {W, W²} by Gauss-Legendre quadrature, then
    ξ_V(μ) = ¼ Σ_L (2L+1) g_L² P_L(μ) and R̄ = 4π ξ.  ``lmax_mask``
    bounds the mask band-limit (profiles with a hard edge converge in
    the L² sense; the Parseval row-sum identity is restored exactly by
    rescaling ξ_{W²}(1) to ⟨W⁴⟩ — same spirit as the flat PixelMask's
    count-corrected shells)."""

    def __init__(self, theta_nodes_rad, w_values, lmax_mask: int = 512):
        th = np.asarray(theta_nodes_rad, dtype=float)
        wv = np.asarray(w_values, dtype=float)
        if th.ndim != 1 or th.shape != wv.shape:
            raise ValueError("theta_nodes_rad / w_values shape mismatch")
        self._theta = th
        self._w = wv
        x, wq = np.polynomial.legendre.leggauss(max(4 * lmax_mask, 2048))
        theta_q = np.arccos(x)                  # μ-quadrature nodes
        wprof = np.interp(theta_q, th, wv, left=wv[0], right=0.0)
        p = _legendre_all(lmax_mask, x)
        self._g_w = p @ (wq * wprof)            # ∫ W P_L dμ
        self._g_w2 = p @ (wq * wprof**2)
        self._g_w4 = float(np.sum(wq * wprof**4))
        self.area2 = float(2.0 * np.pi * np.sum(wq * wprof**2))
        self.area4 = float(2.0 * np.pi * self._g_w4)
        self._lmax_mask = lmax_mask
        twol = 2.0 * np.arange(lmax_mask + 1) + 1.0
        self._xi_w_c = 0.25 * twol * self._g_w**2
        self._xi_w2_c = 0.25 * twol * self._g_w2**2
        # Parseval repair for the truncated series (hard-edge Gibbs):
        # ξ_{W²}(1) must equal <W⁴> = A₄/4π exactly for the delta-limit
        # row sum to hold.
        xi1 = float(np.sum(self._xi_w2_c))
        target = self.area4 / (4.0 * np.pi)
        self._xi_w2_scale = target / xi1 if xi1 > 0 else 1.0
        self._hash = hash((th.tobytes(), wv.tobytes(), lmax_mask))

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, ProfileCurvedMask)
                and self._hash == other._hash)

    def _xi(self, mu, coeff):
        mu = np.clip(np.atleast_1d(np.asarray(mu, float)), -1.0, 1.0)
        p = _legendre_all(self._lmax_mask, mu)
        return coeff @ p

    def xi_w2(self, mu):
        return self._xi_w2_scale * self._xi(mu, self._xi_w2_c)

    def pair_function(self, theta):
        mu = np.cos(np.atleast_1d(np.asarray(theta, float)))
        return 4.0 * np.pi * self._xi(mu, self._xi_w_c)

    def pair_function2(self, theta):
        mu = np.cos(np.atleast_1d(np.asarray(theta, float)))
        return 4.0 * np.pi * self.xi_w2(mu)

    @property
    def coupling_ell(self) -> float:
        support = self._theta[self._w > 1e-12]
        width = float(support.max()) if support.size else np.pi
        return np.pi / max(width, 1e-6)


class PixelSphereMask:
    """General curved-sky footprint from a pixel weight map W in [0, 1]
    on an iso-latitude grid — the sphere analog of mask.PixelMask
    (arbitrary shapes, holes, weights; NO azimuthal symmetry required,
    unlike SphericalCapMask / ProfileCurvedMask).

    Grid convention: ``w_map[r, c]`` lives at colatitude
    θ_r = (r+½)π/n_ring, azimuth φ_c = 2πc/n_phi, pixel solid angle
    Ω_r = sinθ_r Δθ Δφ.  Every covariance ingredient reduces to the
    azimuthally averaged pair functions, computed as exact pair sums
    over the grid,

        P_V[bin] = Σ_{pq} V_p V_q Ω_p Ω_q [θ_pq ∈ bin],  V ∈ {W, W²},

    ring-pair by ring-pair with ONE circular FFT cross-correlation in
    relative azimuth per ring (iso-latitude ⇒ the separation depends
    on Δφ only; O(n_ring² n_phi) total, seconds at 256×512).  The
    continuum pair function is the RATIO estimator

        R̄_V(θ) = 4π · P_V[bin] / P_1[bin]

    with P_1 the same histogram for W ≡ 1 over the FULL sphere (closed
    form per (ring, ring′, Δφ): Ω_r Ω_r′ per azimuth offset — no FFT):
    pixelization discreteness cancels exactly, so uniform weights
    reproduce UniformSphereMask to machine precision — the curved
    analog of the flat PixelMask's count-corrected shells.  The θ = 0
    anchors are exact (R̄(0) = A₂, R̄₂(0) = A₄, so ξ_{W²}(1) = A₄/4π
    and the delta-limit Parseval row sum holds by construction).

    Resolution bounds the representable mask band-limit at
    ~min(n_ring, n_phi/2); sub-pixel features are smoothed.  Hashes by
    map content so the Ξ-matrix cache works."""

    def __init__(self, w_map, n_sep_bins: int | None = None):
        w = np.asarray(w_map, dtype=float)
        if w.ndim != 2:
            raise ValueError(
                "PixelSphereMask needs a 2-D (n_ring, n_phi) weight map")
        n_ring, n_phi = w.shape
        if n_sep_bins is None:
            # Separation bins ~2 pixel spacings: finer bins sample the
            # sphere non-uniformly within a bin (same-ring neighbors
            # dominate sub-pixel separations near the poles) and bias
            # the ratio estimator catastrophically — measured ≲3%
            # against the analytic cap at n_ring/2, ±30% at 2·n_ring.
            n_sep_bins = max(64, n_ring // 2)
        dth = np.pi / n_ring
        dph = 2.0 * np.pi / n_phi
        theta_r = (np.arange(n_ring) + 0.5) * dth
        omega_r = np.sin(theta_r) * dth * dph
        self.n_ring, self.n_phi = n_ring, n_phi
        self.area2 = float(np.sum(w**2 * omega_r[:, None]))
        self.area4 = float(np.sum(w**4 * omega_r[:, None]))
        if self.area2 <= 0.0:
            raise ValueError("PixelSphereMask: empty weight map")
        ct, st = np.cos(theta_r), np.sin(theta_r)
        cdphi = np.cos(np.arange(n_phi) * dph)
        f_w = np.fft.fft(w * omega_r[:, None], axis=1)
        f_w2 = np.fft.fft(w**2 * omega_r[:, None], axis=1)
        h_w = np.zeros(n_sep_bins)
        h_w2 = np.zeros(n_sep_bins)
        h_1 = np.zeros(n_sep_bins)
        scale = n_sep_bins / np.pi
        for r in range(n_ring):
            mu_sep = np.clip(ct[r] * ct[:, None]
                             + st[r] * st[:, None] * cdphi[None, :],
                             -1.0, 1.0)
            idx = np.minimum((np.arccos(mu_sep) * scale).astype(int),
                             n_sep_bins - 1).ravel()
            # Circular correlation over relative azimuth (k ↔ n-k both
            # carry the same cos Δφ, so the binning is convention-free).
            c_w = np.real(np.fft.ifft(f_w[r][None, :] * np.conj(f_w),
                                      axis=1)).ravel()
            c_w2 = np.real(np.fft.ifft(f_w2[r][None, :] * np.conj(f_w2),
                                       axis=1)).ravel()
            # n_phi ordered pixel pairs share each azimuth offset k.
            c_1 = np.broadcast_to(
                (n_phi * omega_r[r] * omega_r)[:, None],
                (n_ring, n_phi)).ravel()
            h_w += np.bincount(idx, weights=c_w, minlength=n_sep_bins)
            h_w2 += np.bincount(idx, weights=c_w2, minlength=n_sep_bins)
            h_1 += np.bincount(idx, weights=c_1, minlength=n_sep_bins)
        centers = (np.arange(n_sep_bins) + 0.5) * np.pi / n_sep_bins
        with np.errstate(invalid="ignore", divide="ignore"):
            r_w = np.where(h_1 > 0, 4.0 * np.pi * h_w / h_1, 0.0)
            r_w2 = np.where(h_1 > 0, 4.0 * np.pi * h_w2 / h_1, 0.0)
        # Exact θ = 0 anchors (continuum limits; the first-bin ratios
        # land within O(pixel) of these already).
        self._nodes = np.concatenate(([0.0], centers, [np.pi]))
        self._r_w = np.concatenate(([self.area2], r_w, [r_w[-1]]))
        self._r_w2 = np.concatenate(([self.area4], r_w2, [r_w2[-1]]))
        self._hash = hash((w.tobytes(), n_sep_bins))

    @classmethod
    def from_healpix(cls, hp_map, n_ring: int | None = None,
                     n_sep_bins: int | None = None,
                     order: str = "RING"):
        """Build from a HEALPix weight map (the standard survey-mask
        format; chomp_tpu.healpix — no healpy needed).  ``order``:
        "RING" (default) or "NESTED" (reordered on ingestion).
        The map is resampled onto the iso-latitude grid by pixel-center
        lookup at ``n_ring`` rings (default ~4·nside capped at 512 —
        at the cap, masks finer than ~0.35° pixels are smoothed)."""
        from chomp_tpu.healpix import ang2pix_ring
        from chomp_tpu.healpix import npix as hp_npix

        m = np.asarray(hp_map, dtype=float)
        nside = int(round(np.sqrt(m.size / 12.0)))
        if m.ndim != 1 or hp_npix(nside) != m.size:
            raise ValueError(
                f"from_healpix: size {m.size} is not 12*nside^2")
        if order.upper() in ("NESTED", "NEST"):
            from chomp_tpu.healpix import reorder_nest_to_ring

            m = reorder_nest_to_ring(m)
        elif order.upper() != "RING":
            raise ValueError(f"order must be RING or NESTED, got "
                             f"{order!r}")
        if n_ring is None:
            n_ring = int(min(512, max(64, 4 * nside)))
        n_phi = 2 * n_ring
        th = (np.arange(n_ring) + 0.5) * np.pi / n_ring
        ph = np.arange(n_phi) * 2.0 * np.pi / n_phi
        pix = ang2pix_ring(nside, th[:, None], ph[None, :])
        return cls(m[pix], n_sep_bins)

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return (isinstance(other, PixelSphereMask)
                and self._hash == other._hash)

    def pair_function(self, theta):
        return np.interp(np.atleast_1d(np.asarray(theta, float)),
                         self._nodes, self._r_w)

    def pair_function2(self, theta):
        return np.interp(np.atleast_1d(np.asarray(theta, float)),
                         self._nodes, self._r_w2)

    def xi_w2(self, mu):
        theta = np.arccos(np.clip(
            np.atleast_1d(np.asarray(mu, float)), -1.0, 1.0))
        return self.pair_function2(theta) / (4.0 * np.pi)

    @property
    def coupling_ell(self) -> float:
        """π over the cap-equivalent radius (exact cap inversion of
        A₂, valid up to fsky → 1 where it tends to π/π = 1)."""
        radius = np.arccos(np.clip(
            1.0 - self.area2 / (2.0 * np.pi), -1.0, 1.0))
        return float(np.pi / max(radius, 1e-6))


def curved_pair_normalization(mask, theta_edges_rad, n_theta: int = 512,
                              squared: bool = False):
    """D_i = 2π ∫_bin R̄(θ) sinθ dθ per bin (static numpy) — the
    spherical pair counts normalizing the estimator.  ``squared=True``
    uses the W² pair function (exact noise closure)."""
    pf = mask.pair_function2 if squared else mask.pair_function
    edges = np.asarray(theta_edges_rad, dtype=float)
    d = np.empty(len(edges) - 1)
    for i, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        th = np.linspace(lo, hi, n_theta)
        d[i] = 2.0 * np.pi * np.trapezoid(np.sin(th) * pf(th), th)
    return d


# ---------------------------------------------------------------------------
# Coupling matrices (static, cached per mask geometry)
# ---------------------------------------------------------------------------

def _xi_matrices_impl(mask, ell_split: int, kinds: tuple,
                      weight: str = "W2"):
    """The requested Ξ matrices on ℓ, ℓ' ≤ ell_split (module
    docstring), via one Gauss-Legendre quadrature shared by all
    kernels.  The quadrature runs in θ (μ = cosθ, dμ = sinθ dθ):
    cap-overlap correlation functions are LINEAR in θ near zero
    separation, i.e. √(1-μ)-singular in μ, which stalls a μ-space
    rule at the ~0.5% level (measured via the Parseval row sum);
    in θ the integrand is piecewise smooth.  Node count: ≥4 per
    half-oscillation of P_ℓ P_ℓ' at ℓ = ell_split.

    ``weight``: "W2" (default) integrates against ξ_{W²} — the
    COVARIANCE kernels; "W" integrates against ξ_W =
    pair_function/4π — the coupling of pseudo-spectrum MEANS (the
    E→B leakage bias of the B-mode null test).  Binary masks:
    identical."""
    n = 4 * ell_split + 1024
    t, wq = np.polynomial.legendre.leggauss(n)
    theta = 0.5 * np.pi * (t + 1.0)
    x = np.cos(theta)
    if weight == "W2":
        xi = np.asarray(mask.xi_w2(x), dtype=float)
    elif weight == "W":
        xi = np.asarray(mask.pair_function(theta),
                        dtype=float) / (4.0 * np.pi)
    else:
        raise ValueError(f"weight must be 'W2' or 'W', got {weight!r}")
    wxi = 0.5 * np.pi * wq * np.sin(theta) * xi
    out = {}
    if "0" in kinds:
        p = _legendre_all(ell_split, x)
        out["0"] = 0.5 * ((p * wxi[None, :]) @ p.T)
    if "2" in kinds:
        d20 = _wigner_d_matrix(2, 0, ell_split, x)
        out["2"] = 0.5 * ((d20 * wxi[None, :]) @ d20.T)
    if "P" in kinds or "Q" in kinds:
        d22 = _wigner_d_matrix(2, 2, ell_split, x)
        q = 0.5 * ((d22 * wxi[None, :]) @ d22.T)
        if "Q" in kinds:
            # Unprojected Σ (2L+1) C^{W²}_L (3j(2,-2,0))² / 4π =
            # Ξ⁺ + Ξ⁻.  For the γt estimator this double-counts the
            # parity-odd channel (measured 1.7x above the flat-limit
            # ½(K₀+K₄) kernel on a small cap) — but it IS the ξ_± AUTO
            # kernel: the exact identities ξ̂_± = Σ t^{2,±2} (P̃EE ±
            # P̃BB) give Cov(±,±) = 2(Et Et' + Bt Bt')(Ξ⁺ + Ξ⁻) under
            # channel-diagonal NKA (Cov(P̃EE, P̃EE) = 2[EtEt'Ξ⁺ +
            # BtBt'Ξ⁻], Cov(P̃BB, P̃BB) the mirror, Cov(P̃EE, P̃BB) ≈ 0
            # — the even·odd projector product vanishes on the NKA
            # diagonal).  Sphere-MC-validated via the ξ± referee.
            out["Q"] = q
        if "P" in kinds:
            # Even-parity (pseudo-E) projection: the gamma_t auto
            # kernel.  Measured flat limit on a small cap:
            # 0.998 ± 0.009 of the flat module's MC-validated
            # ½(K₀+K₄) = <|W̃₂|² cos²2φ> kernel.  Directly validated
            # on the SPHERE by the spin-2 SHT Monte Carlo
            # (tests/test_curved.py::test_curved_spin2_mc_referee):
            # gt-auto diagonal within +2..24% of MC (conservative) on
            # a 25° cap AND a non-azimuthal two-cap footprint, even at
            # footprint-scale bins — far tighter than the flat
            # module's ~1.6x there (sphere kernels carry the exact
            # curved bin geometry the flat wedge coupling misses).
            d2m2 = _wigner_d_matrix(2, -2, ell_split, x)
            out["P"] = 0.5 * (q + 0.5 * ((d2m2 * wxi[None, :])
                                         @ d2m2.T))
    if "M" in kinds:
        # Ξ⁺ - Ξ⁻ = ½ ∫ d^ℓ_{2,-2} d^ℓ'_{2,-2} ξ_{W²} dμ — the
        # ξ_+ x ξ_- cross kernel: Cov(+,-) = 2(Et Et' - Bt Bt')
        # (Ξ⁺ - Ξ⁻), whose pure-noise part cancels EXACTLY in the
        # EE - BB channel assembly (the classic tangential/cross
        # shot-noise decorrelation; the flat module needs a
        # Weber-Schafheitlin constant for the same physics).
        d2m2 = _wigner_d_matrix(2, -2, ell_split, x)
        out["M"] = 0.5 * ((d2m2 * wxi[None, :]) @ d2m2.T)
    return out


@lru_cache(maxsize=8)
def _xi_matrices_cached(mask, ell_split: int, kinds: tuple,
                        weight: str = "W2"):
    return _xi_matrices_impl(mask, ell_split, kinds, weight)


def _xi_matrices(mask, ell_split: int, kinds: tuple,
                 weight: str = "W2"):
    try:
        return _xi_matrices_cached(mask, ell_split, kinds, weight)
    except TypeError:        # unhashable user mask: compute directly
        return _xi_matrices_impl(mask, ell_split, kinds, weight)


# ---------------------------------------------------------------------------
# Covariance blocks
# ---------------------------------------------------------------------------

def _auto_ell_split(mask, ell_max: int) -> int:
    """Dense-coupling extent: the delta limit errs by O(L_mask/ℓ), so
    carry the full matrices out to ~24 kernel widths (beyond which the
    correction is sub-0.5% of the local delta term), capped at
    ell_max."""
    width = mask.coupling_ell
    if width <= 0.0:
        return 0
    return int(min(ell_max, max(64, 24.0 * width)))


def _curved_bin_factors(mu, ell_max: int, edges_rad):
    """Bin factors for an estimator code: 0 (P_ℓ), 2 (d^ℓ_{20}),
    "xip" (d^ℓ_{22}), "xim" (d^ℓ_{2,-2})."""
    if mu == 0:
        return legendre_bin_factors(ell_max, edges_rad)
    if mu == 2:
        return legendre_bin_factors_spin2(ell_max, edges_rad)
    if mu == "xip":
        return wigner_bin_factors(2, 2, ell_max, edges_rad)
    if mu == "xim":
        return wigner_bin_factors(2, -2, ell_max, edges_rad)
    raise ValueError(f"unsupported estimator code mu={mu!r}")


# Ξ kernel per estimator-code pair (module docstring + _xi_matrices):
# the ξ± autos use the unprojected Q = Ξ⁺+Ξ⁻ (exact pseudo-E/B
# channel assembly — the caller sums EE and BB channel blocks); the
# (+,-) cross uses M = Ξ⁺-Ξ⁻; mixed scalar/spin-2 pairs use the
# single-leg 3j(000)·3j(2,-2,0) kernel "2"; (γt, ξ±) uses "2" as well
# (one mixed pairing — the flat-moment-rule analog K₂; documented NKA
# choice, the cross blocks are small).
_XI_KIND = {
    (0, 0): "0", (0, 2): "2", (2, 2): "P",
    (0, "xip"): "2", (0, "xim"): "2",
    (2, "xip"): "2", (2, "xim"): "2",
    ("xip", "xip"): "Q", ("xim", "xim"): "Q", ("xip", "xim"): "M",
}


def _xi_kind(mu_i, mu_j):
    k = _XI_KIND.get((mu_i, mu_j))
    if k is None:
        k = _XI_KIND.get((mu_j, mu_i))
    if k is None:
        raise ValueError(f"unsupported estimator pair ({mu_i}, {mu_j})")
    return k


def curved_gaussian_block(cl_ac, cl_bd, cl_ad, cl_bc,
                          theta_edges_deg_i, theta_edges_deg_j, mask,
                          mu_i=0, mu_j=0,
                          noise_ac: float = 0.0, noise_bd: float = 0.0,
                          noise_ad: float = 0.0, noise_bc: float = 0.0,
                          ell_max: int = 4096,
                          ell_split: int | None = None,
                          nn_quadrature: bool = False):
    """Curved-sky Gaussian covariance block Cov[w^(ab)_i, w^(cd)_j] on
    a masked sphere — the curved analog of covariance.gaussian_block
    (same four C_ℓ callables / noise-level signature; ``mask`` is a
    SphericalCapMask / ProfileCurvedMask / UniformSphereMask;
    ``mu_i``, ``mu_j`` ∈ {0, 2, "xip", "xim"} select the P_ℓ /
    d^ℓ_{20} / d^ℓ_{22} / d^ℓ_{2,-2} bin factors and the Ξ kernel
    family).  The ξ± codes compute SINGLE-CHANNEL (pseudo-EE or
    pseudo-BB) blocks — the 3x2pt assembly sums/differences the two
    channels (curved_joint_3x2pt_covariance).

    cl_xy receives a static integer numpy ℓ grid (2..ell_max) and may
    return traced values; everything geometric is static numpy.  The
    pure noise x noise term uses the pair-count-exact closure
    2 N² D₂_ovl / (D_i D_j) on the spherical pair counts (the flat
    module's closure is geometry-free).  ``nn_quadrature=True`` keeps
    the noise x noise constant inside the truncated ℓ quadrature
    instead (no closure): use ONLY for exact channel-difference
    assemblies where the truncation error cancels (the ξ+ x ξ- cross
    block)."""
    noise_ac = float(noise_ac)
    noise_bd = float(noise_bd)
    noise_ad = float(noise_ad)
    noise_bc = float(noise_bc)
    edges_i = np.radians(np.asarray(theta_edges_deg_i, dtype=float))
    edges_j = np.radians(np.asarray(theta_edges_deg_j, dtype=float))
    ells_np = np.arange(0, ell_max + 1)
    kind = _xi_kind(mu_i, mu_j)
    b_i = _curved_bin_factors(mu_i, ell_max, edges_i)   # (nbi, nl)
    b_j = _curved_bin_factors(mu_j, ell_max, edges_j)
    ct_ac = jnp.asarray(cl_ac(ells_np)) + noise_ac
    ct_bd = jnp.asarray(cl_bd(ells_np)) + noise_bd
    ct_ad = jnp.asarray(cl_ad(ells_np)) + noise_ad
    ct_bc = jnp.asarray(cl_bc(ells_np)) + noise_bc

    nn = noise_ac * noise_bd + noise_ad * noise_bc
    if nn_quadrature:
        nn = 0.0      # keep the constant inside the quadrature
    if nn != 0.0 and mu_i != mu_j:
        raise ValueError(
            "curved_gaussian_block: pure noise x noise with mu_i != "
            "mu_j is not closable analytically — split the noisy "
            "pairing out (same restriction as gaussian_block), or use "
            "nn_quadrature=True inside an exact channel-difference "
            "assembly.")

    # Pair-count normalization and the delta-limit prefactor.
    dmu_i = np.cos(edges_i[:-1]) - np.cos(edges_i[1:])
    dmu_j = np.cos(edges_j[:-1]) - np.cos(edges_j[1:])
    a_i = 2.0 * np.pi * dmu_i                      # annulus solid angle
    a_j = 2.0 * np.pi * dmu_j
    d_i = curved_pair_normalization(mask, edges_i)
    d_j = curved_pair_normalization(mask, edges_j)
    pref0_np = np.outer(a_i, a_j) / np.outer(d_i, d_j)
    pref = jnp.asarray(mask.area4 * pref0_np)

    # Master formula: Cov = (2π)²/(D_i D_j) Σ_{ℓℓ'} t_ℓ t'_ℓ'
    # (2ℓ+1)(2ℓ'+1) [Ct_ac Ct_bd + Ct_ad Ct_bc]_sym Ξ_{ℓℓ'} with
    # t_ℓ = b̄_ℓ Δμ.  Delta limit Ξ → (A₄/4π) δ_{ℓℓ'}/(2ℓ+1) gives
    # Cov_Δ = (A₄ A_i A_j)/(4π D_i D_j) Σ_ℓ (2ℓ+1) b̄_i b̄_j [..]
    # (uniform full sky: Σ (2ℓ+1) b̄ b̄' 2Ct²/(16π²), the exact
    # Cov[Ĉ_ℓ] = 2Ct²/(2ℓ+1) result — tested).
    hp = jax.lax.Precision.HIGHEST
    twol = 2.0 * ells_np + 1.0
    integrand = ct_ac * ct_bd + ct_ad * ct_bc - nn
    g = jnp.asarray(twol / (4.0 * np.pi)) * integrand
    cov = pref * jnp.matmul(jnp.asarray(b_i) * g[None, :],
                            jnp.asarray(b_j).T, precision=hp)

    if ell_split is None:
        ell_split = _auto_ell_split(mask, ell_max)
    ell_split = min(int(ell_split), ell_max)
    if ell_split >= 2:
        xi = _xi_matrices(mask, ell_split, (kind,))[kind]
        nl = ell_split + 1                         # ℓ = 0..ell_split
        tw = twol[:nl]
        # m rows carry t_ℓ (2ℓ+1) = b̄ Δμ (2ℓ+1).
        m_i = jnp.asarray(b_i[:, :nl] * dmu_i[:, None] * tw)
        m_j = jnp.asarray(b_j[:, :nl] * dmu_j[:, None] * tw)
        xi_j = jnp.asarray(xi)

        def quad(vl, vr):
            return jnp.matmul(
                jnp.matmul(m_i * vl[:nl][None, :], xi_j, precision=hp),
                (m_j * vr[:nl][None, :]).T, precision=hp)

        ones = jnp.ones_like(ct_ac)
        coupled = 0.5 * (quad(ct_ac, ct_bd) + quad(ct_bd, ct_ac)
                         + quad(ct_ad, ct_bc) + quad(ct_bc, ct_ad)) \
            - nn * quad(ones, ones)
        coupled = (2.0 * np.pi) ** 2 * coupled \
            / jnp.asarray(np.outer(d_i, d_j))
        g_low = jnp.asarray(twol[:nl] / (4.0 * np.pi)) \
            * integrand[:nl]
        delta_low = pref * jnp.matmul(
            jnp.asarray(b_i[:, :nl]) * g_low[None, :],
            jnp.asarray(b_j[:, :nl]).T, precision=hp)
        cov = cov + coupled - delta_low

    if nn != 0.0 and mu_i == mu_j:
        lo_i, hi_i = edges_i[:-1], edges_i[1:]
        lo_j, hi_j = edges_j[:-1], edges_j[1:]
        d2_ovl = np.zeros((len(lo_i), len(lo_j)))
        for ii in range(len(lo_i)):
            for jj in range(len(lo_j)):
                lo = max(lo_i[ii], lo_j[jj])
                hi = min(hi_i[ii], hi_j[jj])
                if hi > lo:
                    d2_ovl[ii, jj] = curved_pair_normalization(
                        mask, np.array([lo, hi]), squared=True)[0]
        cov = cov + jnp.asarray(nn * d2_ovl / np.outer(d_i, d_j))
    return cov


# ---------------------------------------------------------------------------
# Curved-sky observable predictions (exact multipole sums, fused
# into one static lattice operator — beyond chomp, which is flat-only)
# ---------------------------------------------------------------------------

def _spin2_kappa_prefactor(lmax: int):
    """√((ℓ+2)(ℓ-1)/(ℓ(ℓ+1))) for ℓ ≥ 2, zero below: converts the
    Limber C^{gκ}_ℓ the pipeline computes into the spin-2 C^{gE}_ℓ
    entering the exact d^ℓ_{20} tangential-shear sum
    (a^E_ℓm = √((ℓ+2)!/(ℓ-2)!)/(ℓ(ℓ+1)) a^κ_ℓm; → 1 at high ℓ,
    -0.2% at ℓ = 20)."""
    ell = np.arange(lmax + 1, dtype=float)
    out = np.zeros(lmax + 1)
    out[2:] = np.sqrt((ell[2:] + 2.0) * (ell[2:] - 1.0)
                      / (ell[2:] * (ell[2:] + 1.0)))
    return out


@lru_cache(maxsize=None)
def curved_lattice_operator(theta_key, grid, mu: float = 0.0,
                            ell_offset: float = 0.5,
                            lmax: int | None = None,
                            taper_frac: float = 0.15,
                            bin_average: bool = False,
                            kappa_prefactor: bool = True,
                            stat: str | None = None):
    """(j_lo, j_hi, A): the exact curved-sky multipole sum
    w(θ) = Σ_ℓ ((2ℓ+1)/4π) C_ℓ P_ℓ(cosθ) (``mu=0``) or
    γt(θ) = Σ_ℓ ((2ℓ+1)/4π) C^{gE}_ℓ d^ℓ_{20}(cosθ) (``mu=2``) as ONE
    static float64 matrix against the lattice convolution output — the
    curved analog of limber_fft.wtheta_lattice_operator, at identical
    runtime cost (conv + one matmul, zero gathers).

    The integer-ℓ C's come from Catmull-Rom interpolation of the
    log-lattice C(s) at s = ln(ℓ + ``ell_offset``) (the Limber ℓ+½
    argument), composed offline: A[j, :] = Σ_ℓ B[j, ℓ] S[ℓ, :] with the
    4-tap S rows scatter-accumulated (never densified — ℓ can reach
    1e5+ for sub-arcminute bins).

    ``theta_key``: θ points in degrees, or bin EDGES with
    ``bin_average=True`` (closed-form bin-averaged factors — the same
    ones the curved covariance uses, so prediction and covariance are
    binned identically).  ``lmax`` (default auto ~16/θ_min, capped at
    2^17) with a cosine taper over the top ``taper_frac`` of the range
    suppressing truncation ringing; ``kappa_prefactor`` applies the
    C^{gκ} → C^{gE} ℓ-factor for ``mu=2`` (exact; off reproduces the
    naive d^ℓ_{20} sum).

    ``stat``: "xip" / "xim" override ``mu`` with the shear-shear sums
    ξ_±(θ) = Σ_ℓ ((2ℓ+1)/4π) C^{EE}_ℓ d^ℓ_{2,±2}(cosθ), consuming the
    κκ lattice convolution with C^{EE} = f_ℓ² C^{κκ}
    (f = _spin2_kappa_prefactor, applied SQUARED — two spin-2 legs)."""
    from chomp_tpu.limber_fft import _lattices

    theta_deg = np.asarray(theta_key, dtype=float)
    theta_rad = np.radians(theta_deg)
    if lmax is None:
        # 64/θ_min: γt is an enclosed-mass statistic (sensitive to all
        # ℓ ≳ 1/θ), and the tapered tail converges only ~(ℓθ)^-1/2 —
        # 16/θ left a measured 1% γt shift on doubling at θ = 0.05°,
        # 64/θ is stable at the 1e-3 level (test_curved_predictions).
        lmax = int(min(1 << 18, max(2048, 64.0 / theta_rad.min())))
        if 64.0 / theta_rad.min() > (1 << 18):
            import warnings

            warnings.warn(
                f"curved_lattice_operator: theta_min = "
                f"{theta_deg.min():.2e} deg needs lmax ~ "
                f"{64.0 / theta_rad.min():.0f} for convergence but the "
                f"auto cap is {1 << 18} — the smallest bins will be "
                "truncation-limited.  Pass lmax explicitly, or use the "
                "flat route for sub-arcminute separations (curvature "
                "is negligible there anyway).", stacklevel=3)
    if stat is not None and stat not in ("xip", "xim"):
        raise ValueError("stat must be None, 'xip', or 'xim'")
    if stat is None and mu not in (0.0, 2.0, 0, 2):
        raise ValueError("curved_lattice_operator supports mu in {0, 2}")
    if stat is not None:
        mn = (2, 2) if stat == "xip" else (2, -2)
        if bin_average:
            b = wigner_bin_factors(mn[0], mn[1], lmax, theta_rad)
        else:
            b = _wigner_d_matrix(mn[0], mn[1], lmax,
                                 np.cos(theta_rad)).T
    elif bin_average:
        bf = (legendre_bin_factors if mu == 0
              else legendre_bin_factors_spin2)
        b = bf(lmax, theta_rad)                        # (nb, lmax+1)
    elif mu == 0:
        b = _legendre_all(lmax, np.cos(theta_rad)).T   # (nt, lmax+1)
    else:
        b = _wigner_d_matrix(2, 0, lmax, np.cos(theta_rad)).T
    ell = np.arange(lmax + 1, dtype=float)
    wl = (2.0 * ell + 1.0) / (4.0 * np.pi)
    if stat is not None and kappa_prefactor:
        wl = wl * _spin2_kappa_prefactor(lmax) ** 2
    elif mu == 2 and stat is None and kappa_prefactor:
        wl = wl * _spin2_kappa_prefactor(lmax)
    if taper_frac > 0.0:
        l_t = (1.0 - taper_frac) * lmax
        tap = np.where(ell <= l_t, 1.0, 0.5 * (1.0 + np.cos(
            np.pi * np.clip((ell - l_t) / (lmax - l_t), 0.0, 1.0))))
        wl = wl * tap
    b = b * wl[None, :]

    # Scatter-accumulate B @ S with the 4-tap Catmull-Rom rows of the
    # s = ln(ℓ + offset) interpolation (grids.catmull_rom_weights_np
    # stencil, never built dense: lmax ~ 1e5 × n_out ~ 1e3 won't fit).
    ln_k, ln_chi = _lattices(grid)
    dln = float(grid.lattice_dln)
    s0 = ln_k[0] + ln_chi[0]
    n_out = len(ln_k) + len(ln_chi) - 1
    t = (np.log(ell + ell_offset) - s0) / dln
    i = np.clip(np.floor(t).astype(int), 1, n_out - 3)
    f = t - i
    taps = (0.5 * (-f + 2 * f**2 - f**3),
            0.5 * (2 - 5 * f**2 + 3 * f**3),
            0.5 * (f + 4 * f**2 - 3 * f**3),
            0.5 * (-(f**2) + f**3))
    a = np.zeros((n_out, b.shape[0]))
    for off, wk in zip((-1, 0, 1, 2), taps):
        np.add.at(a, i + off, (b * wk[None, :]).T)
    a = a.T                                             # (nt, n_out)
    used = np.nonzero(np.any(a != 0.0, axis=0))[0]
    j_lo, j_hi = int(used[0]), int(used[-1]) + 1
    return j_lo, j_hi, np.ascontiguousarray(a[:, j_lo:j_hi])


def curved_wtheta_fft(cosmo, win_a, win_b, theta_deg, p_lattice,
                      grid=None, mu: float = 0.0,
                      ell_offset: float = 0.5, growth_pivot=1.0,
                      compensated: bool = True, lmax: int | None = None,
                      taper_frac: float = 0.15,
                      bin_average: bool = False,
                      kappa_prefactor: bool = True,
                      stat: str | None = None):
    """Curved-sky w(θ) (``mu=0``) or γt (``mu=2``) straight from the P
    lattice — the curved analog of limber_fft.limber_wtheta_fft (same
    signature shape, same runtime cost: direct lattice convolution →
    one fused static operator; ``compensated`` uses the two-float
    contraction for the float32 budget).  Sub-degree separations agree
    with the flat FFTLog route to the curvature correction (tested);
    wide-angle bins get the exact sphere geometry the flat route
    cannot represent.  Separable growth (``growth_pivot``), matching
    the flat fast path."""
    import jax

    from chomp_tpu.limber_fft import _conv_direct, _lattice_g
    from chomp_tpu.ops.df32 import df_contract
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    theta_key = tuple(np.asarray(theta_deg, dtype=float).tolist())
    j_lo, j_hi, a_np = curved_lattice_operator(
        theta_key, grid, mu, ell_offset, lmax, taper_frac, bin_average,
        kappa_prefactor, stat)
    g = _lattice_g(cosmo, win_a, win_b, grid, growth_pivot)
    conv = _conv_direct(p_lattice, g, j_lo, j_hi)
    if compensated:
        return df_contract(conv, a_np)
    return jnp.matmul(conv, jnp.asarray(a_np).T,
                      precision=jax.lax.Precision.HIGHEST)


def curved_wtheta_from_anchors(cosmo, anchors, win_a, win_b, theta_deg,
                               kind: str, grid=None, mu: float = 0.0,
                               ell_offset: float = 0.5,
                               compensated: bool = True,
                               lmax: int | None = None,
                               taper_frac: float = 0.15,
                               bin_average: bool = False,
                               kappa_prefactor: bool = True,
                               stat: str | None = None):
    """Exact-z curved-sky w(θ)/γt from prebuilt Chebyshev anchor
    spectra — the curved analog of limber_fft.limber_wtheta_from_anchors
    (same anchor convolution, curved multipole operator)."""
    import jax

    from chomp_tpu.limber_fft import exact_z_conv_from_anchors
    from chomp_tpu.ops.df32 import df_contract
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    theta_key = tuple(np.asarray(theta_deg, dtype=float).tolist())
    j_lo, j_hi, a_np = curved_lattice_operator(
        theta_key, grid, mu, ell_offset, lmax, taper_frac, bin_average,
        kappa_prefactor, stat)
    conv = exact_z_conv_from_anchors(cosmo, anchors, win_a, win_b, kind,
                                     grid, j_lo, j_hi)
    if compensated:
        return df_contract(conv, a_np)
    return jnp.matmul(conv, jnp.asarray(a_np).T,
                      precision=jax.lax.Precision.HIGHEST)


def curved_nongaussian_covariance(cosmo, halo_p, model, dist,
                                  theta_edges_deg, mask, mu_i=0, mu_j=0,
                                  ell_max: int = 2048,
                                  n_ell_tbl: int = 96,
                                  windows=None, tracers=None,
                                  with_bao: bool = False, grid=None,
                                  theta_edges_deg_j=None, **tri_kwargs):
    """Connected (trispectrum) covariance block with EXACT curved-sky
    bin factors — the sphere upgrade of
    covariance.nongaussian_covariance (which contracts flat J̄-Bessel
    factors against ∫ ℓdℓ/2π).  Here the same gather-free T̄(ℓ, ℓ')
    lattice projection is built on a uniform-ln-ℓ table, mapped onto
    the INTEGER multipoles by a static Catmull-Rom matrix, and summed
    discretely against Legendre/Wigner bin factors:

        Cov = (1/Ω_eff) Σ_{ℓℓ'≥1} (2ℓ+1)(2ℓ'+1)/(4π)² b̄_i b̄_j T̄

    with ``mu_i``/``mu_j`` estimator codes {0, 2, "xip", "xim"} (P_ℓ /
    d^ℓ_20 / d^ℓ_{2,±2}).  The flat measure ℓdℓ/2π ↔ Σ(2ℓ+1)/4π and
    J̄ ↔ b̄ correspondences make this reduce to the flat engine at
    sub-degree bins (tested); at wide bins the sphere geometry is
    exact.  The footprint still enters as the uniform effective area
    Ω_eff = A₂²/A₄ (``mask`` may also be a float Ω in sr) — cNG mask
    coupling beyond Ω_eff is higher-order (broadband T̄), the same
    treatment as the flat engine's mask= path.  This matches standard
    practice (CosmoLike / Krause & Eifler 2017; Barreira, Krause &
    Schmidt 2018): the trispectrum term is broadband in ℓ so mask
    convolution reduces to the effective-area normalization at the
    few-percent-of-a-subdominant-term level, while the response part
    of the mask coupling that IS large — super-survey modes — is
    carried exactly by the separate SSC term (chomp_tpu.ssc, which
    integrates σ_b²(χ) against THIS mask's geometry), so footprint
    information enters where it matters.  The multipole sum
    truncates at ``ell_max``: use bins ≳ 10/ell_max radians, as for
    curved_gaussian_block.  ``tri_kwargs`` forward to
    covariance.projected_trispectrum (n_k_tri, u_stride,
    exact_z_anchors, ...)."""
    from chomp_tpu.covariance import projected_trispectrum
    from chomp_tpu.grids import catmull_rom_weights_np
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    omega_eff = (float(mask) if isinstance(mask, (int, float))
                 else mask.area2**2 / mask.area4)
    edges_i = np.radians(np.asarray(theta_edges_deg, dtype=float))
    edges_j = np.radians(np.asarray(
        theta_edges_deg if theta_edges_deg_j is None
        else theta_edges_deg_j, dtype=float))
    # T̄ table nodes: uniform in ln ℓ over [1, ell_max] (T̄ is smooth
    # and broadband in ln ℓ — same table density as the flat engine).
    ln_tbl = np.linspace(0.0, np.log(ell_max), n_ell_tbl)
    t_proj = projected_trispectrum(cosmo, halo_p, model, dist,
                                   np.exp(ln_tbl), with_bao=with_bao,
                                   grid=grid, windows=windows,
                                   tracers=tracers, **tri_kwargs)
    ells = np.arange(ell_max + 1)
    pos = np.log(np.maximum(ells, 1.0)) / (ln_tbl[1] - ln_tbl[0])
    w_int = catmull_rom_weights_np(n_ell_tbl, pos)    # (lmax+1, n_tbl)
    meas = (2.0 * ells + 1.0) / (4.0 * np.pi)
    meas[0] = 0.0            # ℓ ≥ 1, matching the flat engine's ell_lo
    b_i = _curved_bin_factors(mu_i, ell_max, edges_i)
    b_j = _curved_bin_factors(mu_j, ell_max, edges_j)
    m_i = jnp.asarray((b_i * meas[None, :]) @ w_int)  # (nbi, n_tbl)
    m_j = jnp.asarray((b_j * meas[None, :]) @ w_int)
    hp = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(m_i, t_proj, precision=hp), m_j.T,
                      precision=hp) / omega_eff


def curved_joint_wtheta_gammat_covariance(
        cosmo, halo_p, model, dist_lens, dist_src, theta_edges_deg,
        n2d_lens, shape_noise, mask, ell_max: int = 4096,
        ell_split: int | None = None, with_bao: bool = False,
        grid=None, include_nongaussian: bool = False,
        include_ssc: bool = False, ssc_kwargs: dict | None = None,
        psd_guard: str | None = None, **ng_kwargs):
    """Joint [w_gg, γt] covariance on a masked SPHERE — the curved
    analog of covariance.joint_wtheta_gammat_covariance, with the same
    TPU-first dataflow: the three C_ℓ's come from ONE halo evaluation
    on the gather-free log-convolution lattice
    (covariance.lattice_cl_callables), contracted against the static
    curved geometry (Legendre / d^ℓ_{20} bin factors, Wigner-d Ξ
    coupling kernels for ``mask``).  jit/vmap/grad-able over ``cosmo``.

    ``mask`` is any curved-mask surface (SphericalCapMask /
    ProfileCurvedMask / PixelSphereMask / UniformSphereMask).
    ``shape_noise`` = σ_ε²/n2d_src, as in the flat builder.  ``ell_max``
    truncates the multipole sums — use bins ≳ 10/ell_max radians.

    ``include_nongaussian=True`` adds the connected (trispectrum)
    blocks via curved_nongaussian_covariance — the same gather-free
    T̄ lattice projection contracted against EXACT sphere bin factors
    (Legendre/d^ℓ_20 discrete multipole sums truncated at this
    function's ``ell_max``), at the effective uniform area
    Ω_eff = A₂²/A₄ (``ng_kwargs`` forwarded; cNG mask coupling beyond
    Ω_eff is higher-order — the broadband-T̄ treatment chomp applied
    to its entire covariance).  The spin-2 legs use C^{gκ} directly
    (the C^{gκ}→C^{gE} ℓ-prefactor is sub-0.2% at ℓ ≥ 20 and is
    applied exactly in the PREDICTION operator,
    curved_lattice_operator)."""
    from chomp_tpu.covariance import lattice_cl_callables
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    cl_gg, cl_gk, cl_kk = lattice_cl_callables(
        cosmo, halo_p, model, dist_lens, dist_src, with_bao, grid)
    edges = theta_edges_deg
    n_g = 1.0 / float(n2d_lens)
    kw = dict(ell_max=ell_max, ell_split=ell_split)
    cov_ww = curved_gaussian_block(cl_gg, cl_gg, cl_gg, cl_gg, edges,
                                   edges, mask, 0, 0, n_g, n_g, n_g,
                                   n_g, **kw)
    cov_wg = curved_gaussian_block(cl_gg, cl_gk, cl_gk, cl_gg, edges,
                                   edges, mask, 0, 2, n_g, 0.0, 0.0,
                                   n_g, **kw)
    cov_gg = curved_gaussian_block(cl_gg, cl_kk, cl_gk, cl_gk, edges,
                                   edges, mask, 2, 2, n_g,
                                   float(shape_noise), 0.0, 0.0, **kw)
    if include_nongaussian or include_ssc:
        from chomp_tpu.projection import WindowConvergence, WindowGalaxy

        win_g = WindowGalaxy(dist=dist_lens)
        win_k = WindowConvergence(dist=dist_src)
        combos = (
            ("ww", (win_g,) * 4, ("g",) * 4, 0, 0),
            ("wg", (win_g, win_g, win_g, win_k),
             ("g", "g", "g", "m"), 0, 2),
            ("gg", (win_g, win_k, win_g, win_k),
             ("g", "m", "g", "m"), 2, 2),
        )
        adders = []
        if include_nongaussian:
            common = dict(with_bao=with_bao, grid=grid, ell_max=ell_max,
                          **ng_kwargs)
            adders.append(lambda ws, ts, mi, mj:
                          curved_nongaussian_covariance(
                              cosmo, halo_p, model, dist_lens, edges,
                              mask, windows=ws, tracers=ts, mu_i=mi,
                              mu_j=mj, **common))
        if include_ssc:
            from chomp_tpu.ssc import curved_ssc_covariance

            skw = dict(with_bao=with_bao, grid=grid, ell_max=ell_max,
                       **(ssc_kwargs or {}))
            adders.append(lambda ws, ts, mi, mj: curved_ssc_covariance(
                cosmo, halo_p, model, dist_lens, edges, mask,
                windows=ws, tracers=ts, mu_i=mi, mu_j=mj, **skw))
        blocks = {"ww": cov_ww, "wg": cov_wg, "gg": cov_gg}
        for add in adders:
            for key, ws, ts, mi, mj in combos:
                blocks[key] = blocks[key] + add(ws, ts, mi, mj)
        cov_ww, cov_wg, cov_gg = (blocks[k] for k in ("ww", "wg", "gg"))
    top = jnp.concatenate([cov_ww, cov_wg], axis=1)
    bot = jnp.concatenate([cov_wg.T, cov_gg], axis=1)
    from chomp_tpu.covariance import _apply_psd_guard

    return _apply_psd_guard(jnp.concatenate([top, bot], axis=0),
                            psd_guard)


def curved_joint_3x2pt_covariance(
        cosmo, halo_p, model, dist_lens, dist_src, theta_edges_deg,
        n2d_lens, shape_noise, mask, ell_max: int = 4096,
        ell_split: int | None = None, with_bao: bool = False,
        grid=None, include_nongaussian: bool = False,
        include_ssc: bool = False, ssc_kwargs: dict | None = None,
        psd_guard: str | None = None, **ng_kwargs):
    """Joint [w_gg, γt, ξ_+, ξ_-] covariance on a masked SPHERE —
    (4 nb, 4 nb); the curved analog of
    covariance.joint_3x2pt_covariance, extending
    curved_joint_wtheta_gammat_covariance with the shear-shear rows.

    ``include_ssc`` adds the super-sample term to every block
    (ssc.curved_ssc_covariance: responses x the footprint's per-ℓ
    mask power sigma_b² — exact sphere bin factors, same ``ell_max``;
    ``ssc_kwargs`` forward).

    Shear model: E-only signal (C_EE = f_ℓ² C_κκ via the exact
    prediction operator; the covariance uses C_κκ directly — the f_ℓ
    correction is sub-0.2% at ℓ ≥ 20), C_BB = 0, white ``shape_noise``
    per component in BOTH channels.  The ξ± autos sum the pseudo-EE
    and pseudo-BB channel blocks (kernel Q = Ξ⁺+Ξ⁻); the (+,-) cross
    differences them (kernel M = Ξ⁺-Ξ⁻) with nn_quadrature=True so the
    pure-noise constants cancel EXACTLY between channels.  Cross
    blocks with w/γt couple through the E-mode only.

    ``include_nongaussian=True`` adds the connected blocks via
    curved_nongaussian_covariance — exact sphere bin factors (incl.
    the d^ℓ_{2,±2} ξ± codes) against the gather-free T̄ projection at
    Ω_eff = A₂²/A₄ (see curved_joint_wtheta_gammat_covariance)."""
    from chomp_tpu.covariance import lattice_cl_callables
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    cl_gg, cl_gk, cl_kk = lattice_cl_callables(
        cosmo, halo_p, model, dist_lens, dist_src, with_bao, grid)

    def cl_zero(ells_np):
        return jnp.zeros(len(np.asarray(ells_np)))

    edges = theta_edges_deg
    n_g = 1.0 / float(n2d_lens)
    ns = float(shape_noise)
    kw = dict(ell_max=ell_max, ell_split=ell_split)

    def blk(ac, bd, ad, bc, mi, mj, nac, nbd, nad, nbc, **extra):
        return curved_gaussian_block(ac, bd, ad, bc, edges, edges,
                                     mask, mi, mj, nac, nbd, nad, nbc,
                                     **kw, **extra)

    c_ww = blk(cl_gg, cl_gg, cl_gg, cl_gg, 0, 0, n_g, n_g, n_g, n_g)
    c_wg = blk(cl_gg, cl_gk, cl_gk, cl_gg, 0, 2, n_g, 0.0, 0.0, n_g)
    c_wp = blk(cl_gk, cl_gk, cl_gk, cl_gk, 0, "xip", 0.0, 0.0, 0.0, 0.0)
    c_wm = blk(cl_gk, cl_gk, cl_gk, cl_gk, 0, "xim", 0.0, 0.0, 0.0, 0.0)
    c_gg = blk(cl_gg, cl_kk, cl_gk, cl_gk, 2, 2, n_g, ns, 0.0, 0.0)
    c_gp = blk(cl_gk, cl_kk, cl_gk, cl_kk, 2, "xip", 0.0, ns, 0.0, ns)
    c_gm = blk(cl_gk, cl_kk, cl_gk, cl_kk, 2, "xim", 0.0, ns, 0.0, ns)

    def shear_auto(code):
        ee = blk(cl_kk, cl_kk, cl_kk, cl_kk, code, code, ns, ns, ns, ns)
        bb = blk(cl_zero, cl_zero, cl_zero, cl_zero, code, code,
                 ns, ns, ns, ns)
        return ee + bb

    c_pp = shear_auto("xip")
    c_mm = shear_auto("xim")
    c_pm = (blk(cl_kk, cl_kk, cl_kk, cl_kk, "xip", "xim",
                ns, ns, ns, ns, nn_quadrature=True)
            - blk(cl_zero, cl_zero, cl_zero, cl_zero, "xip", "xim",
                  ns, ns, ns, ns, nn_quadrature=True))

    if include_nongaussian or include_ssc:
        from chomp_tpu.projection import WindowConvergence, WindowGalaxy

        win_g = WindowGalaxy(dist=dist_lens)
        win_k = WindowConvergence(dist=dist_src)
        g4, k4, m4 = (win_g,) * 4, (win_k,) * 4, ("m",) * 4
        gk2 = (win_g, win_g, win_k, win_k)
        combos = {
            "ww": (g4, ("g",) * 4, 0, 0),
            "wg": ((win_g, win_g, win_g, win_k),
                   ("g", "g", "g", "m"), 0, 2),
            "wp": (gk2, ("g", "g", "m", "m"), 0, "xip"),
            "wm": (gk2, ("g", "g", "m", "m"), 0, "xim"),
            "gg": ((win_g, win_k, win_g, win_k),
                   ("g", "m", "g", "m"), 2, 2),
            "gp": ((win_g, win_k, win_k, win_k),
                   ("g", "m", "m", "m"), 2, "xip"),
            "gm": ((win_g, win_k, win_k, win_k),
                   ("g", "m", "m", "m"), 2, "xim"),
            "pp": (k4, m4, "xip", "xip"),
            "pm": (k4, m4, "xip", "xim"),
            "mm": (k4, m4, "xim", "xim"),
        }
        adders = []
        if include_nongaussian:
            common = dict(with_bao=with_bao, grid=grid, ell_max=ell_max,
                          **ng_kwargs)
            adders.append(lambda ws, ts, mi, mj:
                          curved_nongaussian_covariance(
                              cosmo, halo_p, model, dist_lens, edges,
                              mask, windows=ws, tracers=ts, mu_i=mi,
                              mu_j=mj, **common))
        if include_ssc:
            from chomp_tpu.ssc import curved_ssc_covariance

            skw = dict(with_bao=with_bao, grid=grid, ell_max=ell_max,
                       **(ssc_kwargs or {}))
            adders.append(lambda ws, ts, mi, mj: curved_ssc_covariance(
                cosmo, halo_p, model, dist_lens, edges, mask,
                windows=ws, tracers=ts, mu_i=mi, mu_j=mj, **skw))
        blocks = {"ww": c_ww, "wg": c_wg, "wp": c_wp, "wm": c_wm,
                  "gg": c_gg, "gp": c_gp, "gm": c_gm, "pp": c_pp,
                  "pm": c_pm, "mm": c_mm}
        for add in adders:
            for key, (ws, ts, mi, mj) in combos.items():
                blocks[key] = blocks[key] + add(ws, ts, mi, mj)
        c_ww, c_wg = blocks["ww"], blocks["wg"]
        c_wp, c_wm = blocks["wp"], blocks["wm"]
        c_gg, c_gp, c_gm = blocks["gg"], blocks["gp"], blocks["gm"]
        c_pp, c_pm, c_mm = blocks["pp"], blocks["pm"], blocks["mm"]

    rows = [
        jnp.concatenate([c_ww, c_wg, c_wp, c_wm], axis=1),
        jnp.concatenate([c_wg.T, c_gg, c_gp, c_gm], axis=1),
        jnp.concatenate([c_wp.T, c_gp.T, c_pp, c_pm], axis=1),
        jnp.concatenate([c_wm.T, c_gm.T, c_pm.T, c_mm], axis=1),
    ]
    return jnp.concatenate(rows, axis=0)


def _curved_probe_code(mu, channels):
    """Map a tomographic_probes entry to the curved bin-factor code:
    flat mu 2 → d^ℓ_20 (γt), mu 4 → "xim", mu 0 with B channels →
    "xip" (flat ξ+ and w share J0 but NOT the sphere kernel family),
    else 0 (Legendre, w)."""
    if mu == 2:
        return 2
    if mu == 4:
        return "xim"
    has_b = any(t[0] == "B" for (pr, _s) in channels for t in pr)
    return "xip" if has_b else 0


def curved_tomographic_3x2pt_covariance(
        cosmo, halo_p, model, lens_dists, src_dists, theta_edges_deg,
        n2d_lens_list, shape_noise_list, mask, ell_max: int = 4096,
        ell_split: int | None = None, with_bao: bool = False,
        grid=None, include_nongaussian=False, nuisance=None,
        include_magnification: bool = False, include_ssc=False,
        ssc_kwargs: dict | None = None, cmb_lensing=None,
        matter_power: str = "halo", psd_guard: str | None = None,
        **ng_kwargs):
    """Gaussian covariance of the full TOMOGRAPHIC 3x2pt data vector on
    a masked SPHERE — the curved analog of
    covariance.tomographic_3x2pt_covariance (same probe order:
    covariance.tomographic_probes; same per-bin noise semantics), with
    every block built by curved_gaussian_block from ONE lattice halo
    evaluation (covariance.tomographic_lattice_cl_callables).

    The E/B channel decompositions are shared with the flat builder
    (covariance._tomographic_pair_fn); the curved bin-factor codes are
    {0, 2, "xip", "xim"}.  ξ± autos sum the pseudo-EE and pseudo-BB
    channel blocks; the only differing-code blocks carrying a pure
    noise×noise constant are ξ+^{jk} × ξ-^{j'k'} with shared source
    bins, where the B channel enters with opposite sign and IDENTICAL
    constant — those blocks use nn_quadrature=True so the truncated
    constants cancel exactly in the channel difference (the multi-bin
    generalization of curved_joint_3x2pt_covariance's (+,-) cross).

    ``include_nongaussian`` ("autos" = diagonal probe blocks only,
    True = every block) adds the connected term via
    curved_nongaussian_covariance — exact sphere bin factors at
    Ω_eff = A₂²/A₄, truncated at this function's ``ell_max`` — the
    same treatment as curved_joint_3x2pt_covariance; ``ng_kwargs``
    forward (n_ell_tbl, n_k_tri, u_stride, exact_z_anchors, ...).
    ``nuisance`` evaluates every block (Gaussian AND connected) at a
    fiducial systematics vector (see the flat builder);
    ``include_magnification`` carries the lens magnification terms
    into the gg/gk spectra (tomographic_lattice_cl_callables).
    ``include_ssc`` (False/"autos"/True) adds the super-sample term
    via ssc.curved_ssc_covariance through the same channel/leg/
    nuisance machinery (``ssc_kwargs`` forward; SSC couples bins
    strongly across probes — prefer True over "autos").

    ``cmb_lensing`` (True or a cmblens.CMBLensingSpec) appends the
    w_{g_i kappa_CMB} probes exactly as in the flat builder — their
    curved bin factors are the spin-0 Legendre family (code 0), and
    the N_L white floor rides the curved noise closure."""
    from chomp_tpu.covariance import (_tomographic_ng_block_fn,
                                      _tomographic_noise_lists,
                                      _tomographic_pair_fn,
                                      tomographic_lattice_cl_callables,
                                      tomographic_probes)
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
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
    ng = (_tomographic_ng_block_fn(
        cosmo, halo_p, model, lens_dists, src_dists, edges, None,
        with_bao, grid, None, dict(ell_max=ell_max, **ng_kwargs),
        curved_mask=mask, nuisance=nuisance, cmb=cmb)
        if include_nongaussian else None)
    sscf = (_tomographic_ng_block_fn(
        cosmo, halo_p, model, lens_dists, src_dists, edges, None,
        with_bao, grid, None, dict(ell_max=ell_max, **(ssc_kwargs or {})),
        curved_mask=mask, nuisance=nuisance, engine="ssc", cmb=cmb)
        if include_ssc else None)
    codes = [_curved_probe_code(mu, ch) for (_n, mu, ch) in probes]
    n_probe = len(probes)
    blocks = [[None] * n_probe for _ in range(n_probe)]
    for pa in range(n_probe):
        ch_a = probes[pa][2]
        for pb in range(pa, n_probe):
            ch_b = probes[pb][2]
            acc = None
            for (a, b), s_a in ch_a:
                for (c, d), s_b in ch_b:
                    cl_ac, n_ac = pair(a, c)
                    cl_bd, n_bd = pair(b, d)
                    cl_ad, n_ad = pair(a, d)
                    cl_bc, n_bc = pair(b, c)
                    nn = n_ac * n_bd + n_ad * n_bc
                    if (cl_ac is cl_zero and cl_bd is cl_zero
                            and cl_ad is cl_zero and cl_bc is cl_zero
                            and nn == 0.0):
                        continue
                    extra = ({"nn_quadrature": True}
                             if (codes[pa] != codes[pb] and nn != 0.0)
                             else {})
                    blk = curved_gaussian_block(
                        cl_ac, cl_bd, cl_ad, cl_bc, edges, edges, mask,
                        codes[pa], codes[pb], n_ac, n_bd, n_ad, n_bc,
                        ell_max=ell_max, ell_split=ell_split, **extra)
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
    from chomp_tpu.covariance import _apply_psd_guard

    return _apply_psd_guard(
        jnp.concatenate([jnp.concatenate(row, axis=1)
                         for row in blocks], axis=0), psd_guard)


def curved_bmode_null(cl_ee, theta_edges_deg, mask,
                      shape_noise: float = 0.0, ell_max: int = 2048,
                      ell_split: int | None = None):
    """B-mode null test on a masked sphere: mean and covariance of the
    binned B-mode correlation statistic
    ξ̂_B(bin i) = (2π/D_i) Σ_ℓ t^{22,i}_ℓ P̃^{BB}_ℓ
    (the ξ_+ statistic of the pseudo-B channel) for an E-only true sky
    with white ``shape_noise`` per component in both channels.

    Returns ``(mean_leakage, noise_bias, cov)``:

    - ``mean_leakage``: the EXACT E→B mixing bias
      <ξ̂_B> = (2π/D_i) Σ_ℓ t_ℓ (2ℓ+1) Σ_ℓ' (2ℓ'+1) Ξ⁻^{(W)}_{ℓℓ'}
      C^{EE}_ℓ' — no NKA enters a pseudo-spectrum MEAN; the coupling
      runs against the mask's own correlation ξ_W (weight="W";
      identical to ξ_{W²} for binary masks).  Vanishes identically on
      the full sky (Ξ⁻ ≡ 0 there).  Both ℓ sums truncate at
      ``ell_split`` — size it to cover the C^{EE} support the bins
      weight (~several × 1/θ_min), not just the mask width.
    - ``noise_bias``: the closed-form masked noise floor
      N (2π/D_i) Σ_ℓ t_ℓ (2ℓ+1) A₂/4π (the exact row sum
      Σ(2ℓ'+1)(Ξ⁺+Ξ⁻)^{(W)} = ξ_W(1) = A₂/4π).
    - ``cov``: the leaked pseudo-B content is SECOND order in the mask
      coupling (the first-order channel-diagonal NKA measured 4.5x
      above MC), so the covariance models the leaked channel as a
      Gaussian field with the mask-deconvolved effective spectrum
      C_B^eff(ℓ) = <P̃^BB_ℓ> / ((2ℓ+1) A₂/4π) plus the real B-channel
      noise N, run through the standard masked block machinery
      (d^ℓ_{22} factors, Q = Ξ⁺+Ξ⁻ kernel — the conservative variant:
      measured an/mc [1.13, 1.33, 1.56] on a 25° cap vs the Ξ⁺
      kernel's unsafe [0.71, 0.78, 0.84];
      tests/test_curved.py::test_bmode_null_mc_referee).  Full sky:
      Ξ⁻^{(W)} ≡ 0 → zero leakage and the exact pure-noise closure,
      with no special-casing.

    jit/vmap-compatible in ``cl_ee``'s traced output (geometry is
    static numpy)."""
    ns = float(shape_noise)
    edges = np.radians(np.asarray(theta_edges_deg, dtype=float))
    ells_np = np.arange(0, ell_max + 1)
    twol = 2.0 * ells_np + 1.0
    b22 = wigner_bin_factors(2, 2, ell_max, edges)       # (nb, nl)
    dmu = np.cos(edges[:-1]) - np.cos(edges[1:])
    d_i = curved_pair_normalization(mask, edges)
    et = jnp.asarray(cl_ee(ells_np))

    if ell_split is None:
        ell_split = _auto_ell_split(mask, ell_max)
    ell_split = min(int(ell_split), ell_max)
    nl = ell_split + 1
    t_rows = b22 * dmu[:, None]                          # t_ℓ rows

    # --- exact leakage pseudo-spectrum and mean ---
    q_w, m_w = (_xi_matrices(mask, ell_split, ("Q", "M"), weight="W")[k]
                for k in ("Q", "M"))
    xi_minus_w = 0.5 * (q_w - m_w)
    hp = jax.lax.Precision.HIGHEST
    # <P̃BB_ℓ> = (2ℓ+1) Σ_ℓ' (2ℓ'+1) Ξ⁻W_{ℓℓ'} C_EE(ℓ'), ℓ ≤ ell_split
    # (MC-verified to 1-6% across ℓ on the 25° cap).
    pbb = jnp.asarray(twol[:nl]) * jnp.matmul(
        jnp.asarray(xi_minus_w * twol[:nl][None, :]), et[:nl],
        precision=hp)
    mean_leak = jnp.matmul(
        jnp.asarray((2.0 * np.pi / d_i)[:, None] * t_rows[:, :nl]),
        pbb, precision=hp)
    area2 = mask.area2
    noise_bias = jnp.asarray(
        ns * (2.0 * np.pi / d_i) * (t_rows * twol).sum(axis=1)
        * area2 / (4.0 * np.pi))

    # --- covariance via the effective leaked-field spectrum ---
    cb_eff = jnp.zeros(ell_max + 1).at[:nl].set(
        pbb / (jnp.asarray(twol[:nl]) * (area2 / (4.0 * np.pi))))

    def cl_beff(ells_static):
        # curved_gaussian_block always queries the full 0..ell_max
        # integer grid — identity, no gather in the traced graph.
        assert len(np.asarray(ells_static)) == ell_max + 1
        return cb_eff

    cov = curved_gaussian_block(
        cl_beff, cl_beff, cl_beff, cl_beff, theta_edges_deg,
        theta_edges_deg, mask, "xip", "xip", ns, ns, ns, ns,
        ell_max=ell_max, ell_split=ell_split)
    return mean_leak, noise_bias, cov


def curved_gaussian_covariance(cl_fn, theta_edges_deg, n2d, mask,
                               ell_max: int = 4096,
                               ell_split: int | None = None):
    """Gaussian + shot-noise covariance of w(theta) bins on a masked
    SPHERE — the curved analog of mask.masked_gaussian_covariance
    (``cl_fn(ells_np) -> C_ℓ``, ``n2d`` galaxies/sr, shot noise
    1/n2d)."""
    noise = 1.0 / float(n2d)
    return curved_gaussian_block(
        cl_fn, cl_fn, cl_fn, cl_fn, theta_edges_deg, theta_edges_deg,
        mask, 0, 0, noise, noise, noise, noise,
        ell_max=ell_max, ell_split=ell_split)
