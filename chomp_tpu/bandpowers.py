"""Harmonic-space band powers: MASTER mode-coupling on a masked sky.

Capability extension beyond chomp (upstream:covariance.py works purely
in configuration space; SURVEY.md §2 rows 12-13): modern surveys
measure angular power spectrum BAND POWERS (pseudo-C_ell decoupled
through the mask's mode-coupling matrix — the MASTER construction of
Hivon et al. 2002; NaMaster is the reference implementation).  This
module provides the full theory side:

  - ``master_coupling``: the mode-coupling matrices M_{ll'} for spin
    0x0, 0x2, and 2x2 (EE->EE and the EE<->BB leakage) from ANY mask
    object of chomp_tpu.curved (SphericalCapMask, ProfileCurvedMask,
    PixelSphereMask, ...).  No Wigner-3j recursions: the standard 3j
    sums are evaluated as single Gauss-Legendre quadratures of
    Legendre/Wigner-d products against the mask correlation function
    xi_W (curved._xi_matrices weight="W" — the same machinery that
    builds the covariance coupling kernels), via the identities

        sum_L (2L+1)/(4pi) W_L (3j^{000})^2        = Xi^{00}[xi_W]
        sum_L ...  3j^{000} 3j^{2-20}              = Xi^{20}[xi_W]
        sum_L ...  (3j^{2-20})^2 (1 +- (-1)^{l+l'+L})/2
                                                   = Xi^{22+-}[xi_W]

    (referee: an independent Racah-formula 3j evaluation in
    tests/test_bandpowers.py matches to ~1e-13).
  - ``bin_operator`` / ``decoupled_operator``: binning P, the binned
    coupling M_b = P M Q, the estimator decoupler D = M_b^{-1} P, and
    the BANDPOWER WINDOW F = D M with which theory is compared:
    <B_q> = sum_l F_{ql} C_l exactly (NKA-free — the mean coupling is
    exact for any Gaussian or non-Gaussian field).
  - ``bandpower_theory_operator``: the TPU path — C_ell evaluated on a
    small static log-ell table, mapped to integer multipoles by a
    static Catmull-Rom matrix and contracted with F in ONE fused
    matmul; plugs directly into the lattice C_ell callables
    (covariance.lattice_cl_callables / tomographic_...): zero gathers,
    one (n_band, n_tbl) operator per probe.
  - ``bandpower_gaussian_block``: Gaussian covariance of decoupled
    band powers under the narrow-kernel approximation
    Cov(C~^{ab}_l, C~^{cd}_l') ~= [C^{ac}C^{bd} + C^{ad}C^{bc}]_(ll')
    Xi^{00}[xi_{W^2}]_{ll'} (the symmetric standard-NKA kernel),
    sandwiched D_a . D_b^T.
    The multipole pairing uses the arithmetic mean
    (x y)_(ll') = (x_l + x_l')(y_l + y_l')/4 — exact on the diagonal,
    sign-safe for cross spectra, and rank-expandable so the whole
    block is 8 static-matrix sandwiches of traced per-ell vectors
    (gather-free, MXU-friendly).  Full-sky reduces EXACTLY to
    2 C^2 delta_{ll'} / (2l+1) (tested); masked accuracy is the usual
    NKA level (scalar-field MC referee in the tests: diagonal within
    ~10-30% at footprint-scale bins, percent-level well inside).

Noise: white (shot/shape) noise couples EXACTLY as
<N~_l> = N A_2 / (4pi) (``white_noise_pseudo_cl``; completeness —
sum_l' M_{ll'} -> xi_W(1) = A_2/4pi).  In the covariance, pass TOTAL
per-ell spectra (signal + true noise level N, NOT the pseudo level).

On top of these primitives the module carries the full TOMOGRAPHIC
harmonic-space analysis — the twin of the configuration-space 3x2pt
stack over the same one-halo-eval lattice C_ell engine:
``make_bandpower_pipeline`` (decoupled bandpower data vector; traced
nuisance/magnification/CMB-lensing support) and
``tomographic_bandpower_covariance`` (Gaussian NKA blocks + the
connected and super-sample terms mapped EXACTLY through the bandpower
windows, Cov(B) = F Cov(C_l) F^T).

Both masks are assumed identical across the two fields of each
spectrum (the standard single-footprint setup); cross-footprint
couplings need the cross pair function and are out of scope.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "master_coupling",
    "bin_operator",
    "decoupled_operator",
    "bandpower_theory_operator",
    "white_noise_pseudo_cl",
    "bandpower_gaussian_block",
    "pseudo_covariance_kernel",
    "pseudo_covariance_kernels_spin",
    "harmonic_probes",
    "bandpower_setup",
    "make_bandpower_pipeline",
    "tomographic_bandpower_covariance",
    "decouple",
    "map_bandpowers",
]


def master_coupling(mask, lmax: int, spins=(0, 2)):
    """Mode-coupling matrices on 0 <= l, l' <= lmax (numpy, offline).

    Returns a dict with (for ``spins`` containing 0 and/or 2):
      "00": <C~^{ss}_l>   = sum M00_{ll'} C^{ss}_{l'} (spin-0 x spin-0)
      "02": <C~^{sE}_l>   = sum M02_{ll'} C^{sE}_{l'} (spin-0 x spin-2)
      "pp": EE->EE (= BB->BB) block,
      "mm": BB->EE (= EE->BB) leakage block:
            <C~^{EE}_l> = sum_l' [pp C^{EE} + mm C^{BB}]_{l'}.

    M_{ll'} = (2l'+1) Xi_{ll'}[xi_W] with Xi the Gauss-Legendre
    quadratures of curved._xi_matrices (weight="W": the mask's own
    correlation function, NOT xi_{W^2}).  Hard-edged masks: rows
    converge in the L^2 sense; the white-noise row-sum identity is
    approached as ~1/lmax (same behavior as the covariance kernels,
    tests/test_curved.py::test_xi_row_sum_parseval)."""
    from chomp_tpu.curved import _xi_matrices

    kinds = ()
    if 0 in spins:
        kinds += ("0",)
    if 2 in spins:
        kinds += ("2", "P", "Q")
    if not kinds:
        raise ValueError("spins must contain 0 and/or 2")
    xi = _xi_matrices(mask, int(lmax), kinds, weight="W")
    twolp1 = 2.0 * np.arange(lmax + 1) + 1.0
    out = {}
    if 0 in spins:
        out["00"] = np.asarray(xi["0"]) * twolp1[None, :]
    if 2 in spins:
        out["02"] = np.asarray(xi["2"]) * twolp1[None, :]
        xp = np.asarray(xi["P"])                 # Xi+ (even parity)
        xm = np.asarray(xi["Q"]) - xp            # Xi- (odd parity)
        out["pp"] = xp * twolp1[None, :]
        out["mm"] = xm * twolp1[None, :]
    return out


def bin_operator(lmax: int, bin_edges, weights=None):
    """(P, Q): the binning operator P (n_band, lmax+1) with rows
    normalized to sum 1 over [edge_q, edge_{q+1}) (optionally
    ``weights``-weighted, e.g. l(l+1)/2pi for D_l-style bands), and
    the piecewise-constant interpolator Q (lmax+1, n_band) with
    Q_{lq} = 1 for l in band q (the standard MASTER binned-coupling
    model C_l = const within a band)."""
    edges = np.asarray(bin_edges, dtype=int)
    if edges.ndim != 1 or len(edges) < 2 or np.any(np.diff(edges) <= 0):
        raise ValueError("bin_edges must be increasing ints, >= 2 of them")
    if edges[0] < 0 or edges[-1] > lmax + 1:
        raise ValueError(f"bin_edges must lie in [0, {lmax + 1}]")
    ells = np.arange(lmax + 1)
    w = np.ones(lmax + 1) if weights is None else np.asarray(
        weights, dtype=float)
    nq = len(edges) - 1
    p = np.zeros((nq, lmax + 1))
    q = np.zeros((lmax + 1, nq))
    for i in range(nq):
        sel = (ells >= edges[i]) & (ells < edges[i + 1])
        p[i, sel] = w[sel] / np.sum(w[sel])
        q[sel, i] = 1.0
    return p, q


def decoupled_operator(m, bin_edges, weights=None):
    """Decoupled-bandpower operators for ONE coupling matrix ``m``
    ((lmax+1, lmax+1) from master_coupling; for spin-2 pass the
    stacked 2x2 [[pp, mm], [mm, pp]] yourself or use the "pp" block
    alone when BB is modeled as zero).

    Returns dict:
      "D": (n_band, lmax+1) — pseudo-C_l -> decoupled band powers
           (ESTIMATOR side: B_hat = D C~_hat, numpy/data route),
      "F": (n_band, lmax+1) — bandpower window: <B_q> = sum F_{ql} C_l
           (THEORY side — exact mean, no NKA),
      "M_b": the binned coupling (must be invertible: bands narrower
           than the mask coupling width make it singular — widen the
           bands or apodize the mask)."""
    m = np.asarray(m, dtype=float)
    lmax = m.shape[0] - 1
    p, q = bin_operator(lmax, bin_edges, weights)
    m_b = p @ m @ q
    # Solve instead of inverting; raise loudly on a singular binning.
    try:
        d = np.linalg.solve(m_b, p)
    except np.linalg.LinAlgError as e:       # pragma: no cover - message
        raise np.linalg.LinAlgError(
            f"binned coupling M_b is singular ({e}); bands are likely "
            "narrower than the mask's coupling width "
            "(mask.coupling_ell) — widen bin_edges or apodize") from e
    return {"D": d, "F": d @ m, "M_b": m_b}


def bandpower_theory_operator(f, n_tbl: int = 96, ell_lo: int = 2):
    """(ells_tbl, op): the fused TPU theory path for a bandpower
    window ``f`` ((n_band, lmax+1), from decoupled_operator["F"] —
    or any row operator on integer multipoles, e.g. P @ M for
    coupled pseudo-band powers).

    C_ell is evaluated ONCE on the static log-spaced table
    ``ells_tbl`` (n_tbl nodes on [1, lmax]) and mapped to integer
    multipoles by a static Catmull-Rom matrix (the same uniform-ln-l
    trick as curved.curved_nongaussian_covariance — C_ell is smooth
    in ln l), so band powers are ONE static matmul of a traced
    vector:

        B = op @ cl_callable(ells_tbl)        # (n_band,)

    Rows below ``ell_lo`` are dropped (C^{EE} has no l < 2; the
    monopole/dipole of clustering maps are removed by any estimator).
    Accuracy: Catmull-Rom on 96 log nodes reproduces halo-model C_ell
    at <1e-4 relative (tested)."""
    f = np.asarray(f, dtype=float)
    lmax = f.shape[1] - 1
    tbl, w_int = _ell_table_map(lmax, n_tbl, ell_lo)
    return tbl, jnp.asarray(f @ w_int)


def _ell_table_map(lmax: int, n_tbl: int, ell_lo: int = 2):
    """(ells_tbl, W): the static Catmull-Rom map from a log-spaced
    C_ell table on [1, lmax] to every integer multipole — W is
    (lmax+1, n_tbl) numpy, rows below ``ell_lo`` zeroed.  The shared
    primitive behind bandpower_theory_operator and the bandpower
    covariance builders (C_ell, T̄, and SSC blocks are all smooth in
    ln ℓ — same trick as curved.curved_nongaussian_covariance)."""
    from chomp_tpu.grids import catmull_rom_weights_np

    ln_tbl = np.linspace(0.0, np.log(lmax), int(n_tbl))
    ells = np.arange(lmax + 1)
    pos = np.log(np.maximum(ells, 1.0)) / (ln_tbl[1] - ln_tbl[0])
    w_int = catmull_rom_weights_np(int(n_tbl), pos)   # (lmax+1, n_tbl)
    w_int[:int(ell_lo)] = 0.0
    return np.exp(ln_tbl), w_int


def white_noise_pseudo_cl(level: float, mask, lmax: int):
    """EXACT mean pseudo-spectrum of white noise with per-steradian
    power ``level`` (1/n2d for shot noise, sigma_e^2/n2d for shape
    noise) under the mask: <N~_l> = level * A_2 / 4pi, every l
    (completeness of the Legendre/Wigner families — no quadrature)."""
    return np.full(lmax + 1, float(level) * mask.area2 / (4.0 * np.pi))


def pseudo_covariance_kernel(mask, lmax: int):
    """The static spin-0 NKA covariance kernel K_{ll'} =
    Xi^{00}[xi_{W^2}]_{ll'} = sum_L (2L+1)/(4pi) C^{W^2}_L (3j)^2:
    Cov(C~_l, C~_l') ~= [C C + C C]_(ll') K_{ll'} (module docstring).
    Symmetric in (l, l') — required of any covariance; full sky:
    K = delta_{ll'} / (2l+1) exactly.  Computed once per (mask, lmax)
    (cached inside curved._xi_matrices)."""
    from chomp_tpu.curved import _xi_matrices

    return np.asarray(_xi_matrices(mask, int(lmax), ("0",),
                                   weight="W2")["0"])


def pseudo_covariance_kernels_spin(mask, lmax: int):
    """SPIN-AWARE NKA covariance kernels, keyed by the number of
    spin-2 leg PAIRS in a Wick pairing (each pairing of
    Cov(C~^{ab}, C~^{cd}) contracts two field pairs; each pair of
    same-spin fields contributes its own 3j factor with the spin-0
    mask in the third column):

      0: Xi^{00}  = sum_L w_L (3j^{000})^2            (both pairs 0x0)
      1: Xi^{20}  = sum_L w_L 3j^{000} 3j^{2-20}      (one 0x0, one 2x2)
      2: Xi^{22+} = sum_L w_L (3j^{2-20})^2 x even-parity projection
                                                      (both pairs 2x2,
                                                       E-channel)

    with w_L = (2L+1)/(4pi) C^{W^2}_L — the same Gauss-Legendre
    quadrature kinds ("0", "2", "P") as the coupling matrices, now
    against xi_{W^2} (Racah-3j referee in tests/test_bandpowers.py).
    Pairings that contract a spin-0 field against a spin-2 field
    (e.g. the (gE)(Eg) pairing of Cov(C~^{gE}, C~^{gE})) have no
    unambiguous narrow-kernel reduction — the standard treatment
    (NaMaster's improved NKA) keeps the spin-0 kernel there, and so
    does tomographic_bandpower_covariance(kernel_mode="spin").
    All three reduce to delta_{ll'}/(2l+1) on the full sky (on the
    l >= 2 support for the spin-2 rows)."""
    from chomp_tpu.curved import _xi_matrices

    xi = _xi_matrices(mask, int(lmax), ("0", "2", "P"), weight="W2")
    return {0: np.asarray(xi["0"]), 1: np.asarray(xi["2"]),
            2: np.asarray(xi["P"])}


def bandpower_gaussian_block(d_a, d_b, cl_ac, cl_bd, cl_ad, cl_bc,
                             kernel, kernel2=None):
    """Gaussian covariance block of DECOUPLED band powers
    Cov(B^{ab}_q, B^{cd}_{q'}) — ``d_a``/``d_b`` the two decoupling
    operators (numpy (n_band, lmax+1), from decoupled_operator["D"]),
    the four TOTAL per-ell spectra (traced jnp arrays on 0..lmax,
    signal + true noise level), and the static ``kernel`` from
    pseudo_covariance_kernel (applied to the (ac)(bd) pairing;
    ``kernel2`` to the (ad)(bc) pairing, defaulting to ``kernel`` —
    pass per-pairing kernels from pseudo_covariance_kernels_spin for
    the spin-aware treatment).

    Rank-expansion of the arithmetic multipole mean: with
    u = cl_ac, v = cl_bd (and the (ad)(bc) mirror),

      Cov~_{ll'} = 1/4 (u_l + u_{l'})(v_l + v_{l'}) K_{ll'} + mirror

    so D_a Cov~ D_b^T = 1/4 sum of four diag-scaled sandwiches per
    pairing — 8 static (n_band x L)(L x L)(L x n_band) matmul chains,
    zero gathers, traced only through the per-ell C vectors."""
    da = jnp.asarray(np.asarray(d_a, dtype=float))
    db = jnp.asarray(np.asarray(d_b, dtype=float))
    hp = jax.lax.Precision.HIGHEST

    def sand(k, u_l, v_m):
        left = jnp.matmul(da * u_l[None, :], k, precision=hp)
        return jnp.matmul(left, (db * v_m[None, :]).T, precision=hp)

    def pairing(k, u, v):
        one = jnp.ones_like(u)
        return 0.25 * (sand(k, u * v, one) + sand(k, u, v)
                       + sand(k, v, u) + sand(k, one, u * v))

    k1 = jnp.asarray(kernel)
    k2 = k1 if kernel2 is None else jnp.asarray(kernel2)
    return pairing(k1, jnp.asarray(cl_ac), jnp.asarray(cl_bd)) \
        + pairing(k2, jnp.asarray(cl_ad), jnp.asarray(cl_bc))


# ---------------------------------------------------------------------------
# Data route: masked maps -> pseudo-C_l -> decoupled band powers
# ---------------------------------------------------------------------------
#
# The estimator side of MASTER, fully in-framework through the
# TPU-native SHT (chomp_tpu.sht): the decoupled band powers
# B_hat = D (C~_hat - <N~>) are directly comparable to
# make_bandpower_pipeline's theory means <B> = F C (exact coupling —
# no NKA on the mean), with tomographic_bandpower_covariance as the
# covariance.  Everything below is jit-able end to end.


def decouple(setup, spin_key, pseudo_cl_hat, noise_level: float = 0.0):
    """Decoupled band powers from MEASURED pseudo-spectra:
    B_hat = D (C~_hat - <N~>), with ``setup`` from bandpower_setup,
    ``spin_key`` in {"00", "02", "pp"}, ``pseudo_cl_hat`` any
    (..., >= lmax+1) array (extra multipoles beyond setup's lmax are
    ignored), and ``noise_level`` the white per-steradian noise power
    (1/n2d, sigma_e^2 per component / n2d) debiased at its EXACT
    pseudo level (white_noise_pseudo_cl).  Returns (..., n_band)."""
    d = jnp.asarray(setup["ops"][spin_key]["D"])
    lmax = setup["lmax"]
    cl = jnp.asarray(pseudo_cl_hat)[..., : lmax + 1]
    if noise_level:
        cl = cl - jnp.asarray(white_noise_pseudo_cl(
            noise_level, setup["mask"], lmax))
    return jnp.matmul(cl, d.T, precision=jax.lax.Precision.HIGHEST)


def map_bandpowers(sht, w_map, setup, scalar_maps=None, qu_maps=None,
                   noise_levels=None):
    """Masked sky maps -> decoupled band powers, in one call (and one
    jit): multiplies by the weight map, runs the TPU SHT
    (chomp_tpu.sht.SHT — pass one with ``spin2=True`` when ``qu_maps``
    is given), forms every auto/cross pseudo-spectrum, and decouples
    each through the matching MASTER operator of ``setup``.

    Parameters
    ----------
    sht : chomp_tpu.sht.SHT with sht.lmax >= setup["lmax"].
    w_map : (n_lat, n_phi) weight map (sht.gl_mask_map of the SAME
        mask object that built ``setup`` — the decoupling is only
        consistent for that mask).
    scalar_maps : (n_s, n_lat, n_phi) spin-0 fields (e.g. per-bin
        galaxy overdensity maps), or None.
    qu_maps : (n_2, 2, n_lat, n_phi) spin-2 (Q, U) field pairs (e.g.
        per-bin shear), or None.
    noise_levels : optional dict {"scalar": (n_s,), "spin2": (n_2,)}
        white per-steradian noise powers debiased per field (autos
        only — cross spectra carry no white noise).

    Returns a dict of decoupled band powers:
      ("s", i, j) for scalar x scalar (i <= j, "00" operator),
      ("se", i, j) for scalar_i x E_j ("02"),
      ("ee", i, j) for E_i x E_j (i <= j, "pp"; BB-null model).
    """
    w = jnp.asarray(w_map)
    out = {}
    alms, elms = [], []
    if scalar_maps is not None:
        sm = jnp.asarray(scalar_maps)
        alms = [sht.analyze(sm[i] * w) for i in range(sm.shape[0])]
    if qu_maps is not None:
        qu = jnp.asarray(qu_maps)
        for i in range(qu.shape[0]):
            e, _b = sht.analyze_spin2(qu[i, 0] * w, qu[i, 1] * w)
            elms.append(e)
    nz = noise_levels or {}
    n_s = nz.get("scalar", [0.0] * len(alms))
    n_e = nz.get("spin2", [0.0] * len(elms))
    for i in range(len(alms)):
        for j in range(i, len(alms)):
            cl = sht.pseudo_cl(alms[i], alms[j])
            lvl = float(n_s[i]) if i == j else 0.0
            out[("s", i, j)] = decouple(setup, "00", cl, lvl)
    for i in range(len(alms)):
        for j in range(len(elms)):
            cl = sht.pseudo_cl(alms[i], elms[j])
            out[("se", i, j)] = decouple(setup, "02", cl)
    for i in range(len(elms)):
        for j in range(i, len(elms)):
            cl = sht.pseudo_cl(elms[i], elms[j])
            lvl = float(n_e[i]) if i == j else 0.0
            out[("ee", i, j)] = decouple(setup, "pp", cl, lvl)
    return out


# ---------------------------------------------------------------------------
# Tomographic harmonic-space analysis: band powers as the data vector
# ---------------------------------------------------------------------------
#
# The harmonic mirror of the configuration-space tomographic stack
# (parallel.sweep.make_tomographic_pipeline /
# covariance.tomographic_3x2pt_covariance): the same ONE-halo-eval
# lattice C_ell callables feed MASTER-decoupled band powers instead of
# theta-bin operators.  Everything mask-dependent is built OFFLINE
# (numpy: couplings, decouplers, bandpower windows); the traced part is
# per probe ONE static (n_band, n_tbl) matmul of the C_ell table —
# zero gathers, same TPU profile as the theta pipelines.


def harmonic_probes(n_lens: int, n_src: int, cmb_lensing: bool = False):
    """The harmonic tomographic probe list, mirroring
    covariance.tomographic_probes' data-vector order: C^{gg}_i (lens
    autos), C^{gE}_{ij} (every lens x source), C^{EE}_{jk} (source
    pairs, j <= k; BB modeled null), then optionally C^{g kappa_CMB}_i.
    Entries are (name, spin_key, (tracer_a, tracer_b)) with spin_key
    selecting the MASTER coupling block ("00" / "02" / "pp") and
    tracers in the ("g", i) / ("E", j) / ("K", 0) alphabet of
    covariance._tomographic_pair_fn."""
    probes = []
    for i in range(n_lens):
        probes.append((f"cl_gg_{i}", "00", (("g", i), ("g", i))))
    for i in range(n_lens):
        for j in range(n_src):
            probes.append((f"cl_ge_{i}{j}", "02", (("g", i), ("E", j))))
    for j in range(n_src):
        for k in range(j, n_src):
            probes.append((f"cl_ee_{j}{k}", "pp", (("E", j), ("E", k))))
    if cmb_lensing:
        for i in range(n_lens):
            # kappa_CMB is a spin-0 map: g x kappa couples through M00.
            probes.append((f"cl_gK_{i}", "00", (("g", i), ("K", 0))))
    return probes


def bandpower_setup(mask, lmax: int, bin_edges, weights=None,
                    n_tbl: int = 96, spins=(0, 2)):
    """The offline (numpy) operator pack shared by the bandpower
    pipeline and covariance builders: MASTER couplings, per-spin
    decoupled operators, and the fused theory maps.

    Returns a dict:
      "tbl"   : the static log-ell C_ell evaluation nodes (n_tbl,),
      "w_int" : the (lmax+1, n_tbl) Catmull-Rom table->multipole map,
      "ops"   : {"00"/"02"/"pp": decoupled_operator dicts (D, F, M_b)},
      "f_eff" : {spin: jnp (n_band, n_tbl)} — F @ w_int, so a probe's
                decoupled band powers are ONE matmul f_eff @ cl(tbl),
      "edges", "lmax", "mask".

    The EE estimator uses the "pp" (EE->EE) block alone — the BB-null
    model standard for cosmic shear (BB leakage is subtracted as part
    of the E/B purification in the estimator; predicted BB is zero in
    the Limber E-only field).  ``bin_edges[0]`` must be >= 2: the
    monopole/dipole carry no spin-2 signal and the Limber C_ell table
    starts at ell_lo = 2."""
    edges = np.asarray(bin_edges, dtype=int)
    if edges[0] < 2:
        raise ValueError("bin_edges[0] must be >= 2 (no spin-2 "
                         "monopole/dipole; Limber table floor)")
    m = master_coupling(mask, int(lmax), spins=spins)
    tbl, w_int = _ell_table_map(int(lmax), n_tbl, ell_lo=2)
    keys = []
    if 0 in spins:
        keys.append(("00", m["00"]))
    if 2 in spins:
        keys.extend([("02", m["02"]), ("pp", m["pp"])])
    ops, f_eff = {}, {}
    for key, mk in keys:
        ops[key] = decoupled_operator(mk, edges, weights)
        f_eff[key] = jnp.asarray(ops[key]["F"] @ w_int)
    return {"tbl": tbl, "w_int": w_int, "ops": ops, "f_eff": f_eff,
            "edges": edges, "lmax": int(lmax), "mask": mask,
            "couplings": m}


def make_bandpower_pipeline(halo_params, hod, lens_dists, src_dists,
                            mask, lmax: int, bin_edges,
                            weights=None, n_tbl: int = 96,
                            with_bao: bool = False, grid=None,
                            with_nuisance: bool = False,
                            include_magnification: bool = False,
                            include_cmb_lensing=False,
                            matter_power: str = "halo"):
    """fn(cosmo[, nuisance]) -> dict of decoupled tomographic BAND
    POWERS — the harmonic-space twin of
    parallel.sweep.make_tomographic_pipeline, over the SAME lattice
    C_ell engine (one halo evaluation feeds every bin pair) with the
    mask's MASTER decoupling applied as static operators.

    Output keys: "cl_gg" (n_lens, nb), "cl_ge" (n_lens*n_src, nb),
    "cl_ee" (n_src(n_src+1)/2, nb), optionally "cl_gK" (n_lens, nb),
    and "vector" — the stacked 1-D data vector in harmonic_probes
    order (matching tomographic_bandpower_covariance).

    The prediction is <B_q> = sum_l F_{ql} C_l with F the bandpower
    window of the decoupled estimator — EXACT for the mean (no
    narrow-kernel approximation; compare the estimator's
    noise-debiased decoupled band powers D (C~_hat - N~) directly).
    ``hod`` may be per-lens-bin (a list); ``with_nuisance=True`` makes
    it fn(cosmo, nuisance) with the full traced Nuisance3x2pt
    treatment (photo-z shifts, NLA IA, shear calibration, and — with
    ``include_magnification`` — per-term lens magnification), all
    through covariance.tomographic_lattice_cl_callables.  Pure:
    jit/vmap/grad over cosmo (and nuisance) at will."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu.covariance import tomographic_lattice_cl_callables
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    if include_magnification and not with_nuisance:
        raise ValueError("include_magnification needs with_nuisance="
                         "True (the slopes live in Nuisance3x2pt."
                         "alpha_lens)")
    cmb = None
    if include_cmb_lensing is not False and include_cmb_lensing is not None:
        from chomp_tpu.cmblens import as_cmb_spec

        cmb = as_cmb_spec(include_cmb_lensing)
    n_lens, n_src = len(lens_dists), len(src_dists)
    setup = bandpower_setup(mask, lmax, bin_edges, weights, n_tbl,
                            spins=((0, 2) if n_src else (0,)))
    probes = harmonic_probes(n_lens, n_src, cmb_lensing=cmb is not None)
    tbl, f_eff = setup["tbl"], setup["f_eff"]
    hods = list(hod) if isinstance(hod, (list, tuple)) else None

    def fn(cosmo, nuisance=None):
        if hods is not None:
            model = halo_mod.build_halo_models(cosmo, halo_params, hods,
                                               with_bao=with_bao,
                                               grid=grid)
        else:
            model = halo_mod.build_halo_model(cosmo, halo_params, hod,
                                              with_bao=with_bao,
                                              grid=grid)
        cls = tomographic_lattice_cl_callables(
            cosmo, halo_params, model, lens_dists, src_dists, with_bao,
            grid, nuisance=nuisance,
            include_magnification=include_magnification, cmb=cmb,
            matter_power=matter_power)
        rows = {"cl_gg": [], "cl_ge": [], "cl_ee": [], "cl_gK": []}
        for name, spin, (ta, tb) in probes:
            if ta[0] == "g" and tb[0] == "g":
                key, out = ("gg", ta[1], tb[1]), "cl_gg"
            elif ta[0] == "g" and tb[0] == "E":
                key, out = ("gk", ta[1], tb[1]), "cl_ge"
            elif ta[0] == "E":
                key, out = ("kk", ta[1], tb[1]), "cl_ee"
            else:
                key, out = ("gK", ta[1]), "cl_gK"
            b = f_eff[spin] @ cls[key](tbl)
            rows[out].append(b)
        res = {k: jnp.stack(v) for k, v in rows.items() if v}
        res["vector"] = jnp.concatenate(
            [jnp.concatenate([r for r in rows[k]]) for k in
             ("cl_gg", "cl_ge", "cl_ee", "cl_gK") if rows[k]])
        if "cl_gK" not in res and cmb is not None:
            res["cl_gK"] = jnp.zeros((0, len(setup["edges"]) - 1))
        return res

    if with_nuisance:
        return fn
    return lambda cosmo: fn(cosmo, None)


def _harmonic_leg_fn(lens_dists, src_dists, model, nuisance, cmb):
    """tracer -> (window, tracer_kind, leg_model, calibration) for the
    connected-term engines, mirroring covariance._tomographic_ng_block_fn
    exactly: photo-z-shifted windows, IA-augmented E legs, one (1+m_j)
    per E leg; kappa_CMB legs are matter legs through the single-plane
    window."""
    from chomp_tpu.projection import (DNdzShifted, WindowConvergence,
                                      WindowConvergenceIA, WindowGalaxy)

    per_bin = isinstance(model, (list, tuple))
    if nuisance is None:
        wins_g = [WindowGalaxy(dist=d) for d in lens_dists]
        wins_k = [WindowConvergence(dist=d) for d in src_dists]
        cal = None
    else:
        nu = nuisance
        wins_g = [WindowGalaxy(dist=DNdzShifted(base=d, dz=nu.dz_lens[i]))
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
            return (cmb.window(), "m", (model[0] if per_bin else model),
                    1.0)
        return (wins_k[i], "m", (model[0] if per_bin else model),
                1.0 if cal is None else cal[i])

    return leg, per_bin


def tomographic_bandpower_covariance(cosmo, halo_p, model, lens_dists,
                                     src_dists, mask, lmax: int,
                                     bin_edges, n2d_lens_list,
                                     shape_noise_list, weights=None,
                                     n_tbl: int = 96,
                                     with_bao: bool = False, grid=None,
                                     nuisance=None,
                                     include_magnification: bool = False,
                                     include_nongaussian=False,
                                     include_ssc=False,
                                     ssc_kwargs: dict | None = None,
                                     cmb_lensing=None,
                                     kernel_mode: str = "spin0",
                                     matter_power: str = "halo",
                                     psd_guard: str | None = None,
                                     **ng_kwargs):
    """Covariance of the FULL tomographic decoupled-bandpower vector —
    (n_probe nb, n_probe nb) over harmonic_probes order, matching
    make_bandpower_pipeline's "vector".  The harmonic-space twin of
    covariance.tomographic_3x2pt_covariance, built from the same ONE
    lattice halo evaluation.

    Gaussian term: per-block NKA sandwiches D_a Cov(C~) D_b^T
    (bandpower_gaussian_block).  ``kernel_mode``:
      "spin0" (default): the spin-0 pseudo-covariance kernel of the
        mask on EVERY spin combination — the standard "improved NKA"
        treatment (the scalar MC referee puts the diagonal within
        ~10-30% at footprint-scale bands, percent-level well inside);
      "spin": per-PAIRING spin-aware kernels
        (pseudo_covariance_kernels_spin) — each Wick pairing gets the
        Xi kernel of its leg-pair spins (0x0/2x2 counts; pairings
        with a mixed 0x2 contraction keep the spin-0 kernel, the
        documented NKA ambiguity).  Spin-2 MC referee in
        tests/test_sht.py quantifies both modes on an apodized cap.
    Total per-ell spectra ride the static Catmull-Rom table map (zero
    gathers); per-bin shot noise 1/n2d_lens_list[i] and per-source-bin
    shape noise (per component) enter as exact white levels.

    ``include_nongaussian`` (False/"autos"/True): the connected
    (trispectrum) term mapped to band powers EXACTLY through the
    bandpower windows — Cov_cNG(B) = F Cov_cNG(C_l) F^T with
    Cov_cNG(C_l, C_l') = T̄_proj(l, l')/Ω_eff at Ω_eff = A₂²/A₄ (the
    same broadband-T̄ footprint treatment as the theta-space builders;
    the F-sandwich is exact given Cov(C_l)).  ``ng_kwargs`` forward to
    covariance.projected_trispectrum (n_k_tri, u_stride,
    exact_z_anchors, ...).

    ``include_ssc`` likewise adds the super-sample term: Cov_SSC(B) =
    F Cov_SSC(C_l) F^T with Cov_SSC from ssc.projected_ssc and
    σ_b²(χ) computed from THIS mask on the sphere (the mask enters the
    SSC through the footprint variance, not mode coupling).
    ``ssc_kwargs`` forward to projected_ssc (n_k_ssc, ...).

    ``nuisance`` / ``include_magnification`` / per-bin-HOD ``model``
    lists / ``cmb_lensing`` follow tomographic_3x2pt_covariance
    exactly (fiducial-nuisance Gaussian spectra via
    tomographic_lattice_cl_callables; connected legs via shifted/IA
    windows and one (1+m_j) per E leg)."""
    from chomp_tpu.covariance import (_tomographic_noise_lists,
                                      _tomographic_pair_fn,
                                      tomographic_lattice_cl_callables)
    from chomp_tpu.params import DEFAULT_GRID

    if grid is None:
        grid = DEFAULT_GRID
    cmb = None
    if cmb_lensing is not None and cmb_lensing is not False:
        from chomp_tpu.cmblens import as_cmb_spec

        cmb = as_cmb_spec(cmb_lensing)
    n_lens, n_src = len(lens_dists), len(src_dists)
    setup = bandpower_setup(mask, lmax, bin_edges, weights, n_tbl,
                            spins=((0, 2) if n_src else (0,)))
    tbl, w_int, ops = setup["tbl"], setup["w_int"], setup["ops"]
    nb = len(setup["edges"]) - 1
    if kernel_mode == "spin0":
        kernel = pseudo_covariance_kernel(mask, lmax)
        kern_of = lambda pair_a, pair_b: kernel
    elif kernel_mode == "spin":
        kerns = pseudo_covariance_kernels_spin(mask, lmax)

        def kern_of(pair_a, pair_b):
            """Kernel for the pairing contracting pair_a = (t_i, t_j)
            and pair_b: mixed spin-0 x spin-2 contractions fall back
            to the spin-0 kernel (docstring)."""
            spins = [0 if t[0] in ("g", "K") else 2
                     for t in (*pair_a, *pair_b)]
            if spins[0] != spins[1] or spins[2] != spins[3]:
                return kerns[0]
            return kerns[(spins[0] + spins[2]) // 2]
    else:
        raise ValueError(f"kernel_mode must be 'spin0' or 'spin', "
                         f"got {kernel_mode!r}")
    probes = harmonic_probes(n_lens, n_src, cmb_lensing=cmb is not None)
    cls = tomographic_lattice_cl_callables(
        cosmo, halo_p, model, lens_dists, src_dists, with_bao, grid,
        nuisance, include_magnification, cmb=cmb,
        matter_power=matter_power)
    n2d, sn = _tomographic_noise_lists(n2d_lens_list, shape_noise_list,
                                       n_lens, n_src)

    def cl_zero(ells_np):
        return jnp.zeros(len(np.asarray(ells_np)))

    pair = _tomographic_pair_fn(cls, n2d, sn, cl_zero,
                                nl_inf=(cmb.nl_inf if cmb else 0.0))
    w_j = jnp.asarray(w_int)
    cache = {}

    def cvec(t1, t2):
        """TOTAL per-ell spectrum C^{t1 t2}_l on 0..lmax (signal
        through the static table map + the exact white noise level)."""
        key = (t1, t2)
        if key not in cache:
            fn, noise = pair(t1, t2)
            v = w_j @ fn(tbl)
            cache[key] = v + noise if noise != 0.0 else v
        return cache[key]

    # Connected engines (built lazily; shared across blocks via CSE).
    ng_on = include_nongaussian
    ssc_on = include_ssc
    if ng_on or ssc_on:
        leg, per_bin = _harmonic_leg_fn(lens_dists, src_dists, model,
                                        nuisance, cmb)
        omega_eff = mask.area2**2 / mask.area4
        f_eff = setup["f_eff"]
        hp = jax.lax.Precision.HIGHEST
    if ssc_on:
        from chomp_tpu.ssc import projected_ssc, sigma_b2_fn

        sigma_fn = sigma_b2_fn(cosmo, mask, geometry="curved",
                               with_bao=with_bao, grid=grid)

    def connected(entry_a, entry_b, do_ng, do_ssc):
        """cNG + SSC contributions to the (a, b) block, or None."""
        _, sa, (a, b) = entry_a
        _, sb, (c, d) = entry_b
        ws, ts, ms, fs = zip(*(leg(t) for t in (a, b, c, d)))
        f_cal = fs[0] * fs[1] * fs[2] * fs[3]
        acc = None
        if do_ng:
            from chomp_tpu.covariance import projected_trispectrum

            t_tbl = projected_trispectrum(
                cosmo, halo_p, ms if per_bin else model, lens_dists[0],
                tbl, with_bao=with_bao, grid=grid, windows=ws,
                tracers=ts, **ng_kwargs)
            acc = jnp.matmul(jnp.matmul(f_eff[sa], t_tbl, precision=hp),
                             f_eff[sb].T, precision=hp) / omega_eff
        if do_ssc:
            m_pair = ((ms[0] if ts[0] == "g" else ms[1],
                       ms[2] if ts[2] == "g" else ms[3])
                      if per_bin else model)
            s_tbl = projected_ssc(cosmo, halo_p, m_pair, tbl, tbl,
                                  list(ws), list(ts), sigma_fn,
                                  with_bao=with_bao, grid=grid,
                                  **(ssc_kwargs or {}))
            s_blk = jnp.matmul(jnp.matmul(f_eff[sa], s_tbl,
                                          precision=hp),
                               f_eff[sb].T, precision=hp)
            acc = s_blk if acc is None else acc + s_blk
        return None if acc is None else f_cal * acc

    n_probe = len(probes)
    blocks = [[None] * n_probe for _ in range(n_probe)]
    for pa in range(n_probe):
        _, sa, (a, b) = probes[pa]
        for pb in range(pa, n_probe):
            _, sb, (c, d) = probes[pb]
            blk = bandpower_gaussian_block(
                ops[sa]["D"], ops[sb]["D"], cvec(a, c), cvec(b, d),
                cvec(a, d), cvec(b, c),
                kern_of((a, c), (b, d)), kern_of((a, d), (b, c)))
            ng_here = bool(ng_on) and (ng_on != "autos" or pb == pa)
            ssc_here = bool(ssc_on) and (ssc_on != "autos" or pb == pa)
            if ng_here or ssc_here:
                c_conn = connected(probes[pa], probes[pb], ng_here,
                                   ssc_here)
                if c_conn is not None:
                    blk = blk + c_conn
            blocks[pa][pb] = blk
            if pb != pa:
                blocks[pb][pa] = blk.T
    from chomp_tpu.covariance import _apply_psd_guard

    return _apply_psd_guard(
        jnp.concatenate([jnp.concatenate(row, axis=1)
                         for row in blocks], axis=0), psd_guard)
