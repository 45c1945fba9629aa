"""Batched cosmology sweeps: vmap + mesh sharding + inference steps.

This is the layer the reference never had (SURVEY.md §2: "no parallelism
of any kind — everything is scalar-in-scalar-out through
scipy.integrate"; §5.7-5.8): chomp re-runs every spline init per
cosmology, serially, on one CPU core.  Here an MCMC-style sweep is:

  - a :class:`~chomp_tpu.params.CosmoParams` with a leading batch axis
    (``broadcast_cosmo``),
  - pushed through ONE jitted, vmapped program (``make_pipeline``),
  - sharded over a ``jax.sharding.Mesh`` data axis so each chip computes
    its slice of cosmologies and the only collective is the output
    gather riding ICI (SURVEY.md §5.8: "no per-step allreduce is ever
    required — the design preserves that").

``make_inference_step`` adds the capability upgrade the functional core
buys for free: gradient-based cosmology fitting (value_and_grad of a
chi^2 through the ENTIRE pipeline — transfer function, mass function,
halo model, Limber, FFTLog).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import correlation, projection
from chomp_tpu.params import DEFAULT_GRID, CosmoParams, GridSpec
from chomp_tpu.utils.tree import pytree_dataclass


@pytree_dataclass
class Nuisance3x2pt:
    """The standard tomographic 3x2pt nuisance set (capability
    extension beyond chomp): per-lens-bin and per-source-bin photo-z
    shifts Δz (projection.DNdzShifted), per-source-bin multiplicative
    shear calibration m (γ̂ = (1+m) γ: gt rows × (1+m_j), ξ± rows ×
    (1+m_j)(1+m_k)), and NLA intrinsic alignments (A_ia, η_ia, pivot
    z0_ia; projection.WindowConvergenceIA).  A pure pytree — vmap a
    batch of nuisance vectors, differentiate, or HMC-sample them
    through the whole pipeline."""

    dz_lens: jnp.ndarray     # (n_lens,)
    dz_src: jnp.ndarray      # (n_src,)
    m: jnp.ndarray           # (n_src,)
    a_ia: jnp.ndarray        # ()
    eta_ia: jnp.ndarray      # ()
    z0_ia: jnp.ndarray       # ()
    alpha_lens: jnp.ndarray  # (n_lens,) magnification slopes (1 = off)


def default_nuisance(n_lens: int, n_src: int) -> Nuisance3x2pt:
    """All-zero nuisance vector (identity calibration, no IA,
    magnification slope alpha = 1 so 2(alpha-1) = 0) —
    make_tomographic_pipeline(with_nuisance=True) reduces exactly to
    the plain pipeline at this point (tested)."""
    return Nuisance3x2pt(
        dz_lens=jnp.zeros(n_lens), dz_src=jnp.zeros(n_src),
        m=jnp.zeros(n_src), a_ia=jnp.zeros(()), eta_ia=jnp.zeros(()),
        z0_ia=jnp.asarray(0.62), alpha_lens=jnp.ones(n_lens))


def broadcast_cosmo(base: CosmoParams, **param_arrays) -> CosmoParams:
    """Batch of cosmologies: named 1-D arrays override base fields, all
    other fields are broadcast.  The result's leading axis is the vmap /
    mesh-shard axis."""
    arrays = {k: jnp.asarray(v) for k, v in param_arrays.items()}
    if not arrays:
        raise ValueError("need at least one varying parameter")
    n = next(iter(arrays.values())).shape[0]
    full = {}
    for f in dataclasses.fields(base):
        if f.name in arrays:
            full[f.name] = arrays[f.name]
        else:
            full[f.name] = jnp.broadcast_to(getattr(base, f.name), (n,))
    return CosmoParams(**full)


def _warn_if_separable_bias(dist, z_pivot: float, threshold: float = 0.5):
    """Host-side warning when the separable-growth approximation is known
    to be badly biased for this configuration.

    The repo's own measurement (tests/test_exact_z_lattice.py): pivoting
    the halo model at z_pivot=0 under a kernel with mean redshift ~1
    biases C_ell by >10% — far above the 1e-4 numerics budget.  This
    matches chomp's separable factorization (parity-correct) but
    deserves a loud hint toward ``exact_z_anchors``.  Skipped silently
    when the dist parameters are traced (host-side check only)."""
    import warnings

    try:
        z_lo = float(np.asarray(dist.z_min))
        z_hi = float(np.asarray(dist.z_max))
        zg = np.linspace(z_lo, z_hi, 257)
        p = np.asarray(jnp.asarray(dist.raw_dndz(jnp.asarray(zg))))
        den = float(np.trapezoid(p, zg))
        if den <= 0.0:
            return
        z_bar = float(np.trapezoid(p * zg, zg)) / den
    except Exception:
        return  # traced dist: cannot check host-side
    if abs(z_bar - z_pivot) > threshold:
        warnings.warn(
            f"make_pipeline: separable growth with z_pivot={z_pivot} but "
            f"the window's mean redshift is ~{z_bar:.2f}; the frozen "
            "halo-model shape biases C_ell at the >10% level for such "
            "deep kernels (measured in tests/test_exact_z_lattice.py). "
            "Pass exact_z_anchors=6..8 for exact redshift evolution, or "
            "set z_pivot near the kernel mean.",
            stacklevel=3)


def _mm_override(cosmo, z, matter_power: str, with_bao: bool, grid):
    """The swapped power_mm lattice row (make_pipeline matter_power=):
    halofit or linear at epoch ``z``."""
    from chomp_tpu import limber_fft

    if matter_power == "halofit":
        from chomp_tpu import nlpower

        return nlpower.p_lattice_halofit(cosmo, z, with_bao, grid)
    if matter_power == "linear":
        from chomp_tpu import linear as linear_mod

        return linear_mod.linear_power(
            cosmo, jnp.exp(jnp.asarray(limber_fft.k_lattice(grid))), z,
            with_bao, grid)
    raise ValueError(f"matter_power must be halo|halofit|linear, got "
                     f"{matter_power!r}")


def make_pipeline(halo_params, hod, dist, power_spec: str = "power_gg",
                  theta_deg=None, z_pivot: float = 0.0,
                  with_bao: bool = False, grid: GridSpec = DEFAULT_GRID,
                  include_lensing: bool = True, method: str = "fft",
                  exact_z_anchors: int | None = None,
                  geometry: str = "flat",
                  include_shear: bool = False,
                  include_cmb_lensing=False,
                  nonlimber_ell_switch: int | None = None,
                  nonlimber_rsd: bool = False,
                  matter_power: str = "halo"):
    """Build the flagship single-cosmology program: halo model ->
    clustering w(theta) (+ lensing gamma_t) — the BASELINE.json configs[4]
    "batched w(theta) lensing+clustering pipeline".

    ``method="fft"`` (default) uses the gather-free FFT-convolution
    Limber (chomp_tpu.limber_fft — ~100x faster on TPU, agrees with the
    reference path to ~1e-5); ``method="table"`` uses the
    GL + cubic-table reference path.

    ``exact_z_anchors``: if set (e.g. 8-10), the fft route drops the
    separable-growth approximation entirely — the halo model is expanded
    over that many Chebyshev redshift anchors shared across all probes
    (limber_fft.exact_z_anchor_spectra; measured w+gamma_t on v5e:
    3.1 ms/cosmology at J=6, 4.0 at J=8, vs ~0.6 separable).
    ``z_pivot`` is then unused.  The anchor window is sized from
    ``dist.z_max`` at BUILD time, so exact-z mode needs a concrete
    (non-traced) ``dist.z_max`` — vmap the cosmology axis, not the dist.

    ``geometry="curved"`` (fft routes only) swaps the flat FFTLog
    Hankel for the EXACT curved-sky multipole sums
    (curved.curved_wtheta_fft / curved_wtheta_from_anchors) at the same
    runtime cost — one lattice convolution and one static-operator
    matmul.  Sub-degree bins agree with the flat route to the
    flat-sky approximation error (~1e-4..4e-3 depending on θ and the
    ell_offset convention); wide-angle bins (≳ degrees) get the sphere
    geometry the flat transform cannot represent.

    ``include_shear=True`` adds the shear-shear correlations
    xi_plus/xi_minus (source sample = the same ``dist``; power_mm
    through the convergence window; J0/J4 flat, exact d^l_{2,+-2}
    multipole sums with the f_l^2 kappa->E prefactor when
    geometry="curved") — the full 3x2pt data vector.  Capability
    extension beyond chomp (correlation.xi_plus docstring).

    ``include_cmb_lensing`` (True or a cmblens.CMBLensingSpec) adds
    the CMB-lensing cross-correlation w_{g kappa_CMB}(theta) ("w_gk_cmb"
    output; P_gm through the single-source-plane kappa_CMB window —
    chomp_tpu.cmblens) — the same grouped convolution, one extra row.
    Flat J0 or curved Legendre sums; exact-z anchors apply (the cross
    integrand is supported on the galaxy bin).  Not corrected by
    ``nonlimber_ell_switch`` (the kappa_CMB kernel is maximally broad —
    its Limber error is <0.1% at every ell >= 2, same class as xi_pm).

    ``nonlimber_ell_switch`` (fft routes only): repair the Limber
    approximation below that multipole with the EXACT spherical-Bessel
    projection (chomp_tpu.nonlimber — FFTLog with analytic Mellin
    kernels; for a sigma_z ~ 0.05 lens bin Limber is ~2x wrong on
    C_gg at ell = 2 and ~8% at ell = 10).  Applied to w(theta) and
    gamma_t as additive tapered corrections; xi_+/- keep plain Limber
    (both legs are broad lensing kernels — their non-Limber error is
    <0.1% at every ell >= 2).  The correction is computed in the
    separable approximation even when ``exact_z_anchors`` is set (the
    cross term Limber-error x evolution-error is second order); that
    combination costs one extra pivot halo evaluation.  ell_switch ~
    40-100 is ample: the residual Limber error at the switch is
    <~0.5% and decays as ell^-2.  ``nonlimber_rsd=True`` additionally
    carries the linear Kaiser redshift-space term on the galaxy leg
    (nonlimber.rsd_delta_cl_nodes — the -j_ell'' kernel on P_lin
    h_a h_b; for a sigma_z ~ 0.05 bin it DOMINATES C_gg at the lowest
    multipoles — measured 156% of the density C_gg at ell=2, 48% at
    ell=10 — and is zero in any Limber pipeline) through the same
    tapered operators.

    ``matter_power``: "halo" (default — the HOD-consistent 1h+2h
    model), "halofit" (Takahashi 2012 revised halofit,
    chomp_tpu.nlpower — the N-body-calibrated standard for cosmic
    shear), or "linear".  Swaps ONLY the mm legs (the xi_+/- rows);
    w(theta)/gamma_t keep the halo model (halofit has no galaxy
    sector).  On the separable route the swapped spectrum is the
    pivot-epoch shape scaled by D^2 like every other row; with
    ``exact_z_anchors`` the full halofit shape evolution is carried
    (the anchors interpolate P/D^2 in z).

    Returns ``fn(cosmo) -> dict`` (pure; jit/vmap/grad-able).
    ``halo_params``/``hod``/``dist`` are closed over but traced, so they
    can also carry batch axes via vmap in_axes if desired (except
    ``dist`` in exact-z mode, per above).
    """
    import numpy as np

    from chomp_tpu import halo as halo_mod
    from chomp_tpu import limber_fft

    if geometry not in ("flat", "curved"):
        raise ValueError(f"geometry must be 'flat' or 'curved', got "
                         f"{geometry!r}")
    if geometry == "curved" and method != "fft":
        raise ValueError(
            "geometry='curved' requires method='fft' (the curved "
            "multipole operators consume the lattice convolution; the "
            "table route has no integer-ell surface)")
    if nonlimber_ell_switch and method != "fft":
        raise ValueError(
            "nonlimber_ell_switch requires method='fft' (the exact "
            "projection consumes the pipeline's k-lattice spectrum row)")
    if nonlimber_rsd and not nonlimber_ell_switch:
        raise ValueError("nonlimber_rsd requires nonlimber_ell_switch "
                         "(the RSD term rides the same correction "
                         "operators)")
    if matter_power not in ("halo", "halofit", "linear"):
        raise ValueError(f"matter_power must be halo|halofit|linear, "
                         f"got {matter_power!r}")
    if matter_power != "halo" and method != "fft":
        raise ValueError("matter_power overrides need method='fft' "
                         "(the table route has no mm lattice row)")

    if theta_deg is None:
        theta_deg = correlation.theta_bins_deg(grid)
    theta_deg = jnp.asarray(theta_deg)
    win_g = projection.WindowGalaxy(dist=dist)
    win_k = projection.WindowConvergence(dist=dist)
    win_kcmb = None
    if include_cmb_lensing is not False and include_cmb_lensing is not None:
        from chomp_tpu.cmblens import as_cmb_spec

        win_kcmb = as_cmb_spec(include_cmb_lensing).window()
    ells_np = correlation.ell_grid(grid)[0]
    ells = jnp.asarray(ells_np)

    theta_key = np.asarray(theta_deg)

    # Anchor window top is concrete at build time (advisor round-2:
    # computing it inside fn breaks vmap-over-dist with a
    # TracerArrayConversionError; hoisted here, dist.z_max must simply
    # be concrete when exact-z mode is requested).
    z_hi_anchor = (max(float(np.asarray(dist.z_max)), 1.0)
                   if (method == "fft" and exact_z_anchors) else None)
    if not exact_z_anchors:
        _warn_if_separable_bias(dist, z_pivot)

    def w_from_p(cosmo, model, wa, wb, p_kind_table, kind, mu,
                 stat=None):
        if method == "fft" and exact_z_anchors:
            # p_kind_table carries the SHARED anchor spectra here (one
            # halo sweep for gg+gm; the y-matrices dominate).
            if geometry == "curved":
                from chomp_tpu.curved import curved_wtheta_from_anchors

                return curved_wtheta_from_anchors(
                    cosmo, p_kind_table, wa, wb, theta_key, kind, grid,
                    mu=mu, stat=stat)
            return limber_fft.limber_wtheta_from_anchors(
                cosmo, p_kind_table, wa, wb, theta_key, kind, grid, mu=mu)
        if method == "fft":
            # Fused lattice route: conv -> one f64-composed operator with
            # two-float accumulation (skips the f32 C_ell intermediate —
            # the dominant term of the f32 error budget, NUMERICS.md §6).
            if geometry == "curved":
                from chomp_tpu.curved import curved_wtheta_fft

                return curved_wtheta_fft(
                    cosmo, wa, wb, theta_key, p_kind_table[kind], grid,
                    mu=mu, growth_pivot=model.mass.growth, stat=stat)
            return limber_fft.limber_wtheta_fft(
                cosmo, wa, wb, theta_key, p_kind_table[kind], grid, mu=mu,
                growth_pivot=model.mass.growth)
        pt = projection.power_table_halo(cosmo, halo_params, model, kind,
                                         with_bao, grid)
        cl = projection.limber_cl(cosmo, wa, wb, ells, pt, grid)
        return correlation.wtheta_from_cl_fused(cl, theta_key, grid, mu)

    def _apply_nonlimber(cosmo, model, out, p_lat):
        """Additive low-ell repair of the Limber projection (w + gt;
        see the nonlimber_ell_switch docstring note).  ``p_lat``: the
        separable pivot-epoch lattice spectra dict."""
        from chomp_tpu import nonlimber

        piv = model.mass.growth
        sw = int(nonlimber_ell_switch)
        tk = tuple(np.asarray(theta_key, dtype=float).tolist())
        d_w = nonlimber.delta_cl_nodes(cosmo, win_g, win_g,
                                       p_lat[power_spec], sw, grid,
                                       ("d", "d"), piv)
        if nonlimber_rsd:
            d_w = d_w + nonlimber.rsd_delta_cl_nodes(
                cosmo, halo_params, model, win_g, win_g, sw, grid,
                "d", piv, with_bao=with_bao)
        op_w = nonlimber.correction_operator(tk, 0.0, sw, 20, geometry)
        out["w_theta"] = out["w_theta"] + jnp.matmul(
            jnp.asarray(op_w), d_w, precision=jax.lax.Precision.HIGHEST)
        if include_lensing:
            kk = "k_E" if geometry == "curved" else "k_flat"
            d_g = nonlimber.delta_cl_nodes(cosmo, win_g, win_k,
                                           p_lat["power_gm"], sw, grid,
                                           ("d", kk), piv)
            if nonlimber_rsd:
                d_g = d_g + nonlimber.rsd_delta_cl_nodes(
                    cosmo, halo_params, model, win_g, win_k, sw, grid,
                    kk, piv, with_bao=with_bao)
            op_g = nonlimber.correction_operator(tk, 2.0, sw, 20,
                                                 geometry)
            out["gamma_t"] = out["gamma_t"] + jnp.matmul(
                jnp.asarray(op_g), d_g,
                precision=jax.lax.Precision.HIGHEST)
        return out

    def fn(cosmo: CosmoParams):
        model = halo_mod.build_halo_model(cosmo, halo_params, hod, z_pivot,
                                          with_bao, grid)
        # One shared evaluation for every spectrum kind (the y-matrices
        # dominate the halo stage; computing gg and gm separately would
        # double it).  In exact-z mode the shared object is the anchor
        # spectra instead.
        if method == "fft" and exact_z_anchors:
            kinds = (power_spec,)
            if ((include_lensing or win_kcmb is not None)
                    and "power_gm" not in kinds):
                kinds += ("power_gm",)
            if include_shear and "power_mm" not in kinds:
                kinds += ("power_mm",)
            # Anchor window covers the distribution's support (z_hi_anchor
            # hoisted to build time); clamping P~ above the anchors
            # would silently freeze evolution exactly where the kernel
            # still has weight.
            p_all = limber_fft.exact_z_anchor_spectra(
                cosmo, halo_params, hod, kinds, exact_z_anchors,
                1e-3, z_hi_anchor, with_bao, grid,
                matter_power=matter_power)
        else:
            p_all = (limber_fft.p_lattice_halo_all(cosmo, halo_params,
                                                   model, with_bao, grid)
                     if method == "fft" else None)
            if (p_all is not None and include_shear
                    and matter_power != "halo"):
                p_all = dict(p_all)
                p_all["power_mm"] = _mm_override(cosmo, z_pivot,
                                                 matter_power, with_bao,
                                                 grid)
        out = {"theta_deg": theta_deg, "n_g": model.n_g}
        if method == "fft" and not exact_z_anchors:
            # Batched fast path (the bench.py route): all probes fuse
            # into ONE grouped conv + one contraction per distinct
            # operator (_fused_probe_rows) — same sums as the per-row
            # route (equality-tested 1e-12), flat AND curved.
            stat_p = "xip" if geometry == "curved" else None
            stat_m = "xim" if geometry == "curved" else None
            rows = [(win_g, win_g, p_all[power_spec], [(0.0, None)])]
            if include_lensing:
                rows.append((win_k, win_g, p_all["power_gm"],
                             [(2.0, None)]))
            i_shear = len(rows) if include_shear else None
            if include_shear:
                rows.append((win_k, win_k, p_all["power_mm"],
                             [(0.0, stat_p), (4.0, stat_m)]))
            i_cmb = len(rows) if win_kcmb is not None else None
            if win_kcmb is not None:
                rows.append((win_g, win_kcmb, p_all["power_gm"],
                             [(0.0, None)]))
            outs = _fused_probe_rows(cosmo, grid, model.mass.growth,
                                     theta_key, rows, geometry)
            out["w_theta"] = outs[0][0]
            if include_lensing:
                out["gamma_t"] = outs[1][0]
            if include_shear:
                out["xi_plus"], out["xi_minus"] = outs[i_shear]
            if win_kcmb is not None:
                out["w_gk_cmb"] = outs[i_cmb][0]
            if nonlimber_ell_switch:
                out = _apply_nonlimber(cosmo, model, out, p_all)
            return out
        out["w_theta"] = w_from_p(cosmo, model, win_g, win_g, p_all,
                                  power_spec, 0.0)
        if include_lensing:
            out["gamma_t"] = w_from_p(cosmo, model, win_k, win_g, p_all,
                                      "power_gm", 2.0)
        if include_shear:
            # Curved geometry: the flat J0/J4 map to the exact sphere
            # d^l_{2,+-2} sums via the stat codes (mu is ignored there).
            stat_p = "xip" if geometry == "curved" else None
            stat_m = "xim" if geometry == "curved" else None
            out["xi_plus"] = w_from_p(cosmo, model, win_k, win_k, p_all,
                                      "power_mm", 0.0, stat_p)
            out["xi_minus"] = w_from_p(cosmo, model, win_k, win_k, p_all,
                                       "power_mm", 4.0, stat_m)
        if win_kcmb is not None:
            out["w_gk_cmb"] = w_from_p(cosmo, model, win_g, win_kcmb,
                                       p_all, "power_gm", 0.0)
        if nonlimber_ell_switch:
            # Exact-z route: the correction runs separably off one
            # extra pivot halo evaluation (second-order cross error).
            p_sep = (p_all if (method == "fft" and not exact_z_anchors)
                     else limber_fft.p_lattice_halo_all(
                         cosmo, halo_params, model, with_bao, grid))
            out = _apply_nonlimber(cosmo, model, out, p_sep)
        return out

    def _validate(cosmo_batch):
        """Pipeline-aware host-side checks: this pipeline's own dist +
        grid feed the lattice-coverage test (chi(z_max) inside
        lattice_chi_hi; z_max within the Newton clamp) in addition to
        the generic physicality checks.  ``sweep(validate=True)`` calls
        this automatically when present.  The lattice checks only apply
        to the fft route — a method="table" pipeline never touches the
        conv lattice, so flagging its bounds there would be a spurious
        hard error."""
        from chomp_tpu.utils.diagnostics import validate_params

        return validate_params(cosmo=cosmo_batch, halo_params=halo_params,
                               hod=hod, grid=grid,
                               dist=dist if method == "fft" else None)

    fn.validate = _validate
    return fn


def _fused_probe_rows(cosmo, grid, piv, theta_key, rows, geometry):
    """ONE grouped lattice convolution for many probe rows, then one
    fused contraction PER DISTINCT OPERATOR over all rows requesting it
    — the dispatched-op count stays O(#operators), not O(#probes)
    (the axon remote-TPU wall-clock scales with op count, CLAUDE.md).

    ``rows``: list of (win_a, win_b, p_row, [(mu, stat), ...]) — e.g. a
    shear row requests both the J0/ξ+ and J4/ξ- transforms of ONE conv.
    Flat: wtheta_lattice_operator(mu).  Curved: curved_lattice_operator
    (exact multipole sums; ``stat`` selects the d^ℓ_{2,±2} codes).
    Operator conv j-windows are unioned and sliced per operator.
    Returns, per row, the list of (nb,) outputs matching its specs."""
    from chomp_tpu import limber_fft
    from chomp_tpu.ops.df32 import df_contract

    tk = tuple(np.asarray(theta_key, dtype=float).tolist())
    ops = {}
    for _wa, _wb, _p, specs in rows:
        for spec in specs:
            if spec not in ops:
                mu, stat = spec
                if geometry == "curved":
                    from chomp_tpu.curved import curved_lattice_operator

                    ops[spec] = curved_lattice_operator(tk, grid, mu,
                                                        stat=stat)
                else:
                    ops[spec] = limber_fft.wtheta_lattice_operator(
                        tk, grid, mu)
    j_lo = min(o[0] for o in ops.values())
    j_hi = max(o[1] for o in ops.values())
    g_rows = jnp.stack([limber_fft._lattice_g(cosmo, wa, wb, grid, piv)
                        for wa, wb, _p, _s in rows])
    p_rows = jnp.stack([p for _wa, _wb, p, _s in rows])
    conv = limber_fft._conv_direct_rows(p_rows, g_rows, j_lo, j_hi)
    by_op = {}
    for r, row in enumerate(rows):
        for spec in row[3]:
            by_op.setdefault(spec, []).append(r)
    res = {}
    for spec, rlist in by_op.items():
        lo, hi, a = ops[spec]
        contiguous = rlist == list(range(rlist[0], rlist[-1] + 1))
        sub = (conv[rlist[0]:rlist[-1] + 1] if contiguous
               else jnp.stack([conv[r] for r in rlist]))
        vals = df_contract(sub[:, lo - j_lo:hi - j_lo], a)
        for i, r in enumerate(rlist):
            res[(r, spec)] = vals[i]
    return [[res[(r, spec)] for spec in row[3]]
            for r, row in enumerate(rows)]


def make_tomographic_pipeline(halo_params, hod, lens_dists, src_dists,
                              theta_deg=None, z_pivot: float = 0.0,
                              with_bao: bool = False,
                              grid: GridSpec = DEFAULT_GRID,
                              geometry: str = "flat",
                              exact_z_anchors: int | None = None,
                              with_nuisance: bool = False,
                              include_magnification: bool = False,
                              include_cmb_lensing=False,
                              nonlimber_ell_switch: int | None = None,
                              nonlimber_rsd: bool = False,
                              matter_power: str = "halo"):
    """Tomographic 3x2pt prediction: fn(cosmo) -> dict with
    w_theta (n_lens, nb), gamma_t (n_lens*n_src, nb),
    xi_plus/xi_minus (n_src (n_src+1)/2, nb), and "vector" — the
    stacked 1-D data vector in covariance.tomographic_probes order
    (matching tomographic_3x2pt_covariance row order).

    ``include_cmb_lensing`` (True or a cmblens.CMBLensingSpec) appends
    the per-lens-bin CMB-lensing cross-correlations w_{g_i kappa_CMB}
    ("w_gk_cmb", (n_lens, nb); bin i's P_gm through the single-plane
    kappa_CMB window) to the outputs AND to "vector" — matching
    tomographic_3x2pt_covariance(cmb_lensing=...) row order.  With
    magnification, the observed cross gains c_i w_{kappa_i kappa_CMB}
    (P_mm), mirroring the gg/gt treatment; photo-z shifts ride the
    lens windows; shear calibration does not apply.  kappa_CMB rows
    keep plain Limber under ``nonlimber_ell_switch`` (broad kernel,
    <0.1% error — same class as xi_pm).

    ``with_nuisance=True``: fn(cosmo, nuisance) with a Nuisance3x2pt
    pytree — per-bin photo-z shifts (DNdzShifted), per-source-bin
    multiplicative shear calibration, and NLA intrinsic alignments
    (WindowConvergenceIA).  default_nuisance(...) reduces exactly to
    the plain pipeline; every nuisance is traced (grad/vmap/HMC-able).
    Not combinable with exact_z_anchors (the anchor window is sized at
    build time from concrete z_max, incompatible with traced Δz).

    ``include_magnification=True`` (requires with_nuisance) adds lens
    magnification bias with traced per-bin slopes α_i: the observed
    lens overdensity δ_obs = δ_g + 2(α_i-1) κ_i, so w_i gains
    2c w_{gκ_i}(P_gm) + c² w_{κ_iκ_i}(P_mm) and γt_{ij} gains
    c ⟨κ_i E_j⟩(P_mm), c = 2(α_i-1) — each term with its own spectrum
    (NOT a window substitution; the halo-model P_gg/P_gm/P_mm differ).
    α_i = 1 switches it off exactly.  The extra rows ride the same
    single grouped convolution.

    ONE halo evaluation per cosmology feeds every bin pair (the
    y-matrices dominate; the per-pair cost is one lattice convolution
    + one fused static-operator matmul).  ``hod`` is either ONE HOD
    shared by every lens bin (single-sample tomography) or a LIST of
    per-lens-bin HODs — then each bin's w/γt uses its own halo model
    (one shared mass-table build, halo.build_halo_models) and "n_g"
    becomes a per-bin vector.  ``geometry="flat"`` uses the
    FFTLog J0/J2/J4 transforms; ``geometry="curved"`` the exact sphere
    multipole sums (P_ℓ / d^ℓ_20 / d^ℓ_{2,±2} with the f_ℓ² κ→E
    prefactor) at the same runtime cost, as in make_pipeline.

    ``exact_z_anchors`` (e.g. 6-10) drops the separable-growth
    approximation for EVERY bin pair via one shared Chebyshev anchor
    expansion (limber_fft.exact_z_anchor_spectra) — the right mode for
    deep multi-bin tomography, where no single ``z_pivot`` serves both
    a z~0.4 lens bin and a z~1.2 source bin (the separable route is
    >10% off on C_ℓ for deep kernels pivoted at z=0, tests/
    test_exact_z_lattice.py).  Requires concrete dist.z_max (anchor
    window sized at build time).  Pure, jit/vmap/grad-able over
    ``cosmo``.

    ``nonlimber_ell_switch`` / ``nonlimber_rsd``: exact low-multipole
    repair of the Limber projection per bin pair, as in
    ``make_pipeline`` — every w_i and γt_{ij} row gains the additive
    tapered dC_ℓ correction (chomp_tpu.nonlimber; narrow tomographic
    lens bins are exactly where Limber fails: ~2x on C_gg at ℓ=2 for
    σ_z ~ 0.05); ξ± keep plain Limber (broad kernels, <0.1% error).
    Computed in the separable approximation (exact-z mode pays one
    extra pivot lattice evaluation per distinct HOD; the Limber-error ×
    evolution-error cross term is second order).  In nuisance mode the
    corrections use the shifted/IA windows and ride inside the (1+m_j)
    calibration; the IA piece of the source window is projected through
    the convergence kernel (its separate density-kernel correction is
    second-order small), and the magnification add-on rows keep plain
    Limber (doubly sub-leading).

    ``matter_power``: "halo" (default) | "halofit" | "linear" — swaps
    the mm legs (xi_pm rows, magnification mm add-ons, kappa_i x
    kappa_CMB) exactly as in ``make_pipeline``; gg/gm stay
    halo-model."""
    import numpy as np

    from chomp_tpu import halo as halo_mod
    from chomp_tpu import limber_fft

    if geometry not in ("flat", "curved"):
        raise ValueError(f"geometry must be 'flat' or 'curved', got "
                         f"{geometry!r}")
    if with_nuisance and exact_z_anchors:
        raise NotImplementedError(
            "with_nuisance shifts dN/dz with traced dz; the exact-z "
            "anchor window needs concrete z_max — use the separable "
            "route (or apply DNdzShifted with concrete dz yourself)")
    if include_magnification and not with_nuisance:
        raise ValueError("include_magnification needs with_nuisance="
                         "True (the slopes live in Nuisance3x2pt."
                         "alpha_lens)")
    if nonlimber_rsd and not nonlimber_ell_switch:
        raise ValueError("nonlimber_rsd requires nonlimber_ell_switch "
                         "(the RSD term rides the same correction "
                         "operators)")
    if matter_power not in ("halo", "halofit", "linear"):
        raise ValueError(f"matter_power must be halo|halofit|linear, "
                         f"got {matter_power!r}")
    if theta_deg is None:
        theta_deg = correlation.theta_bins_deg(grid)
    theta_key = np.asarray(theta_deg)
    base_wins_g = [projection.WindowGalaxy(dist=d) for d in lens_dists]
    base_wins_k = [projection.WindowConvergence(dist=d)
                   for d in src_dists]
    win_kcmb = None
    if include_cmb_lensing is not False and include_cmb_lensing is not None:
        from chomp_tpu.cmblens import as_cmb_spec

        win_kcmb = as_cmb_spec(include_cmb_lensing).window()
    n_src = len(base_wins_k)
    hods = (list(hod) if isinstance(hod, (list, tuple)) else None)
    if hods is not None and len(hods) != len(lens_dists):
        raise ValueError(f"per-bin HODs: got {len(hods)} HODs for "
                         f"{len(lens_dists)} lens bins")
    z_hi_anchor = (max(1.0, *(float(np.asarray(d.z_max))
                              for d in (*lens_dists, *src_dists)))
                   if exact_z_anchors else None)
    if not exact_z_anchors:
        for d in (*lens_dists, *src_dists):
            _warn_if_separable_bias(d, z_pivot)

    def fn(cosmo: CosmoParams, nuisance: Nuisance3x2pt | None = None):
        if with_nuisance:
            if nuisance is None:
                raise ValueError("with_nuisance=True: call "
                                 "fn(cosmo, nuisance)")
            nu = nuisance
            lens_cur = [projection.DNdzShifted(base=d, dz=nu.dz_lens[i])
                        for i, d in enumerate(lens_dists)]
            wins_g = [projection.WindowGalaxy(dist=d) for d in lens_cur]
            wins_k = [projection.WindowConvergenceIA(
                dist=projection.DNdzShifted(base=d, dz=nu.dz_src[j]),
                a_ia=nu.a_ia, eta_ia=nu.eta_ia, z0_ia=nu.z0_ia)
                for j, d in enumerate(src_dists)]
            wk_lens = ([projection.WindowConvergence(dist=d)
                        for d in lens_cur] if include_magnification
                       else None)
        else:
            wins_g, wins_k = base_wins_g, base_wins_k
            wk_lens = None
        if hods is not None:
            models = halo_mod.build_halo_models(cosmo, halo_params,
                                                hods, z_pivot, with_bao,
                                                grid)
        else:
            models = [halo_mod.build_halo_model(cosmo, halo_params, hod,
                                                z_pivot, with_bao, grid)]
        piv = models[0].mass.growth
        # Per-row lattice/anchor sources: (p, kind) for lens bin i's
        # clustering/lensing and for the shared matter sector.  The
        # pipeline never needs cross-bin gg, so per-bin mode stays at
        # n_lens separable halo evaluations (or n_lens anchor sweeps).
        if exact_z_anchors:
            anch = [limber_fft.exact_z_anchor_spectra(
                cosmo, halo_params, h_i,
                ("power_gg", "power_gm", "power_mm"), exact_z_anchors,
                1e-3, z_hi_anchor, with_bao, grid,
                matter_power=matter_power)
                for h_i in (hods if hods is not None else [hod])]
            if hods is None:            # one shared sweep for all bins
                anch = anch * len(wins_g)
            src_gg = [(a, "power_gg") for a in anch]
            src_gm = [(a, "power_gm") for a in anch]
            src_mm = (anch[0], "power_mm")
        elif hods is not None:
            p_all = limber_fft.p_lattice_tomographic(
                cosmo, halo_params, models, with_bao, grid)
            n_l = len(wins_g)
            src_gg = [(p_all, ("power_gg", i, i)) for i in range(n_l)]
            src_gm = [(p_all, ("power_gm", i)) for i in range(n_l)]
            src_mm = (p_all, "power_mm")
        else:
            p_all = limber_fft.p_lattice_halo_all(cosmo, halo_params,
                                                  models[0], with_bao,
                                                  grid)
            src_gg = [(p_all, "power_gg")] * len(wins_g)
            src_gm = [(p_all, "power_gm")] * len(wins_g)
            src_mm = (p_all, "power_mm")
        if matter_power != "halo" and not exact_z_anchors:
            src_mm = ({"power_mm": _mm_override(cosmo, z_pivot,
                                                matter_power, with_bao,
                                                grid)}, "power_mm")

        def w_of(src, wa, wb, mu, stat=None):
            p, kind = src
            if exact_z_anchors:
                if geometry == "curved":
                    from chomp_tpu.curved import curved_wtheta_from_anchors

                    return curved_wtheta_from_anchors(
                        cosmo, p, wa, wb, theta_key, kind, grid,
                        mu=mu, stat=stat)
                return limber_fft.limber_wtheta_from_anchors(
                    cosmo, p, wa, wb, theta_key, kind, grid, mu=mu)
            if geometry == "curved":
                from chomp_tpu.curved import curved_wtheta_fft

                return curved_wtheta_fft(
                    cosmo, wa, wb, theta_key, p[kind], grid, mu=mu,
                    growth_pivot=piv, stat=stat)
            return limber_fft.limber_wtheta_fft(
                cosmo, wa, wb, theta_key, p[kind], grid, mu=mu,
                growth_pivot=piv)

        pairs_xi = [(j, k) for j in range(n_src) for k in range(j, n_src)]
        stat_p = "xip" if geometry == "curved" else None
        stat_m = "xim" if geometry == "curved" else None
        if not exact_z_anchors:
            # Batched TPU fast path (flat AND curved): ALL probe rows
            # fuse into ONE grouped conv + one contraction per distinct
            # operator (_fused_probe_rows); the xi rows' convs are
            # shared between xi_+ and xi_-.
            n_l, n_gt = len(wins_g), len(wins_g) * n_src
            p_gg = [src_gg[i][0][src_gg[i][1]] for i in range(n_l)]
            p_gm = [src_gm[i][0][src_gm[i][1]] for i in range(n_l)]
            p_mm = src_mm[0][src_mm[1]]
            rows = ([(w, w, p_gg[i], [(0.0, None)])
                     for i, w in enumerate(wins_g)]
                    + [(wk, wg, p_gm[i], [(2.0, None)])
                       for i, wg in enumerate(wins_g) for wk in wins_k]
                    + [(wins_k[j], wins_k[k], p_mm,
                        [(0.0, stat_p), (4.0, stat_m)])
                       for j, k in pairs_xi])
            if wk_lens is not None:
                # Magnification rows: delta_obs = delta_g + c kappa,
                # c_i = 2(alpha_i - 1) — each term couples its OWN
                # spectrum (gm cross, mm auto); same grouped conv.
                rows += [r for i in range(n_l) for r in
                         ((wins_g[i], wk_lens[i], p_gm[i], [(0.0, None)]),
                          (wk_lens[i], wk_lens[i], p_mm, [(0.0, None)]))]
                rows += [(wk, wk_lens[i], p_mm, [(2.0, None)])
                         for i in range(n_l) for wk in wins_k]
            i_cmb = len(rows) if win_kcmb is not None else None
            if win_kcmb is not None:
                # kappa_CMB cross rows (appended last so the
                # magnification index bases b0/b1 above stand); the
                # magnified cross adds c_i x <kappa_i kappa_CMB>(P_mm).
                rows += [(wins_g[i], win_kcmb, p_gm[i], [(0.0, None)])
                         for i in range(n_l)]
                if wk_lens is not None:
                    rows += [(wk_lens[i], win_kcmb, p_mm, [(0.0, None)])
                             for i in range(n_l)]
            outs = _fused_probe_rows(cosmo, grid, piv, theta_key, rows,
                                     geometry)
            w_rows = [o[0] for o in outs[:n_l]]
            gt_rows = [o[0] for o in outs[n_l:n_l + n_gt]]
            xip_rows = [o[0] for o in outs[n_l + n_gt:n_l + n_gt
                                           + len(pairs_xi)]]
            xim_rows = [o[1] for o in outs[n_l + n_gt:n_l + n_gt
                                           + len(pairs_xi)]]
            if wk_lens is not None:
                c = 2.0 * (nuisance.alpha_lens - 1.0)
                b0 = n_l + n_gt + len(pairs_xi)
                w_rows = [w_rows[i]
                          + 2.0 * c[i] * outs[b0 + 2 * i][0]
                          + c[i] ** 2 * outs[b0 + 2 * i + 1][0]
                          for i in range(n_l)]
                b1 = b0 + 2 * n_l
                gt_rows = [gt_rows[i * n_src + j]
                           + c[i] * outs[b1 + i * n_src + j][0]
                           for i in range(n_l) for j in range(n_src)]
            if win_kcmb is not None:
                wgk_rows = [outs[i_cmb + i][0] for i in range(n_l)]
                if wk_lens is not None:
                    c = 2.0 * (nuisance.alpha_lens - 1.0)
                    wgk_rows = [wgk_rows[i]
                                + c[i] * outs[i_cmb + n_l + i][0]
                                for i in range(n_l)]
        else:
            w_rows = [w_of(src_gg[i], w, w, 0.0)
                      for i, w in enumerate(wins_g)]
            gt_rows = [w_of(src_gm[i], wk, wg, 2.0)
                       for i, wg in enumerate(wins_g) for wk in wins_k]
            xip_rows = [w_of(src_mm, wins_k[j], wins_k[k], 0.0, stat_p)
                        for j, k in pairs_xi]
            xim_rows = [w_of(src_mm, wins_k[j], wins_k[k], 4.0, stat_m)
                        for j, k in pairs_xi]
            if win_kcmb is not None:
                wgk_rows = [w_of(src_gm[i], w, win_kcmb, 0.0)
                            for i, w in enumerate(wins_g)]
        if nonlimber_ell_switch:
            # Exact low-ell Limber repair per bin pair (before the
            # (1+m) calibration — it scales the full theory gt).  See
            # the docstring note; xi rows keep plain Limber.
            from chomp_tpu import nonlimber

            sw = int(nonlimber_ell_switch)
            tkk = tuple(np.asarray(theta_key, dtype=float).tolist())
            kk = "k_E" if geometry == "curved" else "k_flat"
            n_l = len(wins_g)
            if exact_z_anchors:
                # One extra pivot lattice evaluation per distinct HOD
                # (the correction runs separably; cross error is
                # second order — same policy as make_pipeline).
                if hods is not None:
                    p_nl = limber_fft.p_lattice_tomographic(
                        cosmo, halo_params, models, with_bao, grid)
                    pgg_nl = [p_nl[("power_gg", i, i)]
                              for i in range(n_l)]
                    pgm_nl = [p_nl[("power_gm", i)] for i in range(n_l)]
                else:
                    p_nl = limber_fft.p_lattice_halo_all(
                        cosmo, halo_params, models[0], with_bao, grid)
                    pgg_nl = [p_nl["power_gg"]] * n_l
                    pgm_nl = [p_nl["power_gm"]] * n_l
            elif hods is not None:
                pgg_nl = [p_all[("power_gg", i, i)] for i in range(n_l)]
                pgm_nl = [p_all[("power_gm", i)] for i in range(n_l)]
            else:
                pgg_nl = [p_all["power_gg"]] * n_l
                pgm_nl = [p_all["power_gm"]] * n_l
            op_w = jnp.asarray(nonlimber.correction_operator(
                tkk, 0.0, sw, 20, geometry))
            op_g = jnp.asarray(nonlimber.correction_operator(
                tkk, 2.0, sw, 20, geometry))
            hp = jax.lax.Precision.HIGHEST
            for i in range(n_l):
                m_i = models[i] if hods is not None else models[0]
                d_w = nonlimber.delta_cl_nodes(
                    cosmo, wins_g[i], wins_g[i], pgg_nl[i], sw, grid,
                    ("d", "d"), piv)
                if nonlimber_rsd:
                    d_w = d_w + nonlimber.rsd_delta_cl_nodes(
                        cosmo, halo_params, m_i, wins_g[i], wins_g[i],
                        sw, grid, "d", piv, with_bao=with_bao)
                w_rows[i] = w_rows[i] + jnp.matmul(op_w, d_w,
                                                   precision=hp)
                for j in range(n_src):
                    d_g = nonlimber.delta_cl_nodes(
                        cosmo, wins_g[i], wins_k[j], pgm_nl[i], sw,
                        grid, ("d", kk), piv)
                    if nonlimber_rsd:
                        d_g = d_g + nonlimber.rsd_delta_cl_nodes(
                            cosmo, halo_params, m_i, wins_g[i],
                            wins_k[j], sw, grid, kk, piv,
                            with_bao=with_bao)
                    gt_rows[i * n_src + j] = (
                        gt_rows[i * n_src + j]
                        + jnp.matmul(op_g, d_g, precision=hp))
        if with_nuisance:
            # Multiplicative shear calibration: gamma_hat = (1+m) gamma.
            cal = 1.0 + nuisance.m
            gt_rows = [gt_rows[i * n_src + j] * cal[j]
                       for i in range(len(wins_g))
                       for j in range(n_src)]
            xip_rows = [row * (cal[j] * cal[k])
                        for (j, k), row in zip(pairs_xi, xip_rows)]
            xim_rows = [row * (cal[j] * cal[k])
                        for (j, k), row in zip(pairs_xi, xim_rows)]
        out = {
            "theta_deg": jnp.asarray(theta_key),
            "w_theta": jnp.stack(w_rows),
            "gamma_t": jnp.stack(gt_rows),
            "xi_plus": jnp.stack(xip_rows),
            "xi_minus": jnp.stack(xim_rows),
            "n_g": (jnp.stack([m.n_g for m in models])
                    if hods is not None else models[0].n_g),
        }
        tail = []
        if win_kcmb is not None:
            out["w_gk_cmb"] = jnp.stack(wgk_rows)
            tail = wgk_rows
        out["vector"] = jnp.concatenate(
            w_rows + gt_rows + xip_rows + xim_rows + tail)
        return out

    return fn


def sweep(fn, cosmo_batch: CosmoParams, mesh: jax.sharding.Mesh | None = None,
          axis: str = "data", validate: bool = False):
    """Run ``fn`` over a batch of cosmologies.

    Without a mesh: one jitted vmap on the local device.  With a mesh:
    the batch axis is sharded over ``axis`` via NamedSharding and XLA
    GSPMD partitions the whole program — each chip computes its slice,
    outputs stay sharded (gather happens lazily on host read, over ICI).

    ``validate=True`` runs host-side physicality checks on the concrete
    batch first and raises with every problem listed — jitted code
    cannot raise, so unphysical parameters otherwise propagate NaN
    silently (utils.diagnostics.validate_params).
    """
    if validate:
        validator = getattr(fn, "validate", None)
        if validator is not None:
            problems = validator(cosmo_batch)
        else:
            from chomp_tpu.utils.diagnostics import validate_params

            problems = validate_params(cosmo=cosmo_batch)
        if problems:
            raise ValueError("unphysical sweep parameters:\n  - "
                             + "\n  - ".join(problems))
    batched = jax.jit(jax.vmap(fn))
    if mesh is None:
        return batched(cosmo_batch)
    spec = jax.sharding.PartitionSpec(axis)
    sharding = jax.sharding.NamedSharding(mesh, spec)
    cosmo_batch = jax.device_put(cosmo_batch, sharding)
    out_sharding = jax.sharding.NamedSharding(mesh, spec)
    return jax.jit(jax.vmap(fn), out_shardings=out_sharding)(cosmo_batch)


def write_chunk(path, result: dict):
    """npz dump of a sweep chunk (SURVEY.md §5.4: the checkpoint/resume
    analog — sweeps are stateless, recovery = re-run the failed chunk)."""
    np.savez(path, **{k: np.asarray(v) for k, v in result.items()})


def make_inference_step(fn_observable, data, invcov, learning_rate=1e-3):
    """Gradient-based cosmology fitting (the 'training step' of this
    library): chi^2(params) = r^T C^-1 r with r = fn_observable(params) -
    data, one optax adam step.  Returns (init_fn, step_fn)."""
    import optax

    opt = optax.adam(learning_rate)

    def loss(params):
        r = fn_observable(params) - data
        return r @ (invcov @ r)

    def init_fn(params):
        return opt.init(params)

    @jax.jit
    def step_fn(params, opt_state):
        val, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, val

    return init_fn, step_fn


def sweep_chunked(fn, cosmo_batch: CosmoParams, out_dir, chunk_size: int = 32,
                  mesh: jax.sharding.Mesh | None = None, axis: str = "data",
                  chunk_offset: int = 0, chunk_stride: int = 1):
    """Chunked, RESUMABLE sweep (SURVEY.md §5.3/§5.4: the failure-
    detection/recovery analog — sweeps are stateless, so recovery is
    re-running only missing chunks).

    Splits the batch into ``chunk_size`` pieces, writes each result to
    ``out_dir/chunk_{i:05d}_{tag}.npz`` as it completes, and SKIPS
    chunks whose output file already exists — rerunning after a crash
    (or on another host working on the same shared directory) resumes
    where it left off.  ``tag`` is a hash of the chunk's INPUT slice, so
    a rerun with a different cosmology batch or chunk_size cannot
    silently reuse stale chunk files.

    ``chunk_offset``/``chunk_stride`` restrict COMPUTATION to global
    chunk indices i ≡ offset (mod stride) — the multi-host work split
    (chomp_tpu.parallel.multihost) — while filenames stay keyed by the
    global index, so any process mix produces one consistent directory.
    Returns the list of ALL chunk paths (including ones this call did
    not own).
    """
    import hashlib
    import os

    import numpy as onp

    os.makedirs(out_dir, exist_ok=True)
    n = int(jax.tree_util.tree_leaves(cosmo_batch)[0].shape[0])
    paths = []
    for i, start in enumerate(range(0, n, chunk_size)):
        chunk = jax.tree_util.tree_map(
            lambda x: x[start:start + chunk_size], cosmo_batch)
        h = hashlib.sha1()
        for leaf in jax.tree_util.tree_leaves(chunk):
            h.update(onp.ascontiguousarray(onp.asarray(leaf)).tobytes())
        path = os.path.join(out_dir,
                            f"chunk_{i:05d}_{h.hexdigest()[:10]}.npz")
        paths.append(path)
        if i % chunk_stride != chunk_offset % chunk_stride:
            continue                # another process owns this chunk
        if os.path.exists(path):
            continue
        result = sweep(fn, chunk, mesh=mesh, axis=axis)
        tmp = path + f".tmp.{os.getpid()}.npz"
        onp.savez(tmp, **{k: onp.asarray(v) for k, v in result.items()})
        os.replace(tmp, path)       # atomic: no torn chunks on crash
    return paths


def read_chunks(paths):
    """Concatenate chunk outputs back into full arrays."""
    import numpy as onp

    datas = [onp.load(p) for p in paths]
    keys = datas[0].files
    return {k: onp.concatenate([d[k] for d in datas], axis=0) for k in keys}
