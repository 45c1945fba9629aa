"""Inference on top of the pipelines: likelihood, Fisher, MAP, HMC.

Capability extension beyond chomp (the scipy-object reference computes
one model at a time with no derivatives — upstream:correlation.py /
SURVEY.md §2 row 12): because the entire prediction stack is pure
jit/grad-able JAX, the standard inference loop is a library surface,
not an external sampler bolted on.  This module packages the patterns
validated in examples/{fit,tomographic,hmc}_example.py:

  - ``make_theory_fn``: flat parameter vector -> (CosmoParams
    [, Nuisance3x2pt]) -> pipeline -> data vector, with the flatness
    constraint (omega_l0 = 1 - omega_m0) applied by default.  One
    traced function of a single 1-D array — everything downstream
    (grad, Fisher, HMC) needs exactly this shape.
  - ``GaussianLikelihood``: chi^2 through a Cholesky solve (never an
    explicit inverse), optional Gaussian priors and a smooth-barrier
    box (keeps -log posterior finite and jittable outside the box).
  - ``fisher_matrix``: F = J^T C^{-1} J (+ prior curvature), one
    jacfwd through the pipeline — forward mode, so the cost scales
    with the (small) parameter count, not the data-vector length.
  - ``map_fit``: optax adam on the negative log posterior, the whole
    trajectory in one lax.scan (jitted once, no per-step dispatch).
  - ``hmc``: fixed-mass-matrix leapfrog HMC, one lax.scan per chain,
    vmap-able to many chains.  The Fisher matrix is the natural mass
    matrix (momenta ~ N(0, F) gives unit condition number locally).

TPU notes: every routine here is a pure function of arrays — jit once,
the chain/optimizer loop runs on-device with zero host round-trips.
Reverse-mode gradient cost is parameter-count independent (one extra
pipeline-adjoint per step); HMC with n_leap leapfrog steps costs
~n_leap gradient evaluations per sample (measured in
examples/hmc_example.py: ~1 ms/gradient on v5e for the w+gt pipeline).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_theory_fn",
    "GaussianLikelihood",
    "PoissonLikelihood",
    "CompositeLikelihood",
    "fisher_matrix",
    "map_fit",
    "hmc",
    "marginalized_covariance",
    "point_mass_templates",
    "theta_cut_mask",
    "apply_scale_cuts",
]


def make_theory_fn(pipeline_fn, cosmo0, cosmo_names=("omega_m0", "sigma_8"),
                   nuisance0=None, nuisance_names=(), flat: bool = True,
                   output: str = "vector"):
    """(theory_fn, p0): a traced map from ONE flat parameter vector to
    the pipeline's data vector, plus the fiducial vector.

    Parameters
    ----------
    pipeline_fn : callable
        ``fn(cosmo)`` or ``fn(cosmo, nuisance)`` (when ``nuisance0`` is
        given) returning either an array or a dict holding ``output``.
    cosmo0 : CosmoParams
        Fiducial cosmology; sampled fields are replaced, the rest stay.
    cosmo_names : sequence of str
        CosmoParams field names sampled (scalars, in vector order).
    nuisance0 : pytree dataclass or None
        Fiducial nuisance (e.g. parallel.sweep.default_nuisance).
        Sampled leaves are replaced WHOLE: a (n,) leaf like ``m``
        occupies n consecutive vector slots.
    nuisance_names : sequence of str
        Nuisance field names appended after the cosmology block.
    flat : bool
        Enforce omega_l0 = 1 - omega_m0 whenever omega_m0 is sampled
        and omega_l0 is not (the standard flat-LCDM/wCDM setup).
    output : str
        Dict key to extract ("vector" for the tomographic pipeline);
        ignored when the pipeline returns a bare array.

    The returned ``theory_fn(p)`` is pure-JAX: jit/grad/vmap at will.
    """
    cosmo_names = tuple(cosmo_names)
    nuisance_names = tuple(nuisance_names)
    for n in cosmo_names:
        if not hasattr(cosmo0, n):
            raise AttributeError(f"CosmoParams has no field {n!r}")
    apply_flat = (flat and "omega_m0" in cosmo_names
                  and "omega_l0" not in cosmo_names)
    n_cos = len(cosmo_names)
    # Nuisance block layout: each named leaf contributes its size.
    sizes, shapes = [], []
    for n in nuisance_names:
        leaf = getattr(nuisance0, n)
        sizes.append(int(np.size(leaf)))
        shapes.append(np.shape(leaf))
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(int)

    def theory_fn(p):
        p = jnp.asarray(p)
        upd = {n: p[i] for i, n in enumerate(cosmo_names)}
        if apply_flat:
            upd["omega_l0"] = 1.0 - p[cosmo_names.index("omega_m0")]
        c = dataclasses.replace(cosmo0, **upd)
        if nuisance0 is not None:
            nupd = {
                n: p[n_cos + offs[i]:n_cos + offs[i + 1]].reshape(shapes[i])
                for i, n in enumerate(nuisance_names)}
            out = pipeline_fn(c, dataclasses.replace(nuisance0, **nupd))
        else:
            out = pipeline_fn(c)
        return out[output] if isinstance(out, dict) else out

    p0 = [float(getattr(cosmo0, n)) for n in cosmo_names]
    for n in nuisance_names:
        p0.extend(np.asarray(getattr(nuisance0, n), dtype=float).ravel())
    return theory_fn, jnp.asarray(np.asarray(p0))


class GaussianLikelihood:
    """-2 ln L = (t(p) - d)^T C^{-1} (t(p) - d) with a FIXED data
    covariance, plus optional Gaussian priors and a smooth-barrier box.

    The covariance is Cholesky-factored once at build (host-side
    numpy); ``chi2`` solves the triangular system instead of applying
    an explicit inverse — exact for any conditioning the factorization
    admits.  All evaluation methods are pure JAX functions of the flat
    parameter vector from ``make_theory_fn``.

    Parameters
    ----------
    theory_fn, data, cov : the model map, observed vector, covariance.
    prior_mean, prior_sigma : optional per-parameter Gaussian priors
        (NaN/inf sigma entries = unconstrained).
    lower, upper : optional box; outside it the negative log posterior
        gains a large finite penalty (1e6 per violated bound) so
        samplers/optimizers stay jittable and recover.
    templates : optional (n_t, n_data) array of linear nuisance
        TEMPLATES whose amplitudes are marginalized ANALYTICALLY —
        the model is t(p) + Σ_a α_a T_a with Gaussian (or improper
        flat) priors on the α's, and the α-integral of the Gaussian
        likelihood is done in closed form:

            chi²_marg = r^T C⁻¹ r − b^T A⁻¹ b,
            b = T C⁻¹ r,  A = T C⁻¹ T^T + diag(1/σ_α²),

        the Sherman–Morrison–Woodbury quadratic form of the inflated
        covariance C + T^T diag(σ_α²) T, but exact at σ_α = ∞ (entries
        of ``template_sigma`` may be inf/NaN/None for the improper
        flat prior — the standard treatment of the γt point-mass term
        and additive systematics; MacCrann et al. 2020 point to the
        same algebra).  Everything is precomputed against the Cholesky
        factor at build: per-evaluation cost is one extra (n_data,
        n_t) matvec + an (n_t, n_t) solve.  ``fisher`` uses the same
        marginalized metric, so template-degenerate parameter
        directions correctly lose their information.
    template_sigma : optional (n_t,) prior widths for the template
        amplitudes (default: all improper/flat).
    """

    def __init__(self, theory_fn, data, cov, prior_mean=None,
                 prior_sigma=None, lower=None, upper=None,
                 templates=None, template_sigma=None):
        self.theory_fn = theory_fn
        self.data = jnp.asarray(data)
        cov = np.asarray(cov, dtype=np.float64)
        if cov.shape != (self.data.size, self.data.size):
            raise ValueError(f"cov shape {cov.shape} does not match "
                             f"data length {self.data.size}")
        chol = np.linalg.cholesky(cov)
        self._chol = jnp.asarray(chol)
        # ln det C and the Gaussian normalization are constant —
        # irrelevant for sampling a fixed covariance; chi2 is the
        # quantity every consumer wants.
        if templates is not None:
            t = np.atleast_2d(np.asarray(templates, dtype=np.float64))
            if t.shape[1] != self.data.size:
                raise ValueError(f"templates shape {t.shape} does not "
                                 f"match data length {self.data.size}")
            import scipy.linalg as sla
            yt = sla.solve_triangular(chol, t.T, lower=True)  # L⁻¹ Tᵀ
            a = yt.T @ yt
            if template_sigma is not None:
                ts = np.asarray(template_sigma, dtype=float).reshape(-1)
                if ts.size != t.shape[0]:
                    raise ValueError("template_sigma length != n_t")
                if np.any(ts == 0.0):
                    # sigma -> 0 pins the amplitude to zero (an inert
                    # template) — the OPPOSITE of the flat prior the
                    # isfinite branch encodes; silently mapping 0 to
                    # "flat" would invert the user's intent.  Drop the
                    # template instead of passing 0.
                    raise ValueError(
                        "template_sigma == 0 means a template pinned to "
                        "zero amplitude — remove that template instead; "
                        "only inf/NaN entries mean the improper flat "
                        "prior")
                a = a + np.diag(np.where(np.isfinite(ts),
                                         1.0 / ts**2, 0.0))
            self._yt = jnp.asarray(yt)                        # (n_d, n_t)
            self._a_chol = jnp.asarray(np.linalg.cholesky(a))
        else:
            self._yt = None
        self.prior_mean = (None if prior_mean is None
                           else jnp.asarray(prior_mean))
        if prior_sigma is not None:
            ps = np.asarray(prior_sigma, dtype=float)
            w = np.where(np.isfinite(ps) & (ps > 0), 1.0 / ps**2, 0.0)
            self._prior_w = jnp.asarray(w)
        else:
            self._prior_w = None
        self.lower = None if lower is None else jnp.asarray(lower)
        self.upper = None if upper is None else jnp.asarray(upper)

    def chi2(self, p):
        r = self.theory_fn(p) - self.data
        y = jax.scipy.linalg.solve_triangular(self._chol, r, lower=True)
        out = y @ y
        if self._yt is not None:
            b = self._yt.T @ y
            z = jax.scipy.linalg.cho_solve((self._a_chol, True), b)
            out = out - b @ z
        return out

    def log_like(self, p):
        return -0.5 * self.chi2(p)

    def neg_log_post(self, p):
        p = jnp.asarray(p)
        u = 0.5 * self.chi2(p)
        if self._prior_w is not None:
            d = p - (self.prior_mean if self.prior_mean is not None
                     else jnp.zeros_like(p))
            u = u + 0.5 * jnp.sum(self._prior_w * d * d)
        if self.lower is not None:
            u = u + jnp.sum(jnp.where(p < self.lower, 1e6, 0.0))
        if self.upper is not None:
            u = u + jnp.sum(jnp.where(p > self.upper, 1e6, 0.0))
        return u

    def fisher(self, p0):
        """Fisher matrix at p0 including the Gaussian-prior curvature
        (the natural HMC mass matrix / forecast covariance inverse).
        With templates, uses the marginalized metric
        M = C⁻¹ − C⁻¹T^T A⁻¹ T C⁻¹ — a parameter direction whose
        response lies along a flat-prior template carries ZERO
        information, as it must."""
        p0 = jnp.asarray(p0)
        jac = jax.jacfwd(self.theory_fn)(p0)             # (n_d, n_par)
        yj = jax.scipy.linalg.solve_triangular(self._chol, jac,
                                               lower=True)
        f = yj.T @ yj
        if self._yt is not None:
            bj = self._yt.T @ yj                          # (n_t, n_par)
            zj = jax.scipy.linalg.cho_solve((self._a_chol, True), bj)
            f = f - bj.T @ zj
        if self._prior_w is not None:
            f = f + jnp.diag(self._prior_w)
        return f


class PoissonLikelihood:
    """-ln L = Σ [λ(p) - N ln λ(p)] (+ data-only constant) for counts
    data — the right likelihood for sparse cluster-count bins where the
    Gaussian approximation breaks (N ≲ 20), e.g. high-mass/high-z
    cells of chomp_tpu.clusters.cluster_counts.

    Same surface as GaussianLikelihood (log_like / neg_log_post /
    fisher; optional Gaussian priors and box), so it composes into
    map_fit / hmc / CompositeLikelihood unchanged.  ``theory_fn(p)``
    must return the EXPECTED counts (positive; a tiny floor keeps the
    log finite if a parameter excursion empties a bin).
    """

    def __init__(self, theory_fn, data, prior_mean=None,
                 prior_sigma=None, lower=None, upper=None):
        self.theory_fn = theory_fn
        self.data = jnp.asarray(data)
        self.prior_mean = (None if prior_mean is None
                           else jnp.asarray(prior_mean))
        if prior_sigma is not None:
            ps = np.asarray(prior_sigma, dtype=float)
            w = np.where(np.isfinite(ps) & (ps > 0), 1.0 / ps**2, 0.0)
            self._prior_w = jnp.asarray(w)
        else:
            self._prior_w = None
        self.lower = None if lower is None else jnp.asarray(lower)
        self.upper = None if upper is None else jnp.asarray(upper)

    def log_like(self, p):
        lam = jnp.maximum(jnp.asarray(self.theory_fn(p)).reshape(-1),
                          1e-300)
        n = self.data.reshape(-1)
        return jnp.sum(n * jnp.log(lam) - lam)

    def neg_log_post(self, p):
        p = jnp.asarray(p)
        u = -self.log_like(p)
        if self._prior_w is not None:
            d = p - (self.prior_mean if self.prior_mean is not None
                     else jnp.zeros_like(p))
            u = u + 0.5 * jnp.sum(self._prior_w * d * d)
        if self.lower is not None:
            u = u + jnp.sum(jnp.where(p < self.lower, 1e6, 0.0))
        if self.upper is not None:
            u = u + jnp.sum(jnp.where(p > self.upper, 1e6, 0.0))
        return u

    def fisher(self, p0):
        """Expected Poisson information F = J^T diag(1/λ) J (+ prior
        curvature): the exact expectation of -∂² ln L for Poisson
        data, since Var(N) = λ."""
        p0 = jnp.asarray(p0)
        lam = jnp.maximum(jnp.asarray(self.theory_fn(p0)).reshape(-1),
                          1e-300)
        jac = jax.jacfwd(
            lambda p: jnp.asarray(self.theory_fn(p)).reshape(-1))(p0)
        f = (jac / lam[:, None]).T @ jac
        if self._prior_w is not None:
            f = f + jnp.diag(self._prior_w)
        return f


class CompositeLikelihood:
    """Sum of independent likelihood blocks over ONE shared flat
    parameter vector — e.g. a Gaussian 3x2pt block plus a Poisson
    cluster-counts block (when the SSC cross-correlation matters,
    prefer ONE GaussianLikelihood over the stacked vector with
    clusters.joint_counts_3x2pt_covariance instead).  Exposes the same
    neg_log_post / log_like / fisher surface, so map_fit and hmc work
    unchanged."""

    def __init__(self, likes):
        self.likes = tuple(likes)
        if not self.likes:
            raise ValueError("CompositeLikelihood needs >= 1 block")

    def log_like(self, p):
        out = self.likes[0].log_like(p)
        for lk in self.likes[1:]:
            out = out + lk.log_like(p)
        return out

    def neg_log_post(self, p):
        out = self.likes[0].neg_log_post(p)
        for lk in self.likes[1:]:
            out = out + lk.neg_log_post(p)
        return out

    def fisher(self, p0):
        out = self.likes[0].fisher(p0)
        for lk in self.likes[1:]:
            out = out + lk.fisher(p0)
        return out


def moped_compression(theory_fn, cov, p0):
    """MOPED (Heavens, Jimenez & Lahav 2000) lossless linear
    compression: (B, compress) with B (n_par, n_data) the compression
    vectors built by Gram-Schmidt over the Fisher metric, so the
    n_par compressed numbers y = B (d - t(p0)) carry the ENTIRE Fisher
    information of the full vector (exactly, for a Gaussian likelihood
    with parameter-independent covariance) and have Cov(y) = I.

    Use: compress a 10^2-10^4-entry 3x2pt(+N) vector to n_par numbers
    once at the fiducial; downstream chains evaluate
    GaussianLikelihood(compress ∘ theory_fn, compress(data), I) — the
    per-step cost is unchanged (the pipeline still runs) but the
    covariance solve is trivial and cut-insensitive.  Returns
    (b_matrix, compress_fn)."""
    p0 = jnp.asarray(p0)
    jac = np.asarray(jax.jacfwd(theory_fn)(p0), dtype=np.float64)
    cov = np.asarray(cov, dtype=np.float64)
    cinv_j = np.linalg.solve(cov, jac)               # C^{-1} J
    rows = []
    for a in range(jac.shape[1]):
        b = cinv_j[:, a]
        for r in rows:
            b = b - (jac[:, a] @ r) * r
        norm = b @ cov @ b
        rows.append(b / np.sqrt(norm))
    b_mat = jnp.asarray(np.stack(rows))

    def compress(vec):
        return jnp.matmul(b_mat, jnp.asarray(vec),
                          precision=jax.lax.Precision.HIGHEST)

    return b_mat, compress


def marginalized_covariance(cov, templates, sigmas):
    """The explicitly inflated covariance C + T^T diag(σ²) T for
    FINITE template-amplitude priors — the matrix-level equivalent of
    GaussianLikelihood(templates=, template_sigma=) (exact identity by
    Sherman–Morrison–Woodbury; tested).  Use when a downstream
    consumer wants one matrix (e.g. an external sampler); prefer the
    likelihood-level route for improper (σ=∞) priors, which no finite
    matrix represents."""
    cov = np.asarray(cov, dtype=np.float64)
    t = np.atleast_2d(np.asarray(templates, dtype=np.float64))
    s2 = np.asarray(sigmas, dtype=float).reshape(-1) ** 2
    if s2.size not in (1, t.shape[0]):
        raise ValueError(f"sigmas length {s2.size} != n_templates "
                         f"{t.shape[0]} (scalar broadcast is allowed)")
    if not np.all(np.isfinite(s2)):
        raise ValueError("marginalized_covariance needs finite sigmas; "
                         "use GaussianLikelihood(templates=) for the "
                         "improper flat prior")
    return cov + (t.T * s2) @ t


def point_mass_templates(n_lens, n_src, theta_deg, mode: str = "pair",
                         beta=None, cmb_lensing: bool = False,
                         n_counts: int = 0):
    """Point-mass (enclosed-mass) templates for the γt rows of the
    tomographic 3x2pt data vector.

    A residual point mass B at the lens adds Δγt(θ) = B/(Σ_crit θ²) —
    the exact non-local imprint of all unmodelled small-scale mass
    (MacCrann et al. 2020's analytic-marginalization target).  This
    builds the (n_t, n_data) template array over the
    ``covariance.tomographic_probes(n_lens, n_src, cmb_lensing)``
    data-vector order with ``len(theta_deg)`` θ-points per probe,
    matching ``make_tomographic_pipeline``'s stacking:
    1/θ² evaluated at the pipeline's θ points (the prediction
    convention — point evaluations at log-spaced centers,
    correlation.theta_bins_deg), zeros everywhere else.

    mode="pair" (default): one free amplitude per (lens i, source j)
    pair — n_lens*n_src templates; conservative, needs no Σ_crit.
    mode="lens": one amplitude per LENS bin, the source-bin scaling
    fixed by ``beta`` (n_lens, n_src) ∝ ⟨Σ_crit⁻¹⟩_{ij} — n_lens
    templates (the tighter DES-Y3-style treatment; ``beta`` required).

    ``n_counts``: number of cluster-count bins appended AFTER the
    3x2pt block (clusters.joint_counts_3x2pt_covariance stacking) —
    extends the templates with zeros there.  Amplitude units are
    absorbed by the free amplitude; only the 1/θ² shape matters.
    Pair with GaussianLikelihood(templates=...) for exact analytic
    marginalization."""
    theta = np.asarray(theta_deg, dtype=float).reshape(-1)
    nb = theta.size
    shape = 1.0 / theta**2
    # Probe block layout: w_i | gt_{ij} | xip_{j<=k} | xim_{j<=k} | wgk_i
    n_pairs = n_src * (n_src + 1) // 2
    n_probe = (n_lens + n_lens * n_src + 2 * n_pairs
               + (n_lens if cmb_lensing else 0))
    n_data = n_probe * nb + int(n_counts)

    def gt_block(i, j):
        return (n_lens + i * n_src + j) * nb

    if mode == "pair":
        out = np.zeros((n_lens * n_src, n_data))
        for i in range(n_lens):
            for j in range(n_src):
                s = gt_block(i, j)
                out[i * n_src + j, s:s + nb] = shape
    elif mode == "lens":
        if beta is None:
            raise ValueError("mode='lens' needs beta (n_lens, n_src) "
                             "∝ <Sigma_crit^-1> per pair")
        beta = np.asarray(beta, dtype=float)
        if beta.shape != (n_lens, n_src):
            raise ValueError(f"beta shape {beta.shape} != "
                             f"({n_lens}, {n_src})")
        out = np.zeros((n_lens, n_data))
        for i in range(n_lens):
            for j in range(n_src):
                s = gt_block(i, j)
                out[i, s:s + nb] = beta[i, j] * shape
    else:
        raise ValueError(f"mode must be 'pair' or 'lens', got {mode!r}")
    return out


def theta_cut_mask(n_lens, n_src, theta_deg, cuts,
                   cmb_lensing: bool = False, n_counts: int = 0,
                   default=(0.0, np.inf)):
    """Boolean keep-mask over the tomographic data vector from
    per-probe angular scale cuts.

    ``cuts``: dict mapping probe names ("gt_01") or family prefixes
    ("w", "gt", "xip", "xim", "wgk") to (θ_min_deg, θ_max_deg); a
    specific name overrides its family; ``default`` applies otherwise.
    Returns keep (n_data,) bool — θ-points inside the CLOSED interval
    [θ_min, θ_max] survive (boundary points are kept).  Count bins
    (``n_counts``, appended last) are
    always kept — cut them by hand if needed.  Feed to
    ``apply_scale_cuts``."""
    from chomp_tpu.covariance import tomographic_probes

    theta = np.asarray(theta_deg, dtype=float).reshape(-1)
    nb = theta.size
    probes = tomographic_probes(n_lens, n_src, cmb_lensing=cmb_lensing)
    keep = []
    for (name, _mu, _ch) in probes:
        fam = name.split("_")[0]
        lo, hi = cuts.get(name, cuts.get(fam, default))
        keep.append((theta >= lo) & (theta <= hi))
    keep.append(np.ones(int(n_counts), dtype=bool))
    return np.concatenate(keep)


def apply_scale_cuts(keep, theory_fn, data, cov, templates=None,
                     template_sigma=None):
    """Restrict (theory_fn, data, cov [, templates]) to the kept
    entries of a boolean mask — the standard scale-cut operation.
    The cut theory_fn stays pure-JAX (static boolean gather at trace
    time, free under jit).  Templates that become all-zero under the
    cut are DROPPED (their amplitude would be unconstrained and A
    singular) — pass ``template_sigma`` to have the matching prior
    entries dropped in sync (a caller-held sigma vector would
    otherwise desynchronize from the surviving template rows).
    Returns (theory_fn', data', cov'),
    (theory_fn', data', cov', templates'), or
    (theory_fn', data', cov', templates', template_sigma')."""
    keep = np.asarray(keep, dtype=bool).reshape(-1)
    data = np.asarray(data)
    if keep.size != data.size:
        raise ValueError(f"mask length {keep.size} != data {data.size}")
    idx = jnp.asarray(np.nonzero(keep)[0])

    def cut_fn(p):
        return jnp.take(theory_fn(p), idx, axis=0)

    cov = np.asarray(cov)[np.ix_(keep, keep)]
    if templates is None:
        if template_sigma is not None:
            raise ValueError("template_sigma given without templates")
        return cut_fn, data[keep], cov
    t = np.atleast_2d(np.asarray(templates))[:, keep]
    row_keep = np.any(t != 0.0, axis=1)
    t = t[row_keep]
    if templates is not None and template_sigma is None:
        return cut_fn, data[keep], cov, t
    ts = np.asarray(template_sigma, dtype=float).reshape(-1)
    if ts.size != row_keep.size:
        raise ValueError(f"template_sigma length {ts.size} != "
                         f"n_templates {row_keep.size}")
    return cut_fn, data[keep], cov, t, ts[row_keep]


def fisher_matrix(theory_fn, cov, p0):
    """F = J^T C^{-1} J via one forward-mode Jacobian of the theory
    vector and a Cholesky solve (no explicit inverse).  For a Gaussian
    likelihood with parameter-independent covariance this is the exact
    expected information; priors add their curvature on top
    (GaussianLikelihood.fisher does)."""
    p0 = jnp.asarray(p0)
    jac = jax.jacfwd(theory_fn)(p0)                  # (n_data, n_par)
    chol = np.linalg.cholesky(np.asarray(cov, dtype=np.float64))
    y = jax.scipy.linalg.solve_triangular(jnp.asarray(chol), jac,
                                          lower=True)
    return y.T @ y


def map_fit(neg_log_post, p0, n_steps: int = 500, learning_rate=3e-3,
            optimizer=None):
    """Maximum a posteriori via optax (default adam), the entire
    trajectory in ONE jitted lax.scan — no per-step host dispatch.

    Returns (p_best, info) where info = {"u": per-step objective,
    "p_last": final iterate}; p_best is the lowest-objective iterate
    visited (adam is not monotone)."""
    import optax

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)
    p0 = jnp.asarray(p0)
    vg = jax.value_and_grad(neg_log_post)

    @jax.jit
    def run(p0):
        def step(carry, _):
            p, st = carry
            u, g = vg(p)
            dp, st = opt.update(g, st, p)
            return (optax.apply_updates(p, dp), st), (u, p)

        (_p, _), (us, ps) = jax.lax.scan(step, (p0, opt.init(p0)),
                                         None, length=n_steps)
        i = jnp.argmin(us)
        return ps[i], us, _p

    p_best, us, p_last = run(p0)
    return p_best, {"u": us, "p_last": p_last}


def hmc(neg_log_post, mass, p0, key, n_steps: int = 200, n_leap: int = 5,
        eps: float = 0.6):
    """Fixed-mass-matrix Hamiltonian Monte Carlo: leapfrog + Metropolis
    in one lax.scan, jitted once (validated against Fisher widths in
    examples/hmc_example.py).

    ``mass``: momenta ~ N(0, mass); pass the Fisher matrix for a
    locally unit-condition chain, then ``eps`` is in preconditioned
    units (0.3-0.8 is the useful range).  ``p0`` may be (dim,) for one
    chain or (n_chains, dim) with ``key`` split accordingly — the
    multi-chain case vmaps the same compiled scan.

    Returns (samples, accept): (n_steps, dim) and (n_steps,) boolean
    (leading chain axis in the multi-chain case)."""
    mass = jnp.asarray(mass)
    m_inv = jnp.linalg.inv(mass)
    chol = jnp.linalg.cholesky(mass)
    grad_u = jax.grad(neg_log_post)

    def hmc_step(carry, key):
        q, u_q = carry
        k1, k2 = jax.random.split(key)
        p = chol @ jax.random.normal(k1, q.shape)

        def leap(_, qp):
            q, p = qp
            p = p - 0.5 * eps * grad_u(q)
            q = q + eps * (m_inv @ p)
            p = p - 0.5 * eps * grad_u(q)
            return (q, p)

        q_new, p_new = jax.lax.fori_loop(0, n_leap, leap, (q, p))
        u_new = neg_log_post(q_new)
        dh = u_new - u_q + 0.5 * (p_new @ m_inv @ p_new - p @ m_inv @ p)
        accept = jax.random.uniform(k2) < jnp.exp(-dh)
        q = jnp.where(accept, q_new, q)
        u_q = jnp.where(accept, u_new, u_q)
        return (q, u_q), (q, accept)

    @jax.jit
    def chain(key, q0):
        keys = jax.random.split(key, n_steps)
        (_, _), (qs, acc) = jax.lax.scan(hmc_step, (q0, neg_log_post(q0)),
                                         keys)
        return qs, acc

    p0 = jnp.asarray(p0)
    if p0.ndim == 2:
        keys = jax.random.split(key, p0.shape[0])
        return jax.vmap(chain)(keys, p0)
    return chain(key, p0)


# ---------------------------------------------------------------------------
# Adaptive HMC (window adaptation) + chain diagnostics
# ---------------------------------------------------------------------------


def adaptive_hmc(neg_log_post, p0, key, n_warmup: int = 500,
                 n_samples: int = 1000, n_chains: int = 4,
                 target_accept: float = 0.8, n_leap: int = 16,
                 jitter: float = 0.5, init_step: float = 0.1,
                 init_jitter: float = 0.1, dense_mass: bool = False):
    """Self-tuning Hamiltonian Monte Carlo: dual-averaging step-size
    adaptation (Hoffman & Gelman 2014 §3.2) + mass-matrix estimation
    from warmup samples + uniformly JITTERED trajectory lengths, the
    whole run (warmup and sampling) in jitted lax.scans with
    ``n_chains`` chains vmapped.

    TPU-first design note: this is deliberately NOT NUTS.  NUTS's
    recursively doubled, U-turn-terminated trajectories are
    data-dependent control flow — inside jit they lower to a
    while_loop padded to the worst-case depth, which serializes the
    chain and stalls the systolic pipeline on hardware built for
    fixed shapes.  Jittered fixed-length HMC with a tuned step size
    and estimated mass keeps every step the same compiled program
    (the whole sampler is three lax.scans), while the trajectory
    jitter breaks the resonant-periodicity pathologies that motivated
    NUTS (same reasoning as the ChEES-HMC line of work: Hoffman &
    Sountsov 2021).  All chains advance in lockstep as ONE batched
    program — cross-chain adaptation uses the mean acceptance
    statistic, so adding chains costs almost nothing on the MXU.

    Warmup = two dual-averaging windows: the first adapts the step
    size under the initial (identity) metric; the second estimates
    the posterior covariance from the first window's second half
    (regularized, Stan-style shrinkage), rebuilds the metric
    (diagonal by default, ``dense_mass=True`` for the full matrix),
    and re-adapts the step size under it.  Sampling then runs at the
    fixed tuned (eps, mass) with per-iteration trajectory lengths
    L ~ Uniform{ceil((1-jitter) n_leap), ..., n_leap} applied by
    masked leapfrog (fixed shape: always ``n_leap`` compiled steps).

    Parameters: ``p0`` (dim,) — chains start from p0 plus N(0,
    init_jitter^2) scatter; ``target_accept`` 0.8 is the standard
    optimum neighbourhood.  Returns a dict with ``samples``
    (n_chains, n_samples, dim), ``accept`` (n_chains, n_samples)
    acceptance probabilities, ``step_size``, ``mass_diag`` (or
    ``mass``), ``warmup_accept``.  Feed ``samples`` to
    :func:`split_rhat` / :func:`effective_sample_size`."""
    p0 = jnp.asarray(p0, dtype=jnp.result_type(float))
    dim = p0.shape[-1]
    grad_u = jax.grad(neg_log_post)
    vpost = jax.vmap(neg_log_post)
    vgrad = jax.vmap(grad_u)

    def leapfrog_masked(q, p, eps, m_inv_mul, n_active):
        """n_leap compiled leapfrog steps; steps past n_active are
        masked no-ops (per-chain n_active)."""
        def step(i, qp):
            q, p = qp
            live = (i < n_active)[:, None]            # (n_chains, 1)
            p_half = p - 0.5 * eps * vgrad(q)
            q_new = q + eps * m_inv_mul(p_half)
            p_new = p_half - 0.5 * eps * vgrad(q_new)
            return (jnp.where(live, q_new, q), jnp.where(live, p_new, p))

        return jax.lax.fori_loop(0, n_leap, step, (q, p))

    def kinetic(p, m_inv_mul):
        return 0.5 * jnp.sum(p * m_inv_mul(p), axis=-1)

    def hmc_sweep(q, u_q, key, eps, m_inv_mul, m_chol_mul, n_active):
        k1, k2 = jax.random.split(key)
        p = m_chol_mul(jax.random.normal(k1, q.shape))
        q_new, p_new = leapfrog_masked(q, p, eps, m_inv_mul, n_active)
        u_new = vpost(q_new)
        dh = (u_new - u_q + kinetic(p_new, m_inv_mul)
              - kinetic(p, m_inv_mul))
        # Divergences (non-finite U) reject with probability 1.
        alpha = jnp.where(jnp.isfinite(dh),
                          jnp.minimum(1.0, jnp.exp(-dh)), 0.0)
        acc = jax.random.uniform(k2, (q.shape[0],)) < alpha
        q = jnp.where(acc[:, None], q_new, q)
        u_q = jnp.where(acc, u_new, u_q)
        return q, u_q, alpha

    # Dual averaging state: (ln_eps, ln_eps_bar, h_bar, t).
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def da_update(state, alpha_mean, mu):
        ln_e, ln_eb, h_bar, t = state
        t = t + 1.0
        eta_h = 1.0 / (t + t0)
        h_bar = (1.0 - eta_h) * h_bar + eta_h * (target_accept
                                                 - alpha_mean)
        ln_e = mu - jnp.sqrt(t) / gamma * h_bar
        eta = t ** (-kappa)
        ln_eb = eta * ln_e + (1.0 - eta) * ln_eb
        return (ln_e, ln_eb, h_bar, t)

    def warmup_window(q0, u0, key, eps0, m_inv_mul, m_chol_mul, n_iter):
        mu = jnp.log(10.0 * eps0)
        da0 = (jnp.log(eps0), jnp.log(eps0), 0.0, 0.0)

        def step(carry, key):
            q, u_q, da = carry
            eps = jnp.exp(da[0])
            n_act = jnp.full((q.shape[0],), n_leap)
            q, u_q, alpha = hmc_sweep(q, u_q, key, eps, m_inv_mul,
                                      m_chol_mul, n_act)
            da = da_update(da, jnp.mean(alpha), mu)
            return (q, u_q, da), (q, alpha)

        keys = jax.random.split(key, n_iter)
        (q, u_q, da), (qs, alphas) = jax.lax.scan(
            step, (q0, u0, da0), keys)
        return q, u_q, jnp.exp(da[1]), qs, alphas

    n_w1 = max(n_warmup // 2, 1)
    n_w2 = max(n_warmup - n_w1, 1)
    eye = jnp.eye(dim)

    @jax.jit
    def run(key):
        kinit, kw1, kw2, ksamp = jax.random.split(key, 4)
        q = p0[None, :] + init_jitter * jax.random.normal(
            kinit, (n_chains, dim))
        u_q = vpost(q)
        # A chain initialized where U is non-finite (jitter landed
        # outside a prior barrier) would have dh = inf - inf = NaN in
        # every sweep and silently never move: fall back to p0.
        u_center = vpost(p0[None, :])[0]
        bad0 = ~jnp.isfinite(u_q)
        q = jnp.where(bad0[:, None], p0[None, :], q)
        u_q = jnp.where(bad0, u_center, u_q)
        ident = lambda p: p
        # Window 1: adapt eps under the identity metric.
        q, u_q, eps1, qs1, a1 = warmup_window(q, u_q, kw1, init_step,
                                              ident, ident, n_w1)
        # Metric from window 1's second half (all chains pooled),
        # Stan-style shrinkage toward unity.
        half = qs1[n_w1 // 2:].reshape(-1, dim)
        n_est = half.shape[0]
        mean = jnp.mean(half, axis=0)
        cen = half - mean
        shrink = n_est / (n_est + 5.0)
        if dense_mass:
            cov = cen.T @ cen / (n_est - 1.0)
            cov = shrink * cov + (1.0 - shrink) * 1e-3 * eye
            chol_cov = jnp.linalg.cholesky(cov)
            m_inv_mul = lambda p: p @ cov.T
            # p ~ N(0, M) with M = cov^{-1}: draw z, solve L^T p = z.
            m_chol_mul = lambda z: jax.scipy.linalg.solve_triangular(
                chol_cov.T, z.T, lower=False).T
            metric = cov
        else:
            var = jnp.var(cen, axis=0, ddof=1)
            var = shrink * var + (1.0 - shrink) * 1e-3
            m_inv_mul = lambda p: p * var
            m_chol_mul = lambda z: z / jnp.sqrt(var)
            metric = var
        # Window 2: re-adapt eps under the new metric.
        q, u_q, eps2, _qs2, a2 = warmup_window(q, u_q, kw2, eps1,
                                               m_inv_mul, m_chol_mul,
                                               n_w2)

        # Sampling at fixed (eps2, metric), jittered trajectory length.
        l_min = max(int(np.ceil((1.0 - jitter) * n_leap)), 1)

        def samp_step(carry, key):
            q, u_q = carry
            k_l, k_s = jax.random.split(key)
            n_act = jax.random.randint(k_l, (q.shape[0],), l_min,
                                       n_leap + 1)
            q, u_q, alpha = hmc_sweep(q, u_q, k_s, eps2, m_inv_mul,
                                      m_chol_mul, n_act)
            return (q, u_q), (q, alpha)

        keys = jax.random.split(ksamp, n_samples)
        (_q, _u), (qs, alphas) = jax.lax.scan(samp_step, (q, u_q), keys)
        warm_acc = jnp.concatenate([a1, a2], axis=0)
        return (jnp.moveaxis(qs, 0, 1), jnp.moveaxis(alphas, 0, 1),
                eps2, metric, warm_acc, jnp.sum(bad0), u_center)

    samples, accept, eps, metric, warm_acc, n_bad0, u_center = run(key)
    if not np.isfinite(float(u_center)):
        raise ValueError(
            "adaptive_hmc: neg_log_post(p0) is non-finite — the chain "
            "start point itself is outside the posterior support.")
    if int(n_bad0) > 0:
        import warnings
        warnings.warn(
            f"adaptive_hmc: {int(n_bad0)}/{n_chains} chains had a "
            f"non-finite neg_log_post at their jittered start (outside "
            f"a prior barrier?) and were re-initialized at p0.  "
            f"Consider a smaller init_jitter.", stacklevel=2)
    out = {"samples": samples, "accept": accept,
           "step_size": float(eps), "warmup_accept": warm_acc}
    if dense_mass:
        out["mass"] = np.linalg.inv(np.asarray(metric))
    else:
        out["mass_diag"] = 1.0 / np.asarray(metric)
    return out


def split_rhat(chains):
    """Split potential-scale-reduction diagnostic (Gelman et al., BDA3
    / Vehtari et al. 2021 without rank-normalization): each chain is
    split in half, R-hat = sqrt(var_plus / W) with
    var_plus = W (n-1)/n + B/n.  ``chains``: (n_chains, n_samples,
    dim) -> (dim,) numpy.  Values ≲ 1.01 indicate convergence."""
    x = np.asarray(chains, dtype=np.float64)
    m, n, dim = x.shape
    h = n // 2
    x = np.concatenate([x[:, :h], x[:, h:2 * h]], axis=0)  # (2m, h, d)
    cm = x.mean(axis=1)                                    # (2m, d)
    w = x.var(axis=1, ddof=1).mean(axis=0)                 # (d,)
    b = h * cm.var(axis=0, ddof=1)
    var_plus = w * (h - 1) / h + b / h
    return np.sqrt(var_plus / w)


def effective_sample_size(chains):
    """Effective sample size per dimension (Stan's cross-chain
    autocovariance estimator with Geyer's initial-positive-sequence
    truncation).  ``chains``: (n_chains, n_samples, dim) -> (dim,)
    numpy."""
    x = np.asarray(chains, dtype=np.float64)
    m, n, dim = x.shape
    cm = x.mean(axis=1, keepdims=True)
    cen = x - cm
    # Per-chain autocovariance via FFT (biased /n, Stan convention).
    npad = int(2 ** np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(cen, n=npad, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=npad, axis=1)[:, :n].real / n
    within = acov[:, 0, :].mean(axis=0) * n / (n - 1.0)    # (d,)
    b_over_n = cm[:, 0, :].var(axis=0, ddof=1) if m > 1 else 0.0
    var_plus = within * (n - 1.0) / n + b_over_n
    rho = 1.0 - (within[None, :] - acov.mean(axis=0)) / var_plus
    rho[0] = 1.0
    ess = np.empty(dim)
    for d in range(dim):
        # Geyer initial positive sequence: tau = -1 + 2 sum of the
        # consecutive-lag pairs (rho_2k + rho_2k+1), truncated at the
        # first negative pair (the first pair is rho_0 + rho_1 >= 0).
        tau = -1.0
        t = 0
        while t + 1 < n:
            pair = rho[t, d] + rho[t + 1, d]
            if pair < 0.0:
                break
            tau += 2.0 * pair
            t += 2
        ess[d] = m * n / max(tau, 1e-12)
    return ess


def external_loglike(like, vectorized: bool = False,
                     bad_value: float = -jnp.inf):
    """numpy-in / numpy-out ln-POSTERIOR callable for EXTERNAL samplers
    (emcee / Cobaya / zeus / dynesty) — VERDICT round-4 item 10.

    ``like`` is anything with a ``neg_log_post(p)`` method
    (:class:`GaussianLikelihood`, :class:`PoissonLikelihood`,
    :class:`CompositeLikelihood`) or a bare callable returning the
    NEGATIVE log posterior.  The wrapper:

      - jits the traced function ONCE (first call compiles; the
        external sampler's per-call overhead is then one device
        dispatch);
      - flips the sign to the external convention (ln P, higher =
        better — emcee's ``log_prob_fn`` / Cobaya's ``logp``);
      - accepts/returns plain numpy (floats out), so the sampler
        never sees a JAX type;
      - maps non-finite evaluations to ``bad_value`` (-inf by
        default: emcee's reject convention) instead of propagating
        NaN into the chain.

    ``vectorized=True`` returns a batch form mapping (n_walkers,
    n_dim) -> (n_walkers,) via one vmapped call — pass
    ``vectorize=True`` to ``emcee.EnsembleSampler`` alongside it.

    Example (emcee)::

        log_prob = external_loglike(gauss_like)
        sampler = emcee.EnsembleSampler(nw, ndim, log_prob)

    Example (Cobaya external likelihood)::

        info = {"likelihood": {"chomp": {
            "external": external_loglike(gauss_like),
            "input_params": [...]}}, ...}
    """
    nlp = like.neg_log_post if hasattr(like, "neg_log_post") else like

    if vectorized:
        batch = jax.jit(jax.vmap(lambda p: -nlp(p)))

        def log_prob(ps):
            out = np.asarray(batch(jnp.asarray(np.atleast_2d(
                np.asarray(ps, dtype=np.float64)))))
            return np.where(np.isfinite(out), out, bad_value)

        return log_prob

    single = jax.jit(lambda p: -nlp(p))

    def log_prob(p, *args):
        val = float(single(jnp.asarray(np.asarray(p, dtype=np.float64))))
        return val if np.isfinite(val) else bad_value

    return log_prob


def ensemble_sample(log_prob, p0_walkers, n_steps: int, seed: int = 0,
                    a: float = 2.0):
    """Minimal affine-invariant ensemble sampler (Goodman & Weare 2010
    stretch move, the emcee algorithm) over a NUMPY ``log_prob`` —
    the self-contained fallback driver for :func:`external_loglike`
    when emcee itself is not installed (this image has no network).

    Pure host-side numpy by design: it exercises the exact external
    contract (one float per call, -inf = reject).  For production
    chains prefer :func:`adaptive_hmc` (gradient-based, on-device) or
    install emcee and pass it the same ``log_prob``.

    Returns (n_steps, n_walkers, n_dim) samples and the acceptance
    fraction."""
    rng = np.random.default_rng(seed)
    walkers = np.array(p0_walkers, dtype=np.float64, copy=True)
    n_w, n_dim = walkers.shape
    if n_w < 2 * n_dim:
        raise ValueError(f"need >= {2 * n_dim} walkers for {n_dim} "
                         f"dims, got {n_w}")
    lp = np.array([log_prob(w) for w in walkers])
    chain = np.empty((n_steps, n_w, n_dim))
    n_acc = 0
    half = n_w // 2
    for t in range(n_steps):
        for (sel, other) in (((slice(0, half)), slice(half, n_w)),
                             ((slice(half, n_w)), slice(0, half))):
            idx = np.arange(n_w)[sel]
            comp = walkers[other]
            z = ((a - 1.0) * rng.random(len(idx)) + 1.0) ** 2 / a
            partners = comp[rng.integers(0, comp.shape[0], len(idx))]
            prop = partners + z[:, None] * (walkers[idx] - partners)
            lp_prop = np.array([log_prob(p) for p in prop])
            ln_ratio = (n_dim - 1.0) * np.log(z) + lp_prop - lp[idx]
            acc = np.log(rng.random(len(idx))) < ln_ratio
            walkers[idx[acc]] = prop[acc]
            lp[idx[acc]] = lp_prop[acc]
            n_acc += int(acc.sum())
        chain[t] = walkers
    return chain, n_acc / (n_steps * n_w)
