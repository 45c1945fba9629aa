"""Neural emulator layer: train a compact MLP surrogate of any theory
map p -> data vector, for production-scale inference.

Capability extension beyond chomp (the upstream scipy object library
computes one model at a time; SURVEY.md §2 has no acceleration layer).
The pattern is the standard cosmology-emulator one (CosmoPower,
Spurio Mancini et al. 2022; the BACCO / Euclid emulators): sample the
prior box with a space-filling design, evaluate the exact pipeline
once per node (the batched/vmapped sweep is the fast path this
framework already optimizes), compress the outputs on a PCA basis,
and fit a small MLP — after which a likelihood evaluation costs two
matmuls instead of a halo-model build.  TPU-first mechanics:

- training data comes from ONE vmapped pipeline call (or
  parallel.sweep for multi-chip/multi-host boxes);
- training runs as one jitted ``lax.scan`` of optax adam steps over
  minibatch permutations (no per-step host dispatch, same pattern as
  :func:`chomp_tpu.inference.map_fit`);
- the trained :class:`Emulator` is a frozen pytree: ``emu(p)`` is
  pure JAX (jit/vmap/grad-able), so it drops into
  ``inference.GaussianLikelihood(theory_fn=emu)`` / ``adaptive_hmc``
  unchanged, and an MCMC step costs microseconds.

Accuracy protocol: ``train_emulator`` always holds out a validation
split and reports worst/RMS errors in data-vector units; re-train
with more nodes/epochs if ``report.max_err`` exceeds the error budget
of the analysis (the 1e-3-of-signal target of the default settings
matches the usual emulator literature).  The emulator is only valid
INSIDE the training box — ``emu(p)`` does not extrapolate; pair it
with the same box as priors (``GaussianLikelihood(lower=, upper=)``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["latin_hypercube", "Emulator", "train_emulator",
           "TrainReport"]


def latin_hypercube(key, n: int, bounds):
    """Maximin-free Latin-hypercube design: n points in the box
    ``bounds`` = (n_dim, 2) [lo, hi] rows — one stratum per point per
    dimension, independently permuted (the standard LHS; adequate for
    smooth emulator targets).  Returns (n, n_dim) float64 numpy."""
    bounds = np.asarray(bounds, dtype=np.float64)
    n_dim = bounds.shape[0]
    keys = jax.random.split(key, n_dim + 1)
    u = np.asarray(jax.random.uniform(keys[0], (n, n_dim)))
    out = np.empty((n, n_dim))
    for d in range(n_dim):
        perm = np.asarray(jax.random.permutation(keys[d + 1], n))
        strata = (perm + u[:, d]) / n
        out[:, d] = bounds[d, 0] + strata * (bounds[d, 1] - bounds[d, 0])
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Emulator:
    """Frozen-pytree MLP surrogate; ``emu(p)`` maps a (n_dim,) flat
    parameter vector (or a leading-batched array) to the data vector.

    Architecture: inputs standardized by (x_mu, x_sd); hidden layers
    with GELU; linear head predicting PCA coefficients; outputs
    reconstructed as y = y_mu + (c * c_sd) @ basis.  Everything is a
    pytree leaf, so the emulator itself can be jit/vmap/grad-ed,
    saved/loaded with utils.io, and shipped across hosts."""

    weights: tuple     # ((w, b), ...) per layer, head last
    x_mu: jnp.ndarray
    x_sd: jnp.ndarray
    y_mu: jnp.ndarray      # (n_out,)
    basis: jnp.ndarray     # (n_pca, n_out) orthonormal rows
    c_sd: jnp.ndarray      # (n_pca,) coefficient scales

    def __call__(self, p):
        h = (jnp.asarray(p) - self.x_mu) / self.x_sd
        for w, b in self.weights[:-1]:
            h = jax.nn.gelu(h @ w + b)
        w, b = self.weights[-1]
        c = h @ w + b
        return self.y_mu + (c * self.c_sd) @ self.basis


@dataclasses.dataclass(frozen=True)
class TrainReport:
    """Holdout-validation record from :func:`train_emulator`:
    ``max_err``/``rms_err`` are absolute data-vector-unit errors on
    the validation split; ``max_rel_err`` is relative to the per-entry
    RMS signal over the training set (the emulator-literature metric);
    ``loss`` is the training-loss trajectory."""

    max_err: float
    rms_err: float
    max_rel_err: float
    n_train: int
    n_val: int
    loss: np.ndarray
    # Sobolev training only (jac_weight > 0): worst holdout Jacobian
    # entry relative to that entry's RMS over the training Jacobians.
    jac_max_rel_err: float | None = None
    # PCA rank actually used (after pca_tol calibration, if any).
    n_pca: int | None = None


def _init_mlp(key, sizes):
    ws = []
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k1 = jax.random.split(key)
        w = jax.random.normal(k1, (n_in, n_out)) * jnp.sqrt(2.0 / n_in)
        ws.append((w, jnp.zeros(n_out)))
    return tuple(ws)


def train_emulator(theory_fn, bounds, key, n_train: int = 512,
                   n_val: int = 64, n_pca: int | None = 64,
                   hidden=(128, 128), n_epochs: int = 2000,
                   batch_size: int = 128, learning_rate: float = 3e-3,
                   x_train=None, y_train=None, x_val=None, y_val=None,
                   eval_batch: int | None = None,
                   jac_weight: float = 0.0,
                   j_train=None, j_val=None,
                   pca_tol: float | None = None):
    """Fit an :class:`Emulator` to ``theory_fn`` over the box
    ``bounds`` ((n_dim, 2) [lo, hi]).  Returns (emulator, report).

    Training nodes are a Latin hypercube evaluated by ONE jitted vmap
    of ``theory_fn`` (chunked by ``eval_batch`` if memory-bound); pass
    ``x_train``/``y_train`` (and optionally ``x_val``/``y_val``)
    instead to reuse a precomputed sweep (e.g. from
    parallel.sweep_chunked across hosts).  Outputs are centered and
    SVD-compressed to ``n_pca`` components (None or >= n_out disables
    compression losslessly); the MLP fits the whitened coefficients
    with adam + cosine decay in one lax.scan (epoch = one permuted
    minibatch pass).

    ``jac_weight > 0`` turns on SOBOLEV training (VERDICT round-4
    item 5): the exact Jacobians dy/dp at the design nodes — one more
    vmapped ``jax.jacfwd(theory_fn)`` sweep, forward-mode so the cost
    scales with the (small) parameter count — enter the loss as
    ``jac_weight * mean((J_mlp - J_exact)^2)`` in whitened
    coefficient/input coordinates.  Value-only training reaches 1e-5
    VALUE accuracy while the Jacobian wiggles at the 10-20% level
    (examples/emulator_example.py LESSON); Sobolev training makes
    emulator-side Fisher matrices/gradients trustworthy.  The report
    then carries ``jac_max_rel_err`` from the holdout Jacobians.
    Precomputed-sweep callers pass ``j_train`` (n, n_out, n_dim)
    (+ optional ``j_val``) alongside x/y.

    ``pca_tol`` replaces the fixed ``n_pca`` with ERROR-CALIBRATED
    truncation: the smallest rank whose per-output RMS reconstruction
    error is below ``pca_tol`` relative to that output's RMS signal
    (so no output is silently truncated harder than the tolerance).

    Sobolev PCA mechanics (round 5): with ``jac_weight > 0`` the
    compression runs in per-output-STANDARDIZED coordinates and the
    SVD data matrix is augmented with the Jacobian rows, so truncation
    keeps derivative directions and small-amplitude outputs (the
    standardization folds into the stored basis — outputs stay in raw
    units).  DERIVATIVE accuracy still needs more modes than VALUE
    accuracy: on the real pipeline a 16/20 basis floors the holdout
    Jacobian at ~16% however long you train, full rank reaches ~2% —
    size ``n_pca`` generously (or use a tight ``pca_tol``) when the
    emulator's Fisher matrices/gradients matter."""
    bounds = np.asarray(bounds, dtype=np.float64)
    k_design, k_init, k_perm = jax.random.split(key, 3)

    if (x_train is None) != (y_train is None):
        raise ValueError(
            "train_emulator: pass BOTH x_train and y_train to reuse a "
            "precomputed sweep, or neither to run a fresh LHS sweep "
            f"(got x_train={'set' if x_train is not None else 'None'}, "
            f"y_train={'set' if y_train is not None else 'None'}).")
    if y_train is None and theory_fn is None:
        raise ValueError(
            "train_emulator: theory_fn=None requires a precomputed "
            "x_train/y_train sweep.")
    sobolev = jac_weight > 0.0
    if sobolev and y_train is not None and j_train is None:
        raise ValueError(
            "train_emulator: jac_weight > 0 with a precomputed sweep "
            "needs j_train (n, n_out, n_dim) Jacobians as well.")

    if y_train is None:
        x_all = latin_hypercube(k_design, n_train + n_val, bounds)
        if sobolev:
            # Sobolev designs pin the BOX BOUNDARY: the MLP's worst
            # Jacobian error concentrates at the edges/corners an
            # interior LHS rarely visits (measured on the analytic
            # referee: interior-LHS holdout max-rel ~12%, + corners
            # ~4%, + per-face LHS ~1%).  Replace the first few
            # training nodes with the box vertices plus a small LHS on
            # every face (total capped at n_train/4).
            import itertools

            n_dim_b = bounds.shape[0]
            extras = []
            if 2 ** n_dim_b <= max(n_train // 8, 1):
                extras.extend(np.asarray(list(
                    itertools.product(*bounds)), dtype=np.float64))
            n_face = max(n_train // (16 * n_dim_b), 2)
            fkeys = jax.random.split(k_design, 2 * n_dim_b + 1)
            k_design = fkeys[-1]
            for d in range(n_dim_b):
                sub = np.delete(np.arange(n_dim_b), d)
                for j, v in enumerate(bounds[d]):
                    pts = np.empty((n_face, n_dim_b))
                    pts[:, d] = v
                    if sub.size:
                        pts[:, sub] = latin_hypercube(
                            fkeys[2 * d + j], n_face, bounds[sub])
                    extras.append(pts)
            extras = np.concatenate(
                [np.atleast_2d(e) for e in extras])
            n_x = min(len(extras), n_train // 4)
            x_all = np.concatenate([extras[:n_x], x_all[n_x:]])
        vfn = jax.jit(jax.vmap(theory_fn))
        chunks = []
        step = eval_batch or (n_train + n_val)
        for i in range(0, x_all.shape[0], step):
            chunks.append(np.asarray(vfn(jnp.asarray(x_all[i:i + step]))))
        y_all = np.concatenate(chunks, axis=0)
        x_train, y_train = x_all[:n_train], y_all[:n_train]
        x_val, y_val = x_all[n_train:], y_all[n_train:]
        if sobolev:
            # The Sobolev sweep: exact dy/dp at every node, forward
            # mode (cost ~ n_dim pipeline evals per node).
            vjac = jax.jit(jax.vmap(jax.jacfwd(theory_fn)))
            jchunks = []
            for i in range(0, x_all.shape[0], step):
                jchunks.append(np.asarray(
                    vjac(jnp.asarray(x_all[i:i + step]))))
            j_all = np.concatenate(jchunks, axis=0)
            j_train, j_val = j_all[:n_train], j_all[n_train:]
    else:
        x_train = np.asarray(x_train, dtype=np.float64)
        y_train = np.asarray(y_train, dtype=np.float64)
        if sobolev:
            j_train = np.asarray(j_train, dtype=np.float64)
        if x_val is None:
            n_v = max(x_train.shape[0] // 8, 1)
            x_val, y_val = x_train[-n_v:], y_train[-n_v:]
            x_train, y_train = x_train[:-n_v], y_train[:-n_v]
            if sobolev:
                j_val = j_train[-n_v:]
                j_train = j_train[:-n_v]
        n_train, n_val = x_train.shape[0], x_val.shape[0]

    n_dim, n_out = x_train.shape[1], y_train.shape[1]
    x_mu = x_train.mean(axis=0)
    x_sd = x_train.std(axis=0) + 1e-12
    y_mu = y_train.mean(axis=0)
    yc = y_train - y_mu
    scale = np.sqrt((y_train ** 2).mean(axis=0)) + 1e-30
    # SOBOLEV runs compress in per-output-STANDARDIZED coordinates
    # (data vectors spanning decades otherwise concentrate the PCA on
    # the large-amplitude outputs and floor the small outputs'
    # RELATIVE derivative accuracy), and the SVD data matrix is
    # augmented with the Jacobian rows (in whitened-input units) so
    # truncation keeps the DERIVATIVE directions — a value-only PCA
    # basis floors the holdout Jacobian error at the truncation level
    # (measured on the real pipeline: value-PCA rank 16/20 -> 19-20%
    # Jacobian error regardless of training; Jacobian-aware -> ~2%).
    # The standardization folds into the stored basis exactly
    # (basis_eff = basis_scaled @ diag(scale)), so the Emulator's
    # outputs and every report metric stay in raw data-vector units.
    o_scale = scale if sobolev else np.ones(n_out)
    ycs = yc / o_scale
    if sobolev:
        jrows = np.concatenate(
            [j_train[:, :, d] * x_sd[d] / o_scale
             for d in range(n_dim)], axis=0)
        svd_mat = np.concatenate([ycs, jrows], axis=0)
    else:
        svd_mat = ycs
    if pca_tol is not None:
        # Error-calibrated truncation: residual MSE per output of a
        # rank-r reconstruction is sum_{i>=r} (s_i^2/n) vh_i^2; pick
        # the smallest r with every output's relative RMS residual
        # below pca_tol (the VALUE rows measure the tolerance; the
        # Jacobian rows only steer the basis).
        _u, s, vh = np.linalg.svd(svd_mat, full_matrices=False)
        contrib = np.empty((vh.shape[0], n_out))
        acc = ycs
        for r_i in range(vh.shape[0]):
            contrib[r_i] = (acc ** 2).mean(axis=0)
            acc = acc - np.outer(acc @ vh[r_i], vh[r_i])
        rel = np.sqrt(contrib) / (scale / o_scale)[None, :]
        ok = np.max(rel, axis=1) <= pca_tol
        ranks = np.nonzero(ok)[0]
        r = int(ranks[0]) if ranks.size else vh.shape[0]
        basis_s = vh[:max(r, 1)]
    elif n_pca is None or n_pca >= min(n_out, n_train):
        basis_s = np.eye(n_out)
    else:
        # Rows of vh are the principal directions (orthonormal).
        _u, _s, vh = np.linalg.svd(svd_mat, full_matrices=False)
        basis_s = vh[:n_pca]
    basis = basis_s * o_scale[None, :]           # maps c -> RAW y units
    c_train = ycs @ basis_s.T
    c_sd = c_train.std(axis=0) + 1e-30
    cw = c_train / c_sd                          # whitened targets

    import optax

    sizes = (n_dim,) + tuple(hidden) + (basis.shape[0],)
    params = _init_mlp(k_init, sizes)
    xw = jnp.asarray((x_train - x_mu) / x_sd)
    cw = jnp.asarray(cw)
    bs = min(batch_size, n_train)
    n_batches = n_train // bs
    sched = optax.cosine_decay_schedule(learning_rate,
                                        n_epochs * n_batches)
    opt = optax.adam(sched)

    def apply(ws, x):
        h = x
        for w, b in ws[:-1]:
            h = jax.nn.gelu(h @ w + b)
        w, b = ws[-1]
        return h @ w + b

    if sobolev:
        # Whitened-coordinate Jacobian targets:
        # c = basis_s @ ((y - y_mu)/o_scale), cw = c / c_sd,
        # xw = (x - x_mu) / x_sd  =>
        # dcw/dxw = (basis_s @ (dy/dx / o_scale)) * x_sd / c_sd.
        jw_np = (np.einsum("po,nod->npd", basis_s,
                           j_train / o_scale[None, :, None])
                 * x_sd[None, None, :] / c_sd[None, :, None])
        jw = jnp.asarray(jw_np)
        jac_apply = jax.vmap(jax.jacfwd(lambda x, ws: apply(ws, x)),
                             in_axes=(0, None))

        def loss_fn(ws, x, c, jt):
            r = apply(ws, x) - c
            jr = jac_apply(x, ws) - jt
            return jnp.mean(r * r) + jac_weight * jnp.mean(jr * jr)
    else:
        jw = jnp.zeros((n_train, basis.shape[0], 0))

        def loss_fn(ws, x, c, jt):
            del jt
            r = apply(ws, x) - c
            return jnp.mean(r * r)

    vg = jax.value_and_grad(loss_fn)

    @jax.jit
    def run(params, key):
        def epoch(carry, key):
            ws, st = carry
            idx = jax.random.permutation(key, n_train)[:n_batches * bs]
            xb = xw[idx].reshape(n_batches, bs, n_dim)
            cb = cw[idx].reshape(n_batches, bs, -1)
            jb = jw[idx].reshape(n_batches, bs, basis.shape[0],
                                 jw.shape[-1])

            def mini(carry, xcj):
                ws, st = carry
                l, g = vg(ws, xcj[0], xcj[1], xcj[2])
                up, st = opt.update(g, st, ws)
                ws = optax.apply_updates(ws, up)
                return (ws, st), l

            (ws, st), ls = jax.lax.scan(mini, (ws, st), (xb, cb, jb))
            return (ws, st), jnp.mean(ls)

        keys = jax.random.split(key, n_epochs)
        (ws, _st), losses = jax.lax.scan(epoch, (params, opt.init(params)),
                                         keys)
        return ws, losses

    weights, losses = run(params, k_perm)
    emu = Emulator(weights=jax.tree_util.tree_map(jnp.asarray, weights),
                   x_mu=jnp.asarray(x_mu), x_sd=jnp.asarray(x_sd),
                   y_mu=jnp.asarray(y_mu), basis=jnp.asarray(basis),
                   c_sd=jnp.asarray(c_sd))
    pred = np.asarray(jax.jit(jax.vmap(emu))(jnp.asarray(x_val)))
    err = pred - np.asarray(y_val)
    jac_rel = None
    if sobolev and j_val is not None and np.shape(j_val)[0] > 0:
        jpred = np.asarray(jax.jit(jax.vmap(jax.jacfwd(emu)))(
            jnp.asarray(x_val)))
        jscale = (np.sqrt((np.asarray(j_train) ** 2).mean(axis=0))
                  + 1e-30)                            # (n_out, n_dim)
        jac_rel = float(np.abs((jpred - np.asarray(j_val))
                               / jscale[None]).max())
    report = TrainReport(max_err=float(np.abs(err).max()),
                         rms_err=float(np.sqrt((err ** 2).mean())),
                         max_rel_err=float(np.abs(err / scale).max()),
                         n_train=int(x_train.shape[0]),
                         n_val=int(np.shape(y_val)[0]),
                         loss=np.asarray(losses),
                         jac_max_rel_err=jac_rel,
                         n_pca=int(basis.shape[0]))
    return emu, report
