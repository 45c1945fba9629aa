"""Spectral-axis sharding: the ell dimension over the mesh 'model' axis.

SURVEY.md §5.7 ("long-axis blocking"): this library's long axes are the
spectral grids, not sequences.  The cosmology batch shards on the data
axis (chomp_tpu.parallel.sweep); here the Limber + Hankel ell axis
shards over a second mesh axis — each device computes ONLY its ell
slice of C_ell and its partial Hankel contraction, combined by a single
``psum`` riding ICI.  Use when per-device memory (very fine ell grids,
huge theta batches) or a small cosmology batch leaves chips idle on a
pure-DP layout.  The same pattern is exercised by the driver contract
(__graft_entry__.dryrun_multichip) on a (data x model) mesh.

The sharded route uses the table-interpolation Limber (projection
limber_cl) because its per-ell work is independent; the lattice
convolution route's outputs couple all ells and shards on data only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from chomp_tpu import correlation, projection
from chomp_tpu.params import DEFAULT_GRID, GridSpec

try:  # jax >= 0.6 public API
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_spectral_pipeline(halo_params, hod, dist, mesh,
                           power_spec: str = "power_gg", theta_deg=None,
                           z_pivot: float = 0.0, with_bao: bool = False,
                           grid: GridSpec = DEFAULT_GRID,
                           data_axis: str = "data",
                           model_axis: str = "model", mu: float = 0.0):
    """Build ``fn(cosmo_batch) -> w(theta)`` sharded (data x model).

    The batch axis lives on ``data_axis``; the FFTLog ell grid splits
    over ``model_axis`` (``grid.n_ell`` must divide by its size).  Each
    model-shard runs the full halo model for its cosmologies (replicated
    work, negligible vs the spectral stage it shards) and only its ell
    columns of the Limber integral and the fused Hankel+binning
    operator; one psum forms the final bins.
    """
    if theta_deg is None:
        theta_deg = correlation.theta_bins_deg(grid)
    theta_key = tuple(np.asarray(theta_deg).tolist())
    n_model = mesh.shape[model_axis]
    if grid.n_ell % n_model:
        raise ValueError(
            f"n_ell={grid.n_ell} not divisible by mesh axis "
            f"{model_axis!r} size {n_model}")

    ells = jnp.asarray(correlation.ell_grid(grid)[0])
    # Fused (n_bins, n_ell) operator: column-sharded over ell.
    op = jnp.asarray(correlation.wtheta_bins_operator(theta_key, grid, mu))
    win = projection.WindowGalaxy(dist=dist)

    @jax.jit
    @lambda f: shard_map(
        f, mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(data_axis),
                  jax.sharding.PartitionSpec(model_axis),
                  jax.sharding.PartitionSpec(None, model_axis)),
        out_specs=jax.sharding.PartitionSpec(data_axis))
    def _run(cosmo_local, ells_local, op_local):
        from chomp_tpu import halo as halo_mod

        def one(cosmo):
            model = halo_mod.build_halo_model(cosmo, halo_params, hod,
                                              z_pivot, with_bao, grid)
            pt = projection.power_table_halo(cosmo, halo_params, model,
                                             power_spec, with_bao, grid)
            return projection.limber_cl(cosmo, win, win, ells_local, pt,
                                        grid)

        cl_local = jax.vmap(one)(cosmo_local)        # (B_loc, n_ell_loc)
        w_partial = jnp.matmul(cl_local, op_local.T,
                               precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(w_partial, model_axis)   # one ICI collective

    def fn(cosmo_batch):
        return _run(cosmo_batch, ells, op)

    return fn
