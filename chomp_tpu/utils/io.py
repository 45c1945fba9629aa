"""Pytree persistence (SURVEY.md §5.4 checkpoint/resume analog).

The reference's only output path is ``Correlation.write`` ASCII dumps.
Here any parameter/result pytree (CosmoParams batches, HaloModel state,
sweep outputs) round-trips through a single npz file — enough to
checkpoint an MCMC sweep chunk-by-chunk and resume by re-running only
missing chunks (sweeps are stateless, SURVEY.md §5.3).
"""

from __future__ import annotations

import jax
import numpy as np


def save_pytree(path, tree) -> None:
    """Flatten a pytree to npz (leaves as arrays + treedef repr)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_pytree(path, like):
    """Load leaves saved by :func:`save_pytree` into the structure of
    ``like`` (the treedef string is stored for provenance only — JAX
    treedefs aren't portable text, so a template pytree is required)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)
