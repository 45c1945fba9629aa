"""Pytree dataclass helpers.

The reference (morriscb/chomp) configures every object through mutable
dicts (``defaults.py``'s ``default_params`` / ``default_halo_params``) and
``set_cosmology``-style mutators that invalidate cached splines
(SURVEY.md §1).  The TPU-native rebuild replaces that with *immutable*
frozen dataclasses registered as JAX pytrees: parameter structs are leaves
that ``jit``/``vmap``/``grad`` traverse, and "reconfiguring" is just
building a new struct (``dataclasses.replace``).
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are static (hashable, not traced); all other fields are
    pytree leaves (arrays / scalars, vmap-able axes).
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        ]
        jax.tree_util.register_dataclass(c, data_fields, list(meta_fields))
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj, **kwargs):
    """Functional update for pytree dataclasses (chomp's ``set_*`` analog)."""
    return dataclasses.replace(obj, **kwargs)
