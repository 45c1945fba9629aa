"""chomp ``hod.py`` equivalent: HOD classes with linear-mass constructors.

upstream:hod.py (SURVEY.md §2 row 5).  chomp's constructors take LINEAR
masses (M_sun/h); the functional core's pytrees take log10 — these
wrappers convert.  The returned objects ARE the functional pytrees, so
they plug directly into ``chomp_tpu.halo`` as well.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from chomp_tpu import hod as hod_mod

HODZhengCore = hod_mod.HODZheng
HODPoissonCore = hod_mod.HODPoisson
HODMandelbaumCore = hod_mod.HODMandelbaum
HODKravtsovCore = hod_mod.HODKravtsov


class HOD:
    """Abstract occupation interface (chomp ``HOD``): subclasses provide
    ``first_moment`` / ``second_moment`` / ``nth_moment``."""

    def first_moment(self, m):
        raise NotImplementedError

    def second_moment(self, m):
        raise NotImplementedError

    def nth_moment(self, m, n):
        raise NotImplementedError


def HODZheng(m_min, sigma, m_0, m_1p, alpha):
    """Zheng+05 (chomp ``HODZheng(M_min, sigma, M_0, M_1p, alpha)``,
    linear masses)."""
    return HODZhengCore(
        log10_m_min=jnp.asarray(math.log10(m_min)),
        sigma=jnp.asarray(float(sigma)),
        log10_m_0=jnp.asarray(math.log10(m_0)),
        log10_m_1p=jnp.asarray(math.log10(m_1p)),
        alpha=jnp.asarray(float(alpha)),
    )


def HODPoisson(m_min, alpha=1.0):
    """chomp ``HODPoisson`` [M]."""
    return HODPoissonCore(log10_m_min=jnp.asarray(math.log10(m_min)),
                          alpha=jnp.asarray(float(alpha)))


def HODMandelbaum(m0, w):
    """chomp ``HODMandelbaum(M0, w)`` [M]."""
    return HODMandelbaumCore(m0=jnp.asarray(float(m0)),
                             w=jnp.asarray(float(w)))


def HODKravtsov(m_min, m_1, alpha=1.0):
    """chomp ``HODKravtsov`` [L]."""
    return HODKravtsovCore(log10_m_min=jnp.asarray(math.log10(m_min)),
                           log10_m_1=jnp.asarray(math.log10(m_1)),
                           alpha=jnp.asarray(float(alpha)))
