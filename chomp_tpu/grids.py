"""Quadrature nodes and grid/interpolation primitives.

This module is the substrate that replaces the reference's
``scipy.integrate.romberg`` + ``InterpolatedUnivariateSpline`` layer
(SURVEY.md §1 "LAYER 0"): fixed-order Gauss-Legendre nodes/weights
(precomputed in float64 numpy at trace time — static constants inside the
XLA program) and dense-grid interpolation.  Every integral in the library
is a weighted contraction against these nodes, so the whole pipeline fuses
into tensor ops that XLA tiles onto the TPU's MXU/VPU.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def gauss_legendre(n: int):
    """GL nodes/weights on [-1, 1] (float64 numpy, cached)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x, w


@lru_cache(maxsize=None)
def gl_fixed(a: float, b: float, n: int):
    """GL nodes/weights mapped to the static interval [a, b] (numpy)."""
    x, w = gauss_legendre(n)
    half = 0.5 * (b - a)
    return 0.5 * (b + a) + half * x, half * w


@lru_cache(maxsize=None)
def gl_composite(a: float, b: float, panels: int, n: int):
    """Composite GL: ``panels`` equal subintervals of [a, b], ``n`` nodes
    each.  Piecewise-polynomial convergence resolves oscillatory factors
    (top-hat W(kR), Bessel-like tails) far better than one global rule."""
    edges = np.linspace(a, b, panels + 1)
    xs, ws = [], []
    for lo, hi in zip(edges[:-1], edges[1:]):
        x, w = gl_fixed(float(lo), float(hi), n)
        xs.append(x)
        ws.append(w)
    return np.concatenate(xs), np.concatenate(ws)


def gl_integrate(f, a, b, n: int):
    """``∫_a^b f`` with ``a``/``b`` possibly traced arrays (broadcast).

    Nodes are placed per-element: for array-valued limits this evaluates
    ``f`` on shape ``broadcast(a,b) + (n,)`` and contracts the last axis —
    a dense, static-shape contraction (no data-dependent control flow).
    """
    x, w = gauss_legendre(n)
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    half = 0.5 * (b - a)
    mid = 0.5 * (b + a)
    t = mid[..., None] + half[..., None] * x
    return jnp.sum(f(t) * w, axis=-1) * half


def loggrid(lo: float, hi: float, n: int):
    """Uniform grid in ln x over [lo, hi] (numpy float64): (ln_x, dln)."""
    ln = np.linspace(np.log(lo), np.log(hi), n)
    return ln, float(ln[1] - ln[0])


def interp_lin(xq, xg, yg):
    """Linear interpolation (monotone ``xg``), clamped at the ends."""
    return jnp.interp(xq, xg, yg)


def interp_loglog_cubic(ln_xq, ln_x0: float, dln: float, ln_yg):
    """Catmull-Rom cubic interpolation of ln y on a *uniform* ln x grid,
    with linear (power-law) extrapolation outside the grid.

    This replaces chomp's ``InterpolatedUnivariateSpline`` for P(k)-like
    tables (SURVEY.md §7 design rules): uniform-grid cubic needs no spline
    solve — index arithmetic + a 4-tap stencil, gather-friendly on TPU.
    """
    n = ln_yg.shape[-1]
    t_all = (ln_xq - ln_x0) / dln
    # Interior Catmull-Rom on clamped index.
    i = jnp.clip(jnp.floor(t_all).astype(jnp.int32), 1, n - 3)
    t = t_all - i
    ym1 = jnp.take(ln_yg, i - 1, axis=-1)
    y0 = jnp.take(ln_yg, i, axis=-1)
    y1 = jnp.take(ln_yg, i + 1, axis=-1)
    y2 = jnp.take(ln_yg, i + 2, axis=-1)
    a0 = y0
    a1 = 0.5 * (y1 - ym1)
    a2 = ym1 - 2.5 * y0 + 2.0 * y1 - 0.5 * y2
    a3 = 0.5 * (y2 - ym1) + 1.5 * (y0 - y1)
    interior = a0 + t * (a1 + t * (a2 + t * a3))
    # Power-law extrapolation using the end slopes (1-D table; batch the
    # table axis via vmap).
    slope_lo = ln_yg[..., 1] - ln_yg[..., 0]
    slope_hi = ln_yg[..., -1] - ln_yg[..., -2]
    lo = ln_yg[..., 0] + slope_lo * t_all
    hi = ln_yg[..., -1] + slope_hi * (t_all - (n - 1))
    out = jnp.where(t_all < 0.0, lo, interior)
    out = jnp.where(t_all > n - 1.0, hi, out)
    return out


def catmull_rom_weights_np(n: int, t):
    """(len(t), n) Catmull-Rom weight matrix on a UNIFORM grid (numpy,
    offline): row q interpolates grid values at fractional index t[q],
    with the 4-tap stencil clipped to [1, n-3] (linear-ish extrapolation
    at the edges).  Shared by the static-operator builders
    (correlation.wtheta_bins_operator, limber_fft._s_weights)."""
    t = np.asarray(t, dtype=np.float64)
    i = np.clip(np.floor(t).astype(int), 1, n - 3)
    f = t - i
    w = np.zeros((len(t), n))
    rows = np.arange(len(t))
    w[rows, i - 1] = 0.5 * (-f + 2 * f**2 - f**3)
    w[rows, i] = 0.5 * (2 - 5 * f**2 + 3 * f**3)
    w[rows, i + 1] = 0.5 * (f + 4 * f**2 - 3 * f**3)
    w[rows, i + 2] = 0.5 * (-(f**2) + f**3)
    return w
