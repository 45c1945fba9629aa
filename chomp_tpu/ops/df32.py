"""Two-float ("double-single") compensated contraction for float32 TPU.

The flagship w(theta) path ends in ONE small oscillatory contraction:
w = A @ c with A the fused static (Hankel + binning + lattice-interp)
operator and c the strictly-positive Limber convolution output.  A's
rows oscillate through sign with |A c| summands up to ~100x the result
(Bessel cancellation), so a plain float32 accumulation loses ~eps *
amplification ~ 1e-5..1e-3 — the dominant term of the f32 error budget
(NUMERICS.md §6).  Emulating float64 JUST HERE costs ~1e5 VPU flops
(nothing) instead of the 300x slowdown of running the whole pipeline in
TPU-emulated f64.

Representation: value = hi + lo with |lo| <= ulp(hi)/2 (~48-bit
effective mantissa).  Error-free transforms (round-to-nearest IEEE
float32, which the TPU VPU implements):

  two_sum  (Knuth):  s = fl(a+b), e exact residual — 6 flops, branchless
  two_prod (Dekker): p = fl(a*b), e exact residual via 12-bit splits
                     (float32 mantissa 24 = 12+12; half-products exact)

The contraction computes every product in two-float, then reduces with
a BALANCED BINARY TREE of two-float additions (fully vectorized: each
level is one elementwise two_sum over a halved axis) — accumulated
error O(log n * 2^-48), negligible against the inputs' own noise.

Backend note (measured): on TPU the transforms survive jit exactly —
the hostile-cancellation test tracks float64 to ~5e-8 where a plain f32
HIGHEST matmul loses 0.2-0.6.  On the CPU backend the LLVM -O2 pipeline
partially defeats the EFTs when the producer fuses into the reduction
(residual ~1e-3-grade relative on hostile inputs; identical HLO, and
``--xla_backend_optimization_level=0`` restores exactness, so it is
LLVM codegen, not an HLO rewrite; optimization_barrier does not help).
CPU float32 is not a serving configuration — CPU is the float64 oracle
mode — and even degraded, the compensated path beats the plain matmul
by ~1000x there.  The float32 regression tests therefore pin the TPU
behavior via subprocesses running ``--xla_backend_optimization_level=0``
on CPU (tests/test_df32.py, tests/test_f32_budget.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for float32


def two_sum(a, b):
    """Error-free a + b: (s, e) with s + e == a + b exactly."""
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _split(a):
    c = jnp.asarray(_SPLIT, a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free a * b: (p, e) with p + e == a * b exactly."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _df_add(s1, e1, s2, e2):
    s, e = two_sum(s1, s2)
    return s, e + (e1 + e2)


def df_sum(hi, lo, axis: int = -1):
    """Balanced-tree two-float reduction of (hi, lo) pairs along
    ``axis``; returns the rounded float sum hi+lo (collapsed axis)."""
    hi = jnp.moveaxis(hi, axis, -1)
    lo = jnp.moveaxis(lo, axis, -1)
    n = hi.shape[-1]
    m = 1
    while m < n:
        m *= 2
    if m != n:
        pad = [(0, 0)] * (hi.ndim - 1) + [(0, m - n)]
        hi = jnp.pad(hi, pad)
        lo = jnp.pad(lo, pad)
    while m > 1:
        m //= 2
        hi, lo = _df_add(hi[..., :m], lo[..., :m], hi[..., m:], lo[..., m:])
    return (hi + lo)[..., 0]


def df_contract(c, a_np: np.ndarray):
    """w = c @ A.T in two-float: ``c`` (..., n) runtime values, ``a_np``
    (m, n) STATIC float64 numpy operator.  float64 inputs (CPU x64 mode)
    short-circuit to a plain HIGHEST matmul — the emulation is the
    float32 TPU path."""
    import jax

    a_np = np.asarray(a_np)
    if c.dtype == jnp.float64:
        return jnp.matmul(c, jnp.asarray(a_np).T,
                          precision=jax.lax.Precision.HIGHEST)
    a_hi = a_np.astype(np.float32)
    a_lo = (a_np - a_hi.astype(np.float64)).astype(np.float32)
    a_hi = jnp.asarray(a_hi)
    a_lo = jnp.asarray(a_lo)
    ce = c[..., None, :]                       # (..., 1, n)
    p, e = two_prod(ce, a_hi)                  # (..., m, n)
    e = e + ce * a_lo                          # operator representation err
    # XLA's whole-graph simplifier rewrites the error-free transforms
    # when the product stage fuses into the reduction tree (measured:
    # 7.5e-4 error vs 4.5e-8 staged); the barrier pins the (p, e) pair.
    p, e = jax.lax.optimization_barrier((p, e))
    return df_sum(p, e, axis=-1)               # (..., m)
