"""Pallas TPU kernel for the FFTLog Hankel application.

BASELINE.json north star: "implement the Hankel transform as an FFTLog
Pallas kernel instead of per-theta j0/j2 integrals."  The TPU-first
design collapses the whole FFTLog pipeline (bias powers, FFT phases,
Mellin multipliers, tapers, measure weights, output-theta interpolation)
into ONE precomputed dense operator (chomp_tpu.fftlog /
chomp_tpu.correlation), so the runtime transform for a batch of C_ell
rows is a single (B, N) @ (N, T) matmul.

This module supplies that matmul as a Pallas kernel: a classic
K-accumulating tiled MXU matmul with float32 accumulation
(preferred_element_type) so the Hankel cancellations never pass through
the default bf16 path, with VMEM-resident tiles and revisit-accumulate
over the K grid axis.  ``interpret=True`` is used automatically off-TPU
(tests run it on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul_kernel(a_ref, b_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def hankel_matmul_pallas(cl, op_t, interpret: bool = False):
    """w = cl @ op_t via the Pallas tiled-matmul kernel.

    cl: (B, N) batched C_ell rows; op_t: (N, T) combined Hankel(+interp)
    operator.  Returns (B, T).  Shapes are padded to MXU tiles and the
    result sliced back.
    """
    cl = jnp.atleast_2d(cl)
    b, n = cl.shape
    n2, t = op_t.shape
    assert n == n2, (n, n2)
    bm = 128 if b >= 128 else _round_up(max(b, 8), 8)
    bn = 128 if t >= 128 else _round_up(max(t, 128), 128)
    bk = 512 if n % 512 == 0 else 128
    b_pad = _round_up(b, bm)
    t_pad = _round_up(t, bn)
    n_pad = _round_up(n, bk)
    a = jnp.pad(cl.astype(jnp.float32), ((0, b_pad - b), (0, n_pad - n)))
    w = jnp.pad(op_t.astype(jnp.float32), ((0, n_pad - n), (0, t_pad - t)))

    grid = (b_pad // bm, t_pad // bn, n_pad // bk)
    out = pl.pallas_call(
        _matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad), jnp.float32),
        interpret=interpret,
    )(a, w)
    return out[:b, :t]


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
