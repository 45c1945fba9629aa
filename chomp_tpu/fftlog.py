"""FFTLog Hankel transforms — the TPU-native Bessel engine.

This module replaces the reference's two oscillatory-quadrature
workhorses (SURVEY.md §7 design rules; BASELINE.json north star
"implement the Hankel transform as an FFTLog kernel instead of per-theta
j0/j2 integrals"):

  - ``correlation.py``'s w(theta) = ∫ l dl/(2 pi) C_l J0(l theta)
    (upstream:correlation.py, Romberg over ln k per theta bin), and
  - ``kernel.py``'s K(k*theta) = ∫ dchi W W D^2 J0(k theta chi)
    (upstream:kernel.py, Bessel-zero-chunked Romberg — chomp's hardest
    numerics, "HOT LOOP 2").

Math (Hamilton 2000 / mcfit formulation): for log-sampled a(x) the
transform

    G(y) = ∫_0^∞ a(x) J_mu(x y) dx / x

is a log-convolution: FFT a(x) x^{-q}, multiply by the Mellin factors
    M_mu(q + i eta) = 2^{q+i eta-1} Gamma((mu+q+i eta)/2)
                                    / Gamma((mu+2-q-i eta)/2),
inverse-transform, scale by y^{-q}.  Bias q=1 keeps M pole-free for
mu=0 and mu=2 (no n=0 special case).  The output grid y_j is reciprocal
log-spaced with the Hamilton low-ringing x0*y0 phase choice.

TPU-first design: the whole pipeline is LINEAR in a, and every factor
(FFT phases, Mellin multipliers, tapers, bias powers) depends only on
the static grid — so it collapses into ONE precomputed real N x N dense
operator (built here in float64 numpy by pushing the identity through
the FFT pipeline).  At runtime a batched Hankel transform is a single
(B, N) @ (N, N) matmul that rides the MXU — no FFT butterflies, no
Bessel evaluations, no host transfers.  A Pallas kernel fusing the taper
+ matmul + output scaling lives in chomp_tpu.ops.fftlog_pallas.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _mellin_jmu(mu: float, s):
    """M_mu(s) = 2^(s-1) Gamma((mu+s)/2) / Gamma((mu+2-s)/2), complex."""
    from scipy.special import loggamma

    s = np.asarray(s, dtype=np.complex128)
    ln = ((s - 1.0) * np.log(2.0) + loggamma((mu + s) / 2.0)
          - loggamma((mu + 2.0 - s) / 2.0))
    # Gamma poles in the DENOMINATOR (e.g. q=2, mu=0 at eta=0) mean
    # M -> 0; complex-inf arithmetic would give nan, so patch explicitly.
    return np.where(np.isfinite(ln), np.exp(np.where(np.isfinite(ln), ln, 0.0)),
                    0.0)


def _lowring_y0(mu: float, q: float, dln: float, x0: float, y0_target: float):
    """Hamilton's low-ringing choice: pick y0 near y0_target such that
    the Nyquist Mellin factor u_{N/2} is real (kills sawtooth ringing)."""
    eta_nyq = np.pi / dln
    m = _mellin_jmu(mu, q + 1j * eta_nyq)
    # phase(u_nyq) = arg(m) - eta_nyq * ln(x0 y0)  ==  0  (mod pi)
    ln_xy = (np.angle(m)) / eta_nyq
    target = np.log(x0 * y0_target)
    k = np.round((target - ln_xy) / (np.pi / eta_nyq))
    ln_xy = ln_xy + k * (np.pi / eta_nyq)
    return float(np.exp(ln_xy) / x0)


@lru_cache(maxsize=None)
def hankel_operator(n: int, ln_x0: float, dln: float, mu: float,
                    q: float = 1.0, y0_target: float | None = None,
                    taper_lo: float = 0.0, taper_hi: float = 0.0,
                    lowring: bool = True):
    """Dense real operator H and output grid y for
        G(y_j) = sum_m H[j, m] a(x_m),   x_m = exp(ln_x0 + m dln).

    ``taper_lo``/``taper_hi`` are fractions of the log-range cosine^2-
    tapered at each end (applied inside H) to suppress periodic-
    wraparound ringing from non-decayed endpoints.

    ``lowring=False`` pins y0 EXACTLY to ``y0_target`` (no Hamilton
    phase snap).  The snap is mu-dependent, so multi-mu stacks that
    must share one output grid (e.g. the spherical-Bessel multipole
    transforms in chomp_tpu.rsd) disable it and rely on the tapers;
    the sawtooth it suppresses is ~1e-4-level with tapered inputs
    (measured in the rsd operator tests).

    Returns (y_grid (n,), H (n, n)) as float64 numpy arrays (cached; cast
    to the runtime dtype at use site).
    """
    x0 = float(np.exp(ln_x0))
    x = np.exp(ln_x0 + dln * np.arange(n))
    if y0_target is None:
        # Reciprocal grid centered against x.
        y0_target = 1.0 / (x0 * np.exp(dln * (n - 1)))
    y0 = (_lowring_y0(mu, q, dln, x0, y0_target) if lowring
          else float(y0_target))
    y = y0 * np.exp(dln * np.arange(n))

    eta = 2.0 * np.pi * np.fft.fftfreq(n) / dln
    u = _mellin_jmu(mu, q + 1j * eta) * (x0 * y0) ** (-1j * eta)

    # Cosine^2 end tapers.
    taper = np.ones(n)
    n_lo = int(round(taper_lo * n))
    n_hi = int(round(taper_hi * n))
    if n_lo > 0:
        s = np.sin(0.5 * np.pi * np.arange(n_lo) / n_lo)
        taper[:n_lo] = s * s
    if n_hi > 0:
        s = np.sin(0.5 * np.pi * np.arange(n_hi) / n_hi)
        taper[n - n_hi:] = (s * s)[::-1]

    # Push the (tapered, biased) identity through the FFT pipeline:
    # G_j = y_j^{-q} (1/n) FFT( FFT(b) * u )_j,  b_m = a_m (x_m/x_0)^{-q}.
    # (The bias is taken against x/x_0 so all x_0 powers cancel into the
    # (x_0 y_0)^{-i eta} phase above.)
    b = np.diag(taper * (x / x0) ** -q)            # (n, n): columns = basis
    bt = np.fft.fft(b, axis=0)
    g = np.fft.fft(bt * u[:, None], axis=0) / n
    h = ((x0 * y) ** -q)[:, None] * g.real
    return y, np.ascontiguousarray(h)


def hankel_apply(h, a):
    """Batched application: a (..., N) -> G (..., N).  One MXU matmul at
    HIGHEST precision — the operator rows oscillate in sign, and the
    TPU's default bf16 pass loses ~1e-2 through the cancellation
    (CLAUDE.md matmul rule; same pin as every internal Hankel path)."""
    import jax

    return jnp.matmul(a, jnp.asarray(h).T,
                      precision=jax.lax.Precision.HIGHEST)


def hankel_direct(a_fn, y, x_lo=1e-5, x_hi=1e7, mu: float = 0.0,
                  n: int = 2**18):
    """Trusted-slow reference: G(y) = ∫ a(x) J_mu(xy) dx/x by dense
    Simpson in ln x (numpy float64; for tests/diagnostics only)."""
    from scipy.integrate import simpson
    from scipy.special import jv

    lnx = np.linspace(np.log(x_lo), np.log(x_hi), n + 1)
    x = np.exp(lnx)
    a = a_fn(x)
    out = np.empty_like(np.atleast_1d(y), dtype=np.float64)
    for i, yi in enumerate(np.atleast_1d(y)):
        out[i] = simpson(a * jv(mu, x * yi), x=lnx)
    return out
