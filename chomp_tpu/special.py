"""Special functions in pure JAX: Si/Ci and Bessel J0/J1/J2.

The reference leans on ``scipy.special.sici`` (NFW y(k,M) closed form,
upstream:halo.py) and ``scipy.special.j0/j2`` (Limber kernels,
upstream:kernel.py) — neither exists in ``jax.scipy.special``
(SURVEY.md §7 hard part 2).  This module provides branch-free,
``jnp.where``-blended piecewise approximations that are jit/vmap/grad
safe and accurate to ~1e-13 in float64:

  - power series (exact factorial coefficients) on the small-x side;
  - Chebyshev tables generated against mpmath/scipy by
    ``tools/gen_special.py`` (see ``_special_coeffs.py``) mid-range;
  - asymptotic auxiliary-function expansions at large x.

All branches are evaluated on clamped arguments and selected with
``jnp.where`` — no data-dependent control flow, so everything fuses on
the TPU's VPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from chomp_tpu import _special_coeffs as _cf


def _trim(coeffs, x, tol32: float = 3e-9):
    """Drop Chebyshev tail terms below the dtype's needs: float32 code
    keeps ~1e-8 coefficients (half the terms of the 1e-15 float64
    tables) — the dtype check is static under jit, so each precision
    compiles its own right-sized series."""
    if jnp.result_type(x) != jnp.float32:
        return coeffs
    out = list(coeffs)
    while len(out) > 2 and abs(out[-1]) < tol32:
        out.pop()
    return out


def _clenshaw(coeffs, x):
    """Chebyshev series at x in [-1, 1]; ``coeffs`` is a static list."""
    coeffs = _trim(coeffs, x)
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for ck in reversed(coeffs[1:]):
        b1, b2 = 2.0 * x * b1 - b2 + ck, b1
    return x * b1 - b2 + coeffs[0]


def _cheb_on(coeffs, lo, hi, t):
    return _clenshaw(coeffs, (2.0 * t - (hi + lo)) / (hi - lo))


_EULER_GAMMA = 0.5772156649015329


def _sici_series(x):
    """Si, Ci power series for x <= 4 (16 terms in float64, last term
    < 2e-16; 10 terms suffice for float32)."""
    n_terms = 16 if jnp.result_type(x) != jnp.float32 else 10
    t = x * x
    si = jnp.zeros_like(x)
    ci = jnp.zeros_like(x)
    for k in range(n_terms - 1, -1, -1):
        csi = (-1.0) ** k / ((2 * k + 1) * math.factorial(2 * k + 1))
        si = si * t + csi
        if k >= 1:
            cci = (-1.0) ** k / ((2 * k) * math.factorial(2 * k))
            ci = ci * t + cci
    si = si * x
    ci = ci * t + _EULER_GAMMA + jnp.log(x)
    return si, ci


def _aux_fg(x):
    """Auxiliary f(x), g(x) for x > 4:
    Si = pi/2 - f cos - g sin ;  Ci = f sin - g cos."""
    u = 1.0 / x
    # Region a: 4 < x <= 16.
    ua = jnp.clip(u, _cf.sici_a_range[0], _cf.sici_a_range[1])
    fa = _cheb_on(_cf.sici_a_f, *_cf.sici_a_range, ua) * ua
    ga = _cheb_on(_cf.sici_a_g, *_cf.sici_a_range, ua) * ua * ua
    # Region b: 16 < x <= 64.
    ub = jnp.clip(u, _cf.sici_b_range[0], _cf.sici_b_range[1])
    fb = _cheb_on(_cf.sici_b_f, *_cf.sici_b_range, ub) * ub
    gb = _cheb_on(_cf.sici_b_g, *_cf.sici_b_range, ub) * ub * ub
    # Region c: x > 64 — asymptotic series in w = 1/x^2.
    xc = jnp.maximum(x, 64.0)
    w = 1.0 / (xc * xc)
    fc = jnp.zeros_like(x)
    gc = jnp.zeros_like(x)
    for k in range(6, -1, -1):
        fc = fc * w + (-1.0) ** k * math.factorial(2 * k)
        gc = gc * w + (-1.0) ** k * math.factorial(2 * k + 1)
    fc = fc / xc
    gc = gc * w
    f = jnp.where(x <= 16.0, fa, jnp.where(x <= 64.0, fb, fc))
    g = jnp.where(x <= 16.0, ga, jnp.where(x <= 64.0, gb, gc))
    return f, g


def si_ci(x):
    """(Si(x), Ci(x)) for x > 0, elementwise (chomp's scipy.special.sici
    substitute; max abs error ~3e-15 in float64)."""
    x = jnp.asarray(x)
    xs = jnp.clip(x, 1e-300, 4.0)
    si_s, ci_s = _sici_series(xs)
    xl = jnp.maximum(x, 4.0)
    f, g = _aux_fg(xl)
    co, sn = jnp.cos(xl), jnp.sin(xl)
    si_l = 0.5 * jnp.pi - f * co - g * sn
    ci_l = f * sn - g * co
    small = x <= 4.0
    return jnp.where(small, si_s, si_l), jnp.where(small, ci_s, ci_l)


def aux_fg(x):
    """Full-range auxiliary functions (f(x), g(x)) with
    Si = pi/2 - f cos - g sin, Ci = f sin - g cos.

    Exposed for cancellation-free DIFFERENCES of Si/Ci: e.g. the NFW
    y(k, M) needs Si(b)-Si(a) where both ~ pi/2 — forming it from Si
    loses ~x*eps relative accuracy (catastrophic in float32 at large x),
    while the f/g identity form keeps full precision (see
    profiles.y_nfw).  Small-x branch from the series (no cancellation
    there: pi/2 - Si is O(1))."""
    x = jnp.asarray(x)
    xs = jnp.clip(x, 1e-300, 4.0)
    si_s, ci_s = _sici_series(xs)
    co_s, sn_s = jnp.cos(xs), jnp.sin(xs)
    f_small = (0.5 * jnp.pi - si_s) * co_s + ci_s * sn_s
    g_small = (0.5 * jnp.pi - si_s) * sn_s - ci_s * co_s
    xl = jnp.maximum(x, 4.0)
    f_large, g_large = _aux_fg(xl)
    small = x <= 4.0
    return (jnp.where(small, f_small, f_large),
            jnp.where(small, g_small, g_large))


def aux_g(x):
    """g(x) alone, full range — the NFW y(k, M) needs only g and f-1/x,
    so skipping the f evaluations saves ~30% of the special-function
    cost in the y-matrix hot loop."""
    x = jnp.asarray(x)
    xs = jnp.clip(x, 1e-300, 4.0)
    si_s, ci_s = _sici_series(xs)
    g_small = (0.5 * jnp.pi - si_s) * jnp.sin(xs) - ci_s * jnp.cos(xs)
    u = 1.0 / jnp.maximum(x, 4.0)
    ua = jnp.clip(u, _cf.sici_a_range[0], _cf.sici_a_range[1])
    ga = _cheb_on(_cf.sici_a_g, *_cf.sici_a_range, ua) * ua * ua
    ub = jnp.clip(u, _cf.sici_b_range[0], _cf.sici_b_range[1])
    gb = _cheb_on(_cf.sici_b_g, *_cf.sici_b_range, ub) * ub * ub
    xc = jnp.maximum(x, 64.0)
    w = 1.0 / (xc * xc)
    gc = jnp.zeros_like(x)
    n_asym = 7 if jnp.result_type(x) != jnp.float32 else 4
    for k in range(n_asym - 1, -1, -1):
        gc = gc * w + (-1.0) ** k * math.factorial(2 * k + 1)
    gc = gc * w
    out = jnp.where(x <= 16.0, ga, jnp.where(x <= 64.0, gb, gc))
    return jnp.where(x <= 4.0, g_small, out)


def aux_fm(x):
    """f(x) - 1/x, cancellation-free at large x.

    f -> 1/x asymptotically, so forming f - 1/x from f loses all
    relative accuracy at large x; here the mid-range uses dedicated
    Chebyshev fits of F(u) - 1 = x f - 1 and the far range the exact
    asymptotic series -(1/x)(2!/x^2 - 4!/x^4 + ...)."""
    x = jnp.asarray(x)
    # Small x: f is O(1), 1/x dominates — direct subtraction is fine.
    xs = jnp.clip(x, 1e-300, 4.0)
    f_small = aux_fg(xs)[0] - 1.0 / xs
    # Mid ranges: (F(u) - 1) * u from the fitted tables.
    u = 1.0 / jnp.maximum(x, 4.0)
    ua = jnp.clip(u, _cf.sici_a_range[0], _cf.sici_a_range[1])
    fm_a = _cheb_on(_cf.sici_a_fm, *_cf.sici_a_range, ua) * ua
    ub = jnp.clip(u, _cf.sici_b_range[0], _cf.sici_b_range[1])
    fm_b = _cheb_on(_cf.sici_b_fm, *_cf.sici_b_range, ub) * ub
    # Far range: exact asymptotic series (leading term -2/x^3).
    xc = jnp.maximum(x, 64.0)
    w = 1.0 / (xc * xc)
    fm_c = jnp.zeros_like(x)
    for k in range(6, 0, -1):
        fm_c = fm_c * w + (-1.0) ** k * math.factorial(2 * k)
    fm_c = fm_c * w / xc
    out = jnp.where(x <= 16.0, fm_a, jnp.where(x <= 64.0, fm_b, fm_c))
    return jnp.where(x <= 4.0, f_small, out)


# ---------------------------------------------------------------------------
# Bessel J0, J1, J2.
# ---------------------------------------------------------------------------

_SQRT_2_PI = math.sqrt(2.0 / math.pi)


def _pq(p_coeffs, q_coeffs, x):
    u = jnp.clip((8.0 / x) ** 2, 0.0, 1.0)
    p = _cheb_on(p_coeffs, 0.0, 1.0, u)
    q = _cheb_on(q_coeffs, 0.0, 1.0, u) * jnp.sqrt(u)
    return p, q


def j0(x):
    """Bessel J0 (chomp's scipy.special.j0 substitute)."""
    x = jnp.abs(jnp.asarray(x))
    t = jnp.clip(x * x, 0.0, 64.0)
    small = _cheb_on(_cf.j0_small, 0.0, 64.0, t)
    xl = jnp.maximum(x, 8.0)
    p, q = _pq(_cf.bessel_p0, _cf.bessel_q0, xl)
    chi = xl - 0.25 * jnp.pi
    large = _SQRT_2_PI / jnp.sqrt(xl) * (p * jnp.cos(chi) - q * jnp.sin(chi))
    return jnp.where(x <= 8.0, small, large)


def j1(x):
    """Bessel J1."""
    xa = jnp.asarray(x)
    sign = jnp.sign(xa)
    x = jnp.abs(xa)
    t = jnp.clip(x * x, 0.0, 64.0)
    small = _cheb_on(_cf.j1_small, 0.0, 64.0, t) * x
    xl = jnp.maximum(x, 8.0)
    p, q = _pq(_cf.bessel_p1, _cf.bessel_q1, xl)
    chi = xl - 0.75 * jnp.pi
    large = _SQRT_2_PI / jnp.sqrt(xl) * (p * jnp.cos(chi) - q * jnp.sin(chi))
    return sign * jnp.where(x <= 8.0, small, large)


def j2(x):
    """Bessel J2 (chomp's g-g lensing kernel J2; upstream:kernel.py
    ``GalaxyGalaxyLensingKernel``).  Small-x via a dedicated J2/x^2 table
    (avoids the 2 J1/x - J0 cancellation); large-x via the recurrence."""
    x = jnp.abs(jnp.asarray(x))
    t = jnp.clip(x * x, 0.0, 64.0)
    small = _cheb_on(_cf.j2_small, 0.0, 64.0, t) * t
    xl = jnp.maximum(x, 8.0)
    large = 2.0 * j1(xl) / xl - j0(xl)
    return jnp.where(x <= 8.0, small, large)


def erf(x):
    """Error function (for the Zheng HOD central moment) — jax-native."""
    import jax.scipy.special as jsp

    return jsp.erf(x)


def erfc(x):
    """Complementary error function — jax-native.

    Float32-critical for occupation tails: 0.5*(1 + erf(x)) at x < -4
    floors at one ulp of 1 (~6e-8) in float32 while the true value is
    < 1e-8 — a spurious occupation floor that, multiplied by the large
    low-mass halo abundance, biased n_g by +8e-5 at a low-Omega_m/low-
    sigma_8 prior corner (measured round 3).  0.5*erfc(-x) represents
    the tail down to the float32 denormal range instead."""
    import jax.scipy.special as jsp

    return jsp.erfc(x)
