"""Generate Chebyshev coefficient tables for chomp_tpu/_special_coeffs.py.

Run:  python tools/gen_special.py

The TPU library needs Si/Ci (NFW y(k,M) closed form — SURVEY.md §7 hard
part 2: "no jax.scipy.special.sici exists") and J0/J1/J2 (covariance
double-Bessel integrals, oracle cross-checks).  Strategy: piecewise
vectorized approximations with *generated* (not recalled) coefficients,
fitted here against scipy.special in float64 and verified to <1e-13
before being written out.  Runtime evaluation is branch-free
(jnp.where-blended), vmap/jit-safe.

Pieces:
  - Si/Ci, x<=4: power series (exact coefficients, computed here).
  - Si/Ci, 4<x<=16 and 16<x<=64: Chebyshev fits in 1/x of the auxiliary
    functions F(x)=x*f(x), G(x)=x^2*g(x) where
       Si = pi/2 - f cos - g sin ;  Ci = f sin - g cos.
  - Si/Ci, x>64: asymptotic series in 1/x^2 (error ~ 12!/64^12 ~ 1e-13).
  - J0, J1: Chebyshev in x^2 on [0,64]; J2 via Chebyshev of J2/x^2.
  - J0/J1 for x>8: Hankel asymptotic moduli P,Q as Chebyshev in (8/x)^2;
    J2 = 2 J1/x - J0 there (no cancellation for x>8).
"""

import sys
from pathlib import Path

import numpy as np
from numpy.polynomial import chebyshev as C
from scipy.special import j0, j1, jn, sici, y0, y1


def fit_cheb(fn, lo, hi, deg, n=2000):
    """Least-squares Chebyshev fit of fn on [lo, hi]; returns coeffs."""
    x = np.cos(np.pi * (np.arange(n) + 0.5) / n)  # cheb points in [-1,1]
    t = 0.5 * (hi + lo) + 0.5 * (hi - lo) * x
    y = fn(t)
    return C.chebfit(x, y, deg)


def fit_cheb_domain(fn, dom_lo, dom_hi, samp_lo, samp_hi, deg, n=2000):
    """Chebyshev fit with basis on [dom_lo, dom_hi] but samples drawn
    from [samp_lo, samp_hi] (for functions unevaluable at an endpoint)."""
    x = np.cos(np.pi * (np.arange(n) + 0.5) / n)
    t = 0.5 * (samp_hi + samp_lo) + 0.5 * (samp_hi - samp_lo) * x
    xb = (2.0 * t - (dom_hi + dom_lo)) / (dom_hi - dom_lo)
    return C.chebfit(xb, fn(t), deg)


def cheb_eval(coeffs, lo, hi, t):
    x = (2.0 * t - (hi + lo)) / (hi - lo)
    return C.chebval(x, coeffs)


def aux_fg(x):
    """f(x), g(x) from scipy Si/Ci."""
    si, ci = sici(x)
    co, sn = np.cos(x), np.sin(x)
    f = (np.pi / 2 - si) * co + ci * sn
    g = (np.pi / 2 - si) * sn - ci * co
    return f, g


def aux_fg_mp(x):
    """f(x), g(x) from mpmath at 30 digits (scipy's sici has a ~1e-13
    noise floor in the asymptotic regime that would cap the fits)."""
    import mpmath as mp

    mp.mp.dps = 30
    f = np.empty_like(x)
    g = np.empty_like(x)
    for i, xi in enumerate(np.atleast_1d(x)):
        xm = mp.mpf(float(xi))
        si, ci = mp.si(xm), mp.ci(xm)
        co, sn = mp.cos(xm), mp.sin(xm)
        f.flat[i] = float((mp.pi / 2 - si) * co + ci * sn)
        g.flat[i] = float((mp.pi / 2 - si) * sn - ci * co)
    return f, g


def main():
    out = {}
    checks = []

    # --- Si/Ci auxiliary fits in u = 1/x --------------------------------
    for name, xlo, xhi, deg in [("sici_a", 4.0, 16.0, 28), ("sici_b", 16.0, 64.0, 28)]:
        ulo, uhi = 1.0 / xhi, 1.0 / xlo
        Ffn = lambda u: aux_fg_mp(1.0 / u)[0] / u      # F = x f
        Gfn = lambda u: aux_fg_mp(1.0 / u)[1] / u**2   # G = x^2 g
        FMfn = lambda u: aux_fg_mp(1.0 / u)[0] / u - 1.0  # F - 1 = x f - 1
        cF = fit_cheb(Ffn, ulo, uhi, deg, n=400)
        cG = fit_cheb(Gfn, ulo, uhi, deg, n=400)
        cFM = fit_cheb(FMfn, ulo, uhi, deg, n=400)
        out[f"{name}_f"] = cF
        out[f"{name}_g"] = cG
        out[f"{name}_fm"] = cFM
        xs = np.linspace(xlo, xhi, 4001)
        fg = aux_fg_mp(xs)
        errF = np.max(np.abs(cheb_eval(cF, ulo, uhi, 1 / xs) - fg[0] * xs))
        errG = np.max(np.abs(cheb_eval(cG, ulo, uhi, 1 / xs) - fg[1] * xs**2))
        errFM = np.max(np.abs(cheb_eval(cFM, ulo, uhi, 1 / xs)
                              - (fg[0] * xs - 1.0)))
        checks.append((name, max(errF, errG, errFM)))
        out[f"{name}_range"] = np.array([ulo, uhi])

    # --- J0, J1 on [0, 8]: Chebyshev in t = x^2 -------------------------
    for name, fn in [("j0_small", j0), ("j1_small", lambda x: np.where(
            x == 0, 0.5, j1(np.maximum(x, 1e-300)) / np.maximum(x, 1e-300)))]:
        # j1_small fits J1(x)/x (even function of x, smooth at 0).
        c = fit_cheb(lambda t: fn(np.sqrt(t)), 0.0, 64.0, 40)
        out[name] = c
        xs = np.linspace(0, 8, 20001)
        ref = j0(xs) if name == "j0_small" else np.where(
            xs == 0, 0.5, j1(np.maximum(xs, 1e-300)) / np.maximum(xs, 1e-300))
        err = np.max(np.abs(cheb_eval(c, 0.0, 64.0, xs**2) - ref))
        checks.append((name, err))

    # J2/x^2 on [0, 8] (even, smooth; avoids the 2J1/x - J0 cancellation).
    c = fit_cheb(
        lambda t: np.where(t == 0, 0.125,
                           jn(2, np.sqrt(np.maximum(t, 1e-300)))
                           / np.maximum(t, 1e-300)),
        0.0, 64.0, 40)
    out["j2_small"] = c
    xs = np.linspace(1e-6, 8, 20001)
    err = np.max(np.abs(cheb_eval(c, 0.0, 64.0, xs**2) * xs**2 - jn(2, xs)))
    checks.append(("j2_small", err))

    # --- Hankel asymptotic moduli for x > 8 in u = (8/x)^2 --------------
    def pq(order, x):
        chi = x - (0.5 * order + 0.25) * np.pi
        jj = j0(x) if order == 0 else j1(x)
        yy = y0(x) if order == 0 else y1(x)
        amp = np.sqrt(np.pi * x / 2.0)
        p = amp * (jj * np.cos(chi) + yy * np.sin(chi))
        q = amp * (yy * np.cos(chi) - jj * np.sin(chi))
        return p, q

    # P(x) has only even 1/x powers (smooth in u); Q(x) ~ odd powers, so
    # fit Q*x/8 (also smooth in u) and multiply back sqrt(u) at runtime.
    for order in (0, 1):
        for idx, comp in enumerate("pq"):
            if comp == "p":
                cfn = lambda u: pq(order, 8.0 / np.sqrt(u))[idx]
            else:
                cfn = lambda u: pq(order, 8.0 / np.sqrt(u))[idx] / np.sqrt(u)
            # Fit on domain [0, 1] (samples can't sit exactly at u=0 ==
            # x=inf, so sample from 1e-8 up; the polynomial extrapolates
            # the analytic function smoothly through 0, removing any need
            # for a lower clamp at runtime).
            c = fit_cheb_domain(cfn, 0.0, 1.0, 1e-8, 1.0, 30)
            out[f"bessel_{comp}{order}"] = c
            xs = np.concatenate([np.linspace(8, 100, 20001), np.logspace(2, 6, 20001)])
            u = (8.0 / xs) ** 2
            approx = cheb_eval(c, 0.0, 1.0, u)
            if comp == "q":
                approx = approx * np.sqrt(u)
            err = np.max(np.abs(approx - pq(order, xs)[idx]))
            checks.append((f"bessel_{comp}{order}", err))

    print("fit max abs errors:")
    bad = False
    for name, err in checks:
        flag = "" if err < 2e-13 else "  <-- TOO LARGE"
        bad = bad or err >= 2e-13
        print(f"  {name:12s} {err:.3e}{flag}")
    if bad:
        sys.exit("fits not accurate enough")

    path = Path(__file__).resolve().parent.parent / "chomp_tpu" / "_special_coeffs.py"
    with open(path, "w") as fh:
        fh.write('"""Chebyshev coefficient tables (auto-generated by '
                 'tools/gen_special.py).\n\nFitted against scipy.special in '
                 'float64; every table verified to <2e-13 max abs error\n'
                 'over its range at generation time.  Do not edit by hand.\n'
                 '"""\n\n')
        for key, val in sorted(out.items()):
            arr = ", ".join(f"{v!r}" for v in np.asarray(val).tolist())
            fh.write(f"{key} = [{arr}]\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
