"""MC calibration study for the spin-2 footprint-bin conservatism
(VERDICT round-4 item 3).

The flat masked Gaussian blocks (covariance.gaussian_block(mask=...))
carry documented CONSERVATIVE overpredictions on the spin-2 AUTO
blocks at footprint-scale bins: gamma_t ~1.6x (partial-annulus wedge
coupling beyond the leading azimuthal moments), xi_+ up to ~2.4x (the
<gamma gamma><gamma* gamma*> Wick pairing's e^{4i phi_k} FIELD-phase
coherence).  This tool measures the per-bin mc/an ratio over a grid of
disc radii and spectrum shapes with the same masked-sky MC machinery
as tests/test_mask_covariance.py.  Round-5 findings (full study in
docs/NUMERICS.md section 10): the xi_+ ratio does NOT collapse in
x = theta/R alone (it tracks how much spectrum power sits inside the
coupling scale) — the S4 field-phase damping captures that physics;
the residual after S4 + the weighted delta is a mild common wedge
suppression fitted as covariance._WEDGE_FIT.  Each run_config row
reports both the plain-NKA (r_*) and the corrected (b_*) mc/an
ratios, so this doubles as the held-out validation instrument
(shape="square" for the PixelMask geometry).

Run: python tools/calibrate_spin2_wedge.py [--quick]
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from chomp_tpu import covariance
from chomp_tpu.mask import DiscMask


def _grid(n, box):
    a = box / n
    x = (np.arange(n) - n // 2) * a
    xg, yg = np.meshgrid(x, x, indexing="ij")
    q1 = 2 * np.pi * np.fft.fftfreq(n, d=a)
    qx, qy = np.meshgrid(q1, q1, indexing="ij")
    qq = np.sqrt(qx**2 + qy**2)
    qc = qx + 1j * qy
    phase2 = np.where(qq > 0, (qc / np.maximum(qq, 1e-30)) ** 2, 0.0)
    rx1 = np.arange(n) * a
    rx1[n // 2:] -= n * a
    rxg, ryg = np.meshgrid(rx1, rx1, indexing="ij")
    rr = np.sqrt(rxg**2 + ryg**2)
    rc = rxg + 1j * ryg
    eph2 = np.where(rr > 0, np.conj((rc / np.maximum(rr, 1e-30)) ** 2),
                    0.0)
    rabs = np.sqrt(np.minimum(np.arange(n), n - np.arange(n))[:, None]
                   ** 2 * a * a
                   + np.minimum(np.arange(n), n - np.arange(n))[None, :]
                   ** 2 * a * a)
    return a, xg, yg, qq, phase2, rabs, eph2


def run_config(radius, q0=15.0, gamma=2.0, rho=0.7, n=256, box=2.0,
               n_mc=800, seed=101, n_bins=5, shape="disc"):
    """One (mask, spectrum) configuration.  Returns dict with bin
    centers, x = theta_c / r_eff, and mc/an diagonal ratios for the
    w_gg, gamma_t, xi_+ auto blocks.  ``shape="square"`` uses a square
    footprint of the same area via PixelMask (held-out geometry —
    radius then sets the equal-area disc scale)."""
    a, xg, yg, qq, phase2, rabs, eph2 = _grid(n, box)
    if shape == "square":
        half = radius * np.sqrt(np.pi) / 2.0
        w = ((np.abs(xg) <= half) & (np.abs(yg) <= half)).astype(float)
    else:
        w = ((xg**2 + yg**2) <= radius**2).astype(float)

    def c_kk(q):
        return 0.6 / (1.0 + (np.asarray(q) / q0) ** gamma)

    def c_gg(q):
        return 1.0 / (1.0 + (np.asarray(q) / (q0 * 4.0 / 3.0)) ** (gamma + 0.2))

    def c_gk(q):
        return rho * np.sqrt(c_gg(q) * c_kk(q))

    # bins: >= 8 pixels wide, spanning [~0.15 R, R]
    lo = max(0.15 * radius, 9 * a)
    edges = np.linspace(lo, radius, n_bins + 1)
    binm = np.stack([((rabs >= l_) & (rabs < h_)).ravel()
                     for l_, h_ in zip(edges[:-1], edges[1:])])
    ww = (np.real(np.fft.ifft2(np.abs(np.fft.fft2(w)) ** 2))
          * a * a).ravel()
    d_grid = binm @ ww * a * a
    binm_f = binm.astype(float)
    nb = binm.shape[0]

    amp_k = np.sqrt(c_kk(qq)) / a
    amp_g1 = c_gk(qq) / np.maximum(np.sqrt(c_kk(qq)), 1e-30) / a
    amp_g2 = np.sqrt(np.maximum(
        c_gg(qq) - c_gk(qq) ** 2 / np.maximum(c_kk(qq), 1e-30),
        0.0)) / a

    rng = np.random.default_rng(seed)
    batch = 24
    est = np.empty((n_mc, 3 * nb))
    for s in range(0, n_mc, batch):
        b = min(batch, n_mc - s)
        f1 = np.fft.fft2(rng.standard_normal((b, n, n)), axes=(-2, -1))
        f2 = np.fft.fft2(rng.standard_normal((b, n, n)), axes=(-2, -1))
        dg = np.real(np.fft.ifft2(f1 * amp_g1 + f2 * amp_g2,
                                  axes=(-2, -1)))
        gam = np.fft.ifft2(phase2 * (f1 * amp_k), axes=(-2, -1))
        fg = np.fft.fft2(w * dg, axes=(-2, -1))
        fgam = np.fft.fft2(w * gam, axes=(-2, -1))
        cw = (np.real(np.fft.ifft2(np.abs(fg) ** 2, axes=(-2, -1)))
              * a * a).reshape(b, -1)
        est[s:s + b, :nb] = (cw @ binm_f.T) * a * a / d_grid
        g_r = np.fft.ifft2(np.conj(fg) * fgam, axes=(-2, -1)) * a * a
        gt = (-np.real(eph2.reshape(1, n, n) * g_r)).reshape(b, -1)
        est[s:s + b, nb:2 * nb] = (gt @ binm_f.T) * a * a / d_grid
        xp = (np.real(np.fft.ifft2(np.abs(fgam) ** 2, axes=(-2, -1)))
              * a * a).reshape(b, -1)
        est[s:s + b, 2 * nb:] = (xp @ binm_f.T) * a * a / d_grid
    cov_mc = np.cov(est.T)

    if shape == "square":
        from chomp_tpu.mask import PixelMask

        dm = PixelMask(w, a)
    else:
        dm = DiscMask(radius)
    deg = np.degrees(edges)
    kw = dict(n_ell_cov=1024, ell_lo=0.5, ell_hi=2 * np.pi / a / 1.2,
              mask=dm)

    def j(f):
        return lambda e: jnp.asarray(f(e))

    c_ww = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_gg), j(c_gg), j(c_gg), deg, deg, 0.0, 0, 0, **kw))
    c_gt = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_kk), j(c_gk), j(c_gk), deg, deg, 0.0, 2, 2, **kw))
    c_pp = np.asarray(covariance.gaussian_block(
        j(c_kk), j(c_kk), j(c_kk), j(c_kk), deg, deg, 0.0, 0, 0, **kw))
    # beyond-NKA versions: wedge kernels + exact weighted delta; xi_+
    # additionally damps the <gamma gamma><gamma* gamma*> pairing.
    c_ww_b = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_gg), j(c_gg), j(c_gg), deg, deg, 0.0, 0, 0,
        beyond_nka=True, **kw))
    c_gt_b = np.asarray(covariance.gaussian_block(
        j(c_gg), j(c_kk), j(c_gk), j(c_gk), deg, deg, 0.0, 2, 2,
        beyond_nka=True, wedge_probe="gt", **kw))
    c_pp_b = np.asarray(covariance.gaussian_block(
        j(c_kk), j(c_kk), j(c_kk), j(c_kk), deg, deg, 0.0, 0, 0,
        beyond_nka=True, field_spins=((4, 4), (0, 0)),
        wedge_probe="xip", **kw))

    centers = 0.5 * (edges[:-1] + edges[1:])
    dg_mc = np.diag(cov_mc)
    out = {
        "radius": radius, "q0": q0, "gamma": gamma,
        "theta_c": centers, "x": centers / radius,
        "r_ww": dg_mc[:nb] / np.diag(c_ww),
        "r_gt": dg_mc[nb:2 * nb] / np.diag(c_gt),
        "r_xip": dg_mc[2 * nb:] / np.diag(c_pp),
        "b_ww": dg_mc[:nb] / np.diag(c_ww_b),
        "b_gt": dg_mc[nb:2 * nb] / np.diag(c_gt_b),
        "b_xip": dg_mc[2 * nb:] / np.diag(c_pp_b),
        "err_rel": np.sqrt(2.0 / n_mc),
    }
    return out


def main(quick=False):
    n_mc = 400 if quick else 1000
    rows = []
    for radius in (0.35, 0.5, 0.7):
        for q0, gamma in ((15.0, 2.0), (40.0, 2.2)):
            r = run_config(radius, q0=q0, gamma=gamma, n_mc=n_mc,
                           seed=int(radius * 100) + int(q0))
            rows.append(r)
            with np.printoptions(precision=3, suppress=True):
                print(f"R={radius} q0={q0} gamma={gamma}")
                print("  x       ", r["x"])
                print("  ww  nka ", r["r_ww"], " bnka", r["b_ww"])
                print("  gt  nka ", r["r_gt"], " bnka", r["b_gt"])
                print("  xi+ nka ", r["r_xip"], " bnka", r["b_xip"])
            sys.stdout.flush()
    # collapse check: print (x, ratio) pairs sorted for each probe
    for key in ("b_gt", "b_xip", "b_ww"):
        pts = np.concatenate([np.stack([r["x"], r[key]]) for r in rows],
                             axis=1)
        o = np.argsort(pts[0])
        with np.printoptions(precision=3, suppress=True):
            print(f"{key} collapse (x, ratio):")
            print(pts[:, o])
    return rows


if __name__ == "__main__":
    main("--quick" in sys.argv)
