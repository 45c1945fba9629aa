"""The prior-hypervolume certification corner set (single source).

Everything that certifies accuracy "across the prior", not just near
the fiducial point — tests/test_prior_corners.py (f64 route
equivalence), tests/test_f32_budget.py (float32 budget, in-process and
subprocess legs), tools/measure_f32.py --corners (full-default-grid
measurement) — imports THIS table, so the certified hypervolume cannot
silently desynchronize between them (round-3 review finding).  The
measured results live in docs/NUMERICS.md §7.

Corners: low/high (omega_m, sigma_8), CPL (w0, wa) corners, and an
open case (Omega_k = 0.10).  All satisfy E^2(z) > 0 on z in [0, 25].
"""

from __future__ import annotations

# name -> (omega_m0, omega_l0, sigma_8, w0, wa)
PRIOR_CORNERS = {
    "low_om_low_s8": (0.18, 0.82, 0.60, -1.0, 0.0),
    "high_om_high_s8": (0.42, 0.58, 1.00, -1.0, 0.0),
    "cpl_phantom": (0.278, 0.722, 0.811, -1.5, 0.5),
    "cpl_quintessence": (0.278, 0.722, 0.811, -0.5, -0.5),
    "open": (0.25, 0.65, 0.811, -1.0, 0.0),
}


def corner_arrays(extra=()):
    """Column arrays (om, ol, s8, w0, wa) over the corner set, plus any
    ``extra`` rows of the same 5-tuple shape (e.g. near-fiducial
    points), as plain Python lists — safe to embed in subprocess
    source via repr()."""
    rows = list(PRIOR_CORNERS.values()) + list(extra)
    om, ol, s8, w0, wa = (list(c) for c in zip(*rows))
    return om, ol, s8, w0, wa
