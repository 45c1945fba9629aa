"""Observability utilities (SURVEY.md §5.1/5.2/5.5).

The reference has no tracing, sanitizers, or metrics.  The rebuild's
equivalents:

  - :func:`convergence_report` — the order-doubling diagnostic
    (SURVEY.md §7: "convergence = double-the-order test", exposed as a
    runtime tool, not just a test-suite property);
  - :func:`nan_guard` — jax debug-NaN scoped context for test/debug
    runs (pure-functional code has no races to detect — §5.2);
  - :func:`stage_timer` — wall-clock per stage with device sync (the
    timing harness behind benchmarks/).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def convergence_report(cosmo, halo_params, hod, dist, grid=None) -> dict:
    """Relative shifts of key pipeline outputs under order doubling of
    each quadrature axis.  Everything well below 1e-4 means the static
    GridSpec is converged for this parameter point."""
    from chomp_tpu import halo as halo_mod
    from chomp_tpu import limber_fft, correlation
    from chomp_tpu.params import DEFAULT_GRID
    from chomp_tpu.projection import WindowGalaxy

    grid = grid or DEFAULT_GRID
    win = WindowGalaxy(dist=dist)
    ells = correlation.ell_grid(grid)[0]
    th = np.logspace(np.log10(grid.theta_min_deg),
                     np.log10(grid.theta_max_deg), 8)

    def w_of(g):
        model = halo_mod.build_halo_model(cosmo, halo_params, hod, 0.0,
                                          False, g)
        p = limber_fft.p_lattice_halo(cosmo, halo_params, model, "power_gg",
                                      False, g)
        cl = limber_fft.limber_cl_fft(cosmo, win, win, ells, p, g,
                                      growth_pivot=model.mass.growth)
        return np.asarray(correlation.wtheta_from_cl_fused(cl, th, grid))

    base = w_of(grid)
    report = {}
    for axis, kw in [
        ("n_mass", {"n_mass": grid.n_mass * 2}),
        ("sigma_panels", {"sigma_panels": grid.sigma_panels * 2}),
        ("n_growth", {"n_growth": grid.n_growth * 2}),
        ("n_dist", {"n_dist": grid.n_dist * 2}),
    ]:
        doubled = w_of(grid.replace(**kw))
        report[axis] = float(np.max(np.abs(doubled / base - 1.0)))
    return report


@contextlib.contextmanager
def nan_guard():
    """Enable jax NaN debugging within the scope (test/debug mode)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def stage_timer(name: str, sink: dict | None = None):
    """Wall-clock a stage with device synchronization."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = dt
    else:
        print(f"[chomp_tpu] {name}: {dt * 1e3:.2f} ms")
