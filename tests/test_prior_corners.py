"""Prior-hypervolume certification (VERDICT round-2 weak #1).

The flagship lattice route's static machinery (fiducial Newton seed,
lattice chi bounds, z<=25 clamp) must hold far from the fiducial point,
not just near it.  These tests pin:

  - end-to-end w/gamma_t route equivalence (lattice vs GL+table) at the
    prior CORNERS: omega_m in {0.18, 0.42}, sigma_8 in {0.6, 1.0},
    CPL corners (w0, wa) = (-1.5, +0.5) / (-0.5, -0.5), an open case
    (Omega_k = 0.10) — measured <= 5.4e-6 on the trimmed grid;
  - the loud lattice-coverage error (validate_params via the pipeline's
    own fn.validate) instead of a silent window truncation.

The float32 corner budget lives in tests/test_f32_budget.py (same
corner set); the full-default-grid measurement is
``python tools/measure_f32.py --corners`` (worst bin 1.05e-6, see
docs/NUMERICS.md).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import GridSpec
from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline, sweep

GRID = GridSpec(n_mass=256, lattice_dln=0.016, n_ell=512, n_theta=16)


def corner_batch(fiducial):
    from chomp_tpu.utils.corners import corner_arrays

    om, ol, s8, w0, wa = corner_arrays()
    return broadcast_cosmo(fiducial, omega_m0=jnp.asarray(om),
                           omega_l0=jnp.asarray(ol),
                           sigma_8=jnp.asarray(s8),
                           w0=jnp.asarray(w0), wa=jnp.asarray(wa))


def dist():
    return projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))


@pytest.mark.slow
def test_lattice_route_tracks_reference_at_corners(fiducial):
    """w/gamma_t: FFT-lattice route vs the GL+cubic-table reference at
    every prior corner (measured worst 5.4e-6; asserted at 3e-5)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn_fft = make_pipeline(default_halo(), default_hod(), dist(),
                               grid=GRID)
        fn_tab = make_pipeline(default_halo(), default_hod(), dist(),
                               grid=GRID, method="table")
    batch = corner_batch(fiducial)
    out_f = jax.jit(jax.vmap(fn_fft))(batch)
    out_t = jax.jit(jax.vmap(fn_tab))(batch)
    for key in ("w_theta", "gamma_t"):
        a = np.asarray(out_f[key])
        b = np.asarray(out_t[key])
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
        rel = np.max(np.abs(a / b - 1.0))
        assert rel < 3e-5, f"{key}: lattice-vs-table {rel} at a corner"


def test_lattice_coverage_loud_error(fiducial):
    """A window whose chi(z_max) exceeds lattice_chi_hi must FAIL LOUDLY
    through sweep(validate=True) (pipeline-aware fn.validate), not
    silently truncate the Limber integral."""
    small = GRID.replace(lattice_chi_hi=3.0e3)   # chi(z=2) ~ 3600 > 3000
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn = make_pipeline(default_halo(), default_hod(), dist(),
                           grid=small, include_lensing=False)
    batch = broadcast_cosmo(fiducial, omega_m0=jnp.asarray([0.278]),
                            omega_l0=jnp.asarray([0.722]))
    with pytest.raises(ValueError, match="lattice_chi_hi"):
        sweep(fn, batch, validate=True)
    # The default grid covers the same window fine.
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn_ok = make_pipeline(default_halo(), default_hod(), dist(),
                              grid=GRID, include_lensing=False)
    assert fn_ok.validate(batch) == []
    # And the z<=25 Newton clamp is flagged too.
    deep = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(30.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn_deep = make_pipeline(default_halo(), default_hod(), deep,
                                grid=GRID, include_lensing=False)
    assert any("z=25" in p for p in fn_deep.validate(batch))


def test_table_route_skips_lattice_coverage_check(fiducial):
    """Round-3 review finding: a method="table" pipeline never touches
    the conv lattice, so its fn.validate must NOT flag lattice bounds
    (previously a spurious hard error on a correct configuration)."""
    small = GRID.replace(lattice_chi_hi=3.0e3)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn = make_pipeline(default_halo(), default_hod(), dist(),
                           grid=small, include_lensing=False,
                           method="table")
    batch = broadcast_cosmo(fiducial, omega_m0=jnp.asarray([0.278]),
                            omega_l0=jnp.asarray([0.722]))
    assert fn.validate(batch) == []
    sweep(fn, batch, validate=True)   # must not raise
