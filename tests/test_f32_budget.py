"""float32-vs-float64 tolerance budget (SURVEY.md §4d).

The conftest pins this process to CPU float64; the float32 pipeline is
exercised in a subprocess (float32 needs x64 disabled at jax import
time) and compared against the in-process float64 result.  Budget: the
TPU serving path tracks float64 to <=1e-5 on the worst w(theta) bin —
ACROSS the prior corners, not just near fiducial (measured 1.6e-6 worst
after round 3's erfc occupation-tail fix; the earlier 9.4e-5 was the
float32 1+erf occupation floor, see special.erfc) — since the fused
operator + two-float Hankel contraction (limber_wtheta_fft + ops.df32)
removed the float32 C_ell intermediate that the Bessel cancellation
amplified ~20x.
The subprocess runs --xla_backend_optimization_level=0 so CPU codegen
matches the TPU's faithful compilation of the error-free transforms
(see ops/df32.py backend note).
"""

import subprocess
import sys
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")   # float32: x64 stays off
import jax.numpy as jnp, numpy as np
from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline
from chomp_tpu.params import GridSpec

grid = GridSpec(n_mass=256, lattice_dln=0.016, n_ell=512, n_theta=16)
dist = projection.DNdzGaussian(z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
                               z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
import warnings
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    fn = make_pipeline(default_halo(), default_hod(), dist, grid=grid)
    grid_c = GridSpec(n_mass=256, lattice_dln=0.016, n_ell=512,
                      n_theta=8, theta_min_deg=0.2, theta_max_deg=5.0)
    fn_c = make_pipeline(default_halo(), default_hod(), dist,
                         grid=grid_c, geometry="curved")
# Near-fiducial plus the PRIOR CORNERS (VERDICT round-2 weak #1), from
# the single-source table chomp_tpu.utils.corners.
from chomp_tpu.utils.corners import corner_arrays
om_, ol_, s8_, w0_, wa_ = corner_arrays(
    extra=[(0.25, 0.75, 0.811, -1.0, 0.0), (0.31, 0.69, 0.811, -1.0, 0.0)])
batch = broadcast_cosmo(default_cosmo(), omega_m0=jnp.asarray(om_),
                        omega_l0=jnp.asarray(ol_),
                        sigma_8=jnp.asarray(s8_),
                        w0=jnp.asarray(w0_), wa=jnp.asarray(wa_))
out = jax.jit(jax.vmap(fn))(batch)
assert out["w_theta"].dtype == jnp.float32, out["w_theta"].dtype
out_c = jax.jit(jax.vmap(fn_c))(batch)
np.savez({out_path!r}, w=np.asarray(out["w_theta"], np.float64),
         wc=np.asarray(out_c["w_theta"], np.float64),
         gtc=np.asarray(out_c["gamma_t"], np.float64))
"""


def test_f32_tracks_f64_within_budget(fiducial):
    from chomp_tpu import projection
    from chomp_tpu import default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec
    from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline

    grid = GridSpec(n_mass=256, lattice_dln=0.016, n_ell=512, n_theta=16)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn = make_pipeline(default_halo(), default_hod(), dist, grid=grid)
        grid_c = GridSpec(n_mass=256, lattice_dln=0.016, n_ell=512,
                          n_theta=8, theta_min_deg=0.2, theta_max_deg=5.0)
        fn_c = make_pipeline(default_halo(), default_hod(), dist,
                             grid=grid_c, geometry="curved")
    from chomp_tpu.utils.corners import corner_arrays

    om_, ol_, s8_, w0_, wa_ = corner_arrays(
        extra=[(0.25, 0.75, 0.811, -1.0, 0.0),
               (0.31, 0.69, 0.811, -1.0, 0.0)])
    batch = broadcast_cosmo(fiducial, omega_m0=jnp.asarray(om_),
                            omega_l0=jnp.asarray(ol_),
                            sigma_8=jnp.asarray(s8_),
                            w0=jnp.asarray(w0_), wa=jnp.asarray(wa_))
    w64 = np.asarray(jax.jit(jax.vmap(fn))(batch)["w_theta"])
    assert w64.dtype == np.float64
    out_c64 = jax.jit(jax.vmap(fn_c))(batch)
    wc64 = np.asarray(out_c64["w_theta"])
    gtc64 = np.asarray(out_c64["gamma_t"])

    import os

    with tempfile.TemporaryDirectory() as td:
        out_path = str(Path(td) / "w32.npz")
        script = _SCRIPT.format(repo=str(REPO), out_path=out_path)
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_backend_optimization_level=0")
        subprocess.run([sys.executable, "-c", script], check=True,
                       capture_output=True, cwd=td, env=env)
        f32 = np.load(out_path)
        w32, wc32, gtc32 = f32["w"], f32["wc"], f32["gtc"]

    rel = np.abs(w32 / w64 - 1.0)
    # Round-3 budget after the erfc occupation-tail fix (special.erfc):
    # measured worst bin 1.6e-6 ACROSS the prior corners (was 9.4e-5
    # near-fiducial / 1.6e-4 at the low-omega_m corner with the 1+erf
    # form — the spurious f32 occupation floor dominated the budget).
    assert np.max(rel) < 1e-5, f"f32 budget blown: max rel {np.max(rel)}"
    assert np.median(rel) < 2e-6
    # The curved route shares the f64-composed operator + two-float
    # contraction; measured (tools/measure_f32.py --curved --cpu-f32,
    # full grid 0.02-10 deg): worst bin 2.2e-5 w / 1.1e-6 gt (the w
    # worst sits near the wide-angle zero crossing).
    rel_c = np.abs(wc32 / wc64 - 1.0)
    rel_g = np.abs(gtc32 / gtc64 - 1.0)
    assert np.max(rel_c) < 1e-4, f"curved w budget: {np.max(rel_c)}"
    assert np.max(rel_g) < 1e-4, f"curved gt budget: {np.max(rel_g)}"

