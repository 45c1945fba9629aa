"""Measure the float32 serving path against a float64 reference on the
FULL default grid — the number behind the README's worst-bin claim.

Two subprocesses (float32 needs x64 off at jax import; the reference
needs it on), same pipeline, default GridSpec, a 5-cosmology spread:

    python tools/measure_f32.py            # f32 on the default backend
    python tools/measure_f32.py --cpu-f32  # force the f32 leg onto CPU
    python tools/measure_f32.py --corners  # prior-corner cosmology set
    python tools/measure_f32.py --curved   # geometry="curved" route on
                                           # a wide-bin grid (0.02-10
                                           # deg, the curved regime)

Prints worst/median relative error per observable.  (The pytest budget
check, tests/test_f32_budget.py, runs a trimmed grid for wall-clock;
this tool is the full-grid measurement.)
"""

import json
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_LEG = """
import sys
sys.path.insert(0, {repo!r})
import jax
{platform}
{x64}
import jax.numpy as jnp, numpy as np
from chomp_tpu import default_cosmo, default_halo, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline

dist = projection.DNdzGaussian(z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
                               z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
import warnings
kw = {{}}
if {curved!r}:
    from chomp_tpu.params import GridSpec
    kw = dict(geometry="curved",
              grid=GridSpec(theta_min_deg=0.02, theta_max_deg=10.0))
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    fn = make_pipeline(default_halo(), default_hod(), dist, z_pivot=0.0,
                       **kw)
if {corners!r}:
    # Prior-corner certification set (single source:
    # chomp_tpu.utils.corners).
    from chomp_tpu.utils.corners import corner_arrays
    om_, ol_, s8_, w0_, wa_ = corner_arrays()
    batch = broadcast_cosmo(default_cosmo(), omega_m0=jnp.asarray(om_),
                            omega_l0=jnp.asarray(ol_),
                            sigma_8=jnp.asarray(s8_),
                            w0=jnp.asarray(w0_), wa=jnp.asarray(wa_))
else:
    oms = jnp.asarray([0.24, 0.26, 0.278, 0.30, 0.32])
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms,
                            omega_l0=1.0 - oms)
out = jax.jit(jax.vmap(fn))(batch)
np.savez({out_path!r},
         w=np.asarray(out["w_theta"], np.float64),
         gt=np.asarray(out["gamma_t"], np.float64))
print("leg done:", jax.devices()[0], out["w_theta"].dtype)
"""


def run_leg(out_path, f32: bool, force_cpu: bool, corners: bool,
            curved: bool = False):
    platform = ('jax.config.update("jax_platforms", "cpu")'
                if (force_cpu or not f32) else "pass")
    x64 = ("pass" if f32 else 'jax.config.update("jax_enable_x64", True)')
    code = _LEG.format(repo=str(REPO), platform=platform, x64=x64,
                       out_path=str(out_path), corners=corners,
                       curved=curved)
    subprocess.run([sys.executable, "-c", code], check=True)


def main():
    force_cpu = "--cpu-f32" in sys.argv
    corners = "--corners" in sys.argv
    curved = "--curved" in sys.argv
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        p32 = Path(td) / "f32.npz"
        p64 = Path(td) / "f64.npz"
        run_leg(p32, f32=True, force_cpu=force_cpu, corners=corners,
                curved=curved)
        run_leg(p64, f32=False, force_cpu=True, corners=corners,
                curved=curved)
        a = np.load(p32)
        b = np.load(p64)
        report = {}
        for key in ("w", "gt"):
            rel = np.abs(a[key] / b[key] - 1.0)
            report[key] = {"worst_bin": float(rel.max()),
                           "median": float(np.median(rel))}
        print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
