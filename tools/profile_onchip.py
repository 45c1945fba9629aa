"""On-chip cost attribution for the flagship pipeline by ABLATION
(VERDICT round-4 item 8).

``jax.profiler`` device tracing does not work through the axon remote
TPU tunnel (the trace call hangs waiting on the profiler service —
probed round 5), so the attribution runs as nested prefix programs of
the flagship w(theta)+gamma_t pipeline at the headline batch: each
variant jits the pipeline UP TO a stage boundary and reduces to a
scalar (so XLA cannot dead-code the stage), wall-clock medians are
taken at batch 512 where the ~25 ms dispatch floor amortizes to
0.05 ms/cosmology, and consecutive DIFFERENCES give per-stage on-chip
cost.  The CLAUDE.md round-2 gotcha (fine-grained timings of small
programs are dispatch-dominated) does not bite differences of
large-batch programs.

Run on the TPU: python tools/profile_onchip.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax

try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from chomp_tpu import halo, limber_fft, projection
from chomp_tpu.hod import default_hod
from chomp_tpu.params import DEFAULT_GRID, default_cosmo, default_halo
from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline
from chomp_tpu.correlation import ell_grid

N_COSMO = 512
REPS = 10


def timed(f, batch):
    out = f(batch)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(f(batch))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    h = default_halo()
    hod = default_hod()
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    win_g = projection.WindowGalaxy(dist=dist)
    win_k = projection.WindowConvergence(dist=dist)
    ells_np = ell_grid(DEFAULT_GRID)[0]
    oms = jnp.linspace(0.24, 0.32, N_COSMO)
    s8s = jnp.linspace(0.75, 0.88, N_COSMO)
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms,
                            omega_l0=1.0 - oms, sigma_8=s8s)

    # Nested prefixes of the flagship program.  z_pivot=1.0 matches
    # the headline bench configuration.
    def v_halo(c):
        m = halo.build_halo_model(c, h, hod, 1.0)
        return m.n_g + m.bias_avg if hasattr(m, "bias_avg") else m.n_g

    def v_pgg(c):
        m = halo.build_halo_model(c, h, hod, 1.0)
        p = limber_fft.p_lattice_halo(c, h, m, "power_gg")
        return jnp.sum(p)

    def v_pboth(c):
        m = halo.build_halo_model(c, h, hod, 1.0)
        p = limber_fft.p_lattice_halo_all(c, h, m, False, DEFAULT_GRID)
        # the flagship pipeline consumes gg + gm (mm only with shear);
        # summing exactly these lets XLA prune what the real program
        # prunes.
        return jnp.sum(p["power_gg"]) + jnp.sum(p["power_gm"])

    def v_clgg(c):
        m = halo.build_halo_model(c, h, hod, 1.0)
        p = limber_fft.p_lattice_halo_all(c, h, m, False, DEFAULT_GRID)
        cl = limber_fft.limber_cl_fft(c, win_g, win_g, ells_np,
                                      p["power_gg"], DEFAULT_GRID,
                                      growth_pivot=m.mass.growth)
        return jnp.sum(cl)

    def v_clboth(c):
        m = halo.build_halo_model(c, h, hod, 1.0)
        p = limber_fft.p_lattice_halo_all(c, h, m, False, DEFAULT_GRID)
        piv = m.mass.growth
        cl1 = limber_fft.limber_cl_fft(c, win_g, win_g, ells_np,
                                       p["power_gg"], DEFAULT_GRID,
                                       growth_pivot=piv)
        cl2 = limber_fft.limber_cl_fft(c, win_g, win_k, ells_np,
                                       p["power_gm"], DEFAULT_GRID,
                                       growth_pivot=piv)
        return jnp.sum(cl1) + jnp.sum(cl2)

    full = make_pipeline(h, hod, dist, z_pivot=1.0)

    def v_full(c):
        out = full(c)
        return jnp.sum(out["w_theta"]) + jnp.sum(out["gamma_t"])

    # NOT strictly nested in cost: XLA prunes everything a variant's
    # scalar does not consume, so each row is the cost of the MINIMAL
    # program producing that output; read the deltas with the
    # dependency structure in mind (e.g. "C_ell gg only" includes the
    # P_gg lattice but NOT P_gm).
    variants = [("halo model (tables+HOD+n_g)", v_halo),
                ("P_gg lattice only", v_pgg),
                ("P_gg + P_gm lattices", v_pboth),
                ("C_ell gg (P_gg + window + conv)", v_clgg),
                ("C_ell gg + gm (both legs)", v_clboth),
                ("full w+gt (FFTLog + bins)", v_full)]

    one = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    jax.block_until_ready(one(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(one(x0))
    floor = (time.perf_counter() - t0) / 10

    print(f"device {jax.devices()[0]}  batch {N_COSMO}  reps {REPS}  "
          f"dispatch floor {floor*1e3:.1f} ms/call")
    prev = floor
    rows = []
    for name, fn in variants:
        t = timed(jax.jit(jax.vmap(fn)), batch)
        rows.append((name, t, t - prev))
        prev = t
    print(f"{'prefix program':42s} {'wall':>9s} {'stage delta':>12s}  "
          f"(ms/cosmology)")
    for name, t, d in rows:
        print(f"  {name:40s} {t/N_COSMO*1e3:8.3f} {d/N_COSMO*1e3:11.3f}")
    total = rows[-1][1]
    print(f"full on-chip ~ {(total - floor)/N_COSMO*1e3:.3f} "
          f"ms/cosmology (wall {total/N_COSMO*1e3:.3f} - floor)")


if __name__ == "__main__":
    main()
