"""Benchmark: batched halo-model clustering+lensing w(theta) pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Two configurations are measured (VERDICT round-4 item 2):
  - "value": the SEPARABLE-growth parity configuration (what chomp
    itself computes — the halo-model shape frozen at an explicit
    z_pivot at the kernel mean redshift, so the run is warning-clean);
    this is the continuity number tracked since round 1.
  - "value_exact_z": the physics-honest configuration — the
    separable-growth approximation dropped entirely via
    exact_z_anchors=6 Chebyshev anchor sweeps (the repo's own
    tests/test_exact_z_lattice.py shows the separable shape biases
    C_ell at the >10% level for this deep kernel).

Each computes the Sheth-Tormen mass function, Zheng05 HOD halo model,
nonlinear P_gg and P_gm, Limber C_ell for clustering and lensing
kernels, and w(theta)/gamma_t via the FFTLog MXU operator — all one
jit+vmap program.

Variance control (VERDICT round-4 item 8): N_REPS timed repetitions,
the JSON carries median + IQR per configuration; day-to-day axon-tunnel
variance (CLAUDE.md) makes single-rep means untrustworthy.

Baseline: the BASELINE.md north-star target of 1.0 s/cosmology on one
v5e chip (the reference itself publishes no numbers and takes
seconds-minutes per cosmology on CPU — SURVEY.md §6).
``vs_baseline`` = target_seconds / measured_seconds (>1 == beating it).
"""

import json
import sys
import time

N_COSMO = 512
N_COSMO_EXACT = 64          # exact-z is ~5x the work; amortizes sooner
N_REPS = 10
TARGET_S_PER_COSMO = 1.0    # BASELINE.md north-star row


def _measure(batched, batch, n_cosmo, label):
    """Compile, warm, then N_REPS timed calls -> (median, iqr, out)."""
    import jax
    import numpy as np

    t0 = time.perf_counter()
    out = batched(batch)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"[{label}] compile+first-run: {compile_s:.1f}s on "
          f"{jax.devices()[0]}", file=sys.stderr)

    times = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        out = batched(batch)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times = np.asarray(times)
    med = float(np.median(times))
    q1, q3 = np.percentile(times, [25.0, 75.0])
    print(f"[{label}] batch={n_cosmo} reps={N_REPS} "
          f"median={med*1e3:.1f}ms iqr=[{q1*1e3:.1f},{q3*1e3:.1f}]ms "
          f"per-cosmology={med/n_cosmo*1e3:.3f}ms", file=sys.stderr)
    return med, float(q3 - q1), out


def main():
    import jax

    # Persistent compilation cache: the first full-pipeline compile is
    # ~3-8 min through the remote-compile tunnel; subsequent processes
    # reuse the cache.
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from chomp_tpu import default_cosmo, default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import DEFAULT_GRID
    from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline
    from chomp_tpu import projection

    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))

    # --- configuration A: separable-growth parity (the chomp-parity
    # run, warning-clean: z_pivot pinned at the kernel mean) ----------
    fn = make_pipeline(default_halo(), default_hod(), dist,
                       power_spec="power_gg", grid=DEFAULT_GRID,
                       include_lensing=True, z_pivot=1.0)
    batched = jax.jit(jax.vmap(fn))
    oms = jnp.linspace(0.24, 0.32, N_COSMO)
    s8s = jnp.linspace(0.75, 0.88, N_COSMO)
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms,
                            omega_l0=1.0 - oms, sigma_8=s8s)
    elapsed, iqr, out = _measure(batched, batch, N_COSMO, "separable")
    s_per_cosmo = elapsed / N_COSMO

    w = out["w_theta"]
    finite = bool(jnp.all(jnp.isfinite(w))
                  and jnp.all(jnp.isfinite(out["gamma_t"])))
    if not finite:
        raise SystemExit("non-finite benchmark outputs (separable)")

    # --- configuration B: exact-z anchors (physics-honest) -----------
    fn_x = make_pipeline(default_halo(), default_hod(), dist,
                         power_spec="power_gg", grid=DEFAULT_GRID,
                         include_lensing=True, exact_z_anchors=6)
    batched_x = jax.jit(jax.vmap(fn_x))
    oms_x = jnp.linspace(0.24, 0.32, N_COSMO_EXACT)
    s8s_x = jnp.linspace(0.75, 0.88, N_COSMO_EXACT)
    batch_x = broadcast_cosmo(default_cosmo(), omega_m0=oms_x,
                              omega_l0=1.0 - oms_x, sigma_8=s8s_x)
    elapsed_x, iqr_x, out_x = _measure(batched_x, batch_x,
                                       N_COSMO_EXACT, "exact-z J=6")
    s_per_cosmo_x = elapsed_x / N_COSMO_EXACT
    finite_x = bool(jnp.all(jnp.isfinite(out_x["w_theta"]))
                    and jnp.all(jnp.isfinite(out_x["gamma_t"])))
    if not finite_x:
        raise SystemExit("non-finite benchmark outputs (exact-z)")

    # --- auditability extras (VERDICT round-2 weak #3) ---------------
    # (a) XLA's own FLOP count for the whole batched program.
    flops = float("nan")
    try:
        ca = batched.lower(batch).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception as exc:
        print(f"cost_analysis unavailable: {exc!r}", file=sys.stderr)
    # (b) Per-call dispatch floor: round-trip of a trivial 1-op program
    # through the same (axon-tunnelled) dispatch path.  CLAUDE.md
    # benchmarking gotcha: the true protocol component scales with
    # sequentially-dependent op count, so this is a LOWER bound.
    one = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros(())
    jax.block_until_ready(one(x0))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(one(x0))
    dispatch_s = (time.perf_counter() - t0) / 10
    on_chip_s = max(elapsed - dispatch_s, 0.0)
    # (c) Achieved FLOP/s and an approximate MFU against the v5e bf16
    # peak (197 TFLOP/s).  The pipeline pins its cancellation-sensitive
    # matmuls to Precision.HIGHEST (multi-pass f32), so this understates
    # true MXU occupancy — it is a conservative utilization floor.
    peak = 197.0e12
    achieved = flops / on_chip_s if on_chip_s > 0 else float("nan")
    print(f"flops={flops:.3e} dispatch>={dispatch_s*1e3:.2f}ms "
          f"achieved={achieved/1e12:.2f} TFLOP/s "
          f"mfu~{achieved/peak*100:.2f}% (vs bf16 peak)", file=sys.stderr)

    print(json.dumps({
        "metric": "wtheta_lensing_clustering_s_per_cosmology",
        "value": s_per_cosmo,
        "unit": "s/cosmology",
        "vs_baseline": TARGET_S_PER_COSMO / s_per_cosmo,
        "batch": N_COSMO,
        "reps": N_REPS,
        "iqr_s": iqr,
        "value_exact_z": s_per_cosmo_x,
        "batch_exact_z": N_COSMO_EXACT,
        "iqr_exact_z_s": iqr_x,
        "exact_z_anchors": 6,
        "dispatch_ms_lower_bound": dispatch_s * 1e3,
        "on_chip_ms_per_cosmology": on_chip_s / N_COSMO * 1e3,
        "flops_per_cosmology": flops / N_COSMO,
        "achieved_tflops": achieved / 1e12,
        "approx_mfu_vs_bf16_peak": achieved / peak,
    }))


if __name__ == "__main__":
    main()
