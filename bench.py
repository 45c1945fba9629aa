"""Benchmark: batched halo-model clustering+lensing w(theta) pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric: wall-clock seconds per cosmology for the full flagship pipeline
(BASELINE.json configs[4] asks >=100 batched cosmologies; 512
amortizes the fixed per-launch host cost better): each computes the
Sheth-Tormen mass function, Zheng05 HOD halo model, nonlinear P_gg and
P_gm, Limber C_ell for clustering and lensing kernels, and
w(theta)/gamma_t via the FFTLog MXU operator — all one jit+vmap program.

Baseline: the BASELINE.md north-star target of 1.0 s/cosmology on one
v5e chip (the reference itself publishes no numbers and takes
seconds-minutes per cosmology on CPU — SURVEY.md §6).
``vs_baseline`` = target_seconds / measured_seconds (>1 == beating it).
"""

import json
import sys
import time

N_COSMO = 512
TARGET_S_PER_COSMO = 1.0  # BASELINE.md north-star row


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
    fn = make_pipeline(default_halo(), default_hod(), dist,
                       power_spec="power_gg", grid=DEFAULT_GRID,
                       include_lensing=True)
    batched = jax.jit(jax.vmap(fn))

    oms = jnp.linspace(0.24, 0.32, N_COSMO)
    s8s = jnp.linspace(0.75, 0.88, N_COSMO)
    batch = broadcast_cosmo(default_cosmo(), omega_m0=oms,
                            omega_l0=1.0 - oms, sigma_8=s8s)

    # Compile + warm up.
    t0 = time.perf_counter()
    out = batched(batch)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print(f"compile+first-run: {compile_s:.1f}s on {jax.devices()[0]}",
          file=sys.stderr)

    # Steady state (amortized MCMC-sweep regime).
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = batched(batch)
        jax.block_until_ready(out)
    elapsed = (time.perf_counter() - t0) / reps
    s_per_cosmo = elapsed / N_COSMO

    w = out["w_theta"]
    finite = bool(jnp.all(jnp.isfinite(w)) and jnp.all(jnp.isfinite(out["gamma_t"])))
    print(f"batch={N_COSMO} thetas={w.shape[-1]} wall={elapsed:.3f}s "
          f"per-cosmology={s_per_cosmo * 1e3:.2f}ms finite={finite}",
          file=sys.stderr)
    if not finite:
        raise SystemExit("non-finite benchmark outputs")

    print(json.dumps({
        "metric": "wtheta_lensing_clustering_s_per_cosmology",
        "value": s_per_cosmo,
        "unit": "s/cosmology",
        "vs_baseline": TARGET_S_PER_COSMO / s_per_cosmo,
    }))


if __name__ == "__main__":
    main()
