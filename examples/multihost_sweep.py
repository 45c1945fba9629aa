"""Multi-host cosmology sweep demo (SURVEY.md §5.8).

Run N worker processes against one coordinator; each computes its strided
share of the chunked sweep into a shared directory, then all of them read
the combined result.  On real multi-host TPU pods the launcher (or
``jax.distributed.initialize()`` auto-detection) provides the coordinator
and ids; this demo self-spawns CPU workers so it runs anywhere:

    python examples/multihost_sweep.py --workers 2 --n-cosmo 16

or launch workers by hand (what a SLURM/GKE script would do):

    python examples/multihost_sweep.py --worker --process-id 0 \
        --num-processes 2 --coordinator localhost:29400 --out-dir /tmp/sw &
    python examples/multihost_sweep.py --worker --process-id 1 \
        --num-processes 2 --coordinator localhost:29400 --out-dir /tmp/sw
"""

import argparse
import os
import subprocess
import sys
import tempfile


def worker(args):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from chomp_tpu.parallel import multihost

    multihost.initialize_distributed(args.coordinator,
                                     num_processes=args.num_processes,
                                     process_id=args.process_id)
    print(f"[worker {jax.process_index()}] joined: "
          f"{jax.process_count()} processes, "
          f"{len(jax.devices())} global devices")

    import jax.numpy as jnp

    from chomp_tpu import default_halo
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec, default_cosmo
    from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline
    from chomp_tpu.projection import DNdzGaussian

    grid = GridSpec(n_mass=128, n_mu=8, sigma_panels=8, sigma_n_per_panel=32,
                    n_growth=32, n_dist=32)
    dist = DNdzGaussian(z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
                        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    fn = make_pipeline(default_halo(), default_hod(), dist, z_pivot=1.0,
                       grid=grid, include_lensing=False)
    batch = broadcast_cosmo(
        default_cosmo(),
        omega_m0=jnp.linspace(0.24, 0.34, args.n_cosmo),
        sigma_8=jnp.linspace(0.75, 0.87, args.n_cosmo))
    res = multihost.run_multihost_sweep(fn, batch, args.out_dir,
                                        chunk_size=args.chunk_size)
    print(f"[worker {jax.process_index()}] combined result: "
          f"w_theta {res['w_theta'].shape} over {args.n_cosmo} cosmologies")


def launcher(args):
    out_dir = args.out_dir or tempfile.mkdtemp(prefix="chomp_sweep_")
    coord = f"localhost:{args.port}"
    procs = []
    for i in range(args.workers):
        cmd = [sys.executable, __file__, "--worker", "--process-id", str(i),
               "--num-processes", str(args.workers), "--coordinator", coord,
               "--out-dir", out_dir, "--n-cosmo", str(args.n_cosmo),
               "--chunk-size", str(args.chunk_size)]
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(cmd, env=env))
    rc = max(p.wait() for p in procs)
    print(f"all workers done (rc={rc}); chunks in {out_dir}")
    sys.exit(rc)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--port", type=int, default=29400)
    ap.add_argument("--n-cosmo", type=int, default=16)
    ap.add_argument("--chunk-size", type=int, default=4)
    a = ap.parse_args()
    if a.worker:
        worker(a)
    else:
        launcher(a)
