"""Multi-host sweep integration: 2 jax.distributed CPU processes, one
shared chunk directory (SURVEY.md §5.8 / VERDICT round-1 item 4).

The workers are real OS processes (subprocess + localhost coordinator),
each seeing its own local CPU devices; coordination is exactly the
production mechanism — the jax.distributed rendezvous plus the
content-hashed atomic chunk files of sweep_chunked.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); nproc = int(sys.argv[2])
    out_dir = sys.argv[3]; port = sys.argv[4]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # Share the suite's persistent compile cache: the flagship-pipeline
    # compile dominated this test's 200+ s wall-clock otherwise.
    import chomp_tpu as _pkg
    _cache = os.path.join(os.path.dirname(os.path.dirname(_pkg.__file__)),
                          "tests", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from chomp_tpu.parallel import multihost
    from chomp_tpu.parallel.sweep import broadcast_cosmo
    multihost.initialize_distributed(f"localhost:{port}",
                                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    import jax.numpy as jnp
    import warnings
    from chomp_tpu import default_cosmo, default_halo, projection
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec
    from chomp_tpu.parallel.sweep import make_pipeline

    # The FLAGSHIP pipeline (halo model -> lattice Limber -> fused
    # Hankel, w + gamma_t) on the tiny grid — the same program
    # dryrun_multichip compiles; VERDICT round-2 weak #4 asked for the
    # real pipeline, not a toy observable, across the 2-process path.
    TINY = GridSpec(n_k=64, n_k_table=256, sigma_panels=4,
                    sigma_n_per_panel=16, n_growth=16, n_dist=16,
                    n_mass=64, n_z_proj=16, n_z_lens=16, n_ell=64,
                    n_theta=8, n_z_dndz=32, n_mu=8)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn = make_pipeline(default_halo(), default_hod(), dist, grid=TINY,
                           include_lensing=True)

    batch = broadcast_cosmo(default_cosmo(),
                            omega_m0=jnp.linspace(0.25, 0.32, 12),
                            omega_l0=1.0 - jnp.linspace(0.25, 0.32, 12))
    res = multihost.run_multihost_sweep(fn, batch, out_dir, chunk_size=2)
    # Single-program global-mesh path: one XLA program over all 4 global
    # devices (2 hosts x 2), result allgathered to every process.
    gres = multihost.global_mesh_sweep(fn, batch)
    assert gres["w_theta"].shape == (12, 8), gres["w_theta"].shape
    if pid == 0:
        import numpy as np
        np.savez(os.path.join(out_dir, "combined.npz"),
                 **{k: np.asarray(v) for k, v in res.items()})
        np.savez(os.path.join(out_dir, "global_mesh.npz"),
                 **{k: np.asarray(v) for k, v in gres.items()})
    print("WORKER", pid, "OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_multihost_sweep(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out_dir = tmp_path / "chunks"
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    # Workers must NOT inherit this test process's 8-device XLA_FLAGS.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(out_dir), str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "WORKER 0 OK" in outs[0] + outs[1]
    assert "WORKER 1 OK" in outs[0] + outs[1]

    # 12 items / chunk_size 2 = 6 chunks, all present, strided ownership.
    chunk_files = sorted(f for f in os.listdir(out_dir)
                         if f.startswith("chunk_"))
    assert len(chunk_files) == 6, chunk_files

    # Combined result equals the direct single-process computation.
    import warnings

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from chomp_tpu import default_cosmo, default_halo, projection
    from chomp_tpu.hod import default_hod
    from chomp_tpu.params import GridSpec
    from chomp_tpu.parallel.sweep import broadcast_cosmo, make_pipeline

    TINY = GridSpec(n_k=64, n_k_table=256, sigma_panels=4,
                    sigma_n_per_panel=16, n_growth=16, n_dist=16,
                    n_mass=64, n_z_proj=16, n_z_lens=16, n_ell=64,
                    n_theta=8, n_z_dndz=32, n_mu=8)
    dist = projection.DNdzGaussian(
        z_min=jnp.asarray(0.0), z_max=jnp.asarray(2.0),
        z0=jnp.asarray(1.0), sigma_z=jnp.asarray(0.2))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fn = make_pipeline(default_halo(), default_hod(), dist, grid=TINY,
                           include_lensing=True)
    combined = np.load(out_dir / "combined.npz")
    batch = broadcast_cosmo(
        default_cosmo(), omega_m0=jnp.linspace(0.25, 0.32, 12),
        omega_l0=1.0 - jnp.linspace(0.25, 0.32, 12))
    ref = jax.jit(jax.vmap(fn))(batch)
    ref_w = np.asarray(ref["w_theta"])
    ref_gt = np.asarray(ref["gamma_t"])
    assert combined["w_theta"].shape == (12, 8)
    # Same f64 program, different processes/shardings: fp-level only.
    np.testing.assert_allclose(combined["w_theta"], ref_w, rtol=1e-10)
    np.testing.assert_allclose(combined["gamma_t"], ref_gt, rtol=1e-10)
    # The single-program global-mesh route agrees too.
    gmesh = np.load(out_dir / "global_mesh.npz")
    np.testing.assert_allclose(gmesh["w_theta"], ref_w, rtol=1e-10)
    np.testing.assert_allclose(gmesh["gamma_t"], ref_gt, rtol=1e-10)
