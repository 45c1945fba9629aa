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
    from chomp_tpu.parallel import multihost
    from chomp_tpu.parallel.sweep import broadcast_cosmo
    multihost.initialize_distributed(f"localhost:{port}",
                                     num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    import jax.numpy as jnp
    from chomp_tpu import background, default_cosmo

    def fn(cosmo):
        return {
            "chi1": background.comoving_distance(cosmo, 1.0, 32),
            "d1": background.growth_factor(cosmo, 1.0, 32),
        }

    batch = broadcast_cosmo(default_cosmo(),
                            omega_m0=jnp.linspace(0.25, 0.32, 12))
    res = multihost.run_multihost_sweep(fn, batch, out_dir, chunk_size=2)
    # Single-program global-mesh path: one XLA program over all 4 global
    # devices (2 hosts x 2), result allgathered to every process.
    gres = multihost.global_mesh_sweep(fn, batch)
    assert gres["chi1"].shape == (12,), gres["chi1"].shape
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
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from chomp_tpu import background, default_cosmo
    from chomp_tpu.parallel.sweep import broadcast_cosmo

    combined = np.load(out_dir / "combined.npz")
    batch = broadcast_cosmo(
        default_cosmo(), omega_m0=jnp.linspace(0.25, 0.32, 12))
    ref_chi = np.asarray(jax.vmap(
        lambda c: background.comoving_distance(c, 1.0, 32))(batch))
    np.testing.assert_allclose(combined["chi1"], ref_chi, rtol=1e-12)
    assert combined["chi1"].shape == (12,)
    # The single-program global-mesh route agrees too.
    gmesh = np.load(out_dir / "global_mesh.npz")
    np.testing.assert_allclose(gmesh["chi1"], ref_chi, rtol=1e-12)
