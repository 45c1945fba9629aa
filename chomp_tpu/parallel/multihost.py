"""Multi-host (multi-process) sweeps over DCN: jax.distributed + shared
chunk directory.

SURVEY.md §5.8: "DCN enters only for multi-host sweeps
(``jax.distributed.initialize``)" — the design keeps every per-cosmology
computation local to one process's chips; the ONLY cross-host
coordination is (a) the one-time jax.distributed rendezvous and (b) the
shared chunk directory of :func:`chomp_tpu.parallel.sweep.sweep_chunked`,
whose content-hashed atomic chunk files double as the failure-recovery
protocol (SURVEY.md §5.3/5.4): a crashed or re-run process skips chunks
any process already finished.

Work assignment is strided by process id over the GLOBAL chunk index, so
chunk filenames (and therefore resume semantics) are identical to the
single-host layout — ``read_chunks`` on the full path list reconstructs
the batch regardless of how many hosts produced it.
"""

from __future__ import annotations

import os

import jax

# NOTE: ``from chomp_tpu.parallel import sweep`` would resolve to the
# re-exported sweep() FUNCTION (parallel/__init__.py), not the module.
from chomp_tpu.parallel.sweep import read_chunks, sweep_chunked


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Join (or bootstrap) the multi-process JAX runtime.

    Thin wrapper over ``jax.distributed.initialize`` that also honors the
    standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID) so launchers can configure workers without code.
    No-op if the distributed runtime is already initialized (safe to call
    from library code).
    """
    if jax.distributed.is_initialized():
        return  # already initialized by the launcher
    # (Do NOT probe jax.process_count() here — it would initialize the
    # XLA backend, after which jax.distributed.initialize refuses.)
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return  # single-process mode: nothing to join
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def sweep_chunked_multihost(fn, cosmo_batch, out_dir, chunk_size: int = 32,
                            mesh=None, axis: str = "data",
                            process_id: int | None = None,
                            num_processes: int | None = None):
    """Multi-host :func:`~chomp_tpu.parallel.sweep.sweep_chunked`.

    Every process is handed the SAME global ``cosmo_batch`` (cheap — it
    is a handful of 1-D parameter arrays) and computes only the chunks
    with ``global_chunk_index % num_processes == process_id``, writing
    into one shared ``out_dir``.  Defaults take the ids from the
    initialized jax.distributed runtime.  Returns the full (all-process)
    ordered path list; paths owned by other processes may not exist yet —
    call :func:`wait_for_chunks` (or any external barrier) before
    reading.
    """
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    return sweep_chunked(fn, cosmo_batch, out_dir,
                         chunk_size=chunk_size, mesh=mesh,
                         axis=axis, chunk_offset=process_id,
                         chunk_stride=num_processes)


def wait_for_chunks(paths, timeout_s: float = 600.0, poll_s: float = 0.5):
    """Filesystem barrier: block until every chunk file exists (atomic
    os.replace writes mean existence == complete).  The lightweight
    cross-host sync for reading a multi-host sweep's combined result."""
    import time

    deadline = time.monotonic() + timeout_s
    missing = list(paths)
    while missing:
        missing = [p for p in missing if not os.path.exists(p)]
        if not missing:
            return
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"{len(missing)} chunks still missing after {timeout_s}s: "
                f"{missing[:3]}...")
        time.sleep(poll_s)


def global_mesh_sweep(fn, cosmo_batch, axis: str = "data"):
    """Single-program multi-host sweep over a GLOBAL device mesh.

    The chunked path above is embarrassingly parallel (no collectives);
    this is the true multi-controller alternative for when one batch
    should span every chip of every host in ONE XLA program: all
    processes call this with the SAME global batch, the batch axis is
    sharded over a 1-D mesh of ALL global devices (DCN + ICI), each
    process computes its addressable shard, and the full result is
    allgathered back to every host.

    Requires jax.distributed to be initialized (initialize_distributed)
    and the batch size to divide by the global device count.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    devices = np.array(jax.devices())
    n = int(jax.tree_util.tree_leaves(cosmo_batch)[0].shape[0])
    if n % devices.size:
        raise ValueError(f"batch size {n} not divisible by the "
                         f"{devices.size} global devices")
    mesh = Mesh(devices, (axis,))
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    # Multi-controller device_put: each process provides its addressable
    # shard of the (replicated host-side) global batch.
    batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_callback(
            x.shape, sharding, lambda idx: np.asarray(x)[idx]),
        jax.tree_util.tree_map(jnp.asarray, cosmo_batch))
    out = jax.jit(jax.vmap(fn), out_shardings=sharding)(batch)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: np.asarray(multihost_utils.process_allgather(
            x, tiled=True)), out)


def run_multihost_sweep(fn, cosmo_batch, out_dir, chunk_size: int = 32,
                        mesh=None, axis: str = "data"):
    """Convenience end-to-end: strided chunk sweep + barrier + gather.
    Every process returns the SAME combined result dict."""
    paths = sweep_chunked_multihost(fn, cosmo_batch, out_dir,
                                    chunk_size=chunk_size, mesh=mesh,
                                    axis=axis)
    wait_for_chunks(paths)
    return read_chunks(paths)
