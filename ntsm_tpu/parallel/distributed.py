"""Multi-host initialization.

The reference is single-process OpenMP (SURVEY §2.3); scaling this
framework across hosts is standard JAX multi-controller: every host runs
the same program, `jax.distributed.initialize()` wires the processes, and
the 1-D data mesh in mesh.py then spans all chips — counting stays
collective-free in steady state (per-device count vectors) with one merge
riding ICI/DCN at the end.

Input sharding across hosts follows the file axis: each host passes its
own shard of the FASTQ list to the counting engine (the count-file merge
contract, eval/merge.py, combines per-host results exactly), or for a
single huge file, hosts use `ParallelFileReader`-style striding by batch
index.

On a single host this module is a no-op; nothing here is required for
1-chip runs.
"""

from __future__ import annotations

import os


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a
    TPU pod's automatic configuration).  Returns True if multi-process
    mode was initialized."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None and process_id is None:
        # TPU pods self-configure via the metadata server; elsewhere,
        # single-process mode needs no initialization.
        try:
            jax.distributed.initialize()
            return jax.process_count() > 1
        except Exception:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def host_file_shard(paths, process_id: int | None = None, num: int | None = None):
    """This host's shard of the input file list (stride partition)."""
    import jax

    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num is None else num
    return list(paths)[pid::n]
