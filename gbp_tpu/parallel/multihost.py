"""Multi-host execution: process-spanning meshes for the SPMD GBP paths.

The reference is a single Python process (SURVEY.md §5 "Distributed
communication backend: none"); the TPU-native scaling story [BASELINE.json:
north_star "1 chip -> 1 host -> N>=2 hosts"] is:

  * `initialize()` — `jax.distributed.initialize` wrapper.  On a TPU pod
    slice call it with no arguments (coordinator/process count auto-detected
    from the TPU environment); for the multi-process CPU simulation used in
    tests pass (coordinator_address, num_processes, process_id) explicitly
    and set `--xla_force_host_platform_device_count=K` BEFORE importing jax
    (see tests/_multihost_worker.py).
  * `global_mesh()` — a 1-D mesh over ALL devices of all processes.  The
    halo-sharded sweep (parallel/halo.py) and the GSPMD path run on it
    unchanged: the same `shard_map` program compiles to per-process
    executables and the boundary collectives ride DCN between hosts (Gloo on
    CPU) exactly as they ride ICI within one.
  * `collect_means(hp, state)` — cross-process variant of
    halo.collect_means (per-chip shards are not host-addressable across
    processes; this all-gathers them to every host first).

Tested by tests/test_multihost.py: 2 processes x 4 virtual CPU devices must
reproduce the single-process 8-device result (SURVEY.md §4 "distributed =
same graphs under shard_map ... using jax.distributed multi-process CPU/TPU
simulation").
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               **kwargs) -> None:
    """Join (or form) the multi-process runtime.

    No-arg form auto-detects TPU pod topology; the explicit form is for CPU
    simulation and manual clusters."""
    if coordinator_address is None:
        jax.distributed.initialize(**kwargs)
    else:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id, **kwargs)


def global_mesh(axis: str = "graph") -> Mesh:
    """1-D device mesh spanning every process's devices."""
    return Mesh(np.asarray(jax.devices()).reshape(-1), (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0


def collect_means(hp, state) -> tuple:
    """halo.collect_means across processes: all-gather the owned shards to
    the host, then scatter into global order (identical on every host)."""
    from jax.experimental import multihost_utils

    out = []
    for vbi, vb in enumerate(hp.src_graph.vblocks):
        m = np.asarray(
            multihost_utils.process_allgather(state.v[vbi].mean, tiled=True))
        ids, val = hp.owned_ids[vbi], hp.owned_valid[vbi]
        g = np.zeros((vb.count, vb.dof), dtype=m.dtype)
        g[ids[val]] = m[val]
        out.append(g)
    return tuple(out)
