"""Multi-host (DCN) input feeding for pod-scale data parallelism.

The reference is strictly single-GPU (SURVEY.md §2.7) — this subsystem has
no reference counterpart; it is the TPU-pod analog of "the input pipeline
keeps the accelerator fed" (reference train.py's single-process DataLoader).

On a multi-host TPU pod each process owns a subset of the global mesh's
devices and can only device_put onto those. The feeding contract here:

1. Every process constructs the SAME epoch order (the samplers are
   deterministic in (seed, epoch) — data/sampler.py), so batch boundaries
   agree globally without any coordination traffic.
2. Each process materializes only its OWN row slice of every global batch
   (`local_rows`): rows [p*B/P, (p+1)*B/P) of a B-row batch on process p.
   The loader therefore reads 1/P of the feature bytes per host — the DCN
   never carries input data, only the gradient all-reduce XLA emits.
3. `global_batch` assembles the per-host arrays into one jax.Array sharded
   over the mesh's data axis via jax.make_array_from_process_local_data —
   no cross-host transfer happens at assembly time; each shard is already
   on its owner's devices.

Single-process meshes degrade transparently: local_rows is the identity
and make_array_from_process_local_data is then just a sharded device_put,
so the same train loop runs on one host or a pod unchanged.

Validated by tests/test_multihost.py: a 2-process CPU cluster
(jax.distributed on localhost, 4 virtual devices per process) assembles
global batches from disjoint local halves and matches the single-process
loss bit-for-bit.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from .mesh import DATA_AXIS, batch_sharding

Array = jax.Array


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join (or skip joining) the JAX distributed runtime.

    On real TPU pods all three arguments come from the environment and
    jax.distributed.initialize() autodetects them — call with no arguments.
    Explicit arguments exist for CPU/localhost clusters (tests) and
    nonstandard launchers. No-op when num_processes == 1 or when already
    initialized (re-initialization raises inside JAX)."""
    if num_processes == 1:
        return
    if jax._src.distributed.global_state.client is not None:  # already up
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def local_rows(n_rows: int, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> slice:
    """This process's row slice of every n_rows-row global batch.

    n_rows must divide evenly by the process count — the collate layer's
    fixed-shape row-budget packs (data/collate.py) guarantee constant batch
    shapes, so a global batch size divisible by the host count is a config
    choice, not a per-batch accident."""
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n_rows % n != 0:
        raise ValueError(
            f"global batch of {n_rows} rows does not divide over {n} hosts; "
            f"pick batch_size as a multiple of the host count"
        )
    per = n_rows // n
    return slice(p * per, (p + 1) * per)


def local_view(batch: Dict[str, np.ndarray],
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Slice a host-side batch dict down to this process's rows.

    In production each host's loader only BUILDS its own rows (pass the
    local_rows slice into the dataset gather); this helper exists for the
    boundary where a full batch is already materialized (tests, converters,
    single-host fallbacks)."""
    sl = local_rows(
        next(iter(batch.values())).shape[0], process_index, process_count
    )
    return {k: np.asarray(v)[sl] for k, v in batch.items()}


def global_batch(mesh, local: Dict[str, np.ndarray],
                 global_rows: Optional[int] = None) -> Dict[str, Array]:
    """Assemble per-host row slices into data-axis-sharded global arrays.

    `local` holds this process's rows only (global_rows / process_count of
    them). Returns jax.Arrays whose global shape has the full row count,
    sharded P('data') over `mesh` — ready for the same pjit train step the
    single-host path uses (parallel/step.py). Assembly is transfer-free:
    each process's slice lands on its own devices."""
    sh = batch_sharding(mesh)
    n_local = next(iter(local.values())).shape[0]
    g_rows = (
        n_local * jax.process_count() if global_rows is None else global_rows
    )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sh, x, (g_rows,) + x.shape[1:]
        )

    return {k: put(v) for k, v in local.items()}


def launch_cpu_cluster_env(process_id: int, num_processes: int,
                           coordinator_port: int,
                           devices_per_process: int = 4) -> Dict[str, str]:
    """Environment for a localhost CPU cluster worker (tests/tooling).

    The container pins JAX_PLATFORMS to the TPU plugin via sitecustomize;
    workers must force CPU AFTER import (jax.config.update), so this only
    returns the env and the worker script does the forcing."""
    env = dict(os.environ)
    env.update(
        MESM_MH_PROCESS_ID=str(process_id),
        MESM_MH_NUM_PROCESSES=str(num_processes),
        MESM_MH_COORDINATOR=f"localhost:{coordinator_port}",
        XLA_FLAGS=(
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={devices_per_process}"
        ).strip(),
    )
    return env
