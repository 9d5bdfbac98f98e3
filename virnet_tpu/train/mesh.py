"""Device mesh / sharding helpers.

The reference's only parallelism is single-node data parallelism with NCCL
DDP (train_denoising_syn.py:35-39, 70-71, 126-139).  The TPU-native
equivalent is a 1-D 'data' mesh: parameters replicated, batch sharded, and
the gradient all-reduce emerges as an XLA psum over ICI when the jitted loss
averages over the sharded batch — no process groups, no ports.

For larger topologies the same helpers build N-D meshes (e.g. ('data',
'model')); models at VIRNet scale (~5-20M params) only ever shard the batch,
but `dryrun_multichip` (repo root) exercises the full sharded train step on
any device count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize multi-host JAX (the no-op of the reference's MASTER_ADDR /
    NCCL port plumbing, train_denoising_syn.py:35-39): on TPU pods the
    runtime discovers everything; arguments are only needed off-pod.

    Returns the process count.  Safe to call on a single host (no-op), but a
    FAILED multi-process initialization is never silent: when the caller
    explicitly asked for multiple processes (num_processes > 1) the error is
    re-raised — a typo'd coordinator address must not degrade to a
    single-process run — and otherwise it is logged at WARNING.
    """
    import logging

    import jax
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count()   # already initialized
    try:
        # NOTE: must run before anything touches the XLA backend (even
        # jax.process_count() counts as touching it).
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError) as exc:
        if num_processes is not None and num_processes > 1:
            raise RuntimeError(
                f"multi-host init failed for coordinator "
                f"{coordinator_address!r} ({num_processes} processes, "
                f"process_id={process_id}): {exc}") from exc
        logging.getLogger("virnet_tpu").warning(
            "jax.distributed.initialize unavailable (%s); continuing "
            "single-process", exc)
    return jax.process_count()


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Move a host batch (pytree of arrays, leading batch dim) onto the mesh
    sharded along the data axis."""
    sharding = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
