"""Device mesh + sharding helpers.

The reference is strictly single-GPU (`torch.distributed` imported but never
used, runner.py:19; one `cuda:0` everywhere) — distribution is a new,
first-class capability here:

  * rays are embarrassingly parallel across the batch axis
    (renderer.py:44-140), so training uses pure data parallelism over a 1-D
    `Mesh(("data",))`: ray batches sharded, parameters replicated, gradient
    reduction left to XLA (GSPMD inserts the psum over ICI);
  * sharding enters via `with_sharding_constraint` on the sampled rays inside
    the jitted step — XLA propagates the partitioning through the renderer
    and the loss reductions;
  * flow-loss point clouds shard over their point axis the same way;
  * multi-host (pod) scale reuses the same annotations over a larger mesh.
"""

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"  # across hosts (data-center network)
ICI_AXIS = "ici"  # within a host's chip group (inter-chip interconnect)


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host entry: start the JAX distributed runtime (pod scale).

    On real TPU pods `jax.distributed.initialize()` auto-discovers the
    topology; explicit args (or LIDAR4D_COORDINATOR / LIDAR4D_NUM_PROCS /
    LIDAR4D_PROC_ID env vars) cover CPU/GPU clusters. A no-op when neither
    is present — single-process runs (including this repo's one-chip env and
    the virtual CPU meshes) skip the runtime entirely.

    Returns True iff the distributed runtime was initialized.
    """
    coordinator = coordinator or os.environ.get("LIDAR4D_COORDINATOR")
    if num_processes is None and os.environ.get("LIDAR4D_NUM_PROCS"):
        num_processes = int(os.environ["LIDAR4D_NUM_PROCS"])
    if process_id is None and os.environ.get("LIDAR4D_PROC_ID"):
        process_id = int(os.environ["LIDAR4D_PROC_ID"])
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(n_devices=0, devices=None):
    """1-D data-parallel mesh over the first n (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_hierarchical_mesh(n_hosts=0, per_host=0, devices=None):
    """2-axis (dcn, ici) mesh for the multi-host stretch config.

    Rows are hosts, columns are each host's chips — `jax.devices()` orders
    devices host-major, so row-adjacency = ICI-adjacency and the gradient
    psum lowers to a reduce within each host's ICI ring followed by one
    cross-host DCN reduce (the scaling-book layout for pure DP). Multi-
    sequence training shards sequences over `dcn` and rays over `ici`.
    """
    if devices is None:
        devices = jax.devices()
    if n_hosts <= 0:
        n_hosts = max(jax.process_count(), 1)
    if per_host <= 0:
        per_host = max(len(devices) // n_hosts, 1)
    devices = devices[: n_hosts * per_host]
    arr = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(arr, (DCN_AXIS, ICI_AXIS))


def _ray_spec(mesh, ndim):
    """Partition the leading (ray/point) axis over EVERY mesh axis: on the
    1-D data mesh that's P('data'); on the hierarchical mesh the ray batch
    splits over (dcn, ici) jointly."""
    return P(tuple(mesh.axis_names), *([None] * (ndim - 1)))


def shard_rays(mesh, *arrays):
    """Constrain leading (ray/point) axis to be sharded over the mesh."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = []
    for a in arrays:
        out.append(jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, _ray_spec(mesh, a.ndim))
        ))
    return tuple(out) if len(out) > 1 else out[0]


def replicate(mesh, tree):
    """Fully replicate a pytree over the mesh (parameters, frame data)."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def gather_rays(mesh, *arrays):
    """Constrain arrays to be fully replicated (an explicit all-gather).

    Used in front of ops whose internals iterate with `lax.scan` over the
    gathered operand (e.g. the tiled chamfer): without this, GSPMD places
    the all-gather *inside* the loop body — a per-iteration cross-module
    collective. Gathering the (small) operands once outside the loop is
    faster on ICI and required for the in-process CPU collective runtime.
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    sharding = NamedSharding(mesh, P())
    out = [jax.lax.with_sharding_constraint(a, sharding) for a in arrays]
    return tuple(out) if len(out) > 1 else out[0]
