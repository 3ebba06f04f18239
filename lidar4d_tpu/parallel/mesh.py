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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=0, devices=None):
    """1-D data-parallel mesh over the first n (or all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_rays(mesh, *arrays):
    """Constrain leading (ray/point) axis to be sharded over the data axis."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    out = []
    for a in arrays:
        spec = P(DATA_AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec)))
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
