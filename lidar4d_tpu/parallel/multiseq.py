"""Multi-sequence joint training: one field per sequence, sequences sharded
over the mesh.

The reference trains each KITTI-360 sequence in a separate single-GPU run
(run_kitti_lidar4d.sh); here S sequences train simultaneously — every
parameter/optimizer leaf gains a leading [S] axis that is sharded over the
mesh's "seq" axis, and the per-sequence train step is vmapped across it.
With S == mesh size this is embarrassingly parallel (no collectives except
XLA bookkeeping); it is the BASELINE "multi-sequence scale-up" configuration
(pod-scale: outer DP over sequences, inner ray sharding per sequence).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar4d_tpu.train.train_step import TrainState, init_train_state, make_train_step

SEQ_AXIS = "seq"


def make_seq_mesh(n_seq, devices=None):
    if devices is None:
        devices = jax.devices()
    assert len(devices) >= n_seq, f"need {n_seq} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))


def init_multiseq_state(field, key, n_seq, lr=1e-2, iters=30000, mesh=None):
    """Stacked TrainState: every leaf gains a leading [S] axis."""
    keys = jax.random.split(key, n_seq)

    def one(k):
        state, _ = init_train_state(field, k, lr=lr, iters=iters)
        return state

    state = jax.vmap(one)(keys)
    _, opt = init_train_state(field, key, lr=lr, iters=iters)
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P(SEQ_AXIS)))
    return state, opt


def make_multiseq_train_step(field, opt, loss_cfg, *, H, W, fov_lidar,
                             num_rays=1024, num_steps=768, patch_size=1,
                             mesh=None, num_coarse=0, num_fine=0):
    """Returns step(state_S, frames_S, flow_caches_S, keys_S) vmapped over S.

    frames_S: per-sequence frame dicts stacked on axis 0; flow_caches_S the
    same (or None); keys_S: [S, 2] PRNG keys.
    """
    inner = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=fov_lidar,
        num_rays=num_rays, num_steps=num_steps, patch_size=patch_size,
        mesh=None, num_coarse=num_coarse, num_fine=num_fine,
    )

    vstep = jax.vmap(inner, in_axes=(0, 0, 0, 0))

    if mesh is None:
        return jax.jit(vstep)

    sharding = NamedSharding(mesh, P(SEQ_AXIS))

    @jax.jit
    def step(state, frames, flow_caches, keys):
        state = jax.lax.with_sharding_constraint(state, sharding)
        frames = jax.lax.with_sharding_constraint(frames, sharding)
        if flow_caches is not None:
            flow_caches = jax.lax.with_sharding_constraint(
                flow_caches, sharding
            )
        new_state, metrics = vstep(state, frames, flow_caches, keys)
        return (
            jax.lax.with_sharding_constraint(new_state, sharding),
            metrics,
        )

    return step
