"""Multi-sequence DP training over a virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar4d_tpu.models import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.parallel.multiseq import (
    init_multiseq_state,
    make_multiseq_train_step,
    make_seq_mesh,
)
from lidar4d_tpu.train.losses import LossConfig

H, W, S = 8, 32, 8


@pytest.mark.skipif(len(jax.devices()) < S, reason="needs 8 devices")
def test_multiseq_step_runs_and_diverges_per_sequence():
    scale = 0.01
    cfg = LiDAR4DConfig(
        base_resolution=8, max_resolution=16, log2_hashmap_size=8,
        n_levels_hash=2, n_levels_plane=1, min_resolution=8,
        time_resolution=2, num_frames=4, near_lidar=scale,
        far_lidar=81 * scale,
        flow_n_levels=2, flow_log2_hashmap_size=8,
        flow_base_resolution=8, flow_max_resolution=16,
    )
    field = LiDAR4DField(cfg)
    loss_cfg = LossConfig(flow_loss=False, scale=scale, num_frames=4, iters=50)
    mesh = make_seq_mesh(S)

    state, opt = init_multiseq_state(field, jax.random.PRNGKey(0), S, mesh=mesh)
    # every leaf gained a leading [S] axis
    assert all(l.shape[0] == S for l in jax.tree.leaves(state.params))

    step = make_multiseq_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=16, num_steps=4, patch_size=1, mesh=mesh,
    )

    rng = np.random.default_rng(0)
    depth = rng.uniform(0.1, 0.7, size=(S, H, W)).astype(np.float32)
    frames = {
        "pose": jnp.broadcast_to(jnp.eye(4), (S, 4, 4)),
        "image": jnp.stack(
            [jnp.ones((S, H, W)), jnp.asarray(rng.uniform(size=(S, H, W)),
                                              jnp.float32),
             jnp.asarray(depth)], axis=-1,
        ),
        "time": jnp.asarray(rng.uniform(size=(S,)), jnp.float32),
    }
    keys = jax.random.split(jax.random.PRNGKey(1), S)

    state, metrics = step(state, frames, None, keys)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (S,)
    assert np.isfinite(losses).all()
    # different data per sequence -> different losses and different params
    assert len(np.unique(losses.round(5))) > 1
    p0 = np.asarray(jax.device_get(jax.tree.leaves(state.params)[0]))
    assert not np.allclose(p0[0], p0[1])
    assert int(np.asarray(state.step)[0]) == 1
