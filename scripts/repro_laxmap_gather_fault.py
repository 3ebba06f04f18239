"""Minimal repro: `lax.map` over gather-path render chunks faults the TPU
worker (VERDICT r4 weak #4 — paper trail for the host-loop workaround).

Observed first on the parity-architecture eval (r3): a single 4096-ray x
768-sample gather-path chunk renders fine (twice in a row, warm), but the
`lax.map` COMPOSITE over the 17 chunks of a full 66x1030 frame kills the
worker with `UNAVAILABLE: TPU worker process crashed or restarted`
(diagnosed by scripts/probe_parity_eval.py on the trained ep14 checkpoint;
workaround shipped r4 as models/renderer.py::render_staged_host —
gather-path eval/test/sim render through a host-side python chunk loop
reusing the proven single-chunk executable; one-hot fields keep the
compiled lax.map).

This script is the checkpoint-free, data-free distillation: the exact
parity-architecture field (2^19-row gather hash tables, 15/13/13 dynamic,
2^18 flow grid) at RANDOM init — the fault is a compile/runtime property of
the mapped gather composite, not of trained weights. Stages (each prints
before/after so a crash log shows where it died):

  1. jit(render_rays) on one 4096-ray x 768-sample chunk, twice — expected OK
  2. render_staged_host over the full frame (the workaround)     — expected OK
  3. render_staged (lax.map over the same 17 chunks)             — expected
     TPU worker crash on the environment of record

If stage 3 passes on a newer libtpu/XLA, the host-loop workaround in
renderer.render_staged_host has met its exit condition and gather-path
fields can return to the compiled lax.map.

Environment of record (fault first reproduced r3, diagnosed r4):
  jax 0.9.0 / jaxlib 0.9.0 / libtpu 0.0.34, TPU v5e-1 via the axon tunnel.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python scripts/repro_laxmap_gather_fault.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    print("jax", jax.__version__, flush=True)

    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.models.renderer import (
        render_rays,
        render_staged,
        render_staged_host,
    )
    from lidar4d_tpu.ops.rays import get_lidar_rays

    # the reference-parity architecture (configs/kitti360_4950.txt class):
    # 2^19-row gather hash tables — NOT one-hot eligible, so render_staged
    # would route through lax.map if forced
    scale = 0.01
    cfg = LiDAR4DConfig(
        num_frames=51, near_lidar=1.0 * scale, far_lidar=81.0 * scale,
        log2_hashmap_size=19, hash_size_dynamic=(15, 13, 13),
        flow_log2_hashmap_size=18,
    )
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    n_par = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    print(f"parity field at random init: {n_par/1e6:.1f}M params", flush=True)

    H, W, num_steps, chunk = 66, 1030, 768, 4096
    rays = get_lidar_rays(jnp.eye(4), (2.0, 26.9), H, W, N=-1)
    ro, rd = rays["rays_o"], rays["rays_d"]
    t = jnp.float32(0.5)
    print(f"frame: {ro.shape[0]} rays -> {-(-ro.shape[0] // chunk)} chunks "
          f"of {chunk} x {num_steps} samples", flush=True)

    fwd = jax.jit(
        lambda o, d: render_rays(field, params, o, d, t,
                                 num_steps=num_steps, perturb=False,
                                 with_aux=False)
    )
    print("--- stage 1: jit(render_rays) on one chunk, twice", flush=True)
    for rep in range(2):
        t0 = time.perf_counter()
        s = float(jnp.sum(fwd(ro[:chunk], rd[:chunk])["depth_lidar"]))
        print(f"    run {rep}: sum(depth)={s:.3f} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)

    print("--- stage 2: render_staged_host full frame (the workaround)",
          flush=True)
    t0 = time.perf_counter()
    out = render_staged_host(field, params, ro, rd, t, num_steps=num_steps,
                             chunk=chunk)
    s = float(jnp.sum(out["depth_lidar"]))
    print(f"    OK: sum(depth)={s:.3f} ({time.perf_counter()-t0:.1f}s)",
          flush=True)

    print("--- stage 3: render_staged lax.map composite over the same "
          "chunks (expected: TPU worker crash on libtpu 0.0.34)", flush=True)
    t0 = time.perf_counter()
    out = render_staged(field, params, ro, rd, t, num_steps=num_steps,
                        chunk=chunk)
    s = float(jnp.sum(out["depth_lidar"]))
    print(f"    SURVIVED: sum(depth)={s:.3f} "
          f"({time.perf_counter()-t0:.1f}s) — the render_staged_host "
          "workaround can be retired", flush=True)


if __name__ == "__main__":
    main()
