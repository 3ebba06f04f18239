"""Round-2 on-chip probe: plane_bilinear kernel correctness + timings.

Run on the real TPU in the background (first compiles take minutes):
    cd /root/repo && nohup python scripts/perf_probe_r2.py > /tmp/probe_r2.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lidar4d_tpu.ops.plane_onehot import plane_bilinear, plane_bilinear_ref


def sync(x):
    return float(jnp.sum(x))  # device->host transfer = the only reliable sync


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    print("backend:", jax.default_backend(), flush=True)

    # -------- correctness on-chip (small)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    grid = jax.random.normal(k1, (3, 8, 16, 24), jnp.float32)
    pts = jax.random.uniform(k2, (3, 173, 2), jnp.float32, -0.2, 1.2)
    out = np.asarray(plane_bilinear(grid, pts))
    ref = np.asarray(plane_bilinear_ref(grid, pts))
    err = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    print(f"fwd rel err (small): {err:.2e}", flush=True)

    cot = jax.random.normal(jax.random.PRNGKey(7), (3, 8, 173))
    gk = jax.jit(jax.grad(lambda g, p: jnp.sum(plane_bilinear(g, p) * cot),
                          argnums=(0, 1)))
    gr = jax.jit(jax.grad(lambda g, p: jnp.sum(plane_bilinear_ref(g, p) * cot),
                          argnums=(0, 1)))
    (dgk, dpk), (dgr, dpr) = gk(grid, pts), gr(grid, pts)
    print(f"dgrid rel err: {np.abs(np.asarray(dgk-dgr)).max()/np.abs(np.asarray(dgr)).max():.2e}",
          flush=True)
    print(f"dpts  rel err: {np.abs(np.asarray(dpk-dpr)).max()/max(np.abs(np.asarray(dpr)).max(),1e-6):.2e}",
          flush=True)

    # -------- timings at density-query scale
    n = 196_608
    for (h, w) in [(256, 256), (8, 256), (128, 128)]:
        kg, kp = jax.random.split(jax.random.PRNGKey(1))
        grid = jax.random.normal(kg, (3, 8, h, w), jnp.float32)
        pts = jax.random.uniform(kp, (3, n, 2), jnp.float32)

        f_k = jax.jit(plane_bilinear)
        f_r = jax.jit(plane_bilinear_ref)
        t_k = timeit(f_k, grid, pts)
        t_r = timeit(f_r, grid, pts)

        cot = jnp.ones((3, 8, n), jnp.float32)
        g_k = jax.jit(jax.grad(lambda g, p: jnp.sum(plane_bilinear(g, p) * cot),
                               argnums=(0, 1)))
        g_r = jax.jit(jax.grad(lambda g, p: jnp.sum(plane_bilinear_ref(g, p) * cot),
                               argnums=(0, 1)))
        tg_k = timeit(lambda a, b: g_k(a, b)[0], grid, pts)
        tg_r = timeit(lambda a, b: g_r(a, b)[0], grid, pts)
        print(f"[{h}x{w}] N={n}: fwd kernel {t_k:.1f} ms vs gather {t_r:.1f} ms"
              f" | fwd+bwd kernel {tg_k:.1f} ms vs gather {tg_r:.1f} ms",
              flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
