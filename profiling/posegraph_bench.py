"""10k-pose chain+loop-closure pose-graph benchmark — runs as a SUBPROCESS
of bench.py with its own jax config (CPU backend + x64): pose graphs are
KB-sized f64-precision problems (chain conditioning passes 1/eps32 near
N ~ 600, solvers/posegraph.py), while the MAIN bench process must keep x64
OFF — with x64 enabled the tunneled-TPU toolchain SIGABRTs compiling the
f64-promoted SVD chains of the icp/two-view/zhang configs.

Prints one JSON line.
"""

import json
import sys
import time


def main(n_poses=10_000, n_loops=64):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    import jax.numpy as jnp

    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.solvers.posegraph import (build_chain_work,
                                                   solve_pose_graph_chain)

    dtype = np.float64
    N = int(n_poses)
    rng = np.random.default_rng(17)
    ang = 2 * np.pi * np.arange(N) / N
    t_true = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                       0.1 * np.sin(3 * ang)], 1)
    Rt = np.stack([np.array([[np.cos(a), -np.sin(a), 0],
                             [np.sin(a), np.cos(a), 0],
                             [0, 0, 1]]) for a in ang])
    poses_true = se3.SE3(jnp.asarray(Rt.astype(dtype)),
                         jnp.asarray(t_true.astype(dtype)))
    ii = np.concatenate([np.arange(N - 1),
                         rng.integers(0, N // 4, n_loops)])
    jj = np.concatenate([np.arange(1, N),
                         rng.integers(3 * N // 4, N, n_loops)])
    Ti = jax.tree_util.tree_map(lambda a: a[ii], poses_true)
    Tj = jax.tree_util.tree_map(lambda a: a[jj], poses_true)
    Zc = jax.vmap(lambda a, b: se3.mul(se3.inv(a), b))(Ti, Tj)
    scale = np.where(np.arange(len(ii)) < N - 1, 0.002, 0.0005)
    xi = rng.normal(size=(len(ii), 6)) * scale[:, None]
    Z = jax.vmap(lambda T, x: se3.mul(T, se3.exp(x)))(
        Zc, jnp.asarray(xi.astype(dtype)))
    info = jnp.broadcast_to(jnp.eye(6, dtype=dtype), (len(ii), 6, 6))
    R0, t0 = [Rt[0]], [t_true[0]]
    Zr, Zt = np.asarray(Z.R), np.asarray(Z.t)
    for k in range(N - 1):
        R0.append(R0[-1] @ Zr[k])
        t0.append(R0[-2] @ Zt[k] + t0[-1])
    poses0 = se3.SE3(jnp.asarray(np.stack(R0).astype(dtype)),
                     jnp.asarray(np.stack(t0).astype(dtype)))
    work = build_chain_work(ii, jj, Z, info, N, dtype=dtype)
    fixed = jnp.zeros(N, bool).at[0].set(True)
    mi = 12
    solve = jax.jit(solve_pose_graph_chain, static_argnames=("max_iters",))
    out = solve(poses0, work, fixed_mask=fixed, max_iters=mi)
    jax.block_until_ready(out.cost)
    best = float("inf")
    for _ in range(2):
        t0_ = time.perf_counter()
        out = solve(poses0, work, fixed_mask=fixed, max_iters=mi)
        jax.block_until_ready(out.cost)
        best = min(best, time.perf_counter() - t0_)
    err0 = float(np.sqrt(np.mean((np.stack(t0) - t_true) ** 2)))
    err = float(np.sqrt(np.mean((np.asarray(out.poses.t) - t_true) ** 2)))
    print(json.dumps({
        "backend": "cpu-f64 subprocess (pose graphs are KB-sized; TPU f64 "
                   "is emulated — measured 966 ms/iter at N=2048)",
        "n_poses": N, "n_loop_edges": int(n_loops),
        "ms_per_iter": round(best * 1e3 / max(int(out.it), 1), 2),
        "lm_iters": int(out.it), "final_cost": float(out.cost),
        "ate_before": round(err0, 4), "ate_after": round(err, 4),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000,
         int(sys.argv[2]) if len(sys.argv) > 2 else 64)
