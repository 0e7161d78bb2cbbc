"""Two-view reconstruction demo — the st22 main analog: simulate, robust
8-point init, recover pose, triangulate, joint refinement; report pose error
and per-point depth errors (main.cpp:17-36 logging role).

Run:  python examples/two_view_demo.py [--cpu]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from slam_tricks_tpu.manifolds import se3
    from slam_tricks_tpu.pipelines import solve_two_view
    from slam_tricks_tpu.sim.two_view import make_two_view
    from slam_tricks_tpu.utils import get_logger

    log = get_logger("two_view_demo")
    dtype = np.float64 if args.cpu else np.float32
    scene = make_two_view(n_points=100, noise=3e-4, dtype=dtype)
    res = solve_two_view(scene.uv1, scene.uv2)

    t_ref = np.asarray(scene.T_12.t)
    scale = np.linalg.norm(t_ref)
    t_ref_n = t_ref / scale
    rot_err = np.abs(np.asarray(res.T_12.R) - np.asarray(scene.T_12.R)).max()
    t_err = np.abs(np.asarray(res.T_12.t) - t_ref_n).max()
    log.info("cheirality votes: %d/100", int(res.n_cheiral))
    log.info("rotation err (max abs): %.2e | translation dir err: %.2e", rot_err, t_err)

    # depth comparison in cam-1 frame (reference logs per-point depths)
    p_c1 = np.asarray(se3.act(scene.T1, scene.points)) / scale
    depth_err = np.abs(np.asarray(res.points[:, 2]) - p_c1[:, 2])
    log.info("depth err (scale-normalized): median %.2e max %.2e",
             float(np.median(depth_err)), float(depth_err.max()))
    log.info("refined cost: %.3e", float(res.final_cost))


if __name__ == "__main__":
    sys.exit(main())
