"""Bundle-adjustment demo — the st20 test_ceres/test_g2o main analog.

Simulates the cube-room scene, perturbs, solves with the Schur LM solver,
reports cost/ATE, streams per-iteration metrics (IterationCallback role), and
renders the Hessian sparsity + scene (DataManager viz roles).

Run:  python examples/ba_demo.py [--cpu]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--cams", type=int, default=30)
    ap.add_argument("--per-wall", type=int, default=100)
    ap.add_argument("--noise", type=float, default=1e-3)
    ap.add_argument("--out", default="/tmp/ba_demo")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    from slam_tricks_tpu.evaluation import ate_translation_rmse, reprojection_rms
    from slam_tricks_tpu.sim import make_scene, perturb_scene
    from slam_tricks_tpu.solvers import schur
    from slam_tricks_tpu.utils import Timer, get_logger
    from slam_tricks_tpu.viz import hessian_sparsity_image, plot_ba_scene

    log = get_logger("ba_demo")
    dtype = np.float64 if args.cpu else np.float32
    scene = make_scene(n_per_wall=args.per_wall, n_cams=args.cams,
                       pix_noise=args.noise, dtype=dtype)
    poses0, points0, fixed = perturb_scene(scene)
    n_obs = int(np.sum(np.asarray(scene.obs.weight) > 0))
    log.info("scene: %d cams, %d landmarks, %d observations",
             scene.n_cams, scene.n_points, n_obs)
    log.info("initial ATE: %.4f m", float(
        ate_translation_rmse(poses0, scene.poses_true)))

    def iter_cb(it, cost, lam):
        log.process("iter %3d  cost %.6e  lambda %.2e", int(it), float(cost), float(lam))

    t = Timer()
    solve = jax.jit(schur.solve_ba, static_argnames=("max_iters",))
    final = solve(poses0, points0, scene.obs, fixed_mask=fixed, max_iters=30,
                  callback=iter_cb)
    t.lap("compile+solve", sync=final)
    final = solve(poses0, points0, scene.obs, fixed_mask=fixed, max_iters=30)
    t.lap("steady-state solve", sync=final)
    log.info(t.report())

    log.info("final cost %.4e in %d iters", float(final.cost), int(final.it))
    log.info("final ATE: %.6f m | reprojection RMS: %.3e", float(
        ate_translation_rmse(final.poses, scene.poses_true)),
        float(reprojection_rms(final.poses, final.points, scene.obs.cam_idx,
                               scene.obs.lm_idx, scene.obs.uv, scene.obs.weight)))

    import os
    os.makedirs(args.out, exist_ok=True)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = hessian_sparsity_image(scene.n_cams, min(scene.n_points, 120),
                                 np.asarray(scene.obs.cam_idx),
                                 np.asarray(scene.obs.lm_idx) % 120)
    plt.imsave(os.path.join(args.out, "hessian_sparsity.png"), img, cmap="gray")
    plot_ba_scene(os.path.join(args.out, "scene.png"), final.poses, final.points)
    log.info("wrote %s/{hessian_sparsity.png, scene.png}", args.out)


if __name__ == "__main__":
    sys.exit(main())
