"""Weak-scaling proxy on the virtual CPU mesh (VERDICT r3 item 6).

Runs the distributed banded BA path at D devices with FIXED PER-DEVICE WORK
(landmarks-per-device constant, camera count constant) and reports iters/s
plus the measured per-iteration collective bytes (parsed from the compiled
HLO's all-reduce operands — the quantity that rides DCN across hosts).

HONESTY NOTE: virtual CPU devices share one host's cores, so the iters/s
curve measures compute contention as much as communication — the per-device
compute does NOT stay on separate chips as it would on a pod. The curve is
still evidence that (a) the collective VOLUME stays O(C) per iteration
independent of D and total L (the DCN-cost determinant), and (b) the
sharded program's wall time does not blow up with D. Run standalone:

    python profiling/weak_scaling.py <n_devices>

prints one JSON line.
"""

import json
import os
import sys
import time


def main(n_devices: int):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{n_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import numpy as np
    from jax.sharding import Mesh

    from slam_tricks_tpu.parallel.banded_dist import (
        build_dist_banded_work, make_ba_solver_banded_dist)
    from slam_tricks_tpu.sim import make_trajectory_scene, perturb_scene

    dtype = np.float32
    C = 64
    per_device_lms = int(os.environ.get("SLAM_WEAK_LMS", "1500"))
    L = per_device_lms * n_devices
    scene = make_trajectory_scene(n_cams=C, n_points=L, track_len=6,
                                  seed=71, dtype=dtype)
    poses0, points0, fixed = perturb_scene(
        scene, pose_rot_noise=0.002, pose_trans_noise=0.01,
        point_noise=0.01, seed=72)
    mesh = Mesh(np.array(jax.devices()).reshape(n_devices),
                axis_names=("obs",))
    dwork = build_dist_banded_work(scene.obs, C, L, n_devices, dtype=dtype)
    iters = 6
    solver = make_ba_solver_banded_dist(mesh, max_iters=iters)

    # collective bytes per compiled program from the HLO (all-reduce
    # result types; for all-reduce operand type == result type)
    lowered = solver.lower(poses0, points0, dwork, fixed)
    import re

    txt = lowered.as_text(dialect="hlo")
    coll_bytes = 0
    n_coll = 0
    for line in txt.splitlines():
        if "all-reduce(" not in line:
            continue
        head = line.split("all-reduce(")[0]
        for dims in re.findall(r"f32\[([0-9,]*)\]", head):
            n = int(np.prod([int(x) for x in dims.split(",") if x] or [1]))
            coll_bytes += n * 4
            n_coll += 1

    out = solver(poses0, points0, dwork, fixed)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = solver(poses0, points0, dwork, fixed)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    it = max(int(out.it), 1)
    print(json.dumps({
        "devices": n_devices, "n_cams": C, "n_points": L,
        "lms_per_device": per_device_lms,
        "iters_per_s": round(it / best, 3),
        "ms_per_iter": round(best * 1e3 / it, 2),
        "final_cost": float(out.cost),
        "collective_ops_per_program": n_coll,
        "collective_MB_per_iter": round(coll_bytes / max(it, 1) / 1e6, 4),
    }), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
