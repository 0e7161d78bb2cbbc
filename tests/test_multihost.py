"""True multi-process distributed test: 2 processes x 4 CPU devices each run
the observation-sharded BA solver over a global 8-device mesh via
jax.distributed — validating the multi-host code path (DCN analog) without a
pod. The worker re-execs this file with role=worker."""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

PORT = 52345


def _worker(process_id):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                               num_processes=2, process_id=process_id)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from slam_tricks_tpu.parallel import make_ba_solver
    from slam_tricks_tpu.parallel.partition import (build_local_pairs,
                                                    partition_obs_by_landmark)
    from slam_tricks_tpu.parallel.multihost import global_obs_mesh, make_global_array
    from slam_tricks_tpu.sim import make_scene, perturb_scene

    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    scene = make_scene(n_per_wall=8, n_cams=5, seed=71)
    poses0, points0, fixed = perturb_scene(scene, seed=72)
    obs = partition_obs_by_landmark(scene.obs, 8)
    pairs = build_local_pairs(obs, 8, dtype=np.float64)
    mesh = global_obs_mesh()

    # each process contributes its half of the (track-partitioned) obs arrays
    # and its 4 devices' pair chunks
    n = obs.cam_idx.shape[0]
    half = n // 2
    sl = slice(process_id * half, (process_id + 1) * half)

    def glob(a):
        return make_global_array(np.asarray(a[sl]), mesh, P("obs"))

    def glob_pairs(a):
        return make_global_array(np.asarray(a[process_id * 4:(process_id + 1) * 4]),
                                 mesh, P("obs"))

    obs_global = type(obs)(cam_idx=glob(obs.cam_idx), lm_idx=glob(obs.lm_idx),
                           uv=glob(obs.uv), weight=glob(obs.weight))
    pairs_global = type(pairs)(pair_a=glob_pairs(pairs.pair_a),
                               pair_b=glob_pairs(pairs.pair_b),
                               pair_w=glob_pairs(pairs.pair_w))

    solver = make_ba_solver(mesh, max_iters=15)
    out = solver(poses0, points0, obs_global, pairs_global, fixed)
    cost = float(out.cost)
    print(f"WORKER{process_id} FINAL_COST={cost:.6e}", flush=True)
    assert cost < 1e-18, cost

    # distributed banded path over the same 2-process global mesh
    from slam_tricks_tpu.parallel.banded_dist import (
        build_dist_banded_work, make_ba_solver_banded_dist)
    from slam_tricks_tpu.sim import make_trajectory_scene
    from slam_tricks_tpu.solvers import banded_flat

    tscene = make_trajectory_scene(n_cams=16, n_points=240, track_len=4,
                                   seed=73, dtype=np.float64)
    tposes0, tpoints0, tfixed = perturb_scene(tscene, seed=74)
    dwork = build_dist_banded_work(tscene.obs, 16, 240, 8, dtype=np.float64)

    def glob_lead(a):
        a = np.asarray(a)
        return make_global_array(a[process_id * 4:(process_id + 1) * 4],
                                 mesh, P("obs"))

    local = jax.tree_util.tree_map(glob_lead, dwork.local)
    dwork_g = dwork._replace(local=local)
    outb = make_ba_solver_banded_dist(mesh, max_iters=8)(
        tposes0, tpoints0, dwork_g, tfixed)
    bw = banded_flat.build_banded_work(tscene.obs, 16, 240, dtype=np.float64)
    ref = banded_flat.solve_ba_banded(tposes0, tpoints0, bw,
                                      fixed_mask=tfixed, max_iters=8)
    cb, cr = float(outb.cost), float(ref.cost)
    rel = abs(cb - cr) / max(cr, 1e-30)
    print(f"WORKER{process_id} BANDED_COST={cb:.6e} REL={rel:.2e}", flush=True)
    assert rel < 1e-6, (cb, cr)

    # distributed large-C PCG path over the same 2-process global mesh
    # (ROADMAP: multi-host validation of the banded AND PCG paths): the
    # landmark-partitioned work's leading device axis is assembled from
    # per-process slices, trajectory-parity vs the single-device flat-PCG
    # solve at a fixed pre-convergence iteration count
    from slam_tricks_tpu.parallel.partition import partition_obs_by_landmark as _pbl
    from slam_tricks_tpu.parallel.pcg_dist import (build_dist_work,
                                                   make_ba_solver_pcg_dist)
    from slam_tricks_tpu.solvers import schur_flat
    from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work

    pobs = _pbl(tscene.obs, 8)
    pwork = build_dist_work(pobs, 16, 240, 8, dtype=np.float64)

    def glob_dev(a):
        a = np.asarray(a)
        return make_global_array(a[process_id * 4:(process_id + 1) * 4],
                                 mesh, P("obs"))

    obs_g, flat_g, pcg_g, lmg_g = jax.tree_util.tree_map(
        glob_dev, ((pwork.obs_cam, pwork.obs_lm, pwork.obs_uv, pwork.obs_w),
                   pwork.flat, pwork.pcg, pwork.lm_global))
    pwork_g = pwork._replace(obs_cam=obs_g[0], obs_lm=obs_g[1],
                             obs_uv=obs_g[2], obs_w=obs_g[3],
                             flat=flat_g, pcg=pcg_g, lm_global=lmg_g)
    kw = dict(max_iters=5, cg_iters=200, cg_tol=1e-12)
    outp = make_ba_solver_pcg_dist(mesh, **kw)(tposes0, tpoints0, pwork_g,
                                               tfixed)
    sflat = schur_flat.build_flat_work(pobs, 16, 240, dtype=np.float64,
                                       use_cam_table=True)
    spcg = build_pcg_work(pobs, 16, dtype=np.float64)
    sref = schur_flat.solve_ba_flat(tposes0, tpoints0, pobs, sflat,
                                    fixed_mask=tfixed, linear="pcg",
                                    pcg_work=spcg, **kw)
    cp, cs = float(outp.cost), float(sref.cost)
    relp = abs(cp - cs) / max(cs, 1e-30)
    print(f"WORKER{process_id} PCG_COST={cp:.6e} REL={relp:.2e}", flush=True)
    assert relp < 1e-6, (cp, cs)
    jax.distributed.shutdown()


@pytest.mark.skipif(sys.platform != "linux", reason="linux-only launcher")
@pytest.mark.slow
def test_two_process_distributed_ba():
    procs = []
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "worker", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    costs = [float(re.search(r"FINAL_COST=([\d.e+-]+)", o).group(1)) for o in outs]
    assert costs[0] == costs[1]
    assert costs[0] < 1e-18
    bcosts = [float(re.search(r"BANDED_COST=([\d.e+-]+)", o).group(1))
              for o in outs]
    assert bcosts[0] == bcosts[1]
    pcosts = [float(re.search(r"PCG_COST=([\d.e+-]+)", o).group(1))
              for o in outs]
    assert pcosts[0] == pcosts[1]


if __name__ == "__main__" and len(sys.argv) >= 3 and sys.argv[1] == "worker":
    _worker(int(sys.argv[2]))
