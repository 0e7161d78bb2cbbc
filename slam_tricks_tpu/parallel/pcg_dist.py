"""Distributed large-C BA: pose-side collectives of O(C*6) bytes per CG
iteration (VERDICT r2 item 5 / SURVEY §2.2 item 2 "at scale, pose blocks").

The replicated paths (sharded_ba.py, landmark_local.py) materialize the full
reduced camera system and psum a dense (C,6,C,6) mass — ~151 MB/iteration at
C=1024 and an O((6C)^3) replicated factorization, so multi-chip and large C
were mutually exclusive. This module runs the EXACT flat-layout PCG solver
(solvers/schur_flat.solve_ba_flat(linear='pcg', psum_axis=...)) inside
shard_map instead:

  - observations are landmark-locality partitioned (parallel/partition.py):
    every landmark's whole track lives on one device, so the landmark blocks,
    their elimination, the per-track reductions, AND the landmark state
    itself (points live with their owner — no (L,3) psum per iteration) are
    shard-local;
  - camera/pose state is replicated; the ONLY cross-device traffic is
      psum (C,28)            once per linearization  (Hpp, gp, cost)
      psum (C,6,6)+(C-1,6,6) once per linearization  (tridiag preconditioner)
      psum (C,6)             once per CG iteration   (the S-matvec partial)
      psum scalars           once per LM iteration   (pred, step, bad)
    i.e. ~1.6 MB per LM iteration at C=1024 with 50 CG iterations — 100x
    less than the replicated path — and NOTHING scales with L or N. A psum
    of a (C,6) vector over an ICI ring is lowered as reduce-scatter +
    all-gather, which is exactly the "pose blocks owned by shards" dataflow;
  - the block-tridiagonal preconditioner factorization/application and the
    CG scalar recurrences are replicated (O(C*6^3) work — trivial next to
    the local linearization).

The reference has no parallelism at all (num_threads=1 everywhere,
st17-ceres/src/include/solver.hpp:281); this is the solver-domain analog of
data parallelism over the visibility graph described in SURVEY §2.2, applied
to the reference BA problem shape (st20 spiral trajectory,
st20-g2o/src/src/sim_data.cpp:47-96) at scales the reference never reaches.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_tricks_tpu.parallel.partition import partition_obs_by_landmark  # noqa: F401
from slam_tricks_tpu.solvers import schur_flat
from slam_tricks_tpu.solvers.pcg_flat import build_pcg_work
from slam_tricks_tpu.solvers.schur_flat import FlatWork, build_flat_work


class DistPCGWork(NamedTuple):
    """Per-device local index structures, stacked on a leading device axis.
    All tables index DEVICE-LOCAL observation rows / landmark slots; camera
    indices stay global (cameras are replicated)."""
    obs_cam: jnp.ndarray    # (D, n) int32  global camera per local obs row
    obs_lm: jnp.ndarray     # (D, n) int32  LOCAL landmark slot per obs row
    obs_uv: jnp.ndarray     # (D, n, 2)
    obs_w: jnp.ndarray      # (D, n)
    flat: FlatWork          # leaves (D, ...) — local track/camera tables
    pcg: "jnp.ndarray"      # PCGWork with leaves (D, ...)
    lm_global: jnp.ndarray  # (D, Lp) int32 global landmark id (L = padding)
    n_points_local: int     # Lp
    n_points: int           # L (global)


def _pad_stack(arrs, fill=0):
    """Stack differently-shaped same-rank numpy arrays with zero/fill pad."""
    arrs = [np.asarray(a) for a in arrs]
    shape = tuple(max(a.shape[i] for a in arrs) for i in range(arrs[0].ndim))
    out = np.full((len(arrs),) + shape, fill, arrs[0].dtype)
    for d, a in enumerate(arrs):
        out[(d,) + tuple(slice(0, s) for s in a.shape)] = a
    return out


def build_dist_work(obs_part, n_cams, n_points, n_devices, dtype=np.float32):
    """Host-side: per-device local observation shards + local flat/PCG index
    tables. `obs_part` must come from partition_obs_by_landmark(obs, D)."""
    cam = np.asarray(obs_part.cam_idx)
    lm = np.asarray(obs_part.lm_idx)
    uv = np.asarray(obs_part.uv)
    w = np.asarray(obs_part.weight)
    n_total = cam.shape[0]
    assert n_total % n_devices == 0
    chunk = n_total // n_devices

    per = {k: [] for k in ("cam", "lml", "uv", "w", "fw", "pw", "gid")}
    for d in range(n_devices):
        sl = slice(d * chunk, (d + 1) * chunk)
        cam_d, lm_d, uv_d, w_d = cam[sl], lm[sl], uv[sl], w[sl]
        valid = w_d > 0
        gid = np.unique(lm_d[valid])
        lml = np.zeros(chunk, np.int32)
        lml[valid] = np.searchsorted(gid, lm_d[valid]).astype(np.int32)
        Ld = max(int(gid.shape[0]), 1)

        class _O(NamedTuple):
            cam_idx: np.ndarray
            lm_idx: np.ndarray
            uv: np.ndarray
            weight: np.ndarray

        obs_d = _O(cam_idx=cam_d, lm_idx=lml, uv=uv_d, weight=w_d)
        fw = build_flat_work(obs_d, n_cams, Ld, dtype=dtype,
                             use_cam_table=True)
        pw = build_pcg_work(obs_d, n_cams, dtype=dtype)
        per["cam"].append(cam_d)
        per["lml"].append(lml)
        per["uv"].append(uv_d)
        per["w"].append(w_d)
        per["fw"].append(fw)
        per["pw"].append(pw)
        per["gid"].append(gid.astype(np.int32))

    def stack_nt(nts, fills=None):
        cls = type(nts[0])
        fields = nts[0]._fields
        out = {}
        for f in fields:
            vals = [getattr(t, f) for t in nts]
            if vals[0] is None:
                out[f] = None
            elif isinstance(vals[0], tuple) or hasattr(vals[0], "_fields"):
                out[f] = stack_nt(vals)
            else:
                out[f] = jnp.asarray(_pad_stack(
                    vals, (fills or {}).get(f, 0)))
        return cls(**out)

    flat = stack_nt(per["fw"])
    pcg = stack_nt(per["pw"])
    lm_global = jnp.asarray(_pad_stack(per["gid"], fill=n_points))
    return DistPCGWork(
        obs_cam=jnp.asarray(np.stack(per["cam"])),
        obs_lm=jnp.asarray(np.stack(per["lml"])),
        obs_uv=jnp.asarray(np.stack(per["uv"])),
        obs_w=jnp.asarray(np.stack(per["w"])),
        flat=flat, pcg=pcg, lm_global=lm_global,
        n_points_local=int(lm_global.shape[1]), n_points=int(n_points))


class _LocalObs(NamedTuple):
    cam_idx: jnp.ndarray
    lm_idx: jnp.ndarray
    uv: jnp.ndarray
    weight: jnp.ndarray


def make_ba_solver_pcg_dist(mesh: Mesh, axis: str = "obs", *, max_iters=30,
                            lambda_init=1e-4, xtol=1e-12, cg_iters=100,
                            cg_tol=1e-6, loss=None):
    """Distributed large-C flat-PCG BA. Returns
    solve(poses0, points0, work: DistPCGWork, fixed_mask) -> BAState with
    GLOBAL points. The whole LM while_loop (same Nielsen control law as the
    single-device solver — trajectory parity-tested) runs inside one
    shard_map; see module docstring for the collective budget."""

    def solve(poses0, points0, work: DistPCGWork, fixed_mask):
        Lp = work.n_points_local
        L = work.n_points

        # owner-order landmark state: (D, Lp, 3); padded slots gather
        # points0[L-1] harmlessly (their blocks are empty -> dl = 0)
        own0 = points0[jnp.clip(work.lm_global, 0, L - 1)]

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P()),
            out_specs=(P(), P(axis), P()),
        )
        def run(poses, own, obs_s, work_s, fixed):
            sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
            obs_l = _LocalObs(*sq(obs_s))
            flat_l, pcg_l = sq(work_s[0]), sq(work_s[1])
            final = schur_flat.solve_ba_flat(
                poses, own[0], obs_l, flat_l, fixed_mask=fixed,
                max_iters=max_iters, lambda_init=lambda_init, xtol=xtol,
                linear="pcg", pcg_work=pcg_l, cg_iters=cg_iters,
                cg_tol=cg_tol, loss=loss, psum_axis=axis)
            scal = (final.cost, final.lam, final.nu, final.it, final.done)
            return final.poses, final.points[None], scal

        obs_s = (work.obs_cam, work.obs_lm, work.obs_uv, work.obs_w)
        poses, own, (cost, lam, nu, it, done) = run(
            poses0, own0, obs_s, (work.flat, work.pcg), fixed_mask)

        # scatter owner-order points back to global ids once per solve;
        # padded slots carry the sentinel id L and are dropped
        points = points0.at[work.lm_global.reshape(-1)].set(
            own.reshape(-1, 3), mode="drop")
        from slam_tricks_tpu.solvers.schur import BAState
        return BAState(poses=poses, points=points, cost=cost, lam=lam,
                       nu=nu, it=it, done=done)

    return jax.jit(solve)
