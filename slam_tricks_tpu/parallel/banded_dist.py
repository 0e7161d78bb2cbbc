"""Distributed slot-major banded trajectory BA — exact large-C solves on a
device mesh with pose-sized collectives (the banded analog of
parallel/pcg_dist.py; SURVEY §2.2 item 2).

The slot-major layout (solvers/banded_flat.py) already partitions landmarks
into c0-sorted chunks, so distribution is a clean SPLIT OF THE CHUNK AXIS:
device d owns a contiguous range of chunks (and therefore of landmarks and
ALL their observations — landmark-track locality by construction). The
EXACT single-device solver runs inside shard_map with `psum_axis` set:

  - landmark state, measurement grids, and all per-slot algebra: local;
  - camera-side traffic per LM iteration: psum (C,28) at linearization,
    one stacked psum of the K band accumulators (K,C,36) plus the (C,6)
    rhs at the solve, and two scalars — ~1.3 MB at C=1024/K=8, independent
    of L and N;
  - the super-block tridiagonal factorization/solve is replicated
    (O(C/K * (6K)^3) work — trivial next to linearization).

No distributed equivalent exists in the reference (num_threads=1
everywhere, st17-ceres/src/include/solver.hpp:281)."""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_tricks_tpu.solvers import banded_flat
from slam_tricks_tpu.solvers.banded_flat import BandedWork, build_banded_work


class DistBandedWork(NamedTuple):
    """Per-device BandedWork slices stacked on a leading device axis."""
    local: BandedWork       # leaves (D, ...)
    n_points: int


def build_dist_banded_work(obs, n_cams, n_points, n_devices,
                           dtype=np.float32, chunk=32, max_band=32):
    """Host-side: global slot-major build, chunk axis padded to a multiple
    of n_devices, then split into equal contiguous per-device slices.
    Dummy pad chunks carry weight 0 and sentinel scatter ids, so they
    contribute nothing and scatter nowhere."""
    bw = build_banded_work(obs, n_cams, n_points, dtype=dtype, chunk=chunk,
                           max_band=max_band)
    local = split_banded_work(bw, n_points, n_devices)
    return DistBandedWork(local=local, n_points=int(n_points))


def split_banded_work(bw: BandedWork, n_points, n_devices):
    """Split an existing BandedWork's chunk axis into n_devices contiguous
    slices (leading device axis), padding with weight-0 sentinel chunks.
    Shared by the banded and loop-closure distributed wrappers."""
    uv, w, oh = (np.asarray(bw.uv), np.asarray(bw.weight),
                 np.asarray(bw.onehot))
    sc, ga = np.asarray(bw.scatter_idx), np.asarray(bw.gather_idx)
    K, _, Lpad = uv.shape
    LB, C = oh.shape
    B = Lpad // LB
    pad_chunks = (-LB) % n_devices
    if pad_chunks:
        pl_ = pad_chunks * B
        uv = np.concatenate([uv, np.zeros((K, 2, pl_), uv.dtype)], axis=2)
        w = np.concatenate([w, np.zeros((K, pl_), w.dtype)], axis=1)
        ohp = np.zeros((pad_chunks, C), oh.dtype)
        ohp[:, 0] = 1                       # any valid camera; weights are 0
        oh = np.concatenate([oh, ohp], axis=0)
        sc = np.concatenate([sc, np.full(pl_, n_points, sc.dtype)])
        ga = np.concatenate([ga, np.full(pl_, max(n_points - 1, 0),
                                         ga.dtype)])
        LB += pad_chunks
        Lpad += pl_
    D = n_devices
    LBd, Ld = LB // D, Lpad // D
    return BandedWork(
        uv=jnp.asarray(uv.reshape(K, 2, D, Ld).transpose(2, 0, 1, 3)),
        weight=jnp.asarray(w.reshape(K, D, Ld).transpose(1, 0, 2)),
        onehot=jnp.asarray(oh.reshape(D, LBd, C)),
        scatter_idx=jnp.asarray(sc.reshape(D, Ld)),
        gather_idx=jnp.asarray(ga.reshape(D, Ld)))


def make_ba_solver_banded_dist(mesh: Mesh, axis: str = "obs", *, max_iters=30,
                               lambda_init=1e-4, xtol=1e-12, loss=None):
    """Distributed exact banded BA. Returns
    solve(poses0, points0, work: DistBandedWork, fixed_mask) -> BAState
    with GLOBAL points. Same LM control law and trajectory as the
    single-device solver (modulo f.p. reassociation across devices)."""

    def solve(poses0, points0, work: DistBandedWork, fixed_mask):
        L = work.n_points

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P()),
            out_specs=(P(), P(axis), P(axis), P()),
        )
        def run(poses, points, bw_s, fixed):
            bw = jax.tree_util.tree_map(lambda a: a[0], bw_s)
            final = banded_flat.solve_ba_banded(
                poses, points, bw, fixed_mask=fixed, max_iters=max_iters,
                lambda_init=lambda_init, xtol=xtol, loss=loss,
                psum_axis=axis, slot_points=True)
            scal = (final.cost, final.lam, final.nu, final.it, final.done)
            return final.poses, final.points[None], bw.scatter_idx[None], scal

        poses, own, sc, (cost, lam, nu, it, done) = run(
            poses0, points0, work.local, fixed_mask)
        points = points0.at[sc.reshape(-1)].set(own.reshape(-1, 3),
                                                mode="drop")
        from slam_tricks_tpu.solvers.schur import BAState
        return BAState(poses=poses, points=points, cost=cost, lam=lam,
                       nu=nu, it=it, done=done)

    return jax.jit(solve)
