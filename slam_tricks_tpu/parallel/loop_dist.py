"""Distributed loop-closure BA — the banded+Woodbury solver on a device
mesh (the loop-closure analog of parallel/banded_dist.py).

Partitioning follows the structure of the problem:

  - the SINGLE-RUN (banded) landmark chunks split contiguously across
    devices exactly as in banded_dist — landmark state, grids, and all
    slot algebra stay device-local; band downdates, the single-run rhs
    reduction, (C,28) linearization partials, and LM scalars are psummed;
  - the LOOP-CLOSURE structure is REPLICATED: M revisited landmarks and
    their |A|-camera support are small by construction (the whole point of
    the low-rank formulation), so every device carries the full LC grid
    and computes bit-identical LC quantities — no collective needed, no
    double counting (LC terms are added AFTER the psums).

Per-iteration cross-device traffic is therefore IDENTICAL to the banded
solver's (~K x (C,36) bands + (C,28) + (C,6) + scalars); the Woodbury
correction costs zero extra communication.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_tricks_tpu.parallel.banded_dist import split_banded_work
from slam_tricks_tpu.solvers import loop_flat
from slam_tricks_tpu.solvers.loop_flat import LoopWork, build_loop_work


class DistLoopWork(NamedTuple):
    banded_local: object      # BandedWork leaves with leading (D, ...) axis
    lc: LoopWork              # full LoopWork; banded part IGNORED in solve
    n_points: int


def build_dist_loop_work(obs, n_cams, n_points, n_devices,
                         dtype=np.float32, chunk=32, max_band=32):
    """Host-side: global loop-closure build, banded chunk axis split across
    devices, LC structure kept whole (replicated at run time)."""
    lw = build_loop_work(obs, n_cams, n_points, dtype=dtype, chunk=chunk,
                         max_band=max_band)
    local = split_banded_work(lw.banded, n_points, n_devices)
    return DistLoopWork(banded_local=local, lc=lw, n_points=int(n_points))


def make_ba_solver_loop_dist(mesh: Mesh, axis: str = "obs", *, max_iters=30,
                             lambda_init=1e-4, xtol=1e-12, loss=None):
    """Distributed loop-closure BA. Returns
    solve(poses0, points0, work: DistLoopWork, fixed_mask) -> BAState with
    GLOBAL points. Same LM control law and trajectory as the single-device
    loop solver (modulo f.p. reassociation across devices)."""

    def solve(poses0, points0, work: DistLoopWork, fixed_mask):
        lc = work.lc

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(), P()),
            out_specs=(P(), P(axis), P(axis), P(), P()),
        )
        def run(poses, points, bw_s, lc_rep, fixed):
            bw = jax.tree_util.tree_map(lambda a: a[0], bw_s)
            lw = lc_rep._replace(banded=bw)
            final = loop_flat.solve_ba_loop(
                poses, points, lw, fixed_mask=fixed, max_iters=max_iters,
                lambda_init=lambda_init, xtol=xtol, loss=loss,
                psum_axis=axis, raw_points=True)
            pts_sr, pts_lc = final.points
            scal = (final.cost, final.lam, final.nu, final.it, final.done)
            return final.poses, pts_sr[None], bw.scatter_idx[None], \
                pts_lc, scal

        poses, own, sc, pts_lc, (cost, lam, nu, it, done) = run(
            poses0, points0, work.banded_local, lc, fixed_mask)
        points = points0.at[sc.reshape(-1)].set(own.reshape(-1, 3),
                                                mode="drop")
        points = points.at[lc.lc_lm].set(pts_lc, mode="drop")
        from slam_tricks_tpu.solvers.schur import BAState
        return BAState(poses=poses, points=points, cost=cost, lam=lam,
                       nu=nu, it=it, done=done)

    return jax.jit(solve)
