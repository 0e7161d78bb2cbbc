"""Distributed bundle adjustment: observation-sharded LM over a device mesh.

The solver-domain parallelism design of SURVEY §2.2 (there is no reference
implementation — the reference is single-threaded by construction,
num_threads=1 everywhere, st17 solver.hpp:281):

- **Residual-block data parallelism**: observations are sharded over the mesh
  axis ``obs``; each device linearizes its shard (vmapped residual+Jacobian)
  and builds partial normal-equation blocks.
- **Collectives**: per-camera (6,6) Hessian blocks, per-landmark (3,3) blocks,
  gradients, and the (C,L) off-diagonal block tensor are `psum`-reduced over
  ICI. Per-iteration cross-device traffic is O(C*36 + L*9 + C*L*18) — the
  C*L term goes away with landmark-locality sharding (round-2 optimization).
- **Replicated trust-region control**: the LM state (lambda, nu, cost,
  accept/reject) is replicated — every device runs the identical update
  (SURVEY §2.2 item 3).

The Schur reduction + dense solve of the reduced camera system stay replicated
(cheap relative to linearization at BA scale). Everything compiles to ONE
XLA program under jit; no host round-trips inside the loop.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_tricks_tpu.solvers import schur
from slam_tricks_tpu.solvers.common import HIGHEST
from slam_tricks_tpu.solvers.schur import BAState


def pad_obs_to_multiple(obs, n_devices):
    """Host-side: pad observation arrays so the obs axis divides the mesh."""
    import numpy as np

    n = obs.cam_idx.shape[0]
    pad = (-n) % n_devices
    if pad == 0:
        return obs
    return type(obs)(
        cam_idx=jnp.concatenate([obs.cam_idx, jnp.zeros(pad, obs.cam_idx.dtype)]),
        lm_idx=jnp.concatenate([obs.lm_idx, jnp.zeros(pad, obs.lm_idx.dtype)]),
        uv=jnp.concatenate([obs.uv, jnp.zeros((pad, 2), obs.uv.dtype)]),
        weight=jnp.concatenate([obs.weight, jnp.zeros(pad, obs.weight.dtype)]),
    )


def make_ba_solver(mesh: Mesh, axis: str = "obs", *, max_iters=30,
                   lambda_init=1e-4, xtol=1e-12):
    """Build a jitted distributed BA solver for `mesh`.

    Returns solve(poses0, points0, obs, fixed_mask) -> BAState, where obs
    arrays must have their leading axis divisible by the mesh size (use
    `pad_obs_to_multiple`; padding rows carry weight 0).
    """

    def solve(poses0, points0, obs, fixed_mask):
        n_cams = poses0.t.shape[0]
        n_points = points0.shape[0]
        dtype = points0.dtype

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
        def assemble(poses, points, cam_idx, lm_idx, uv, weight):
            """Per-shard linearization + partial blocks, psum-reduced."""
            r, Jp, Jl = schur._linearize_obs(poses, points, cam_idx, lm_idx, uv, weight)
            Hpp, Hll, gp, gl, W_obs = schur._assemble(
                r, Jp, Jl, cam_idx, lm_idx, n_cams, n_points)
            W = jnp.zeros((n_cams, n_points, 6, 3), dtype=dtype).at[
                cam_idx, lm_idx].add(W_obs)
            part_cost = 0.5 * jnp.sum(r * r)  # r already weighted
            out = (Hpp, Hll, gp, gl, W, part_cost)
            return jax.tree_util.tree_map(lambda x: jax.lax.psum(x, axis), out)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
        def sharded_cost(poses, points, cam_idx, lm_idx, uv, weight):
            c = schur._cost(poses, points, cam_idx, lm_idx, uv, weight)
            return jax.lax.psum(c, axis)

        cam_idx, lm_idx, uv, weight = obs.cam_idx, obs.lm_idx, obs.uv, obs.weight
        cost0 = sharded_cost(poses0, points0, cam_idx, lm_idx, uv, weight)
        state = BAState(poses=poses0, points=points0, cost=cost0,
                        lam=jnp.asarray(lambda_init, dtype),
                        nu=jnp.asarray(2.0, dtype),
                        it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))

        def cond(s):
            return (~s.done) & (s.it < max_iters)

        def body(s):
            Hpp, Hll, gp, gl, W, _ = assemble(
                s.poses, s.points, cam_idx, lm_idx, uv, weight)
            dp, dl = _schur_from_dense_w(Hpp, Hll, gp, gl, W, s.lam, fixed_mask)
            bad = jnp.any(~jnp.isfinite(dp)) | jnp.any(~jnp.isfinite(dl))
            dp_s = jnp.where(bad, jnp.zeros_like(dp), dp)
            dl_s = jnp.where(bad, jnp.zeros_like(dl), dl)
            poses_try, points_try = schur._retract_state(s.poses, s.points, dp_s, dl_s)
            cost_try = sharded_cost(poses_try, points_try, cam_idx, lm_idx, uv, weight)

            dvec = jnp.concatenate([dp_s.reshape(-1), dl_s.reshape(-1)])
            gvec = jnp.concatenate([gp.reshape(-1), gl.reshape(-1)])
            diagH = jnp.concatenate([
                jax.vmap(jnp.diagonal)(Hpp).reshape(-1),
                jax.vmap(jnp.diagonal)(Hll).reshape(-1)])
            pred = 0.5 * jnp.dot(dvec, s.lam * jnp.maximum(diagH, 1e-12) * dvec - gvec)
            rho = (s.cost - cost_try) / jnp.maximum(pred, 1e-30)

            accept = (cost_try < s.cost) & jnp.isfinite(cost_try) & (~bad)
            lam_new = jnp.where(
                accept,
                s.lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                s.lam * s.nu)
            lam_new = jnp.clip(lam_new, 1e-12, 1e10)
            nu_new = jnp.where(accept, 2.0, s.nu * 2.0)
            sel = lambda a, b: jnp.where(accept, a, b)
            return BAState(
                poses=jax.tree_util.tree_map(sel, poses_try, s.poses),
                points=sel(points_try, s.points),
                cost=sel(cost_try, s.cost), lam=lam_new, nu=nu_new,
                it=s.it + 1,
                done=(accept & (jnp.sum(dvec * dvec) < xtol * xtol)) | bad)

        return jax.lax.while_loop(cond, body, state)

    return jax.jit(solve)


def _schur_from_dense_w(Hpp, Hll, gp, gl, W, lam, fixed_mask):
    """Schur reduction given the already-reduced dense (C,L,6,3) W tensor —
    shared by the single-device and sharded paths."""
    dtype = gp.dtype
    C = gp.shape[0]

    def damp(H):
        d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), 1e-12)
        return H + lam * jax.vmap(jnp.diag)(d)

    Hpp_d = damp(Hpp)
    Hll_d = damp(Hll)
    Hll_inv = schur._inv3x3(Hll_d)
    WHinv = jnp.einsum("clij,ljk->clik", W, Hll_inv, precision=HIGHEST)
    S = -jnp.einsum("clik,elmk->ciem", WHinv, W, precision=HIGHEST)
    eye_c = jnp.eye(C, dtype=dtype)[:, None, :, None]
    S = S + eye_c * Hpp_d[:, :, None, :]
    b = -(gp - jnp.einsum("clik,lk->ci", WHinv, gl, precision=HIGHEST))

    free = (~fixed_mask).astype(dtype)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S + eye_c * (fixed_mask.astype(dtype)[:, None, None, None]
                     * jnp.eye(6, dtype=dtype)[None, :, None, :])
    b = b * free[:, None]

    dp = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S.reshape(C * 6, C * 6), lower=True),
        b.reshape(C * 6)).reshape(C, 6)
    rhs_l = -gl - jnp.einsum("clik,ci->lk", W, dp, precision=HIGHEST)
    dl = jnp.einsum("lij,lj->li", Hll_inv, rhs_l, precision=HIGHEST)
    return dp, dl
