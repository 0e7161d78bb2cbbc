"""Landmark-locality distributed BA — the communication-optimal design of
SURVEY §2.2 item 2 / §5: observations are partitioned so that ALL observations
of a landmark live on one device. Landmark Hessian blocks and their
elimination are then shard-local; the only cross-device reductions are

    psum( Hpp (C,6,6), gp (C,6), S_contrib (C,6,C,6), b (C,6), cost, dl )

i.e. O(C^2 * 36) bytes/iteration — independent of the landmark and
observation counts (vs the O(C*L*18) dense-W reduction in sharded_ba.py).

Host-side `partition_obs_by_landmark` sorts observations by landmark and cuts
at landmark boundaries into equal padded chunks.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from slam_tricks_tpu.solvers import schur
from slam_tricks_tpu.solvers.common import HIGHEST
from slam_tricks_tpu.solvers.schur import BAState, _inv3x3


def partition_obs_by_landmark(obs, n_devices):
    """Sort by lm_idx, split into n_devices chunks at landmark boundaries,
    pad each chunk to a common length. Returns a BAObservations-like tuple
    whose arrays have shape (n_devices * chunk, ...), chunk-contiguous."""
    cam_idx = np.asarray(obs.cam_idx)
    lm_idx = np.asarray(obs.lm_idx)
    uv = np.asarray(obs.uv)
    w = np.asarray(obs.weight)
    order = np.argsort(lm_idx, kind="stable")
    cam_idx, lm_idx, uv, w = cam_idx[order], lm_idx[order], uv[order], w[order]
    n = len(order)

    # cut points at landmark boundaries nearest to equal splits
    cuts = [0]
    for d in range(1, n_devices):
        target = d * n // n_devices
        # move forward to the next landmark boundary
        while target < n and target > 0 and lm_idx[target] == lm_idx[target - 1]:
            target += 1
        cuts.append(min(target, n))
    cuts.append(n)
    chunks = [slice(cuts[i], cuts[i + 1]) for i in range(n_devices)]
    chunk_len = max(c.stop - c.start for c in chunks)
    # pad to multiple of 8 for layout friendliness
    chunk_len = chunk_len + (-chunk_len) % 8

    def pad(a, fill=0):
        out = np.full((n_devices * chunk_len,) + a.shape[1:], fill, a.dtype)
        for i, c in enumerate(chunks):
            out[i * chunk_len:i * chunk_len + (c.stop - c.start)] = a[c]
        return out

    return type(obs)(
        cam_idx=jnp.asarray(pad(cam_idx)),
        lm_idx=jnp.asarray(pad(lm_idx)),
        uv=jnp.asarray(pad(uv)),
        weight=jnp.asarray(pad(w)),   # padding rows keep weight 0
    )


def make_ba_solver_landmark_local(mesh: Mesh, axis: str = "obs", *,
                                  max_iters=30, lambda_init=1e-4, xtol=1e-12):
    """Distributed BA with landmark-local elimination. Observations MUST come
    from `partition_obs_by_landmark(obs, mesh.size)`."""

    def solve(poses0, points0, obs, fixed_mask):
        n_cams = poses0.t.shape[0]
        n_points = points0.shape[0]
        dtype = points0.dtype

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
            out_specs=(P(), P(), P(), P(), P()),
        )
        def build_and_eliminate(poses, points, cam_idx, lm_idx, uv, weight,
                                lam, fixed):
            """Per-device: linearize local obs, complete local-landmark
            elimination, psum pose-side quantities only."""
            r, Jp, Jl = schur._linearize_obs(poses, points, cam_idx, lm_idx,
                                             uv, weight)
            Hpp, Hll, gp, gl, W_obs = schur._assemble(
                r, Jp, Jl, cam_idx, lm_idx, n_cams, n_points)
            # local landmarks have their COMPLETE Hll here (locality
            # invariant); foreign landmarks are all-zero rows -> give them an
            # identity block so the inverse stays finite (their W is zero, so
            # they contribute nothing).
            diag_sum = jnp.einsum("lii->l", Hll)
            foreign = diag_sum <= 0.0
            eye3 = jnp.eye(3, dtype=dtype)
            Hll_d = Hll + lam * jax.vmap(jnp.diag)(
                jnp.maximum(jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-12))
            Hll_d = jnp.where(foreign[:, None, None], eye3[None], Hll_d)
            Hll_inv = _inv3x3(Hll_d)

            Hpp_d = Hpp  # damping of pose blocks happens after psum
            # per-device S and b contributions from local landmarks, O(N) via
            # the matrix-free identity on the *local* obs (dense W per device
            # would be (C, L_local) — instead scatter into (C,L,6,3)? No:
            # accumulate with segment over local obs pairs via einsum on the
            # dense local W restricted to this shard's landmarks)
            W = jnp.zeros((n_cams, n_points, 6, 3), dtype=dtype).at[
                cam_idx, lm_idx].add(W_obs)
            WHinv = jnp.einsum("clij,ljk->clik", W, Hll_inv, precision=HIGHEST)
            S_part = -jnp.einsum("clik,elmk->ciem", WHinv, W, precision=HIGHEST)
            b_part = jnp.einsum("clik,lk->ci", WHinv, gl, precision=HIGHEST)
            cost_part = 0.5 * jnp.sum(r * r)

            out = (Hpp_d, gp, S_part, b_part, cost_part)
            Hpp_s, gp_s, S_s, b_s, cost_s = jax.tree_util.tree_map(
                lambda x: jax.lax.psum(x, axis), out)
            return Hpp_s, gp_s, S_s, b_s, cost_s

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(),
        )
        def back_substitute(poses, points, cam_idx, lm_idx, uv, weight, lam, dp):
            """Per-device landmark updates (local landmarks only), psum-merged."""
            r, Jp, Jl = schur._linearize_obs(poses, points, cam_idx, lm_idx,
                                             uv, weight)
            _, Hll, _, gl, W_obs = schur._assemble(
                r, Jp, Jl, cam_idx, lm_idx, n_cams, n_points)
            diag_sum = jnp.einsum("lii->l", Hll)
            local = diag_sum > 0.0
            eye3 = jnp.eye(3, dtype=dtype)
            Hll_d = Hll + lam * jax.vmap(jnp.diag)(
                jnp.maximum(jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-12))
            Hll_d = jnp.where(local[:, None, None], Hll_d, eye3[None])
            Hll_inv = _inv3x3(Hll_d)
            t = jnp.einsum("nij,ni->nj", W_obs, dp[cam_idx], precision=HIGHEST)
            t = jax.ops.segment_sum(t, lm_idx, n_points)
            dl = jnp.einsum("lij,lj->li", Hll_inv, -gl - t, precision=HIGHEST)
            dl = jnp.where(local[:, None], dl, 0.0)
            return jax.lax.psum(dl, axis)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
        def sharded_cost(poses, points, cam_idx, lm_idx, uv, weight):
            return jax.lax.psum(
                schur._cost(poses, points, cam_idx, lm_idx, uv, weight), axis)

        cam_idx, lm_idx, uv, weight = obs.cam_idx, obs.lm_idx, obs.uv, obs.weight
        C = n_cams
        cost0 = sharded_cost(poses0, points0, cam_idx, lm_idx, uv, weight)
        state = BAState(poses=poses0, points=points0, cost=cost0,
                        lam=jnp.asarray(lambda_init, dtype),
                        nu=jnp.asarray(2.0, dtype),
                        it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool))

        def cond(s):
            return (~s.done) & (s.it < max_iters)

        def body(s):
            Hpp, gp, S_off, b_lm, cost_chk = build_and_eliminate(
                s.poses, s.points, cam_idx, lm_idx, uv, weight, s.lam, fixed_mask)
            # damp pose blocks (Hpp is the complete psum now)
            Hpp_d = Hpp + s.lam * jax.vmap(jnp.diag)(
                jnp.maximum(jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-12))
            eye_c = jnp.eye(C, dtype=dtype)[:, None, :, None]
            S = S_off + eye_c * Hpp_d[:, :, None, :]
            b = -(gp - b_lm)
            free = (~fixed_mask).astype(dtype)
            S = S * free[:, None, None, None] * free[None, None, :, None]
            S = S + eye_c * (fixed_mask.astype(dtype)[:, None, None, None]
                             * jnp.eye(6, dtype=dtype)[None, :, None, :])
            b = b * free[:, None]
            dp = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S.reshape(C * 6, C * 6), lower=True),
                b.reshape(C * 6)).reshape(C, 6)
            bad = jnp.any(~jnp.isfinite(dp))
            dp = jnp.where(bad, jnp.zeros_like(dp), dp)
            dl = back_substitute(s.poses, s.points, cam_idx, lm_idx, uv, weight,
                                 s.lam, dp)
            dl = jnp.where(bad, jnp.zeros_like(dl), dl)

            poses_try, points_try = schur._retract_state(s.poses, s.points, dp, dl)
            cost_try = sharded_cost(poses_try, points_try, cam_idx, lm_idx, uv, weight)

            accept = (cost_try < s.cost) & jnp.isfinite(cost_try) & (~bad)
            dvec = jnp.concatenate([dp.reshape(-1), dl.reshape(-1)])
            lam_new = jnp.where(accept, s.lam / 3.0, s.lam * s.nu)
            nu_new = jnp.where(accept, 2.0, s.nu * 2.0)
            sel = lambda a, b2: jnp.where(accept, a, b2)
            return BAState(
                poses=jax.tree_util.tree_map(sel, poses_try, s.poses),
                points=sel(points_try, s.points),
                cost=sel(cost_try, s.cost),
                lam=jnp.clip(lam_new, 1e-12, 1e10), nu=nu_new, it=s.it + 1,
                done=(accept & (jnp.sum(dvec * dvec) < xtol * xtol)) | bad)

        return jax.lax.while_loop(cond, body, state)

    return jax.jit(solve)
