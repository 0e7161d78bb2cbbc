"""Sliding-window bundle adjustment with marginalization priors — the online
SLAM estimator (reference has only theory notes: MSCKF / factor-graph
marginalization in st0-core/docs/notes.tex:66-74; nothing implemented).

A window of `window` consecutive cameras is solved with the flat Schur LM
solver plus a Gaussian prior on its first `na` cameras (the information left
behind by everything marginalized so far). When the window advances by
`shift`, the dropped cameras and every track fully contained in the dropped
span are Schur-eliminated into a new dense prior on the next `na` cameras —
for trajectory visibility (track length <= K) the fill-in stops at the band,
so the prior stays (6*na, 6*na) forever. Tracks that straddle the boundary
keep only their in-window observations (the standard no-double-counting
drop, as in OKVIS/DSO-style marginalization).

Prior semantics: E(x) = 1/2 (xi - xi0)^T H (xi - xi0), with xi the
right-tangent local coordinates of the head poses w.r.t. stored anchor
linearization points (omega = log(Ra^T R), dt = t - ta — the solver's
retraction convention, st17 solver.hpp:442-443)."""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se3, so3
from slam_tricks_tpu.solvers import schur, schur_flat
from slam_tricks_tpu.solvers.common import HIGHEST
from slam_tricks_tpu.solvers.schur import BAState, lm_accept


class WindowPrior(NamedTuple):
    H: jnp.ndarray         # (P, P) information on the first P//6 cameras
    xi0: jnp.ndarray       # (P,) offset of the prior mean in local coords
    anchor_R: jnp.ndarray  # (na, 3, 3) linearization rotations
    anchor_t: jnp.ndarray  # (na, 3)


def empty_prior(na, dtype=np.float32):
    P = 6 * na
    return WindowPrior(H=jnp.zeros((P, P), dtype), xi0=jnp.zeros(P, dtype),
                       anchor_R=jnp.tile(jnp.eye(3, dtype=dtype)[None],
                                         (na, 1, 1)),
                       anchor_t=jnp.zeros((na, 3), dtype))


def _local_xi(poses, prior: WindowPrior):
    """Right-tangent coords of the head poses w.r.t. the prior anchors."""
    na = prior.anchor_R.shape[0]
    Rh = poses.R[:na]
    th = poses.t[:na]
    w = jax.vmap(lambda Ra, R: so3.log(Ra.T @ R))(prior.anchor_R, Rh)
    dt = th - prior.anchor_t
    return jnp.concatenate([w, dt], axis=1).reshape(-1)     # (P,) [w,dt]/cam


def prior_cost_grad(poses, prior: WindowPrior):
    xi = _local_xi(poses, prior)
    d = xi - prior.xi0
    g = prior.H @ d
    return 0.5 * jnp.dot(d, g), g


def solve_window(poses0, points0, obs, work, prior: WindowPrior, *,
                 fixed_mask=None, max_iters=20, lambda_init=1e-4,
                 xtol=1e-12):
    """Flat Schur LM over one window with the marginalization prior on the
    head cameras. Same control law as solve_ba_flat; the prior contributes
    exactly (cost, gradient, Hessian) to the camera system."""
    C = poses0.t.shape[0]
    L = points0.shape[0]
    dtype = points0.dtype
    if fixed_mask is None:
        fixed_mask = jnp.zeros(C, bool)

    def quantities(poses, points):
        Hpp, gp, Hll, gl, W, cost = schur_flat._iteration_quantities(
            poses, points, obs, work, C, L)
        pc, pg = prior_cost_grad(poses, prior)
        return (Hpp, gp, tuple(Hll), gl, W, pg), cost + pc

    blocks0, cost0 = quantities(poses0, points0)
    state = (BAState(poses=poses0, points=points0, cost=cost0,
                     lam=jnp.asarray(lambda_init, dtype),
                     nu=jnp.asarray(2.0, dtype),
                     it=jnp.zeros((), jnp.int32), done=jnp.zeros((), bool)),
             blocks0)

    def cond(sb):
        s, _ = sb
        return (~s.done) & (s.it < max_iters)

    def body(sb):
        s, blocks = sb
        Hpp, gp, Hll, gl, W, pg = blocks
        dp, dl, diag_pp, diag_ll = schur_flat._solve_flat(
            Hpp, gp, list(Hll), gl, W, s.lam, fixed_mask, work, C, L,
            prior=(prior.H, pg))
        bad = jnp.any(~jnp.isfinite(dp)) | jnp.any(~jnp.isfinite(dl))
        dp_s = jnp.where(bad, jnp.zeros_like(dp), dp)
        dl_s = jnp.where(bad, jnp.zeros_like(dl), dl)
        poses_try = jax.vmap(lambda T, d: se3.SE3(
            so3.retract(T.R, d[:3]), T.t + d[3:]))(s.poses, dp_s)
        points_try = s.points + dl_s
        blocks_try, cost_try = quantities(poses_try, points_try)

        # model decrease incl. the prior gradient on the head block
        P = prior.H.shape[0]
        gp_tot = gp.reshape(-1).at[:P].add(pg).reshape(gp.shape)
        pred = 0.5 * (jnp.sum(dp_s * (s.lam * diag_pp * dp_s - gp_tot))
                      + jnp.sum(dl_s * (s.lam * diag_ll * dl_s - gl)))
        accept, lam_new, nu_new = lm_accept(s.cost, cost_try, s.lam, s.nu,
                                            pred, bad)
        sel = lambda a, b2: jnp.where(accept, a, b2)
        step_sq = jnp.sum(dp_s * dp_s) + jnp.sum(dl_s * dl_s)
        new_state = BAState(
            poses=jax.tree_util.tree_map(sel, poses_try, s.poses),
            points=sel(points_try, s.points),
            cost=sel(cost_try, s.cost), lam=lam_new, nu=nu_new, it=s.it + 1,
            done=accept & (step_sq < xtol * xtol))
        return (new_state, jax.tree_util.tree_map(sel, blocks_try, blocks))

    final, _ = jax.lax.while_loop(cond, body, state)
    return final


def marginalize(poses, points, obs_np, prior: WindowPrior, *, n_drop, na,
                fixed_mask=None, eps=1e-6):
    """Schur-eliminate the first `n_drop` window cameras into a new prior on
    the next `na`. Host-side (numpy index selection) + one small dense jax
    Schur complement; runs once per window shift.

    Only tracks FULLY contained in cameras [0, n_drop+na) AND touching the
    dropped span carry information here (straddling tracks keep only their
    future observations — no double counting). The previous prior (anchored
    on cameras inside the dropped span) is folded in at its current local
    coordinates."""
    cam = np.asarray(obs_np.cam_idx)
    lm = np.asarray(obs_np.lm_idx)
    w = np.asarray(obs_np.weight)
    inv = n_drop + na
    valid = w > 0
    # a window shift can select zero observations (every track consumed or
    # weight-0) — lm.max() on an empty array raises (ADVICE r3)
    n_lm = int(lm.max()) + 1 if lm.size else 1
    touch_drop = np.zeros(n_lm, bool)
    outside = np.zeros_like(touch_drop)
    np.logical_or.at(touch_drop, lm[valid & (cam < n_drop)], True)
    np.logical_or.at(outside, lm[valid & (cam >= inv)], True)
    use_track = touch_drop & ~outside
    sel = np.flatnonzero(valid & use_track[lm] & (cam < inv))

    dtype = points.dtype
    nsel = max(sel.size, 1)
    lms = np.unique(lm[sel]) if sel.size else np.zeros(1, np.int64)
    lmap = np.searchsorted(lms, lm[sel]) if sel.size else np.zeros(0)
    Lw = max(lms.size, 1)

    cam_s = jnp.asarray(cam[sel].astype(np.int32))
    lm_s = jnp.asarray(lmap.astype(np.int32))
    uv_s = jnp.asarray(np.asarray(obs_np.uv)[sel].astype(dtype))
    w_s = jnp.asarray(w[sel].astype(dtype))
    pts_s = points[jnp.asarray(lms.astype(np.int32))]

    sub = jax.tree_util.tree_map(lambda a: a[:inv], poses)
    r, Jp, Jl = schur._linearize_obs(sub, pts_s, cam_s, lm_s, uv_s, w_s)
    Hpp, Hll, gp, gl, W_obs = schur._assemble(r, Jp, Jl, cam_s, lm_s,
                                              inv, Lw)
    # eliminate the selected landmarks (exact: all their obs are here)
    tr = jnp.einsum("lii->l", Hll)
    Hll_s = jnp.where((tr <= 0)[:, None, None],
                      jnp.eye(3, dtype=dtype)[None],
                      Hll + eps * jnp.eye(3, dtype=dtype)[None])
    Hll_inv = schur._inv3x3(Hll_s)
    Wd = jnp.zeros((inv, Lw, 6, 3), dtype).at[cam_s, lm_s].add(W_obs)
    WH = jnp.einsum("clij,ljk->clik", Wd, Hll_inv, precision=HIGHEST)
    Hc = jnp.einsum("clik,elmk->ciem", WH, Wd, precision=HIGHEST)
    Hfull = -Hc.reshape(inv * 6, inv * 6)
    eyeC = jnp.eye(inv, dtype=dtype)[:, None, :, None]
    Hfull = Hfull + (eyeC * Hpp[:, :, None, :]).reshape(inv * 6, inv * 6)
    gfull = (gp - jnp.einsum("clik,lk->ci", WH, gl,
                             precision=HIGHEST)).reshape(-1)

    # fold in the previous prior (anchors = head of the dropped span)
    Pp = prior.H.shape[0]
    xi = _local_xi(poses, prior)
    gprev = prior.H @ (xi - prior.xi0)
    Hfull = Hfull.at[:Pp, :Pp].add(prior.H)
    gfull = gfull.at[:Pp].add(gprev)
    # originally-fixed cameras inside the drop carry (near-)infinite prior
    if fixed_mask is not None:
        fixed_np = np.asarray(fixed_mask)[:inv]
        big = jnp.asarray(np.kron(fixed_np.astype(np.float64), np.ones(6))
                          .astype(dtype)) * 1e8
        Hfull = Hfull + jnp.diag(big)

    D = 6 * n_drop
    Hdd = Hfull[:D, :D] + eps * jnp.eye(D, dtype=dtype)
    Had = Hfull[D:, :D]
    X = jnp.linalg.solve(Hdd, jnp.concatenate(
        [Hfull[:D, D:], gfull[:D, None]], axis=1))
    Hnew = Hfull[D:, D:] - Had @ X[:, :-1]
    gnew = gfull[D:] - Had @ X[:, -1]
    Hnew = 0.5 * (Hnew + Hnew.T)
    # prior mean offset: minimizer of the marginal quadratic around the
    # CURRENT estimates of the new anchor cameras
    P = 6 * na
    xi0 = -jnp.linalg.solve(Hnew + eps * jnp.eye(P, dtype=dtype), gnew)
    anchors = jax.tree_util.tree_map(lambda a: a[n_drop:inv], poses)
    consumed = np.flatnonzero(use_track)
    return WindowPrior(H=Hnew, xi0=xi0, anchor_R=anchors.R,
                       anchor_t=anchors.t), consumed


def run_sliding_window(obs, poses_init, points_init, *, window=24, shift=12,
                       na=8, max_iters=15, fix_first=True):
    """Host driver: sweep the trajectory in overlapping windows, solving each
    with the marginalization prior and folding dropped cameras into the next
    prior. Returns (poses (C) SE3 stack, points (L,3), diagnostics list).

    obs: full-problem observations (cam_idx sorted by nothing in particular);
    poses_init/points_init: odometry-grade initial values (used for cameras/
    landmarks when they first enter a window)."""
    cam = np.asarray(obs.cam_idx)
    lm = np.asarray(obs.lm_idx)
    w_np = np.asarray(obs.weight)
    C = poses_init.t.shape[0]
    L = points_init.shape[0]
    dtype = points_init.dtype
    if not (0 < shift <= window <= C):
        raise ValueError(f"need 0 < shift <= window <= C, got "
                         f"shift={shift}, window={window}, C={C}")
    if not (0 < na <= window - shift or window >= C):
        raise ValueError(f"need na <= window - shift (anchors must survive "
                         f"the shift), got na={na}, window={window}, "
                         f"shift={shift}")
    if shift < na and window < C:
        raise ValueError(f"need shift >= na (old anchors must be inside the "
                         f"dropped span at marginalization), got "
                         f"shift={shift}, na={na}")

    est_R = np.asarray(poses_init.R).copy()
    est_t = np.asarray(poses_init.t).copy()
    est_p = np.asarray(points_init).copy()
    consumed = np.zeros(L, bool)

    starts = list(range(0, max(C - window, 0) + 1, shift))
    if starts[-1] != C - window:
        starts.append(max(C - window, 0))

    # common static obs size across windows -> one compiled solve
    n_max = 0
    for w0 in starts:
        m = (w_np > 0) & (cam >= w0) & (cam < w0 + window)
        n_max = max(n_max, int(m.sum()))
    n_max = n_max + (-n_max) % 8

    class _O(NamedTuple):
        cam_idx: np.ndarray
        lm_idx: np.ndarray
        uv: np.ndarray
        weight: np.ndarray

    solve_jit = jax.jit(solve_window, static_argnames=("max_iters",))
    diagnostics = []
    prior = empty_prior(na, dtype)
    for wi, w0 in enumerate(starts):
        m = ((w_np > 0) & (cam >= w0) & (cam < w0 + window)
             & ~consumed[lm])
        sel = np.flatnonzero(m)
        lms = np.unique(lm[sel])
        lmap_full = np.full(L, 0, np.int64)
        lmap_full[lms] = np.arange(lms.size)
        Lw = max(int(lms.size), 1)

        cam_l = np.zeros(n_max, np.int32)
        lm_l = np.zeros(n_max, np.int32)
        uv_l = np.zeros((n_max, 2), dtype)
        ww_l = np.zeros(n_max, dtype)
        cam_l[:sel.size] = cam[sel] - w0
        lm_l[:sel.size] = lmap_full[lm[sel]]
        uv_l[:sel.size] = np.asarray(obs.uv)[sel]
        ww_l[:sel.size] = w_np[sel]
        obs_w = _O(cam_idx=jnp.asarray(cam_l), lm_idx=jnp.asarray(lm_l),
                   uv=jnp.asarray(uv_l), weight=jnp.asarray(ww_l))
        work = schur_flat.build_flat_work(obs_w, window, Lw, dtype=dtype,
                                          use_cam_table=False)

        poses0 = se3.SE3(jnp.asarray(est_R[w0:w0 + window]),
                         jnp.asarray(est_t[w0:w0 + window]))
        points0 = jnp.asarray(est_p[lms]) if lms.size else             jnp.zeros((1, 3), dtype)
        fixed = jnp.zeros(window, bool)
        if wi == 0 and fix_first:
            fixed = fixed.at[0].set(True)

        out = solve_jit(poses0, points0, obs_w, work, prior,
                        fixed_mask=fixed, max_iters=max_iters)
        est_R[w0:w0 + window] = np.asarray(out.poses.R)
        est_t[w0:w0 + window] = np.asarray(out.poses.t)
        if lms.size:
            est_p[lms] = np.asarray(out.points)
        diagnostics.append({"w0": w0, "cost": float(out.cost),
                            "it": int(out.it), "n_obs": int(sel.size)})

        if w0 + window >= C:
            break
        n_drop = min(starts[wi + 1], C - window) - w0
        if n_drop <= 0:
            continue
        # marginalize in WINDOW-LOCAL indexing on the not-yet-consumed obs
        sub = np.flatnonzero((w_np > 0) & ~consumed[lm]
                             & (cam >= w0) & (cam < w0 + window))
        obs_m = _O(cam_idx=(cam[sub] - w0).astype(np.int32),
                   lm_idx=lm[sub].astype(np.int32),
                   uv=np.asarray(obs.uv)[sub].astype(dtype),
                   weight=w_np[sub].astype(dtype))
        prior, used = marginalize(
            out.poses, jnp.asarray(est_p), obs_m, prior,
            n_drop=n_drop, na=na,
            fixed_mask=fixed if wi == 0 else None)
        consumed[used] = True

    poses = se3.SE3(jnp.asarray(est_R), jnp.asarray(est_t))
    return poses, jnp.asarray(est_p), diagnostics
