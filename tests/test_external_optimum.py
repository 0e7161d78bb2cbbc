"""Independent optimum cross-check at BA scale (VERDICT r2 item 4/8): solve a
small cube-room BA with scipy.optimize.least_squares (sparse finite-diff
Jacobian, an implementation with NOTHING in common with ours) and require
solve_ba_flat to reach the same final cost within tolerance. This turns the
'matches Ceres final cost' criterion (BASELINE.md) from self-referential into
externally checkable — scipy's TRF solver plays the role of the authoritative
library the reference validates against (Ceres SPARSE_SCHUR,
st20-g2o/src/include/test_ceres.h:143-148).
"""

import numpy as np
import pytest
from scipy.optimize import least_squares
from scipy.sparse import lil_matrix
from scipy.spatial.transform import Rotation

from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat


def _pack(rotvecs, ts, pts, free_cams):
    return np.concatenate([rotvecs[free_cams].ravel(), ts[free_cams].ravel(),
                           pts.ravel()])


def _unpack(x, rotvecs0, ts0, pts_shape, free_cams):
    nf = int(free_cams.sum())
    rv = rotvecs0.copy()
    tt = ts0.copy()
    rv[free_cams] = x[:nf * 3].reshape(nf, 3)
    tt[free_cams] = x[nf * 3:2 * nf * 3].reshape(nf, 3)
    pts = x[2 * nf * 3:].reshape(pts_shape)
    return rv, tt, pts


def test_flat_ba_matches_scipy_least_squares():
    scene = make_scene(n_per_wall=8, n_cams=5, seed=91, pix_noise=2e-3,
                       dtype=np.float64)
    poses0, points0, fixed = perturb_scene(scene, seed=92)
    C, L = scene.n_cams, scene.n_points
    obs = scene.obs
    cam_idx = np.asarray(obs.cam_idx)
    lm_idx = np.asarray(obs.lm_idx)
    uv = np.asarray(obs.uv, np.float64)
    w = np.asarray(obs.weight, np.float64)
    keep = w > 0
    cam_idx, lm_idx, uv, sw = (cam_idx[keep], lm_idx[keep], uv[keep],
                               np.sqrt(w[keep]))
    N = cam_idx.shape[0]

    # ours
    work = schur_flat.build_flat_work(obs, C, L, dtype=np.float64)
    ours = schur_flat.solve_ba_flat(poses0, points0, obs, work,
                                    fixed_mask=fixed, max_iters=60)
    cost_ours = float(ours.cost)

    # scipy: rotation-vector + translation per free camera, 3 per landmark
    R0 = np.asarray(poses0.R, np.float64)
    rotvecs0 = Rotation.from_matrix(R0).as_rotvec()
    ts0 = np.asarray(poses0.t, np.float64)
    pts0 = np.asarray(points0, np.float64)
    free_cams = ~np.asarray(fixed)

    def residuals(x):
        rv, tt, pts = _unpack(x, rotvecs0, ts0, pts0.shape, free_cams)
        Rm = Rotation.from_rotvec(rv).as_matrix()
        pc = np.einsum("nij,nj->ni", Rm[cam_idx], pts[lm_idx]) + tt[cam_idx]
        r = (pc[:, :2] / pc[:, 2:3] - uv) * sw[:, None]
        return r.ravel()

    # block sparsity of the Jacobian (2 rows per obs; 6 cols per free camera,
    # 3 per landmark)
    nf = int(free_cams.sum())
    n_params = 6 * nf + 3 * L
    cam_slot = np.cumsum(free_cams) - 1          # free-camera ordinal
    sp = lil_matrix((2 * N, n_params), dtype=np.int8)
    for n in range(N):
        c, l = cam_idx[n], lm_idx[n]
        if free_cams[c]:
            s = cam_slot[c]
            sp[2 * n:2 * n + 2, 3 * s:3 * s + 3] = 1
            sp[2 * n:2 * n + 2, 3 * nf + 3 * s:3 * nf + 3 * s + 3] = 1
        sp[2 * n:2 * n + 2, 6 * nf + 3 * l:6 * nf + 3 * l + 3] = 1

    x0 = _pack(rotvecs0, ts0, pts0, free_cams)
    res = least_squares(residuals, x0, jac_sparsity=sp, method="trf",
                        xtol=1e-14, ftol=1e-14, gtol=1e-14, max_nfev=400)
    cost_scipy = float(res.cost)    # scipy cost = 0.5 * sum r^2, same as ours

    assert cost_ours <= cost_scipy * (1 + 1e-4), (cost_ours, cost_scipy)
    # and both must agree it's the same optimum (not a different basin)
    np.testing.assert_allclose(cost_ours, cost_scipy, rtol=1e-3)
