"""Rolling-shutter / LiDAR simulators and direct photometric alignment tests."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.manifolds import se2, se3
from slam_tricks_tpu.sim.distortion import (
    box_segments,
    lidar_sweep,
    ray_segment_intersection,
    rolling_shutter_points,
)

RNG = np.random.default_rng(31)


class TestRollingShutter:
    def test_static_points_undistorted(self):
        pts = jnp.asarray(RNG.uniform(0, 400, (50, 2)))
        obs = rolling_shutter_points(pts, jnp.zeros((50, 2)), row_time=1e-4)
        np.testing.assert_allclose(np.asarray(obs), np.asarray(pts), atol=1e-9)

    def test_horizontal_motion_shears(self):
        """Points moving in +x appear displaced proportionally to their row —
        the classic rolling-shutter shear (rolling_shut.h:44-66 behavior)."""
        y = jnp.asarray([0.0, 100.0, 200.0])
        pts = jnp.stack([jnp.full(3, 50.0), y], axis=1)
        vel = jnp.asarray([[1000.0, 0.0]] * 3)
        row_time = 1e-4
        obs = rolling_shutter_points(pts, vel, row_time)
        dx = np.asarray(obs[:, 0] - pts[:, 0])
        np.testing.assert_allclose(dx, [0.0, 10.0, 20.0], atol=1e-6)

    def test_vertical_motion_stretches(self):
        pts = jnp.asarray([[0.0, 100.0]])
        vel = jnp.asarray([[0.0, 500.0]])
        obs = rolling_shutter_points(pts, vel, row_time=1e-4)
        # y_obs = y0/(1 - vy*rt) = 100/0.95
        assert abs(float(obs[0, 1]) - 100.0 / 0.95) < 1e-6


class TestLidar:
    def test_ray_box(self):
        segs = box_segments(4.0, jnp.float64)
        t = ray_segment_intersection(jnp.asarray([0.0, 0.0]),
                                     jnp.asarray([1.0, 0.0]),
                                     segs[:, 0], segs[:, 1])
        assert abs(float(jnp.min(t)) - 4.0) < 1e-9

    def test_static_sweep_range_profile(self):
        segs = box_segments(4.0, jnp.float64)
        base = se2.SE2(jnp.asarray(0.0), jnp.asarray([0.0, 0.0]))
        sweep = lidar_sweep(segs, base, jnp.zeros(3, jnp.float64), n_beams=360)
        r = np.asarray(sweep.ranges)
        assert np.isfinite(r).all()
        # axis beams see 4.0, diagonals see 4*sqrt(2)
        assert abs(r[0] - 4.0) < 1e-6
        assert abs(r[45] - 4.0 * np.sqrt(2)) < 2e-1
        # hit points lie on the walls
        p = np.asarray(sweep.points_world)
        assert np.all(np.max(np.abs(p), axis=1) < 4.0 + 1e-6)
        assert np.all(np.max(np.abs(p), axis=1) > 4.0 - 1e-6)

    def test_moving_base_distorts(self):
        segs = box_segments(4.0, jnp.float64)
        base = se2.SE2(jnp.asarray(0.0), jnp.asarray([0.0, 0.0]))
        still = lidar_sweep(segs, base, jnp.zeros(3, jnp.float64), n_beams=180)
        moving = lidar_sweep(segs, base,
                             jnp.asarray([8.0, 0.0, 0.0]), n_beams=180)
        # ranges must differ for late beams (base moved)
        assert abs(float(still.ranges[-1] - moving.ranges[-1])) > 1e-2


class TestDirectMethod:
    def test_recovers_small_motion(self):
        """Constant-depth textured plane, known SE(3) motion: photometric
        alignment recovers the pose."""
        from scipy.ndimage import gaussian_filter

        from slam_tricks_tpu.frontend.direct import direct_pose_estimate
        from slam_tricks_tpu.ops.image import sample_bilinear
        from slam_tricks_tpu.residuals.camera import Intrinsics

        h, w = 120, 160
        rng = np.random.default_rng(3)
        img1 = gaussian_filter(rng.normal(size=(h, w)), 3.0)
        img1 = (img1 - img1.min()) / np.ptp(img1)
        img1 = jnp.asarray(img1)
        intr = Intrinsics(*map(jnp.float64, (150.0, 150.0, w / 2, h / 2)))
        depth = 5.0
        T_21 = se3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.004, -0.006, 0.003]))

        # render img2 by inverse warping: for each img2 pixel, find img1 pixel
        T_12 = se3.inv(T_21)
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float64),
                              jnp.arange(w, dtype=jnp.float64), indexing="ij")
        u = (xs - intr.cx) / intr.fx
        v = (ys - intr.cy) / intr.fy
        # constant depth in cam2 along the ray
        p2 = jnp.stack([u * depth, v * depth, jnp.full_like(u, depth)], axis=-1)
        p1 = se3.act(T_12, p2.reshape(-1, 3))
        x1 = intr.fx * p1[:, 0] / p1[:, 2] + intr.cx
        y1 = intr.fy * p1[:, 1] / p1[:, 2] + intr.cy
        img2 = sample_bilinear(img1, jnp.stack([x1, y1], 1)).reshape(h, w)

        T_est, res = direct_pose_estimate(img1, img2, jnp.full((256,), depth),
                                          intr, k=256, max_iters=40)
        err = np.asarray(se3.local(T_est, T_21))
        # double-bilinear resampling biases the photometric optimum slightly;
        # 1e-2 on the 6-DoF log error ~ sub-pixel reprojection agreement
        assert np.abs(err).max() < 1e-2, (err, float(res.cost))
