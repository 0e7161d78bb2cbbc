"""Dataset-format loaders (EuRoC ASL / TUM RGB-D / KITTI odometry): write
synthetic fixture files in each public format, parse them back, and run one
loader output through the ATE evaluation path end-to-end."""

import numpy as np

from slam_tricks_tpu.utils import datasets as ds

RNG = np.random.default_rng(31)


def _unit_q(n):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


class TestTUM:
    def test_trajectory_roundtrip(self, tmp_path):
        n = 25
        ts = np.cumsum(RNG.uniform(0.03, 0.05, n)) + 1311868164.0
        t = RNG.normal(size=(n, 3))
        q_wxyz = _unit_q(n)
        p = tmp_path / "groundtruth.txt"
        with open(p, "w") as f:
            f.write("# ground truth trajectory\n# ts tx ty tz qx qy qz qw\n")
            for i in range(n):
                w, x, y, z = q_wxyz[i]
                f.write(f"{ts[i]:.6f} {t[i,0]:.9f} {t[i,1]:.9f} {t[i,2]:.9f} "
                        f"{x:.9f} {y:.9f} {z:.9f} {w:.9f}\n")
        ts2, t2, q2 = ds.read_tum_trajectory(p)
        np.testing.assert_allclose(ts2, ts, atol=1e-5)
        np.testing.assert_allclose(t2, t, atol=1e-8)
        np.testing.assert_allclose(q2, q_wxyz, atol=1e-8)

    def test_image_list_and_association(self, tmp_path):
        ts_rgb = np.arange(10) * 0.1
        ts_d = ts_rgb + RNG.uniform(-0.005, 0.005, 10)
        p = tmp_path / "rgb.txt"
        with open(p, "w") as f:
            f.write("# color images\n")
            for i, t in enumerate(ts_rgb):
                f.write(f"{t:.6f} rgb/{i:04d}.png\n")
        ts2, names = ds.read_tum_image_list(p)
        assert names[3] == "rgb/0003.png"
        np.testing.assert_allclose(ts2, ts_rgb, atol=1e-6)

        ia, ib = ds.associate_timestamps(ts_rgb, ts_d, max_dt=0.02)
        np.testing.assert_array_equal(ia, np.arange(10))
        np.testing.assert_array_equal(ib, np.arange(10))
        # out-of-window timestamps associate to nothing
        ia, ib = ds.associate_timestamps(ts_rgb, ts_d + 10.0, max_dt=0.02)
        assert ia.size == 0


class TestEuRoC:
    def test_imu_csv(self, tmp_path):
        n = 12
        ts = (np.arange(n) * 5_000_000 + 1403636579758555392).astype(np.int64)
        gyro = RNG.normal(size=(n, 3))
        acc = RNG.normal(size=(n, 3)) + [0, 0, 9.81]
        p = tmp_path / "data.csv"
        with open(p, "w") as f:
            f.write("#timestamp [ns],w_RS_S_x,w_y,w_z,a_x,a_y,a_z\n")
            for i in range(n):
                row = ",".join(f"{v:.12f}" for v in np.r_[gyro[i], acc[i]])
                f.write(f"{ts[i]},{row}\n")
        ts2, g2, a2 = ds.read_euroc_imu(p)
        np.testing.assert_array_equal(ts2, ts)   # int64 ns survive exactly
        np.testing.assert_allclose(g2, gyro, atol=1e-10)
        np.testing.assert_allclose(a2, acc, atol=1e-10)

    def test_groundtruth_csv(self, tmp_path):
        n = 7
        ts = (np.arange(n) * 5_000_000).astype(np.int64)
        t = RNG.normal(size=(n, 3))
        q = _unit_q(n)
        extra = RNG.normal(size=(n, 9))    # v, bg, ba
        p = tmp_path / "data.csv"
        with open(p, "w") as f:
            f.write("#ts,p_x,p_y,p_z,q_w,q_x,q_y,q_z,...\n")
            for i in range(n):
                row = ",".join(f"{v:.12f}" for v in np.r_[t[i], q[i], extra[i]])
                f.write(f"{ts[i]},{row}\n")
        ts2, t2, q2 = ds.read_euroc_groundtruth(p)
        np.testing.assert_allclose(t2, t, atol=1e-10)
        np.testing.assert_allclose(q2, q, atol=1e-10)

    def test_camera_yaml(self, tmp_path):
        p = tmp_path / "sensor.yaml"
        p.write_text(
            "sensor_type: camera\n"
            "T_BS:\n"
            "  cols: 4\n"
            "  rows: 4\n"
            "  data: [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,\n"
            "         0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,\n"
            "         -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,\n"
            "         0.0, 0.0, 0.0, 1.0]\n"
            "rate_hz: 20\n"
            "resolution: [752, 480]\n"
            "camera_model: pinhole\n"
            "intrinsics: [458.654, 457.296, 367.215, 248.375]\n"
            "distortion_model: radial-tangential\n"
            "distortion_coefficients: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]\n")
        cam = ds.read_euroc_camera_yaml(p)
        np.testing.assert_allclose(cam["intrinsics"],
                                   [458.654, 457.296, 367.215, 248.375])
        np.testing.assert_allclose(cam["distortion"][0], -0.28340811)
        assert tuple(cam["resolution"]) == (752, 480)
        assert cam["T_BS"].shape == (4, 4)
        np.testing.assert_allclose(cam["T_BS"][3], [0, 0, 0, 1])


class TestKITTI:
    def test_poses_and_calib(self, tmp_path):
        n = 9
        # random valid rotations via QR
        A = RNG.normal(size=(n, 3, 3))
        R = np.linalg.qr(A)[0]
        det = np.linalg.det(R)
        R[det < 0, :, 0] *= -1
        t = RNG.normal(size=(n, 3)) * 10
        p = tmp_path / "00.txt"
        with open(p, "w") as f:
            for i in range(n):
                P = np.concatenate([R[i], t[i][:, None]], axis=1)
                f.write(" ".join(f"{v:.9e}" for v in P.ravel()) + "\n")
        R2, t2 = ds.read_kitti_poses(p)
        np.testing.assert_allclose(R2, R, atol=1e-8)
        np.testing.assert_allclose(t2, t, atol=1e-7)

        c = tmp_path / "calib.txt"
        P0 = np.asarray([718.856, 0, 607.1928, 0, 0, 718.856, 185.2157, 0,
                         0, 0, 1, 0])
        c.write_text("P0: " + " ".join(map(str, P0)) + "\n"
                     "P1: " + " ".join(map(str, P0)) + "\n")
        calib = ds.read_kitti_calib(c)
        assert calib["P0"].shape == (3, 4)
        np.testing.assert_allclose(calib["P0"][0, 0], 718.856)

    def test_poses_feed_ate(self, tmp_path):
        """Loader output drives the ATE metric end-to-end (st4 role)."""
        import jax.numpy as jnp

        from slam_tricks_tpu.evaluation import ate_rmse
        from slam_tricks_tpu.manifolds import se3

        n = 6
        A = RNG.normal(size=(n, 3, 3))
        R = np.linalg.qr(A)[0]
        R[np.linalg.det(R) < 0, :, 0] *= -1
        t = RNG.normal(size=(n, 3))
        p = tmp_path / "poses.txt"
        with open(p, "w") as f:
            for i in range(n):
                P = np.concatenate([R[i], t[i][:, None]], axis=1)
                f.write(" ".join(f"{v:.12e}" for v in P.ravel()) + "\n")
        R2, t2 = ds.read_kitti_poses(p)
        T = se3.SE3(jnp.asarray(R2), jnp.asarray(t2))
        assert float(ate_rmse(T, T)) < 1e-12
