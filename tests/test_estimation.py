"""Estimation tests: ESKF beats raw observations on the st4 scenario;
INS mechanization holds position when stationary (earth-rate-compensated
increments) and matches the gravity model."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.estimation import (
    ELLIPSOIDS,
    ESKFState,
    INSState,
    filter_trajectory,
    mechanize_trajectory,
    normal_gravity,
)
from slam_tricks_tpu.evaluation import ate_rmse
from slam_tricks_tpu.manifolds import se3, so3
from slam_tricks_tpu.sim.trajectory import spiral_poses

RNG = np.random.default_rng(13)


class TestESKF:
    def test_filter_beats_raw_observations(self):
        n = 80
        truth = spiral_poses(n)
        # relative odometry (noisy) + absolute pose observations (noisier)
        odo_sig, obs_sig = 0.002, 0.05

        def noisy(T, sig, rng):
            return se3.mul(T, se3.exp(jnp.asarray(rng.normal(size=6) * sig)))

        odos, obss = [], []
        for k in range(n - 1):
            Ti = jax.tree_util.tree_map(lambda a: a[k], truth)
            Tj = jax.tree_util.tree_map(lambda a: a[k + 1], truth)
            odos.append(noisy(se3.mul(se3.inv(Ti), Tj), odo_sig, RNG))
            obss.append(noisy(Tj, obs_sig, RNG))
        odo = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *odos)
        obs = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *obss)

        T0 = jax.tree_util.tree_map(lambda a: a[0], truth)
        Q = jnp.eye(6) * odo_sig ** 2
        R = jnp.eye(6) * obs_sig ** 2
        mask = jnp.ones(n - 1, bool)
        Ts, final = filter_trajectory(T0, jnp.eye(6) * 1e-6, odo, obs, mask, Q, R)

        truth_tail = jax.tree_util.tree_map(lambda a: a[1:], truth)
        ate_filtered = float(ate_rmse(Ts, truth_tail))
        ate_obs = float(ate_rmse(obs, truth_tail))
        assert ate_filtered < 0.5 * ate_obs, (ate_filtered, ate_obs)

    def test_covariance_stays_spd(self):
        T0 = se3.identity(jnp.float64)
        state = ESKFState(T=T0, P=jnp.eye(6) * 1e-4)
        from slam_tricks_tpu.estimation import predict, update_pose

        for _ in range(20):
            state = predict(state, se3.exp(jnp.asarray(RNG.normal(size=6) * 0.1)),
                            jnp.eye(6) * 1e-4)
            state = update_pose(state, se3.exp(jnp.asarray(RNG.normal(size=6) * 0.1)),
                                jnp.eye(6) * 1e-2)
        eig = np.linalg.eigvalsh(np.asarray(state.P))
        assert (eig > 0).all()


class TestINS:
    def test_gravity_model(self):
        """Somigliana: equator ~9.7803, poles ~9.8322; decreases with height."""
        g_eq = float(normal_gravity(jnp.asarray(0.0), jnp.asarray(0.0)))
        g_pole = float(normal_gravity(jnp.asarray(np.pi / 2), jnp.asarray(0.0)))
        g_high = float(normal_gravity(jnp.asarray(0.0), jnp.asarray(1000.0)))
        assert abs(g_eq - 9.78033) < 1e-4
        assert abs(g_pole - 9.83218) < 1e-3
        assert g_high < g_eq

    def test_stationary_alignment(self):
        """Stationary IMU with ideal earth-rate/gravity increments: position
        drift stays small over 60 s (validates the full mechanization loop —
        the reference never could run this, ins.cpp:131-134 TODO)."""
        lat = np.deg2rad(30.0)
        dt = 0.01
        n = 6000
        ell = ELLIPSOIDS["WGS84"]
        om = ell["omega"]
        # level body aligned with NED: gyro senses earth rate, accel senses -g
        w_ie_n = np.array([om * np.cos(lat), 0.0, -om * np.sin(lat)])
        g = float(normal_gravity(jnp.asarray(lat), jnp.asarray(0.0)))
        f_b = np.array([0.0, 0.0, -g])
        dthetas = jnp.asarray(np.tile(w_ie_n * dt, (n, 1)))
        dvs = jnp.asarray(np.tile(f_b * dt, (n, 1)))
        state0 = INSState(lat=jnp.asarray(lat), lon=jnp.asarray(0.0),
                          h=jnp.asarray(0.0), v_ned=jnp.zeros(3),
                          q_nb=jnp.asarray([1.0, 0, 0, 0]))
        hist = mechanize_trajectory(state0, dthetas, dvs, dt)
        # position drift in meters
        M = 6.37e6
        dlat_m = float(jnp.abs(hist.lat[-1] - lat)) * M
        dh = float(jnp.abs(hist.h[-1]))
        v_final = float(jnp.linalg.norm(hist.v_ned[-1]))
        assert dlat_m < 5.0, dlat_m
        assert dh < 5.0, dh
        assert v_final < 0.2, v_final
