"""Strapdown INS mechanization in the local-level NED frame.

Reference: st14-ins/src/src/ins.cpp:6-146 — attitude update with coning-
corrected delta-theta and earth/transport-rate quaternions (:37-55), velocity
update with Coriolis+gravity integral and sculling-corrected specific force
(:57-79), position update via midpoint integration with meridian/prime-vertical
radii (:81-98); reference ellipsoids (ellipsoid.hpp:14-108).

Improvements over the reference: `normal_gravity` implements the Somigliana
model with height correction (the reference's localGravity returns a constant
default — a marked TODO at ins.cpp:131-134), and the whole trajectory
mechanizes in one `lax.scan`.

State: lat/lon/h (rad, rad, m), v_ned (3,), q_nb quaternion [w,x,y,z]
(body->NED). Increments: gyro dtheta (rad), accel dv (m/s) per step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_tricks_tpu.manifolds import so3

# Reference ellipsoids (a, f, GM, omega_e) — ellipsoid.hpp:14-108 catalog
ELLIPSOIDS = {
    "WGS84": dict(a=6378137.0, f=1.0 / 298.257223563,
                  GM=3.986004418e14, omega=7.2921151467e-5),
    "GRS80": dict(a=6378137.0, f=1.0 / 298.257222101,
                  GM=3.986005e14, omega=7.292115e-5),
    "CGCS2000": dict(a=6378137.0, f=1.0 / 298.257222101,
                     GM=3.986004418e14, omega=7.292115e-5),
}


class INSState(NamedTuple):
    lat: jnp.ndarray
    lon: jnp.ndarray
    h: jnp.ndarray
    v_ned: jnp.ndarray   # (3,)
    q_nb: jnp.ndarray    # (4,) body->NED


def radii(lat, ell=ELLIPSOIDS["WGS84"]):
    """Meridian (M) and prime-vertical (N) curvature radii (ins.cpp:100-110 role)."""
    a = ell["a"]
    e2 = ell["f"] * (2.0 - ell["f"])
    s2 = jnp.sin(lat) ** 2
    w = jnp.sqrt(1.0 - e2 * s2)
    N = a / w
    M = a * (1.0 - e2) / w ** 3
    return M, N


def normal_gravity(lat, h, ell=ELLIPSOIDS["WGS84"]):
    """Somigliana normal gravity + free-air height correction (replaces the
    reference's TODO constant, ins.cpp:131-134)."""
    # WGS84 Somigliana constants
    ge = 9.7803253359
    k = 0.00193185265241
    e2 = ell["f"] * (2.0 - ell["f"])
    s2 = jnp.sin(lat) ** 2
    g0 = ge * (1.0 + k * s2) / jnp.sqrt(1.0 - e2 * s2)
    # second-order height correction
    a = ell["a"]
    f = ell["f"]
    m = ell["omega"] ** 2 * a ** 2 * (1 - f) * a / ell["GM"]
    return g0 * (1.0 - 2.0 / a * (1.0 + f + m - 2.0 * f * s2) * h + 3.0 * h ** 2 / a ** 2)


def _quat_mul(q, r):
    w1, x1, y1, z1 = q
    w2, x2, y2, z2 = r
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def _rotvec_quat(phi):
    """Rotation vector -> quaternion (Taylor-safe)."""
    n2 = jnp.dot(phi, phi)
    n = jnp.sqrt(jnp.where(n2 < 1e-30, 1.0, n2))
    half = 0.5 * n
    s = jnp.where(n2 < 1e-30, 0.5 - n2 / 48.0, jnp.sin(half) / n)
    return jnp.concatenate([jnp.cos(half)[None], s * phi])


def _earth_rates(lat, h, v_ned, ell):
    """omega_ie^n (earth rate) and omega_en^n (transport rate) in NED."""
    M, N = radii(lat, ell)
    om = ell["omega"]
    w_ie = jnp.stack([om * jnp.cos(lat), jnp.zeros_like(lat), -om * jnp.sin(lat)])
    vn, ve, vd = v_ned[0], v_ned[1], v_ned[2]
    w_en = jnp.stack([ve / (N + h), -vn / (M + h), -ve * jnp.tan(lat) / (N + h)])
    return w_ie, w_en


def mechanize_step(state, dtheta, dv, dt, dtheta_prev=None, dv_prev=None,
                   ell=ELLIPSOIDS["WGS84"]):
    """One strapdown update (attitude -> velocity -> position, the ins.cpp:37-98
    order) with coning/sculling compensation from the previous increments."""
    if dtheta_prev is None:
        dtheta_prev = jnp.zeros_like(dtheta)
    if dv_prev is None:
        dv_prev = jnp.zeros_like(dv)

    w_ie, w_en = _earth_rates(state.lat, state.h, state.v_ned, ell)
    w_in = w_ie + w_en

    # ---- attitude (coning-corrected body rotation, nav-frame rotation) ----
    phi_b = dtheta + jnp.cross(dtheta_prev, dtheta) / 12.0   # coning (ins.cpp:40-43)
    zeta = w_in * dt                                          # nav rotation (:45-50)
    q_b = _rotvec_quat(phi_b)
    q_n = _rotvec_quat(-zeta)
    q_new = _quat_mul(_quat_mul(q_n, state.q_nb), q_b)
    q_new = q_new / jnp.linalg.norm(q_new)

    # ---- velocity (sculling-corrected specific force + Coriolis/gravity) ----
    dv_rot = 0.5 * jnp.cross(dtheta, dv)                      # rotation comp (:67-70)
    dv_scul = (jnp.cross(dtheta_prev, dv) + jnp.cross(dv_prev, dtheta)) / 12.0
    C_nb = so3.from_quat(state.q_nb)
    # half-interval nav rotation applied to the integrated force (:71-76)
    f_n = (jnp.eye(3) - 0.5 * so3.hat(zeta)) @ C_nb @ (dv + dv_rot + dv_scul)
    g_n = jnp.stack([jnp.zeros_like(state.lat), jnp.zeros_like(state.lat),
                     normal_gravity(state.lat, state.h, ell)])
    cor = jnp.cross(2.0 * w_ie + w_en, state.v_ned)
    v_new = state.v_ned + f_n + (g_n - cor) * dt

    # ---- position (midpoint velocity, curvature radii; ins.cpp:81-98) ----
    v_mid = 0.5 * (state.v_ned + v_new)
    M, N = radii(state.lat, ell)
    h_new = state.h - v_mid[2] * dt
    lat_new = state.lat + v_mid[0] / (M + 0.5 * (state.h + h_new)) * dt
    M2, N2 = radii(0.5 * (state.lat + lat_new), ell)
    lon_new = state.lon + v_mid[1] / ((N2 + 0.5 * (state.h + h_new))
                                      * jnp.cos(0.5 * (state.lat + lat_new))) * dt

    return INSState(lat=lat_new, lon=lon_new, h=h_new, v_ned=v_new, q_nb=q_new)


def mechanize_trajectory(state0, dthetas, dvs, dt, ell=ELLIPSOIDS["WGS84"]):
    """Scan the full IMU increment sequence; returns stacked INSState history."""

    def step(carry, inp):
        state, prev = carry
        dth, dvv = inp
        new = mechanize_step(state, dth, dvv, dt, prev[0], prev[1], ell)
        return (new, (dth, dvv)), new

    z3 = jnp.zeros(3, dthetas.dtype)
    (_, _), hist = jax.lax.scan(step, (state0, (z3, z3)), (dthetas, dvs))
    return hist
