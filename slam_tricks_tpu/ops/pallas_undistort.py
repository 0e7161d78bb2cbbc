"""Pallas TPU kernel: fused batched Newton undistortion (st1 hot path).

One kernel pass per pixel tile: load (8,128)-aligned u/v tiles into VMEM, run
all Newton iterations in registers (analytic 2x2 Jacobian, closed-form solve —
the same math as residuals.camera.undistort_points_fast), write once. No
intermediate HBM traffic between iterations; the camera model parameters ride
in SMEM.

CPU tests run the same kernel in interpreter mode (`interpret=True`).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 512  # large tiles amortize per-program DMA latency (measured on v5e)
LANES = 128


def _undistort_kernel(params_ref, u_ref, v_ref, out_u_ref, out_v_ref, *, iters):
    fx = params_ref[0, 0]
    fy = params_ref[0, 1]
    cx = params_ref[0, 2]
    cy = params_ref[0, 3]
    k1 = params_ref[0, 4]
    k2 = params_ref[0, 5]
    k3 = params_ref[0, 6]
    p1 = params_ref[0, 7]
    p2 = params_ref[0, 8]

    u0 = (u_ref[...] - cx) / fx
    v0 = (v_ref[...] - cy) / fy
    u = u0
    v = v0
    for _ in range(iters):
        r2 = u * u + v * v
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dr = k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2)
        ud = u * radial + 2.0 * p1 * u * v + p2 * (r2 + 2.0 * u * u)
        vd = v * radial + p1 * (r2 + 2.0 * v * v) + 2.0 * p2 * u * v
        fu = ud - u0
        fv = vd - v0
        a = radial + 2.0 * u * u * dr + 2.0 * p1 * v + 6.0 * p2 * u
        b = 2.0 * u * v * dr + 2.0 * p1 * u + 2.0 * p2 * v
        d = radial + 2.0 * v * v * dr + 6.0 * p1 * v + 2.0 * p2 * u
        inv_det = 1.0 / (a * d - b * b)
        u = u - inv_det * (d * fu - b * fv)
        v = v - inv_det * (a * fv - b * fu)
    out_u_ref[...] = u * fx + cx
    out_v_ref[...] = v * fy + cy


def undistort_points_pallas(intr, dist, px_dist, iters=5, interpret=False):
    """(N,2) distorted pixels -> (N,2) undistorted. N padded internally to a
    multiple of 8*128."""
    n = px_dist.shape[0]
    dtype = px_dist.dtype
    tile_rows = TILE_ROWS if n >= TILE_ROWS * LANES else 8
    chunk = tile_rows * LANES
    pad = (-n) % chunk
    u = jnp.concatenate([px_dist[:, 0], jnp.full((pad,), intr.cx, dtype)])
    v = jnp.concatenate([px_dist[:, 1], jnp.full((pad,), intr.cy, dtype)])
    rows = (n + pad) // LANES
    u = u.reshape(rows, LANES)
    v = v.reshape(rows, LANES)
    params = jnp.stack([intr.fx, intr.fy, intr.cx, intr.cy,
                        dist.k1, dist.k2, dist.k3, dist.p1, dist.p2]).astype(dtype)[None, :]

    grid = (rows // tile_rows,)
    kernel = functools.partial(_undistort_kernel, iters=iters)
    out_u, out_v = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 9), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, LANES), dtype),
            jax.ShapeDtypeStruct((rows, LANES), dtype),
        ],
        interpret=interpret,
    )(params, u, v)
    return jnp.stack([out_u.reshape(-1)[:n], out_v.reshape(-1)[:n]], axis=1)
