"""Pallas fused BA linearize+assemble kernel (SURVEY §7 step 5 / VERDICT r1
item 1): one HBM pass over the observation stream produces ALL normal-equation
blocks.

Per obs tile (T rows, staged in VMEM):
  residual + analytic Jacobian columns (VPU, unrolled — the hand derivation of
  st17-ceres/src/include/solver.hpp:176-199 in flat columns)
  -> 28 camera-side columns  [21 upper-tri JpTJp | 6 JpTr | 0.5 r^2]
     reduced by ONE (T,C)x(32,T) MXU contraction into a VMEM accumulator
  -> 9 landmark-side columns [6 upper-tri JlTJl | 3 JlTr]
     reduced by a WINDOWED (T,WL)x(16,T) MXU contraction accumulated into a
     VMEM-resident (L,16) scratch at a per-tile dynamic offset (observations
     are sorted by landmark, so each tile touches a bounded landmark window;
     the per-tile window bases arrive via scalar prefetch)
  -> W = Jp^T Jl written straight out as 18 (1,T) row stores into a (18,N)
     output (needed downstream by the Schur reduction)

VMEM discipline (the first on-chip attempt OOMed the 16 MB scoped budget at
35.6 MB):
  - inputs are PACKED host-side into one (N,18) f32 feature array and one
    (N,2) i32 index array — seven separate narrow inputs each pad their lane
    dim to 128 (524 KB/block instead of ~74 KB, double-buffered);
  - the per-column reduction stacks are built by ROW STORES into transposed
    VMEM scratch (32,T)/(16,T) — jnp.stack of k (T,1) columns materializes k
    524 KB lane-padded vectors AND lowers to a tpu.concatenate that Mosaic
    rejects ("result/input offset mismatch on non-concat dimension");
  - reduced outputs are (C,32)/(L_pad,16) and cropped OUTSIDE the kernel.

Limits: obs must be sorted by lm_idx (build_pallas_ba_args does this and
computes the window size); the (L_pad,16) landmark accumulator is
VMEM-resident, bounding L to ~20k per kernel launch — beyond that, shard
landmarks over launches (the bench/production scenes are well inside)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flat symmetric index orders shared with solvers/schur_flat.py
_IJ6 = [(i, j) for i in range(6) for j in range(i, 6)]
_IJ3 = [(i, j) for i in range(3) for j in range(i, 3)]


def _kernel(w_win,               # python int (bound via partial)
            n_cams,              # python int (bound via partial)
            base_ref,            # scalar prefetch: (n_tiles,) window bases
            feat_ref,            # (T, 18): r00..r22 | t0..2 | p0..2 | u v | sw
            idx_ref,             # (T, 2) i32: lm_idx | cam_idx
            w_ref, cam_out_ref, lm_out_ref,
            lm_acc,              # scratch: (L_pad, 16) VMEM accumulator
            cs,                  # scratch: (32, T) camera-column stack
            ls):                 # scratch: (16, T) landmark-column stack
    T = feat_ref.shape[0]
    tile = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    acc_t = lm_acc.dtype

    @pl.when(tile == 0)
    def _():
        cam_out_ref[:] = jnp.zeros_like(cam_out_ref)
        lm_acc[:] = jnp.zeros_like(lm_acc)
        cs[:] = jnp.zeros_like(cs)   # rows 28..31 stay zero forever
        ls[:] = jnp.zeros_like(ls)   # rows 9..15 stay zero forever

    r_ = [feat_ref[:, k] for k in range(9)]
    tn0, tn1, tn2 = feat_ref[:, 9], feat_ref[:, 10], feat_ref[:, 11]
    px, py, pz = feat_ref[:, 12], feat_ref[:, 13], feat_ref[:, 14]
    sw = feat_ref[:, 17]
    x = r_[0] * px + r_[1] * py + r_[2] * pz + tn0
    y = r_[3] * px + r_[4] * py + r_[5] * pz + tn1
    z = r_[6] * px + r_[7] * py + r_[8] * pz + tn2
    iz = 1.0 / z
    u = x * iz
    v = y * iz
    r0 = (u - feat_ref[:, 15]) * sw
    r1 = (v - feat_ref[:, 16]) * sw

    sziz = sw * iz
    jl0 = [(r_[j] - u * r_[6 + j]) * sziz for j in range(3)]
    jl1 = [(r_[3 + j] - v * r_[6 + j]) * sziz for j in range(3)]
    jo0 = [jl0[2] * py - jl0[1] * pz,
           jl0[0] * pz - jl0[2] * px,
           jl0[1] * px - jl0[0] * py]
    jo1 = [jl1[2] * py - jl1[1] * pz,
           jl1[0] * pz - jl1[2] * px,
           jl1[1] * px - jl1[0] * py]
    zero = jnp.zeros_like(x)
    jp0 = jo0 + [sziz, zero, -u * sziz]
    jp1 = jo1 + [zero, sziz, -v * sziz]

    dot2 = lambda a0, a1, b0, b1: a0 * b0 + a1 * b1

    # W out as 18 individual (1,T) row stores (see module docstring)
    for k, (i, j) in enumerate([(i, j) for i in range(6) for j in range(3)]):
        w_ref[k, :] = dot2(jp0[i], jp1[i], jl0[j], jl1[j])

    # camera-side 28 columns -> row-stored stack, ONE MXU contraction
    for k, (i, j) in enumerate(_IJ6):
        cs[k, :] = dot2(jp0[i], jp1[i], jp0[j], jp1[j])
    for i in range(6):
        cs[21 + i, :] = dot2(jp0[i], jp1[i], r0, r1)
    cs[27, :] = 0.5 * (r0 * r0 + r1 * r1)
    # one-hot built in-kernel from the index column (no (N,C) HBM array)
    cam_ids = jax.lax.broadcasted_iota(jnp.int32, (T, n_cams), 1)
    cam_oh = (cam_ids == idx_ref[:, 1][:, None]).astype(acc_t)
    cam_out_ref[:] += jax.lax.dot_general(
        cam_oh, cs[:], (((0,), (1,)), ((), ())),
        preferred_element_type=acc_t)                           # (C, 32)

    # landmark-side 9 columns -> row-stored stack, windowed MXU contraction
    for k, (i, j) in enumerate(_IJ3):
        ls[k, :] = dot2(jl0[i], jl1[i], jl0[j], jl1[j])
    for i in range(3):
        ls[6 + i, :] = dot2(jl0[i], jl1[i], r0, r1)
    base = base_ref[tile]
    local = idx_ref[:, 0] - base                                # (T,)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (T, w_win), 1)
    oh = (col_ids == local[:, None]).astype(acc_t)              # (T, w_win)
    blk = jax.lax.dot_general(oh, ls[:], (((0,), (1,)), ((), ())),
                              preferred_element_type=acc_t)     # (w_win, 16)
    lm_acc[pl.ds(base, w_win), :] += blk

    @pl.when(tile == n_tiles - 1)
    def _():
        lm_out_ref[:] = lm_acc[:]


def build_pallas_ba_args(obs, n_points, *, tile=1024, dtype=np.float32):
    """Host-side: sort observations by landmark, pad to a tile multiple, and
    compute per-tile landmark-window bases. Returns (obs_sorted, meta dict)."""
    cam_idx = np.asarray(obs.cam_idx)
    lm_idx = np.asarray(obs.lm_idx)
    uv = np.asarray(obs.uv)
    w = np.asarray(obs.weight)
    keep = w > 0
    order = np.flatnonzero(keep)[np.argsort(lm_idx[keep], kind="stable")]
    cam_s, lm_s, uv_s, w_s = cam_idx[order], lm_idx[order], uv[order], w[order]
    n = order.shape[0]
    pad = (-n) % tile
    lm_pad = lm_s[-1] if n else 0     # padding stays in the last window
    cam_s = np.concatenate([cam_s, np.zeros(pad, cam_s.dtype)])
    lm_s = np.concatenate([lm_s, np.full(pad, lm_pad, lm_s.dtype)])
    uv_s = np.concatenate([uv_s, np.zeros((pad, 2), uv_s.dtype)])
    w_s = np.concatenate([w_s, np.zeros(pad, w_s.dtype)])
    n_tiles = (n + pad) // tile
    bases = np.zeros(n_tiles, np.int32)
    span = 0
    for ti in range(n_tiles):
        seg = lm_s[ti * tile:(ti + 1) * tile]
        bases[ti] = seg[0]
        span = max(span, int(seg[-1] - seg[0]) + 1)
    w_win = span + (-span) % 8
    L_pad = max(n_points, int(bases[-1]) + w_win)
    L_pad = L_pad + (-L_pad) % 8

    from slam_tricks_tpu.sim.ba_scene import BAObservations
    obs_sorted = BAObservations(
        cam_idx=jnp.asarray(cam_s, jnp.int32),
        lm_idx=jnp.asarray(lm_s, jnp.int32),
        uv=jnp.asarray(uv_s.astype(dtype)),
        weight=jnp.asarray(w_s.astype(dtype)))
    meta = dict(tile=tile, w_win=int(w_win), n_tiles=int(n_tiles),
                bases=jnp.asarray(bases), L_pad=int(L_pad))
    return obs_sorted, meta


@functools.partial(jax.jit, static_argnames=("n_cams", "n_points", "tile",
                                             "w_win", "L_pad", "interpret"))
def linearize_assemble(poses_Rflat, poses_t, points, obs, bases, *, n_cams,
                       n_points, tile, w_win, L_pad, interpret=False):
    """Fused Pallas linearize+assemble. Returns
    (Hpp_flat (C,21), gp (C,6), cost (), Hll_flat [6x(L,)], gl (L,3), W (N,18))
    — flat layouts identical to solvers/schur_flat._iteration_quantities."""
    C = n_cams
    N = obs.cam_idx.shape[0]
    n_tiles = N // tile
    dtype = points.dtype

    # pre-gathered flat inputs (XLA gathers; cheap), PACKED into two arrays so
    # each kernel input block pads its lane dim to 128 only once
    feat = jnp.concatenate([
        poses_Rflat[obs.cam_idx],                 # (N, 9)
        poses_t[obs.cam_idx],                     # (N, 3)
        points[obs.lm_idx],                       # (N, 3)
        obs.uv,                                   # (N, 2)
        jnp.sqrt(obs.weight)[:, None],            # (N, 1)
    ], axis=1)
    idx2 = jnp.stack([obs.lm_idx.astype(jnp.int32),
                      obs.cam_idx.astype(jnp.int32)], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 18), lambda i, b: (i, 0)),
            pl.BlockSpec((tile, 2), lambda i, b: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((18, tile), lambda i, b: (0, i)),
            pl.BlockSpec((C, 32), lambda i, b: (0, 0)),
            pl.BlockSpec((L_pad, 16), lambda i, b: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((L_pad, 16), dtype),
                        pltpu.VMEM((32, tile), dtype),
                        pltpu.VMEM((16, tile), dtype)],
    )
    W_T, cam_red, lm_red = pl.pallas_call(
        functools.partial(_kernel, w_win, C),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((18, N), dtype),
            jax.ShapeDtypeStruct((C, 32), dtype),
            jax.ShapeDtypeStruct((L_pad, 16), dtype),
        ],
        interpret=interpret,
    )(bases, feat, idx2)
    W_T, cam_red, lm_red = jax.lax.optimization_barrier(
        (W_T, cam_red, lm_red))
    W = W_T.T    # (N,18) HBM layout for the downstream track gathers

    Hpp_flat = cam_red[:, :21]
    gp = cam_red[:, 21:27]
    cost = jnp.sum(cam_red[:, 27])
    lm_red = lm_red[:n_points]
    Hll_flat = [lm_red[:, k] for k in range(6)]
    gl = lm_red[:, 6:9]
    return Hpp_flat, gp, cost, Hll_flat, gl, W
