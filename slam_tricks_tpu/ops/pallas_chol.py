"""Pallas fused dense SPD solve for the reduced camera system (VERDICT r1
item 1: "Pallas block-Cholesky for S with 6x6 micro-tiles" — implemented with
128-wide panels, which subsume the 6x6 block structure and match the MXU/VPU
tile geometry).

XLA's cholesky on TPU runs blocked While iterations with dynamic-update-slices
through HBM — measured 0.89 ms for n=576 (~3% utilization, latency-bound).
Inside ONE Pallas kernel the whole factorization is straight-line VLIW code on
a VMEM-resident matrix: per column a masked pivot extract, a row scale, and a
masked rank-1 strip update (VPU); per 128-panel one full-width MXU trailing
update. The forward/backward substitutions for the single right-hand side run
in the same kernel, so S and b make exactly one HBM round trip.

Math: upper-Cholesky S = U^T U (row-oriented — rows are sublane slices, which
TPUs index dynamically; lane slices only ever use 128-aligned offsets).
Solve:  U^T y = b  (forward over rows),  U x = y  (backward).

Shapes: n must be a multiple of the 128 panel; callers pad S with an identity
diagonal block and b with zeros (pad_spd below)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PB = 128


def _kernel(n, s_ref, b_ref, x_ref, A, y):
    """A (n,n) scratch: in-place U. y (8,n) scratch: rhs rows (row 0 used)."""
    A[:] = s_ref[:]
    y[:] = jnp.zeros_like(y)
    y[0:1, :] = b_ref[:].reshape(1, n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    n_panels = n // PB

    # ---------- factorization: S = U^T U ----------
    for p in range(n_panels):
        off = p * PB
        strip_rows = jax.lax.broadcasted_iota(jnp.int32, (PB, 1), 0)

        def col_step(jj, _):
            j = off + jj
            row = A[pl.ds(j, 1), :]                                  # (1, n)
            d = jnp.sum(jnp.where(lane == j, row, 0.0))
            inv = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
            urow = jnp.where(lane >= j, row * inv, 0.0)              # (1, n)
            A[pl.ds(j, 1), :] = urow
            # rank-1 update of the remaining rows of this panel strip:
            #   A[i, :] -= U[j, i] * urow   for off <= i, i > j
            # U[j, i] for the strip rows = urow lanes [off, off+PB)
            colv = urow[0, off:off + PB].reshape(PB, 1)   # static, 128-aligned
            sel = (strip_rows > jj).astype(urow.dtype)
            A[pl.ds(off, PB), :] += -(colv * sel) * urow
            return 0

        jax.lax.fori_loop(0, PB, col_step, 0)

        # trailing MXU update: A[r, :] -= sum_j U[j, r] U[j, :] for r >= off+PB
        panel = A[pl.ds(off, PB), :]                                 # (PB, n)
        right = jnp.where(lane >= off + PB, panel, 0.0)              # cols>=nxt
        A[:] += -jax.lax.dot_general(
            right, panel, (((0,), (0,)), ((), ())),
            preferred_element_type=panel.dtype)                      # (n, n)

    # ---------- forward substitution: U^T y = b (y over rows of U) ----------
    # y_j = (b_j - sum_{k<j} U[k, j] y_k) / U[j, j]
    def fwd_step(j, _):
        row = A[pl.ds(j, 1), :]                                      # U[j, :]
        d = jnp.sum(jnp.where(lane == j, row, 0.0))
        bj = jnp.sum(jnp.where(lane == j, y[0:1, :], 0.0))
        yj = bj / jnp.maximum(d, 1e-30)
        # subtract yj * U[j, :] from the pending rhs (affects lanes > j only;
        # row is zero below the diagonal so a full update is safe), then pin
        # lane j to the solved value
        upd = y[0:1, :] - yj * row
        y[0:1, :] = jnp.where(lane == j, yj, upd)
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0)

    # ---------- backward substitution: U x = y ----------
    def bwd_step(jr, _):
        j = n - 1 - jr
        row = A[pl.ds(j, 1), :]
        d = jnp.sum(jnp.where(lane == j, row, 0.0))
        # residual of row j: y_j - sum_{k>j} U[j,k] x_k (x stored in y lanes>j)
        dotv = jnp.sum(jnp.where(lane > j, row * y[0:1, :], 0.0))
        yj = jnp.sum(jnp.where(lane == j, y[0:1, :], 0.0))
        xj = (yj - dotv) / jnp.maximum(d, 1e-30)
        y[0:1, :] = jnp.where(lane == j, xj, y[0:1, :])
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0)
    x_ref[:] = y[0:1, :].reshape(x_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def chol_solve_padded(S, b, *, interpret=False):
    """Solve S x = b for SPD S (n,n) with n % 128 == 0 (see pad_spd).
    One fused Pallas kernel: factorization + both substitutions."""
    n = S.shape[0]
    assert n % PB == 0, "pad with pad_spd first"
    return pl.pallas_call(
        functools.partial(_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n,), S.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), S.dtype),
                        pltpu.VMEM((8, n), S.dtype)],
        interpret=interpret,
    )(S, b)


def pad_spd(S, b, multiple=PB):
    """Pad (n,n) SPD system to a multiple of `multiple` with an identity
    diagonal tail and zero rhs — the tail solves to exact zeros."""
    n = S.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return S, b, n
    Sp = jnp.zeros((n + pad, n + pad), S.dtype)
    Sp = Sp.at[:n, :n].set(S)
    Sp = Sp.at[jnp.arange(n, n + pad), jnp.arange(n, n + pad)].set(1.0)
    bp = jnp.concatenate([b, jnp.zeros((pad,), b.dtype)])
    return Sp, bp, n


def chol_solve(S, b, *, interpret=False):
    """Pad + fused solve + crop. S (n,n) SPD, b (n,). Returns x (n,)."""
    Sp, bp, n = pad_spd(S, b)
    return chol_solve_padded(Sp, bp, interpret=interpret)[:n]
