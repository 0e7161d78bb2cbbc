"""Pallas fused block-tridiagonal SPD solve — the banded-BA linear solver in
ONE kernel (VERDICT r2 item 3: a Pallas kernel that beats its XLA stage).

XLA's implementation (solvers/banded_flat.block_tridiag_solve) is a lax.scan
of G ~ 128 steps, each a chol(48) + two triangular solves + a matmul on tiny
operands: measured 4.48 ms at (G,m) = (128,48) — pure per-step overhead, the
arithmetic is ~5 MFLOP. Here the WHOLE recursion runs inside one Pallas
kernel on VMEM-resident data (~10 MB total):

  forward   M_g = (D_g - E_{g-1} M_{g-1} E_{g-1}^T)^{-1}
            u_g = M_g (r_g - E_{g-1} u_{g-1})
  backward  x_g = u_g - M_g E_g^T x_{g+1}

with the 48x48 SPD inverse computed by 48 masked Gauss-Jordan rank-1 steps
(unpivoted GJ is stable for the LM-damped SPD blocks), and every block
product a single small MXU matmul. All (G,m,m) arrays are stored flattened
(G*m, m) so the per-block slice is a dynamic SUBLANE slice (lanes stay
static — the TPU-friendly axis split)."""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(G, m, d_ref, e_ref, r_ref, x_ref, Mbuf, wA, wI, vec):
    """d_ref/e_ref (G*m, m): D_g rows [g*m,(g+1)*m); E_g = S[(g+1), g].
    r_ref (G, m). x_ref (G, m) out. Mbuf (G*m, m) scratch for the M_g.
    wA/wI (m, m) Gauss-Jordan tiles. vec (8, m) vector workspace."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    eye = (sub == lane).astype(d_ref.dtype)

    def gj_inverse(A):
        """(m, m) SPD inverse via m masked Gauss-Jordan rank-1 steps,
        carried jointly on [A] and [I] tiles."""
        wA[:] = A
        wI[:] = eye

        def step(j, _):
            rowA = wA[pl.ds(j, 1), :]                        # (1, m)
            rowI = wI[pl.ds(j, 1), :]
            piv = jnp.sum(jnp.where(lane == j, rowA, 0.0))
            inv = 1.0 / piv
            pA = rowA * inv
            pI = rowI * inv
            cj = jnp.sum(jnp.where(lane == j, wA[:], 0.0), axis=1,
                         keepdims=True)                      # (m, 1)
            onj = (sub == j)
            cjm = jnp.where(onj, 0.0, cj)
            wA[:] = jnp.where(onj, pA, wA[:] - cjm * pA)
            wI[:] = jnp.where(onj, pI, wI[:] - cjm * pI)
            return 0

        jax.lax.fori_loop(0, m, step, 0)
        return wI[:]

    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=d_ref.dtype,
                            precision=jax.lax.Precision.HIGHEST)
    mm = lambda a, b: dot(a, b, (((1,), (0,)), ((), ())))       # a @ b
    mmT = lambda a, b: dot(a, b, (((1,), (1,)), ((), ())))      # a @ b^T

    # ---- forward recursion ----
    M0 = gj_inverse(d_ref[pl.ds(0, m), :])
    Mbuf[pl.ds(0, m), :] = M0
    vec[0:1, :] = mmT(r_ref[pl.ds(0, 1), :], M0)                # u_0 (M sym)
    x_ref[pl.ds(0, 1), :] = vec[0:1, :]

    def fwd(g, _):
        Em1 = e_ref[pl.ds((g - 1) * m, m), :]                   # E_{g-1}
        Mm1 = Mbuf[pl.ds((g - 1) * m, m), :]
        T = mm(Em1, Mm1)                                        # (m, m)
        Ag = d_ref[pl.ds(g * m, m), :] - mmT(T, Em1)
        Mg = gj_inverse(Ag)
        Mbuf[pl.ds(g * m, m), :] = Mg
        rhs = r_ref[pl.ds(g, 1), :] - mmT(vec[0:1, :], Em1)     # (1, m)
        vec[0:1, :] = mmT(rhs, Mg)
        x_ref[pl.ds(g, 1), :] = vec[0:1, :]
        return 0

    jax.lax.fori_loop(1, G, fwd, 0)
    # x_ref now holds u_g for all g; x_{G-1} = u_{G-1} is final.

    # ---- backward recursion: x_g = u_g - M_g E_g^T x_{g+1} ----
    vec[1:2, :] = x_ref[pl.ds(G - 1, 1), :]

    def bwd(gr, _):
        g = G - 2 - gr
        Eg = e_ref[pl.ds(g * m, m), :]                          # E_g
        Mg = Mbuf[pl.ds(g * m, m), :]
        t = mm(vec[1:2, :], Eg)                                 # x_{g+1}^T E_g
        xg = x_ref[pl.ds(g, 1), :] - mmT(t, Mg)
        x_ref[pl.ds(g, 1), :] = xg
        vec[1:2, :] = xg
        return 0

    jax.lax.fori_loop(0, G - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tridiag_solve(D, E, r, *, interpret=False):
    """Solve the SPD block-tridiagonal system in one fused Pallas kernel.
    D (G,m,m) diagonal blocks, E (G-1,m,m) sub-diagonal blocks M[g+1,g],
    r (G,m). Returns x (G,m). Requires m % 8 == 0 (sublane slicing)."""
    G, m, _ = D.shape
    assert m % 8 == 0, m
    Epad = jnp.concatenate([E, jnp.zeros((1, m, m), D.dtype)], axis=0)
    return pl.pallas_call(
        functools.partial(_kernel, G, m),
        out_shape=jax.ShapeDtypeStruct((G, m), D.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((G * m, m), D.dtype),
                        pltpu.VMEM((m, m), D.dtype),
                        pltpu.VMEM((m, m), D.dtype),
                        pltpu.VMEM((8, m), D.dtype)],
        interpret=interpret,
    )(D.reshape(G * m, m), Epad.reshape(G * m, m), r)
