"""Stored-factor extension vs full refactorization latency on the chip
(slope-timed, dispatch constant excluded): the incremental smoother claim.
Measured 2026-08-22 on the v5e chip: full factor (G=86, m=72) 1.33 ms,
tail-4 extension 0.021 ms — 63x; see solvers/incremental.py."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/slam_tricks_tpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from slam_tricks_tpu.solvers.banded_flat import (block_tridiag_factor, block_tridiag_factor_extend, TridiagFactor)

G, m = 86, 72
rng = np.random.default_rng(0)
D = rng.normal(size=(G, m, m)).astype(np.float32)
D = (D @ D.transpose(0,2,1) + 4*m*np.eye(m)[None]).astype(np.float32)
E = (0.1*rng.normal(size=(G-1, m, m))).astype(np.float32)
D, E = jnp.asarray(D), jnp.asarray(E)
fac = jax.jit(block_tridiag_factor)(D, E)

def rep_full(k, D, E):
    def body(i, acc):
        f = block_tridiag_factor(D + 1e-30*acc, E)
        return acc + jnp.sum(f.L[-1]) + jnp.sum(f.F[-1])
    return jax.lax.fori_loop(0, k, body, jnp.zeros((), D.dtype))
def rep_ext(k, D, E, fac):
    def body(i, acc):
        f = block_tridiag_factor_extend(fac, D + 1e-30*acc, E, 82)
        return acc + jnp.sum(f.L[-1]) + jnp.sum(f.F[-1])
    return jax.lax.fori_loop(0, k, body, jnp.zeros((), D.dtype))
jf = jax.jit(rep_full, static_argnums=0)
je = jax.jit(rep_ext, static_argnums=0)
def t(fn, *a):
    def run(k):
        r = fn(k, *a); return float(np.asarray(r))
    run(2); run(16)
    best = []
    for k in (2, 16):
        bb = 1e9
        for _ in range(3):
            t0=time.perf_counter(); run(k); bb=min(bb, time.perf_counter()-t0)
        best.append(bb)
    return (best[1]-best[0])/14*1e3
print(f"full factor (G={G}, m={m}): {t(jf, D, E):.3f} ms")
print(f"extend g0=82 (tail 4):      {t(je, D, E, fac):.3f} ms")
