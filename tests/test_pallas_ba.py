"""Fused Pallas linearize+assemble kernel (ops/pallas_ba.py): block-level
parity with the flat XLA path and a full solve through the kernel — run in
interpreter mode on CPU (the kernel itself is validated on hardware by
bench.py / profile_ba.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_tricks_tpu.ops import pallas_ba
from slam_tricks_tpu.sim import make_scene, perturb_scene
from slam_tricks_tpu.solvers import schur_flat


def _setup(tile=512, n_per_wall=60, n_cams=12, seed=5):
    scene = make_scene(n_per_wall=n_per_wall, n_cams=n_cams, seed=seed,
                       dtype=np.float32)
    poses0, points0, fixed = perturb_scene(scene, seed=seed + 1)
    obs_s, meta = pallas_ba.build_pallas_ba_args(scene.obs, scene.n_points,
                                                 tile=tile)
    return scene, poses0, points0, fixed, obs_s, meta


def test_blocks_match_flat_xla():
    scene, poses0, points0, fixed, obs_s, meta = _setup()
    C, L = scene.n_cams, scene.n_points
    assert meta["n_tiles"] > 1, "test must cover the multi-tile path"
    Hpp_f, gp_f, cost_f, Hll_f, gl_f, W_f = pallas_ba.linearize_assemble(
        poses0.R.reshape(C, 9), poses0.t, points0, obs_s, meta["bases"],
        n_cams=C, n_points=L, tile=meta["tile"], w_win=meta["w_win"],
        L_pad=meta["L_pad"], interpret=True)
    work = schur_flat.build_flat_work(obs_s, C, L, dtype=np.float32)
    Hpp_r, gp_r, Hll_r, gl_r, W_r, cost_r = schur_flat._iteration_quantities(
        poses0, points0, obs_s, work, C, L)

    def rel(a, b):
        return float(jnp.max(jnp.abs(a - b)) / (1e-9 + jnp.max(jnp.abs(b))))

    assert rel(Hpp_f, Hpp_r) < 1e-5
    assert rel(gp_f, gp_r) < 1e-5
    assert max(rel(a, b) for a, b in zip(Hll_f, Hll_r)) < 1e-5
    assert rel(gl_f, gl_r) < 1e-5
    assert rel(W_f, W_r) < 1e-5
    assert abs(float(cost_f) - float(cost_r)) < 1e-5 * float(cost_r)


def test_full_solve_through_kernel():
    scene, poses0, points0, fixed, obs_s, meta = _setup(
        tile=512, n_per_wall=30, n_cams=8, seed=7)
    C, L = scene.n_cams, scene.n_points
    work = schur_flat.build_flat_work(obs_s, C, L, dtype=np.float32)
    out = schur_flat.solve_ba_flat(
        poses0, points0, obs_s, work, fixed_mask=fixed, max_iters=25,
        pallas_meta=meta, pallas_interpret=True)
    rms = np.sqrt(float(out.cost) / float(jnp.sum(obs_s.weight)))
    assert rms < 1e-5, rms


def test_padding_and_sorting_preserve_problem():
    scene, poses0, points0, fixed, obs_s, meta = _setup()
    w = np.asarray(obs_s.weight)
    assert w.sum() == np.asarray(scene.obs.weight).sum()
    lm = np.asarray(obs_s.lm_idx)[w > 0]
    assert np.all(np.diff(lm) >= 0), "observations must be sorted by landmark"
    # every tile's landmark span fits the window
    T = meta["tile"]
    lm_all = np.asarray(obs_s.lm_idx)
    bases = np.asarray(meta["bases"])
    for ti in range(meta["n_tiles"]):
        seg = lm_all[ti * T:(ti + 1) * T]
        assert seg[0] == bases[ti]
        assert seg[-1] - bases[ti] < meta["w_win"]
