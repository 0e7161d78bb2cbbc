#!/usr/bin/env python
"""Single-source the published performance numbers (VERDICT r4 item 8).

Reads the newest BENCH_LOCAL_r*.json (or a path given as argv[1]) and
rewrites every block delimited by

    <!-- BENCH:block_name -->
    ...
    <!-- /BENCH -->

in README.md and BASELINE.md with lines generated from the artifact. Docs
never carry hand-typed metrics: `python tools/gen_docs.py` after a bench
run is the only way numbers get in, so they cannot drift from the artifact
(the r3/r4 advisor finding).
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_artifact():
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        cands = sorted(glob.glob(os.path.join(ROOT, "BENCH_LOCAL_r*.json")),
                       key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if not cands:
            raise SystemExit("no BENCH_LOCAL_r*.json found")
        path = cands[-1]
    with open(path) as fh:
        return json.load(fh), os.path.basename(path)


def fmt(v, nd=2):
    if v is None:
        return "n/a"
    if isinstance(v, float):
        return f"{v:.{nd}f}" if abs(v) >= 1e-3 else f"{v:.2e}"
    return str(v)


def render_blocks(art, src_name):
    d = art.get("detail", {})
    cfg = d.get("configs", {})
    vi = d.get("vi", {})
    ls = d.get("large_scale", {})
    lsg = d.get("large_scale_general", {})
    loop = d.get("loop_scale", {})
    pg = d.get("posegraph", {})
    stages = d.get("stages", {})
    roof = d.get("roofline", {})
    nat = d.get("baseline_native_schur", {})
    scp = d.get("baseline_scipy", {})
    note = (f"*(generated from `{src_name}` by `tools/gen_docs.py`; "
            "do not edit by hand)*")

    headline = [
        note,
        "",
        f"- **Headline**: {fmt(art.get('value'))} LM iters/s true on-chip "
        f"({fmt(d.get('ms_per_iter'), 3)} ms/iter, slope-timed) at "
        f"{d.get('n_cams')} cams / {d.get('n_obs')} obs; final cost "
        f"{fmt(d.get('final_cost'))}; path: {d.get('headline_path')}",
        f"- **vs single-core C++ sparse-Schur LM (analytic J)**: "
        f"{fmt(art.get('vs_baseline'))}x "
        f"(baseline {fmt(nat.get('ms_per_iter'))} ms/iter, "
        f"native/schur_baseline.cpp)",
        f"- weaker anchors: {fmt(d.get('vs_scipy_trf'))}x vs scipy TRF "
        f"({fmt(scp.get('iters_per_s'), 3)} iters/s, finite-diff sparse J); "
        f"{fmt(d.get('vs_numpy_twin'))}x vs the single-core numpy twin",
        f"- relay dispatch constant (test-harness artifact, excluded by "
        f"slope timing): {fmt(d.get('dispatch_const_ms'), 1)} ms",
        f"- per-stage true ms: linearize+assemble "
        f"{fmt(stages.get('linearize_assemble_ms'), 3)}, Schur solve "
        f"{fmt(stages.get('schur_solve_ms'), 3)} (the linearize trial pass "
        f"doubles as the cost evaluation)",
        f"- roofline: {fmt((roof.get('bandwidth_fraction') or 0) * 100, 1)}% "
        f"of measured copy bandwidth "
        f"({fmt(roof.get('measured_copy_GBps'), 1)} GB/s; bytes from "
        f"{roof.get('bytes_method', 'XLA cost model')})",
    ]
    large = [
        note,
        "",
        f"- trajectory C={ls.get('n_cams')} / L={ls.get('n_points')} / "
        f"{ls.get('n_obs')} obs: banded-direct "
        f"{fmt(ls.get('banded_ms_per_iter'))} ms/iter vs paired-dense "
        f"{fmt(ls.get('paired_dense_ms_per_iter'))} ms/iter",
        f"- GENERAL long-span visibility C={lsg.get('n_cams')} / "
        f"L={lsg.get('n_points')} / {lsg.get('n_obs')} obs (mean track "
        f"{lsg.get('track_len_mean')} cams): slot-major dense-Schur "
        f"{fmt(lsg.get('sm_ms_per_iter'))} ms/iter"
        + (f"; C++ single-core same scene "
           f"{fmt(lsg.get('native_schur_singlecore_ms_per_iter'))} ms/iter"
           if lsg.get("native_schur_singlecore_ms_per_iter") else ""),
        f"- loop-closure scene ({loop.get('n_loop_landmarks')} revisited "
        f"landmarks): {fmt(loop.get('loop_ms_per_iter'))} ms/iter = "
        f"{fmt(loop.get('vs_banded_trajectory'))}x banded",
        f"- pose graph {pg.get('n_poses')} poses / "
        f"{pg.get('n_loop_edges')} loop edges, TPU f32 relative-state: "
        f"{fmt(pg.get('ms_per_iter'))} ms/iter (ATE "
        f"{fmt(pg.get('ate_before'), 3)} -> {fmt(pg.get('ate_after'), 3)}); "
        f"scipy SuperLU factor+solve of the same normal equations: "
        f"{fmt(pg.get('scipy_splu_factor_solve_ms'), 1)} ms",
    ]
    configs = [
        note,
        "",
        f"- undistortion: {fmt((d.get('undistort_px_per_s') or 0) / 1e6, 0)}"
        f" Mpx/s true ({fmt(d.get('undistort_max_err_px'))} px max err)",
        f"- PnP batched GN: {fmt(d.get('pnp_solves_per_s'), 0)} solves/s",
        f"- ICP SE(3) {cfg.get('icp_n_points')} pts: "
        f"{fmt(cfg.get('icp_se3_ms'))} ms (10 sweeps, true) vs scipy "
        f"cKDTree single-core {fmt(cfg.get('icp_ckdtree_singlecore_ms'))} ms",
        f"- Zhang calibration: {fmt(cfg.get('zhang_ms'))} ms total "
        f"(init {fmt(cfg.get('zhang_init_cpu_ms'))} + refine "
        f"{fmt(cfg.get('zhang_refine_ms'))}) vs cv2.calibrateCamera "
        f"{fmt(cfg.get('zhang_cv2_ms'))} ms at fx_err "
        f"{fmt(cfg.get('zhang_fx_err'), 3)} vs "
        f"{fmt(cfg.get('zhang_cv2_fx_err'), 3)}",
        f"- IMU preintegration: "
        f"{fmt((vi.get('preint_segments_per_s') or 0) / 1e3, 1)}k "
        f"segments/s ({fmt(vi.get('preint_samples_per_seg'))} samples each); "
        f"chain VI smoother {fmt(vi.get('smoother_ms_per_lm_iter'))} "
        f"ms/LM-iter at {fmt(vi.get('smoother_n_keyframes'))} keyframes, f32 "
        f"(ATE "
        f"{fmt(vi.get('smoother_ate_obs'), 4)} obs -> "
        f"{fmt(vi.get('smoother_ate'), 4)} smoothed)" if vi else
        "- IMU preintegration: (stage not run)",
        f"- two-view: init+triangulation "
        f"{fmt(cfg.get('two_view_init_tri_only_ms'))} ms (cv2 same work: "
        f"{fmt(cfg.get('two_view_cv2_init_tri_ms'))} ms), joint refinement "
        f"+{fmt(cfg.get('two_view_refine_only_ms'))} ms to cost "
        f"{fmt(cfg.get('two_view_final_cost'))} (init-only cost "
        f"{fmt(cfg.get('two_view_init_only_cost'), 4)})",
        f"- Sim(3) scale-drift pose graph "
        f"({cfg.get('sim3_pgo_n_keyframes')} keyframes, f32): "
        f"{fmt(cfg.get('sim3_pgo_ms_per_iter'))} ms/LM-iter true; latent "
        f"scale profile recovered to "
        f"{fmt(100 * cfg.get('sim3_pgo_scale_err', 0), 2)}%, ATE "
        f"{fmt(cfg.get('sim3_pgo_ate'), 4)} m"
        if cfg.get("sim3_pgo_ms_per_iter") is not None else
        "- Sim(3) scale-drift pose graph: (stage not run)",
    ]
    return {"headline": "\n".join(headline), "large": "\n".join(large),
            "configs": "\n".join(configs)}


def rewrite(path, blocks):
    with open(path) as fh:
        txt = fh.read()
    n = 0

    def sub(m):
        nonlocal n
        name = m.group(1)
        if name not in blocks:
            return m.group(0)
        n += 1
        return (f"<!-- BENCH:{name} -->\n{blocks[name]}\n<!-- /BENCH -->")

    new = re.sub(r"<!-- BENCH:(\w+) -->\n.*?<!-- /BENCH -->", sub, txt,
                 flags=re.S)
    if new != txt:
        with open(path, "w") as fh:
            fh.write(new)
    return n


def main():
    art, src = load_artifact()
    blocks = render_blocks(art, src)
    total = 0
    for doc in ("README.md", "BASELINE.md"):
        p = os.path.join(ROOT, doc)
        if os.path.exists(p):
            k = rewrite(p, blocks)
            print(f"{doc}: {k} block(s) regenerated")
            total += k
    if total == 0:
        print("no BENCH blocks found — add <!-- BENCH:name --> markers")


if __name__ == "__main__":
    main()
