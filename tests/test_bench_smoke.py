"""bench.py end-to-end smoke at tiny shapes on CPU (SLAM_BENCH_SMOKE=1):
catches API drift in the driver-facing benchmark before it costs a TPU round."""

import json
import os
import subprocess
import sys


def test_bench_smoke():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["SLAM_BENCH_SMOKE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                         capture_output=True, text=True, env=env, timeout=1200)
    assert out.returncode == 0, out.stderr[-3000:]
    line = out.stdout.strip().splitlines()[-1]
    data = json.loads(line)
    assert data["metric"] == "ba_lm_iters_per_s"
    assert data["value"] > 0
    d = data["detail"]
    for key in ("stages", "flops_per_iter", "baseline_iters_per_s",
                "large_scale", "mfu_vs_f32_highest_peak", "vi"):
        assert key in d, key
    assert d["vi"]["preint_segments_per_s"] > 0
