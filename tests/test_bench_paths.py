"""The benchmark script itself must stay runnable on both assembly paths."""

import json
import subprocess
import sys


def _run_bench(extra_env):
    env = {
        "BENCH_NX": "4",
        "BENCH_REPS": "1",
        "BENCH_PLATFORM": "cpu",
        # the twist e2e metric is a multi-minute solve of its own; it has a
        # dedicated e2e test (test_e2e_nonlinear.test_twist_c3d10_full_mesh_
        # 90deg) -- here we only exercise the box assembly/solve paths
        "BENCH_TWIST": "0",
    }
    env.update(extra_env)
    import os

    full = dict(os.environ, **env)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=300,
        env=full,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["unit"] == "s"
    assert result["value"] > 0
    assert "vs_baseline" in result
    return result


def test_bench_structured_path():
    r = _run_bench({"BENCH_STRUCTURED": "1"})
    assert "assemble_pcg" in r["metric"]


def test_bench_general_dia_path():
    _run_bench({"BENCH_STRUCTURED": "0"})
