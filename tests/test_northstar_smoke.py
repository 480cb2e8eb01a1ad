"""The north-star pipeline harness (benchmarks/northstar_config3.py)
stays runnable: BENCH_SMOKE subprocess must converge and satisfy the
verdict thresholds at smoke scale. Protects the bench.py phase-3 path
(the driver's BENCH_r* flow) from bitrot; the full-scale numbers are
chip-measured (docs/ROUND4.md §3)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_northstar_smoke_pipeline_converges():
    env = dict(os.environ, BENCH_SMOKE="1", JAX_PLATFORMS="cpu")
    env.pop("BIPYMC_TPU_TESTS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks",
                                      "northstar_config3.py")],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["converged"], res
    assert res["crossmode_split_rhat"] < 1.1, res
    assert res["mode_weight_abs_err"] < 0.05, res
    assert res["northstar_wall_s"] > 0
